"""C6 — NER entity extraction seam.

Reference (/root/reference/core/content_extractor.py:555-602): spaCy
``fa_core_news_sm`` over the first 10 000 chars; entities grouped by
label, dedup-sorted. spaCy isn't in this container, so the operator
ships two backends behind one ``mapInPandas`` seam:

* spaCy backend (used when importable): model loaded once per executor
  process, broadcast-free (model name resolved locally) — the
  production path.
* heuristic fallback: deterministic capitalized-run extractor, so the
  Spark plumbing (schema, batching, truncation, group-dedup-sort) is
  real and tested end-to-end in this sandbox.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TRUNCATE_CHARS = 10_000  # reference content_extractor.py:571-573

try:  # pragma: no cover - absent in this container
    import spacy  # type: ignore

    _HAVE_SPACY = True
except ImportError:
    spacy = None
    _HAVE_SPACY = False

_CAP_RUN = re.compile(r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,3})\b")


def _heuristic_entities(text: str) -> dict[str, list[str]]:
    """Capitalized-run heuristic: 1-4 Title-Case words → 'ENT'."""
    ents = sorted({m.group(1) for m in _CAP_RUN.finditer(text)})
    return {"ENT": ents} if ents else {}


def _spacy_entities(nlp, text: str) -> dict[str, list[str]]:
    doc = nlp(text)
    grouped: dict[str, set] = {}
    for ent in doc.ents:
        grouped.setdefault(ent.label_, set()).add(ent.text)
    return {k: sorted(v) for k, v in grouped.items()}


def extract_entities(
    docs: DataFrame, text_col: str = "text", model: str = "en_core_web_sm"
) -> DataFrame:
    """(doc_id, label, entities array<string>) — one row per label."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nlp = None
        if _HAVE_SPACY:
            try:
                nlp = spacy.load(model)  # once per python worker
            except Exception:
                nlp = None
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                t = (text or "")[:TRUNCATE_CHARS]
                grouped = (
                    _spacy_entities(nlp, t) if nlp is not None else _heuristic_entities(t)
                )
                for label, ents in grouped.items():
                    rows.append({"doc_id": doc_id, "label": label, "entities": ents})
            yield pd.DataFrame(rows, columns=["doc_id", "label", "entities"])

    return docs.select("doc_id", text_col).mapInPandas(
        gen, schema="doc_id long, label string, entities array<string>"
    )
