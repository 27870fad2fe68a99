"""Text operators — C9/C10/C11 analogues plus the training-data-pipeline
text analysis suite (token counting, quality scoring, language-ID
heuristic, document fingerprinting).

Reference lineage: normalization + tokenization + stop-word removal
(/root/reference/utils/text.py:19-48, 126-183), content similarity
hash of a normalized prefix (text.py:186-213, models/content.py:70-102),
structural quality features (ml/features.py:554-677: length, word/
sentence counts, punct ratios, normalized scores).

Everything is a pure column expression (split / regexp / aggregate /
md5) so it runs JVM-side inside whole-stage codegen; each function has
a DuckDB-SQL mirror (``sql_*``) built from the same constants so the
driver's oracle harness can cross-check values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .url import hash60

# 20 common English stopwords (public list; the reference ships 51
# Persian ones — utils/text.py:161-171; the operator shape is identical)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "is", "are", "was", "be", "it", "that", "this", "with", "as", "at",
]

WS_RE = r"\s+"
PUNCT_RE = r"[^\w\s]"


# -- normalization / tokenization (C9 / C10) --------------------------------


def normalize_text(text: Column) -> Column:
    """Lower-case + whitespace collapse + trim (text.py:42-48 shape)."""
    return F.trim(F.regexp_replace(F.lower(text), WS_RE, " "))


def tokens(text: Column) -> Column:
    """array<string> of non-empty whitespace tokens of normalized text."""
    return F.filter(F.split(normalize_text(text), " "), lambda t: t != "")


def content_tokens(text: Column) -> Column:
    """C10: tokens minus stopwords (array_except dedups — reference
    removes per-occurrence; dedup variant chosen, noted deviation)."""
    return F.array_except(tokens(text), F.array(*[F.lit(s) for s in STOPWORDS]))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# -- C11: content similarity hash ------------------------------------------


def similarity_hash(text: Column, prefix: int = 1000) -> Column:
    """md5 of the first `prefix` chars of the normalized text
    (models/content.py:70-102 truncates at 1000)."""
    return F.md5(F.substring(normalize_text(text), 1, prefix))


# -- quality scoring --------------------------------------------------------


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """#punctuation chars / length (ml/features.py:554-677 family)."""
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    return F.when(n > 0, F.round(p.cast("double") / n, 6)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """#stopword occurrences / #tokens, rounded for dialect parity."""
    toks = tokens(text)
    sw = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    )
    return F.when(
        F.size(toks) > 0, F.round(sw.cast("double") / F.size(toks), 6)
    ).otherwise(F.lit(0.0))


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(
        F.size(toks) > 0, F.round(total.cast("double") / F.size(toks), 6)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough + low punct +
    sane stopword density (a doc with ~0 stopwords is word soup)."""
    len_term = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    sw = stopword_ratio(text)
    sw_term = F.least(sw * 4.0, F.lit(1.0))
    return F.round((len_term + punct_term + sw_term) / 3.0, 6)


# -- language-ID heuristic ---------------------------------------------------

# tiny per-language marker token lists (public common-word lists)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "por", "una"],
    "de": ["der", "die", "und", "das", "ist"],
}


def lang_marker_hits(text: Column, lang: str) -> Column:
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))


def lang_id(text: Column) -> Column:
    """argmax of marker hits, 'und' when all zero; ties broken by the
    fixed language order en>fr>es>de (deterministic, mirrored in SQL)."""
    hits = [(lang, lang_marker_hits(text, lang)) for lang in LANG_MARKERS]
    best = None
    for lang, h in hits:
        if best is None:
            best = F.when(h > 0, F.lit(lang)).otherwise(F.lit("und"))
            best_h = h
        else:
            gt = h > best_h
            best = F.when(gt, F.lit(lang)).otherwise(best)
            best_h = F.when(gt, h).otherwise(best_h)
    return best


# -- C9: Persian text normalization (reference utils/text.py:19-48,126-150) --

# PERSIAN_CHARS_MAP transcribed from the reference (utils/text.py:19-39):
# Arabic kaf/yeh → Persian forms, Arabic-Indic digits → ASCII, taa
# marbuta → heh, hamza carriers folded, ZWNJ (half-space) → space.
# 1:1 char map → translate() stays JVM-side / codegen'd in Spark and
# maps verbatim onto DuckDB's translate().
# positional: ك→ک ي→ی ١→1 … ٠→0 ة→ه ئ→ی إ→ا أ→ا آ→ا ؤ→و ZWNJ→space
FA_MAP_SRC = "كي١٢٣٤٥٦٧٨٩٠ةئإأآؤ‌"
FA_MAP_DST = "کی1234567890هیاااو "

# Arabic combining marks (harakat + superscript alef) — the NFKD
# combining-class strip of utils/text.py:146-148, expressed as a char
# class (equivalent over the Arabic block once the char map above has
# already folded the precomposed forms).
FA_COMBINING = "".join(chr(c) for c in range(0x064B, 0x0653)) + "ٰ"

# punctuation deleted before Persian tokenization (utils/text.py:173-175:
# string.punctuation + Persian marks)
import string as _string

FA_PUNCT = _string.punctuation + "،؛؟»«!"

# the reference's 51 Persian stop words (utils/text.py:42-48)
PERSIAN_STOP_WORDS = [
    "از", "به", "با", "در", "بر", "را", "که", "این", "آن", "و", "یا", "اما", "ولی",
    "برای", "تا", "هر", "چه", "چرا", "اگر", "مگر", "پس", "نیز", "حتی", "همه", "هیچ",
    "خود", "باید", "شاید", "چون", "زیرا", "بنابراین", "سپس", "گرچه", "درباره", "بدون",
    "توسط", "علاوه", "بین", "همچنین", "بسیار", "برخی", "می", "های", "ها", "ی", "است",
    "نیست", "بود", "شد", "شود", "کرد", "کند", "شده", "می‌شود", "می‌کند", "دارد", "ندارد",
]


def fa_normalize(text: Column) -> Column:
    """C9: char-map fold → whitespace collapse → combining-mark strip
    (same order as normalize_persian_text, utils/text.py:126-150)."""
    mapped = F.translate(text, FA_MAP_SRC, FA_MAP_DST)
    collapsed = F.trim(F.regexp_replace(mapped, WS_RE, " "))
    return F.regexp_replace(collapsed, f"[{FA_COMBINING}]", "")


def fa_tokens(text: Column) -> Column:
    """Persian tokenization (utils/text.py:153-183): normalize → delete
    punctuation → split → drop stop words PER OCCURRENCE (duplicates
    and order preserved — exact reference semantics, unlike the
    English-side array_except deviation)."""
    stripped = F.translate(fa_normalize(text), FA_PUNCT, "")
    toks = F.filter(F.split(stripped, WS_RE), lambda t: t != "")
    return F.filter(toks, lambda t: ~t.isin(PERSIAN_STOP_WORDS))


# -- document fingerprint (min-k sketch) ------------------------------------


def fingerprint(text: Column, k: int = 4) -> Column:
    """Winnowing-style fingerprint: the k smallest 60-bit token hashes
    of the distinct content tokens, concatenated. Stable under token
    reordering — the rolling-hash analogue of the reference's
    similarity hash for shuffled near-dups."""
    hashes = F.transform(content_tokens(text), lambda t: hash60(t))
    topk = F.slice(F.array_sort(hashes), 1, k)
    return F.array_join(F.transform(topk, lambda h: h.cast("string")), "-")


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors — same constants, same rounding
# ---------------------------------------------------------------------------


def _sql_list(items: list[str]) -> str:
    return "[" + ", ".join(f"'{i}'" for i in items) + "]"


def sql_normalize(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '{WS_RE}', ' ', 'g'))"


def sql_tokens(expr: str) -> str:
    return (
        f"list_filter(string_split({sql_normalize(expr)}, ' '), t -> t <> '')"
    )


def sql_token_count(expr: str) -> str:
    return f"len({sql_tokens(expr)})"


def sql_similarity_hash(expr: str, prefix: int = 1000) -> str:
    return f"md5(substr({sql_normalize(expr)}, 1, {prefix}))"


def sql_punct_ratio(expr: str) -> str:
    n = f"length({expr})"
    p = f"({n} - length(regexp_replace({expr}, '{PUNCT_RE}', '', 'g')))"
    return f"(CASE WHEN {n} > 0 THEN round({p}::DOUBLE / {n}, 6) ELSE 0.0 END)"


def sql_stopword_ratio(expr: str) -> str:
    toks = sql_tokens(expr)
    sw = f"len(list_filter({toks}, t -> list_contains({_sql_list(STOPWORDS)}, t)))"
    return (
        f"(CASE WHEN len({toks}) > 0 THEN round({sw}::DOUBLE / len({toks}), 6) "
        f"ELSE 0.0 END)"
    )


def sql_avg_token_len(expr: str) -> str:
    toks = sql_tokens(expr)
    total = f"list_sum(list_transform({toks}, t -> length(t)))"
    return (
        f"(CASE WHEN len({toks}) > 0 THEN round({total}::DOUBLE / len({toks}), 6) "
        f"ELSE 0.0 END)"
    )


def sql_quality_score(expr: str) -> str:
    len_term = f"least(length({expr})::DOUBLE / 500.0, 1.0)"
    punct_term = f"(1.0 - least({sql_punct_ratio(expr)} * 5.0, 1.0))"
    sw_term = f"least({sql_stopword_ratio(expr)} * 4.0, 1.0)"
    return f"round(({len_term} + {punct_term} + {sw_term}) / 3.0, 6)"


def sql_lang_id(expr: str) -> str:
    toks = sql_tokens(expr)
    hit = {
        lang: f"len(list_filter({toks}, t -> list_contains({_sql_list(m)}, t)))"
        for lang, m in LANG_MARKERS.items()
    }
    # same tie-break as lang_id: first language in dict order wins ties
    langs = list(LANG_MARKERS)
    expr_out = "'und'"
    best = "0"
    for lang in langs:
        h = hit[lang]
        expr_out = f"(CASE WHEN {h} > {best} THEN '{lang}' ELSE {expr_out} END)"
        best = f"greatest({h}, {best})"
    return expr_out


def sql_content_tokens(expr: str) -> str:
    # array_except semantics: distinct tokens minus stopwords, order of
    # first appearance — mirror with list_distinct + filter
    return (
        f"list_filter(list_distinct({sql_tokens(expr)}), "
        f"t -> NOT list_contains({_sql_list(STOPWORDS)}, t))"
    )


def sql_fingerprint(expr: str, k: int = 4) -> str:
    from .url import sql_hash60

    hashes = f"list_transform({sql_content_tokens(expr)}, t -> {sql_hash60('t')})"
    topk = f"list_slice(list_sort({hashes}), 1, {k})"
    return f"array_to_string(list_transform({topk}, h -> h::VARCHAR), '-')"


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def sql_fa_normalize(expr: str) -> str:
    mapped = f"translate({expr}, '{FA_MAP_SRC}', '{FA_MAP_DST}')"
    collapsed = f"trim(regexp_replace({mapped}, '{WS_RE}', ' ', 'g'))"
    return f"regexp_replace({collapsed}, '[{FA_COMBINING}]', '', 'g')"


def sql_fa_tokens(expr: str) -> str:
    stripped = f"translate({sql_fa_normalize(expr)}, '{_sql_quote(FA_PUNCT)}', '')"
    toks = f"list_filter(string_split_regex({stripped}, '{WS_RE}'), t -> t <> '')"
    return (
        f"list_filter({toks}, "
        f"t -> NOT list_contains({_sql_list(PERSIAN_STOP_WORDS)}, t))"
    )
