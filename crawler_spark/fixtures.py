"""Deterministic synthetic crawl world (seed=42 house style).

The reference validates with seeded synthetic fixtures
(/root/reference/ml/training/train_content_model.py:85-133); we do the
same for the crawl side. Everything is **closed-form from the portable
60-bit hash**, so the 10^10-URL keyspace is *logical*: no link graph is
ever materialized — children of a URL are a pure function of its
canonical string, computable identically JVM-side (column expressions),
in Python (parity simulator), and in DuckDB SQL (oracle).

World rules
-----------
* Hosts: ``host{h}.example`` for h in [0, H). Seed skew: 30 % of seeds
  land on host0 (the hot host that exercises salting/AQE skew).
* Seed k: ``https://host{h}.example/{SECTION[k%5]}/{k}``.
* children(url, depth): fanout = max(0, engine_hash(url) % 9 - depth); child
  i has hc = engine_hash(url + '#' + i):
    - external (dropped by F2 host-scope) if hc % 13 == 0,
      host = ``ext{hc%97}.invalid``
    - section = SECTION[hc % 5]; id = hc % 10^9
    - 10 % of children (hc % 10 == 7) carry ``?ref={i}#frag`` — the
      canonicalizer must strip it (F1) or dedup breaks.
* robots: crawl_delay(host h) = 2.0 if h % 5 == 3 else 1.0;
  host h % 7 == 2 disallows the '/category/' prefix
  (reference utils/http.py:40-113, max(delay, robots) rule 200-226).
* fetch(url, attempt): fails with HTTP 503 for its first
  (engine_hash(url) % 3 + 1) attempts iff engine_hash(url) % 41 == 0 — so ~2.4 %
  of URLs exercise the retry path (F7, max 3 attempts) and a third of
  those exhaust it.
* payload: pixels = PCG64(url_hash) uint8 RGB, w/h in [16, 64],
  fmt = 'qz5' (lossy) when hash60 % 5 == 0 else 'png'; caption is a
  deterministic template of image_id. Byte-/pixel-exact reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import image as img
from .functions.url import engine_hash, py_xxhash64

SECTIONS = ["articles", "post", "about", "category", "view"]
EXTERNAL_MOD = 13
QUERY_MOD = 10
QUERY_REM = 7
FANOUT_MOD = 9
FAIL_MOD = 41
MAX_SIDE = 64
MIN_SIDE = 16

# ---------------------------------------------------------------------------
# seeds
# ---------------------------------------------------------------------------


def py_seed_url(k: int, num_hosts: int) -> str:
    h = 0 if k % 10 < 3 else (py_xxhash64(f"seedhost:{k}") % (num_hosts - 1)) + 1
    return f"https://host{h}.example/{SECTIONS[k % 5]}/{k}"


def seeds_df(spark: SparkSession, n: int, num_hosts: int = 50) -> DataFrame:
    """n seed URLs, Zipf-ish host skew, generated distributed (range)."""
    k = F.col("id")
    hot = F.pmod(k, 10) < 3
    hh = (F.pmod(engine_hash(F.concat(F.lit("seedhost:"), k.cast("string"))), num_hosts - 1) + 1)
    host_idx = F.when(hot, F.lit(0)).otherwise(hh)
    section = F.element_at(F.array(*[F.lit(s) for s in SECTIONS]), (F.pmod(k, 5) + 1).cast("int"))
    url = F.concat(
        F.lit("https://host"), host_idx.cast("string"), F.lit(".example/"),
        section, F.lit("/"), k.cast("string"),
    )
    return spark.range(n).select(url.alias("url"))


# ---------------------------------------------------------------------------
# synthetic link graph (closed-form)
# ---------------------------------------------------------------------------


def out_links(url_canon: Column, depth: Column) -> Column:
    """array<string> of child URLs — pure column expressions (F11 seam).

    Mirrors py_out_links exactly; stays inside codegen (concat/md5/conv).
    """
    hu = engine_hash(url_canon)
    fanout = F.greatest(F.lit(0), F.pmod(hu, FANOUT_MOD) - depth).cast("int")
    parent_host = F.regexp_extract(url_canon, r"^https?://([^/]+)", 1)

    def child_key(i: Column) -> Column:
        # hash each child ONCE; the URL pieces below all derive from it
        # (5 inline engine_hash calls per child was measurably slower)
        return F.struct(
            i.alias("i"),
            engine_hash(F.concat(url_canon, F.lit("#"), i.cast("string"))).alias("hc"),
        )

    def child(s: Column) -> Column:
        i, hc = s["i"], s["hc"]
        ext_host = F.concat(F.lit("ext"), F.pmod(hc, 97).cast("string"), F.lit(".invalid"))
        host = F.when(F.pmod(hc, EXTERNAL_MOD) == 0, ext_host).otherwise(parent_host)
        section = F.element_at(
            F.array(*[F.lit(s_) for s_ in SECTIONS]), (F.pmod(hc, 5) + 1).cast("int")
        )
        ident = F.pmod(hc, 1_000_000_000).cast("string")
        q = F.when(
            F.pmod(hc, QUERY_MOD) == QUERY_REM,
            F.concat(F.lit("?ref="), i.cast("string"), F.lit("#frag")),
        ).otherwise(F.lit(""))
        return F.concat(F.lit("https://"), host, F.lit("/"), section, F.lit("/"), ident, q)

    # NB: sequence(0, -1) is DESCENDING [0,-1] in Spark, not empty —
    # guard fanout=0 explicitly.
    return F.when(
        fanout > 0,
        F.transform(F.transform(F.sequence(F.lit(0), fanout - 1), child_key), child),
    ).otherwise(F.array().cast("array<string>"))


def py_out_links(url_canon: str, depth: int) -> list[str]:
    hu = py_xxhash64(url_canon)
    fanout = max(0, hu % FANOUT_MOD - depth)
    m = __import__("re").match(r"^https?://([^/]+)", url_canon)
    parent_host = m.group(1) if m else ""
    out = []
    for i in range(fanout):
        hc = py_xxhash64(f"{url_canon}#{i}")
        if hc % EXTERNAL_MOD == 0:
            host = f"ext{hc % 97}.invalid"
        else:
            host = parent_host
        section = SECTIONS[hc % 5]
        ident = hc % 1_000_000_000
        q = f"?ref={i}#frag" if hc % QUERY_MOD == QUERY_REM else ""
        out.append(f"https://{host}/{section}/{ident}{q}")
    return out


# ---------------------------------------------------------------------------
# robots rules (per-host dimension table, broadcastable)
# ---------------------------------------------------------------------------


def py_crawl_delay(host: str) -> float:
    h = _host_index(host)
    return 2.0 if h is not None and h % 5 == 3 else 1.0


def py_disallow_prefixes(host: str) -> list[str]:
    h = _host_index(host)
    return ["/category/"] if h is not None and h % 7 == 2 else []


def _host_index(host: str) -> int | None:
    import re

    m = re.match(r"^host(\d+)\.example$", host)
    return int(m.group(1)) if m else None


def robots_rules_df(spark: SparkSession, num_hosts: int = 50) -> DataFrame:
    rows = [
        (
            f"host{h}.example",
            py_disallow_prefixes(f"host{h}.example"),
            py_crawl_delay(f"host{h}.example"),
        )
        for h in range(num_hosts)
    ]
    return spark.createDataFrame(
        rows, "host string, disallow_prefixes array<string>, crawl_delay double"
    )


# ---------------------------------------------------------------------------
# synthetic fetch payload (used inside the fetch pandas UDF + parity tests)
# ---------------------------------------------------------------------------


def py_fail_rounds_h(hu: int) -> int:
    """Fail rounds from the url_hash directly — the fetch UDF already
    carries the hash column; re-hashing the URL per row is waste."""
    return (hu % 3) + 1 if hu % FAIL_MOD == 0 else 0


def py_fail_rounds(url_canon: str) -> int:
    return py_fail_rounds_h(py_xxhash64(url_canon))


def py_fetch_status_h(hu: int, attempt: int) -> int:
    """HTTP status for attempt number `attempt` (1-based), from hash."""
    return 503 if attempt <= py_fail_rounds_h(hu) else 200


def py_fetch_status(url_canon: str, attempt: int) -> int:
    return py_fetch_status_h(py_xxhash64(url_canon), attempt)


def py_image_dims(url_hash: int) -> tuple[int, int]:
    w = MIN_SIDE + (url_hash >> 8) % (MAX_SIDE - MIN_SIDE + 1)
    h = MIN_SIDE + (url_hash >> 16) % (MAX_SIDE - MIN_SIDE + 1)
    return int(w), int(h)


def py_image_fmt(url_hash: int) -> str:
    return "qz5" if url_hash % 5 == 0 else "png"


def py_image_id(url_hash: int) -> str:
    return f"img{url_hash % 10**12:012d}"


_ADJ = ["amber", "quiet", "vivid", "rustic", "bright", "pale", "bold", "calm"]
_NOUN = ["harbor", "meadow", "terrace", "lantern", "orchard", "canyon", "mosaic", "garden"]


def py_caption(url_hash: int) -> str:
    image_id = py_image_id(url_hash)
    return (
        f"{_ADJ[url_hash % 8]} {_NOUN[(url_hash >> 3) % 8]} scene {image_id}"
        f" ({(url_hash >> 6) % 1000})"
    )


def py_pixels(url_hash: int, w: int, h: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(url_hash & 0x7FFFFFFFFFFFFFFF))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def py_fetch_payload(url_hash: int) -> dict:
    """Full deterministic payload for a successful fetch of url_hash."""
    w, h = py_image_dims(url_hash)
    px = py_pixels(url_hash, w, h)
    fmt = py_image_fmt(url_hash)
    data = img.encode_png(px) if fmt == "png" else img.encode_qz5(px)
    return {
        "image_id": py_image_id(url_hash),
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": py_caption(url_hash),
        "phash": img.phash64(px),
    }
