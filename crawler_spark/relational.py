"""Relational projections of the frontier operators onto the driver's
TPC-H-ish tables — the oracle-checkable face of the engine.

The engine's own world (synthetic seeds, closed-form link graph) is
verified by the parity simulator in pytest; the driver's DuckDB
harness instead runs each operator over `/root/testdata/sf*/` tables.
To make *the same operator code* oracle-checkable, a deterministic URL
corpus is synthesized from `orders` (one URL per order row) in two
dialects kept in lockstep: Spark Column expressions here, and ANSI/
DuckDB SQL built by :func:`sql_url_raw` from the SAME constants — so a
drift in either dialect fails the driver's value-hash compare.

Corpus rules (all closed-form from o_orderkey/o_custkey):
  host     = ``ext{k%97}.invalid``      when k % 13 == 0  (external,
             dropped by the F2 host-scope filter)
           = ``host{c%23}.example``     otherwise
  section  = SECTIONS[k % 5]  (same list as the crawl fixtures)
  suffix   = ``?ref=1#frag``  when k % 10 == 7  (query+fragment the F1
             canonicalizer must strip — reference utils/http.py:512-531)
  case     = scheme+host UPPERCASED when k % 17 == 0 (RFC-3986
             case-folding exercise)
  depth    = k % 8  (some rows exceed max_depth=5 → F2 rejects)
  visited  = rows with k % 3 == 0  (the seen-set for the F5 anti-join)
  status   = 503 when k % 41 == 0 else 200 (F7 retry family)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures import SECTIONS
from .functions.url import canonicalize, hash60, url_host

N_HOST_IDS = 23
EXT_MOD = 13
CASE_MOD = 17
QUERY_MOD = 10
QUERY_REM = 7
DEPTH_MOD = 8
VISITED_MOD = 3
FAIL_MOD = 41
MAX_DEPTH = 5
HOST_SCOPE_RE = r"^host\d+\.example$"
EPOCH_SECONDS = 60.0
SLOW_HOST_MOD = 5  # host_idx % 5 == 3 → crawl_delay 2.0 (mirrors fixtures)
SLOW_HOST_REM = 3


def _s(col: Column) -> Column:
    return col.cast("string")


def url_raw(k: Column, c: Column) -> Column:
    """The raw (pre-canonicalization) URL for order row (k, c)."""
    ext_host = F.concat(F.lit("ext"), _s(F.pmod(k, 97)), F.lit(".invalid"))
    int_host = F.concat(F.lit("host"), _s(F.pmod(c, N_HOST_IDS)), F.lit(".example"))
    host = F.when(F.pmod(k, EXT_MOD) == 0, ext_host).otherwise(int_host)
    section = F.element_at(
        F.array(*[F.lit(s) for s in SECTIONS]), (F.pmod(k, 5) + 1).cast("int")
    )
    suffix = F.when(
        F.pmod(k, QUERY_MOD) == QUERY_REM, F.lit("?ref=1#frag")
    ).otherwise(F.lit(""))
    lower = F.concat(F.lit("https://"), host)
    prefix = F.when(F.pmod(k, CASE_MOD) == 0, F.upper(lower)).otherwise(lower)
    return F.concat(prefix, F.lit("/"), section, F.lit("/"), _s(k), suffix)


def candidates_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → candidate URL rows (k, url_raw, url_canon, url_hash,
    host, depth). The shared entry of every frontier-relational query."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    df = o.select(
        k.alias("k"),
        url_raw(k, c).alias("url_raw"),
        F.pmod(k, DEPTH_MOD).cast("int").alias("depth"),
    )
    canon = canonicalize(F.col("url_raw"))
    return df.select(
        "k",
        "url_raw",
        canon.alias("url_canon"),
        hash60(canon).alias("url_hash"),
        url_host(canon).alias("host"),
        "depth",
    )


def visited_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The relational seen-set: url_hash of every k % 3 == 0 row."""
    return candidates_df(spark, sf_dir).filter(
        F.pmod(F.col("k"), VISITED_MOD) == 0
    ).select("url_hash")


# ---------------------------------------------------------------------------
# SQL mirrors (DuckDB dialect) — built from the same constants
# ---------------------------------------------------------------------------


def sql_section(k: str) -> str:
    whens = " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(SECTIONS))
    return f"(CASE ({k}) % 5 {whens} END)"


def sql_url_raw(k: str = "o_orderkey", c: str = "o_custkey") -> str:
    host = (
        f"(CASE WHEN ({k}) % {EXT_MOD} = 0 THEN 'ext' || (({k}) % 97) || '.invalid' "
        f"ELSE 'host' || (({c}) % {N_HOST_IDS}) || '.example' END)"
    )
    lower = f"('https://' || {host})"
    prefix = f"(CASE WHEN ({k}) % {CASE_MOD} = 0 THEN upper({lower}) ELSE {lower} END)"
    suffix = f"(CASE WHEN ({k}) % {QUERY_MOD} = {QUERY_REM} THEN '?ref=1#frag' ELSE '' END)"
    return f"({prefix} || '/' || {sql_section(k)} || '/' || ({k}) || {suffix})"


SQL_CANDIDATES = None  # assembled lazily in queries.py (needs url SQL fns)
