"""The oracle-checkable query registry — every operator family from
SURVEY.md §2 exposed as (Spark DataFrame program, DuckDB SQL) pairs
over the driver's testdata tables.

`REGISTRY[name] = (fn, sql_or_None)`; `fn(spark, sf_dir) -> DataFrame`.
Column names are aliased identically in both dialects (the driver's
value-hash compare sorts columns by name). Queries with no SQL mirror
(full-epoch runs, image payloads) get the driver's rows-only check.

Naming: f* frontier, q* classical-relational, s* storage, t* text,
dd* dedup, ann* similarity, mm* multimodal, fe* full-epoch.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import relational as R
from .functions import text as TX
from .functions.url import (
    sql_canonicalize,
    sql_hash60,
    sql_url_host,
    sql_url_path,
    url_path,
)
from .operators import dedup as DD
from .operators import similarity as SIM
from .operators.jobtype import job_type, sql_job_type
from .operators.priority import priority_score, sql_priority_score
from .operators.schedule import select_epoch, with_slots


# committed golden-table fixtures (tools/make_golden.py) for the
# non-SQL-expressible queries' DuckDB oracles
_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# SQL scaffolding for the frontier-relational corpus (mirrors relational.py)
# ---------------------------------------------------------------------------

_RAW = R.sql_url_raw()
_CANON = sql_canonicalize(_RAW)

SQL_CANDIDATES = (
    f"SELECT o_orderkey AS k, {_RAW} AS url_raw, {_CANON} AS url_canon, "
    f"{sql_hash60(_CANON)} AS url_hash, {sql_url_host(_CANON)} AS host, "
    f"(o_orderkey % {R.DEPTH_MOD})::INT AS depth FROM orders"
)
SQL_VISITED = (
    f"SELECT url_hash FROM ({SQL_CANDIDATES}) WHERE k % {R.VISITED_MOD} = 0"
)

# admission: depth cap + host scope + NOT IN visited (left anti)
SQL_ADMITTED = (
    f"WITH cand AS ({SQL_CANDIDATES}), vis AS ({SQL_VISITED}) "
    f"SELECT c.k, c.url_canon, c.url_hash, c.host, c.depth FROM cand c "
    f"WHERE c.depth <= {R.MAX_DEPTH} "
    f"AND regexp_matches(c.host, '{R.HOST_SCOPE_RE}') "
    f"AND NOT EXISTS (SELECT 1 FROM vis v WHERE v.url_hash = c.url_hash)"
)


# ---------------------------------------------------------------------------
# frontier family
# ---------------------------------------------------------------------------


def f1_canonicalize(spark, sf_dir):
    """F1: raw URL corpus → canonical form + portable 60-bit hash."""
    return R.candidates_df(spark, sf_dir).select(
        "k", "url_raw", "url_canon", "url_hash", "host"
    )


SQL_F1 = f"SELECT k, url_raw, url_canon, url_hash, host FROM ({SQL_CANDIDATES})"


def f2_admission(spark, sf_dir):
    """F2+F5: depth cap, host scope, anti-join vs the seen set."""
    cand = R.candidates_df(spark, sf_dir)
    vis = R.visited_df(spark, sf_dir)
    return (
        cand.filter(
            (F.col("depth") <= R.MAX_DEPTH) & F.col("host").rlike(R.HOST_SCOPE_RE)
        )
        .join(vis, "url_hash", "left_anti")
        .select("k", "url_canon", "url_hash", "host", "depth")
    )


SQL_F2 = f"SELECT k, url_canon, url_hash, host, depth FROM ({SQL_ADMITTED}) x"


def f4_priority(spark, sf_dir):
    """D5+F4: job-type classification + policy-engine priority score."""
    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    return cand.select(
        "k",
        "url_canon",
        job_type(F.col("url_canon")).alias("job_type"),
        priority_score(
            F.col("depth"), job_type(F.col("url_canon")), F.col("url_canon")
        ).alias("priority"),
    )


SQL_F4 = (
    f"SELECT k, url_canon, {sql_job_type('url_canon')} AS job_type, "
    f"{sql_priority_score('depth', sql_job_type('url_canon'), 'url_canon')} AS priority "
    f"FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL"
)


def f4b_simple_priority(spark, sf_dir):
    """F4b: the smart-loop simplified priority (smart_crawler.py:
    629-661) — k%6 rows get an important-pattern segment appended so
    the pattern bonus branch is live in both dialects."""
    from .operators.priority import simple_priority

    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    url_aug = F.when(
        F.pmod(F.col("k"), 6) == 0, F.concat(F.col("url_canon"), F.lit("/faq/"))
    ).otherwise(F.col("url_canon"))
    jt = job_type(url_aug)
    return cand.select(
        "k",
        url_aug.alias("url"),
        jt.alias("job_type"),
        simple_priority(F.col("depth"), jt, url_aug).alias("priority"),
    )


def _sql_f4b() -> str:
    from .operators.priority import sql_simple_priority

    url_aug = "(CASE WHEN k % 6 = 0 THEN url_canon || '/faq/' ELSE url_canon END)"
    jt = sql_job_type(url_aug)
    return (
        f"SELECT k, {url_aug} AS url, {jt} AS job_type, "
        f"{sql_simple_priority('depth', jt, url_aug)} AS priority "
        f"FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL"
    )


def f3_schedule(spark, sf_dir):
    """F3+F8: per-host politeness slots, window rank, global top-K —
    the distributed priority-queue pop."""
    adm = f2_admission(spark, sf_dir)
    adm = adm.withColumn("job_type", job_type(F.col("url_canon"))).withColumn(
        "priority",
        priority_score(F.col("depth"), F.col("job_type"), F.col("url_canon")),
    )
    # host{h}.example with h%5==3 is slow (delay 2.0), else 1.0
    host_idx = F.regexp_extract(F.col("host"), r"^host(\d+)\.example$", 1).cast("int")
    delay = F.when(
        F.pmod(host_idx, R.SLOW_HOST_MOD) == R.SLOW_HOST_REM, F.lit(2.0)
    ).otherwise(F.lit(1.0))
    adm = adm.withColumn(
        "slots", F.greatest(F.lit(1), F.floor(F.lit(R.EPOCH_SECONDS) / delay)).cast("int")
    )
    sel = select_epoch(adm, epoch_budget=500)
    return sel.select("k", "url_canon", "host", "priority", "depth", "host_rank")


SQL_F3 = f"""
WITH adm AS (
  SELECT k, url_canon, url_hash, host, depth,
         {sql_priority_score('depth', sql_job_type('url_canon'), 'url_canon')} AS priority
  FROM ({SQL_ADMITTED}) x
), slotted AS (
  SELECT *, (CASE WHEN (regexp_extract(host, 'host(\\d+)\\.example', 1)::INT) % {R.SLOW_HOST_MOD} = {R.SLOW_HOST_REM}
             THEN greatest(1, floor({R.EPOCH_SECONDS} / 2.0)) ELSE greatest(1, floor({R.EPOCH_SECONDS} / 1.0)) END) AS slots
  FROM adm
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY priority ASC, depth ASC, url_hash ASC) AS host_rank
  FROM slotted
)
SELECT k, url_canon, host, priority, depth, host_rank FROM ranked
WHERE host_rank <= slots
ORDER BY priority ASC, depth ASC, url_hash ASC LIMIT 500
"""


def f7_retry(spark, sf_dir):
    """F7: failed rows under the retry budget re-enter with attempt+1."""
    cand = R.candidates_df(spark, sf_dir)
    failed = cand.filter(F.pmod(F.col("k"), R.FAIL_MOD) == 0).withColumn(
        "attempts", F.pmod(F.col("k"), 4).cast("int")
    )
    return (
        failed.filter(F.col("attempts") < 3)
        .select("k", "url_canon", (F.col("attempts") + 1).alias("attempt"))
    )


SQL_F7 = (
    f"SELECT k, url_canon, ((k % 4)::INT + 1) AS attempt FROM ({SQL_CANDIDATES}) "
    f"WHERE k % {R.FAIL_MOD} = 0 AND (k % 4)::INT < 3"
)


def f15_metrics(spark, sf_dir):
    """F15: per-host fetch outcome aggregation (status closed-form)."""
    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    status = F.when(F.pmod(F.col("k"), R.FAIL_MOD) == 0, 503).otherwise(200)
    return (
        cand.withColumn("status", status)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("selected"),
            F.sum((F.col("status") == 200).cast("long")).alias("fetched_ok"),
            F.sum((F.col("status") != 200).cast("long")).alias("fetched_fail"),
            F.min("url_hash").alias("min_url_hash"),
        )
    )


SQL_F15 = f"""
SELECT host, count(*) AS selected,
       sum(CASE WHEN k % {R.FAIL_MOD} = 0 THEN 0 ELSE 1 END)::BIGINT AS fetched_ok,
       sum(CASE WHEN k % {R.FAIL_MOD} = 0 THEN 1 ELSE 0 END)::BIGINT AS fetched_fail,
       min(url_hash) AS min_url_hash
FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL GROUP BY host
"""


def f15_lineage(spark, sf_dir):
    """F15 lineage shape: per-host candidates vs admitted counts — the
    non-null admission lineage the metrics table carries per epoch
    (relational mirror of epoch.run_epoch's metrics job)."""
    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    adm = f2_admission(spark, sf_dir)
    c = cand.groupBy("host").agg(F.count(F.lit(1)).alias("candidates"))
    a = adm.groupBy("host").agg(F.count(F.lit(1)).alias("admitted"))
    return c.join(a, "host", "left").select(
        "host", "candidates", F.coalesce("admitted", F.lit(0)).alias("admitted")
    )


SQL_F15_LINEAGE = f"""
WITH c AS (SELECT host, count(*) AS candidates FROM ({SQL_CANDIDATES})
           WHERE url_canon IS NOT NULL GROUP BY host),
a AS (SELECT host, count(*) AS admitted FROM ({SQL_ADMITTED}) GROUP BY host)
SELECT c.host, c.candidates, coalesce(a.admitted, 0) AS admitted
FROM c LEFT JOIN a ON c.host = a.host
"""


def _oracle_out_links(url_canon, depth):
    """Portable (md5-hash60) variant of the fixtures' closed-form link
    graph — the engine's own out_links runs on the xxhash64 engine hash
    (not reproducible in DuckDB); this mirror keeps the F11 operator
    shape value-checkable. Same structure, different hash universe."""
    from .fixtures import EXTERNAL_MOD, FANOUT_MOD, QUERY_MOD, QUERY_REM, SECTIONS
    from .functions.url import hash60

    hu = hash60(url_canon)
    fanout = F.greatest(F.lit(0), F.pmod(hu, FANOUT_MOD) - depth).cast("int")
    parent_host = F.regexp_extract(url_canon, r"^https?://([^/]+)", 1)

    def child(i):
        hc = hash60(F.concat(url_canon, F.lit("#"), i.cast("string")))
        ext_host = F.concat(F.lit("ext"), F.pmod(hc, 97).cast("string"), F.lit(".invalid"))
        host = F.when(F.pmod(hc, EXTERNAL_MOD) == 0, ext_host).otherwise(parent_host)
        section = F.element_at(
            F.array(*[F.lit(s) for s in SECTIONS]), (F.pmod(hc, 5) + 1).cast("int")
        )
        ident = F.pmod(hc, 1_000_000_000).cast("string")
        q = F.when(
            F.pmod(hc, QUERY_MOD) == QUERY_REM,
            F.concat(F.lit("?ref="), i.cast("string"), F.lit("#frag")),
        ).otherwise(F.lit(""))
        return F.concat(F.lit("https://"), host, F.lit("/"), section, F.lit("/"), ident, q)

    return F.when(
        fanout > 0, F.transform(F.sequence(F.lit(0), fanout - 1), child)
    ).otherwise(F.array().cast("array<string>"))


def f11_link_emit(spark, sf_dir):
    """F11+F1: closed-form out-links of the 200 lowest-k admitted URLs
    at depth 0, exploded + canonicalized + deduped by url_hash."""
    seeds = (
        R.candidates_df(spark, sf_dir)
        .filter(F.col("url_canon").isNotNull() & F.col("host").rlike(R.HOST_SCOPE_RE))
        .orderBy("k")
        .limit(200)
        .select("url_canon")
    )
    from .functions.url import canonicalize, hash60, url_host

    links = seeds.select(
        F.col("url_canon").alias("parent"),
        F.explode(_oracle_out_links(F.col("url_canon"), F.lit(0))).alias("raw"),
    )
    canon = canonicalize(F.col("raw"))
    out = links.select(
        canon.alias("child_canon"), hash60(canon).alias("child_hash")
    ).filter(F.col("child_canon").isNotNull())
    return out.groupBy("child_hash").agg(
        F.min("child_canon").alias("child_canon"), F.count(F.lit(1)).alias("n_parents")
    )


def _sql_f11() -> str:
    from .fixtures import EXTERNAL_MOD, FANOUT_MOD, QUERY_MOD, QUERY_REM, SECTIONS

    seeds = (
        f"SELECT url_canon FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL "
        f"AND regexp_matches(host, '{R.HOST_SCOPE_RE}') ORDER BY k LIMIT 200"
    )
    hu = sql_hash60("url_canon")
    hc = sql_hash60("url_canon || '#' || i")
    sections = " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(SECTIONS))
    child = (
        f"'https://' || (CASE WHEN ({hc}) % {EXTERNAL_MOD} = 0 "
        f"THEN 'ext' || (({hc}) % 97) || '.invalid' "
        f"ELSE regexp_extract(url_canon, 'https?://([^/]+)', 1) END) "
        f"|| '/' || (CASE ({hc}) % 5 {sections} END) || '/' || (({hc}) % 1000000000) "
        f"|| (CASE WHEN ({hc}) % {QUERY_MOD} = {QUERY_REM} THEN '?ref=' || i || '#frag' ELSE '' END)"
    )
    raw = (
        f"WITH seeds AS ({seeds}), fan AS (SELECT url_canon, "
        f"greatest(0, ({hu}) % {FANOUT_MOD} - 0) AS fanout FROM seeds), "
        f"kids AS (SELECT url_canon, unnest(generate_series(0, fanout::INT - 1)) AS i "
        f"FROM fan WHERE fanout > 0), "
        f"raw AS (SELECT {child} AS raw FROM kids)"
    )
    canon = sql_canonicalize("raw")
    return (
        f"{raw}, c AS (SELECT {canon} AS child_canon FROM raw) "
        f"SELECT {sql_hash60('child_canon')} AS child_hash, "
        f"min(child_canon) AS child_canon, count(*) AS n_parents "
        f"FROM c WHERE child_canon IS NOT NULL GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# classical-relational family
# ---------------------------------------------------------------------------


def q1_pricing(spark, sf_dir):
    """TPC-H Q1 shape: returnflag/linestatus rollup over lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_topk_revenue(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + global top-10 (TakeOrdered)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""


def q5_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 5-way join, revenue per nation (broadcast dims)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


SQL_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def q_window_topn(spark, sf_dir):
    """Top-3 orders per customer by totalprice (window ranking)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rk")
    )


SQL_WINDOW_TOPN = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_events_tumbling(spark, sf_dir):
    """Tumbling 1-hour event-time window aggregation (streaming shape
    F13/F15 run as a batch query — same plan under readStream)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .drop("approx_users")  # approx differs across engines; keep exact cols
    )


SQL_EVENTS_TUMBLING = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_json(spark, sf_dir):
    """JSON prop extraction (reference meta_data JSON columns →
    get_json_object), bucketed aggregation."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select("event_id", k.alias("k"))
        .groupBy(F.pmod(F.col("k"), 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


SQL_EVENTS_JSON = """
SELECT (json_extract(props, '$.k')::INT) % 10 AS k_bucket,
       count(*) AS n, sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k
FROM events GROUP BY 1
"""


def q_sessionize(spark, sf_dir):
    """Session windows per user: 30-min inactivity gap via lag()."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, value, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# storage family
# ---------------------------------------------------------------------------


def s1_dedup_upsert(spark, sf_dir):
    """S1: MERGE-by-content-hash semantics (storage.py:103-211) as a
    window: latest version per hash wins; version = doc_id here."""
    d = _t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", TX.similarity_hash(F.col("text")).alias("content_hash"), "n_chars"
    )
    w = Window.partitionBy("content_hash").orderBy(F.col("doc_id").desc())
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("content_hash", F.col("doc_id").alias("kept_doc_id"), "n_chars")
    )


SQL_S1 = f"""
SELECT content_hash, doc_id AS kept_doc_id, n_chars FROM (
  SELECT doc_id, {TX.sql_similarity_hash('text')} AS content_hash, n_chars,
         row_number() OVER (PARTITION BY {TX.sql_similarity_hash('text')}
                            ORDER BY doc_id DESC) AS rn
  FROM documents
) WHERE rn = 1
"""


def s3_link_diff(spark, sf_dir):
    """S3: M:N link-table diff-update — stale deletes via EXCEPT,
    new inserts via anti-join (storage.py:213-271)."""
    o = _t(spark, sf_dir, "orders")
    cur = o.filter(F.pmod(F.col("o_orderkey"), 2) == 0).select(
        F.col("o_custkey").alias("a"), F.col("o_orderkey").alias("b")
    )
    new = o.filter(F.pmod(F.col("o_orderkey"), 3) == 0).select(
        F.col("o_custkey").alias("a"), F.col("o_orderkey").alias("b")
    )
    stale = cur.exceptAll(new).withColumn("op", F.lit("delete"))
    insert = new.exceptAll(cur).withColumn("op", F.lit("insert"))
    return stale.unionByName(insert)


SQL_S3 = """
WITH cur AS (SELECT o_custkey AS a, o_orderkey AS b FROM orders WHERE o_orderkey % 2 = 0),
     new AS (SELECT o_custkey AS a, o_orderkey AS b FROM orders WHERE o_orderkey % 3 = 0)
SELECT a, b, 'delete' AS op FROM (SELECT * FROM cur EXCEPT ALL SELECT * FROM new)
UNION ALL
SELECT a, b, 'insert' AS op FROM (SELECT * FROM new EXCEPT ALL SELECT * FROM cur)
"""


def s6_group_stats(spark, sf_dir):
    """S6: one-pass per-type stats (vs the reference's 4 filtered
    counts, storage.py:366-374)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


SQL_S6 = (
    "SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars, "
    "min(doc_id) AS min_doc_id FROM documents GROUP BY lang"
)


INDEX_TOUCH_TS = "2026-01-01 00:00:00"


def s7_index_touch(spark, sf_dir):
    """S7: MERGE column-update shape (storage.py:332-353 — set
    indexed_at for a batch of ids): left join the touch batch, update
    only matched rows; 'now' is a fixed literal (determinism ban)."""
    o = _t(spark, sf_dir, "orders")
    batch = o.filter(F.pmod(F.col("o_orderkey"), 7) == 0).select(
        F.col("o_orderkey").alias("k")
    )
    return o.join(batch, o.o_orderkey == batch.k, "left").select(
        "o_orderkey",
        F.when(F.col("k").isNotNull(), F.lit(INDEX_TOUCH_TS)).alias("indexed_at"),
    )


SQL_S7 = f"""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN '{INDEX_TOUCH_TS}' END AS indexed_at
FROM orders
"""


def s5_paged_scan(spark, sf_dir):
    """A9/S5: filtered scan with stable paging (window row_number —
    offset/limit without nondeterminism; operations.py:89-118)."""
    p = _t(spark, sf_dir, "part")
    w = Window.orderBy(F.col("p_partkey").asc())
    return (
        p.filter(F.col("p_size") >= 25)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 50) & (F.col("rn") <= 150))
        .select("p_partkey", "p_name", "p_size", "rn")
    )


SQL_S5 = """
SELECT p_partkey, p_name, p_size, rn FROM (
  SELECT p_partkey, p_name, p_size,
         row_number() OVER (ORDER BY p_partkey ASC) AS rn
  FROM part WHERE p_size >= 25
) WHERE rn > 50 AND rn <= 150
"""


# ---------------------------------------------------------------------------
# text family
# ---------------------------------------------------------------------------


def t_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        F.size(TX.content_tokens(F.col("text"))).alias("n_content_tokens"),
        TX.avg_token_len(F.col("text")).alias("avg_token_len"),
    )


SQL_T_TOKENS = (
    f"SELECT doc_id, {TX.sql_token_count('text')}::INT AS n_tokens, "
    f"len({TX.sql_content_tokens('text')})::INT AS n_content_tokens, "
    f"{TX.sql_avg_token_len('text')} AS avg_token_len FROM documents"
)


def t_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.punct_ratio(F.col("text")).alias("punct_ratio"),
        TX.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        TX.quality_score(F.col("text")).alias("quality"),
    )


SQL_T_QUALITY = (
    f"SELECT doc_id, {TX.sql_punct_ratio('text')} AS punct_ratio, "
    f"{TX.sql_stopword_ratio('text')} AS stopword_ratio, "
    f"{TX.sql_quality_score('text')} AS quality FROM documents"
)


def t_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", TX.lang_id(F.col("text")).alias("pred_lang")
    )


SQL_T_LANGID = (
    f"SELECT doc_id, lang, {TX.sql_lang_id('text')} AS pred_lang FROM documents"
)


# C9 exercise corpus: deterministic Persian-ish strings per doc_id,
# with Arabic-presentation forms (ي ك ة أ), Arabic-Indic digits, ZWNJ
# half-space and a combining kasra — every branch of the reference's
# PERSIAN_CHARS_MAP + NFKD strip (utils/text.py:19-48,126-150) fires.
FA_VOCAB = [
    "قانوني", "وكيل", "محكمة", "دادگاه", "قاضي", "حكم",
    "شكايت", "المادة", "٣٤٥", "می‌شود", "حقوقِ", "رأي",
]
_FA_WORDS = 6


def _fa_raw(doc_id):
    from .functions.url import hash60

    h = hash60(F.concat(F.lit("fa:"), doc_id.cast("string")))
    vocab = F.array(*[F.lit(w) for w in FA_VOCAB])
    words = [
        F.element_at(
            vocab, (F.pmod(F.shiftright(h, 3 * i), len(FA_VOCAB)) + 1).cast("int")
        )
        for i in range(_FA_WORDS)
    ]
    return F.concat_ws(" ", *words)


def _sql_fa_raw(doc_id: str = "doc_id") -> str:
    h = sql_hash60(f"'fa:' || {doc_id}")
    vocab = "[" + ", ".join(f"'{w}'" for w in FA_VOCAB) + "]"
    words = [
        f"({vocab})[((({h}) >> {3 * i}) % {len(FA_VOCAB)})::INT + 1]"
        for i in range(_FA_WORDS)
    ]
    return "(" + " || ' ' || ".join(words) + ")"


def t_fa_normalize(spark, sf_dir):
    """C9: Persian char-map normalization + tokenization over the
    synthetic Persian corpus."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    raw = _fa_raw(F.col("doc_id"))
    return d.select(
        "doc_id",
        raw.alias("fa_raw"),
        TX.fa_normalize(raw).alias("fa_norm"),
        F.size(TX.fa_tokens(raw)).alias("n_fa_tokens"),
    )


def _sql_t_fa_normalize() -> str:
    raw = _sql_fa_raw()
    return (
        f"SELECT doc_id, {raw} AS fa_raw, "
        f"{TX.sql_fa_normalize(raw)} AS fa_norm, "
        f"len({TX.sql_fa_tokens(raw)})::INT AS n_fa_tokens FROM documents"
    )


def t_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fingerprint")
    )


SQL_T_FINGERPRINT = (
    f"SELECT doc_id, {TX.sql_fingerprint('text')} AS fingerprint FROM documents"
)


# ---------------------------------------------------------------------------
# discovery family
# ---------------------------------------------------------------------------


def d1_url_features(spark, sf_dir):
    """D1: per-segment feature encoding (digit/slug/hash classes)."""
    from .operators import discovery as DIS

    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    feats = DIS.url_features(cand.select("k", "url_canon"))
    return cand.select("k", "url_canon").join(feats, "url_canon").select(
        "k",
        "url_canon",
        F.concat_ws(",", F.transform(F.col("features"), lambda x: x.cast("string"))).alias(
            "features_str"
        ),
    )


def _sql_d1() -> str:
    from .operators.discovery import sql_path_segments, sql_segment_feature

    segs = sql_path_segments("url_canon")
    feats = f"list_transform({segs}, s -> {sql_segment_feature('s')})"
    return (
        f"SELECT k, url_canon, array_to_string(list_transform({feats}, x -> x::VARCHAR), ',') "
        f"AS features_str FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL"
    )


def d2_url_templates(spark, sf_dir):
    """D2-D4: pattern mining as groupBy(template) — the scalable
    re-expression of the reference's DBSCAN clustering."""
    from .operators import discovery as DIS

    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    return DIS.mine_patterns(cand)


def _sql_d2() -> str:
    from .operators.discovery import sql_url_template

    jt = sql_job_type("url_canon")
    return (
        f"SELECT {sql_url_template('url_canon')} AS pattern, count(*) AS url_count, "
        f"min(url_canon) AS sample_url, "
        f"max(CASE WHEN {jt} = 'list' THEN 1 ELSE 0 END) AS is_list, "
        f"max(CASE WHEN {jt} = 'detail' THEN 1 ELSE 0 END) AS is_detail "
        f"FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL GROUP BY 1"
    )


def d8_url_similarity(spark, sf_dir):
    """D8: segment-overlap similarity between consecutive-k URL pairs."""
    from .operators.discovery import url_similarity

    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    a = cand.select(F.col("k").alias("ka"), F.col("url_canon").alias("url_a"))
    b = cand.select((F.col("k") - 1).alias("ka"), F.col("url_canon").alias("url_b"))
    return (
        a.join(b, "ka")
        .select(
            F.col("ka").alias("k"),
            "url_a",
            "url_b",
            url_similarity(F.col("url_a"), F.col("url_b")).alias("similarity"),
        )
    )


def _sql_d8() -> str:
    from .operators.discovery import sql_url_similarity

    return (
        f"WITH c AS (SELECT k, url_canon FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL) "
        f"SELECT a.k AS k, a.url_canon AS url_a, b.url_canon AS url_b, "
        f"{sql_url_similarity('a.url_canon', 'b.url_canon')} AS similarity "
        f"FROM c a JOIN c b ON b.k = a.k + 1"
    )


def d10_top_sections(spark, sf_dir):
    """D10: top-5 first path segments over the URL corpus."""
    from .operators.discovery import top_sections

    cand = R.candidates_df(spark, sf_dir).filter(F.col("url_canon").isNotNull())
    return top_sections(cand)


def _sql_d10() -> str:
    from .operators.discovery import sql_top_sections

    return sql_top_sections(
        f"(SELECT url_canon FROM ({SQL_CANDIDATES}) WHERE url_canon IS NOT NULL)",
        "url_canon",
    )


# ---------------------------------------------------------------------------
# sitemap family (A2 + A3 + F12)
# ---------------------------------------------------------------------------


def a2_robots_sitemaps(spark, sf_dir):
    """A2: scan robots.txt bodies for Sitemap: lines (per distinct host)."""
    from .operators import sitemap as SM

    hosts = (
        R.candidates_df(spark, sf_dir)
        .filter(F.col("host").rlike(R.HOST_SCOPE_RE))
        .select("host")
        .distinct()
    )
    robots = hosts.withColumn("robots_txt", SM.synth_robots_txt(F.col("host")))
    return robots.select(
        "host", F.explode(SM.robots_sitemaps(F.col("robots_txt"))).alias("sitemap_url")
    )


def _sql_a2() -> str:
    from .operators import sitemap as SM

    return f"""
WITH hosts AS (SELECT DISTINCT host FROM ({SQL_CANDIDATES})
               WHERE regexp_matches(host, '{R.HOST_SCOPE_RE}')),
r AS (SELECT host, {SM.sql_synth_robots_txt('host')} AS robots_txt FROM hosts)
SELECT host, unnest(regexp_extract_all(robots_txt, '(?m)^[Ss]itemap:\\s*(\\S+)', 1))
       AS sitemap_url
FROM r
"""


def a3_sitemap_expand(spark, sf_dir):
    """A3+F12: expand each host's sitemap tree (index recursion) into
    page frontier rows at depth 0."""
    from .operators import sitemap as SM

    sitemaps = a2_robots_sitemaps(spark, sf_dir).select(
        F.col("sitemap_url").alias("url")
    )
    return SM.expand_sitemaps(sitemaps).select("url_canon", "host", "parent_url")


def _sql_a3() -> str:
    from .operators import sitemap as SM

    loc_unnest = "unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1))"
    return f"""
WITH hosts AS (SELECT DISTINCT host FROM ({SQL_CANDIDATES})
               WHERE regexp_matches(host, '{R.HOST_SCOPE_RE}')),
sm0 AS (SELECT 'https://' || host || '/sitemap.xml' AS sm_url FROM hosts),
x0 AS (SELECT sm_url, {SM.sql_synth_sitemap_xml('sm_url')} AS xml FROM sm0),
e0 AS (SELECT sm_url, contains(xml, '<sitemapindex') AS is_idx, {loc_unnest} AS loc FROM x0),
sm1 AS (SELECT loc AS sm_url FROM e0 WHERE is_idx),
x1 AS (SELECT sm_url, {SM.sql_synth_sitemap_xml('sm_url')} AS xml FROM sm1),
e1 AS (SELECT sm_url, {loc_unnest} AS loc FROM x1),
pages AS (
  SELECT loc AS url_raw, sm_url AS parent_url FROM e0 WHERE NOT is_idx
  UNION ALL
  SELECT loc AS url_raw, sm_url AS parent_url FROM e1
)
SELECT DISTINCT {sql_canonicalize('url_raw')} AS url_canon,
       {sql_url_host(sql_canonicalize('url_raw'))} AS host, parent_url
FROM pages WHERE {sql_canonicalize('url_raw')} IS NOT NULL
"""


# ---------------------------------------------------------------------------
# content family (C1-C5 cascades over deterministic synthetic HTML)
# ---------------------------------------------------------------------------


def c_extract(spark, sf_dir):
    """C1+C3+C4+C5: title/date/author cascades + boilerplate-stripped
    text length, over per-doc synthetic HTML (1/7 of pages lack
    <title> → h1 fallback path is exercised)."""
    from .operators import content as C

    d = _t(spark, sf_dir, "documents")
    html = C.synth_html(F.col("doc_id"), F.col("text"))
    return d.select(
        "doc_id",
        C.extract_title(html).alias("title"),
        C.extract_date(html).alias("pub_date"),
        C.extract_author(html).alias("author"),
        F.length(C.clean_html(html)).alias("clean_len"),
    )


def _sql_c_extract() -> str:
    from .operators import content as C

    html = C.sql_synth_html()
    return (
        f"SELECT doc_id, {C.sql_extract_title(html)} AS title, "
        f"{C.sql_extract_date(html)} AS pub_date, "
        f"{C.sql_extract_author(html)} AS author, "
        f"length({C.sql_clean_html(html)})::INT AS clean_len FROM documents"
    )


def c2_main_content(spark, sf_dir):
    """C2: block scoring (content div vs nav) with the reference's
    formula; the content block must win on every synthetic page."""
    from .operators import content as C

    d = _t(spark, sf_dir, "documents")
    withhtml = d.select(
        "doc_id", C.synth_html(F.col("doc_id"), F.col("text")).alias("html")
    )
    return C.extract_main_content(withhtml).select(
        "doc_id", "div_score", "nav_score", F.length("main_content").alias("content_len")
    )


def _sql_c2() -> str:
    from .operators import content as C

    def feats(block, prefix):
        text = (
            f"trim(regexp_replace(regexp_replace({block}, '<[^>]*>', ' ', 'g'), "
            f"'\\s+', ' ', 'g'))"
        )
        n_p = f"(len(string_split({block}, '<p>')) - 1)"
        has_h = f"regexp_matches({block}, '<h[1-3]>')"
        link_text = (
            f"regexp_replace(array_to_string("
            f"regexp_extract_all({block}, '>([^<]*)</a>', 1), ' '), '\\s+', ' ', 'g')"
        )
        return (
            f"{text} AS {prefix}_text, {n_p} AS {prefix}_np, "
            f"{has_h} AS {prefix}_hh, {link_text} AS {prefix}_lt"
        )

    def score(p):
        ratio = (
            f"(CASE WHEN length({p}_text) > 0 "
            f"THEN length({p}_lt)::DOUBLE / length({p}_text) ELSE 0.0 END)"
        )
        return (
            f"(length({p}_text) + (CASE WHEN {p}_np > 2 THEN {p}_np * 50 ELSE 0 END) "
            f"+ (CASE WHEN {p}_hh THEN 100 ELSE 0 END) "
            f"- (CASE WHEN {ratio} > 0.5 THEN 200 ELSE 0 END))"
        )

    return f"""
WITH pages AS (SELECT doc_id, {C.sql_synth_html()} AS html FROM documents),
blocks AS (
  SELECT doc_id,
         regexp_extract(html, '<div class="content">(.*?)</div>', 1) AS div_b,
         regexp_extract(html, '<nav>(.*?)</nav>', 1) AS nav_b
  FROM pages
), f AS (
  SELECT doc_id, {feats('div_b', 'd')}, {feats('nav_b', 'n')} FROM blocks
)
SELECT doc_id, {score('d')}::BIGINT AS div_score, {score('n')}::BIGINT AS nav_score,
       (CASE WHEN {score('d')} >= {score('n')}
             THEN length(d_text) ELSE length(n_text) END)::INT AS content_len
FROM f
"""


def c7_list_items(spark, sf_dir):
    """C7: list pages (doc_id%3==0) → repeated item cards extracted as
    array<struct<title,link,summary>> → posexplode."""
    from .operators import content as C

    d = _t(spark, sf_dir, "documents").filter(F.pmod(F.col("doc_id"), 3) == 0)
    html = C.synth_list_html(F.col("doc_id"))
    return d.select(
        "doc_id", F.posexplode(C.list_items(html)).alias("pos", "item")
    ).select(
        "doc_id",
        "pos",
        F.col("item.title").alias("title"),
        F.col("item.link").alias("link"),
        F.col("item.summary").alias("summary"),
    )


def _sql_c7() -> str:
    from .operators import content as C

    block = f"regexp_extract(html, '{C.RE_ITEMS_BLOCK}', 1)"
    return f"""
WITH pages AS (SELECT doc_id, {C.sql_synth_list_html()} AS html
               FROM documents WHERE doc_id % 3 = 0),
ex AS (SELECT doc_id,
       regexp_extract_all({block}, '{C.RE_ITEM_TITLE}', 1) AS titles,
       regexp_extract_all({block}, '{C.RE_ITEM_LINK}', 1) AS links,
       regexp_extract_all({block}, '{C.RE_ITEM_SUMMARY}', 1) AS summaries
       FROM pages),
ex2 AS (SELECT doc_id, titles, links, summaries,
        unnest(generate_series(1, len(titles))) AS i FROM ex)
SELECT doc_id, (i - 1)::INT AS pos, titles[i] AS title, links[i] AS link,
       summaries[i] AS summary
FROM ex2
"""


def c8_related(spark, sf_dir):
    """C8: detail pages (doc_id%3!=0) → related-container anchors →
    skip-scheme filter → keep-first dedup → cap 10."""
    from .operators import content as C

    d = _t(spark, sf_dir, "documents").filter(F.pmod(F.col("doc_id"), 3) != 0)
    pages = d.select(
        "doc_id", C.synth_detail_related_html(F.col("doc_id")).alias("html")
    )
    return C.related_links(pages)


def _sql_c8() -> str:
    from .operators import content as C

    block = f"regexp_extract(html, '{C.RE_RELATED_BLOCK}', 1)"
    return f"""
WITH pages AS (SELECT doc_id, {C.sql_synth_detail_related_html()} AS html
               FROM documents WHERE doc_id % 3 <> 0),
ex AS (SELECT doc_id,
       regexp_extract_all({block}, '{C.RE_A_HREF}', 1) AS urls,
       regexp_extract_all({block}, '{C.RE_A_TEXT}', 1) AS titles
       FROM pages),
ex2 AS (SELECT doc_id, urls, titles,
        unnest(generate_series(1, len(urls))) AS i FROM ex),
ls AS (SELECT doc_id, i AS pos, urls[i] AS url, titles[i] AS title FROM ex2
       WHERE NOT regexp_matches(urls[i], '{C.SKIP_LINK_RE}')),
dd AS (SELECT *, row_number() OVER (PARTITION BY doc_id, url ORDER BY pos) AS rn
       FROM ls),
fst AS (SELECT doc_id, url, title, pos FROM dd WHERE rn = 1),
cp AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rk
       FROM fst)
SELECT doc_id, rk::INT AS rk, url, title FROM cp WHERE rk <= {C.RELATED_CAP}
"""


def d6_page_type(spark, sf_dir):
    """D6: repeated-element census → list/detail/generic (the 2-card
    list pages land in 'generic' — the <3-repeats branch is live)."""
    from .operators import content as C

    d = _t(spark, sf_dir, "documents")
    html = F.when(
        F.pmod(F.col("doc_id"), 3) == 0, C.synth_list_html(F.col("doc_id"))
    ).otherwise(C.synth_html(F.col("doc_id"), F.col("text")))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(html, F.lit(C.RE_CARD), 0)).alias("n_cards"),
        C.page_type_from_dom(html).alias("page_type"),
    )


def _sql_d6() -> str:
    from .operators import content as C

    html_case = (
        f"(CASE WHEN doc_id % 3 = 0 THEN {C.sql_synth_list_html()} "
        f"ELSE {C.sql_synth_html()} END)"
    )
    return (
        f"WITH pages AS (SELECT doc_id, {html_case} AS html FROM documents) "
        f"SELECT doc_id, len(regexp_extract_all(html, '{C.RE_CARD}'))::INT AS n_cards, "
        f"{C.sql_page_type_from_dom('html')} AS page_type FROM pages"
    )


# ---------------------------------------------------------------------------
# ML-feature family
# ---------------------------------------------------------------------------


def m1_tfidf_top3(spark, sf_dir):
    """M1: TF-IDF as explode + two aggregations; top-3 terms per doc.
    (The pyspark.ml HashingTF/IDF pipeline wraps the same math; this
    relational form is what the DuckDB oracle can check value-exactly.)"""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(df_, "term")
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf") / F.col("len"))
                * F.log(F.lit(float(n_docs)) / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


def m4_structural(spark, sf_dir):
    """M4: the full 12-feature structural vector per document, plus the
    reference's per-batch max-normalization shape for f_len (scalar agg
    + broadcast cross join — one treeAggregate, no global window)."""
    from . import ml as ML

    d = _t(spark, sf_dir, "documents")
    feats = ML.structural_features(d).select(
        "doc_id", *[F.round(F.col(c), 6).alias(c) for c in ML.STRUCTURAL_COLS]
    )
    mx = feats.agg(F.max("f_len").alias("__max_len"))
    return (
        feats.crossJoin(F.broadcast(mx))
        .withColumn("f_len_norm", F.round(F.col("f_len") / F.col("__max_len"), 6))
        .drop("__max_len")
    )


def _sql_m4() -> str:
    words = r"list_filter(string_split_regex(text, '\s+'), w -> w <> '')"
    sents = r"list_filter(string_split_regex(text, '[.!?؟]'), s -> trim(s) <> '')"
    paras = r"list_filter(string_split_regex(text, '\n\s*\n'), p -> trim(p) <> '')"

    def cc(pat):
        return f"(length(text) - length(regexp_replace(text, '{pat}', '', 'g')))"

    # precomputed: f-string expressions cannot contain backslashes (<py3.12)
    cc_punct = cc(r"[^\w\s]")
    cc_upper = cc("[A-Z]")
    cc_digit = cc(r"\d")
    cc_qmark = cc("[?؟]")
    cc_excl = cc("!")
    return f"""
WITH w AS (
  SELECT doc_id, text, length(text) AS n, {words} AS words,
         len({sents}) AS n_sents, len({paras}) AS n_paras
  FROM documents
), f AS (
  SELECT doc_id,
    round(n / 1000.0, 6) AS f_len,
    round(len(words)::DOUBLE, 6) AS f_words,
    round(n_sents::DOUBLE, 6) AS f_sentences,
    round(n_paras::DOUBLE, 6) AS f_paragraphs,
    round(CASE WHEN len(words) > 0 THEN n::DOUBLE / len(words) ELSE 0.0 END, 6) AS f_avg_word,
    round(CASE WHEN n_sents > 0 THEN len(words)::DOUBLE / n_sents ELSE 0.0 END, 6) AS f_avg_sentence,
    round(CASE WHEN n > 0 THEN {cc_punct}::DOUBLE / n ELSE 0.0 END, 6) AS f_punct_ratio,
    round(CASE WHEN n > 0 THEN {cc_upper}::DOUBLE / n ELSE 0.0 END, 6) AS f_upper_ratio,
    round(CASE WHEN n > 0 THEN {cc_digit}::DOUBLE / n ELSE 0.0 END, 6) AS f_digit_ratio,
    round(CASE WHEN len(words) > 0 THEN len(list_distinct(words))::DOUBLE / len(words) ELSE 0.0 END, 6) AS f_unique_ratio,
    round({cc_qmark}::DOUBLE, 6) AS f_qmarks,
    round({cc_excl}::DOUBLE, 6) AS f_exclaims
  FROM w
)
SELECT f.*, round(f_len / mx, 6) AS f_len_norm
FROM f CROSS JOIN (SELECT max(round(length(text) / 1000.0, 6)) AS mx FROM documents)
"""


def _sql_m1() -> str:
    toks = TX.sql_tokens("text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
doclen AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round((tf.tf::DOUBLE / doclen.len) * ln(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN doclen USING (doc_id) JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# dedup + similarity families
# ---------------------------------------------------------------------------


def dd_exact(spark, sf_dir):
    return DD.exact_groups(_t(spark, sf_dir, "documents"))


def dd_minhash_buckets(spark, sf_dir):
    return DD.lsh_buckets(_t(spark, sf_dir, "documents"))


def dd_minhash_pairs(spark, sf_dir):
    return DD.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))


def dd_simhash(spark, sf_dir):
    return DD.simhash(_t(spark, sf_dir, "documents"))


def dd_jaccard(spark, sf_dir):
    return DD.jaccard_pairs(_t(spark, sf_dir, "documents"))


# Deterministic phash corpus for the image near-dup operator: one
# 60-bit hash per "image" (doc_id), with planted near-duplicates —
# every decade's 7-row is its 0-row's phash with 3 bits flipped
# (found at d=3), the 8-row with 1 bit (found), the 9-row with 5
# bits (correctly NOT found). Pure column expressions in both
# dialects, so the DuckDB oracle can brute-force the ground truth.
_PH_M3 = (1 << 2) | (1 << 25) | (1 << 55)
_PH_M1 = 1 << 40
_PH_M5 = (1 << 3) | (1 << 17) | (1 << 29) | (1 << 44) | (1 << 59)


def _phash_images(spark, sf_dir):
    from .functions.url import hash60

    d = _t(spark, sf_dir, "documents").select("doc_id")
    own = hash60(F.concat(F.lit("ph:"), F.col("doc_id").cast("string")))
    partner = (F.col("doc_id") - F.pmod(F.col("doc_id"), 10)).cast("long")
    base = hash60(F.concat(F.lit("ph:"), partner.cast("string")))
    r = F.pmod(F.col("doc_id"), 10)
    phash = (
        F.when(r == 7, base.bitwiseXOR(F.lit(_PH_M3)))
        .when(r == 8, base.bitwiseXOR(F.lit(_PH_M1)))
        .when(r == 9, base.bitwiseXOR(F.lit(_PH_M5)))
        .otherwise(own)
    )
    return d.select(F.col("doc_id").alias("image_id"), phash.alias("phash"))


def dd_phash_neardup(spark, sf_dir):
    """Image-axis near-dup: 64-bit perceptual-hash pairs within
    Hamming distance 3 via Manku-style block pigeonholing (C(6,3)
    exact-match band keys, the only shuffle) + bit_count(xor)
    verify. The oracle brute-forces all pairs — a STRONGER check
    than mirroring the banding: it proves the pigeonhole generates
    every qualifying pair (no false negatives). blocks is pinned to
    the static default so the plan (and oracle) are corpus-size-
    independent; blocks=None would derive it via blocks_for_corpus."""
    return DD.phash_neardup_pairs(
        _phash_images(spark, sf_dir), blocks=DD.PHASH_BLOCKS
    )


def _sql_dd_phash() -> str:
    own = sql_hash60("'ph:' || doc_id")
    base = sql_hash60("'ph:' || (doc_id - doc_id % 10)")
    return (
        f"WITH ph AS (SELECT doc_id AS image_id, CASE doc_id % 10 "
        f"WHEN 7 THEN xor({base}, {_PH_M3}) "
        f"WHEN 8 THEN xor({base}, {_PH_M1}) "
        f"WHEN 9 THEN xor({base}, {_PH_M5}) "
        f"ELSE {own} END AS phash FROM documents) "
        f"SELECT a.image_id AS id_a, b.image_id AS id_b, "
        f"bit_count(xor(a.phash, b.phash))::INTEGER AS hamming "
        f"FROM ph a JOIN ph b ON a.image_id < b.image_id "
        f"WHERE bit_count(xor(a.phash, b.phash)) <= {DD.PHASH_MAX_HAMMING}"
    )


def ann_cosine_topk(spark, sf_dir):
    return SIM.cosine_topk(_t(spark, sf_dir, "embeddings"))


def ann_lsh_census(spark, sf_dir):
    return SIM.lsh_bucket_census(_t(spark, sf_dir, "embeddings"))


def dd_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup: banded sign-bit LSH candidates →
    exact cosine verify. planes_per_band derives from the corpus count
    (the scale path: bucket count grows with N); the static oracle
    pins planes_for_corpus(500)=4, the value at the sf0.01/sf0.001
    correctness scale."""
    return SIM.embed_neardup_pairs(_t(spark, sf_dir, "embeddings"))


def ann_ivf_census(spark, sf_dir):
    return SIM.ivf_cell_census(_t(spark, sf_dir, "embeddings"))


def ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k: sampled coarse quantizer (nlist=16),
    nprobe=4 — the middle rung of the ANN ladder (brute force / IVF /
    sign-bit LSH). With nprobe=nlist it reproduces ann_cosine_topk
    bit-for-bit (tests/test_new_operators.py pins that property)."""
    return SIM.ivf_topk(_t(spark, sf_dir, "embeddings"))


def ann_ivf_arrow(spark, sf_dir):
    """The SCALE form of ann_ivf_topk: same quantizer and semantics but
    assignment + probe run through the broadcast-matmul Arrow path
    (mode="arrow") instead of literal centroid expressions — the shape
    that survives nlist ≈ N/10^4 at 10^9 vectors (tests/test_ivf.py
    exercises nlist=1024). At nlist=16 it must match the literal path's
    assignments exactly, so the same DuckDB oracle value-checks it."""
    return SIM.ivf_topk(_t(spark, sf_dir, "embeddings"), mode="arrow")


# ---------------------------------------------------------------------------
# full-epoch queries (no SQL oracle — rows-only driver check; the pytest
# parity simulator is the exact oracle for these)
# ---------------------------------------------------------------------------


def fe_epoch(spark, sf_dir):
    """One full scheduling epoch on the synthetic world: 300 seeds →
    canonicalize → admit → rank → fetch → fetched rows.

    The snapshot store lives in a session-scoped scratch dir (cleaned
    at interpreter exit) so the returned DataFrame is a plain pruned
    parquet scan — NO driver-side collect anywhere in the query path
    (a full-epoch result must stay distributed at scale)."""
    import atexit
    import shutil

    from . import fixtures as fx
    from .epoch import EpochConfig, run_crawl
    from .state.snapshots import SnapshotStore

    cfg = EpochConfig(epoch_budget=2000, use_bloom=False)
    seeds = fx.seeds_df(spark, 300)
    robots = fx.robots_rules_df(spark)
    tmp = tempfile.mkdtemp(prefix="fe_epoch_")
    atexit.register(shutil.rmtree, tmp, True)
    store = SnapshotStore(spark, tmp)
    run_crawl(spark, store, seeds, cfg, num_epochs=2, robots_rules=robots)
    return store.read_upto("visited").select(
        "url_hash", "url_canon", "host", "depth", "priority"
    )


def fe_recrawl(spark, sf_dir):
    """F14 recrawl flow, value-oracled: crawl 2 epochs (the fe_epoch
    configuration), tombstone every 5th visited URL (pmod(url_hash, 5)
    == 0 — matched by Python's non-negative ``uh % 5`` in the golden
    generator), run one more epoch uncapped, and return the RE-fetched
    rows (semi-joined against the committed tombstone table, so newly
    discovered hash%5==0 URLs can't leak in).

    Golden oracle (tools/make_golden.py): the parity simulator's
    visited rows restricted to the tombstoned set, with phash from the
    pure-Python codec — the claim under value-check is the full recrawl
    contract: tombstone epoch → visited subtraction → re-admission via
    the append-only frontier → re-fetch BIT-identical to the original
    fetch (same depth/priority/phash). Reference analogue: the smart
    loop's periodic re-crawl of known pages (smart_crawler.py).

    The driver-side collect of the tombstone URL list is the
    operation's API shape (recrawl() takes an operator-supplied URL
    list), not a data-path collect — ~190 URLs here."""
    import atexit
    import shutil

    from . import fixtures as fx
    from .epoch import EpochConfig, recrawl, run_crawl, run_epoch
    from .state.snapshots import SnapshotStore

    cfg = EpochConfig(epoch_budget=2000, use_bloom=False)
    seeds = fx.seeds_df(spark, 300)
    robots = fx.robots_rules_df(spark)
    tmp = tempfile.mkdtemp(prefix="fe_recrawl_")
    atexit.register(shutil.rmtree, tmp, True)
    store = SnapshotStore(spark, tmp)
    run_crawl(spark, store, seeds, cfg, num_epochs=2, robots_rules=robots)
    urls = [
        r.url_canon
        for r in store.read_upto("visited")
        .filter(F.pmod(F.col("url_hash"), F.lit(5)) == 0)
        .select("url_canon")
        .collect()
    ]
    info = recrawl(spark, store, urls)
    # uncapped: every re-admitted URL must be re-fetched THIS epoch for
    # the golden to be closed-form, so both caps come off — the global
    # budget AND the politeness window (new depth-2 list-type URLs can
    # outrank a recrawled depth-1 page in the host window, so a 60-slot
    # cap would defer a tombstoned URL to a later epoch)
    final_cfg = EpochConfig(
        epoch_budget=None, epoch_seconds=1e6, use_bloom=False
    )
    run_epoch(
        spark, store, info["epoch"] + 1, final_cfg, robots_rules=robots
    )
    tomb = store.read_table(info["epoch"], "recrawl").select("url_hash")
    return (
        store.read_table(info["epoch"] + 1, "fetched")
        .join(tomb, "url_hash", "left_semi")
        .select("url_hash", "url_canon", "host", "depth", "priority", "phash")
    )


def mm_decode_stats(spark, sf_dir):
    """Multimodal plumbing: synthesize image bytes for 100 doc ids,
    decode via mapInPandas, return (id, w, h, fmt, phash, mean_pixel).
    Deterministic but not SQL-expressible (binary codec) → rows-only."""
    import pandas as pd

    from . import fixtures as fx
    from .functions import image as img

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select("doc_id")

    def gen(it):
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                uh = fx.py_xxhash64(f"doc:{doc_id}")
                p = fx.py_fetch_payload(uh)
                px = (
                    img.decode_png(p["bytes"])
                    if p["fmt"] == "png"
                    else img.decode_qz5(p["bytes"])
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "w": p["w"],
                        "h": p["h"],
                        "fmt": p["fmt"],
                        "phash": p["phash"],
                        "mean_pixel": round(float(px.mean()), 4),
                    }
                )
            yield pd.DataFrame(rows)

    return d.mapInPandas(
        gen, schema="doc_id long, w int, h int, fmt string, phash long, mean_pixel double"
    )


def mm_frame_sample(spark, sf_dir):
    """Multimodal video plumbing: synthesize vraw containers (8-12
    frames each) for 30 doc ids, sample every 4th frame via the
    stride-seek mapInPandas operator, return per-frame metadata +
    mean pixel. Deterministic; binary codec → rows-only check (the
    pytest asserts pixel equality against the frame ground truth)."""
    import pandas as pd

    from . import fixtures as fx
    from .functions import image as img
    from .functions import multimodal as MM

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).select("doc_id")

    def synth(it):
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                vid = f"vid:{int(doc_id)}"
                n = 8 + int(doc_id) % 5
                frames = [
                    fx.py_pixels(fx.py_xxhash64(f"{vid}:f{i}"), 16, 12)
                    for i in range(n)
                ]
                rows.append(
                    {"video_id": vid, "bytes": MM.encode_vraw(frames), "fmt": "vraw"}
                )
            yield pd.DataFrame(rows, columns=["video_id", "bytes", "fmt"])

    videos = d.mapInPandas(synth, schema="video_id string, bytes binary, fmt string")
    sampled = MM.frame_sample(videos, every_n=4)

    def stats(it):
        for pdf in it:
            rows = []
            for vid, idx, fb, w, h, ph in zip(
                pdf["video_id"], pdf["frame_idx"], pdf["frame_bytes"],
                pdf["w"], pdf["h"], pdf["phash"],
            ):
                px = img.decode_png(bytes(fb))
                rows.append(
                    {
                        "video_id": vid,
                        "frame_idx": int(idx),
                        "w": int(w),
                        "h": int(h),
                        "phash": int(ph),
                        "mean_pixel": round(float(px.mean()), 4),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "frame_idx", "w", "h", "phash", "mean_pixel"],
            )

    return sampled.mapInPandas(
        stats,
        schema="video_id string, frame_idx int, w int, h int, phash long,"
        " mean_pixel double",
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

REGISTRY: dict[str, tuple] = {
    # frontier
    "f1_canonicalize": (f1_canonicalize, SQL_F1),
    "f2_admission": (f2_admission, SQL_F2),
    "f3_schedule": (f3_schedule, SQL_F3),
    "f4_priority": (f4_priority, SQL_F4),
    "f7_retry": (f7_retry, SQL_F7),
    "f11_link_emit": (f11_link_emit, _sql_f11()),
    "f15_metrics": (f15_metrics, SQL_F15),
    "f15_lineage": (f15_lineage, SQL_F15_LINEAGE),
    # classical relational
    "q1_pricing": (q1_pricing, SQL_Q1),
    "q3_topk_revenue": (q3_topk_revenue, SQL_Q3),
    "q5_nation_revenue": (q5_nation_revenue, SQL_Q5),
    "q_window_topn": (q_window_topn, SQL_WINDOW_TOPN),
    "q_events_tumbling": (q_events_tumbling, SQL_EVENTS_TUMBLING),
    "q_events_json": (q_events_json, SQL_EVENTS_JSON),
    "q_sessionize": (q_sessionize, SQL_SESSIONIZE),
    # storage
    "s1_dedup_upsert": (s1_dedup_upsert, SQL_S1),
    "s3_link_diff": (s3_link_diff, SQL_S3),
    "s5_paged_scan": (s5_paged_scan, SQL_S5),
    "s6_group_stats": (s6_group_stats, SQL_S6),
    "s7_index_touch": (s7_index_touch, SQL_S7),
    # sitemap sources
    "a2_robots_sitemaps": (a2_robots_sitemaps, _sql_a2()),
    "a3_sitemap_expand": (a3_sitemap_expand, _sql_a3()),
    # discovery
    "d1_url_features": (d1_url_features, _sql_d1()),
    "d2_url_templates": (d2_url_templates, _sql_d2()),
    "d8_url_similarity": (d8_url_similarity, _sql_d8()),
    "d10_top_sections": (d10_top_sections, _sql_d10()),
    # content extraction
    "c_extract": (c_extract, _sql_c_extract()),
    "c2_main_content": (c2_main_content, _sql_c2()),
    "c7_list_items": (c7_list_items, _sql_c7()),
    "c8_related": (c8_related, _sql_c8()),
    "d6_page_type": (d6_page_type, _sql_d6()),
    # ML features
    "m1_tfidf_top3": (m1_tfidf_top3, _sql_m1()),
    "m4_structural": (m4_structural, _sql_m4()),
    # text
    "t_tokens": (t_tokens, SQL_T_TOKENS),
    "t_quality": (t_quality, SQL_T_QUALITY),
    "t_langid": (t_langid, SQL_T_LANGID),
    "t_fingerprint": (t_fingerprint, SQL_T_FINGERPRINT),
    "t_fa_normalize": (t_fa_normalize, _sql_t_fa_normalize()),
    # dedup
    "dd_exact": (dd_exact, DD.sql_exact_groups()),
    "dd_minhash_pairs": (dd_minhash_pairs, DD.sql_lsh_candidate_pairs()),
    "dd_simhash": (dd_simhash, DD.sql_simhash()),
    "dd_jaccard": (dd_jaccard, DD.sql_jaccard_pairs()),
    "dd_phash_neardup": (dd_phash_neardup, _sql_dd_phash()),
    # similarity
    "ann_cosine_topk": (ann_cosine_topk, SIM.sql_cosine_topk()),
    "dd_embed_neardup": (dd_embed_neardup, SIM.sql_embed_neardup_pairs()),
    # the scale-safe (broadcast-matmul) IVF path, forced past the
    # literal-Project threshold — the plan shape the 10^9-vector regime
    # actually runs. Its literal-expression sibling ann_ivf_topk (same
    # DuckDB oracle, small-nlist plan) moved to the registry tail in
    # round 5 to make room for fe_recrawl — precedent: the r4
    # f4b_simple_priority demotion of a subsumed sibling.
    "ann_ivf_arrow": (ann_ivf_arrow, SIM.sql_ivf_topk()),
    # full-epoch / multimodal — golden-table value oracles: the
    # expected rows are INDEPENDENTLY precomputed (pure-Python parity
    # simulator for the epoch, pure-Python codecs for the multimodal
    # ops — tools/make_golden.py) into committed parquet fixtures;
    # DuckDB reads the fixture, so these get the full row/schema/value
    # hash check instead of the weaker rows-only check. The mm_*
    # oracles semi-join `documents` so the expected row set follows
    # the sf dir's actual doc_ids.
    "fe_epoch": (
        fe_epoch,
        "SELECT url_hash, url_canon, host, depth, priority "
        f"FROM read_parquet('{_GOLDEN_DIR}/fe_epoch.parquet')",
    ),
    "mm_decode_stats": (
        mm_decode_stats,
        "SELECT doc_id, w, h, fmt, phash, mean_pixel "
        f"FROM read_parquet('{_GOLDEN_DIR}/mm_decode_stats.parquet') "
        "WHERE doc_id IN (SELECT doc_id FROM documents WHERE doc_id < 100)",
    ),
    "mm_frame_sample": (
        mm_frame_sample,
        "SELECT video_id, frame_idx, w, h, phash, mean_pixel "
        f"FROM read_parquet('{_GOLDEN_DIR}/mm_frame_sample.parquet') "
        "WHERE doc_id IN (SELECT doc_id FROM documents WHERE doc_id < 30)",
    ),
    # F14 recrawl flow (round-4 flagship) — golden value oracle: the
    # re-fetched rows must be bit-identical to the parity simulator's
    # original visited rows for the tombstoned subset (incl. phash)
    "fe_recrawl": (
        fe_recrawl,
        "SELECT url_hash, url_canon, host, depth, priority, phash "
        f"FROM read_parquet('{_GOLDEN_DIR}/fe_recrawl.parquet')",
    ),
    # --- registry tail (below this line is OUTSIDE the driver's ---------
    # attestation window — see ATTESTED). Census variants: each is
    # subsumed by its pairs/topk sibling above (same bucketing plan,
    # weaker output). They remain fully oracle-checked when the whole
    # registry is run (tools/check_oracle.py checks all entries).
    "dd_minhash_buckets": (dd_minhash_buckets, DD.sql_lsh_buckets()),
    "ann_lsh_census": (ann_lsh_census, SIM.sql_lsh_bucket_census()),
    "ann_ivf_census": (ann_ivf_census, SIM.sql_ivf_cell_census()),
    # simplified-priority variant of f4_priority (reference's
    # "simple mode") — demoted in r4 in favor of ann_ivf_arrow; still
    # fully oracle-checked by tools/check_oracle.py
    "f4b_simple_priority": (f4b_simple_priority, _sql_f4b()),
    # literal-expression IVF sibling of ann_ivf_arrow (same oracle,
    # small-nlist plan shape) — demoted in r5 in favor of fe_recrawl
    "ann_ivf_topk": (ann_ivf_topk, SIM.sql_ivf_topk()),
}

# The driver attests exactly the first 50 registry entries
# (CORRECTNESS_r{N}.json). Membership of that window is DELIBERATE —
# this constant makes it explicit and the assertion below makes any
# accidental reorder a loud import-time failure instead of a silent
# attestation change (ADVICE r4). Tail entries stay value-checked by
# tools/check_oracle.py.
ATTESTED_WINDOW = 50
ATTESTED = (
    "f1_canonicalize", "f2_admission", "f3_schedule", "f4_priority",
    "f7_retry", "f11_link_emit", "f15_metrics", "f15_lineage",
    "q1_pricing", "q3_topk_revenue", "q5_nation_revenue", "q_window_topn",
    "q_events_tumbling", "q_events_json", "q_sessionize",
    "s1_dedup_upsert", "s3_link_diff", "s5_paged_scan", "s6_group_stats",
    "s7_index_touch", "a2_robots_sitemaps", "a3_sitemap_expand",
    "d1_url_features", "d2_url_templates", "d8_url_similarity",
    "d10_top_sections", "c_extract", "c2_main_content", "c7_list_items",
    "c8_related", "d6_page_type", "m1_tfidf_top3", "m4_structural",
    "t_tokens", "t_quality", "t_langid", "t_fingerprint",
    "t_fa_normalize", "dd_exact", "dd_minhash_pairs", "dd_simhash",
    "dd_jaccard", "dd_phash_neardup", "ann_cosine_topk",
    "dd_embed_neardup", "ann_ivf_arrow", "fe_epoch", "mm_decode_stats",
    "mm_frame_sample", "fe_recrawl",
)
assert list(REGISTRY)[:ATTESTED_WINDOW] == list(ATTESTED), (
    "driver-attested window drifted — reorder REGISTRY or update "
    "ATTESTED deliberately"
)


def queries():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
