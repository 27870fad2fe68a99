"""Unit tests for priority / job-type / schedule / admission semantics,
including the three-dialect lockstep and politeness invariants."""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark import fixtures as fx
from crawler_spark.functions.url import py_hash60
from crawler_spark.operators import admission, schedule
from crawler_spark.operators.jobtype import job_type, py_job_type, sql_job_type
from crawler_spark.operators.priority import (
    priority_score,
    py_priority_score,
    sql_priority_score,
)

URLS = [
    ("https://host0.example/", 0),
    ("https://host1.example/articles/5", 1),
    ("https://host2.example/category/99", 2),
    ("https://host3.example/post/1234", 3),
    ("https://host4.example/about/7?x=1", 5),
    ("https://host5.example/view/88/deep/path", 4),
    ("https://host6.example/search/?page=3", 1),
]


def test_jobtype_three_dialects(spark):
    df = spark.createDataFrame([(u,) for u, _ in URLS], "url string")
    got = [r.jt for r in df.select(job_type(F.col("url")).alias("jt")).collect()]
    exp = [py_job_type(u) for u, _ in URLS]
    duck = [
        duckdb.execute(
            f"SELECT {sql_job_type('u')} FROM (VALUES (?)) t(u)", [u]
        ).fetchone()[0]
        for u, _ in URLS
    ]
    assert got == exp == duck


def test_priority_three_dialects(spark):
    df = spark.createDataFrame(URLS, "url string, depth int")
    df = df.withColumn("jt", job_type(F.col("url")))
    got = [
        r.p
        for r in df.select(
            priority_score(F.col("depth"), F.col("jt"), F.col("url")).alias("p")
        ).collect()
    ]
    exp = [py_priority_score(d, py_job_type(u), u) for u, d in URLS]
    duck = [
        duckdb.execute(
            f"SELECT {sql_priority_score('d', 'jt', 'u')} "
            f"FROM (VALUES (?, ?, ?)) t(u, d, jt)",
            [u, d, py_job_type(u)],
        ).fetchone()[0]
        for u, d in URLS
    ]
    assert got == exp == duck


@given(
    st.integers(min_value=0, max_value=10),
    st.sampled_from(["page", "list", "detail", "sitemap"]),
    st.integers(min_value=0, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_priority_formula_matches_reference_shape(depth, jt, nslash):
    """Weighted mean over matching policies, truncated toward zero
    (reference crawler.py:470-496)."""
    url = "https://h.example" + "/x" * nslash
    got = py_priority_score(depth, jt, url)
    num = depth * 10 * 1.0 + url.count("/") * 5 * 0.8
    den = 1.8
    if jt == "list":
        num, den = num - 20 * 1.5, den + 1.5
    elif jt == "detail":
        num, den = num - 10 * 1.0, den + 1.0
    elif jt == "sitemap":
        num, den = num - 30 * 2.0, den + 2.0
    assert got == int(num / den)


def test_schedule_respects_slots_and_tiebreak(spark):
    rows = []
    for h in range(3):
        for i in range(20):
            url = f"https://host{h}.example/post/{i}"
            rows.append((url, py_hash60(url), f"host{h}.example", 1, None, 1, 0))
    df = spark.createDataFrame(
        rows, "url_canon string, url_hash long, host string, depth int,"
        " parent_url string, attempt int, priority int"
    )
    robots = fx.robots_rules_df(spark, 5)
    out = schedule.select_epoch(schedule.with_slots(df, robots, epoch_seconds=5.0))
    got = out.groupBy("host").count().collect()
    # delay 1.0 -> 5 slots; host3 has delay 2.0 -> 2 slots (not in this set)
    for r in got:
        assert r["count"] == 5
    # per-host picks are the smallest url_hash (priority/depth equal)
    picked = {r.url_hash for r in out.collect()}
    for h in range(3):
        hashes = sorted(x[1] for x in rows if x[2] == f"host{h}.example")
        assert set(hashes[:5]) <= picked


def test_politeness_slot_cap_never_exceeded(spark):
    """Property: for any epoch output, per-host count <= slots(host)."""
    seeds = fx.seeds_df(spark, 300, 10)
    from crawler_spark.epoch import EpochConfig, run_crawl
    from crawler_spark.state.snapshots import SnapshotStore
    import tempfile

    robots = fx.robots_rules_df(spark, 10)
    with tempfile.TemporaryDirectory() as d:
        store = SnapshotStore(spark, d)
        run_crawl(
            spark, store, seeds,
            EpochConfig(epoch_seconds=8.0, epoch_budget=None, num_buckets=4),
            num_epochs=2, robots_rules=robots,
        )
        vis = store.read_upto("visited")
        per = vis.groupBy("host", "epoch").count().collect()
        for r in per:
            delay = max(1.0, fx.py_crawl_delay(r.host))
            slots = max(1, math.floor(8.0 / delay))
            assert r["count"] <= slots, (r.host, r.epoch, r["count"], slots)


def test_admission_rejects_depth_scope_robots(spark):
    cand = spark.createDataFrame(
        [
            ("https://host2.example/category/1", py_hash60("https://host2.example/category/1"), "host2.example", 1, None, 1),
            ("https://host1.example/a", py_hash60("https://host1.example/a"), "host1.example", 9, None, 1),
            ("https://ext1.invalid/a", py_hash60("https://ext1.invalid/a"), "ext1.invalid", 1, None, 1),
            ("https://host1.example/ok", py_hash60("https://host1.example/ok"), "host1.example", 1, None, 1),
        ],
        "url_canon string, url_hash long, host string, depth int, parent_url string, attempt int",
    )
    visited = spark.createDataFrame([], "url_hash long")
    robots = fx.robots_rules_df(spark, 5)  # host2 disallows /category/
    out = admission.admit(cand, visited, robots_rules=robots)
    assert [r.url_canon for r in out.collect()] == ["https://host1.example/ok"]
