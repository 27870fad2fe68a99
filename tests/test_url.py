"""F1 — canonicalization + portable hash: Spark == Python == DuckDB,
plus property tests (idempotence)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark.functions import url as U

CASES = [
    "https://Host3.EXAMPLE/Articles/7?page=2#frag",
    "http://host0.example/",
    "https://host0.example",
    "https://host1.example/a/b/c?x=1&y=2",
    "javascript:void(0)",
    "mailto:x@y.z",
    "relative/path",
    "",
    "https://ext5.invalid/view/99#x",
]


def test_canonicalize_spark_vs_python(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = [r.c for r in df.select(U.canonicalize(F.col("url")).alias("c")).collect()]
    exp = [U.py_canonicalize(u) for u in CASES]
    assert got == exp


def test_canonicalize_duckdb_parity():
    for u in CASES:
        got = duckdb.execute(
            f"SELECT {U.sql_canonicalize('s')} AS c FROM (VALUES (?)) t(s)", [u]
        ).fetchone()[0]
        assert got == U.py_canonicalize(u), u


def test_hash60_three_dialects(spark):
    strings = ["", "a", "https://host0.example/", "สวัสดี", "x" * 500]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r.h for r in df.select(U.hash60(F.col("s")).alias("h")).collect()]
    exp = [U.py_hash60(s) for s in strings]
    duck = [
        duckdb.execute(
            f"SELECT {U.sql_hash60('s')} AS h FROM (VALUES (?)) t(s)", [s]
        ).fetchone()[0]
        for s in strings
    ]
    assert got == exp == duck
    assert all(0 <= h < 2**60 for h in exp)


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(s):
    c = U.py_canonicalize(s)
    if c is not None:
        assert U.py_canonicalize(c) == c


def test_query_fragment_stripped():
    a = U.py_canonicalize("https://h.example/p/q?x=1#f")
    b = U.py_canonicalize("https://h.example/p/q")
    assert a == b == "https://h.example/p/q"


def test_host_path_helpers(spark):
    df = spark.createDataFrame([("https://HOST2.example/a/b?q=1",)], "url string")
    r = df.select(
        U.url_host(F.col("url")).alias("h"), U.url_path(F.col("url")).alias("p")
    ).collect()[0]
    assert r.h == "host2.example"
    assert r.p == "/a/b"
    assert U.py_host("https://HOST2.example/a/b?q=1") == "host2.example"
    assert U.py_path("https://HOST2.example/a/b?q=1") == "/a/b"


def test_resolve_href(spark):
    df = spark.createDataFrame(
        [("https://h.example/a/b", "../c"), ("https://h.example/a/", "d?x=1")],
        "base string, href string",
    )
    got = [r.u for r in df.select(U.resolve_href("base", "href").alias("u")).collect()]
    assert got == ["https://h.example/c", "https://h.example/a/d?x=1"]
