"""Bloom seen-set: no false negatives (property), bounded FPR,
distributed build == local build, anti-join equivalence."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark.state.bloom import BloomSeenSet, anti_join_seen


@given(st.lists(st.integers(min_value=0, max_value=2**60 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_no_false_negatives(keys):
    m, k = BloomSeenSet.params(max(len(keys), 1), 0.01)
    bits = np.zeros(m // 8, dtype=np.uint8)
    arr = np.array(keys, dtype=np.int64)
    if arr.size:
        BloomSeenSet._set_bits(bits, arr, k)
    flt = BloomSeenSet(bits, k)
    if arr.size:
        assert flt.might_contain(arr).all()


def test_false_positive_rate_bounded():
    rng = np.random.Generator(np.random.PCG64(42))
    members = rng.integers(0, 2**60, size=20_000, dtype=np.int64)
    m, k = BloomSeenSet.params(len(members), 0.01)
    bits = np.zeros(m // 8, dtype=np.uint8)
    BloomSeenSet._set_bits(bits, members, k)
    flt = BloomSeenSet(bits, k)
    probes = rng.integers(0, 2**60, size=50_000, dtype=np.int64)
    fresh = probes[~np.isin(probes, members)]
    fpr = flt.might_contain(fresh).mean()
    assert fpr < 0.03, fpr


def test_distributed_build_matches(spark):
    df = spark.range(5_000).select(
        (F.col("id") * 2_654_435_761 % (2**60)).alias("url_hash")
    )
    flt = BloomSeenSet.build(df, expected_keys=5_000, fpp=0.01)
    keys = np.array([r.url_hash for r in df.collect()], dtype=np.int64)
    assert flt.might_contain(keys).all()


def test_anti_join_with_bloom_equals_exact(spark):
    cand = spark.range(2_000).select(F.col("id").alias("url_hash"))
    visited = spark.range(0, 2_000, 3).select(F.col("id").alias("url_hash"))
    flt = BloomSeenSet.build(visited, expected_keys=700, fpp=0.01)
    exact = {r.url_hash for r in anti_join_seen(cand, visited).collect()}
    bloomy = {r.url_hash for r in anti_join_seen(cand, visited, bloom=flt).collect()}
    assert exact == bloomy
