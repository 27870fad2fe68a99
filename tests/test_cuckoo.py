"""Cuckoo-filter seen-set: insert/probe/delete + distributed build."""

import numpy as np
import pytest

from crawler_spark.state.cuckoo import CuckooSeenSet


def test_no_false_negatives_and_delete():
    keys = np.arange(10_000, dtype=np.int64) * 7919 + 3
    flt = CuckooSeenSet.for_keys(len(keys))
    assert flt.insert(keys) == 0  # no overflow at 0.84 load target
    assert flt.might_contain(keys).all()  # zero false negatives

    # delete half; deleted keys must be forgettable (re-crawl semantics)
    dele = keys[::2]
    assert flt.delete(dele) == 0
    assert flt.might_contain(keys[1::2]).all()  # survivors still present
    # deleted keys: mostly gone (residual hits = fingerprint collisions)
    fp_rate = flt.might_contain(dele).mean()
    assert fp_rate < 0.05


def test_false_positive_rate_bounded():
    keys = np.arange(20_000, dtype=np.int64) * 104729 + 17
    flt = CuckooSeenSet.for_keys(len(keys))
    flt.insert(keys)
    probe = np.arange(20_000, dtype=np.int64) * 15485863 + 11
    fresh = probe[~np.isin(probe, keys)]
    assert flt.might_contain(fresh).mean() < 0.02  # 16-bit fp, 2x4 slots


def test_merge_pair_insert_property():
    """Merging by (bucket, fingerprint) re-insert preserves membership."""
    a_keys = np.arange(5_000, dtype=np.int64) * 7 + 1
    b_keys = np.arange(5_000, dtype=np.int64) * 13 + 2
    merged = CuckooSeenSet.for_keys(20_000)
    fa = CuckooSeenSet(merged.m)
    fb = CuckooSeenSet(merged.m)
    fa.insert(a_keys)
    fb.insert(b_keys)
    merged.table = fa.table.copy()
    bi, bs = np.nonzero(fb.table)
    for i, s in zip(bi, bs):
        assert merged.insert_pair(int(i), int(fb.table[i, s]))
    assert merged.might_contain(a_keys).all()
    assert merged.might_contain(b_keys).all()


@pytest.mark.usefixtures("spark")
def test_distributed_build_and_probe(spark):
    df = spark.range(8_000).selectExpr("id * 2654435761 as url_hash")
    flt = CuckooSeenSet.build(df, "url_hash")
    keys = np.array([r.url_hash for r in df.collect()], dtype=np.int64)
    assert flt.might_contain(keys).all()

    from pyspark.sql import functions as F

    probe = flt.probe_udf(spark)
    hits = df.withColumn("maybe", probe(F.col("url_hash")))
    assert hits.filter(~F.col("maybe")).count() == 0


def test_overfull_insert_raises():
    """Strict contract: an over-full filter raises instead of silently
    dropping keys (which would be false negatives downstream)."""
    import numpy as np
    import pytest

    from crawler_spark.state.cuckoo import CuckooOverfullError, CuckooSeenSet

    flt = CuckooSeenSet.for_keys(1_000)
    keys = np.arange(10_000, dtype=np.int64)
    with pytest.raises(CuckooOverfullError):
        flt.insert(keys)
    # non-strict mode reports the drop count instead
    flt2 = CuckooSeenSet.for_keys(1_000)
    failed = flt2.insert(keys, strict=False)
    assert failed > 0
