"""phash Hamming near-dup (image axis): the Manku-style block
pigeonholing must be EXACT — equal to brute-force all-pairs — and the
planted fixture pairs must come out at their exact distances."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (
    PHASH_BLOCKS,
    _phash_block_layout,
    blocks_for_corpus,
    phash_neardup_pairs,
)
from crawler_spark.queries import _PH_M1, _PH_M3, _PH_M5, _phash_images


def test_block_layout_covers_64_bits():
    for b in (4, 5, 6, 8):
        layout = _phash_block_layout(b)
        assert sum(w for _, w in layout) == 64
        off = 0
        for o, w in layout:
            assert o == off
            off += w


@pytest.fixture(scope="module")
def images(spark):
    return _phash_images(spark, "/root/testdata/sf0.001").cache()


def test_planted_pairs_found_at_exact_distance(images):
    rows = phash_neardup_pairs(images, max_hamming=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in rows}
    decades = sorted({r.image_id - r.image_id % 10 for r in images.collect()})
    for d0 in decades:
        ids = {r.image_id for r in images.collect()}
        if d0 + 7 in ids:
            assert got.get((d0, d0 + 7)) == 3  # 3-bit flip found
        if d0 + 8 in ids:
            assert got.get((d0, d0 + 8)) == 1  # 1-bit flip found
        assert (d0, d0 + 9) not in got  # 5-bit flip excluded at d=3


def test_matches_bruteforce_exactly(images):
    """Pigeonhole banding == brute force: no false negatives, and the
    verify filter kills every false positive."""
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup_pairs(images, max_hamming=3).collect()
    }
    a, b = images.alias("a"), images.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in (
            a.join(b, F.col("a.image_id") < F.col("b.image_id"))
            .select(
                F.col("a.image_id").alias("id_a"),
                F.col("b.image_id").alias("id_b"),
                F.bit_count(
                    F.col("a.phash").bitwiseXOR(F.col("b.phash"))
                ).cast("int").alias("hamming"),
            )
            .filter(F.col("hamming") <= 3)
        ).collect()
    }
    assert banded == brute and len(brute) > 0


def test_negative_phash_safe(spark):
    """Real phash64 values use the sign bit; unsigned shifts and
    bit_count(xor) must treat them correctly (a one-bit flip of the
    sign bit is distance 1)."""
    df = spark.createDataFrame(
        [(1, -(1 << 63) | 5), (2, 5), (3, -(1 << 63) | 5)],
        "image_id long, phash long",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup_pairs(df, max_hamming=1).collect()
    }
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 0}


def test_blocks_for_corpus_scales():
    """The adaptive block count grows with the corpus (more/wider
    combo keys → bounded bucket occupancy at any N), is monotone, and
    the static default 6 is exactly the 10^9-image answer — symmetry
    with planes_for_corpus on the embedding axis."""
    assert blocks_for_corpus(10**9) == PHASH_BLOCKS == 6
    assert blocks_for_corpus(10**12) == 9
    vals = [blocks_for_corpus(10**e) for e in range(2, 15)]
    assert vals == sorted(vals)
    assert all(b > 3 for b in vals)  # pigeonhole needs blocks > d


def test_adaptive_blocks_still_exact(images):
    """blocks=None (derived from the corpus count) keeps the operator
    exact — same pairs as the pinned-blocks default."""
    pinned = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup_pairs(images, blocks=PHASH_BLOCKS).collect()
    }
    adaptive = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup_pairs(images).collect()
    }
    assert adaptive == pinned


def test_masks_disjoint():
    assert _PH_M3 & _PH_M1 == 0 and _PH_M3 & _PH_M5 == 0 and _PH_M1 & _PH_M5 == 0
    assert bin(_PH_M3).count("1") == 3
    assert bin(_PH_M1).count("1") == 1
    assert bin(_PH_M5).count("1") == 5
    assert max(_PH_M3, _PH_M1, _PH_M5) < (1 << 60)  # inside the hash60 range
