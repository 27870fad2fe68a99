"""Generate golden-table parquet fixtures for the three queries whose
semantics are not SQL-expressible (binary codecs / full crawl epochs),
so the driver's DuckDB oracle can value-check them instead of the
weaker rows-only check:

  fe_epoch        — expected `visited` rows from the pure-Python parity
                    simulator (crawler_spark/simulator.py) on the exact
                    fe_epoch configuration (300 seeds / 50 hosts /
                    budget 2000 / 2 epochs).
  mm_decode_stats — expected per-image stats from the pure-Python
                    codecs (fixtures.py_fetch_payload + image.decode_*).
  mm_frame_sample — expected per-sampled-frame stats from the vraw
                    stride-seek codec (multimodal.decode_vraw_frame).

The goldens are INDEPENDENT recomputations: row-at-a-time Python over
the shared closed-form world, vs the engine's distributed mapInPandas
path — same functions, different execution; what the oracle then
checks is that the Spark plumbing (batching, schema, partitioning)
reproduces them row-for-row.

Deterministic (seeded closed-form world, no RNG) → the fixtures are
committed; rerun this script only if the world functions change:

    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def golden_fe_epoch() -> pd.DataFrame:
    """Mirror queries.fe_epoch: seeds_df(spark, 300) [50 hosts],
    EpochConfig(epoch_budget=2000) [epoch_seconds=60], 2 epochs."""
    from crawler_spark import fixtures as fx
    from crawler_spark.simulator import simulate

    seeds = [fx.py_seed_url(k, 50) for k in range(300)]
    sim = simulate(seeds, num_epochs=2, epoch_seconds=60.0, epoch_budget=2000)
    rows = [
        {
            "url_hash": np.int64(uh),
            "url_canon": url,
            "host": host,
            "depth": np.int32(depth),
            "priority": np.int32(prio),
        }
        for (_ep, _rk, uh, url, host, depth, prio) in sim.visited_rows
    ]
    df = pd.DataFrame(rows)
    return df.astype(
        {"url_hash": "int64", "depth": "int32", "priority": "int32"}
    )


def golden_fe_recrawl() -> pd.DataFrame:
    """Mirror queries.fe_recrawl: the recrawl contract says the
    re-fetch of a tombstoned URL is BIT-identical to its original
    fetch, so the expected rows are exactly the simulator's 2-epoch
    visited rows restricted to the tombstoned subset (uh % 5 == 0 —
    Python % is non-negative, matching Spark pmod), with phash from
    the pure-Python codec. Computed with ZERO engine involvement."""
    from crawler_spark import fixtures as fx
    from crawler_spark.simulator import simulate

    seeds = [fx.py_seed_url(k, 50) for k in range(300)]
    sim = simulate(seeds, num_epochs=2, epoch_seconds=60.0, epoch_budget=2000)
    rows = [
        {
            "url_hash": np.int64(uh),
            "url_canon": url,
            "host": host,
            "depth": np.int32(depth),
            "priority": np.int32(prio),
            "phash": np.int64(fx.py_fetch_payload(uh)["phash"]),
        }
        for (_ep, _rk, uh, url, host, depth, prio) in sim.visited_rows
        if uh % 5 == 0
    ]
    df = pd.DataFrame(rows)
    return df.astype(
        {"url_hash": "int64", "depth": "int32", "priority": "int32",
         "phash": "int64"}
    )


def golden_mm_decode_stats() -> pd.DataFrame:
    """Mirror queries.mm_decode_stats for doc_id 0..99."""
    from crawler_spark import fixtures as fx
    from crawler_spark.functions import image as img

    rows = []
    for doc_id in range(100):
        uh = fx.py_xxhash64(f"doc:{doc_id}")
        p = fx.py_fetch_payload(uh)
        px = (
            img.decode_png(p["bytes"])
            if p["fmt"] == "png"
            else img.decode_qz5(p["bytes"])
        )
        rows.append(
            {
                "doc_id": doc_id,
                "w": p["w"],
                "h": p["h"],
                "fmt": p["fmt"],
                "phash": p["phash"],
                "mean_pixel": round(float(px.mean()), 4),
            }
        )
    return pd.DataFrame(rows).astype(
        {"doc_id": "int64", "w": "int32", "h": "int32", "phash": "int64"}
    )


def golden_mm_frame_sample() -> pd.DataFrame:
    """Mirror queries.mm_frame_sample for doc_id 0..29: n = 8 + id%5
    frames of 16x12, every 4th sampled via the stride-seek codec."""
    from crawler_spark import fixtures as fx
    from crawler_spark.functions import image as img
    from crawler_spark.functions import multimodal as MM

    rows = []
    for doc_id in range(30):
        vid = f"vid:{doc_id}"
        n = 8 + doc_id % 5
        data = MM.encode_vraw(
            [fx.py_pixels(fx.py_xxhash64(f"{vid}:f{i}"), 16, 12) for i in range(n)]
        )
        w, h, nf = MM.vraw_info(data)
        for idx in range(0, nf, 4):
            px = MM.decode_vraw_frame(data, idx)
            rows.append(
                {
                    "doc_id": doc_id,
                    "video_id": vid,
                    "frame_idx": idx,
                    "w": w,
                    "h": h,
                    "phash": img.phash64(px),
                    "mean_pixel": round(float(px.mean()), 4),
                }
            )
    return pd.DataFrame(rows).astype(
        {"doc_id": "int64", "frame_idx": "int32", "w": "int32", "h": "int32",
         "phash": "int64"}
    )


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in [
        ("fe_epoch", golden_fe_epoch),
        ("fe_recrawl", golden_fe_recrawl),
        ("mm_decode_stats", golden_mm_decode_stats),
        ("mm_frame_sample", golden_mm_frame_sample),
    ]:
        df = fn()
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"{name}: {len(df)} rows -> {path}")


if __name__ == "__main__":
    main()
