"""Layered cost profile of the epoch's dominant phase (fetch+write).

The epoch's write-once design makes `fetch+write` a single action; to
attribute its wall we time three nested variants of the SAME epoch-1
plan on the bench world:

  upstream : selected rows → noop sink      (scan→dedup→admit→rank)
  +fetch   : fetch(selected) → noop sink    (+ salted shuffle, Arrow
                                             out/in, payload UDF)
  +parquet : fetch(selected) → parquet      (+ snappy encode, disk)

Deltas between the lines are the per-layer costs. One JSON line per
variant with host telemetry (bench._host_telemetry / _mem_gbps), so a
bandwidth-starved profile is attributable from the output alone.

Usage: SPARK_GRAFT_CPUS=8 python tools/fetch_phase_profile.py [seeds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _cpu_sample, _host_telemetry, _mem_gbps  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
HOSTS = max(1000, SEEDS // 20)


def build_selected(spark):
    from pyspark.sql import functions as F

    from crawler_spark import fixtures as fx
    from crawler_spark.epoch import (
        EpochConfig, dedup_candidates, seeds_to_frontier,
    )
    from crawler_spark.operators import admission, schedule
    from crawler_spark.operators.jobtype import job_type
    from crawler_spark.operators.priority import priority_score

    cfg = EpochConfig(epoch_budget=None, num_buckets=64, use_bloom=False)
    seeds = fx.seeds_df(spark, SEEDS, num_hosts=HOSTS)
    robots = fx.robots_rules_df(spark, num_hosts=HOSTS)
    frontier = seeds_to_frontier(seeds).withColumn("attempt", F.lit(1))
    candidates = dedup_candidates(frontier)
    visited = spark.createDataFrame([], "url_hash long")
    admitted = admission.admit(
        candidates, visited, max_depth=cfg.max_depth,
        host_scope_re=cfg.host_scope_re, robots_rules=robots,
    )
    admitted = admitted.withColumn(
        "job_type", job_type(F.col("url_canon"))
    ).withColumn(
        "priority",
        priority_score(F.col("depth"), F.col("job_type"), F.col("url_canon")),
    )
    return schedule.select_epoch(
        schedule.with_slots(admitted, robots, cfg.epoch_seconds),
        epoch_budget=None,
    )


def timed(label, action):
    m0 = _mem_gbps()
    s0, t0 = _cpu_sample(), time.time()
    n = action()
    wall = time.time() - t0
    tele = _host_telemetry(s0, _cpu_sample(), wall)
    print(json.dumps({
        "variant": label, "wall_sec": round(wall, 2), "rows": n,
        "rows_per_sec": round(n / wall, 1), **tele,
        "mem_gbps_before": m0,
    }), flush=True)


def main():
    from crawler_spark.operators import fetch as fetch_op
    from crawler_spark.session import get_spark

    spark = get_spark(CPUS, app_name="fetch_profile", shuffle_partitions=CPUS)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    selected = build_selected(spark)
    nsel = selected.count()  # warm page cache / codegen; pin row count

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return nsel

    timed("upstream_noop", lambda: noop(selected))
    timed("fetch_noop", lambda: noop(fetch_op.fetch(selected, salt_buckets=8)))
    with tempfile.TemporaryDirectory() as tmp:
        def parquet():
            fetch_op.fetch(selected, salt_buckets=8).write.mode(
                "overwrite"
            ).parquet(os.path.join(tmp, "fetched"))
            return nsel
        timed("fetch_parquet", parquet)


if __name__ == "__main__":
    main()
