"""F5 at-scale evidence: the Bloom pre-filter + exact-confirm path
engaged on a visited set PAST the broadcast threshold.

The engine's stated 100 TB story (SURVEY §2 F5, state/bloom.py): once
`visited` outgrows `spark.sql.autoBroadcastJoinThreshold`, the exact
anti-join becomes a shuffle of EVERY candidate; the Bloom pre-filter
(compact broadcast, ~1.2 GB at 10^9 keys / 1 % fpp) lets the
definitely-new majority of candidates skip that shuffle entirely, and
only possible-hits (true dups + ~fpp of the rest) pay the exact join.

This script measures that regime at sandbox scale: VISITED_N keys
(unique-hash projection ~8 B/key ≈ 40 MB > the 10 MB default
threshold → SortMergeJoin without the Bloom), CAND_N candidates with
SEEN_FRAC true duplicates. Output: one JSON line with wall times,
rows/s, and host telemetry for bloom on/off (interleaved runs), plus
both physical plans appended to PLANS.md.

Usage: python tools/bloom_evidence.py [--plans]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

VISITED_N = int(os.environ.get("BLOOM_EV_VISITED", "20000000"))
CAND_N = int(os.environ.get("BLOOM_EV_CAND", "4000000"))
SEEN_FRAC = 0.1
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def datasets(spark):
    # visited keys: xxhash64 of 'u<id>' for id in [0, VISITED_N)
    visited = spark.range(VISITED_N).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    )
    n_seen = int(CAND_N * SEEN_FRAC)
    # candidates: first n_seen collide with visited, rest are new ids
    cands = spark.range(CAND_N).select(
        F.xxhash64(
            F.concat(
                F.lit("u"),
                F.when(F.col("id") < n_seen, F.col("id")).otherwise(
                    F.col("id") + VISITED_N
                ),
            )
        ).alias("url_hash")
    )
    return visited, cands


def shuffle_write_bytes(spark) -> int:
    """Total shuffle bytes WRITTEN across all completed stages so far
    (AppStatusStore, the same source as the UI's stage table). Per-run
    deltas of this are the exchange-volume asymmetry the Bloom path is
    for: definitely-new candidates skip the anti-join exchange."""
    store = spark._jsc.sc().statusStore()
    gw = spark.sparkContext._gateway
    jvm = spark._jvm
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(gw.jvm.double, 0), jvm.java.util.ArrayList(),
    )
    return sum(stages.apply(i).shuffleWriteBytes() for i in range(stages.size()))


def run_once(spark, bloom) -> dict:
    from bench import _cpu_sample, _host_telemetry
    from crawler_spark.state.bloom import anti_join_seen

    visited, cands = datasets(spark)
    s0, t0, sh0 = _cpu_sample(), time.time(), shuffle_write_bytes(spark)
    out = anti_join_seen(cands, visited, "url_hash", bloom=bloom)
    n = out.count()
    wall = time.time() - t0
    tele = _host_telemetry(s0, _cpu_sample(), wall)
    return {
        "wall_sec": round(wall, 3),
        "new_rows": n,
        "cand_rows_per_sec": round(CAND_N / wall, 1),
        "shuffle_write_bytes": shuffle_write_bytes(spark) - sh0,
        **tele,
    }


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    from crawler_spark.session import get_spark
    from crawler_spark.state.bloom import BloomSeenSet, anti_join_seen

    spark = get_spark(CPUS, app_name="bloom_evidence", shuffle_partitions=CPUS)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    visited, cands = datasets(spark)
    t0 = time.time()
    bloom = BloomSeenSet.build(visited, "url_hash", expected_keys=VISITED_N)
    build_sec = round(time.time() - t0, 3)

    # interleaved on/off trials (burstable-host protocol)
    runs = {"bloom_off": [], "bloom_on": []}
    for _ in range(2):
        runs["bloom_off"].append(run_once(spark, None))
        runs["bloom_on"].append(run_once(spark, bloom))

    def med(key, which):
        vals = sorted(r[key] for r in runs[which])
        return vals[len(vals) // 2]

    result = {
        "metric": "bloom_path_evidence",
        "visited_keys": VISITED_N,
        "candidates": CAND_N,
        "seen_frac": SEEN_FRAC,
        "cpus": CPUS,
        "bloom_bits_mb": round(bloom.num_bits / 8 / 1e6, 2),
        "bloom_num_hashes": bloom.num_hashes,
        "bloom_build_sec": build_sec,
        "runs": runs,
        # the design's value at 10^9 visited: how much exchange volume
        # the pre-filter removes (median across trials)
        "shuffle_bytes_off": med("shuffle_write_bytes", "bloom_off"),
        "shuffle_bytes_on": med("shuffle_write_bytes", "bloom_on"),
        "shuffle_bytes_saved_frac": round(
            1
            - med("shuffle_write_bytes", "bloom_on")
            / max(1, med("shuffle_write_bytes", "bloom_off")),
            4,
        ),
    }
    print(json.dumps(result))

    if "--plans" in sys.argv:
        off = plan_text(anti_join_seen(cands, visited, "url_hash", bloom=None))
        on = plan_text(anti_join_seen(cands, visited, "url_hash", bloom=bloom))
        with open(os.path.join(REPO, "PLANS.md"), "a") as f:
            f.write(
                "\n## F5 bloom path at scale (visited past broadcast"
                " threshold)\n\n"
                f"_{VISITED_N:,} visited keys (~{VISITED_N * 8 / 1e6:.0f}"
                " MB key projection > the session's"
                f" {int(spark.conf.get('spark.sql.autoBroadcastJoinThreshold')) / 1e6:.0f}"
                " MB autoBroadcastJoinThreshold), "
                f"{CAND_N:,} candidates, {int(SEEN_FRAC*100)} % true"
                " dups. Without the Bloom the exact anti-join"
                " shuffle-sorts EVERY candidate; with it only"
                " possible-hits reach the join._\n\n"
                "### exact anti-join only (bloom off)\n\n"
                "```\n" + off + "\n```\n\n"
                "### bloom pre-filter + exact confirm (bloom on)\n\n"
                "```\n" + on + "\n```\n"
            )
        print("plans appended to PLANS.md")


if __name__ == "__main__":
    main()
