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


def stage_shuffle_writes(spark) -> dict[int, int]:
    """Per-stage shuffle bytes WRITTEN (AppStatusStore, the same source
    as the UI's stage table), keyed by stageId. Per-run stage deltas
    expose the exchange-volume asymmetry the Bloom path exists for: in
    the SortMergeJoin both sides exchange, the 20M-key visited side
    identically in both paths — the candidate-side exchange is what the
    pre-filter shrinks (definitely-new rows skip it entirely)."""
    store = spark._jsc.sc().statusStore()
    gw = spark.sparkContext._gateway
    jvm = spark._jvm
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(gw.jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out: dict[int, int] = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        out[s.stageId()] = s.shuffleWriteBytes()
    return out


def run_once(spark, bloom, cand_bloom=None) -> dict:
    from bench import _cpu_sample, _host_telemetry
    from crawler_spark.state.bloom import anti_join_seen

    visited, cands = datasets(spark)
    s0, t0, sh0 = _cpu_sample(), time.time(), stage_shuffle_writes(spark)
    out = anti_join_seen(
        cands, visited, "url_hash", bloom=bloom, cand_bloom=cand_bloom
    )
    n = out.count()
    wall = time.time() - t0
    tele = _host_telemetry(s0, _cpu_sample(), wall)
    new_stages = sorted(
        (b for sid, b in stage_shuffle_writes(spark).items()
         if sid not in sh0 and b > 0),
        reverse=True,
    )
    return {
        "wall_sec": round(wall, 3),
        "new_rows": n,
        "cand_rows_per_sec": round(CAND_N / wall, 1),
        "shuffle_write_bytes": sum(new_stages),
        # both blooms are prebuilt outside this window, so every stage
        # here is join exchange: with the filter off, [visited-side
        # (20M rows), candidate-side (4M rows)]; with it on, both sides
        # shrink to the possible-hit sets
        "stage_shuffle_write_bytes": new_stages,
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
    # the symmetric (visited-side) pre-filter's bloom over the
    # candidate keys — built once here so the per-run stage bytes
    # measure pure join exchange, with the build's own treeAggregate
    # shuffle accounted separately
    t0 = time.time()
    cand_bloom = BloomSeenSet.build(
        cands, "url_hash", expected_keys=CAND_N, fpp=0.001
    )
    cand_build_sec = round(time.time() - t0, 3)

    # interleaved on/off trials (burstable-host protocol; 3 so the
    # median discounts a single bandwidth-trough run)
    runs = {"bloom_off": [], "bloom_on": []}
    for _ in range(3):
        runs["bloom_off"].append(run_once(spark, None))
        runs["bloom_on"].append(run_once(spark, bloom, cand_bloom=cand_bloom))

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
        "cand_bloom_bits_mb": round(cand_bloom.num_bits / 8 / 1e6, 2),
        "cand_bloom_build_sec": cand_build_sec,
        "runs": runs,
        # the design's value at 10^9 visited: the join-exchange volume
        # the two pre-filters remove (median across trials; the bloom
        # builds are prebuilt outside these windows and timed above).
        # filter off → both SMJ sides exchange in full (visited 20M
        # rows + candidates 4M rows); filter on → only possible-hits on
        # each side (maybe-candidates + candidate-matching visited).
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
