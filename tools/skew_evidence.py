"""AQE skew-join evidence for the PLANS.md scale dossier.

Two skew defenses exist in the engine and this script documents both
with executed (isFinalPlan=true) physical plans:

1. SALTING (proactive, fetch path): fetch_op.fetch repartitions on
   (host, salt) so one hot domain's rows spread over salt_buckets
   tasks — a politeness-respecting skew split chosen BEFORE runtime.
2. AQE SKEW-JOIN (reactive, shuffle joins): when `visited` outgrows
   the broadcast threshold the F5 anti-join becomes a SortMergeJoin;
   a hot-host candidate set then skews its shuffle partitions, and
   AQE splits them at runtime (`skew=true` in the final plan).

The sandbox run uses lowered skew thresholds (the same knobs a real
cluster sets in spark-defaults) so sandbox-sized partitions trigger
the optimization; the PLAN SHAPE — SMJ LeftAnti under
AdaptiveSparkPlan with skew=true reads — is scale-independent.

Usage: python tools/skew_evidence.py   (appends to PLANS.md)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

CAND_N = int(os.environ.get("SKEW_EV_CAND", "2000000"))
VISITED_N = int(os.environ.get("SKEW_EV_VISITED", "3000000"))
HOT_FRAC = 0.5  # one host carries half the frontier
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    from crawler_spark.session import get_spark

    spark = get_spark(CPUS, app_name="skew_evidence", shuffle_partitions=64)
    # the same knobs a production deployment tunes; lowered so the
    # sandbox's MB-scale partitions cross the skew threshold
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    # force the shuffle join regime (visited past broadcast threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # skewed frontier: HOT_FRAC of candidates on ONE host → their
    # url_hash values share nothing, but the downstream per-host
    # aggregates/joins on `host` skew hard
    n_hot = int(CAND_N * HOT_FRAC)
    cands = spark.range(CAND_N).select(
        F.when(F.col("id") < n_hot, F.lit("hot.example"))
        .otherwise(
            F.concat(F.lit("host"), F.pmod(F.col("id"), 997).cast("string"),
                     F.lit(".example"))
        )
        .alias("host"),
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        (F.pmod(F.col("id"), 5)).cast("int").alias("depth"),
    )
    visited = spark.range(VISITED_N).select(
        F.xxhash64(F.concat(F.lit("v"), F.col("id"))).alias("url_hash")
    )

    # (a) the host-keyed shuffle join over the RAW skewed frontier —
    # the shape every epoch produces when candidate rows join per-host
    # state (robots rules / crawl-delay / politeness slots) and one
    # domain dominates. The candidates survive the F5 anti-join first
    # (SMJ LeftAnti on uniform url_hash — never skewed), then shuffle
    # by `host` for the rules join: the hot host's partition carries
    # HOT_FRAC of all rows and AQE must split it at runtime.
    # NOTE: joining AGGREGATED per-host rows cannot show the split
    # (map-side partial aggregation collapses the hot partition before
    # the exchange — that is the engine's FIRST skew defense); the
    # split shows on the row-level join below, the case partial agg
    # cannot absorb.
    host_rules = spark.range(998).select(
        F.when(F.col("id") == 997, F.lit("hot.example"))
        .otherwise(
            F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example"))
        )
        .alias("host"),
        (1.0 + F.pmod(F.col("id"), 5).cast("double")).alias("crawl_delay"),
    )
    new = cands.join(visited, "url_hash", "left_anti")
    joined = new.join(host_rules, "host").select(
        "host", "url_hash", "depth", "crawl_delay"
    )
    # execute through the DataFrame's OWN QueryExecution (a grouped
    # aggregate rides above the join with no distribution requirement,
    # so the skew split stays legal) — df.write/noop would compile a
    # NEW QueryExecution and explain() would show the pre-AQE initial
    # plan. The aggregate reads url_hash so pruning keeps the 8-byte
    # random hash in the shuffle: skew detection uses the COMPRESSED
    # map-output bytes, and a host-only shuffle of one repeated string
    # compresses ~100x, hiding the hot partition below the threshold.
    gate = joined.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor("url_hash").alias("chk")
    )
    gate.collect()
    aqe_plan = plan_text(gate)

    # (b) the proactive salt split used by the fetch path (mirrors
    # fetch_op.fetch's (host, __salt) repartition, salt_buckets=8)
    salted = cands.repartition(
        64, F.col("host"), F.pmod(F.col("url_hash"), F.lit(8)).cast("int")
    )
    salted.count()
    salt_plan = plan_text(salted)

    marker = "skew=true" in aqe_plan or "skewed" in aqe_plan
    with open(os.path.join(REPO, "PLANS.md"), "a") as f:
        f.write(
            "\n## Skewed-frontier evidence: AQE skew-join split +"
            " proactive salt\n\n"
            f"_{CAND_N:,} candidates, {int(HOT_FRAC*100)} % on ONE host;"
            f" visited = {VISITED_N:,} keys with broadcast disabled (the"
            " >10 MB regime). Executed plans (isFinalPlan=true)."
            f" AQE skew marker present: {marker}._\n\n"
            "### host-keyed rules join over the raw hot frontier"
            " (AQE splits the skewed partitions at runtime)\n\n"
            "```\n" + aqe_plan + "\n```\n\n"
            "### proactive (host, salt) repartition — the fetch path's"
            " politeness-preserving skew split\n\n"
            "```\n" + salt_plan + "\n```\n"
        )
    print(f"skew marker present: {marker}; plans appended to PLANS.md")


if __name__ == "__main__":
    main()
