"""A/B the payload-parquet writer configs that plausibly burn CPU on
incompressible image bytes (the fetch+write scaling bottleneck —
measured 120 core-s at local[8] vs 51 at local[2] for the SAME 3 GB
encode, see BASELINE.md round 3).

Variants (same fetched pipeline, same tmpfs sink):
  base        snappy + dictionary + page checksums (engine default)
  nodict      parquet.enable.dictionary=false — dictionary encoding
              hashes/compares every 4.6 KB binary value before
              inevitably falling back to PLAIN
  uncomp      compression=uncompressed — snappy emits literals on
              random bytes (all CPU, zero ratio)
  nodict_unc  both off + page checksums off

Usage: SPARK_GRAFT_CPUS=8 python tools/parquet_codec_ab.py [seeds]
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
from tools.fetch_phase_profile import build_selected  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def main():
    from crawler_spark.operators import fetch as fetch_op
    from crawler_spark.session import get_spark

    spark = get_spark(CPUS, app_name="codec_ab", shuffle_partitions=CPUS)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    selected = build_selected(spark)
    nsel = selected.count()

    variants = [
        ("base", {}),
        ("nodict", {"parquet.enable.dictionary": "false"}),
        ("uncomp", {"compression": "uncompressed"}),
        ("nodict_unc", {
            "parquet.enable.dictionary": "false",
            "compression": "uncompressed",
            "parquet.page.write-checksum.enabled": "false",
        }),
    ]
    for label, opts in variants:
        with tempfile.TemporaryDirectory() as tmp:
            m0 = _mem_gbps()
            s0, t0 = _cpu_sample(), time.time()
            w = fetch_op.fetch(selected, salt_buckets=8).write.mode("overwrite")
            for k, v in opts.items():
                w = w.option(k, v)
            w.parquet(os.path.join(tmp, "fetched"))
            wall = time.time() - t0
            tele = _host_telemetry(s0, _cpu_sample(), wall)
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(tmp) for f in fs
            )
            print(json.dumps({
                "variant": label, "wall_sec": round(wall, 2), "rows": nsel,
                "rows_per_sec": round(nsel / wall, 1),
                "bytes_written": size, **tele, "mem_gbps_before": m0,
            }), flush=True)


if __name__ == "__main__":
    main()
