#!/bin/bash
# Round-5 payload-writer A/B: JVM DataFrameWriter.parquet vs the fused
# Python-side pyarrow writer (SPARK_GRAFT_PAYLOAD_WRITER=arrow,
# fetch.fetch_write_plan). Motivation: the r5 scaling probes measured
# the payload write as the epoch's widest per-core-efficiency gap
# (fetch UDF alone 0.68-0.88, +JVM write 0.55-0.64); the arrow writer
# keeps the payload bytes inside the python workers whose pure-python
# profile scales 0.94-1.02 on this box. Interleaved same-host rounds,
# scaling-protocol shape (1e6 seeds x 1 epoch, taskset local[8],
# /dev/shm store), per-phase timings on. All runs reported.
cd /root/repo
mkdir -p /dev/shm/graft_ab
for round in 1 2 3; do
  for writer in jvm arrow; do
    sleep 45
    echo "=== round $round writer $writer $(date +%H:%M:%S)"
    env SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_SEEDS=1000000 \
        SPARK_GRAFT_BENCH_EPOCHS=1 SPARK_GRAFT_TIMING=1 \
        SPARK_GRAFT_BENCH_STORE_DIR=/dev/shm/graft_ab \
        SPARK_GRAFT_PAYLOAD_WRITER=$writer \
        taskset -c 0-7 python bench.py --frontier-only 2>/dev/null
  done
done
