#!/bin/bash
# Round-5 exec-balance A/B: does a finer fetch-stage split
# (EpochConfig.fetch_partitions = 32 = 4x granted cores) close the
# per-executor queue-tail gap the exec-mode scaling attribution
# localized (BASELINE.md r5: wide local-cluster runs held 6.3-7.1 of
# 8 granted cores because each 2-core executor drains its OWN queue
# of single-digit tasks)?
#
# Shape: the WIDE exec level only (local-cluster[4,2] pinned, 1e6
# seeds x 1 epoch, /dev/shm store) - the only level where the tail
# exists; knob on/off interleaved 3x each, same host window. The
# decision metric is job_achieved_cores (utilization, robust to
# grant weather) alongside rows/s. All runs reported.
cd /root/repo
for round in 1 2 3; do
  for parts in 0 32; do
    sleep 45
    echo "=== round $round fetch_parts $parts $(date +%H:%M:%S)"
    env SPARK_GRAFT_EXECUTORS=4 SPARK_GRAFT_EXEC_CORES=2 \
        SPARK_GRAFT_BENCH_SEEDS=1000000 SPARK_GRAFT_BENCH_EPOCHS=1 \
        SPARK_GRAFT_BENCH_STORE_DIR=/dev/shm/graft_ab \
        SPARK_GRAFT_TIMING=1 \
        SPARK_GRAFT_FETCH_PARTS=$parts \
        python bench.py --frontier-only 2>/dev/null \
      | grep -E '^{|^\[epoch-timing\]'
  done
done
