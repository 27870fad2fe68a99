#!/bin/bash
# Round-5 A/B (VERDICT r4 "Next round" 2): adjudicate the BENCH_r04
# frontier_crawl regression (54.7 -> 102.0 s) by interleaving HEAD vs
# the round-3 tip (8a7b48b, the code the r3 bench measured) on the
# same host, same evening. Two shapes:
#   bench:  the exact BENCH suite frontier shape (60k seeds x 2 epochs,
#           local[32], default disk store) - the shape that regressed
#   pinned: the scaling-protocol shape (1e6 seeds x 1 epoch, taskset
#           local[8], /dev/shm store) - robust to host grant noise
# Worktree .wt_r3 must exist at 8a7b48b. All runs reported; JSON lines
# carry the per-run host telemetry (steal/achieved cores/GC/STREAM).
cd /root/repo
for round in 1 2 3; do
  for src in head r3; do
    dir=/root/repo; [ $src = r3 ] && dir=/root/repo/.wt_r3
    for shape in bench pinned; do
      sleep 45
      echo "=== round $round src $src shape $shape $(date +%H:%M:%S)"
      if [ $shape = bench ]; then
        env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_SEEDS=60000 \
            SPARK_GRAFT_BENCH_EPOCHS=2 \
            python $dir/bench.py --frontier-only 2>/dev/null | grep '^{'
      else
        env SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_SEEDS=1000000 \
            SPARK_GRAFT_BENCH_EPOCHS=1 \
            SPARK_GRAFT_BENCH_STORE_DIR=/dev/shm/graft_ab \
            taskset -c 0-7 python $dir/bench.py --frontier-only \
            2>/dev/null | grep '^{'
      fi
    done
  done
done
