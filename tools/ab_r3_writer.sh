#!/bin/bash
# A/B: did the uncompressed-payload/no-rebalance diff or the /dev/shm
# store cause tonight's local[8] halving? Interleaved, pinned, 1e6 seeds.
cd /root/repo
for round in 1 2; do
  for cfg in new_disk new_shm old_disk; do
    case $cfg in
      new_disk) dir=/root/repo; store= ;;
      new_shm)  dir=/root/repo; store=/dev/shm ;;
      old_disk) dir=/root/repo/.wt_head; store= ;;
    esac
    sleep 45
    echo "=== round $round cfg $cfg $(date +%H:%M:%S)"
    env SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_SEEDS=1000000 SPARK_GRAFT_BENCH_EPOCHS=1 \
        ${store:+SPARK_GRAFT_BENCH_STORE_DIR=$store} \
        taskset -c 0-7 python $dir/bench.py --frontier-only 2>/dev/null | grep '^{'
  done
done
