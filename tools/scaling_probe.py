"""Decompose the 2->8 scaling gap by isolating each candidate stage.

scaling_r5.json measured data_path_efficiency 0.52 at pinned local[2]
vs local[8] — and, critically, the 8-core job burned ~78 % MORE CPU
per row (achieved_cores x wall) than the 2-core job.  This probe runs
each suspect in isolation, pinned and interleaved exactly like the
scaling harness, so the gap is attributable instead of argued:

  pure      multiprocessing.Pool over py_fetch_payload — NO Spark.
            The host-capability control: if raw numpy-RNG + zlib +
            phash does not scale 4x on 4x pinned cores, nothing built
            on top of it can, and the efficiency ceiling is the
            host's, not the engine's.
  udf_noop  the real fetch mapInPandas UDF -> noop sink (no store).
            Isolates the Spark/Arrow/python-worker path.
  udf_write udf_noop + uncompressed parquet to /dev/shm.
            Adds the payload write (the full fetch+write phase shape).
  seed      fixtures.seeds_df -> seeds_to_frontier -> rebalance write.
            The seed-write phase in isolation.

Usage: python tools/scaling_probe.py [--stages pure,udf_noop,...]
Writes scaling_probe_r5.json (all runs, medians, per-stage efficiency).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("PROBE_ROWS", "400000"))
PAIR = tuple(
    int(x) for x in os.environ.get("PROBE_PAIR", "2,8").split(",")
)
TRIALS = int(os.environ.get("PROBE_TRIALS", "2"))
COOLDOWN = int(os.environ.get("PROBE_COOLDOWN", "20"))


def _timed(fn):
    """Run fn(), print the action-window achieved cores (machine
    jiffies over the action wall only — the parent's window includes
    JVM startup/warmups, which dilutes utilization), return wall."""
    s0 = _cpu()
    t0 = time.time()
    fn()
    wall = time.time() - t0
    s1 = _cpu()
    d = [b - a for a, b in zip(s0, s1)]
    busy = (d[0] + d[1] + d[2] + d[5] + d[6]) / (wall * os.sysconf("SC_CLK_TCK"))
    print(f"ACTCORES {busy:.2f}", flush=True)
    return wall


def _cpu() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]



def _child_pure(cpus: int, rows: int) -> float:
    """Raw py_fetch_payload throughput on a multiprocessing pool."""
    import multiprocessing as mp

    per = rows // cpus

    def act():
        with mp.Pool(cpus) as pool:
            pool.map(_pure_chunk, [(i, per) for i in range(cpus)])

    return _timed(act)


def _pure_chunk(arg: tuple[int, int]) -> int:
    import numpy as np

    from crawler_spark import fixtures as fx

    # PROBE_MEM_PASSES: extra full copies of each payload, mimicking
    # the real pipeline's additional memory passes (arrow
    # serialization, JVM row conversion, parquet buffers, store write)
    # on top of the UDF's own traffic. pure@passes=0 scaling vs
    # pure@passes=k scaling separates "the box cannot scale this
    # BYTES/s profile" from "the engine wastes cores".
    passes = int(os.environ.get("PROBE_MEM_PASSES", "0"))
    start, n = arg[0] * arg[1], arg[1]
    total = 0
    batch: list[bytes] = []
    batch_bytes = 0
    for i in range(start, start + n):
        # skip the closed-form failures like the UDF does
        uh = (i * 2654435761) & 0x7FFFFFFFFFFFFFFF
        if uh % fx.FAIL_MOD == 0:
            continue
        data = fx.py_fetch_payload(uh)["bytes"]
        total += len(data)
        if passes:
            # batch to ~40 MB before copying, like the pipeline's
            # arrow-batch/row-buffer passes: the copies must stream
            # through DRAM (a per-row 5 KB copy would sit in L1 and
            # test nothing)
            batch.append(data)
            batch_bytes += len(data)
            if batch_bytes >= 40 << 20:
                arr = np.frombuffer(b"".join(batch), dtype=np.uint8)
                for _ in range(passes):
                    arr = arr.copy()
                total += int(arr[-1])
                batch, batch_bytes = [], 0
    return total


def _child_spark(stage: str, cpus: int, rows: int) -> float:
    import tempfile

    from pyspark.sql import functions as F

    from crawler_spark import fixtures as fx
    from crawler_spark.epoch import seeds_to_frontier
    from crawler_spark.operators import fetch as fetch_op
    from crawler_spark.session import get_spark

    mult = int(os.environ.get("PROBE_SHUFFLE_MULT", "1"))
    spark = get_spark(
        cpus, app_name=f"probe-{stage}", shuffle_partitions=cpus * mult
    )
    # same warm-up discipline as bench.run_suite
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(cpus * 4).repartition(cpus).selectExpr("id").mapInPandas(
        _noop, schema="id long"
    ).count()

    if stage == "seed":
        seeds = fx.seeds_df(spark, rows, num_hosts=max(1000, rows // 20))
        frontier = seeds_to_frontier(seeds)
        with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
            return _timed(
                lambda: frontier.hint("rebalance")
                .write.mode("overwrite")
                .parquet(tmp + "/f")
            )

    seeds = fx.seeds_df(spark, rows, num_hosts=max(1000, rows // 20))
    selected = seeds_to_frontier(seeds).withColumn("attempt", F.lit(1))
    fetched = fetch_op.fetch(selected, salt_buckets=8)
    if stage == "udf_noop":
        return _timed(
            lambda: fetched.write.format("noop").mode("overwrite").save()
        )
    if stage == "udf_write":
        wdir = os.environ.get("PROBE_WRITE_DIR", "/dev/shm")
        with tempfile.TemporaryDirectory(dir=wdir) as tmp:
            w = fetched.write.mode("overwrite").option(
                "compression", "uncompressed"
            )
            # extra writer options as k=v,k=v (e.g. parquet dictionary
            # / page / row-group knobs for the write-path bottleneck A/B)
            for kv in os.environ.get("PROBE_PARQUET_OPTS", "").split(","):
                if kv:
                    k, v = kv.split("=", 1)
                    w = w.option(k, v)
            return _timed(lambda: w.parquet(tmp + "/p"))
    raise SystemExit(f"unknown stage {stage}")


def _run_child(stage: str, cpus: int) -> dict:
    env = dict(os.environ, PROBE_STAGE=stage, PROBE_CPUS=str(cpus),
               PROBE_ROWS=str(ROWS))
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable,
        os.path.abspath(__file__), "--child",
    ]
    s0 = _cpu()
    w0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    wall = time.time() - w0
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-3000:] + "\n")
        raise SystemExit(f"child failed: {stage} cpus={cpus}")
    sec = float([l for l in p.stdout.splitlines() if l.startswith("SEC ")][-1][4:])
    act = [l for l in p.stdout.splitlines() if l.startswith("ACTCORES ")]
    act_cores = float(act[-1][9:]) if act else None
    s1 = _cpu()
    hz = os.sysconf("SC_CLK_TCK")
    d = [b - a for a, b in zip(s0, s1)]
    busy = (d[0] + d[1] + d[2] + d[5] + d[6]) / (wall * hz)
    return {
        "stage": stage, "cpus": cpus, "sec": round(sec, 2),
        "rows_per_sec": round(ROWS / sec, 1),
        "action_cores": act_cores,
        "proc_window_cores": round(busy, 2),
        "steal_pct": round(100 * d[7] / sum(d), 2) if sum(d) else 0.0,
    }


def main() -> None:
    if "--child" in sys.argv:
        stage = os.environ["PROBE_STAGE"]
        cpus = int(os.environ["PROBE_CPUS"])
        rows = int(os.environ["PROBE_ROWS"])
        sec = (
            _child_pure(cpus, rows)
            if stage == "pure"
            else _child_spark(stage, cpus, rows)
        )
        print(f"SEC {sec}", flush=True)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="pure,udf_noop,udf_write,seed")
    args = ap.parse_args()
    stages = args.stages.split(",")
    lo, hi = PAIR
    runs = []
    first = True
    for _ in range(TRIALS):
        for stage in stages:
            for cpus in (hi, lo):
                if not first:
                    time.sleep(COOLDOWN)
                first = False
                r = _run_child(stage, cpus)
                runs.append(r)
                print(json.dumps(r), flush=True)
    out: dict = {"rows": ROWS, "pair": [lo, hi], "runs": runs, "stages": {}}
    for stage in stages:
        med = {}
        for c in (lo, hi):
            xs = sorted(
                r["rows_per_sec"] for r in runs
                if r["stage"] == stage and r["cpus"] == c
            )
            med[c] = xs[len(xs) // 2]
        out["stages"][stage] = {
            "rows_per_sec": {str(c): med[c] for c in (lo, hi)},
            "speedup": round(med[hi] / med[lo], 3),
            "efficiency": round(med[hi] / med[lo] / (hi / lo), 3),
        }
    with open(os.path.join(REPO, "scaling_probe_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["stages"], indent=1))


if __name__ == "__main__":
    main()
