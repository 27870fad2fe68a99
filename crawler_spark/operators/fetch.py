"""A4 — the vectorized fetch stage (image+caption payloads).

The reference fetches one URL per worker thread through requests /
Selenium (/root/reference/utils/http.py:244-408). Spark-side, fetching
is an Arrow-batched ``mapInPandas`` over the epoch's selected rows,
repartitioned by ``(host, salt)``:

* partitioning by host keeps a host's requests co-located (politeness
  already enforced count-wise by the F3/F8 slot cap);
* the salt (pmod(url_hash, S)) splits a hot host's slot allocation
  across S tasks so one 30 %-of-frontier domain can't serialize the
  stage — the explicit skew-splitting the north_rule asks for.

In this sandbox there is no network: the fetcher is the deterministic
synthetic one from :mod:`crawler_spark.fixtures` (same seed ⇒ same
bytes/caption, so PSNR/caption parity is checkable). A real HTTP
fetcher drops into the same seam — the UDF contract (pdf in, pdf out,
schema below) is the whole interface. Retry/backoff across epochs is
F7 (admission.retry_candidates); HTTP-level status comes back as a
column, per reference retry statuses {429,500,502,503,504}
(http.py:158-163).

User-agent rotation (F10): the reference picks ``random.choice`` of 6
UAs per request (http.py:30-37,191-198); nondeterminism is banned
here, so UA = UAS[url_hash % 6] — recorded deviation (SURVEY §7).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import fixtures as fx

FETCH_RESULT_FIELDS = (
    "status int, attempt int, image_id string, bytes binary, w int, h int,"
    " fmt string, caption string, phash long, ua_index int"
)

USER_AGENTS = 6  # reference ships 6 UA strings, http.py:30-37


def _fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in it:
        n = len(pdf)
        if n == 0:
            continue
        uhs = pdf["url_hash"].to_numpy(dtype="int64")
        attempts = pdf["attempt"].to_numpy(dtype="int64")
        # status is closed-form from (hash, attempt) — vectorized
        fail_mask = (uhs % fx.FAIL_MOD) == 0
        fail_rounds = np.where(fail_mask, uhs % 3 + 1, 0)
        status = np.where(attempts <= fail_rounds, 503, 200).astype("int32")

        image_id, data, ws, hs, fmts, captions, phashes = (
            [], [], [], [], [], [], []
        )
        for uh, st in zip(uhs.tolist(), status.tolist()):
            if st == 200:
                p = fx.py_fetch_payload(uh)
                image_id.append(p["image_id"])
                data.append(p["bytes"])
                ws.append(p["w"])
                hs.append(p["h"])
                fmts.append(p["fmt"])
                captions.append(p["caption"])
                phashes.append(p["phash"])
            else:
                image_id.append(None)
                data.append(None)
                ws.append(None)
                hs.append(None)
                fmts.append(None)
                captions.append(None)
                phashes.append(None)
        out = pdf[["url_canon", "url_hash", "host", "depth", "parent_url", "attempt", "priority"]].copy()
        out["status"] = status
        out["image_id"] = image_id
        out["bytes"] = data
        out["w"] = pd.array(ws, dtype="Int32")
        out["h"] = pd.array(hs, dtype="Int32")
        out["fmt"] = fmts
        out["caption"] = captions
        out["phash"] = pd.array(phashes, dtype="Int64")
        out["ua_index"] = (uhs % USER_AGENTS).astype("int32")
        out["method"] = pdf["method"]
        yield out


FETCH_SCHEMA = (
    "url_canon string, url_hash long, host string, depth int, parent_url string,"
    " attempt int, priority int, status int, image_id string, bytes binary,"
    " w int, h int, fmt string, caption string, phash long, ua_index int,"
    " method string"
)


def _prepare(
    selected: DataFrame,
    num_partitions: int | None,
    salt_buckets: int,
) -> DataFrame:
    """Shared fetch-input prep: method column (A6), salted-by-host
    repartition (skew split), fixed input projection."""
    df = selected
    if "attempt" not in df.columns:
        df = df.withColumn("attempt", F.lit(1))
    if "priority" not in df.columns:
        df = df.withColumn("priority", F.lit(0))
    if "job_type" in df.columns:
        method = F.when(F.col("job_type") == "api", F.lit("POST")).otherwise(F.lit("GET"))
    else:
        method = F.lit("GET")
    df = df.withColumn("method", method)
    df = df.withColumn("__salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int"))
    nparts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    df = df.repartition(int(nparts), "host", "__salt").drop("__salt")
    return df.select(
        "url_canon", "url_hash", "host", "depth", "parent_url", "attempt",
        "priority", "method"
    )


def fetch(
    selected: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Fetch the selected rows; salted-by-host repartition (skew split).

    A6 (http.py:410-466): ``method`` = POST for 'api'-type jobs, GET
    otherwise — the column rides the same UDF seam (a real HTTP
    fetcher dispatches requests.get/post on it)."""
    return _prepare(selected, num_partitions, salt_buckets).mapInPandas(
        _fetch_batches, schema=FETCH_SCHEMA
    )


# ---------------------------------------------------------------------------
# Fused fetch + Python-side parquet write.
#
# The scaling attribution chain (BASELINE.md r5, scaling_probe_r5*.json)
# measured the payload-parquet WRITE as the widest per-core-efficiency gap
# in the epoch: the fetch UDF alone scales at the box's DRAM ceiling
# (0.68-0.88), adding the JVM writer drops it to 0.55-0.64. The JVM path
# pays Arrow->JVM columnar->UnsafeRow conversion and the JVM parquet
# writer; both are pure overhead for bytes that were just produced in the
# Python worker as Arrow buffers. This path writes each task's parquet
# file directly from the Python worker with pyarrow — the payload bytes
# never cross into the JVM at all; only a 1-row-per-task file manifest
# comes back. Commit protocol: each task writes part-<pid>.parquet via a
# temp name + atomic os.replace keyed by partition id, so a task retry
# converges to one complete file (content is deterministic per input
# split). On a real cluster this requires the store root on shared
# storage (HDFS/NFS/fuse) — the same contract the JVM writer has; an
# object-store deployment would swap os.replace for a conditional PUT.

#: pandas/Arrow column order of a fetch-result batch (mirrors FETCH_SCHEMA)
FETCH_COLS = [
    "url_canon", "url_hash", "host", "depth", "parent_url", "attempt",
    "priority", "status", "image_id", "bytes", "w", "h", "fmt", "caption",
    "phash", "ua_index", "method",
]

#: ~32 MB row groups at the ~5 KB/row payload profile — same target the
#: JVM writer uses (snapshots.PAYLOAD_WRITE_OPTIONS, measured 14-19 %
#: faster than 128 MB groups at 8 concurrent writers).
ROWS_PER_GROUP = 6144


def _pa_fetch_schema():
    import pyarrow as pa

    return pa.schema([
        ("url_canon", pa.string()), ("url_hash", pa.int64()),
        ("host", pa.string()), ("depth", pa.int32()),
        ("parent_url", pa.string()), ("attempt", pa.int32()),
        ("priority", pa.int32()), ("status", pa.int32()),
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("ua_index", pa.int32()), ("method", pa.string()),
    ])


def fetch_write_plan(
    selected: DataFrame,
    dest: str,
    num_partitions: int | None = None,
    salt_buckets: int = 8,
    rows_per_group: int = ROWS_PER_GROUP,
) -> DataFrame:
    """Lazy plan that fetches ``selected`` AND writes the payload
    parquet from inside the Python workers (see module comment above).

    Returns the 1-row-per-task file-manifest DataFrame; executing it
    (``.collect()``) runs the fused fetch+write. The destination
    directory is cleared eagerly driver-side (same overwrite semantics
    as ``SnapshotStore.write_table``)."""
    import shutil

    dest_dir = Path(dest)
    if dest_dir.exists():
        shutil.rmtree(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest_s = str(dest_dir)

    def write_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.attemptNumber() if ctx else 0
        schema = _pa_fetch_schema()
        writer = None
        tmp = final = None
        rows = 0
        for out in _fetch_batches(it):
            tbl = pa.Table.from_pandas(
                out[FETCH_COLS], schema=schema, preserve_index=False
            )
            if writer is None:
                final = os.path.join(dest_s, f"part-{pid:05d}.parquet")
                # dot-prefixed temp name: Spark's file listing skips
                # "."/"_" files, so a killed attempt's leftover can
                # never be picked up as data by a later scan
                tmp = os.path.join(
                    dest_s, f".part-{pid:05d}-{attempt}.inprogress"
                )
                writer = pq.ParquetWriter(
                    tmp,
                    schema,
                    compression="none",  # payload bytes are pre-compressed
                    use_dictionary=["host", "fmt", "method"],
                    # min/max stats on prunable columns only — hashing
                    # the image bytes for never-used stats is pure cost
                    write_statistics=[
                        "url_hash", "host", "depth", "attempt", "priority",
                        "status", "w", "h", "fmt", "phash", "ua_index",
                        "method",
                    ],
                )
            writer.write_table(tbl, row_group_size=rows_per_group)
            rows += len(out)
        if writer is not None:
            writer.close()
            os.replace(tmp, final)
            yield pd.DataFrame({"file": [final], "rows": [rows]})

    return _prepare(selected, num_partitions, salt_buckets).mapInPandas(
        write_partition, schema="file string, rows long"
    )


def write_empty_payload(dest: str) -> None:
    """Driver-side fallback for a zero-row epoch: tasks with no rows
    write no file, but a parquet directory with NO files cannot even
    be schema-inferred by the scan — so materialize one empty
    schema-carrying file (what the JVM writer's commit does)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _pa_fetch_schema()
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in schema], schema=schema
        ),
        str(Path(dest) / "part-empty.parquet"),
        compression="none",
    )
