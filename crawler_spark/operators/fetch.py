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


def fetch(
    selected: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Fetch the selected rows; salted-by-host repartition (skew split).

    A6 (http.py:410-466): ``method`` = POST for 'api'-type jobs, GET
    otherwise — the column rides the same UDF seam (a real HTTP
    fetcher dispatches requests.get/post on it)."""
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
    ).mapInPandas(_fetch_batches, schema=FETCH_SCHEMA)
