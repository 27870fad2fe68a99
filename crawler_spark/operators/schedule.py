"""F3 + F8 — the distributed priority-queue pop with politeness slots.

The reference pops one global min-priority job per worker thread from a
``queue.PriorityQueue`` (/root/reference/core/crawler.py:595,948-958)
and rate-limits ~globally at CRAWL_DELAY seconds between requests
(utils/http.py:200-226 — a single shared last_request_time). The
set-oriented equivalent, per scheduling epoch:

  1. per-host fetch budget:  slots(host) = max(1, floor(epoch_seconds
     / crawl_delay(host))) — crawl_delay = max(CRAWL_DELAY, robots
     crawl-delay), reference http.py:91-113,200-226.
  2. rank within host:  row_number() OVER (PARTITION BY host ORDER BY
     priority, depth, url_hash) <= slots.
  3. global epoch budget:  top-K of the survivors by the same ordering
     (Catalyst plans this as TakeOrderedAndProject — per-partition
     top-K then a driver merge, never a full sort).

Tie-break note: the reference's equal-priority order is heap-internal
and thread-racy (CrawlJob.__lt__ compares priority only,
crawler.py:54-65); BASELINE allows a documented rule. Ours is
``(priority, depth, url_hash)`` — total and deterministic. The crawl
engine keys url_hash on lock-free xxhash64 (``engine_hash``, mirrored
bit-exactly by ``py_xxhash64`` in the parity simulator); the
DuckDB-checked relational corpus uses the portable md5-based hash60
instead (DuckDB cannot reproduce xxhash64) — same rule, two hash
universes.

Skew: one hot host owning ~30 % of the frontier would put the window
rank on one task. The window keys on (host) and must see all rows of a
host, so the *rank itself* can't be salted — instead the expensive
downstream stage (fetch) is salted (see fetch.py), and AQE skew-join
handles the joins. The window's own skew is bounded because admission
runs before ranking (candidate set per epoch ≪ frontier) — and the
per-host slot cap keeps output per host tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CRAWL_DELAY_DEFAULT = 1.0  # reference .env:9 / crawler.py:577
TIE_BREAK = ("priority", "depth", "url_hash")


def with_slots(
    admitted: DataFrame,
    robots_rules: DataFrame | None,
    epoch_seconds: float = 60.0,
    crawl_delay_default: float = CRAWL_DELAY_DEFAULT,
) -> DataFrame:
    """Attach the per-host slot budget (broadcast dim join)."""
    if robots_rules is None:
        return admitted.withColumn(
            "slots", F.lit(max(1, int(epoch_seconds / crawl_delay_default)))
        )
    rules = F.broadcast(robots_rules.select("host", "crawl_delay"))
    delay = F.greatest(F.coalesce(F.col("crawl_delay"), F.lit(crawl_delay_default)),
                       F.lit(crawl_delay_default))
    return (
        admitted.join(rules, "host", "left")
        .withColumn("slots", F.greatest(F.lit(1), F.floor(F.lit(epoch_seconds) / delay)).cast("int"))
        .drop("crawl_delay")
    )


def select_epoch(
    admitted_with_slots: DataFrame,
    epoch_budget: int | None = None,
) -> DataFrame:
    """Per-host rank-cap, then optional global top-K (F3)."""
    w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in TIE_BREAK])
    ranked = admitted_with_slots.withColumn("host_rank", F.row_number().over(w))
    capped = ranked.filter(F.col("host_rank") <= F.col("slots")).drop("slots")
    if epoch_budget is not None:
        capped = capped.orderBy(*[F.col(c).asc() for c in TIE_BREAK]).limit(epoch_budget)
    return capped
