"""Reference-parity simulator — a pure-Python, epoch-synchronous
transcription of the reference crawler's scheduling semantics.

This is the oracle for the BASELINE correctness bar: "same crawl
ordering (modulo tie-break rule), identical URL-seen membership" under
the same seed list + politeness budget. The reference's own loop is
thread-racy (PriorityQueue pop order for equal priorities is
heap-internal — /root/reference/core/crawler.py:54-65, 948-958), so
the documented deterministic rule (priority, depth, url_hash) is used
both here and in the Spark scheduler; everything else is transcribed:

  admission   crawler.py:685-749  (seen → depth → host-scope order)
  priority    crawler.py:441-545  (weighted-mean policy engine)
  politeness  http.py:91-113, 200-226 (max(CRAWL_DELAY, robots delay))
  retry       crawler.py:317-333  (attempts < 3)
  link emit   crawler.py:853-901  (canonicalize → seen-check → enqueue)

The synthetic world (link graph, fetch statuses, payloads) is the
closed-form one in :mod:`crawler_spark.fixtures`, shared with the
Spark engine, so any divergence is a scheduling-semantics bug, not a
data difference.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from . import fixtures as fx
from .functions.url import py_canonicalize, py_host, py_path, py_xxhash64
from .operators.jobtype import py_job_type
from .operators.priority import py_priority_score

MAX_DEPTH = 5
MAX_RETRIES = 3
CRAWL_DELAY_DEFAULT = 1.0


@dataclass
class SimResult:
    fetch_log: list = field(default_factory=list)  # (epoch, rank, url_canon)
    visited: dict = field(default_factory=dict)  # url_hash -> url_canon
    # full per-fetch rows (epoch, rank, url_hash, url_canon, host,
    # depth, priority) — golden-table source for the fe_epoch oracle
    visited_rows: list = field(default_factory=list)
    failed: dict = field(default_factory=dict)  # url_hash -> dict
    frontier: dict = field(default_factory=dict)  # url_hash -> (url, host, depth, parent)
    images: dict = field(default_factory=dict)  # url_hash -> payload dict (w/o bytes)


def _frontier_insert(frontier: dict, uh: int, url: str, host: str, depth: int, parent: str | None):
    """Min-rule dedup: keep (min depth, then min parent_url, NULLs first) —
    must mirror epoch.dedup_candidates / emit_links exactly."""
    key_new = (depth, parent is not None, parent or "")
    cur = frontier.get(uh)
    if cur is None or key_new < (cur[2], cur[3] is not None, cur[3] or ""):
        frontier[uh] = (url, host, depth, parent)


def simulate(
    seed_urls: list[str],
    num_epochs: int,
    epoch_seconds: float = 60.0,
    epoch_budget: int | None = 10_000,
    max_depth: int = MAX_DEPTH,
    host_scope_re: str = r"^host\d+\.example$",
    respect_robots: bool = True,
    with_payloads: bool = False,
) -> SimResult:
    scope = re.compile(host_scope_re)
    res = SimResult()

    for u in seed_urls:
        canon = py_canonicalize(u)
        if canon is None:
            continue
        _frontier_insert(res.frontier, py_xxhash64(canon), canon, py_host(canon), 0, None)

    for epoch in range(1, num_epochs + 1):
        # --- candidates: fresh (not in failed) ∪ retryable ----------------
        cands = []
        for uh, (url, host, depth, parent) in res.frontier.items():
            if uh in res.failed:
                continue
            cands.append((url, uh, host, depth, parent, 1))
        for uh, f in res.failed.items():
            if f["attempts"] < MAX_RETRIES:
                cands.append((f["url"], uh, f["host"], f["depth"], f["parent"], f["attempts"] + 1))

        # --- admission (F2 + F9 + F5) --------------------------------------
        admitted = []
        for url, uh, host, depth, parent, attempt in cands:
            if uh in res.visited or depth > max_depth or not scope.match(host):
                continue
            if respect_robots and any(
                py_path(url).startswith(p) for p in fx.py_disallow_prefixes(host)
            ):
                continue
            jt = py_job_type(url)
            prio = py_priority_score(depth, jt, url)
            admitted.append((prio, depth, uh, url, host, parent, attempt))

        # --- per-host slot cap (F3 + F8) ------------------------------------
        by_host: dict[str, list] = {}
        for row in admitted:
            by_host.setdefault(row[4], []).append(row)
        pool = []
        for host, rows in by_host.items():
            delay = max(CRAWL_DELAY_DEFAULT, fx.py_crawl_delay(host))
            slots = max(1, math.floor(epoch_seconds / delay))
            rows.sort(key=lambda r: (r[0], r[1], r[2]))
            pool.extend(rows[:slots])

        # --- global budget ---------------------------------------------------
        pool.sort(key=lambda r: (r[0], r[1], r[2]))
        if epoch_budget is not None:
            pool = pool[:epoch_budget]
        if not pool:
            break

        # --- fetch + outcomes ------------------------------------------------
        for rank, (prio, depth, uh, url, host, parent, attempt) in enumerate(pool, 1):
            status = fx.py_fetch_status(url, attempt)
            if status == 200:
                res.visited[uh] = url
                res.failed.pop(uh, None)
                res.fetch_log.append((epoch, rank, url))
                res.visited_rows.append((epoch, rank, uh, url, host, depth, prio))
                if with_payloads:
                    p = fx.py_fetch_payload(uh)
                    p.pop("bytes")
                    res.images[uh] = p
                for child in fx.py_out_links(url, depth):
                    canon = py_canonicalize(child)
                    if canon is None:
                        continue
                    _frontier_insert(
                        res.frontier, py_xxhash64(canon), canon, py_host(canon), depth + 1, url
                    )
            else:
                res.failed[uh] = {
                    "url": url, "host": host, "depth": depth, "parent": parent,
                    "attempts": attempt, "last_status": status,
                }
    return res
