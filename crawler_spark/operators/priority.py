"""F4 — priority scoring policy engine, as pure column expressions.

Reference (/root/reference/core/crawler.py:441-545): each enabled
policy whose condition matches contributes value*weight; the score is
the weighted mean ``int(sum(v*w)/sum(w))`` (Python int() → truncation
toward zero). Default policies:

  depth_policy     v = depth*10                w=1.0  (always, job given)
  list_policy      v = -20                     w=1.5  (job_type='list')
  detail_policy    v = -10                     w=1.0  (job_type='detail')
  sitemap_policy   v = -30                     w=2.0  (job_type='sitemap')
  path_length      v = path.count('/')*5       w=0.8  (always)

Lower priority = more urgent (PriorityQueue min-heap, crawler.py:595).
The same formula is emitted in three dialects — Spark Column, DuckDB
SQL, plain Python — so the scheduler, the oracle harness, and the
parity simulator can never drift.

The simplified smart-loop variant (F4b, smart_crawler.py:629-661) is
also provided: ``depth*10 - 20*[list] - 10*[detail] -
5*[has-important-pattern]`` with a broadcastable substring list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (job_type that triggers it, value, weight); None type = always-on depth
TYPE_POLICIES = {"list": (-20.0, 1.5), "detail": (-10.0, 1.0), "sitemap": (-30.0, 2.0)}
DEPTH_WEIGHT = 1.0
PATH_WEIGHT = 0.8


def slash_count(path: Column | str) -> Column:
    """path.count('/') — size(split)-1 stays JVM-side."""
    return (F.size(F.split(path, "/")) - F.lit(1)).cast("double")


def priority_score(depth: Column, job_type: Column, path: Column) -> Column:
    """Weighted-mean score, truncated toward zero (matches Python int())."""
    type_v = F.when(job_type == "list", F.lit(TYPE_POLICIES["list"][0] * TYPE_POLICIES["list"][1]))
    type_w = F.when(job_type == "list", F.lit(TYPE_POLICIES["list"][1]))
    for t, (v, w) in TYPE_POLICIES.items():
        if t == "list":
            continue
        type_v = type_v.when(job_type == t, F.lit(v * w))
        type_w = type_w.when(job_type == t, F.lit(w))
    type_v = type_v.otherwise(F.lit(0.0))
    type_w = type_w.otherwise(F.lit(0.0))

    num = (
        depth.cast("double") * 10.0 * DEPTH_WEIGHT
        + type_v
        + slash_count(path) * 5.0 * PATH_WEIGHT
    )
    den = F.lit(DEPTH_WEIGHT) + type_w + F.lit(PATH_WEIGHT)
    return (num / den).cast("int")  # cast truncates toward zero, like int()


def sql_priority_score(depth: str, job_type: str, path: str) -> str:
    """Same formula in DuckDB SQL (trunc() truncates toward zero)."""
    cases_v = " ".join(
        f"WHEN {job_type} = '{t}' THEN {v * w}" for t, (v, w) in TYPE_POLICIES.items()
    )
    cases_w = " ".join(
        f"WHEN {job_type} = '{t}' THEN {w}" for t, (v, w) in TYPE_POLICIES.items()
    )
    slash = f"(length({path}) - length(replace({path}, '/', '')))"
    num = (
        f"({depth} * 10.0 * {DEPTH_WEIGHT} + (CASE {cases_v} ELSE 0.0 END) "
        f"+ {slash} * 5.0 * {PATH_WEIGHT})"
    )
    den = f"({DEPTH_WEIGHT} + (CASE {cases_w} ELSE 0.0 END) + {PATH_WEIGHT})"
    return f"trunc({num} / {den})::INT"


def py_priority_score(depth: int, job_type: str, path: str) -> int:
    """Python mirror for the parity simulator."""
    num = depth * 10.0 * DEPTH_WEIGHT
    den = DEPTH_WEIGHT + PATH_WEIGHT
    if job_type in TYPE_POLICIES:
        v, w = TYPE_POLICIES[job_type]
        num += v * w
        den += w
    num += path.count("/") * 5.0 * PATH_WEIGHT
    return int(num / den)


# --- F4b: simplified smart-loop priority (smart_crawler.py:629-661) -------

IMPORTANT_PATTERNS = [
    "/legal/", "/law/", "/question/", "/article/", "/faq/",
    "/qa/", "/help/", "/consult/", "/expert/", "/answer/", "/ask/",
]


def simple_priority(depth: Column, job_type: Column, url: Column) -> Column:
    imp = F.lit(False)
    for p in IMPORTANT_PATTERNS:
        imp = imp | url.contains(p)
    return (
        depth.cast("int") * 10
        - F.when(job_type == "list", 20).otherwise(0)
        - F.when(job_type == "detail", 10).otherwise(0)
        - F.when(imp, 5).otherwise(0)
    )


def sql_simple_priority(depth: str, job_type: str, url: str) -> str:
    """DuckDB mirror of F4b (same constants)."""
    imp = " OR ".join(f"contains({url}, '{p}')" for p in IMPORTANT_PATTERNS)
    return (
        f"({depth} * 10 - (CASE WHEN {job_type} = 'list' THEN 20 ELSE 0 END) "
        f"- (CASE WHEN {job_type} = 'detail' THEN 10 ELSE 0 END) "
        f"- (CASE WHEN ({imp}) THEN 5 ELSE 0 END))"
    )


def py_simple_priority(depth: int, job_type: str, url: str) -> int:
    """Python mirror for the parity simulator."""
    imp = any(p in url for p in IMPORTANT_PATTERNS)
    return (
        depth * 10
        - (20 if job_type == "list" else 0)
        - (10 if job_type == "detail" else 0)
        - (5 if imp else 0)
    )
