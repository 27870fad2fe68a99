"""D5 — list/detail/page classification of a URL, column-expression form.

Reference (/root/reference/core/structure_discovery.py:1141-1183):
  list   := any of 15 substrings present (plain ``in``)
  detail := (has '*' OR re.search over detail indicators — which include
             the catch-all ``/[^/]+/`` so nearly any 2-segment path
             qualifies) AND NOT list
  else   := 'page'

Note the reference's ``'\\?page='`` list indicator is a raw-string bug
(the backslash is matched literally by ``in``, so it never fires); we
implement the intended ``?page=`` and record the deviation here.

Three dialects (Spark Column / DuckDB SQL / Python) kept in lockstep
for the oracle + parity simulator.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

LIST_INDICATORS = [
    "/category/", "/tag/", "/archive/", "/blog/", "/articles/",
    "/questions/", "/list/", "/search/", "/page/", "?page=",
    "archive", "category", "tag", "blog", "articles",
]

DETAIL_REGEX = r"(/post/|/article/|/question/|/view/|/show/|/single/|/\d+/|/[^/]+/)"


def is_list(url: Column) -> Column:
    cond = F.lit(False)
    for ind in LIST_INDICATORS:
        cond = cond | url.contains(ind)
    return cond


def job_type(url: Column) -> Column:
    """'list' | 'detail' | 'page' for a canonical URL column."""
    lst = is_list(url)
    det = url.rlike(DETAIL_REGEX) & ~lst
    return F.when(lst, "list").when(det, "detail").otherwise("page")


def sql_job_type(expr: str) -> str:
    lst = " OR ".join(f"contains({expr}, '{i.replace(chr(39), chr(39)*2)}')" for i in LIST_INDICATORS)
    det = f"regexp_matches({expr}, '{DETAIL_REGEX}')"
    return (
        f"(CASE WHEN ({lst}) THEN 'list' "
        f"WHEN {det} THEN 'detail' ELSE 'page' END)"
    )


_DETAIL_RE = re.compile(DETAIL_REGEX)


def py_job_type(url: str) -> str:
    if any(i in url for i in LIST_INDICATORS):
        return "list"
    if _DETAIL_RE.search(url):
        return "detail"
    return "page"
