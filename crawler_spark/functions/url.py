"""URL canonicalization + hashing — the F1 operator.

Reference semantics (/root/reference/utils/http.py:512-531): resolve
relative hrefs against the page URL with urljoin, then rebuild the URL
as ``scheme://netloc/path`` — the query string and fragment are
dropped entirely. We add the RFC-3986-safe normalizations the
reference skips (lower-case scheme/host, '' path → '/'), which is the
rule the whole engine + the parity simulator + the DuckDB oracles
share.

Everything on absolute URLs is a pure column expression (regexp_extract
+ md5 + conv) so it runs inside whole-stage codegen — no Python in the
canonical hot path. Relative-href resolution (needed only at link
emit) is a vectorized Arrow UDF.

The 64-bit hash is **portable**: the top 60 bits of md5, identical in
Spark (`conv(substr(md5(x),1,15),16,10)`), DuckDB
(`('0x'||substr(md5(x),1,15))::BIGINT`), and Python
(`int(md5(b).hexdigest()[:15],16)`). That one definition backs the
seen-set keys, the deterministic scheduler tie-break (the reference's
PriorityQueue tie-break is heap-internal/thread-racy — crawler.py:54-65
— so BASELINE allows a documented rule; ours is (priority, depth,
url_hash)), and every oracle comparison. A faster non-portable variant
(`xxhash64`) is exposed for internal-only columns.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# regex fragments shared by the Spark expressions and the DuckDB oracle SQL
# ---------------------------------------------------------------------------

RE_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
RE_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
RE_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(url, RE_SCHEME, 1))


def url_host(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(url, RE_HOST, 1))


def url_path(url: Column | str) -> Column:
    """Path component (query/fragment stripped); '' normalizes to '/'."""
    p = F.regexp_extract(url, RE_PATH, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def canonicalize(url: Column | str) -> Column:
    """F1: scheme://host/path with query+fragment dropped.

    Reference: /root/reference/utils/http.py:512-531 (strip rule),
    plus RFC-3986 case normalization of scheme and host.
    Rows that are not absolute http(s)/etc URLs canonicalize to NULL
    (the admission filter drops them — javascript:/mailto:/#… links,
    reference core/crawler.py:861-864).
    """
    scheme = url_scheme(url)
    host = url_host(url)
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, url_path(url)),
    )


def hash60(col: Column | str) -> Column:
    """Portable 60-bit hash: top 15 hex digits of md5, as BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def url_hash(url_canon: Column | str) -> Column:
    """The engine-wide URL key (portable; see module docstring)."""
    return hash60(url_canon)


def fast_hash64(col: Column | str) -> Column:
    """xxhash64 — internal-only columns (salts, buckets); not portable."""
    return F.xxhash64(col)


def host_bucket(host: Column | str, num_buckets: int) -> Column:
    """Partitioning key: pmod(hash60(host), P). Keeps one host's URLs in
    one bucket so per-host politeness is partition-local (SURVEY §1.1)."""
    return F.pmod(hash60(host), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------------------
# DuckDB-dialect SQL builders (oracle parity) — same semantics as above
# ---------------------------------------------------------------------------


def sql_url_host(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{RE_HOST}', 1))"


def sql_url_path(expr: str) -> str:
    p = f"regexp_extract({expr}, '{RE_PATH}', 1)"
    return f"(CASE WHEN {p} = '' THEN '/' ELSE {p} END)"


def sql_canonicalize(expr: str) -> str:
    scheme = f"lower(regexp_extract({expr}, '{RE_SCHEME}', 1))"
    return (
        f"(CASE WHEN {scheme} <> '' AND {sql_url_host(expr)} <> '' THEN "
        f"{scheme} || '://' || {sql_url_host(expr)} || {sql_url_path(expr)} "
        f"ELSE NULL END)"
    )


def sql_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# Python mirror (parity simulator + tests)
# ---------------------------------------------------------------------------

import re as _re

_PY_SCHEME = _re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")
_PY_HOST = _re.compile(RE_HOST)
_PY_PATH = _re.compile(RE_PATH)


def py_canonicalize(url: str) -> str | None:
    m_s = _PY_SCHEME.match(url or "")
    m_h = _PY_HOST.match(url or "")
    if not m_s or not m_h or not m_h.group(1):
        return None
    m_p = _PY_PATH.match(url)
    path = m_p.group(1) if m_p else ""
    return f"{m_s.group(1).lower()}://{m_h.group(1).lower()}{path or '/'}"


def py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def py_host(url: str) -> str:
    m = _PY_HOST.match(url or "")
    return m.group(1).lower() if m else ""


def py_path(url: str) -> str:
    m = _PY_PATH.match(url or "")
    return (m.group(1) if m else "") or "/"


# ---------------------------------------------------------------------------
# Relative-href resolution — Arrow UDF (link-emit path only)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def resolve_href(base: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized urljoin(base, href) (reference http.py:518)."""
    return pd.Series(
        [urljoin(b, h) if isinstance(h, str) and h else None for b, h in zip(base, href)],
        dtype="object",
    )
