"""Structure-discovery operators (SURVEY §2.D) as DataFrame programs.

Reference lineage (/root/reference/core/structure_discovery.py):
* D1 URL feature encoding (910-944): per path segment — digit → -1,
  slug (contains '-') → -2, else a bounded hash of the segment.
* D2-D4 clustering / pattern mining (856-1139): DBSCAN over D1
  vectors with a heuristic fallback. For this feature encoding the
  equivalence classes are exactly the *templated paths* (digits →
  ``<id>``, slugs → ``<slug>``), so the scalable re-expression is a
  groupBy on the template — no pairwise distance matrix, no driver
  clustering; identical classes, linear shuffle.
* D3 generalization (978-1027): position-wise constant-or-`*` over a
  cluster → derived here from the template directly.
* D5 list/detail classification (1141-1183): in operators/jobtype.py.
* D8 URL similarity (1638-1709): 0.1 different host, 0.3 different
  segment count, else shared/len.
* D10 top-k frequent sections (529-548): first path segment counts.

All pure column expressions with DuckDB mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.url import sql_url_path, url_path


def path_segments(url: Column) -> Column:
    """Non-empty path segments of a canonical URL."""
    return F.filter(F.split(url_path(url), "/"), lambda s: s != "")


def sql_path_segments(expr: str) -> str:
    return f"list_filter(string_split({sql_url_path(expr)}, '/'), s -> s <> '')"


# -- D1: feature encoding ----------------------------------------------------


def segment_feature(seg: Column) -> Column:
    """-1 digit, -2 slug, else hash60(seg) % 1e6 (bounded embedding —
    the reference uses Python hash()%1e6; ours is the portable md5)."""
    from ..functions.url import hash60

    return (
        F.when(seg.rlike(r"^\d+$"), F.lit(-1).cast("long"))
        .when(seg.contains("-"), F.lit(-2).cast("long"))
        .otherwise(F.pmod(hash60(seg), F.lit(1_000_000)))
    )


def url_features(urls: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """(url_canon, features array<long>) — D1 vectors."""
    segs = path_segments(F.col(url_col))
    return urls.select(
        url_col, F.transform(segs, segment_feature).alias("features")
    )


def sql_segment_feature(seg: str) -> str:
    from ..functions.url import sql_hash60

    return (
        f"(CASE WHEN regexp_matches({seg}, '^\\d+$') THEN -1 "
        f"WHEN contains({seg}, '-') THEN -2 "
        f"ELSE {sql_hash60(seg)} % 1000000 END)"
    )


# -- D2-D4: template mining --------------------------------------------------


def url_template(url: Column) -> Column:
    """Generalized path: digit segments → <id>, slug segments → <slug>.

    groupBy(template) yields the same URL equivalence classes as the
    reference's DBSCAN over D1 vectors (identical-feature URLs cluster
    together at eps=0.3 cosine; differing constants land apart), but
    as one hash aggregation instead of an O(n²) distance matrix."""
    segs = path_segments(url)
    gen = F.transform(
        segs,
        lambda s: F.when(s.rlike(r"^\d+$"), F.lit("<id>"))
        .when(s.contains("-"), F.lit("<slug>"))
        .otherwise(s),
    )
    return F.concat(F.lit("/"), F.array_join(gen, "/"))


def sql_url_template(expr: str) -> str:
    segs = sql_path_segments(expr)
    gen = (
        f"list_transform({segs}, s -> CASE WHEN regexp_matches(s, '^\\d+$') "
        f"THEN '<id>' WHEN contains(s, '-') THEN '<slug>' ELSE s END)"
    )
    return f"('/' || array_to_string({gen}, '/'))"


def mine_patterns(urls: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """(pattern, url_count, sample_url, is_list, is_detail) — the URL
    pattern dimension table (reference URLPattern, persisted small and
    broadcast back into admission/classification)."""
    from .jobtype import job_type

    t = urls.select(
        url_template(F.col(url_col)).alias("pattern"),
        F.col(url_col),
        job_type(F.col(url_col)).alias("jt"),
    )
    return t.groupBy("pattern").agg(
        F.count(F.lit(1)).alias("url_count"),
        F.min(url_col).alias("sample_url"),
        F.max((F.col("jt") == "list").cast("int")).alias("is_list"),
        F.max((F.col("jt") == "detail").cast("int")).alias("is_detail"),
    )


# -- D8: URL similarity ------------------------------------------------------


def url_similarity(a: Column, b: Column) -> Column:
    """0.1 different host; 0.3 same host different segment count; else
    shared-prefix-position count / max len (structure_discovery.py:
    1638-1709 — segment-wise equality over the shorter path)."""
    from ..functions.url import url_host

    sa, sb = path_segments(a), path_segments(b)
    same_host = url_host(a) == url_host(b)
    same_len = F.size(sa) == F.size(sb)
    shared = F.size(
        F.filter(F.zip_with(sa, sb, lambda x, y: x == y), lambda t: t)
    )
    ratio = shared.cast("double") / F.greatest(F.size(sa), F.size(sb), F.lit(1))
    return (
        F.when(~same_host, F.lit(0.1))
        .when(~same_len, F.lit(0.3))
        .otherwise(F.round(ratio, 6))
    )


def sql_url_similarity(a: str, b: str) -> str:
    from ..functions.url import sql_url_host

    sa, sb = sql_path_segments(a), sql_path_segments(b)
    shared = (
        f"len(list_filter(list_transform(generate_series(1, least(len({sa}), len({sb}))), "
        f"i -> {sa}[i] = {sb}[i]), t -> t))"
    )
    ratio = f"({shared}::DOUBLE / greatest(len({sa}), len({sb}), 1))"
    return (
        f"(CASE WHEN {sql_url_host(a)} <> {sql_url_host(b)} THEN 0.1 "
        f"WHEN len({sa}) <> len({sb}) THEN 0.3 "
        f"ELSE round({ratio}, 6) END)"
    )


# -- D10: top-k sections -----------------------------------------------------

ASSET_DIRS = ["static", "assets", "css", "js", "img", "images", "fonts"]


def top_sections(urls: DataFrame, url_col: str = "url_canon", k: int = 5) -> DataFrame:
    """Top-k first path segments minus asset dirs (deterministic
    tie-break by section name)."""
    first = F.element_at(path_segments(F.col(url_col)), 1)
    return (
        urls.select(first.alias("section"))
        .filter(F.col("section").isNotNull() & ~F.col("section").isin(ASSET_DIRS))
        .groupBy("section")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy(F.col("n_urls").desc(), F.col("section").asc())
        .limit(k)
    )


def sql_top_sections(from_sql: str, url_expr: str, k: int = 5) -> str:
    first = f"({sql_path_segments(url_expr)})[1]"
    assets = ", ".join(f"'{a}'" for a in ASSET_DIRS)
    return (
        f"SELECT section, count(*) AS n_urls FROM "
        f"(SELECT {first} AS section FROM {from_sql}) "
        f"WHERE section IS NOT NULL AND section NOT IN ({assets}) "
        f"GROUP BY section ORDER BY n_urls DESC, section ASC LIMIT {k}"
    )
