"""Sitemap source operators — A2 (robots.txt sitemap scan), A3 (XML
sitemap parse, index recursion), F12 (expansion into frontier rows).

Reference semantics (/root/reference/core/crawler.py:640-669,
1278-1377): GET /robots.txt and scan for ``Sitemap:`` lines; fetch
each sitemap; ``<sitemapindex>`` children are re-queued as sitemaps at
depth+1, ``<urlset>`` entries become page jobs at depth 0; sitemap
jobs bypass the depth/domain admission checks (crawler.py:703-717 —
checks are skipped for job_type='sitemap').

Spark-first: parsing is ``regexp_extract_all`` column expressions
(<loc> bodies), recursion is a bounded driver loop of DataFrame steps
(sitemap trees are shallow — the reference caps at max_sitemap_depth 3).
The synthetic world's sitemaps are closed-form per host, in both
dialects, so the whole pipeline is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.url import url_host

MAX_SITEMAP_DEPTH = 3  # reference crawler.py:1284
LOC_RE = r"<loc>([^<]*)</loc>"
SITEMAP_RE = r"(?m)^[Ss]itemap:\s*(\S+)"


# -- synthetic world: robots.txt + sitemap.xml per host ---------------------


def synth_robots_txt(host: Column) -> Column:
    """robots.txt body advertising the host's sitemap (A2 input)."""
    return F.concat(
        F.lit("User-agent: *\nDisallow: /private/\nSitemap: https://"),
        host,
        F.lit("/sitemap.xml\n"),
    )


def _h_idx(host: Column) -> Column:
    return F.regexp_extract(host, r"^host(\d+)\.example$", 1).cast("int")


def synth_sitemap_xml(url: Column) -> Column:
    """Deterministic sitemap body for a sitemap URL.

    /sitemap.xml on host h%4==0 → a <sitemapindex> of 2 child maps;
    otherwise (and for child maps) → a <urlset> of 3 page URLs."""
    host = url_host(url)
    h = _h_idx(host)
    is_index = (F.pmod(h, 4) == 0) & url.endswith("/sitemap.xml")
    index_body = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://"),
        host,
        F.lit("/sitemap-1.xml</loc></sitemap><sitemap><loc>https://"),
        host,
        F.lit("/sitemap-2.xml</loc></sitemap></sitemapindex>"),
    )
    part = F.coalesce(
        F.nullif(F.regexp_extract(url, r"sitemap-(\d+)\.xml$", 1), F.lit("")).cast("int"),
        F.lit(0),
    )
    base = h * 10 + part * 3

    def loc(i: int) -> Column:
        return F.concat(
            F.lit("<url><loc>https://"),
            host,
            F.lit("/view/"),
            (base + i).cast("string"),
            F.lit("</loc></url>"),
        )

    urlset_body = F.concat(F.lit("<urlset>"), loc(0), loc(1), loc(2), F.lit("</urlset>"))
    return F.when(is_index, index_body).otherwise(urlset_body)


def sql_synth_robots_txt(host: str) -> str:
    return (
        f"('User-agent: *' || chr(10) || 'Disallow: /private/' || chr(10) || "
        f"'Sitemap: https://' || {host} || '/sitemap.xml' || chr(10))"
    )


def sql_synth_sitemap_xml(url: str) -> str:
    from ..functions.url import sql_url_host

    host = sql_url_host(url)
    h = f"(regexp_extract({host}, '^host(\\d+)\\.example$', 1)::INT)"
    is_index = f"({h} % 4 = 0 AND {url} LIKE '%/sitemap.xml')"
    index_body = (
        f"('<sitemapindex><sitemap><loc>https://' || {host} || "
        f"'/sitemap-1.xml</loc></sitemap><sitemap><loc>https://' || {host} || "
        f"'/sitemap-2.xml</loc></sitemap></sitemapindex>')"
    )
    part = f"coalesce(nullif(regexp_extract({url}, 'sitemap-(\\d+)\\.xml$', 1), '')::INT, 0)"
    base = f"({h} * 10 + {part} * 3)"
    locs = " || ".join(
        f"'<url><loc>https://' || {host} || '/view/' || ({base} + {i}) || '</loc></url>'"
        for i in range(3)
    )
    return (
        f"(CASE WHEN {is_index} THEN {index_body} "
        f"ELSE '<urlset>' || {locs} || '</urlset>' END)"
    )


# -- parsing (column expressions) -------------------------------------------


def robots_sitemaps(robots_txt: Column) -> Column:
    """A2: array of sitemap URLs advertised in a robots.txt body."""
    return F.regexp_extract_all(robots_txt, F.lit(SITEMAP_RE), 1)


def sitemap_locs(xml: Column) -> Column:
    """A3: array of <loc> bodies in a sitemap document."""
    return F.regexp_extract_all(xml, F.lit(LOC_RE), 1)


def is_sitemap_index(xml: Column) -> Column:
    return xml.contains("<sitemapindex")


# -- F12: expansion loop -----------------------------------------------------


def expand_sitemaps(
    sitemap_urls: DataFrame, max_depth: int = MAX_SITEMAP_DEPTH
) -> DataFrame:
    """sitemap_urls(url string) → frontier rows (url_canon, url_hash,
    host, depth, parent_url, job_type='page') for every page listed,
    recursing through index files (children at sitemap-depth+1, pages
    at crawl depth 0 — crawler.py:1310-1328)."""
    from ..functions.url import canonicalize, engine_hash

    pending = sitemap_urls.select(
        F.col("url").alias("sm_url"), F.lit(0).alias("sm_depth")
    )
    pages = None
    for _ in range(max_depth + 1):
        if pending.isEmpty():
            break
        fetched = pending.withColumn("xml", synth_sitemap_xml(F.col("sm_url")))
        entries = fetched.select(
            "sm_url",
            "sm_depth",
            is_sitemap_index(F.col("xml")).alias("is_idx"),
            F.explode(sitemap_locs(F.col("xml"))).alias("loc"),
        )
        new_pages = entries.filter(~F.col("is_idx")).select(
            F.col("loc").alias("url_raw"), F.col("sm_url").alias("parent_url")
        )
        pages = new_pages if pages is None else pages.unionByName(new_pages)
        pending = entries.filter(F.col("is_idx")).select(
            F.col("loc").alias("sm_url"), (F.col("sm_depth") + 1).alias("sm_depth")
        )
    if pages is None:
        return sitemap_urls.sparkSession.createDataFrame(
            [], "url_canon string, url_hash long, host string, depth int,"
            " parent_url string, job_type string",
        )
    canon = canonicalize(F.col("url_raw"))
    return (
        pages.select(
            canon.alias("url_canon"),
            engine_hash(canon).alias("url_hash"),
            url_host(canon).alias("host"),
            F.lit(0).alias("depth"),  # sitemap pages enter at depth 0
            "parent_url",
            F.lit("page").alias("job_type"),
        )
        .filter(F.col("url_canon").isNotNull())
        .dropDuplicates(["url_hash"])
    )
