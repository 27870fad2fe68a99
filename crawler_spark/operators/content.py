"""Content-extraction operators (SURVEY §2.C) — title/date/author/main
content cascades over HTML, as column-expression regex chains.

Reference lineage (/root/reference/core/content_extractor.py): title =
<title> minus '| site' suffix, else first <h1> (414-452); date = <time
datetime> then meta tags then date-classes (454-507); author = meta
author then author-classes (509-553); clean = drop nav/script/footer…
(328-347); main content = scored candidate blocks (349-412).

The driver's tables carry no HTML, so a deterministic page is
synthesized per document row — in BOTH dialects from the same
constants — and the extraction cascades run on it. Docs with
doc_id % 7 == 0 omit <title> entirely, so the title cascade's h1
fallback is actually exercised (not dead code). The reference's
soup-based block scoring (C2) keeps its formula: len(text) + 50·#p
(if >2) + 100·[has h1-h3] − 200·[link-ratio > 0.5], argmax over
blocks; here the synthetic page has a content div and a boilerplate
div and the score must pick the right one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SITE_SUFFIX = " | ExampleSite"


# -- deterministic page synthesis (both dialects) ---------------------------


def synth_html(doc_id: Column, text: Column) -> Column:
    """HTML page for a document row; doc_id%7==0 pages have no <title>."""
    title_tag = F.when(
        F.pmod(doc_id, 7) == 0, F.lit("")
    ).otherwise(
        F.concat(
            F.lit("<title>Doc "), doc_id.cast("string"), F.lit(SITE_SUFFIX + "</title>")
        )
    )
    date = F.concat(
        F.lit("2024-"),
        (F.pmod(doc_id, 12) + 1).cast("string"),
        F.lit("-"),
        (F.pmod(doc_id, 28) + 1).cast("string"),
    )
    return F.concat(
        F.lit("<html><head>"),
        title_tag,
        F.lit('<meta name="author" content="Author '),
        F.pmod(doc_id, 20).cast("string"),
        F.lit('"><time datetime="'),
        date,
        F.lit('"></time></head><body><nav><a href="/a">x</a><a href="/b">y</a></nav>'),
        F.lit('<div class="content"><h1>Doc '),
        doc_id.cast("string"),
        F.lit("</h1><p>"),
        text,
        F.lit("</p><p>tail</p><p>more</p></div>"),
        F.lit("<footer>boilerplate</footer></body></html>"),
    )


def sql_synth_html(doc_id: str = "doc_id", text: str = "text") -> str:
    title_tag = (
        f"(CASE WHEN {doc_id} % 7 = 0 THEN '' "
        f"ELSE '<title>Doc ' || {doc_id} || '{SITE_SUFFIX}</title>' END)"
    )
    date = f"('2024-' || ({doc_id} % 12 + 1) || '-' || ({doc_id} % 28 + 1))"
    return (
        f"('<html><head>' || {title_tag} || "
        f"'<meta name=\"author\" content=\"Author ' || ({doc_id} % 20) || "
        f"'\"><time datetime=\"' || {date} || "
        f"'\"></time></head><body><nav><a href=\"/a\">x</a><a href=\"/b\">y</a></nav>' || "
        f"'<div class=\"content\"><h1>Doc ' || {doc_id} || '</h1><p>' || {text} || "
        f"'</p><p>tail</p><p>more</p></div>' || "
        f"'<footer>boilerplate</footer></body></html>')"
    )


# -- C3: title cascade -------------------------------------------------------

RE_TITLE = r"<title>([^<]*)</title>"
RE_H1 = r"<h1>([^<]*)</h1>"


def extract_title(html: Column) -> Column:
    """<title> minus the '| site' suffix, else first <h1>."""
    t = F.regexp_extract(html, RE_TITLE, 1)
    t = F.regexp_replace(t, r"\s*\|\s*[^|]*$", "")
    h1 = F.regexp_extract(html, RE_H1, 1)
    return F.when(t != "", t).otherwise(h1)


def sql_extract_title(html: str) -> str:
    t = f"regexp_replace(regexp_extract({html}, '{RE_TITLE}', 1), '\\s*\\|\\s*[^|]*$', '')"
    h1 = f"regexp_extract({html}, '{RE_H1}', 1)"
    return f"(CASE WHEN {t} <> '' THEN {t} ELSE {h1} END)"


# -- C4: date cascade --------------------------------------------------------

RE_TIME = r'<time datetime="([^"]*)"'
RE_META_DATE = r'property="article:published_time" content="([^"]*)"'


def extract_date(html: Column) -> Column:
    t = F.regexp_extract(html, RE_TIME, 1)
    meta = F.regexp_extract(html, RE_META_DATE, 1)
    return F.when(t != "", t).otherwise(F.when(meta != "", meta))


def sql_extract_date(html: str) -> str:
    t = f"regexp_extract({html}, '{RE_TIME}', 1)"
    meta = f"regexp_extract({html}, 'property=\"article:published_time\" content=\"([^\"]*)\"', 1)"
    return f"(CASE WHEN {t} <> '' THEN {t} WHEN {meta} <> '' THEN {meta} END)"


# -- C5: author --------------------------------------------------------------

RE_META_AUTHOR = r'name="author" content="([^"]*)"'


def extract_author(html: Column) -> Column:
    """meta author with the reference's 2-50 char length guard."""
    a = F.regexp_extract(html, RE_META_AUTHOR, 1)
    return F.when((F.length(a) >= 2) & (F.length(a) <= 50), a)


def sql_extract_author(html: str) -> str:
    a = f"regexp_extract({html}, 'name=\"author\" content=\"([^\"]*)\"', 1)"
    return f"(CASE WHEN length({a}) BETWEEN 2 AND 50 THEN {a} END)"


# -- C1: clean ---------------------------------------------------------------

DROP_TAGS = "script|style|iframe|noscript|header|footer|nav|aside"


def clean_html(html: Column) -> Column:
    """Drop boilerplate elements then strip all tags → visible text."""
    no_blocks = F.regexp_replace(
        html, f"<({DROP_TAGS})[^>]*>.*?</({DROP_TAGS})>", " "
    )
    return F.trim(F.regexp_replace(F.regexp_replace(no_blocks, "<[^>]*>", " "), r"\s+", " "))


def sql_clean_html(html: str) -> str:
    no_blocks = (
        f"regexp_replace({html}, '<({DROP_TAGS})[^>]*>.*?</({DROP_TAGS})>', ' ', 'g')"
    )
    return (
        f"trim(regexp_replace(regexp_replace({no_blocks}, '<[^>]*>', ' ', 'g'), "
        f"'\\s+', ' ', 'g'))"
    )


# -- C2: main-content block scoring -----------------------------------------


def _block_score(block_text: Column, n_p: Column, has_h: Column, link_ratio: Column) -> Column:
    return (
        F.length(block_text)
        + F.when(n_p > 2, n_p * 50).otherwise(0)
        + F.when(has_h, 100).otherwise(0)
        - F.when(link_ratio > 0.5, 200).otherwise(0)
    )


def extract_main_content(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """Score the content div vs the nav block with the reference
    formula; return the winner's text. (On the synthetic page the div
    must win — the assertion that boilerplate loses is the test.)"""
    html = F.col(html_col)
    div = F.regexp_extract(html, r'<div class="content">(.*?)</div>', 1)
    nav = F.regexp_extract(html, r"<nav>(.*?)</nav>", 1)

    def features(block: Column):
        text = F.trim(F.regexp_replace(F.regexp_replace(block, "<[^>]*>", " "), r"\s+", " "))
        n_p = F.size(F.split(block, "<p>")) - 1
        has_h = block.rlike("<h[1-3]>")
        link_text = F.regexp_replace(
            F.concat_ws(" ", F.regexp_extract_all(block, F.lit(r">([^<]*)</a>"), 1)),
            r"\s+", " ",
        )
        ratio = F.when(
            F.length(text) > 0, F.length(link_text).cast("double") / F.length(text)
        ).otherwise(F.lit(0.0))
        return text, _block_score(text, n_p, has_h, ratio)

    div_text, div_score = features(div)
    nav_text, nav_score = features(nav)
    return docs.select(
        "doc_id",
        F.when(div_score >= nav_score, div_text).otherwise(nav_text).alias("main_content"),
        div_score.cast("long").alias("div_score"),
        nav_score.cast("long").alias("nav_score"),
    )


# -- D7: selector mining -----------------------------------------------------

# candidate cascades, in reference priority order
# (/root/reference/core/structure_discovery.py:269-548: tag+class regex
# cascades -> container/title/content/date/author selectors)
SELECTOR_CANDIDATES = {
    "container": [r'<div class="(content|article|post|main)"', r"<article"],
    "title": [r"<h1>", r'<[^>]*class="(title|headline)"', r"<h2>"],
    "content": [r"<p>", r'<[^>]*class="(body|text|entry)"'],
    "date": [r"<time datetime=", r'<[^>]*class="(date|published)"'],
    "author": [r'name="author"', r'<[^>]*class="(author|byline)"'],
}


def mine_selectors(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """D7: first matching candidate per field → map<string,string>.

    Column-expression re-expression of the reference's soup cascades:
    each candidate regex is probed with rlike in priority order; the
    winning PATTERN string is recorded as the 'selector'. Output one
    map column per page (doc_id, selectors)."""
    html = F.col(html_col)
    entries = []
    for field, patterns in SELECTOR_CANDIDATES.items():
        sel = F.lit(None).cast("string")
        for pat in reversed(patterns):
            sel = F.when(html.rlike(pat), F.lit(pat)).otherwise(sel)
        entries.extend([F.lit(field), sel])
    return docs.select("doc_id", F.create_map(*entries).alias("selectors"))


def selector_census(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """Aggregate D7 over a corpus: per (field, selector) page counts —
    the pattern-persistence input (structure_discovery.py:644-696)."""
    mined = mine_selectors(docs, html_col)
    exploded = mined.select("doc_id", F.explode(F.col("selectors")).alias("field", "selector"))
    return (
        exploded.filter(F.col("selector").isNotNull())
        .groupBy("field", "selector")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
