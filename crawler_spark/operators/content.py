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
    # doc_id%11==0 pages carry ONLY a Persian free-text date — the C4
    # cascade must fall through <time> and meta to the regex tier
    date_block = F.when(
        F.pmod(doc_id, 11) == 0,
        F.concat(
            F.lit("<p>تاریخ: 1402/"),
            (F.pmod(doc_id, 12) + 1).cast("string"),
            F.lit("/"),
            (F.pmod(doc_id, 28) + 1).cast("string"),
            F.lit("</p>"),
        ),
    ).otherwise(F.concat(F.lit('<time datetime="'), date, F.lit('"></time>')))
    return F.concat(
        F.lit("<html><head>"),
        title_tag,
        F.lit('<meta name="author" content="Author '),
        F.pmod(doc_id, 20).cast("string"),
        F.lit('">'),
        date_block,
        F.lit('</head><body><nav><a href="/a">x</a><a href="/b">y</a></nav>'),
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
    date_block = (
        f"(CASE WHEN {doc_id} % 11 = 0 "
        f"THEN '<p>تاریخ: 1402/' || ({doc_id} % 12 + 1) || '/' || ({doc_id} % 28 + 1) || '</p>' "
        f"ELSE '<time datetime=\"' || {date} || '\"></time>' END)"
    )
    return (
        f"('<html><head>' || {title_tag} || "
        f"'<meta name=\"author\" content=\"Author ' || ({doc_id} % 20) || "
        f"'\">' || {date_block} || "
        f"'</head><body><nav><a href=\"/a\">x</a><a href=\"/b\">y</a></nav>' || "
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
# C4 tier 3: the reference's Persian regex patterns
# (content_extractor.py:489-503: date-like runs near a تاریخ label,
# Persian or ASCII digits) — pages with no <time> and no meta fall
# through to this tier.
RE_FA_DATE = r"تاریخ: ([0-9۰-۹]{4}/[0-9۰-۹]{1,2}/[0-9۰-۹]{1,2})"


def extract_date(html: Column) -> Column:
    t = F.regexp_extract(html, RE_TIME, 1)
    meta = F.regexp_extract(html, RE_META_DATE, 1)
    fa = F.regexp_extract(html, RE_FA_DATE, 1)
    return (
        F.when(t != "", t)
        .when(meta != "", meta)
        .otherwise(F.when(fa != "", fa))
    )


def sql_extract_date(html: str) -> str:
    t = f"regexp_extract({html}, '{RE_TIME}', 1)"
    meta = f"regexp_extract({html}, 'property=\"article:published_time\" content=\"([^\"]*)\"', 1)"
    fa = f"regexp_extract({html}, '{RE_FA_DATE}', 1)"
    return (
        f"(CASE WHEN {t} <> '' THEN {t} WHEN {meta} <> '' THEN {meta} "
        f"WHEN {fa} <> '' THEN {fa} END)"
    )


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


# -- C7: list-item extraction (content_extractor.py:604-663) -----------------
#
# The reference finds a (list|items|posts|articles)-class container and
# emits {title, link, summary} per item element. Re-expression: the
# container block is isolated with one regex, per-field
# regexp_extract_all arrays are zipped into array<struct> and exploded
# — pure column expressions, no UDF, mirrored in DuckDB.

RE_ITEMS_BLOCK = r'<div class="items">(.*?)</div><footer'
RE_ITEM_LINK = r'<div class="item"><h3><a href="([^"]*)"'
RE_ITEM_TITLE = r'<h3><a href="[^"]*">([^<]*)</a>'
RE_ITEM_SUMMARY = r'<p class="summary">([^<]*)</p>'


def synth_list_html(doc_id: Column) -> Column:
    """Deterministic list page: 2..5 repeated item cards (doc_id%4+2) —
    pages with only 2 cards exercise D6's 'not enough repeats' branch."""
    k = (F.pmod(doc_id, 4) + 2).cast("int")
    ds = doc_id.cast("string")

    def card(i):
        ident = F.concat(ds, F.lit("-"), i.cast("string"))
        return F.concat(
            F.lit('<div class="item"><h3><a href="/detail/'), ident,
            F.lit('">Item '), ident,
            F.lit('</a></h3><p class="summary">Summary '), ds,
            F.lit(" "), i.cast("string"), F.lit("</p></div>"),
        )

    cards = F.array_join(F.transform(F.sequence(F.lit(0), k - 1), card), "")
    return F.concat(
        F.lit('<html><body><div class="items">'), cards,
        F.lit("</div><footer>boilerplate</footer></body></html>"),
    )


def sql_synth_list_html(doc_id: str = "doc_id") -> str:
    card = (
        f"'<div class=\"item\"><h3><a href=\"/detail/' || {doc_id} || '-' || i || "
        f"'\">Item ' || {doc_id} || '-' || i || "
        f"'</a></h3><p class=\"summary\">Summary ' || {doc_id} || ' ' || i || '</p></div>'"
    )
    cards = (
        f"array_to_string(list_transform("
        f"generate_series(0, ({doc_id} % 4 + 2)::INT - 1), i -> {card}), '')"
    )
    return (
        f"('<html><body><div class=\"items\">' || {cards} || "
        f"'</div><footer>boilerplate</footer></body></html>')"
    )


def list_items(html: Column) -> Column:
    """array<struct<title,link,summary>> of the page's item cards
    (empty array when the page has no items container)."""
    block = F.regexp_extract(html, RE_ITEMS_BLOCK, 1)
    links = F.regexp_extract_all(block, F.lit(RE_ITEM_LINK), 1)
    titles = F.regexp_extract_all(block, F.lit(RE_ITEM_TITLE), 1)
    summaries = F.regexp_extract_all(block, F.lit(RE_ITEM_SUMMARY), 1)
    n = F.size(titles)
    items = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.element_at(titles, i).alias("title"),
            F.element_at(links, i).alias("link"),
            F.element_at(summaries, i).alias("summary"),
        ),
    )
    empty = F.array().cast("array<struct<title:string,link:string,summary:string>>")
    return F.when(n > 0, items).otherwise(empty)


# -- C8: related-links extraction (content_extractor.py:665-751) -------------
#
# Container anchors → drop javascript:/mailto:/tel:/# → dedup by URL
# keeping the FIRST occurrence → cap at 10. The keep-first dedup + cap
# are window ranks (relational, bounded per page), not array folds.

RE_RELATED_BLOCK = r'<div class="related">(.*?)</div>'
RE_A_HREF = r'<a href="([^"]*)"'
RE_A_TEXT = r'<a href="[^"]*">([^<]*)</a>'
SKIP_LINK_RE = r"^(javascript:|mailto:|tel:|#)"
RELATED_CAP = 10


def synth_detail_related_html(doc_id: Column) -> Column:
    """Detail page with a related-links container: doc_id%5+8 anchors
    over an 11-URL universe (n=12 ⇒ a wrap-around duplicate, n≥11 ⇒
    the 10-link cap binds), plus one always-duplicated anchor and one
    javascript: anchor the extractor must skip."""
    n = (F.pmod(doc_id, 5) + 8).cast("int")
    ds = doc_id.cast("string")

    def anchor(i):
        rel = F.pmod(doc_id * 3 + i, 11).cast("string")
        return F.concat(
            F.lit('<a href="/rel/'), rel, F.lit('">Rel '), ds,
            F.lit(" "), i.cast("string"), F.lit("</a>"),
        )

    anchors = F.array_join(F.transform(F.sequence(F.lit(0), n - 1), anchor), "")
    dup0 = F.concat(
        F.lit('<a href="/rel/'), F.pmod(doc_id * 3, 11).cast("string"),
        F.lit('">Rel dup</a>'),
    )
    return F.concat(
        F.lit('<html><body><div class="related">'), anchors,
        F.lit('<a href="javascript:void(0)">skip</a>'), dup0,
        F.lit("</div></body></html>"),
    )


def sql_synth_detail_related_html(doc_id: str = "doc_id") -> str:
    anchor = (
        f"'<a href=\"/rel/' || (({doc_id} * 3 + i) % 11) || '\">Rel ' || "
        f"{doc_id} || ' ' || i || '</a>'"
    )
    anchors = (
        f"array_to_string(list_transform("
        f"generate_series(0, ({doc_id} % 5 + 8)::INT - 1), i -> {anchor}), '')"
    )
    dup0 = f"('<a href=\"/rel/' || (({doc_id} * 3) % 11) || '\">Rel dup</a>')"
    return (
        f"('<html><body><div class=\"related\">' || {anchors} || "
        f"'<a href=\"javascript:void(0)\">skip</a>' || {dup0} || "
        f"'</div></body></html>')"
    )


def related_links(
    pages: DataFrame, html_col: str = "html", cap: int = RELATED_CAP
) -> DataFrame:
    """(doc_id, rk, url, title): the page's related links after skip-
    scheme filter, keep-first dedup, and the reference's cap of 10."""
    from pyspark.sql import Window

    html = F.col(html_col)
    block = F.regexp_extract(html, RE_RELATED_BLOCK, 1)
    urls = F.regexp_extract_all(block, F.lit(RE_A_HREF), 1)
    titles = F.regexp_extract_all(block, F.lit(RE_A_TEXT), 1)
    n = F.size(urls)
    pairs = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                F.element_at(urls, i).alias("url"),
                F.element_at(titles, i).alias("title"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<url:string,title:string>>"))
    exploded = pages.select(
        "doc_id", F.posexplode(pairs).alias("pos", "p")
    ).select("doc_id", "pos", F.col("p.url").alias("url"), F.col("p.title").alias("title"))
    exploded = exploded.filter(~F.col("url").rlike(SKIP_LINK_RE))
    w_dedup = Window.partitionBy("doc_id", "url").orderBy("pos")
    w_rank = Window.partitionBy("doc_id").orderBy("pos")
    return (
        exploded.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= cap)
        .select("doc_id", "rk", "url", "title")
    )


# -- D6: page-type detection from DOM (structure_discovery.py:213-267) -------

RE_CARD = r'<div class="item"'
RE_ARTICLE_CONTAINER = r'<div class="(content|article|post)">'


def page_type_from_dom(html: Column) -> Column:
    """≥3 repeated card elements → 'list'; article container, or one
    h1 plus a >500-char text block → 'detail'; else 'generic'."""
    cards = F.size(F.regexp_extract_all(html, F.lit(RE_CARD), 0))
    has_article = html.rlike(RE_ARTICLE_CONTAINER)
    h1s = F.size(F.regexp_extract_all(html, F.lit("<h1>"), 0))
    big = F.length(clean_html(html)) > 500
    return (
        F.when(cards >= 3, F.lit("list"))
        .when(has_article | ((h1s == 1) & big), F.lit("detail"))
        .otherwise(F.lit("generic"))
    )


def sql_page_type_from_dom(html: str) -> str:
    cards = f"len(regexp_extract_all({html}, '{RE_CARD}'))"
    has_article = f"regexp_matches({html}, '{RE_ARTICLE_CONTAINER}')"
    h1s = f"len(regexp_extract_all({html}, '<h1>'))"
    big = f"(length({sql_clean_html(html)}) > 500)"
    return (
        f"(CASE WHEN {cards} >= 3 THEN 'list' "
        f"WHEN {has_article} OR ({h1s} = 1 AND {big}) THEN 'detail' "
        f"ELSE 'generic' END)"
    )


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
