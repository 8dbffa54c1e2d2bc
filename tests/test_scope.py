"""Goldens for HTML scope classification (operators/scope.py vs
ingest_html.py:232-374): platform-signal extraction vectors (generator
meta in both attribute orders, developedBy anchor, OJS body id, raw
publisher literals, icon hrefs, scielo URL fallback) and the scope
decision chain's platform-dependent branches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sandcrawler_spark.operators import scope

PLAIN = "<html><body>x</body></html>"

# (url, html, expected platform)
PLATFORM_VECTORS = [
    ("https://a.org/x", '<meta name="generator" content="Open Journal Systems 3.1"/>', "ojs3"),
    ("https://a.org/x", "<meta content='Open Journal Systems' name='generator'/>", "ojs"),
    ("https://a.org/x", '<meta name="generator" content="Plone 5"/>', "plone"),
    ("https://a.org/x", '<meta name="generator" content="WordPress 6"/>', "wordpress"),
    ("https://a.org/x", '<meta name="generator" content="Blogger"/>', "blogger"),
    # developedBy anchor text feeds the same generator chain
    ("https://a.org/x", '<a id="developedBy">Open Journal Systems 3</a>', "ojs3"),
    # body id without any generator
    ("https://a.org/x", '<body id="pkp-common-openJournalSystems">', "ojs"),
    # raw literals
    (
        "https://a.org/x",
        'powered by <a target="blank" href="http://pkp.sfu.ca/ojs/">PKP OJS</a>',
        "ojs",
    ),
    ("https://a.org/x", '<a href="https://www.pubpub.org">Published with', "pubpub"),
    (
        "https://a.org/x",
        'Powered by <a target="_blank" href="http://arphahub.com">',
        "arpha",
    ),
    (
        "https://a.org/x",
        "<meta property='og:image' content='http://cms.galenos.com.tr' />",
        "galenos",
    ),
    # icon hrefs
    (
        "https://a.org/x",
        '<link type="image/x-icon" href="https://cdn.journalssystem.com/f.ico"/>',
        "journalssystem.com",
    ),
    (
        "https://a.org/x",
        '<link href="https://indexcopernicus.com/f.ico" type="image/x-icon"/>',
        "indexcopernicus",
    ),
    # a generator that matches nothing does NOT shadow later signals
    (
        "https://a.org/x",
        '<meta name="generator" content="Hugo"/>'
        '<link type="image/x-icon" href="https://indexcopernicus.com/f.ico"/>',
        "indexcopernicus",
    ),
    # scielo URL fallback
    ("https://www.scielo.br/j/abc", PLAIN, "scielo"),
    ("https://a.org/x", PLAIN, None),
]


def test_platform_vectors(spark):
    df = spark.createDataFrame(
        [(i, u, h) for i, (u, h, _) in enumerate(PLATFORM_VECTORS)], ["i", "url", "html"]
    )
    got = {
        r["i"]: r["p"]
        for r in df.select(
            "i", scope.html_platform_col(F.col("url"), F.col("html")).alias("p")
        ).collect()
    }
    for i, (_, _, want) in enumerate(PLATFORM_VECTORS):
        assert got[i] == want, PLATFORM_VECTORS[i]


# (url, html, ft_url, title, pdf_url, wc, expected scope)
SCOPE_VECTORS = [
    # fuzzy self-link: trailing slash + www + scheme all tolerated
    ("https://a.org/art/1", PLAIN, "http://www.a.org/art/1/", None, None, 900,
     "article-fulltext"),
    # journalssystem.com + pdf link + small wc → landingpage
    ("https://a.org/art/2",
     '<link type="image/x-icon" href="https://journalssystem.com/f.ico"/>',
     None, None, "https://a.org/a.pdf", 800, "landingpage"),
    # ... but wc = 0 is falsy in the reference → falls through to stub
    ("https://a.org/art/3",
     '<link type="image/x-icon" href="https://journalssystem.com/f.ico"/>',
     None, None, "https://a.org/a.pdf", 0, "stub"),
    # dergipark download/article-file is exempt from 'other'
    ("https://dergipark.gov.tr/download/article-file/9", PLAIN, None, None, None,
     1500, "article-fulltext"),
    # word_count None → unknown
    ("https://a.org/art/5", PLAIN, None, None, None, None, "unknown"),
]


def test_scope_vectors(spark):
    df = spark.createDataFrame(
        [(i, *v) for i, (*v, _) in enumerate(SCOPE_VECTORS)],
        "i int, url string, html string, ft string, title string, pdf string, wc int",
    )
    platform = scope.html_platform_col(F.col("url"), F.col("html"))
    got = {
        r["i"]: r["s"]
        for r in df.withColumn("platform", platform)
        .select(
            "i",
            scope.html_scope_col(
                F.col("url"), F.col("html"), F.col("platform"),
                F.col("ft"), F.col("title"), F.col("pdf"), F.col("wc"),
            ).alias("s"),
        )
        .collect()
    }
    for i, (*_, want) in enumerate(SCOPE_VECTORS):
        assert got[i] == want, SCOPE_VECTORS[i]
