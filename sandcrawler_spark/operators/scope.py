"""HTML ingest scope classification — the reference's
``html_guess_platform`` / ``html_guess_scope`` decision chain
(``python/sandcrawler/ingest_html.py:232-279,282-374``) as pure
Catalyst column logic.

The reference walks a parsed DOM (selectolax) for four signals — the
``meta[name=generator]`` content, the ``a[id=developedBy]`` text, the
OJS body id, and the x-icon link href — and otherwise decides on raw
substring checks over the HTML and the URL plus the extracted biblio
and the TEI body word count. Here the four DOM signals are extracted
with anchored regexes over the raw HTML (both attribute orders
accepted); everything else is the same substring/threshold chain, in
the reference's exact evaluation order, including its quirks:

- the OJS branch returns the bare string ``fulltext`` (not
  ``article-fulltext``) and falls through to ``other`` unconditionally
  (ingest_html.py:341-352);
- ``scielo`` URLs that are neither sci_abstract nor sci_arttext fall
  through to the rest of the chain (:318-322);
- the homepage test is ``url.count('/') <= 2 or (== 3 and trailing
  slash)`` (:330-331).

``url_fuzzy_equal_col`` is the Catalyst version of the self-link test
(misc.py:22-36) minus the WHATWG clean_url hop: exact for
already-canonical URLs (biblio fulltext URLs are resolved/canonicalized
upstream by the biblio extractor); the Python kernel
``functions.urlkeys.url_fuzzy_equal`` remains the messy-input referee.

Everything is whole-stage-codegen'd string logic — no Python, no
shuffle, so scope classification composes into any scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _attr_extract(html: Column, tag: str, key_attr: str, key_val: str, want: str) -> Column:
    """First value of ``want=...`` on a ``<tag ... key_attr=key_val ...>``
    element, accepting either attribute order and either quote style."""
    fwd = rf"<{tag}[^>]*\b{key_attr}=['\"]{key_val}['\"][^>]*\b{want}=['\"]([^'\"]*)"
    rev = rf"<{tag}[^>]*\b{want}=['\"]([^'\"]*)['\"][^>]*\b{key_attr}=['\"]{key_val}['\"]"
    return F.coalesce(
        F.nullif(F.regexp_extract(html, fwd, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, rev, 1), F.lit("")),
    )


def html_platform_col(url: Column, html: Column) -> Column:
    """ingest_html.py:232-279 (html_guess_platform): generator-meta
    chain, OJS body id, raw publisher literals, icon-href hosts, scielo
    URL fallback. NULL = no platform guess."""
    generator = F.lower(
        F.coalesce(
            _attr_extract(html, "meta", "name", "generator", "content"),
            F.nullif(
                F.regexp_extract(html, r"<a[^>]*\bid=['\"]developedBy['\"][^>]*>([^<]*)<", 1),
                F.lit(""),
            ),
        )
    )
    icon_href = _attr_extract(html, "link", "type", "image/x-icon", "href")
    return (
        F.when(generator.contains("open journal systems 3"), F.lit("ojs3"))
        .when(generator.contains("open journal systems"), F.lit("ojs"))
        .when(generator.contains("plone"), F.lit("plone"))
        .when(generator.contains("wordpress"), F.lit("wordpress"))
        .when(generator.contains("blogger"), F.lit("blogger"))
        .when(
            html.rlike(r"<body[^>]*\bid=['\"]pkp-common-openJournalSystems['\"]"),
            F.lit("ojs"),
        )
        .when(
            html.contains(
                'powered by <a target="blank" href="http://pkp.sfu.ca/ojs/">PKP OJS</a>'
            ),
            F.lit("ojs"),
        )
        .when(
            html.contains('<a href="https://www.pubpub.org">Published with'),
            F.lit("pubpub"),
        )
        .when(
            html.contains('Powered by <a target="_blank" href="http://arphahub.com">'),
            F.lit("arpha"),
        )
        .when(
            html.contains(
                "<meta property='og:image' content='http://cms.galenos.com.tr' />"
            ),
            F.lit("galenos"),
        )
        .when(icon_href.contains("journalssystem.com"), F.lit("journalssystem.com"))
        .when(icon_href.contains("indexcopernicus.com"), F.lit("indexcopernicus"))
        .when(url.contains("scielo"), F.lit("scielo"))
    )


def _fuzz(u: Column) -> Column:
    """misc.py:27-31 minus clean_url: drop scheme, every 'www.', ':80/'."""
    no_scheme = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    return F.replace(F.replace(no_scheme, F.lit("www."), F.lit("")), F.lit(":80/"), F.lit("/"))


def url_fuzzy_equal_col(left: Column, right: Column) -> Column:
    fl, fr = _fuzz(left), _fuzz(right)
    return (
        (fl == fr)
        | (fl == F.concat(fr, F.lit("/")))
        | (fr == F.concat(fl, F.lit("/")))
    )


def html_scope_col(
    url: Column,
    html: Column,
    platform: Column,
    html_fulltext_url: Column,
    title: Column,
    pdf_fulltext_url: Column,
    word_count: Column,
) -> Column:
    """ingest_html.py:282-374 (html_guess_scope) as one when-chain, in
    the reference's evaluation order. ``platform`` is
    :func:`html_platform_col` (passed in so callers can materialize it
    once); biblio fields come from the biblio extractor (NULL = absent,
    matching the reference's truthiness checks)."""
    slashes = F.length(url) - F.length(F.replace(url, F.lit("/"), F.lit("")))
    wc = word_count
    has_ft = html_fulltext_url.isNotNull() & (html_fulltext_url != "")
    ojs_like = platform.isin("ojs", "ojs3")
    return (
        F.when(url.endswith("/cookieAbsent"), F.lit("blocked-cookie"))
        .when(
            url.contains("://page-one.live.cf.public.springer.com"),
            F.lit("article-sample"),
        )
        .when(url.contains("scielo") & url.contains("sci_abstract"), F.lit("landingpage"))
        .when(url.contains("scielo") & url.contains("sci_arttext"), F.lit("article-fulltext"))
        .when(url.contains("showcaptcha.asp"), F.lit("blocked-captcha"))
        .when(
            (slashes <= 2) | ((slashes == 3) & url.endswith("/")),
            F.lit("homepage-domain"),
        )
        .when(
            has_ft,
            F.when(url_fuzzy_equal_col(html_fulltext_url, url), F.lit("article-fulltext"))
            .otherwise(F.lit("landingpage")),
        )
        .when(
            ojs_like,
            F.when(
                title.isNotNull() & (title != ""),
                F.when(wc.isNotNull() & (wc > 1200), F.lit("fulltext")).otherwise(
                    F.lit("landingpage")
                ),
            )
            .when(
                url.contains("/article/view/") & wc.isNotNull() & (wc > 600),
                F.lit("fulltext"),
            )
            .otherwise(F.lit("other")),
        )
        .when(
            (platform == "journalssystem.com")
            & pdf_fulltext_url.isNotNull() & (pdf_fulltext_url != "")
            & wc.isNotNull() & (wc != 0) & (wc < 1000),
            F.lit("landingpage"),
        )
        .when(url.contains("karger.com/Article/Abstract"), F.lit("landingpage"))
        .when(
            url.contains("dergipark.gov.tr") & ~url.contains("download/article-file"),
            F.lit("other"),
        )
        .when(
            html.contains("<center><h1>403 Forbidden</h1></center>"),
            F.lit("blocked-forbidden"),
        )
        .when(wc.isNotNull() & (wc < 20), F.lit("stub"))
        .when(
            wc.isNotNull() & (wc > 500) & platform.isin("wordpress", "blogger"),
            F.lit("article-fulltext"),
        )
        .when(wc.isNotNull() & (wc > 1200), F.lit("article-fulltext"))
        .otherwise(F.lit("unknown"))
    )
