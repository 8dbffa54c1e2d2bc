"""Unit semantics for operators/imports.py and tei_affiliations —
the per-rule cases the battery fixture exercises only statistically."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sandcrawler_spark.operators import imports as imp
from sandcrawler_spark.operators import tei

CITES_T = (
    "array<struct<id:string,title:string,date:string,volume:string,"
    "url:string,issue:string,publisher:string,"
    "authors:array<struct<name:string>>>>"
)
GROBID_SCHEMA = (
    f"title string, abstract string, authors array<string>, date int, "
    f"doi string, journal struct<name:string,publisher:string,volume:string,"
    f"issue:string>, citations {CITES_T}"
)


def _grobid_row(**kw):
    base = dict(
        title="A Title",
        abstract=None,
        authors=None,
        date=None,
        doi=None,
        journal=Row(name="J", publisher=None, volume=None, issue=None),
        citations=None,
    )
    base.update(kw)
    return Row(**base)


def _release(spark, **kw):
    df = spark.createDataFrame([_grobid_row(**kw)], schema=GROBID_SCHEMA)
    rows = imp.grobid_import_releases(df).collect()
    return rows[0] if rows else None


def test_grobid_title_gate(spark):
    assert _release(spark, title=None) is None
    assert _release(spark, title="") is None
    assert _release(spark, title="  T  ").title == "T"


def test_grobid_abstract_cap(spark):
    assert _release(spark, abstract="short ").abstract_content == "short"
    assert _release(spark, abstract="x" * 4096).abstract_content is None
    # strictly-less-than gate (import_grobid_metadata.py:17)
    assert _release(spark, abstract="x" * 4095).abstract_content is not None


def test_grobid_release_date_and_extra(spark):
    r = _release(spark, date=2011, doi="10.9/UP")
    assert r.release_year == 2011
    assert str(r.release_date) == "2011-01-01"
    assert r.extra_doi == "10.9/up"
    assert r.extra_container_name == "J"
    assert r.is_longtail_oa is True
    assert _release(spark).release_date is None


def test_grobid_ref_year_parse(spark):
    cite = Row(
        id="r1", title=None, date=" 1999-12-31 ", volume=None, url=None,
        issue=None, publisher=None, authors=None,
    )
    bad = Row(
        id="r2", title=" Keep ", date="19xx", volume="", url="u",
        issue=None, publisher=" P ", authors=[Row(name="Z")],
    )
    r = _release(spark, citations=[cite, bad])
    assert [x["key"] for x in r.refs] == ["r1", "r2"]
    assert r.refs[0]["year"] == 1999
    assert r.refs[1]["year"] is None
    assert r.refs[1]["title"] == "Keep"
    assert r.refs[1]["extra_volume"] is None  # '' is falsy in the reference
    assert r.refs[1]["extra_publisher"] == "P"
    assert r.refs[1]["extra_authors"] == ["Z"]
    assert r.refs[0]["extra_authors"] is None


def test_manifest_or_none_and_gates(spark):
    fm = spark.createDataFrame(
        [
            ("a", "\\N", "12", "-"),   # kept: doi+url below
            ("b", "application/pdf", "", "m5"),  # no doi → dropped
            ("c", "-", "7", ""),       # no url → dropped
        ],
        "sha1 string, mimetype string, size_bytes string, md5 string",
    )
    dois = spark.createDataFrame(
        [("a", "10.2/z"), ("a", "10.2/a"), ("c", "10.2/c")], "sha1 string, doi string"
    )
    urls = spark.createDataFrame(
        [("a", "http://2", "dt2"), ("a", "http://1", "dt1"), ("b", "u", "d")],
        "sha1 string, url string, datetime string",
    )
    rows = imp.manifest_matches(fm, dois, urls).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.sha1 == "a" and r.mimetype is None and r.md5 is None
    assert r.size == 12
    assert r.dois == ["10.2/a", "10.2/z"]
    assert r.cdx_urls == ["http://1", "http://2"]
    assert r.cdx_dts == ["dt1", "dt2"]  # index-aligned with cdx_urls


def _resolve(spark, entities, db=(), api=()):
    e = spark.createDataFrame(entities, "sha1hex string, urls array<string>")
    d = spark.createDataFrame(
        list(db) or [], "sha1hex string, url string, dt string"
    )
    a = spark.createDataFrame(
        list(api) or [], "url string, sha1hex string, dt string"
    )
    return {r.sha1hex: r for r in imp.cdx_sha1hex_resolve(e, d, a).collect()}


WB = "https://web.archive.org/web/20200101/http://site.org/f.pdf"


def test_cdx_resolve_funnel(spark):
    out = _resolve(
        spark,
        [
            ("h1", [WB]),                       # db hit wins
            ("h2", [WB, WB]),                   # api hit, dup originals deduped
            ("h3", ["http://plain", "https://web.archive.org/web/*/x"]),
            ("h4", [WB]),                       # api has wrong digest
        ],
        db=[("h1", "http://db1", "d")],
        api=[
            ("http://site.org/f.pdf", "h2", "d"),
            ("http://site.org/f.pdf", "other", "d"),
        ],
    )
    assert out["h1"].status == "success-db" and out["h1"].found_urls == ["http://db1"]
    assert out["h2"].status == "success-api"
    assert out["h2"].n_cdx_rows == 1  # dedup before the api join
    assert out["h2"].found_urls == ["http://site.org/f.pdf"]
    assert out["h3"].status == "skip-no-urls" and out["h3"].found_urls == []
    assert out["h4"].status == "fail-not-found" and out["h4"].n_cdx_rows == 0


def test_cdx_resolve_original_url_reconstruction(spark):
    # '/'-join of segments 5.. keeps the scheme's empty segment
    # (fetch_cdx_sha1hex.py:121)
    out = _resolve(
        spark,
        [("h", ["https://web.archive.org/web/2020/http://a.b/c/d?x=1"])],
        api=[("http://a.b/c/d?x=1", "h", "d")],
    )
    assert out["h"].status == "success-api"


TEI_NS = 'xmlns="http://www.tei-c.org/ns/1.0"'


def _tei(authors_xml: str) -> str:
    return (
        f"<TEI {TEI_NS}><teiHeader><fileDesc><sourceDesc><biblStruct>"
        f"<analytic>{authors_xml}</analytic>"
        "</biblStruct></sourceDesc></fileDesc></teiHeader></TEI>"
    )


def test_tei_affiliations(spark):
    a = "<author><affiliation><orgName>MIT</orgName> <country>US</country></affiliation></author>"
    b = "<author><affiliation><orgName>MIT</orgName> <country>US</country></affiliation></author>"
    c = "<author><affiliation><orgName>ETH</orgName></affiliation></author>"
    df = spark.createDataFrame(
        [
            ("s1", _tei(a + b + c)),   # dedup to 2, sorted
            ("s2", _tei("<author/>")),  # none → dropped
            ("s3", "<TEI><broken"),     # parse error → dropped
        ],
        "sha1hex string, tei_xml string",
    )
    rows = {r.sha1hex: r for r in tei.tei_affiliations(df).collect()}
    assert set(rows) == {"s1"}
    assert rows["s1"].affiliations == ["ETH", "MIT US"]


# ---------------------------------------------------------- revisits

from sandcrawler_spark.sources.cdx import resolve_revisits

CAP_SCHEMA = (
    "url string, dt string, mimetype string, sha1hex string, "
    "refers_to_url string, refers_to_dt string"
)


def _caps(spark, rows):
    df = spark.createDataFrame(rows, CAP_SCHEMA)
    return {(r.url, r.dt): r for r in resolve_revisits(df).collect()}


def test_revisit_resolution_statuses(spark):
    rows = [
        ("http://a/1", "20200101000000", "application/pdf", "s1", None, None),
        # resolved: ISO-Z nanosecond dt normalizes to the original's dt
        ("http://a/1", "20200202000000", "warc/revisit", "rv1",
         "http://a/1", "2020-01-01T00:00:00.999999999Z"),
        # missing ref
        ("http://a/2", "20200101000000", "warc/revisit", "rv2", None, "20200101000000"),
        # bad dt (unparseable after strip)
        ("http://a/3", "20200101000000", "warc/revisit", "rv3", "http://a/1", "junk"),
        # not found
        ("http://a/4", "20200101000000", "warc/revisit", "rv4",
         "http://gone/x", "20200101000000"),
        # loop: points at another revisit
        ("http://a/5", "20200101000000", "warc/revisit", "rv5",
         "http://a/1", "20200202000000"),
    ]
    out = _caps(spark, rows)
    orig = out[("http://a/1", "20200101000000")]
    assert orig.resolve_status == "original"
    assert (orig.resolved_url, orig.resolved_sha1hex) == ("http://a/1", "s1")
    ok = out[("http://a/1", "20200202000000")]
    assert ok.resolve_status == "resolved"
    assert ok.resolved_dt == "20200101000000"
    assert ok.resolved_sha1hex == "s1"
    assert out[("http://a/2", "20200101000000")].resolve_status == "revisit-missing-ref"
    assert out[("http://a/3", "20200101000000")].resolve_status == "revisit-bad-dt"
    assert out[("http://a/4", "20200101000000")].resolve_status == "revisit-not-found"
    loop = out[("http://a/5", "20200101000000")]
    assert loop.resolve_status == "revisit-loop"
    assert loop.resolved_sha1hex is None  # one hop only, never chained


def test_revisit_dt_forms(spark):
    # all four reference-contract forms resolve; 21+-char non-Z does not
    forms_ok = [
        "20200101000000",
        "2020-01-01T00:00:00",
        "2020-01-01T00:00:00Z",
        "2020-01-01T00:00:00.173133737Z",
    ]
    rows = [("http://t/0", "20200101000000", "application/pdf", "s", None, None)]
    for i, f in enumerate(forms_ok):
        rows.append(
            (f"http://r/{i}", "20200101000000", "warc/revisit", f"r{i}", "http://t/0", f)
        )
    rows.append(
        ("http://r/bad", "20200101000000", "warc/revisit", "rb",
         "http://t/0", "2020-01-01 00:00:00.173")  # >20 chars, no trailing Z
    )
    out = _caps(spark, rows)
    for i in range(len(forms_ok)):
        assert out[(f"http://r/{i}", "20200101000000")].resolve_status == "resolved", i
    assert out[("http://r/bad", "20200101000000")].resolve_status == "revisit-bad-dt"
