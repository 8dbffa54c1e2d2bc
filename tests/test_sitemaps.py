"""Sitemap XML parsing (urlset + sitemapindex, optional fields,
malformed entries) and the seed-row conversion contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sandcrawler_spark.sources.sitemaps import seeds_from_sitemaps, sitemap_entries

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://example.org/a </loc>
    <lastmod>2024-03-01</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://example.org/b</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://example.org/sm/part1.xml</loc>
           <lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>https://example.org/sm/part2.xml</loc></sitemap>
</sitemapindex>"""


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [("https://example.org/sitemap.xml", XML),
         ("https://example.org/sitemap_index.xml", INDEX)],
        "fetch_url string, xml string",
    )
    return sitemap_entries(df).collect()


def test_urlset_fields(parsed):
    urls = {r["url"]: r for r in parsed if r["kind"] == "url"}
    # loc whitespace trimmed, optional fields null when absent,
    # loc-less entry dropped
    assert set(urls) == {"https://example.org/a", "https://example.org/b"}
    a = urls["https://example.org/a"]
    assert (a["lastmod"], a["sm_priority"]) == ("2024-03-01", 0.8)
    b = urls["https://example.org/b"]
    assert b["lastmod"] is None and b["sm_priority"] is None


def test_sitemapindex_children(parsed):
    kids = sorted(r["url"] for r in parsed if r["kind"] == "sitemap")
    assert kids == [
        "https://example.org/sm/part1.xml",
        "https://example.org/sm/part2.xml",
    ]


def test_seeds_conversion(spark):
    df = spark.createDataFrame(
        [("https://example.org/sitemap.xml", XML)], "fetch_url string, xml string"
    )
    seeds = seeds_from_sitemaps(sitemap_entries(df)).collect()
    rows = {r["base_url"]: r for r in seeds}
    assert set(rows) == {"https://example.org/a", "https://example.org/b"}
    a = rows["https://example.org/a"]
    assert a["citation_priority"] == 0.8
    assert rows["https://example.org/b"]["citation_priority"] == 0.5  # spec default
    assert a["link_source"] == "sitemap"
    assert a["link_source_id"] == "https://example.org/sitemap.xml"
    assert sorted(r["seq"] for r in seeds) == [0, 1]
    # schema matches the datagen seeds contract
    cols = seeds_from_sitemaps(sitemap_entries(df)).columns
    assert cols == ["seq", "ingest_type", "base_url", "link_source",
                    "link_source_id", "priority", "citation_priority",
                    "depth", "force_recrawl"]


def test_robots_to_sitemap_to_seeds_chain(spark):
    """Full seed-discovery chain: robots.txt Sitemap: directive →
    (simulated fetch of that URL) → sitemap parse → frontier seed rows."""
    from sandcrawler_spark.functions.robots import parse_robots_udf

    robots = spark.createDataFrame(
        [("example.org",
          "User-agent: *\nDisallow: /private\n"
          "Sitemap: https://example.org/sitemap.xml\n")],
        "host string, robots_txt string",
    )
    directives = robots.select(
        "host",
        F.explode(parse_robots_udf("*")("robots_txt")["sitemaps"]).alias(
            "sitemap_url"
        ),
    )
    assert directives.collect()[0]["sitemap_url"] == (
        "https://example.org/sitemap.xml"
    )

    # simulated fetch: the directive URL keys the body table
    bodies = spark.createDataFrame(
        [("https://example.org/sitemap.xml", XML)], "fetch_url string, xml string"
    )
    fetched = directives.join(
        bodies, directives.sitemap_url == bodies.fetch_url
    ).select("fetch_url", "xml")
    seeds = seeds_from_sitemaps(sitemap_entries(fetched))
    assert {r["base_url"] for r in seeds.collect()} == {
        "https://example.org/a", "https://example.org/b",
    }


def test_freshness_reingest_end_to_end(spark, tmp_path):
    """Sitemap lastmod vs crawl state → force_recrawl seeds → reingest
    generation that still matches the single-threaded oracle."""
    from sandcrawler_spark.plans.datagen import gen_frontier
    from sandcrawler_spark.plans.frontier import (
        resolve_url_seen,
        run_crawl,
        run_reingest,
    )
    from sandcrawler_spark.plans.oracle import run_oracle
    from sandcrawler_spark.sources.sitemaps import freshness_reingest_seeds

    d = str(tmp_path / "data")
    gen_frontier(d, n_urls=600, n_hosts=15, n_seeds=180, seed=23)
    state = str(tmp_path / "state")
    store = run_crawl(spark, d, state, max_rounds=2)

    seen = resolve_url_seen(store.read_table("url_seen"))
    fetched = (
        seen.filter(F.col("terminal_dt").isNotNull())
        .orderBy("canonical_url")
        .limit(10)
        .collect()
    )
    assert len(fetched) == 10
    # 6 modified after their capture, 4 long before → only 6 due
    xml = "<urlset>" + "".join(
        f"<url><loc>{r['canonical_url']}</loc>"
        f"<lastmod>{'2031-01-01' if i < 6 else '1991-01-01'}</lastmod></url>"
        for i, r in enumerate(fetched)
    ) + "</urlset>"
    entries = sitemap_entries(
        spark.createDataFrame(
            [("http://h0.example.org/sitemap.xml", xml)],
            "fetch_url string, xml string",
        )
    )
    seeds = freshness_reingest_seeds(entries, seen, seq_offset=50_000)
    rows = seeds.collect()
    assert len(rows) == 6
    assert all(r["force_recrawl"] for r in rows)
    assert {r["base_url"] for r in rows} == {
        r["canonical_url"] for r in fetched[:6]
    }

    ri_path = str(tmp_path / "freshness_seeds.parquet")
    import pyarrow.parquet as pq

    pq.write_table(seeds.orderBy("seq").toArrow(), ri_path)
    store2 = run_reingest(spark, d, state, ri_path, extra_rounds=2)
    oracle = run_oracle(d, max_rounds=2, reingest_seeds_path=ri_path,
                        reingest_rounds=2)
    got = [
        [row["canonical_url"]
         for row in store2.read_round_table(r, "fetch_order").orderBy("rank").collect()]
        for r in store2.committed_rounds
    ]
    assert got == oracle.fetch_orders


def test_sitemap_parser_never_crashes_on_garbage(spark):
    """Lenient-regex contract: arbitrary text (including nested/broken
    tags) parses without error and never emits an empty url."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frags = st.lists(
        st.sampled_from([
            "<url>", "</url>", "<loc>", "</loc>", "<sitemap>", "</sitemap>",
            "<lastmod>", "</lastmod>", "<priority>", "</priority>",
            "x", "https://e.org/p", "0.5", "&amp;", "\n", " ", "<urlset>",
        ]),
        max_size=30,
    )

    @settings(max_examples=20, deadline=None)
    @given(frags)
    def run(parts):
        xml = "".join(parts)
        rows = sitemap_entries(
            spark.createDataFrame([("u", xml)], "fetch_url string, xml string")
        ).collect()
        assert all(len(r["url"]) > 0 for r in rows)
        assert all(r["kind"] in ("url", "sitemap") for r in rows)

    run()


RSS = """<rss version="2.0"><channel>
  <item><title>A</title><link> https://example.org/rss-a </link>
        <pubDate>Tue, 05 Mar 2024 10:00:00 GMT</pubDate></item>
  <item><title>no link</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <entry><link rel="alternate" href="https://example.org/atom-a"/>
         <updated>2024-03-06T00:00:00Z</updated></entry>
  <entry><link href="https://example.org/atom-b"/></entry>
</feed>"""


def test_feed_entries_rss_and_atom(spark):
    from sandcrawler_spark.sources.feeds import feed_entries

    df = spark.createDataFrame(
        [("https://example.org/rss.xml", RSS),
         ("https://example.org/atom.xml", ATOM)],
        "fetch_url string, xml string",
    )
    rows = {r["url"]: r for r in feed_entries(df).collect()}
    assert set(rows) == {
        "https://example.org/rss-a",
        "https://example.org/atom-a",
        "https://example.org/atom-b",
    }
    assert rows["https://example.org/rss-a"]["lastmod"] == (
        "Tue, 05 Mar 2024 10:00:00 GMT"
    )
    assert rows["https://example.org/atom-a"]["lastmod"] == "2024-03-06T00:00:00Z"
    assert rows["https://example.org/atom-b"]["lastmod"] is None
    # schema-compatible with the sitemap seed converter
    seeds = seeds_from_sitemaps(feed_entries(df), link_source="feed")
    got = {r["base_url"]: r["link_source"] for r in seeds.collect()}
    assert set(got) == set(rows) and set(got.values()) == {"feed"}
