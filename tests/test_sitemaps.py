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
