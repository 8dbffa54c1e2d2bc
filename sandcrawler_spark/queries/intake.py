"""Intake-converter battery (operators/intake.py): the reference's
bulk metadata→ingest-request converters, each driven by a
deterministic corpus synthesized from the TPC-H tables with an exact
DuckDB oracle that REPLAYS the converter semantics (gates, blocklists,
fan-out, stage maps, base32 decode, slug-group contagion) rather than
echoing the fixture."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sandcrawler_spark.operators import intake
from sandcrawler_spark.queries.battery import _t


def in_doaj_requests(spark, sf_dir):
    """doaj2ingestrequest.py end-to-end: identifier last-DOI-wins,
    fulltext gate, content-type fan-out (pdf / html+pdf / xml / drop),
    domain blocklist, canonicalization (one arm carries an uppercase
    host + explicit :80 that must normalize away)."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ks = k.cast("string")
    n = (k % 50).cast("string")
    ident = (
        F.when(k % 4 == 0, F.array(F.struct(F.lit("doi").alias("type"), F.concat(F.lit("10.7/D"), ks).alias("id"))))
        .when(
            k % 4 == 1,
            F.array(
                F.struct(F.lit("pmid").alias("type"), F.lit("99").alias("id")),
                F.struct(F.lit("DOI").alias("type"), F.concat(F.lit("10.8/E"), ks).alias("id")),
                F.struct(F.lit("doi").alias("type"), F.concat(F.lit("10.9/F"), ks).alias("id")),
            ),
        )
        .when(k % 4 == 2, F.array(F.struct(F.lit("doi").alias("type"), F.lit("junk").alias("id"))))
        .otherwise(F.lit(None).cast("array<struct<type:string,id:string>>"))
    )
    ct = (
        F.when(k % 6 == 0, F.lit("application/pdf"))
        .when(k % 6 == 1, F.lit("text/html"))
        .when(k % 6 == 2, F.lit("abstract"))
        .when(k % 6 == 3, F.lit("video/mp4"))
        .when(k % 6 == 4, F.lit(None).cast("string"))
        .otherwise(F.lit("xml"))
    )
    url1 = F.when(
        k % 7 == 0,
        F.concat(F.lit("http://Pub"), n, F.lit(".Example.org:80/a"), ks, F.lit(".pdf")),
    ).otherwise(F.concat(F.lit("http://pub"), n, F.lit(".example.org/a"), ks, F.lit(".pdf")))
    url2 = F.when(k % 5 == 0, F.concat(F.lit("http://zenodo.org/r"), ks)).otherwise(
        F.concat(F.lit("http://ok"), n, F.lit(".example.org/b"), ks)
    )
    links = F.array(
        F.struct(F.lit("fulltext").alias("type"), url1.alias("url"), ct.alias("content_type")),
        F.struct(
            F.when(k % 2 == 0, F.lit("fulltext")).otherwise(F.lit("homepage")).alias("type"),
            url2.alias("url"),
            F.lit("application/pdf").alias("content_type"),
        ),
    )
    src = o.select(
        F.concat(F.lit("DOAJ-"), ks).alias("id"),
        F.struct(ident.alias("identifier"), links.alias("link")).alias("bibjson"),
    )
    return intake.doaj_requests(src)


def in_unpaywall_requests(spark, sf_dir):
    """unpaywall2ingestrequest.py end-to-end: DOI-prefix gate, per-
    location pdf-url gate, raw-substring domain blocklist, version→
    release_stage map with an unmapped arm, evidence/pmh_id extras."""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ks = k.cast("string")
    m = (k % 40).cast("string")
    doi = F.when(k % 9 == 0, F.concat(F.lit("X"), ks)).otherwise(F.concat(F.lit("10.3/U"), ks))
    oa_status = (
        F.when(k % 4 == 0, F.lit("gold"))
        .when(k % 4 == 1, F.lit("green"))
        .when(k % 4 == 2, F.lit("bronze"))
        .otherwise(F.lit(None).cast("string"))
    )
    version = (
        F.when(k % 7 == 0, F.lit("draftVersion"))
        .when(k % 7 == 1, F.lit("submittedVersion"))
        .when(k % 7 == 2, F.lit("acceptedVersion"))
        .when(k % 7 == 3, F.lit("publishedVersion"))
        .when(k % 7 == 4, F.lit("updatedVersion"))
        .when(k % 7 == 5, F.lit("weirdVersion"))
        .otherwise(F.lit(None).cast("string"))
    )
    loc1 = F.struct(
        F.when(k % 5 != 0, F.concat(F.lit("http://loc"), m, F.lit(".example.org/"), ks, F.lit(".pdf"))).alias("url_for_pdf"),
        version.alias("version"),
        F.when(k % 2 == 0, F.lit("publisher")).otherwise(F.lit("repository")).alias("host_type"),
        F.when(k % 3 == 0, F.lit("oa journal")).when(k % 3 == 1, F.lit("")).alias("evidence"),
        F.when(k % 6 == 0, F.concat(F.lit("oai:x:"), ks)).when(k % 6 == 3, F.lit("")).alias("pmh_id"),
    )
    loc2 = F.struct(
        F.when(k % 3 == 0, F.concat(F.lit("http://figshare.com/f"), ks))
        .otherwise(F.concat(F.lit("http://loc2.example.org/"), ks, F.lit(".pdf")))
        .alias("url_for_pdf"),
        F.lit("publishedVersion").alias("version"),
        F.lit("repository").alias("host_type"),
        F.lit(None).cast("string").alias("evidence"),
        F.lit(None).cast("string").alias("pmh_id"),
    )
    src = c.select(
        doi.alias("doi"), oa_status.alias("oa_status"), F.array(loc1, loc2).alias("oa_locations")
    )
    return intake.unpaywall_requests(src)


def in_oai_requests(spark, sf_dir):
    """oai2ingestrequest.py end-to-end: oai-prefix gates and blocklist,
    formats pdf gate (absent/empty pass), first-DOI gate, last-matching
    eu-repo type → stage, per-url domain blocklist."""
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    oai = (
        F.when(k % 11 == 0, F.concat(F.lit("oai:kb.dk:"), ks))
        .when(k % 11 == 1, F.concat(F.lit("x:"), ks))
        .otherwise(F.concat(F.lit("oai:Repo"), (k % 20).cast("string"), F.lit(".org:"), ks))
    )
    good = F.concat(F.lit("http://oa"), (k % 30).cast("string"), F.lit(".example.org/p"), ks, F.lit(".pdf"))
    urls = F.when(
        k % 4 == 0, F.array(good, F.concat(F.lit("http://hdl.handle.net/h"), ks))
    ).otherwise(F.array(good))
    formats = (
        F.when(k % 5 == 0, F.lit(None).cast("array<string>"))
        .when(k % 5 == 1, F.array().cast("array<string>"))
        .when(k % 5 == 2, F.array(F.lit("text/html")))
        .when(k % 5 == 3, F.array(F.lit("application/PDF")))
        .otherwise(F.array(F.lit("x"), F.lit("Application/pdf")))
    )
    doi = (
        F.when(k % 3 == 0, F.array(F.concat(F.lit("10.2/O"), ks), F.lit("10.junk")))
        .when(k % 3 == 1, F.array(F.lit("bad")))
        .otherwise(F.lit(None).cast("array<string>"))
    )
    types = (
        F.when(
            k % 4 == 0,
            F.array(
                F.lit("info:eu-repo/semantics/draftVersion"),
                F.lit("info:eu-repo/semantics/publishedVersion"),
            ),
        )
        .when(k % 4 == 1, F.array(F.lit("nothing")))
        .when(k % 4 == 2, F.array(F.lit("info:eu-repo/semantics/acceptedVersion")))
        .otherwise(F.lit(None).cast("array<string>"))
    )
    src = p.select(
        oai.alias("oai"), urls.alias("urls"), formats.alias("formats"),
        doi.alias("doi"), types.alias("types"),
    )
    return intake.oai_requests(src)


def in_arabesque_requests(spark, sf_dir):
    """arabesque2ingestrequest.py: hit gate + verbatim final_url +
    caller-chosen extid type / release stage."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ks = k.cast("string")
    src = o.select(
        F.concat(F.lit("PMC"), ks).alias("identifier"),
        (k % 3 != 0).alias("hit"),
        F.concat(F.lit("http://arch.example.org/"), ks, F.lit(".pdf")).alias("final_url"),
    )
    return intake.arabesque_requests(
        src, link_source="pmc", extid_type="pmcid", release_stage="published"
    )


def in_enrich_matches(spark, sf_dir):
    """enrich_scored_matches.py: base32-SHA1 → lowercase hex (the C4
    kernel end-to-end — the fixture ENCODES a derived hex digest to
    base32 with an independent codec, the operator must decode it
    back), plus the projection of dois/cdx/size/mimetype."""
    from sandcrawler_spark.functions.hashes import hex_b32

    @F.pandas_udf("string")
    def _hex_b32_udf(s: pd.Series) -> pd.Series:
        return s.map(hex_b32)

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    hex40 = F.concat(F.md5(ds), F.substring(F.md5(ds), 1, 8))
    src = d.select(
        did.alias("doc_id"),
        F.concat(
            F.when(did % 2 == 0, F.lit("sha1:")).otherwise(F.lit("")),
            _hex_b32_udf(hex40),
        ).alias("raw_sha1"),
        F.array(F.concat(F.lit("10.4/"), ds)).alias("dois"),
        F.struct(
            F.concat(F.lit("http://cdx.example.org/"), ds).alias("url"),
            F.lit("20200101000000").alias("dt"),
        ).alias("cdx"),
        F.lit("application/pdf").alias("mimetype"),
        did.cast("bigint").alias("size"),
    )
    out = intake.enrich_matches(src.drop("doc_id"))
    # scalars-only output boundary (driver-sortable scalars): join the
    # doi list; it is single-element and never NULL in this fixture
    return out.select(
        "sha1",
        F.concat_ws("|", "dois").alias("dois"),
        "cdx_url", "cdx_dt", "size", "mimetype",
    )


def in_groupworks(spark, sf_dir):
    """filter_groupworks.py end-to-end: the >50-line slug drop, score
    threshold, groupworks check_authors variant (equal lengths, both-
    empty passes), year gate, and the reference's order-dependent
    second pass (first surviving line skipped, group seeded by the
    next, later lines join only on id intersection). The fixture's id
    topology (one shared hub id per slug + case-id-determined stray
    pairs) makes the sequential contagion's fixed point derivable in
    closed form, which is what the oracle states."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2400)
    k = F.col("o_orderkey")
    ks = k.cast("string")
    slug = F.when(k % 7 == 3, F.lit("big")).otherwise(
        F.concat(F.lit("g"), (k % 59).cast("string"))
    )
    a = k % 6
    left_auth = (
        F.when(a == 0, F.array(F.lit("alice smith")))
        .when(a == 1, F.array(F.lit("bob jones"), F.lit("c dee")))
        .when(a == 2, F.array().cast("array<string>"))
        .when(a == 3, F.array(F.lit("x")))
        .when(a == 4, F.array(F.lit("dan li")))
        .otherwise(F.array(F.lit("eve po")))
    )
    right_auth = (
        F.when(a == 0, F.array(F.lit("Alice Smith")))
        .when(a == 1, F.array(F.lit("Bob Jones")))
        .when(a == 2, F.array().cast("array<string>"))
        .when(a == 3, F.array(F.lit("x")))
        .when(a == 4, F.array(F.lit("Dan Li")))
        .otherwise(F.array(F.lit("Someone Else")))
    )
    y = k % 5
    ly = F.when(y == 0, F.lit(2019)).when(y == 1, F.lit(2018)).when(y == 3, F.lit(2021)).cast("int")
    ry = F.when(y == 0, F.lit(2019)).when(y == 1, F.lit(2019)).when(y == 2, F.lit(2020)).cast("int")
    stray = k % 13 == 0
    l_id = F.concat(F.lit("L"), ks)
    r_id = F.when(stray, F.concat(F.lit("X"), ks)).otherwise(F.concat(F.lit("R-"), slug))
    src = o.select(
        slug.alias("slug"),
        k.alias("seq"),
        (850 + (k * 37) % 200).cast("int").alias("score"),
        F.struct(left_auth.alias("authors"), ly.alias("year"), l_id.alias("fatcat_release")).alias("left"),
        F.struct(right_auth.alias("authors"), ry.alias("year"), r_id.alias("fatcat_release")).alias("right"),
    )
    return intake.groupworks_filter(src)


def in_covid_requests(spark, sf_dir):
    """covid2ingestrequest.py end-to-end: wanfang rows emit one
    request from url; cnki rows fan out info_url + optional read_url;
    rows with neither id fall through."""
    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    src = s.select(
        F.when(k % 3 == 0, F.concat(F.lit("W"), ks)).alias("wanfang_id"),
        F.when(k % 3 == 1, F.concat(F.lit("C"), ks)).alias("cnki_id"),
        F.concat(F.lit("http://wf.example.org/"), ks, F.lit(".pdf")).alias("url"),
        F.concat(F.lit("http://cnki.example.org/i"), ks).alias("info_url"),
        F.when(k % 2 == 0, F.concat(F.lit("http://cnki.example.org/r"), ks)).alias(
            "read_url"
        ),
    )
    return intake.covid_requests(src)


def in_archiveorg_fileset(spark, sf_dir):
    """archiveorg_fileset.py end-to-end: mediatype gate, the release_
    prefix strip (the reference's verbatim [9:] off-by-one — the
    fixture pads one junk char so a real 26-char ident survives),
    length-26 assert-as-filter, want_file (source gate, sidecar
    suffixes incl. a lowercase-item match, leading underscore,
    academictorrents extras), parse_file (size cast, format→mimetype
    with an unmapped arm), and fileset assembly. Manifest exploded to
    flat rows for the hash compare; the nested shape is pytest-golden
    tested."""
    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    item = F.when(k % 7 == 0, F.concat(F.lit("academictorrents_it"), ks)).otherwise(
        F.concat(F.lit("Item"), ks)
    )
    core = F.substring(F.md5(F.concat(F.lit("r"), ks)), 1, 26)
    rel_in = (
        F.when(k % 3 == 0, F.concat(F.lit("release_q"), core))
        .when(k % 3 == 1, core)
        .otherwise(F.lit("short"))
    )
    media = (
        F.when(k % 5 == 0, F.lit("collection"))
        .when(k % 5 == 1, F.lit("web"))
        .otherwise(F.lit("texts"))
    )

    def _file(path, source, fmt, size, tag):
        return F.struct(
            path.alias("name"),
            F.lit(source).alias("source"),
            fmt,
            (size).cast("string").alias("size"),
            F.md5(F.concat(F.lit("s" + tag + "-"), ks)).alias("sha1"),
            F.md5(F.concat(F.lit("m" + tag + "-"), ks)).alias("md5"),
        ).alias("f")

    f1 = _file(F.concat(F.lit("paper"), ks, F.lit(".pdf")), "original", F.lit("PDF").alias("format"), k + 1000, "1")
    f2 = _file(F.concat(item, F.lit("_meta.xml")), "original", F.lit("XML").alias("format"), k + 1, "2")
    f3 = _file(F.concat(F.lit("data"), ks, F.lit(".csv")), "derivative", F.lit("CSV").alias("format"), k + 2, "3")
    f4 = _file(F.concat(F.lit("_u"), ks), "original", F.lit("Text").alias("format"), k + 3, "4")
    f5 = _file(
        F.concat(F.lit("blob"), ks, F.lit(".bin")),
        "original",
        F.when(k % 2 == 0, F.lit("DAT")).otherwise(F.lit("JSON")).alias("format"),
        k + 2000,
        "5",
    )
    f6 = _file(F.concat(item, F.lit(".bib")), "original", F.lit("Text").alias("format"), k + 3000, "6")
    f8 = _file(F.concat(F.lower(item), F.lit("_thumb.png")), "original", F.lit("PNG").alias("format"), k + 4, "8")
    # f7: md5 missing -> excluded by the parse_file assert gate
    f7 = F.struct(
        F.concat(F.lit("nohash"), ks).alias("name"),
        F.lit("original").alias("source"),
        F.lit("Text").alias("format"),
        F.lit("9").alias("size"),
        F.md5(ks).alias("sha1"),
        F.lit(None).cast("string").alias("md5"),
    )
    src = s.select(
        item.alias("item_name"),
        rel_in.alias("release_id"),
        media.alias("mediatype"),
        F.array(f1, f2, f3, f4, f5, f6, f7, f8).alias("files"),
    )
    out = intake.archiveorg_filesets(src)
    m = F.explode("manifest").alias("m")
    return out.select(
        "item_name",
        F.col("release_ids")[0].alias("release_id"),
        F.col("urls")[0]["url"].alias("url"),
        m,
    ).select(
        "item_name", "release_id", "url",
        F.col("m.path").alias("path"),
        F.col("m.size").alias("size"),
        F.col("m.sha1").alias("sha1"),
        F.col("m.md5").alias("md5"),
        F.col("m.mimetype").alias("mimetype"),
    )


QUERIES6 = {
    "in_doaj_requests": in_doaj_requests,
    "in_unpaywall_requests": in_unpaywall_requests,
    "in_oai_requests": in_oai_requests,
    "in_arabesque_requests": in_arabesque_requests,
    "in_enrich_matches": in_enrich_matches,
    "in_groupworks": in_groupworks,
    "in_covid_requests": in_covid_requests,
    "in_archiveorg_fileset": in_archiveorg_fileset,
}

ORACLES6 = {
    "in_doaj_requests": """
WITH o AS (SELECT o_orderkey AS k FROM orders),
base AS (
  SELECT k,
    'doaj-' || CAST(k AS VARCHAR) AS link_source_id,
    CASE k % 4
      WHEN 0 THEN '10.7/d' || CAST(k AS VARCHAR)
      WHEN 1 THEN '10.9/f' || CAST(k AS VARCHAR)
      ELSE NULL END AS ext_doi,
    CAST(k % 50 AS VARCHAR) AS n
  FROM o
),
l1 AS (
  SELECT *,
    'http://pub' || n || '.example.org/a' || CAST(k AS VARCHAR) || '.pdf' AS base_url,
    CASE k % 6
      WHEN 0 THEN ['pdf'] WHEN 1 THEN ['html','pdf']
      WHEN 4 THEN ['pdf'] WHEN 5 THEN ['xml']
      ELSE [] END AS types
  FROM base
),
l2 AS (
  SELECT *,
    'http://ok' || n || '.example.org/b' || CAST(k AS VARCHAR) AS base_url,
    ['pdf'] AS types
  FROM base WHERE k % 2 = 0 AND k % 5 != 0
),
uni AS (
  SELECT link_source_id, ext_doi, base_url, unnest(types) AS ingest_type FROM l1
  UNION ALL
  SELECT link_source_id, ext_doi, base_url, unnest(types) AS ingest_type FROM l2
)
SELECT base_url, ingest_type,
  'doaj' AS link_source, link_source_id,
  'doaj' AS ingest_request_source,
  'published' AS release_stage, 'publisher' AS rel,
  ext_doi, link_source_id AS ext_doaj
FROM uni
""",
    "in_unpaywall_requests": """
WITH c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 9 != 0),
base AS (
  SELECT k,
    '10.3/u' || CAST(k AS VARCHAR) AS ext_doi,
    CASE k % 4 WHEN 0 THEN 'gold' WHEN 1 THEN 'green' WHEN 2 THEN 'bronze' END AS extra_oa_status
  FROM c
),
loc1 AS (
  SELECT *,
    'http://loc' || CAST(k % 40 AS VARCHAR) || '.example.org/' || CAST(k AS VARCHAR) || '.pdf' AS base_url,
    CASE k % 7 WHEN 0 THEN 'draft' WHEN 1 THEN 'submitted' WHEN 2 THEN 'accepted'
               WHEN 3 THEN 'published' WHEN 4 THEN 'updated' END AS release_stage,
    CASE WHEN k % 2 = 0 THEN 'publisher' ELSE 'repository' END AS rel,
    CASE WHEN k % 3 = 0 THEN 'oa journal' END AS extra_evidence,
    CASE WHEN k % 6 = 0 THEN 'oai:x:' || CAST(k AS VARCHAR) END AS ext_pmh_id
  FROM base WHERE k % 5 != 0
),
loc2 AS (
  SELECT *,
    'http://loc2.example.org/' || CAST(k AS VARCHAR) || '.pdf' AS base_url,
    'published' AS release_stage, 'repository' AS rel,
    CAST(NULL AS VARCHAR) AS extra_evidence, CAST(NULL AS VARCHAR) AS ext_pmh_id
  FROM base WHERE k % 3 != 0
)
SELECT base_url, 'pdf' AS ingest_type, 'unpaywall' AS link_source,
  ext_doi AS link_source_id, 'unpaywall' AS ingest_request_source,
  release_stage, rel, ext_doi, ext_pmh_id, extra_oa_status, extra_evidence
FROM (SELECT * FROM loc1 UNION ALL SELECT * FROM loc2)
""",
    "in_oai_requests": """
WITH p AS (
  SELECT p_partkey AS k FROM part
  WHERE p_partkey % 11 >= 2 AND p_partkey % 5 != 2
)
SELECT
  'http://oa' || CAST(k % 30 AS VARCHAR) || '.example.org/p' || CAST(k AS VARCHAR) || '.pdf' AS base_url,
  'pdf' AS ingest_type, 'oai' AS link_source,
  'oai:repo' || CAST(k % 20 AS VARCHAR) || '.org:' || CAST(k AS VARCHAR) AS link_source_id,
  'metha-bulk' AS ingest_request_source,
  CASE k % 4 WHEN 0 THEN 'published' WHEN 2 THEN 'accepted' END AS release_stage,
  CAST(NULL AS VARCHAR) AS rel,
  'oai:repo' || CAST(k % 20 AS VARCHAR) || '.org:' || CAST(k AS VARCHAR) AS ext_oai,
  CASE WHEN k % 3 = 0 THEN '10.2/o' || CAST(k AS VARCHAR) END AS ext_doi
FROM p
""",
    "in_arabesque_requests": """
SELECT 'http://arch.example.org/' || CAST(o_orderkey AS VARCHAR) || '.pdf' AS base_url,
  'pdf' AS ingest_type, 'pmc' AS link_source,
  'PMC' || CAST(o_orderkey AS VARCHAR) AS link_source_id,
  'arabesque' AS ingest_request_source,
  'published' AS release_stage,
  'pmcid' AS extid_type,
  'PMC' || CAST(o_orderkey AS VARCHAR) AS extid_value
FROM orders WHERE o_orderkey % 3 != 0
""",
    "in_enrich_matches": """
SELECT
  md5(CAST(doc_id AS VARCHAR)) || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS sha1,
  '10.4/' || CAST(doc_id AS VARCHAR) AS dois,
  'http://cdx.example.org/' || CAST(doc_id AS VARCHAR) AS cdx_url,
  '20200101000000' AS cdx_dt,
  CAST(doc_id AS BIGINT) AS size,
  'application/pdf' AS mimetype
FROM documents
""",
    "in_groupworks": """
WITH base AS (
  SELECT o_orderkey AS k,
    CASE WHEN o_orderkey % 7 = 3 THEN 'big'
         ELSE 'g' || CAST(o_orderkey % 59 AS VARCHAR) END AS slug
  FROM orders WHERE o_orderkey < 2400
),
counted AS (SELECT slug, count(*) AS n FROM base GROUP BY 1),
f AS (
  SELECT b.k, b.slug,
    'L' || CAST(b.k AS VARCHAR) AS l_id,
    CASE WHEN b.k % 13 = 0 THEN 'X' || CAST(b.k AS VARCHAR)
         ELSE 'R-' || b.slug END AS r_id,
    (b.k % 13 = 0) AS stray
  FROM base b JOIN counted c USING (slug)
  WHERE c.n <= 50
    AND (b.k * 37) % 200 >= 50
    AND b.k % 6 IN (0, 2, 4)
    AND b.k % 5 != 1
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY slug ORDER BY k) AS rn
  FROM f
),
seed AS (SELECT slug, stray AS seed_stray, l_id AS seed_l, r_id AS seed_r
         FROM rn WHERE rn = 2)
SELECT DISTINCT slug, fatcat_release FROM (
  SELECT slug, unnest([seed_l, seed_r]) AS fatcat_release
  FROM seed WHERE seed_stray
  UNION ALL
  SELECT r.slug, r.l_id AS fatcat_release
  FROM rn r JOIN seed s USING (slug)
  WHERE NOT s.seed_stray AND r.rn >= 2 AND NOT r.stray
  UNION ALL
  SELECT slug, seed_r AS fatcat_release FROM seed WHERE NOT seed_stray
)
""",
    "in_covid_requests": """
WITH s AS (SELECT s_suppkey AS k FROM supplier)
SELECT 'http://wf.example.org/' || CAST(k AS VARCHAR) || '.pdf' AS base_url,
  'pdf' AS ingest_type, 'wanfang_covid19' AS link_source,
  'W' || CAST(k AS VARCHAR) AS link_source_id,
  'scrape-covid19' AS ingest_request_source
FROM s WHERE k % 3 = 0
UNION ALL
SELECT 'http://cnki.example.org/i' || CAST(k AS VARCHAR) AS base_url,
  'pdf', 'cnki_covid19', 'C' || CAST(k AS VARCHAR), 'scrape-covid19'
FROM s WHERE k % 3 = 1
UNION ALL
SELECT 'http://cnki.example.org/r' || CAST(k AS VARCHAR) AS base_url,
  'pdf', 'cnki_covid19', 'C' || CAST(k AS VARCHAR), 'scrape-covid19'
FROM s WHERE k % 3 = 1 AND k % 2 = 0
""",
    "in_archiveorg_fileset": """
WITH s AS (
  SELECT s_suppkey AS k FROM supplier
  WHERE s_suppkey % 5 NOT IN (0, 1) AND s_suppkey % 3 IN (0, 1)
),
base AS (
  SELECT k,
    CASE WHEN k % 7 = 0 THEN 'academictorrents_it' || CAST(k AS VARCHAR)
         ELSE 'Item' || CAST(k AS VARCHAR) END AS item_name,
    substr(md5('r' || CAST(k AS VARCHAR)), 1, 26) AS release_id
  FROM s
),
u AS (
  SELECT *, 'https://archive.org/download/' || item_name || '/' AS url FROM base
)
SELECT item_name, release_id, url,
  'paper' || CAST(k AS VARCHAR) || '.pdf' AS path,
  CAST(k + 1000 AS BIGINT) AS size,
  md5('s1-' || CAST(k AS VARCHAR)) AS sha1,
  md5('m1-' || CAST(k AS VARCHAR)) AS md5,
  'application/pdf' AS mimetype
FROM u
UNION ALL
SELECT item_name, release_id, url,
  'blob' || CAST(k AS VARCHAR) || '.bin', CAST(k + 2000 AS BIGINT),
  md5('s5-' || CAST(k AS VARCHAR)), md5('m5-' || CAST(k AS VARCHAR)),
  CASE WHEN k % 2 = 0 THEN NULL ELSE 'application/json' END
FROM u
UNION ALL
SELECT item_name, release_id, url,
  item_name || '.bib', CAST(k + 3000 AS BIGINT),
  md5('s6-' || CAST(k AS VARCHAR)), md5('m6-' || CAST(k AS VARCHAR)),
  'text/plain'
FROM u WHERE k % 7 != 0
""",
}
