"""GROBID/Crossref reference-pipeline battery (operators/tei.py):
citation-string cleaning, the should-parse gate + per-work cap of
crossref_refs, and TEI-XML header extraction — each driven by a
deterministic corpus synthesized from the part/lineitem tables with an
exact DuckDB oracle. The TEI oracle regenerates the fields that the
Spark side must recover by actually parsing the XML (including the
malformed-XML → 'bad-grobid-xml' rows), so the comparison checks the
parse, not the generator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.operators import tei
from sandcrawler_spark.queries.battery import _t


def bib_clean_unstructured(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    name = F.col("p_name")
    raw = (
        F.when(k % 4 == 0, F.concat(name, F.lit("  "), name))
        .when(k % 4 == 1, F.concat(F.lit("Ref: "), F.replace(name, F.lit("a"), F.lit("&#232;"))))
        .when(k % 4 == 2, F.concat(F.lit("  "), name, F.lit(" ")))
        .otherwise(F.concat(name, F.lit(" &amp; more")))
    )
    return p.select(
        k.alias("p_partkey"),
        tei.clean_crossref_unstructured_col(raw).alias("clean_ref"),
    )


def bib_crossref_refs(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    pk, ok = F.col("l_partkey"), F.col("l_orderkey")
    refs = li.select(
        F.concat(
            F.lit("10."), (ok % 999).cast("string"), F.lit("/W"), ok.cast("string")
        ).alias("work_doi"),
        F.lit("2024-01-01T00:00:00Z").alias("indexed_ts"),
        # l_linenumber repeats within an order in this fixture; the cap
        # needs a total order per work, so fold partkey+suppkey in
        (F.col("l_linenumber").cast("bigint") * 100000000
         + pk * 10000 + F.col("l_suppkey") % 10000).alias("position"),
        F.concat(F.lit("k"), F.col("l_linenumber").cast("string")).alias("key"),
        F.when(pk % 13 == 0, F.concat(F.lit("10.9/"), pk.cast("string"))).alias("DOI"),
        F.when(F.col("l_suppkey") % 17 == 0, F.lit("tiny"))
        .otherwise(
            F.concat(
                F.lit("Citation "), pk.cast("string"),
                F.lit("  Citation "), pk.cast("string"),
            )
        )
        .alias("unstructured"),
        F.when(pk % 2 == 0, F.lit("2019")).alias("year"),
        F.when(pk % 3 == 0, F.lit("A")).alias("author"),
        F.when(pk % 5 == 0, F.lit("T")).alias("article_title"),
        F.lit(None).cast("string").alias("series_title"),
        F.lit(None).cast("string").alias("volume_title"),
        F.when(pk % 7 == 0, F.lit("J")).alias("journal_title"),
        F.when(pk % 11 == 0, F.lit("3")).alias("volume"),
        F.when(pk % 4 == 0, F.lit("7")).alias("first_page"),
    )
    return tei.crossref_refs_prep(refs, max_refs_per_work=3)


def bib_tei_metadata(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    lang = (
        F.when(k % 3 == 0, F.lit("en")).when(k % 3 == 1, F.lit("de")).otherwise(F.lit("fr"))
    )
    year = (1990 + k % 30).cast("string")
    ks = k.cast("string")
    xml = F.when(k % 19 == 0, F.lit("<TEI><broken")).otherwise(
        F.concat(
            F.lit('<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader xml:lang="'),
            lang,
            F.lit('"><fileDesc><titleStmt><title>'),
            F.col("p_name"),
            F.lit('</title></titleStmt><publicationStmt><date type="published" when="'),
            year,
            F.lit('">'),
            year,
            F.lit('</date></publicationStmt><sourceDesc><biblStruct><analytic>'),
            F.lit("<author><persName><forename>F"),
            ks,
            F.lit("</forename><surname>S"),
            ks,
            F.lit('</surname></persName></author><idno type="DOI">10.7/'),
            ks,
            F.lit("</idno></analytic><monogr><title>Journal "),
            (k % 50).cast("string"),
            F.lit("</title></monogr></biblStruct></sourceDesc></fileDesc>"),
            F.lit("</teiHeader></TEI>"),
        )
    )
    parsed = tei.tei_biblio(p.select(k.alias("p_partkey"), xml.alias("tei_xml")))
    b = F.col("biblio")
    return parsed.select(
        "p_partkey",
        b["status"].alias("status"),
        b["title"].alias("title"),
        b["date"].alias("date"),
        b["doi"].alias("doi"),
        b["journal"].alias("journal"),
        b["language_code"].alias("language_code"),
        F.try_element_at(b["authors"], F.lit(1)).alias("author1"),
    )


QUERIES4 = {
    "bib_clean_unstructured": bib_clean_unstructured,
    "bib_crossref_refs": bib_crossref_refs,
    "bib_tei_metadata": bib_tei_metadata,
}

ORACLES4 = {
    "bib_clean_unstructured": """
SELECT p_partkey,
  CASE p_partkey % 4
    WHEN 0 THEN p_name
    WHEN 1 THEN 'Ref: ' || replace(p_name, 'a', chr(232))
    WHEN 2 THEN p_name
    ELSE p_name || ' & more'
  END AS clean_ref
FROM part
""",
    "bib_crossref_refs": """
WITH refs AS (
  SELECT
    '10.' || CAST(l_orderkey % 999 AS VARCHAR) || '/W' || CAST(l_orderkey AS VARCHAR) AS work_doi,
    CAST(l_linenumber AS BIGINT) * 100000000 + l_partkey * 10000 + l_suppkey % 10000 AS position,
    'k' || CAST(l_linenumber AS VARCHAR) AS key,
    l_partkey AS pk,
    CASE WHEN l_partkey % 13 = 0 THEN '10.9/' || CAST(l_partkey AS VARCHAR) END AS ref_doi,
    CASE WHEN l_suppkey % 17 = 0 THEN 'tiny'
         ELSE 'Citation ' || CAST(l_partkey AS VARCHAR) || '  Citation ' || CAST(l_partkey AS VARCHAR)
    END AS unstructured,
    CASE WHEN l_partkey % 2 = 0 THEN '2019' END AS year,
    CASE WHEN l_partkey % 3 = 0 THEN 'A' END AS author,
    CASE WHEN l_partkey % 5 = 0 THEN 'T' END AS article_title,
    CASE WHEN l_partkey % 7 = 0 THEN 'J' END AS journal_title,
    CASE WHEN l_partkey % 11 = 0 THEN '3' END AS volume,
    CASE WHEN l_partkey % 4 = 0 THEN '7' END AS first_page
  FROM lineitem
),
keep AS (
  SELECT * FROM refs
  WHERE ref_doi IS NULL
    AND length(trim(unstructured)) > 6
    AND NOT (
      (year IS NOT NULL AND author IS NOT NULL
        AND (article_title IS NOT NULL OR journal_title IS NOT NULL))
      OR (journal_title IS NOT NULL AND volume IS NOT NULL AND first_page IS NOT NULL)
    )
),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY work_doi ORDER BY position) AS rn
  FROM keep
)
SELECT 'crossref' AS source,
  lower(work_doi) AS source_id,
  '2024-01-01T00:00:00Z' AS source_ts,
  key, position,
  'Citation ' || CAST(pk AS VARCHAR) AS clean_ref
FROM capped WHERE rn <= 3
""",
    "bib_tei_metadata": """
SELECT p_partkey,
  CASE WHEN p_partkey % 19 = 0 THEN 'bad-grobid-xml' ELSE 'success' END AS status,
  CASE WHEN p_partkey % 19 = 0 THEN NULL ELSE p_name END AS title,
  CASE WHEN p_partkey % 19 = 0 THEN NULL ELSE CAST(1990 + p_partkey % 30 AS VARCHAR) END AS date,
  CASE WHEN p_partkey % 19 = 0 THEN NULL ELSE '10.7/' || CAST(p_partkey AS VARCHAR) END AS doi,
  CASE WHEN p_partkey % 19 = 0 THEN NULL ELSE 'Journal ' || CAST(p_partkey % 50 AS VARCHAR) END AS journal,
  CASE WHEN p_partkey % 19 = 0 THEN NULL
       ELSE (CASE p_partkey % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END) END AS language_code,
  CASE WHEN p_partkey % 19 = 0 THEN NULL
       ELSE 'F' || CAST(p_partkey AS VARCHAR) || ' S' || CAST(p_partkey AS VARCHAR) END AS author1
FROM part
""",
}
