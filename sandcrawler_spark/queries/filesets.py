"""Fileset/dataset-ingest battery: the platform-dispatch + strategy
pipeline (operators/fileset.py, modeling ingest_fileset.py:265-375)
driven by a deterministic request+manifest corpus derived from the
orders/lineitem tables, with an exact DuckDB oracle.

The corpus construction (all arithmetic on o_orderkey / l_*):
- o_orderkey % 5 picks the platform family (dataverse / figshare /
  zenodo / archiveorg / unmatched);
- % 23 == 0 rows get the platform's URL-scope-error shape (dataverse
  file-level persistentId, archive.org file path);
- % 31 == 0 rows get ingest_type='file' (dropped by the want gate);
- manifest = one file per lineitem row, sized by
  floor(l_extendedprice) × a per-linenumber factor, × 100 when
  o_orderkey % 53 == 0 (drives some totals past the 64 GiB gate);
- % 43 == 0 orders have their lineitems withheld (empty-manifest), and
  % 67 == 0 orders gain 201 one-byte files (too-many-files);
- ~1.7% of orderkeys have no lineitem rows at all in the TPC-H-ish
  fixture — those are organic empty-manifest cases.

The Spark side classifies the URL with parse_url/split grammar
(operators/fileset.py); the oracle re-derives platform and scope from
the URL text with regexes — both sides then apply the same gate and
strategy thresholds, so the compared aggregate checks the whole
relational pipeline, not the corpus generator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.operators import fileset
from sandcrawler_spark.queries.battery import _t

_DV = "https://demo.dataverse.org/dataset.xhtml?persistentId=doi:10.5072/FK2/"


def _fs_url(k):
    """Deterministic base_url for an orderkey column (shared by the
    request and manifest sides)."""
    six = F.lpad((k % 1000000).cast("string"), 6, "0")
    ks = k.cast("string")
    return (
        F.when(
            (k % 5 == 0) & (k % 23 == 0),
            F.concat(F.lit(_DV), six, F.lit("/"), six),
        )
        .when(k % 5 == 0, F.concat(F.lit(_DV), six))
        .when(
            k % 5 == 1,
            F.concat(
                F.lit("https://figshare.com/articles/dataset/item/"),
                (k % 100000).cast("string"),
                F.lit("/"),
                (1 + k % 9).cast("string"),
            ),
        )
        .when(k % 5 == 2, F.concat(F.lit("https://zenodo.org/record/"), ks))
        .when(
            (k % 5 == 3) & (k % 23 == 0),
            F.concat(F.lit("https://archive.org/download/item_"), ks, F.lit("/file.pdf")),
        )
        .when(k % 5 == 3, F.concat(F.lit("https://archive.org/details/item_"), ks))
        .otherwise(F.concat(F.lit("https://example.com/dataset/"), ks))
    )


def fs_dataset_ingest(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    k = F.col("o_orderkey")
    requests = orders.select(
        _fs_url(k).alias("base_url"),
        F.when(k % 31 == 0, F.lit("file")).otherwise(F.lit("dataset")).alias("ingest_type"),
    )
    lk = F.col("l_orderkey")
    size = (
        F.floor(F.col("l_extendedprice")).cast("bigint")
        * F.when(F.col("l_linenumber") % 4 == 0, 2000)
        .when(F.col("l_linenumber") % 4 == 1, 1)
        .when(F.col("l_linenumber") % 4 == 2, 40000)
        .otherwise(25)
        * F.when(lk % 53 == 0, 100).otherwise(1)
    )
    manifest = lineitem.filter(lk % 43 != 0).select(
        _fs_url(lk).alias("base_url"),
        F.concat(F.lit("f"), F.col("l_linenumber").cast("string")).alias("path"),
        size.alias("size"),
    )
    extra = (
        orders.filter(k % 67 == 0)
        .select(_fs_url(k).alias("base_url"), F.explode(F.sequence(F.lit(1), F.lit(201))).alias("i"))
        .select("base_url", F.concat(F.lit("x"), F.col("i").cast("string")).alias("path"), F.lit(1).cast("bigint").alias("size"))
    )
    result = fileset.fileset_ingest(requests, manifest.unionByName(extra))
    return (
        result.groupBy("status", "platform_name", "ingest_strategy")
        .agg(
            F.count(F.lit(1)).alias("n_datasets"),
            F.sum("file_count").alias("files"),
            F.sum("total_size").alias("bytes"),
        )
    )


QUERIES3 = {"fs_dataset_ingest": fs_dataset_ingest}

ORACLES3 = {
    "fs_dataset_ingest": """
WITH req AS (
  SELECT o_orderkey AS k,
    CASE
      WHEN o_orderkey % 5 = 0 AND o_orderkey % 23 = 0 THEN
        'https://demo.dataverse.org/dataset.xhtml?persistentId=doi:10.5072/FK2/'
        || lpad(CAST(o_orderkey % 1000000 AS VARCHAR), 6, '0') || '/'
        || lpad(CAST(o_orderkey % 1000000 AS VARCHAR), 6, '0')
      WHEN o_orderkey % 5 = 0 THEN
        'https://demo.dataverse.org/dataset.xhtml?persistentId=doi:10.5072/FK2/'
        || lpad(CAST(o_orderkey % 1000000 AS VARCHAR), 6, '0')
      WHEN o_orderkey % 5 = 1 THEN
        'https://figshare.com/articles/dataset/item/' || CAST(o_orderkey % 100000 AS VARCHAR)
        || '/' || CAST(1 + o_orderkey % 9 AS VARCHAR)
      WHEN o_orderkey % 5 = 2 THEN 'https://zenodo.org/record/' || CAST(o_orderkey AS VARCHAR)
      WHEN o_orderkey % 5 = 3 AND o_orderkey % 23 = 0 THEN
        'https://archive.org/download/item_' || CAST(o_orderkey AS VARCHAR) || '/file.pdf'
      WHEN o_orderkey % 5 = 3 THEN 'https://archive.org/details/item_' || CAST(o_orderkey AS VARCHAR)
      ELSE 'https://example.com/dataset/' || CAST(o_orderkey AS VARCHAR)
    END AS base_url,
    CASE WHEN o_orderkey % 31 = 0 THEN 'file' ELSE 'dataset' END AS ingest_type
  FROM orders
),
man AS (
  SELECT l_orderkey AS k,
    CAST(floor(l_extendedprice) AS BIGINT)
      * (CASE l_linenumber % 4 WHEN 0 THEN 2000 WHEN 1 THEN 1 WHEN 2 THEN 40000 ELSE 25 END)
      * (CASE WHEN l_orderkey % 53 = 0 THEN 100 ELSE 1 END) AS size
  FROM lineitem WHERE l_orderkey % 43 <> 0
  UNION ALL
  SELECT o_orderkey, 1 FROM orders, generate_series(1, 201) WHERE o_orderkey % 67 = 0
),
summ AS (
  SELECT k, count(*) AS file_count, sum(size) AS total_size, max(size) AS largest_size
  FROM man GROUP BY k
),
j AS (
  SELECT r.base_url,
    CASE
      WHEN base_url LIKE '%persistentId=doi:10.%' THEN 'dataverse'
      WHEN regexp_matches(base_url, '^https://figshare\\.com/articles/dataset/[^/]+/[0-9]+/[0-9]+$')
        THEN 'figshare'
      WHEN base_url LIKE 'https://zenodo.org/record/%' THEN 'zenodo'
      WHEN base_url LIKE '%://archive.org/details/%'
        OR base_url LIKE '%://archive.org/download/%' THEN 'archiveorg'
    END AS platform_name,
    coalesce(s.file_count, 0) AS file_count,
    coalesce(s.total_size, 0) AS total_size,
    s.largest_size AS largest_size
  FROM req r LEFT JOIN summ s ON r.k = s.k
  WHERE r.ingest_type = 'dataset'
),
st AS (
  SELECT *,
    CASE
      WHEN platform_name IS NULL THEN 'no-platform-match'
      WHEN platform_name = 'dataverse'
        AND regexp_matches(base_url, 'persistentId=doi:[^?]*/[0-9A-Za-z]{6}/[0-9A-Za-z]{6}$')
        THEN 'platform-scope'
      WHEN platform_name = 'archiveorg'
        AND regexp_matches(base_url, '://archive\\.org/download/[^/]+/.')
        THEN 'platform-scope'
      WHEN file_count = 0 THEN 'empty-manifest'
      WHEN total_size > 68719476736 THEN 'too-large-size'
      WHEN file_count > 200 THEN 'too-many-files'
      ELSE 'success'
    END AS status
  FROM j
)
SELECT status, platform_name,
  CASE WHEN status = 'success' THEN
    CASE
      WHEN platform_name = 'archiveorg' THEN
        CASE WHEN file_count = 1 THEN 'archiveorg-file' ELSE 'archiveorg-fileset' END
      WHEN file_count = 1 THEN
        CASE WHEN total_size < 67108864 THEN 'web-file' ELSE 'archiveorg-file' END
      ELSE
        CASE WHEN largest_size < 67108864 AND total_size < 137438953472
             THEN 'web-fileset' ELSE 'archiveorg-fileset' END
    END
  END AS ingest_strategy,
  count(*) AS n_datasets,
  sum(file_count) AS files,
  sum(total_size) AS bytes
FROM st
GROUP BY 1, 2, 3
""",
}
