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
    # Two-level manifest rollup (guide §2.3 "shuffle fewer bytes" /
    # §2.5 two-level aggregation): the per-file rows are first
    # aggregated under the NUMERIC l_orderkey (8-byte shuffle key, and
    # the synthetic 201-file blocks collapse to a closed form instead
    # of an explode), then the tiny pre-aggregated rows get their
    # base_url synthesized and are merged under it. count/sum/max
    # decompose exactly over bigint, so the result is row-identical to
    # summarize_manifest over the exploded union (a focused test pins
    # this; base_url collisions between orderkeys still merge in the
    # second level exactly as before).
    s = F.coalesce(size.cast("bigint"), F.lit(0))
    man_pre = (
        lineitem.filter(lk % 43 != 0)
        .groupBy(lk.alias("__k"))
        .agg(
            F.count(F.lit(1)).alias("file_count"),
            F.sum(s).alias("total_size"),
            F.max(s).alias("largest_size"),
        )
        .select(
            _fs_url(F.col("__k")).alias("base_url"),
            "file_count", "total_size", "largest_size",
        )
    )
    extra_pre = orders.filter(k % 67 == 0).select(
        _fs_url(k).alias("base_url"),
        F.lit(201).cast("bigint").alias("file_count"),
        F.lit(201).cast("bigint").alias("total_size"),
        F.lit(1).cast("bigint").alias("largest_size"),
    )
    summary = fileset.merge_manifest_summaries(man_pre.unionByName(extra_pre))
    result = fileset.fileset_ingest(
        requests, manifest=None, manifest_summary=summary
    )
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
  CAST(sum(file_count) AS BIGINT) AS files,
  CAST(sum(total_size) AS BIGINT) AS bytes
FROM st
GROUP BY 1, 2, 3
""",
}


# --- archiving-strategy verification (fileset_strategies.py) ------------
#
# Corpus for both entries: one "item" per order (a quarter of orders —
# keeps the gate cheap, all mod classes still land), one file per
# lineitem row (1-7 files), every rung planted by modular classes of
# key = l_orderkey*8 + l_linenumber (unique: l_linenumber is 1-7).
# The oracle rebuilds the identical corpus and replays the reference's
# sequential ladder with window/arg_min SQL; the compare is per-FILE
# rows (status + item_status + backfilled hashes/mimetype), so the
# order-sensitive abort and the rung-gated backfills are value-checked
# end to end, not just counted.


def _vm_key():
    return F.col("l_orderkey") * 8 + F.col("l_linenumber")


def _unique_lineitems(spark, sf_dir):
    """lineitem % 4 == 0 reduced to ONE row per (l_orderkey,
    l_linenumber) — the synthetic table carries duplicate keys, and a
    manifest position must be unique (reference: FilesetManifestFile
    list) or the ladder's min-idx item status ties arbitrarily."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.max("l_quantity").alias("l_quantity"))
    )


def fs_verify_local(spark, sf_dir):
    """ArchiveorgFilesetStrategy's download-verification ladder
    (fileset_strategies.py:100-211) over a lineitem-derived corpus.

    The fixture dedups lineitem to unique (l_orderkey, l_linenumber)
    first: the reference walks a manifest LIST (positions unique), and
    the synthetic lineitem carries duplicate keys whose join fan-out
    would leave the per-item first-bad pick tied on idx — arbitrary
    under parallel input order on both engines."""
    li = _unique_lineitems(spark, sf_dir)
    k = _vm_key()
    man = li.select(
        F.concat(F.lit("it"), F.col("l_orderkey").cast("string")).alias("item"),
        F.col("l_linenumber").cast("int").alias("idx"),
        F.when(k % 17 == 0, F.lit("../up"))
        .otherwise(F.concat(F.lit("d/f"), F.col("l_linenumber").cast("string"), F.lit(".bin")))
        .alias("path"),
        (F.col("l_quantity").cast("bigint") + 100).alias("size"),
        F.when(k % 3 != 0, F.concat(F.lit("sha1-"), k.cast("string"))).alias("sha1"),
        F.when(k % 4 == 0, F.concat(F.lit("sha256-"), k.cast("string"))).alias("sha256"),
        F.when(k % 5 == 0, F.concat(F.lit("md5-"), k.cast("string"))).alias("md5"),
        F.when(k % 6 != 0, F.lit("text/csv")).alias("mimetype"),
    )
    fet = li.filter(k % 11 != 0).select(
        F.concat(F.lit("it"), F.col("l_orderkey").cast("string")).alias("item"),
        F.when(k % 17 == 0, F.lit("../up"))
        .otherwise(F.concat(F.lit("d/f"), F.col("l_linenumber").cast("string"), F.lit(".bin")))
        .alias("path"),
        (
            F.col("l_quantity").cast("bigint")
            + 100
            + F.when(k % 13 == 0, 1).otherwise(0)
        ).alias("size_bytes"),
        F.when(k % 19 == 0, F.lit("WRONG"))
        .otherwise(F.concat(F.lit("sha1-"), k.cast("string"))).alias("sha1hex"),
        F.when(k % 23 == 0, F.lit("WRONG"))
        .otherwise(F.concat(F.lit("sha256-"), k.cast("string"))).alias("sha256hex"),
        F.when(k % 29 == 0, F.lit("WRONG"))
        .otherwise(F.concat(F.lit("md5-"), k.cast("string"))).alias("md5hex"),
        F.element_at(
            F.array(F.lit("text/csv"), F.lit("text/plain"), F.lit("application/zip")),
            (k % 3).cast("int") + 1,
        ).alias("mimetype"),
    )
    out = fileset.verify_manifest_local(man, fet)
    return out.select(
        "item", "idx", "status", "item_status", "sha1", "sha256", "md5", "mimetype"
    )


QUERIES3["fs_verify_local"] = fs_verify_local

ORACLES3["fs_verify_local"] = r"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, max(l_quantity) AS l_quantity
  FROM lineitem WHERE l_orderkey % 4 = 0 GROUP BY 1, 2),
man AS (
  SELECT 'it' || CAST(l_orderkey AS VARCHAR) AS item,
         CAST(l_linenumber AS INT) AS idx,
         l_orderkey * 8 + l_linenumber AS k,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 17 = 0 THEN '../up'
              ELSE 'd/f' || CAST(l_linenumber AS VARCHAR) || '.bin' END AS path,
         CAST(l_quantity AS BIGINT) + 100 AS size,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 3 <> 0
              THEN 'sha1-' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) END AS sha1,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 4 = 0
              THEN 'sha256-' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) END AS sha256,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 5 = 0
              THEN 'md5-' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) END AS md5,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 6 <> 0 THEN 'text/csv' END AS mimetype
  FROM li),
fet AS (
  SELECT item, path,
         size + CASE WHEN k % 13 = 0 THEN 1 ELSE 0 END AS size_bytes,
         CASE WHEN k % 19 = 0 THEN 'WRONG' ELSE 'sha1-' || CAST(k AS VARCHAR) END AS sha1hex,
         CASE WHEN k % 23 = 0 THEN 'WRONG' ELSE 'sha256-' || CAST(k AS VARCHAR) END AS sha256hex,
         CASE WHEN k % 29 = 0 THEN 'WRONG' ELSE 'md5-' || CAST(k AS VARCHAR) END AS md5hex,
         (['text/csv', 'text/plain', 'application/zip'])[CAST(k % 3 AS INT) + 1] AS mimetype
  FROM man WHERE k % 11 <> 0),
j AS (
  SELECT man.*, fet.size_bytes AS f_size, fet.sha1hex AS f_sha1,
         fet.sha256hex AS f_sha256, fet.md5hex AS f_md5, fet.mimetype AS f_mime,
         man.path LIKE '../%' AS unsafe,
         (NOT man.path LIKE '../%') AND fet.size_bytes IS NULL AS dl_err
  FROM man LEFT JOIN fet USING (item, path)),
e AS (SELECT item, min(CASE WHEN dl_err THEN idx END) AS err_idx FROM j GROUP BY item),
st AS (
  SELECT j.*,
    CASE WHEN e.err_idx IS NOT NULL AND j.idx > e.err_idx THEN NULL
         WHEN unsafe THEN 'unsafe-path'
         WHEN dl_err THEN 'error-platform-download'
         WHEN f_size <> size THEN 'mismatch-size'
         WHEN sha1 IS NOT NULL AND sha1 <> f_sha1 THEN 'mismatch-sha1'
         WHEN sha256 IS NOT NULL AND sha256 <> f_sha256 THEN 'mismatch-sha256'
         WHEN md5 IS NOT NULL AND md5 <> f_md5 THEN 'mismatch-md5'
         ELSE 'verified-local' END AS status,
    (e.err_idx IS NULL OR j.idx <= e.err_idx)
      AND NOT unsafe AND NOT dl_err AND f_size = size AS p_size
  FROM j JOIN e USING (item)),
bf AS (
  SELECT item, idx, status,
    CASE WHEN p_size THEN coalesce(sha1, f_sha1) ELSE sha1 END AS sha1,
    CASE WHEN p_size AND (sha1 IS NULL OR sha1 = f_sha1)
         THEN coalesce(sha256, f_sha256) ELSE sha256 END AS sha256,
    CASE WHEN p_size AND (sha1 IS NULL OR sha1 = f_sha1)
              AND (sha256 IS NULL OR sha256 = f_sha256)
         THEN coalesce(md5, f_md5) ELSE md5 END AS md5,
    CASE WHEN status = 'verified-local' THEN
      CASE WHEN mimetype IS NULL THEN f_mime
           WHEN f_mime <> mimetype AND f_mime <> 'text/plain' THEN f_mime
           ELSE mimetype END
      ELSE mimetype END AS mimetype
  FROM st),
it AS (
  SELECT item,
    max(CASE WHEN status = 'error-platform-download' THEN 1 ELSE 0 END) AS any_err,
    arg_min(status, CASE WHEN status IS NOT NULL AND status <> 'verified-local'
                         THEN idx END) AS first_bad
  FROM bf GROUP BY item)
SELECT bf.item, bf.idx, bf.status,
  CASE WHEN it.any_err = 1 THEN 'error-platform-download'
       WHEN it.first_bad IS NOT NULL THEN it.first_bad
       ELSE 'success' END AS item_status,
  bf.sha1, bf.sha256, bf.md5, bf.mimetype
FROM bf JOIN it USING (item)
"""


def fs_web_fetch(spark, sf_dir):
    """WebFilesetStrategy fetch+verify (fileset_strategies.py:285-375)
    over a lineitem-derived corpus; max_spn_manifest lowered to 3 so
    the lineitem fan-out (1-7 files per item) exercises too-much-spn.
    Unique (l_orderkey, l_linenumber) fixture — see fs_verify_local."""
    li = _unique_lineitems(spark, sf_dir)
    k = _vm_key()
    url = F.concat(F.lit("http://h"), k.cast("string"))
    man = li.select(
        F.concat(F.lit("it"), F.col("l_orderkey").cast("string")).alias("item"),
        F.col("l_linenumber").cast("int").alias("idx"),
        url.alias("platform_url"),
        (F.col("l_quantity").cast("bigint") + 100).alias("size"),
        F.when(k % 3 != 0, F.concat(F.lit("sha1-"), k.cast("string"))).alias("sha1"),
        F.lit(None).cast("string").alias("sha256"),
        F.when(k % 5 == 0, F.concat(F.lit("md5-"), k.cast("string"))).alias("md5"),
        F.when(k % 6 != 0, F.lit("text/csv")).alias("mimetype"),
    )
    res = li.filter(k % 11 != 0).select(
        url.alias("url"),
        F.element_at(
            F.array(
                F.lit("success"), F.lit("success"), F.lit("success"),
                F.lit("no-capture"), F.lit("redirect"), F.lit("terminal-bad-status"),
                F.lit("success"),
            ),
            (k % 7).cast("int") + 1,
        ).alias("status"),
        F.concat(F.lit("http://t"), k.cast("string")).alias("terminal_url"),
        F.lit("20200101000000").alias("terminal_dt"),
        (
            F.col("l_quantity").cast("bigint")
            + 100
            + F.when(k % 13 == 0, 1).otherwise(0)
        ).alias("size_bytes"),
        F.when(k % 19 == 0, F.lit("WRONG"))
        .otherwise(F.concat(F.lit("sha1-"), k.cast("string"))).alias("sha1hex"),
        F.concat(F.lit("sha256-"), k.cast("string")).alias("sha256hex"),
        F.when(k % 29 == 0, F.lit("WRONG"))
        .otherwise(F.concat(F.lit("md5-"), k.cast("string"))).alias("md5hex"),
        F.element_at(
            F.array(F.lit("text/csv"), F.lit("application/pdf")),
            (k % 2).cast("int") + 1,
        ).alias("mimetype"),
        (k % 31 == 0).alias("empty_body"),
    )
    out = fileset.web_fetch_verify(man, res, max_spn_manifest=3)
    return out.select(
        "item", "idx", "status", "item_status", "sha1", "sha256", "md5", "mimetype"
    )


QUERIES3["fs_web_fetch"] = fs_web_fetch

ORACLES3["fs_web_fetch"] = r"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, max(l_quantity) AS l_quantity
  FROM lineitem WHERE l_orderkey % 4 = 0 GROUP BY 1, 2),
man AS (
  SELECT 'it' || CAST(l_orderkey AS VARCHAR) AS item,
         CAST(l_linenumber AS INT) AS idx,
         l_orderkey * 8 + l_linenumber AS k,
         'http://h' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) AS platform_url,
         CAST(l_quantity AS BIGINT) + 100 AS size,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 3 <> 0
              THEN 'sha1-' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) END AS sha1,
         CAST(NULL AS VARCHAR) AS sha256,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 5 = 0
              THEN 'md5-' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) END AS md5,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 6 <> 0 THEN 'text/csv' END AS mimetype
  FROM li),
res AS (
  SELECT k,
    (['success','success','success','no-capture','redirect','terminal-bad-status','success'])[CAST(k % 7 AS INT) + 1] AS r_status,
    size + CASE WHEN k % 13 = 0 THEN 1 ELSE 0 END AS r_size,
    CASE WHEN k % 19 = 0 THEN 'WRONG' ELSE 'sha1-' || CAST(k AS VARCHAR) END AS r_sha1,
    'sha256-' || CAST(k AS VARCHAR) AS r_sha256,
    CASE WHEN k % 29 = 0 THEN 'WRONG' ELSE 'md5-' || CAST(k AS VARCHAR) END AS r_md5,
    (['text/csv','application/pdf'])[CAST(k % 2 AS INT) + 1] AS r_mime,
    k % 31 = 0 AS r_empty
  FROM man WHERE k % 11 <> 0),
n AS (SELECT item, count(*) AS n_files FROM man GROUP BY item),
st AS (
  SELECT man.item, man.idx, man.size, man.sha1, man.sha256, man.md5, man.mimetype,
    res.r_sha1, res.r_sha256, res.r_md5, res.r_mime,
    CASE
      WHEN (res.k IS NULL OR res.r_status = 'no-capture') AND n.n_files > 3 THEN 'too-much-spn'
      WHEN res.k IS NULL OR res.r_status = 'no-capture' THEN 'no-capture'
      WHEN res.r_status <> 'success' THEN res.r_status
      WHEN res.r_empty THEN 'empty-blob'
      WHEN res.r_size <> man.size
           OR (man.md5 IS NOT NULL AND man.md5 <> res.r_md5)
           OR (man.sha1 IS NOT NULL AND man.sha1 <> res.r_sha1) THEN 'mismatch'
      ELSE 'success' END AS status
  FROM man LEFT JOIN res USING (k) JOIN n USING (item)),
bf AS (
  SELECT item, idx, status,
    CASE WHEN status = 'success' THEN coalesce(sha1, r_sha1) ELSE sha1 END AS sha1,
    CASE WHEN status = 'success' THEN coalesce(sha256, r_sha256) ELSE sha256 END AS sha256,
    CASE WHEN status = 'success' THEN coalesce(md5, r_md5) ELSE md5 END AS md5,
    CASE WHEN status = 'success' THEN coalesce(mimetype, r_mime) ELSE mimetype END AS mimetype
  FROM st),
it AS (
  SELECT item,
    arg_min(status, CASE WHEN status <> 'success' THEN idx END) AS first_bad
  FROM bf GROUP BY item)
SELECT bf.item, bf.idx, bf.status,
  coalesce(it.first_bad, 'success') AS item_status,
  bf.sha1, bf.sha256, bf.md5, bf.mimetype
FROM bf JOIN it USING (item)
"""


def fs_check_existing(spark, sf_dir):
    """ArchiveorgFilesetStrategy.check_existing (fileset_strategies.py:
    59-98) — the reference's per-item O(N^2) loop as one hash equi-join
    — over a lineitem-derived corpus: existing item files are the
    manifest perturbed by mod classes (absent / wrong size / wrong sha1
    / empty sha1 with md5 fallback)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 4 == 0)
    k = _vm_key()
    man = li.select(
        F.concat(F.lit("it"), F.col("l_orderkey").cast("string")).alias("item"),
        F.concat(F.lit("f"), F.col("l_linenumber").cast("string")).alias("path"),
        (F.col("l_quantity").cast("bigint") + 100).alias("size"),
        F.concat(F.lit("sha1-"), k.cast("string")).alias("sha1"),
        F.concat(F.lit("md5-"), k.cast("string")).alias("md5"),
    )
    ex = li.filter(k % 11 != 0).select(
        F.concat(F.lit("it"), F.col("l_orderkey").cast("string")).alias("item"),
        F.concat(F.lit("f"), F.col("l_linenumber").cast("string")).alias("name"),
        (
            F.col("l_quantity").cast("bigint")
            + 100
            + F.when(k % 13 == 0, 1).otherwise(0)
        ).alias("size"),
        # k%7==0: empty sha1 (falsy -> md5 decides); k%19==0: wrong sha1
        # (md5 fallback still matches unless k%29==0 too)
        F.when(k % 7 == 0, F.lit(""))
        .when(k % 19 == 0, F.lit("WRONG"))
        .otherwise(F.concat(F.lit("sha1-"), k.cast("string"))).alias("sha1"),
        F.when(k % 29 == 0, F.lit("WRONG"))
        .otherwise(F.concat(F.lit("md5-"), k.cast("string"))).alias("md5"),
    )
    return fileset.check_existing_item(man, ex).select(
        "item", "files_wanted", "files_exist", "status"
    )


QUERIES3["fs_check_existing"] = fs_check_existing

ORACLES3["fs_check_existing"] = r"""
WITH man AS (
  SELECT 'it' || CAST(l_orderkey AS VARCHAR) AS item,
         'f' || CAST(l_linenumber AS VARCHAR) AS path,
         l_orderkey * 8 + l_linenumber AS k,
         CAST(l_quantity AS BIGINT) + 100 AS size,
         'sha1-' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) AS sha1,
         'md5-' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) AS md5
  FROM lineitem WHERE l_orderkey % 4 = 0),
ex AS (
  SELECT item, path,
         size + CASE WHEN k % 13 = 0 THEN 1 ELSE 0 END AS e_size,
         CASE WHEN k % 7 = 0 THEN ''
              WHEN k % 19 = 0 THEN 'WRONG'
              ELSE 'sha1-' || CAST(k AS VARCHAR) END AS e_sha1,
         CASE WHEN k % 29 = 0 THEN 'WRONG'
              ELSE 'md5-' || CAST(k AS VARCHAR) END AS e_md5
  FROM man WHERE k % 11 <> 0),
j AS (
  SELECT man.item,
    (ex.e_size IS NOT NULL AND ex.e_size = man.size
     AND ((ex.e_sha1 IS NOT NULL AND ex.e_sha1 <> '' AND ex.e_sha1 = man.sha1)
          OR (ex.e_md5 IS NOT NULL AND ex.e_md5 <> '' AND ex.e_md5 = man.md5))
    ) AS ok
  FROM man LEFT JOIN ex USING (item, path))
SELECT item,
  count(*) AS files_wanted,
  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS files_exist,
  CASE WHEN sum(CASE WHEN ok THEN 1 ELSE 0 END) = count(*)
       THEN 'success-existing' END AS status
FROM j GROUP BY item
"""
