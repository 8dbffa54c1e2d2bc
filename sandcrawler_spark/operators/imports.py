"""Fatcat-import preparation transforms — the reference's one-shot
"convert an extraction dump / manifest into importable match objects"
scripts, re-expressed as DataFrame ops:

- ``grobid_import_releases`` — python/scripts/import_grobid_metadata.py:10-83
- ``manifest_matches``      — python/scripts/manifest_converter.py:24-55
- ``cdx_sha1hex_resolve``   — python/scripts/fetch_cdx_sha1hex.py:99-151

All three reference scripts are driver-style row loops (stdin JSON or
sqlite cursors, per-row HTTP in the third); here each is a single
declarative plan — projection + array ``transform`` for the GROBID
release mapping, two groupBy-collect joins for the manifest, and a
two-tier join funnel for the CDX resolution — so Catalyst keeps the
whole thing JVM-side with no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_ABSTRACT_BYTES = 4096  # import_grobid_metadata.py:7


def _nz(c: Column) -> Column:
    """truthy-string gate: non-null and non-empty after strip."""
    return c.isNotNull() & (F.trim(c) != "")


def grobid_import_releases(df: DataFrame) -> DataFrame:
    """GROBID-metadata JSON dump → fatcat release import rows
    (import_grobid_metadata.py:10-83, ``parse_grobid_json``).

    Input columns (the grobid dump shape): ``title`` string,
    ``abstract`` string, ``authors array<string>``, ``date`` int (year
    only — the reference's TODO notes GROBID emits bare years),
    ``doi`` string, ``journal struct<name,publisher,volume,issue>``,
    ``citations array<struct<id,title,date,volume,url,issue,publisher,
    authors:array<struct<name:string>>>>``.

    Mirrored semantics: rows without a truthy title are dropped
    (:12-13); the abstract is kept as a text/plain abstract only when
    present and strictly shorter than 4096 bytes (:17-21); one contrib
    per author name with role 'author' (:23-26, flattened here to
    ``contrib_names`` since the role is constant); per-citation refs
    carry key=id, stripped title, year = int(date[:4]) when parseable
    (:29-51), and the grobid extra fields (volume/url/issue/publisher
    stripped when truthy, authors flattened to names); release_type is
    constant 'journal-article'; release_date = Jan 1 of the year when
    a date is present (:53-57); extra carries lowercased doi, the
    journal name as container_name, and is_longtail_oa=true (:59-64).

    Deliberate divergence, documented: the reference's top-level
    ``extra`` dict is clobbered by the refs loop (the loop re-binds
    ``extra`` per citation at :30, so :59-64 mutates the LAST
    citation's extra — or crashes on None when that citation had no
    extra fields). That is a variable-reuse bug, not a semantic; this
    implementation applies the evident intent (a fresh top-level
    extra) and keeps per-ref extras per-ref.

    Scale shape: pure Catalyst projection with one array ``transform``
    — embarrassingly parallel, no shuffle, no Python."""
    refs = F.transform(
        F.col("citations"),
        lambda c: F.struct(
            c["id"].alias("key"),
            F.when(_nz(c["title"]), F.trim(c["title"])).alias("title"),
            F.substring(F.trim(c["date"]), 1, 4).try_cast("int").alias("year"),
            F.when(_nz(c["volume"]), F.trim(c["volume"])).alias("extra_volume"),
            F.when(_nz(c["url"]), F.trim(c["url"])).alias("extra_url"),
            F.when(_nz(c["issue"]), F.trim(c["issue"])).alias("extra_issue"),
            F.when(_nz(c["publisher"]), F.trim(c["publisher"])).alias(
                "extra_publisher"
            ),
            F.when(
                F.size(c["authors"]) > 0,
                F.transform(c["authors"], lambda a: a["name"]),
            ).alias("extra_authors"),
        ),
    )
    return df.where(_nz(F.col("title"))).select(
        F.trim("title").alias("title"),
        F.coalesce("authors", F.array().cast("array<string>")).alias(
            "contrib_names"
        ),
        F.col("journal.publisher").alias("publisher"),
        F.col("journal.volume").alias("volume"),
        F.col("journal.issue").alias("issue"),
        F.when(
            _nz(F.col("abstract"))
            & (F.length("abstract") < MAX_ABSTRACT_BYTES),
            F.trim("abstract"),
        ).alias("abstract_content"),
        F.lit("journal-article").alias("release_type"),
        F.col("date").cast("int").alias("release_year"),
        F.when(
            F.col("date").isNotNull(),
            F.make_date(F.col("date").cast("int"), F.lit(1), F.lit(1)),
        ).alias("release_date"),
        F.coalesce(
            refs,
            F.array().cast(
                "array<struct<key:string,title:string,year:int,"
                "extra_volume:string,extra_url:string,extra_issue:string,"
                "extra_publisher:string,extra_authors:array<string>>>"
            ),
        ).alias("refs"),
        F.lower("doi").alias("extra_doi"),
        F.col("journal.name").alias("extra_container_name"),
        F.lit(True).alias("is_longtail_oa"),
    )


def manifest_matches(
    files_meta: DataFrame, id_doi: DataFrame, urls: DataFrame
) -> DataFrame:
    """IA-2017-style manifest tables → fatcat 'matched' import objects
    (manifest_converter.py:24-55).

    Inputs: ``files_meta(sha1, mimetype, size_bytes, md5)``,
    ``id_doi(sha1, doi)``, ``urls(sha1, url, datetime)``.

    Mirrored: a file contributes only when it has ≥1 DOI and ≥1 URL
    (the reference's two ``continue`` gates, :40-44); ``or_none``
    nulls out '', '\\N' and '-' on mimetype/size/md5 (:24-29) with
    size cast to bigint; the per-sha1 DOI list and (url, dt) CDX list
    are emitted as columns. The reference streams them in sqlite row
    order; sets have no meaningful order, so both lists are sorted
    (dois lexically, cdx by url then dt) for deterministic output —
    ``cdx_urls``/``cdx_dts`` are index-aligned projections of the
    sorted pair list.

    Scale shape: two map-side-combinable collect_list aggs + two hash
    joins on sha1 — one shuffle each, no Python."""

    def or_none(c: Column) -> Column:
        return F.when(~c.isin("", "\\N", "-"), c)

    dois = id_doi.groupBy("sha1").agg(
        F.sort_array(F.collect_list("doi")).alias("dois")
    )
    cdx = urls.groupBy("sha1").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("url"), F.col("datetime").alias("dt")))
        ).alias("cdx")
    )
    return (
        files_meta.join(dois, "sha1")
        .join(cdx, "sha1")
        .select(
            "sha1",
            or_none(F.col("mimetype")).alias("mimetype"),
            or_none(F.col("size_bytes")).try_cast("bigint").alias("size"),
            or_none(F.col("md5")).alias("md5"),
            "dois",
            F.transform("cdx", lambda x: x["url"]).alias("cdx_urls"),
            F.transform("cdx", lambda x: x["dt"]).alias("cdx_dts"),
        )
    )


def cdx_sha1hex_resolve(
    file_entities: DataFrame, cdx_db: DataFrame, cdx_api: DataFrame
) -> DataFrame:
    """Two-tier CDX lookup for file entities with partial metadata
    (fetch_cdx_sha1hex.py:99-151, ``process_file``) — the per-file
    HTTP loop re-expressed as a join funnel.

    Inputs: ``file_entities(sha1hex, urls array<string>)`` where urls
    are wayback replay URLs; ``cdx_db(sha1hex, url, dt)`` standing in
    for the postgrest /cdx endpoint (:67-73); ``cdx_api(url, sha1hex,
    dt)`` standing in for the CDX API (:79-96 — the API is queried by
    original URL and each row's digest is compared to the wanted
    sha1).

    Mirrored status funnel: a sha1hex with any cdx_db row →
    'success-db' (the db short-circuits the API path, :103-109);
    otherwise wayback URLs are parsed — segment[2] must be
    'web.archive.org', segment[3] 'web', segment[4] all digits, the
    original URL is the '/'-join of the rest (:111-122) — a miss with
    no parseable original URL → 'skip-no-urls' (:124-125); original
    URLs are deduped (:128) and matched against cdx_api on (url,
    sha1hex) → any hit 'success-api', else 'fail-not-found'
    (:138-151). Output one row per entity: (sha1hex, status,
    n_cdx_rows, found_urls sorted).

    Scale shape: one broadcast-or-shuffle semi-join per tier + one
    explode bounded by the per-entity URL-list length; statuses are
    derived set-wise, never sequentially. The reference's 403
    short-circuit is transport-level (requests), N/A here."""
    keys = file_entities.select("sha1hex").distinct()
    # restrict the big CDX table to wanted digests BEFORE aggregating —
    # the semi-join prunes 10^11 cdx rows down to the entity set's
    # matches instead of shuffling the whole table through the groupBy
    db_hits = (
        cdx_db.join(keys, "sha1hex", "left_semi")
        .groupBy("sha1hex")
        .agg(
            F.count("*").alias("n_db"),
            F.sort_array(F.collect_set("url")).alias("db_urls"),
        )
    )
    seg = F.split(F.col("raw_url"), "/")
    originals = (
        file_entities.select("sha1hex", F.explode("urls").alias("raw_url"))
        .where(
            (F.size(seg) > 5)
            & (F.element_at(seg, 3) == "web.archive.org")
            & (F.element_at(seg, 4) == "web")
            & F.element_at(seg, 5).rlike("^[0-9]+$")
        )
        .select(
            "sha1hex",
            F.concat_ws("/", F.slice(seg, 6, F.size(seg) - 5)).alias(
                "original_url"
            ),
        )
        .distinct()
    )
    api_hits = (
        originals.join(
            cdx_api.select(F.col("url").alias("original_url"), "sha1hex"),
            ["original_url", "sha1hex"],
        )
        .groupBy("sha1hex")
        .agg(
            F.count("*").alias("n_api"),
            F.sort_array(F.collect_set("original_url")).alias("api_urls"),
        )
    )
    has_originals = originals.groupBy("sha1hex").agg(
        F.count("*").alias("n_orig")
    )
    return (
        keys
        .join(db_hits, "sha1hex", "left")
        .join(api_hits, "sha1hex", "left")
        .join(has_originals, "sha1hex", "left")
        .select(
            "sha1hex",
            F.when(F.col("n_db").isNotNull(), F.lit("success-db"))
            .when(F.col("n_api").isNotNull(), F.lit("success-api"))
            .when(F.col("n_orig").isNull(), F.lit("skip-no-urls"))
            .otherwise(F.lit("fail-not-found"))
            .alias("status"),
            F.coalesce(
                F.when(F.col("n_db").isNotNull(), F.col("n_db")),
                F.when(F.col("n_api").isNotNull(), F.col("n_api")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_cdx_rows"),
            F.coalesce(
                F.when(F.col("n_db").isNotNull(), F.col("db_urls")),
                F.when(F.col("n_api").isNotNull(), F.col("api_urls")),
                F.array().cast("array<string>"),
            ).alias("found_urls"),
        )
    )
