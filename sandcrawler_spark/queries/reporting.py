"""Monitoring-report battery (operators/reporting.py): the reference's
Postgres dashboard queries (sql/monitoring_queries.md) over a
deterministic (ingest_request, ingest_file_result) fixture synthesized
from the events table. The DuckDB oracles rebuild the same two tables
in a WITH clause and replay each report verbatim, so the comparison
checks the join skeleton, the window/type/source gates, the regex
extractions, the CUBE margins, and the deterministic top-N — not the
generator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.operators import reporting
from sandcrawler_spark.queries.battery import _t

NOW = "2024-04-10"


def _ingest_fixture(spark, sf_dir):
    """(requests, results) with the reference's schema subset. One
    request per event_id; a result for 9-in-10 of them (the missing
    tenth exercises the result-side-driven FROM). Keys are unique per
    id so the (ingest_type, base_url) join is 1:1."""
    ev = _t(spark, sf_dir, "events")
    i = F.col("event_id")
    itype = F.when(i % 5 == 0, F.lit("html")).otherwise(F.lit("pdf"))
    base_url = F.concat(
        F.lit("https://site"), (i % 37).cast("string"), F.lit(".org/p/"), i.cast("string")
    )
    requests = ev.select(
        itype.alias("ingest_type"),
        base_url.alias("base_url"),
        F.date_add(F.lit("2024-03-01").cast("date"), (i % 45).cast("int")).alias("created"),
        F.when(i % 3 == 0, F.lit("fatcat-changelog"))
        .when(i % 3 == 1, F.lit("fatcat-ingest"))
        .otherwise(F.lit("savepapernow-web"))
        .alias("ingest_request_source"),
        F.when(i % 2 == 0, F.lit("doi")).otherwise(F.lit("pmid")).alias("link_source"),
        F.when(
            i % 2 == 0,
            F.concat(F.lit("10."), (i % 23).cast("string"), F.lit("/j."), i.cast("string")),
        )
        .otherwise(F.concat(F.lit("PMC"), i.cast("string")))
        .alias("link_source_id"),
    )
    results = ev.filter(i % 10 != 7).select(
        itype.alias("ingest_type"),
        base_url.alias("base_url"),
        F.date_add(F.lit("2024-03-15").cast("date"), (i % 30).cast("int")).alias("updated"),
        F.when(i % 7 <= 2, F.lit("success"))
        .when(i % 7 == 3, F.lit("no-pdf-link"))
        .when(i % 7 == 4, F.lit("terminal-bad-status"))
        .when(i % 7 == 5, F.lit("wrong-mimetype"))
        .otherwise(F.lit("redirect-loop"))
        .alias("status"),
        F.when(i % 13 == 0, F.concat(F.lit("broken-path/"), i.cast("string")))
        .otherwise(
            F.concat(
                F.lit("https://term"), (i % 29).cast("string"), F.lit(".net/t/"), i.cast("string")
            )
        )
        .alias("terminal_url"),
    )
    return requests, results


# One WITH clause shared by every oracle: DuckDB rebuilds the fixture.
_FIXTURE_SQL = """
WITH req AS (
  SELECT CASE WHEN event_id % 5 = 0 THEN 'html' ELSE 'pdf' END AS ingest_type,
         'https://site' || (event_id % 37) || '.org/p/' || event_id AS base_url,
         DATE '2024-03-01' + CAST(event_id % 45 AS INT) AS created,
         CASE event_id % 3 WHEN 0 THEN 'fatcat-changelog'
                           WHEN 1 THEN 'fatcat-ingest'
                           ELSE 'savepapernow-web' END AS ingest_request_source,
         CASE WHEN event_id % 2 = 0 THEN 'doi' ELSE 'pmid' END AS link_source,
         CASE WHEN event_id % 2 = 0
              THEN '10.' || (event_id % 23) || '/j.' || event_id
              ELSE 'PMC' || event_id END AS link_source_id
  FROM events),
res AS (
  SELECT CASE WHEN event_id % 5 = 0 THEN 'html' ELSE 'pdf' END AS ingest_type,
         'https://site' || (event_id % 37) || '.org/p/' || event_id AS base_url,
         DATE '2024-03-15' + CAST(event_id % 30 AS INT) AS updated,
         CASE WHEN event_id % 7 <= 2 THEN 'success'
              WHEN event_id % 7 = 3 THEN 'no-pdf-link'
              WHEN event_id % 7 = 4 THEN 'terminal-bad-status'
              WHEN event_id % 7 = 5 THEN 'wrong-mimetype'
              ELSE 'redirect-loop' END AS status,
         CASE WHEN event_id % 13 = 0 THEN 'broken-path/' || event_id
              ELSE 'https://term' || (event_id % 29) || '.net/t/' || event_id
              END AS terminal_url
  FROM events WHERE event_id % 10 <> 7),
joined AS (
  SELECT r.ingest_type, r.updated, r.status, r.terminal_url,
         q.created, q.ingest_request_source, q.link_source, q.link_source_id
  FROM res r LEFT JOIN req q
    ON r.ingest_type = q.ingest_type AND r.base_url = q.base_url)
"""


def mon_status_rollup(spark, sf_dir):
    """'Overall ingest status, past 30 days'
    (monitoring_queries.md:5-17)."""
    requests, results = _ingest_fixture(spark, sf_dir)
    return reporting.ingest_status_rollup(
        results, requests, NOW, window_days=30,
        ingest_type="pdf", source="fatcat-changelog", limit=20,
    )


def mon_broken_domains(spark, sf_dir):
    """'Broken domains, past N days' (monitoring_queries.md:20-43)."""
    requests, results = _ingest_fixture(spark, sf_dir)
    return reporting.broken_domains(
        results, requests, NOW, window_days=14,
        ingest_type="pdf", source="fatcat-ingest", limit=25,
    )


def mon_doi_prefix_cube(spark, sf_dir):
    """'Summary of DOI prefix and status' CUBE report
    (monitoring_queries.md:70-92)."""
    requests, results = _ingest_fixture(spark, sf_dir)
    return reporting.doi_prefix_report(
        results, requests, NOW, window_days=21,
        ingest_type="pdf", source="fatcat-changelog", min_count=20,
    )


def mon_daily_throughput(spark, sf_dir):
    """'Throughput per day, and success' (monitoring_queries.md:95-110)."""
    requests, results = _ingest_fixture(spark, sf_dir)
    return reporting.daily_throughput(
        results, requests, NOW, window_days=21,
        ingest_type="pdf", source="fatcat-ingest",
    )


def mon_reingest_candidates(spark, sf_dir):
    """sql/dump_reingest_quarterly.sql end-to-end: ingest-type gate
    (dataset arm dropped), (now-91d, now-8h) created window, source
    allowlist, hit=false, and the transient-status selection (spn2-%
    prefix minus the permanent exclusions, plus the five named
    statuses)."""
    ev = _t(spark, sf_dir, "events")
    i = F.col("event_id")
    itype = (
        F.when(i % 6 == 0, F.lit("html"))
        .when(i % 6 == 1, F.lit("dataset"))
        .otherwise(F.lit("pdf"))
    )
    base_url = F.concat(
        F.lit("https://r"), (i % 41).cast("string"), F.lit(".org/d/"), i.cast("string")
    )
    created = (
        F.lit("2024-01-01").cast("timestamp")
        + F.make_interval(days=(i % 105).cast("int"), hours=(i % 13).cast("int"))
    )
    requests = ev.select(
        itype.alias("ingest_type"),
        base_url.alias("base_url"),
        created.alias("created"),
        F.when(i % 4 == 0, F.lit("unpaywall"))
        .when(i % 4 == 1, F.lit("fatcat-changelog"))
        .when(i % 4 == 2, F.lit("savepapernow-web"))
        .otherwise(F.lit("doaj"))
        .alias("ingest_request_source"),
    )
    results = ev.filter(i % 10 != 7).select(
        itype.alias("ingest_type"),
        base_url.alias("base_url"),
        (i % 5 == 0).alias("hit"),
        F.when(i % 7 == 0, F.lit("success"))
        .when(i % 7 == 1, F.lit("spn2-error:unknown"))
        .when(i % 7 == 2, F.lit("spn2-cdx-lookup-failure"))
        .when(i % 7 == 3, F.lit("no-capture"))
        .when(i % 7 == 4, F.lit("cdx-error"))
        .when(i % 7 == 5, F.lit("terminal-bad-status"))
        .otherwise(F.lit("gateway-timeout"))
        .alias("status"),
    )
    return reporting.reingest_candidates(requests, results, now="2024-04-10")


QUERIES5 = {
    "mon_status_rollup": mon_status_rollup,
    "mon_broken_domains": mon_broken_domains,
    "mon_doi_prefix_cube": mon_doi_prefix_cube,
    "mon_daily_throughput": mon_daily_throughput,
    "mon_reingest_candidates": mon_reingest_candidates,
}

ORACLES5 = {
    "mon_reingest_candidates": """
WITH ev AS (SELECT event_id AS i FROM events),
req AS (
  SELECT
    CASE WHEN i % 6 = 0 THEN 'html'
         WHEN i % 6 = 1 THEN 'dataset' ELSE 'pdf' END AS ingest_type,
    'https://r' || (i % 41) || '.org/d/' || i AS base_url,
    TIMESTAMP '2024-01-01'
      + to_days(CAST(i % 105 AS INT)) + to_hours(CAST(i % 13 AS INT)) AS created,
    CASE i % 4 WHEN 0 THEN 'unpaywall' WHEN 1 THEN 'fatcat-changelog'
               WHEN 2 THEN 'savepapernow-web' ELSE 'doaj' END
      AS ingest_request_source,
    i
  FROM ev
),
res AS (
  SELECT
    CASE WHEN i % 6 = 0 THEN 'html'
         WHEN i % 6 = 1 THEN 'dataset' ELSE 'pdf' END AS ingest_type,
    'https://r' || (i % 41) || '.org/d/' || i AS base_url,
    (i % 5 = 0) AS hit,
    CASE i % 7 WHEN 0 THEN 'success' WHEN 1 THEN 'spn2-error:unknown'
               WHEN 2 THEN 'spn2-cdx-lookup-failure' WHEN 3 THEN 'no-capture'
               WHEN 4 THEN 'cdx-error' WHEN 5 THEN 'terminal-bad-status'
               ELSE 'gateway-timeout' END AS status
  FROM ev WHERE i % 10 != 7
)
SELECT r.ingest_type, r.base_url, r.created, r.ingest_request_source,
       s.status AS result_status
FROM req r JOIN res s USING (ingest_type, base_url)
WHERE r.ingest_type IN ('pdf', 'html', 'xml', 'component')
  AND r.created < TIMESTAMP '2024-04-10' - INTERVAL 8 HOUR
  AND r.created > TIMESTAMP '2024-04-10' - INTERVAL 91 DAY
  AND r.ingest_request_source IN ('fatcat-changelog','fatcat-ingest',
        'fatcat-ingest-container','unpaywall','arxiv','pmc','doaj','dblp')
  AND NOT s.hit
  AND (s.status LIKE 'spn2-%' OR s.status IN
        ('cdx-error','wayback-error','petabox-error','gateway-timeout','no-capture'))
  AND s.status NOT IN ('spn2-error:invalid-url-syntax','spn2-error:filesize-limit',
        'spn2-error:not-found','spn2-error:blocked-url','spn2-error:too-many-redirects',
        'spn2-error:network-authentication-required','spn2-error:unknown')
""",
    "mon_status_rollup": _FIXTURE_SQL + """
        SELECT ingest_type, status, count(*) AS cnt
        FROM joined
        WHERE created >= DATE '2024-04-10' - 30
          AND ingest_request_source = 'fatcat-changelog'
          AND ingest_type = 'pdf'
        GROUP BY ingest_type, status
        ORDER BY cnt DESC, status ASC
        LIMIT 20
    """,
    "mon_broken_domains": _FIXTURE_SQL + """
        SELECT domain, status, count(*) AS cnt FROM (
            SELECT regexp_extract(terminal_url, '[^/]+://([^/]*)', 1) AS domain,
                   status
            FROM joined
            WHERE updated >= DATE '2024-04-10' - 14
              AND ingest_request_source = 'fatcat-ingest'
              AND ingest_type = 'pdf'
        ) t1
        WHERE domain <> '' AND status <> 'success'
        GROUP BY domain, status
        ORDER BY cnt DESC, domain ASC, status ASC
        LIMIT 25
    """,
    "mon_doi_prefix_cube": _FIXTURE_SQL + """
        SELECT doi_prefix, status, count(*) AS cnt FROM (
            SELECT regexp_extract(link_source_id, '(10\\.[^/]*)/.*', 1) AS doi_prefix,
                   status
            FROM joined
            WHERE updated >= DATE '2024-04-10' - 21
              AND ingest_request_source = 'fatcat-changelog'
              AND ingest_type = 'pdf'
              AND link_source = 'doi'
        ) t1
        WHERE doi_prefix <> ''
        GROUP BY CUBE (doi_prefix, status)
        HAVING count(*) > 20
    """,
    "mon_daily_throughput": _FIXTURE_SQL + """
        SELECT ingest_type, updated AS day, count(*) AS total,
               count(CASE status WHEN 'success' THEN 1 END) AS success
        FROM joined
        WHERE updated >= DATE '2024-04-10' - 21
          AND ingest_request_source = 'fatcat-ingest'
          AND ingest_type = 'pdf'
        GROUP BY ingest_type, updated
    """,
}


def mon_score_histogram(spark, sf_dir):
    """pdftrio ensemble-score histogram, the reference's
    ``width_bucket(score*100, 0, 100, 19) * 5`` report
    (sql/pdftrio_queries.md:42-47) — NULL scores and non-success rows
    excluded, identical bucket arithmetic replayed by the oracle."""
    from sandcrawler_spark.operators import reporting as rep

    ev = _t(spark, sf_dir, "events")
    i = F.col("event_id")
    rows = ev.select(
        F.when(i % 11 != 0, (i % 97) / F.lit(96.0)).alias("ensemble_score"),
        F.when(i % 5 == 1, F.lit("error")).otherwise(F.lit("success")).alias("status"),
    )
    return rep.score_histogram(rows, "ensemble_score")


QUERIES5["mon_score_histogram"] = mon_score_histogram
ORACLES5["mon_score_histogram"] = """
    WITH t AS (
      SELECT CASE WHEN event_id % 11 <> 0 THEN (event_id % 97) / 96.0 END AS score,
             CASE WHEN event_id % 5 = 1 THEN 'error' ELSE 'success' END AS status
      FROM events)
    SELECT (CASE WHEN score * 100.0 < 0.0 THEN 0
                 WHEN score * 100.0 >= 100.0 THEN 20
                 ELSE CAST(floor(((score * 100.0) - 0.0) * 19 / (100.0 - 0.0)) AS BIGINT) + 1
            END) * 5 AS buckets,
           count(*) AS cnt
    FROM t
    WHERE status = 'success' AND score IS NOT NULL
    GROUP BY 1
"""


def _backfill_fixture(spark, sf_dir):
    """(captures, grobid, pdf_meta, ingest_results) with the backfill
    dumps' schema subset, keyed on a derived sha1hex. k%3==0 keys get
    TWO capture rows (the DISTINCT ON pressure case — the canonical
    min-(dt,url) pick must survive); grobid exists for even keys with
    a status-less row every 5th and a version-less row every 7th;
    pdf_meta every 6th; a terminal ingest result for k%3!=1."""
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    sha1 = F.md5(F.concat(F.lit("h"), ks))
    mime = F.when(k % 4 == 0, F.lit("text/html")).otherwise(
        F.lit("application/pdf")
    )
    reps = F.when(k % 3 == 0, F.array(F.lit(1), F.lit(2))).otherwise(
        F.array(F.lit(1))
    )
    caps = p.select(
        sha1.alias("sha1hex"), mime.alias("mimetype"), ks.alias("ks"),
        F.explode(reps).alias("r"),
    )
    captures = caps.select(
        "sha1hex",
        F.concat(
            F.lit("http://cap.example.org/"), F.col("ks"), F.lit("/"),
            F.col("r").cast("string"),
        ).alias("url"),
        F.concat(F.lit("2020010100000"), F.col("r").cast("string")).alias("dt"),
        "mimetype",
    )
    grobid = p.where(k % 2 == 0).select(
        sha1.alias("sha1hex"),
        F.when(k % 5 != 0, F.lit("success")).alias("status"),
        F.when(k % 7 != 0, F.lit("0.5.5-fatcat")).alias("grobid_version"),
    )
    pdf_meta = p.where(k % 6 == 0).select(sha1.alias("sha1hex"))
    ingest = p.where(k % 3 != 1).select(sha1.alias("terminal_sha1hex"))
    return captures, grobid, pdf_meta, ingest


def bf_unextracted(spark, sf_dir):
    """dump_unextracted_pdf.sql: has grobid + terminal ingest, missing
    pdf_meta; one canonical capture row per sha1."""
    captures, grobid, pdf_meta, ingest = _backfill_fixture(spark, sf_dir)
    return reporting.backfill_unextracted(grobid, captures, pdf_meta, ingest)


def bf_ungrobid(spark, sf_dir):
    """dump_ungrobid_pdf.sql: pdf captures with no status-bearing
    grobid attempt."""
    captures, grobid, _, _ = _backfill_fixture(spark, sf_dir)
    return reporting.backfill_ungrobid(captures, grobid)


def bf_regrobid(spark, sf_dir):
    """dump_regrobid_pdf.sql: pdf captures whose grobid row predates
    version tracking."""
    captures, grobid, _, _ = _backfill_fixture(spark, sf_dir)
    return reporting.backfill_regrobid(captures, grobid)


QUERIES5["bf_unextracted"] = bf_unextracted
QUERIES5["bf_ungrobid"] = bf_ungrobid
QUERIES5["bf_regrobid"] = bf_regrobid

_BF_ORACLE = """
WITH p AS (SELECT p_partkey AS k FROM part)
SELECT md5('h' || CAST(k AS VARCHAR)) AS sha1hex,
  'http://cap.example.org/' || CAST(k AS VARCHAR) || '/1' AS url,
  '20200101000001' AS dt,
  CASE WHEN k %% 4 = 0 THEN 'text/html' ELSE 'application/pdf' END AS mimetype
FROM p WHERE {gates}
"""

ORACLES5["bf_unextracted"] = _BF_ORACLE.replace("%%", "%").format(
    gates="k % 2 = 0 AND k % 3 != 1 AND k % 6 != 0"
)
ORACLES5["bf_ungrobid"] = _BF_ORACLE.replace("%%", "%").format(
    gates="k % 4 != 0 AND NOT (k % 2 = 0 AND k % 5 != 0)"
)
ORACLES5["bf_regrobid"] = _BF_ORACLE.replace("%%", "%").format(
    gates="k % 4 != 0 AND k % 2 = 0 AND k % 7 = 0"
)
