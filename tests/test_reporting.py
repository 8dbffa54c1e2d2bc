"""operators/reporting.py — the reference's monitoring dashboard
queries (sql/monitoring_queries.md) on hand-built fixtures with
hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from sandcrawler_spark.operators import reporting

NOW = "2024-04-10"


def _fixture(spark):
    # request rows: (ingest_type, base_url, created, source, link_source, link_source_id)
    d = dt.date
    requests = spark.createDataFrame(
        [
            ("pdf", "https://a.org/1", d(2024, 4, 1), "fatcat-changelog", "doi", "10.55/x1"),
            ("pdf", "https://a.org/2", d(2024, 4, 2), "fatcat-changelog", "doi", "10.55/x2"),
            ("pdf", "https://b.org/3", d(2024, 2, 1), "fatcat-changelog", "doi", "10.99/y"),  # outside window
            ("pdf", "https://c.org/4", d(2024, 4, 3), "fatcat-ingest", "pmid", "PMC4"),  # wrong source
            ("html", "https://d.org/5", d(2024, 4, 4), "fatcat-changelog", "doi", "10.55/x5"),  # wrong type
            ("pdf", "https://e.org/6", d(2024, 4, 5), "fatcat-changelog", "doi", "bogus-id"),  # prefix regex misses
        ],
        "ingest_type string, base_url string, created date, "
        "ingest_request_source string, link_source string, link_source_id string",
    )
    results = spark.createDataFrame(
        [
            ("pdf", "https://a.org/1", d(2024, 4, 6), "success", "https://t1.net/p"),
            ("pdf", "https://a.org/2", d(2024, 4, 6), "no-pdf-link", "https://t1.net/q"),
            ("pdf", "https://b.org/3", d(2024, 4, 6), "no-pdf-link", "https://t2.net/r"),
            ("pdf", "https://c.org/4", d(2024, 4, 7), "redirect-loop", "no-scheme-here"),
            ("html", "https://d.org/5", d(2024, 4, 7), "success", "https://t3.net/s"),
            ("pdf", "https://e.org/6", d(2024, 4, 7), "wrong-mimetype", "https://t2.net/u"),
            ("pdf", "https://orphan.org/9", d(2024, 4, 7), "success", "https://t9.net/v"),  # no request row
        ],
        "ingest_type string, base_url string, updated date, status string, terminal_url string",
    )
    return requests, results


def test_status_rollup_gates_and_counts(spark):
    requests, results = _fixture(spark)
    rows = {
        (r["status"]): r["cnt"]
        for r in reporting.ingest_status_rollup(
            results, requests, NOW, window_days=30
        ).collect()
    }
    # a.org/1 (success), a.org/2 (no-pdf-link), e.org/6 (wrong-mimetype)
    # survive; b.org/3 is outside the window, c.org/4 wrong source,
    # d.org/5 wrong type, orphan has no request row (left join + source
    # gate collapses to inner, like the reference).
    assert rows == {"success": 1, "no-pdf-link": 1, "wrong-mimetype": 1}


def test_broken_domains_extraction_and_filters(spark):
    requests, results = _fixture(spark)
    rows = {
        (r["domain"], r["status"]): r["cnt"]
        for r in reporting.broken_domains(
            results, requests, NOW, window_days=30,
            source="fatcat-changelog",
        ).collect()
    }
    # success rows and scheme-less terminal URLs (domain='') are out;
    # b.org/3 survives because this report windows on result.updated,
    # NOT request.created (monitoring_queries.md:31-33 comments the
    # created filter out in favor of updated).
    assert rows == {
        ("t1.net", "no-pdf-link"): 1,
        ("t2.net", "no-pdf-link"): 1,
        ("t2.net", "wrong-mimetype"): 1,
    }


def test_doi_prefix_cube_margins(spark):
    requests, results = _fixture(spark)
    rows = {
        (r["doi_prefix"], r["status"]): r["cnt"]
        for r in reporting.doi_prefix_report(
            results, requests, NOW, window_days=30, min_count=0
        ).collect()
    }
    # doi-linked, prefix-parseable survivors: 10.55/x1 (success),
    # 10.55/x2 (no-pdf-link), 10.99/y (no-pdf-link, in the updated
    # window); 'bogus-id' fails the prefix regex.
    assert rows[("10.55", None)] == 2  # per-prefix margin
    assert rows[("10.99", None)] == 1
    assert rows[(None, None)] == 3  # grand total
    assert rows[("10.55", "success")] == 1
    assert rows[(None, "no-pdf-link")] == 2
    assert ("bogus-id", None) not in rows


def test_daily_throughput_conditional_success(spark):
    requests, results = _fixture(spark)
    rows = {
        r["day"]: (r["total"], r["success"])
        for r in reporting.daily_throughput(
            results, requests, NOW, window_days=30, source="fatcat-changelog"
        ).collect()
    }
    # 2024-04-06: a.org/1 success + a.org/2 and b.org/3 no-pdf-link
    # (windowed on updated, so b.org/3's old created date is fine);
    # 2024-04-07: e.org/6 wrong-mimetype.
    assert rows == {dt.date(2024, 4, 6): (3, 1), dt.date(2024, 4, 7): (1, 0)}


def test_topn_tiebreak_is_total_order(spark):
    # Many groups with equal counts: the limit must pick a
    # deterministic set (count desc, then group keys asc).
    requests = spark.createDataFrame(
        [("pdf", f"https://h{i}.org/x", dt.date(2024, 4, 1), "fatcat-ingest", "pmid", "p")
         for i in range(30)],
        "ingest_type string, base_url string, created date, "
        "ingest_request_source string, link_source string, link_source_id string",
    )
    results = spark.createDataFrame(
        [("pdf", f"https://h{i}.org/x", dt.date(2024, 4, 2), "no-pdf-link",
          f"https://d{i:02d}.net/t") for i in range(30)],
        "ingest_type string, base_url string, updated date, status string, terminal_url string",
    )
    out1 = reporting.broken_domains(results, requests, NOW, window_days=30, limit=10).collect()
    out2 = reporting.broken_domains(
        results.repartition(7), requests.repartition(3), NOW, window_days=30, limit=10
    ).collect()
    assert [r["domain"] for r in out1] == [f"d{i:02d}.net" for i in range(10)]
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_score_histogram_width_bucket_semantics(spark):
    from sandcrawler_spark.operators.reporting import score_histogram

    rows = spark.createDataFrame(
        [
            (-0.01, "success"),   # below lo -> bucket 0
            (0.0, "success"),     # first bucket -> 1
            (0.5, "success"),     # 50 / (100/19) = 9.5 -> bucket 10
            (1.0, "success"),     # at hi -> n_buckets+1 = 20
            (None, "success"),    # dropped
            (0.5, "error"),       # dropped by status gate
        ],
        "score double, status string",
    )
    out = {r["buckets"]: r["cnt"] for r in score_histogram(rows, "score").collect()}
    assert out == {0: 1, 5: 1, 50: 1, 100: 1}


def test_reingest_candidates_rules(spark):
    """dump_reingest_quarterly.sql per-rule goldens: window edges,
    type/source gates, hit gate, spn2 prefix vs exclusion list."""
    from sandcrawler_spark.operators.reporting import reingest_candidates

    NOW = "2024-04-10"

    from datetime import datetime

    def req(u, t="pdf", created="2024-03-01 00:00:00", src="unpaywall"):
        return (t, u, datetime.fromisoformat(created), src)

    def res(u, status, t="pdf", hit=False):
        return (t, u, hit, status)

    requests = spark.createDataFrame(
        [
            req("u1"),                                        # candidate
            req("u2", t="dataset"),                           # type gate
            req("u3", src="savepapernow-web"),                # source gate
            req("u4", created="2024-04-09 20:00:00"),         # < 8h old
            req("u5", created="2024-01-01 00:00:00"),         # > 91d old
            req("u6"), req("u7"), req("u8"), req("u9"),
        ],
        "ingest_type string, base_url string, created timestamp, "
        "ingest_request_source string",
    )
    results = spark.createDataFrame(
        [
            res("u1", "no-capture"),
            res("u2", "no-capture"),
            res("u3", "no-capture"),
            res("u4", "no-capture"),
            res("u5", "no-capture"),
            res("u6", "spn2-cdx-lookup-failure"),   # spn2-% retryable
            res("u7", "spn2-error:not-found"),      # excluded spn2
            res("u8", "no-capture", hit=True),      # hit gate
            res("u9", "terminal-bad-status"),       # not retryable
        ],
        "ingest_type string, base_url string, hit boolean, status string",
    )
    got = {
        r.base_url: r.result_status
        for r in reingest_candidates(requests, results, now=NOW).collect()
    }
    assert got == {"u1": "no-capture", "u6": "spn2-cdx-lookup-failure"}


def test_backfill_dumps_petabox_variants(spark):
    """The petabox twins of the backfill dumps (dump_unextracted_pdf_
    petabox.sql / dump_ungrobid_pdf_petabox.sql): no ingest gate, no
    mimetype column, fatcat_file EXISTS active — plus the canonical
    one-per-sha1 pick under duplicate captures."""
    from sandcrawler_spark.operators.reporting import (
        backfill_ungrobid,
        backfill_unextracted,
    )

    captures = spark.createDataFrame(
        [
            ("s1", "http://x/1", "20200101000002"),
            ("s1", "http://x/0", "20200101000001"),  # canonical (min dt)
            ("s2", "http://y/1", "20200101000001"),
            ("s3", "http://z/1", "20200101000001"),
            ("s4", "http://w/1", "20200101000001"),
        ],
        "sha1hex string, url string, dt string",
    )
    grobid = spark.createDataFrame(
        [("s1", None, None), ("s2", "success", "0.5.5"), ("s3", "success", None)],
        "sha1hex string, status string, grobid_version string",
    )
    pdf_meta = spark.createDataFrame([("s2",)], "sha1hex string")
    fatcat = spark.createDataFrame([("s1",), ("s2",), ("s4",)], "sha1hex string")

    # unextracted petabox: grobid'd (s1,s2,s3), no ingest gate, minus
    # pdf_meta (s2) -> s1 (canonical row) + s3
    rows = sorted(
        (r.sha1hex, r.url)
        for r in backfill_unextracted(
            grobid, captures, pdf_meta, ingest_results=None
        ).collect()
    )
    assert rows == [("s1", "http://x/0"), ("s3", "http://z/1")]

    # ungrobid petabox: no mimetype, fatcat gate (s1,s2,s4); grobid
    # attempts WITH status exclude s2,s3; s1's status-less row does
    # not count as an attempt -> s1 + s4
    rows = sorted(
        (r.sha1hex, r.url)
        for r in backfill_ungrobid(
            captures, grobid, fatcat_file=fatcat, mimetype=None
        ).collect()
    )
    assert rows == [("s1", "http://x/0"), ("s4", "http://w/1")]
