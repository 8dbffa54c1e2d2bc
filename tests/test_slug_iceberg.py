"""Tests: title slug kernel (C7/C8) and Iceberg MERGE statement policies."""

from __future__ import annotations

from sandcrawler_spark.functions.slug import similarity_ratio, title_slug
from sandcrawler_spark.sources.iceberg import merge_sql


def test_title_slug_semantics():
    assert title_slug("The Rise and Fall of the Néw Wörld") == "theriseandfallofthenewworld"
    assert title_slug("  Multi   space\ttitle! ") == "multispacetitle"
    assert title_slug("short") is None          # < 8 chars
    assert title_slug("Abstract") is None       # denylist
    assert title_slug("Editorial") is None
    assert title_slug(None) is None
    # accents fold to base letters, punctuation vanishes
    assert title_slug("Čapek's Über-Analysis: Part #2") == "capeksuberanalysispart2"


def test_similarity_ratio():
    assert similarity_ratio("abc", "abc") == 1.0
    assert similarity_ratio("", "abc") == 0.0
    assert abs(similarity_ratio("kitten", "sitting") - (1 - 3 / 7)) < 1e-9
    assert similarity_ratio("abcd", "abce") == 0.75


def test_merge_sql_policies():
    # ON CONFLICT DO NOTHING (file_meta, db.py:204-207)
    s = merge_sql("cat.crawl.file_meta", "src", ["sha1hex"], None,
                  ["sha1hex", "size_bytes"])
    assert "WHEN MATCHED" not in s
    assert "WHEN NOT MATCHED THEN INSERT (sha1hex, size_bytes)" in s
    # ON CONFLICT DO UPDATE (results, db.py:474-485)
    s = merge_sql("cat.crawl.url_seen", "src", ["ingest_type", "canonical_url"],
                  ["hit", "status"], ["ingest_type", "canonical_url", "hit", "status"])
    assert "t.ingest_type = s.ingest_type AND t.canonical_url = s.canonical_url" in s
    assert "WHEN MATCHED THEN UPDATE SET t.hit = s.hit, t.status = s.status" in s
