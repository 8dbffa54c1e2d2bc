"""Span-sequence invariant tests (SURVEY §5 rebuild plan c): the
ingest/extract transforms must preserve (kind, text, media_ref) order
exactly as the single-threaded rule does."""

from __future__ import annotations

import pytest

from sandcrawler_spark.plans.datagen import gen_frontier


@pytest.fixture(scope="module")
def docs_df(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spans_data"))
    gen_frontier(d, n_urls=400, n_hosts=12, n_seeds=100, seed=11)
    return spark.read.parquet(f"{d}/docs.parquet")


def _oracle_dedup(spans):
    """Pure-Python mirror of html_metadata.py:1075: drop exact dups,
    keep first-occurrence order, re-index offsets densely."""
    seen, out = set(), []
    for s in sorted(spans, key=lambda s: s["offset"]):
        key = (s["kind"], s["text"], s["media_ref"])
        if key in seen:
            continue
        seen.add(key)
        out.append(key)
    return [(k, t, m, i) for i, (k, t, m) in enumerate(out)]


def test_span_sequence_equality_after_dedup(spark, docs_df):
    from sandcrawler_spark.operators.spans import dedup_exact_spans

    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in dedup_exact_spans(docs_df).collect()
    }
    want = {
        r["doc_id"]: _oracle_dedup([s.asDict() for s in r["spans"]])
        for r in docs_df.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


def test_word_count_matches_oracle(spark, docs_df):
    from sandcrawler_spark.operators.spans import doc_word_count

    got = {r["doc_id"]: r["word_count"] for r in doc_word_count(docs_df).collect()}
    for r in docs_df.collect():
        texts = [s["text"] for s in sorted(r["spans"], key=lambda s: s["offset"])
                 if s["kind"] == "text"]
        if not texts:
            assert r["doc_id"] not in got
            continue
        body = " ".join(texts)
        assert got[r["doc_id"]] == len(body.split()), r["doc_id"]


def test_cap_resources(spark):
    from pyspark.sql import Row

    from sandcrawler_spark.operators.spans import cap_resources

    def span(kind, off):
        return Row(kind=kind, text=None if kind != "text" else "x",
                   media_ref=None if kind == "text" else f"http://m/{off}", offset=off)

    small = Row(doc_id="ok", spans=[span("text", 0)] + [span("image", i) for i in range(1, 5)])
    big = Row(doc_id="big", spans=[span("text", 0)] + [span("image", i) for i in range(1, 205)])
    df = spark.createDataFrame([small, big])
    kept = [r["doc_id"] for r in cap_resources(df).collect()]
    assert kept == ["ok"]


def test_interleave_stats(spark):
    from sandcrawler_spark.operators.spans import interleave_stats

    rows = [
        # doc 1: text, image, text, image → 3 alternations, 2 media
        (1, "text", 0), (1, "image", 1), (1, "text", 2), (1, "image", 3),
        # doc 2: all text → 0 alternations, no media
        (2, "text", 0), (2, "text", 1),
        # doc 3: media-first run then text → 1 alternation
        (3, "audio", 0), (3, "image", 1), (3, "text", 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, kind string, offset int")
    got = {r["doc_id"]: r for r in interleave_stats(df).collect()}
    assert (got[1]["n_spans"], got[1]["n_media"], got[1]["alternations"]) == (4, 2, 3)
    assert got[1]["first_media_offset"] == 1
    assert (got[2]["n_media"], got[2]["alternations"]) == (0, 0)
    assert got[2]["first_media_offset"] is None
    # audio→image is a kind change (counts) even though both are media
    assert (got[3]["n_media"], got[3]["alternations"]) == (2, 2)
    assert got[3]["media_fraction"] == pytest.approx(2 / 3, abs=1e-6)


def test_flatten_text_offset_order_and_media_counts(spark):
    """flatten_text joins kind='text' spans in OFFSET order regardless
    of array position, counts media spans without touching them, and
    yields '' for a doc with no text spans."""
    from sandcrawler_spark.operators.spans import flatten_text

    rows = [
        ("d1", [
            {"kind": "text", "text": "world", "media_ref": None, "offset": 10},
            {"kind": "image", "text": None, "media_ref": "m1", "offset": 5},
            {"kind": "text", "text": "hello", "media_ref": None, "offset": 0},
        ]),
        ("d2", [
            {"kind": "audio", "text": None, "media_ref": "m2", "offset": 0},
        ]),
    ]
    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    out = {r["doc_id"]: r for r in flatten_text(
        spark.createDataFrame(rows, schema)).collect()}
    assert out["d1"]["text"] == "hello world"
    assert out["d1"]["n_text_spans"] == 2 and out["d1"]["n_media_spans"] == 1
    assert out["d2"]["text"] == "" and out["d2"]["n_media_spans"] == 1
