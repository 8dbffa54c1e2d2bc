"""Incremental MinHash-LSH (dedup.build_minhash_index +
dedup.minhash_probe_index): probing a persisted band index with a new
batch must reproduce exactly the full-batch pipeline's pairs that touch
the batch — nothing more, nothing less — including after the index
round-trips through parquet (the persisted-state path a crawl uses).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sandcrawler_spark.operators.dedup import (
    build_minhash_index,
    minhash_near_dups,
    minhash_probe_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").cache()


def _pairs(df):
    return {(r["id1"], r["id2"], r["jacc"]) for r in df.collect()}


def test_probe_equals_batch_restricted_to_delta(spark, docs, tmp_path):
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)

    # the index round-trips through parquet, like real persisted state
    ix_path = str(tmp_path / "minhash_index")
    build_minhash_index(corpus, "doc_id", "text").write.parquet(ix_path)
    ix = spark.read.parquet(ix_path)

    got = _pairs(minhash_probe_index(delta, ix, corpus, "doc_id", "text", tau=0.8))

    batch = _pairs(minhash_near_dups(docs, "doc_id", "text", tau=0.8))
    want = {p for p in batch if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert got == want
    assert len(got) > 0  # the fixture must actually exercise the path
    # and no corpus-corpus pair leaks through
    assert all(a % 2 == 1 or b % 2 == 1 for a, b, _ in got)


def test_probe_empty_delta_is_empty(spark, docs):
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") < 0)
    ix = build_minhash_index(corpus, "doc_id", "text")
    out = minhash_probe_index(delta, ix, corpus, "doc_id", "text", tau=0.8)
    assert out.count() == 0


def test_simhash_probe_equals_batch_restricted(spark, docs):
    from sandcrawler_spark.operators.dedup import (
        simhash,
        simhash_near_dups,
        simhash_probe_index,
    )

    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    ix = simhash(corpus, "doc_id", "text")
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in simhash_probe_index(delta, ix, "doc_id", "text", max_hamming=3).collect()
    }
    batch = {
        (r["id1"], r["id2"], r["hamming"])
        for r in simhash_near_dups(docs, "doc_id", "text", max_hamming=3).collect()
    }
    want = {p for p in batch if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert got == want
    assert len(got) > 0


def test_embedding_probe_equals_batch_restricted(spark, tmp_path):
    import math
    import random

    from sandcrawler_spark.operators.similarity import (
        embedding_near_dups_lsh,
        embedding_probe_lsh,
        hyperplane_signatures,
    )

    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(6):  # 6 base directions, 4 near-copies each
        base = [rng.gauss(0, 1) for _ in range(12)]
        n = math.sqrt(sum(x * x for x in base))
        base = [x / n for x in base]
        for _ in range(4):
            jit = [x + rng.gauss(0, 0.01) for x in base]
            jn = math.sqrt(sum(x * x for x in jit))
            rows.append((vid, [x / jn for x in jit]))
            vid += 1
    all_vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = all_vecs.filter(F.col("vec_id") % 2 == 0)
    delta = all_vecs.filter(F.col("vec_id") % 2 == 1)

    # persisted signature state, parquet round-trip
    ix_path = str(tmp_path / "srp_index")
    hyperplane_signatures(corpus).write.parquet(ix_path)
    ix = spark.read.parquet(ix_path)

    got = {
        (r["id1"], r["id2"], r["sim"])
        for r in embedding_probe_lsh(delta, ix, corpus, tau=0.9).collect()
    }
    batch = {
        (r["id1"], r["id2"], r["sim"])
        for r in embedding_near_dups_lsh(all_vecs, tau=0.9).collect()
    }
    want = {p for p in batch if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert got == want
    assert len(got) > 0
