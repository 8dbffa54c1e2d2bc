"""Hashed-ngram linear classifier: training convergence, inference
determinism/partitioning-independence, and a Python-free inference
plan (operators/classifier.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sandcrawler_spark.operators import classifier as C

POS = [
    "win free money now claim your exclusive prize today",
    "free prize money win now act today exclusive offer",
    "claim free exclusive money prize win offer now",
    "exclusive free offer win money prize claim now today act",
    "money money free win prize claim offer now",
    "act now win free exclusive money prize today",
]
NEG = [
    "the quick brown fox jumps over the lazy dog",
    "a study of sediment transport in glacial rivers",
    "methods and results of the longitudinal survey analysis",
    "we present a framework for distributed query planning",
    "the lazy dog sleeps while the brown fox runs",
    "sediment analysis methods for the river survey",
]


def _corpus(spark):
    rows = [(f"p{i}", t, 1.0) for i, t in enumerate(POS)] + [
        (f"n{i}", t, 0.0) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string, y double")


def test_train_converges_and_separates(spark):
    df = _corpus(spark)
    weights, bias, losses = C.train_linear_classifier(
        spark, df, "doc_id", "text", "y", dim=256, epochs=15, lr=1.0
    )
    assert losses[-1] < 0.2, losses
    scored = C.classify_documents(
        df, "doc_id", "text", weights, bias, dim=256
    ).collect()
    by_id = {r["id"]: r["score"] for r in scored}
    assert all(by_id[f"p{i}"] > 0.5 for i in range(len(POS))), by_id
    assert all(by_id[f"n{i}"] < 0.5 for i in range(len(NEG))), by_id


def test_feature_normalization_sums_to_one(spark):
    df = _corpus(spark)
    feats = C.hashed_ngram_features(df, "doc_id", "text", dim=64)
    sums = feats.groupBy("id").agg(F.round(F.sum("x"), 9).alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


def test_feature_hash_matches_python(spark):
    """Bucket ids replay the repo's salted-md5 60-bit convention."""
    df = spark.createDataFrame([("d", "alpha beta")], "doc_id string, text string")
    rows = C.hashed_ngram_features(df, "doc_id", "text", dim=4096).collect()

    def bucket(f: str) -> int:
        return int(hashlib.md5(("hlc" + f).encode()).hexdigest()[:15], 16) % 4096

    expect = {bucket("alpha"), bucket("beta"), bucket("alpha beta")}
    assert {r["bucket"] for r in rows} == expect
    assert all(abs(r["x"] - 1.0 / 3.0) < 1e-12 for r in rows)


def test_inference_partitioning_independent(spark):
    df = _corpus(spark)
    wdf = spark.range(256).select(
        F.col("id").alias("bucket"),
        ((F.col("id") % 21).cast("double") / 10.0 - 1.0).alias("w"),
    )
    a = C.classify_documents(df.repartition(1), "doc_id", "text", wdf, dim=256)
    b = C.classify_documents(df.repartition(7), "doc_id", "text", wdf, dim=256)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_inference_plan_python_free(spark):
    df = _corpus(spark)
    wdf = spark.range(64).select(
        F.col("id").alias("bucket"), F.lit(0.25).alias("w")
    )
    plan = C.classify_documents(df, "doc_id", "text", wdf, dim=64)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_unseen_buckets_score_half_at_zero_bias(spark):
    """Docs whose features all miss the weight table get margin 0 →
    score 0.5 (left-join + coalesce path)."""
    df = spark.createDataFrame([("d", "zzz qqq")], "doc_id string, text string")
    wdf = spark.createDataFrame([(999999, 5.0)], "bucket long, w double")
    out = C.classify_documents(df, "doc_id", "text", wdf, dim=4096).collect()
    assert out[0]["score"] == 0.5


def test_zero_token_docs_score_sigmoid_bias(spark):
    """A doc that tokenizes to zero tokens still gets a score row —
    margin is exactly the bias (round-4 ADVICE fix: previously such
    docs had no row at all, so quality_filter kept them unaudited)."""
    import math

    df = spark.createDataFrame(
        [("empty", ""), ("blank", "   \t  "), ("real", "zzz qqq")],
        "doc_id string, text string",
    )
    wdf = spark.createDataFrame([(999999, 5.0)], "bucket long, w double")
    out = {r["id"]: r["score"]
           for r in C.classify_documents(df, "doc_id", "text", wdf,
                                         bias=-1.0, dim=4096).collect()}
    assert set(out) == {"empty", "blank", "real"}
    expect = round(1.0 / (1.0 + math.exp(1.0)), 6)
    assert out["empty"] == expect and out["blank"] == expect
    # featureless-via-unseen-buckets doc: margin = 0 + bias too
    assert out["real"] == expect


def test_quality_filter_audits_zero_token_docs(spark):
    """quality_filter demotes a zero-token doc when sigmoid(bias) is
    under the threshold, with a score row in the audit table."""
    from sandcrawler_spark.operators import curation

    docs = spark.createDataFrame(
        [("e1", ""), ("d1", "solid informative article text")],
        "doc_id string, text string",
    )
    decisions = spark.createDataFrame(
        [("e1", "kept"), ("d1", "kept")], "doc_id string, reason string"
    )
    wdf = spark.createDataFrame([(1, 99.0)], "bucket long, w double")
    dec2, kept, scores = curation.quality_filter(
        docs, decisions, wdf, bias=-2.0, threshold=0.2
    )
    smap = {r["id"]: r["score"] for r in scores.collect()}
    assert "e1" in smap  # audited, not silently kept
    rmap = {r["doc_id"]: r["reason"] for r in dec2.collect()}
    assert rmap["e1"] == "quality_fail"  # sigmoid(-2) ≈ 0.119 < 0.2
