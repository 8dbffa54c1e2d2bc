"""End-to-end corpus build: the training-data ops composed the way a
real pipeline runs them — exact/quality curation → MinHash near-dup
clusters → canonical-per-cluster keep → token accounting → balanced
shard packing — with determinism asserted across partitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sandcrawler_spark.operators.curation import curation_decisions, pack_shards
from sandcrawler_spark.operators.dedup import connected_components, minhash_near_dups
from sandcrawler_spark.operators.text import token_stats

STOP = "the and that have with "


def _doc(tag: str) -> str:
    # ≥50 words, ≥2 stopwords, all-alpha tokens → passes the Gopher gate;
    # token vocabulary is doc-unique, so distinct docs share (almost) no
    # 3-gram shingles
    return STOP + " ".join(f"{tag}tok{j}" for j in range(55))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _doc(f"w{i}x")) for i in range(20)]  # doc 0 = the family base
    base = _doc("w0x")
    rows += [
        (21, base + " tailone"),
        (22, base + " tailtwo"),
        (23, base.replace("w0xtok30", "changed")),
        (24, base),  # exact dup of doc 0
        (25, "junk"),  # fails quality
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(corpus, n_shards=3):
    decisions = curation_decisions(corpus)
    survivors = corpus.join(
        decisions.filter(F.col("reason") == "kept"), "doc_id", "left_semi"
    )
    pairs = minhash_near_dups(survivors, "doc_id", "text", tau=0.8)
    clusters = connected_components(pairs, "id1", "id2")
    drop_near = clusters.filter(~F.col("is_canonical")).select(
        F.col("id").alias("doc_id")
    )
    kept = survivors.join(drop_near, "doc_id", "left_anti")
    stats = token_stats(kept, "doc_id", "text")
    sized = kept.join(
        stats.select(F.col("id").alias("doc_id"), "n_ws_tokens"), "doc_id"
    )
    return decisions, kept, pack_shards(sized, "n_ws_tokens", "doc_id", n_shards)


def test_corpus_build_composition(spark, corpus):
    decisions, kept, packed = _build(corpus)
    d = {r["doc_id"]: r["reason"] for r in decisions.collect()}
    assert d[24] == "exact_dup" and d[25] == "gopher_fail"
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # near-dups of doc 0 collapse to the min-id canonical
    assert 0 in kept_ids
    assert not {21, 22, 23} & kept_ids
    assert not {24, 25} & kept_ids
    # every other variant doc survives
    assert set(range(1, 20)) <= kept_ids

    rows = packed.select("doc_id", "shard").collect()
    shards = {}
    for r in rows:
        shards.setdefault(r["shard"], []).append(r["doc_id"])
    assert set(shards) == {0, 1, 2}
    sizes = sorted(len(v) for v in shards.values())
    assert sizes[-1] - sizes[0] <= 1  # round-robin balance


def test_corpus_build_deterministic_across_partitioning(spark, corpus):
    def run(parts):
        _, _, packed = _build(corpus.repartition(parts))
        return sorted(
            (r["doc_id"], r["shard"]) for r in packed.collect()
        )

    assert run(1) == run(13)


def test_semdedup_prunes_within_cluster_only(spark):
    from sandcrawler_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),          # centroids / members
        (2, [0.99, 0.01]),                          # near-dup of 0's direction
        (3, [2.0, 0.0]),                            # same direction as 0, scaled
        (4, [0.01, 0.99]),                          # near 1's direction
        (5, [-1.0, 0.0]),                           # anti-parallel: not a dup
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.filter("vec_id < 2")
    got = {r["vec_id"]: (r["centroid_id"], r["keep"])
           for r in semdedup(df, cents, tau=0.95).collect()}
    # 0 keeps (smallest id); 2 and 3 are pruned by 0; 4 pruned by 1
    assert got[0] == (0, True) and got[1] == (1, True)
    assert got[2][1] is False and got[3][1] is False
    assert got[4] == (1, False)
    # anti-parallel vector lands in a cell but survives (cos = -1)
    assert got[5][1] is True


def test_quality_filter_stage(spark, corpus):
    """Model-based second gate (curation.quality_filter): a weight
    table planted to score docs by presence of their own vocab —
    bucket weights chosen so docs containing 'w1x*' tokens score low —
    demotes exactly those kept docs to quality_fail, leaves rule-drop
    reasons untouched, and excludes demoted docs from the kept set."""
    from sandcrawler_spark.operators.classifier import hashed_ngram_features
    from sandcrawler_spark.operators.curation import quality_filter

    decisions = curation_decisions(corpus)
    # plant: negative weight on buckets doc 1 hits but doc 2 does NOT
    # (every doc shares the stopword prefix, so doc-1-only buckets must
    # be computed by subtraction), via the SAME feature pipeline
    b1 = (
        hashed_ngram_features(
            corpus.filter(F.col("doc_id") == 1), "doc_id", "text", dim=512
        )
        .select("bucket")
        .distinct()
    )
    b2 = (
        hashed_ngram_features(
            corpus.filter(F.col("doc_id") == 2), "doc_id", "text", dim=512
        )
        .select("bucket")
        .distinct()
    )
    weights = b1.exceptAll(b2).select("bucket", F.lit(-50.0).alias("w"))
    d2, kept, scores = quality_filter(
        corpus, decisions, weights, dim=512, threshold=0.5
    )
    reasons = {r["doc_id"]: r["reason"] for r in d2.collect()}
    assert reasons[1] == "quality_fail"
    # rule-based reasons survive untouched
    assert reasons[24] == "exact_dup" and reasons[25] == "gopher_fail"
    # doc 2 shares no vocab with doc 1 -> all-zero margin -> score 0.5, kept
    assert reasons[2] == "kept"
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 1 not in kept_ids and 2 in kept_ids
    by_id = {r["id"]: r["score"] for r in scores.collect()}
    assert by_id[1] < 0.01 and abs(by_id[2] - 0.5) < 1e-9


def test_select_representatives_keep_best(spark):
    """Keep-best retention: per cluster the max-score member wins,
    score ties keep the smaller id, unscored members lose to scored
    ones, and an entirely-unscored cluster still keeps exactly one."""
    from sandcrawler_spark.operators.dedup import select_representatives

    members = spark.createDataFrame(
        [("a1", "c1"), ("a2", "c1"), ("a3", "c1"),
         ("b1", "c2"), ("b2", "c2"),
         ("u1", "c3"), ("u2", "c3")],
        "id string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [("a1", 0.2), ("a2", 0.9), ("a3", 0.9),
         ("b1", 0.5)],  # b2 unscored; c3 fully unscored
        "id string, score double",
    )
    out = {r["id"]: r for r in select_representatives(members, scores).collect()}
    reps = {i for i, r in out.items() if r["is_representative"]}
    assert reps == {"a2", "b1", "u1"}  # tie a2/a3 -> smaller id; c3 -> min id
    assert out["a2"]["score"] == 0.9 and out["b2"]["score"] == float("-inf")
    # exactly one representative per cluster
    from collections import Counter
    per = Counter(out[i]["cluster_id"] for i in reps)
    assert all(v == 1 for v in per.values()) and len(per) == 3


def test_select_representatives_duplicate_scores(spark):
    """Duplicate (id, score) rows in the scores table must not
    duplicate member rows or representatives (round-4 ADVICE fix:
    scores collapse to max-per-id before the join-back)."""
    from sandcrawler_spark.operators.dedup import select_representatives

    members = spark.createDataFrame(
        [("a1", "c1"), ("a2", "c1")], "id string, cluster_id string"
    )
    scores = spark.createDataFrame(
        # a1 scored twice (re-run appended); a2 scored twice with a tie
        # at the would-be cluster max
        [("a1", 0.3), ("a1", 0.8), ("a2", 0.8), ("a2", 0.1)],
        "id string, score double",
    )
    rows = select_representatives(members, scores).collect()
    assert len(rows) == 2  # one output row per member, not per score row
    out = {r["id"]: r for r in rows}
    assert out["a1"]["score"] == 0.8 and out["a2"]["score"] == 0.8
    reps = {i for i, r in out.items() if r["is_representative"]}
    assert reps == {"a1"}  # max-score tie -> smaller id, exactly one
