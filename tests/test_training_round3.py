"""Round-3 training-pipeline operators: duplicate-cluster connected
components, benchmark decontamination, Gopher-style repetition stats.
Python-side oracles recompute each result exactly (the DuckDB battery
oracles cover the sf parquet path; these pin the semantics on
adversarial synthetic inputs — chains, ties, short docs)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_connected_components_chain_and_stars(spark):
    from sandcrawler_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5 (diameter > 1 round), pair, triangle w/ dup +
    # reversed edges, self-loop (dropped)
    edges = [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11),
             (20, 21), (21, 22), (20, 22), (22, 20), (7, 7)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r["id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
           for r in connected_components(df).collect()}
    assert got == {
        1: (1, 5, True), 2: (1, 5, False), 3: (1, 5, False),
        4: (1, 5, False), 5: (1, 5, False),
        10: (10, 2, True), 11: (10, 2, False),
        20: (20, 3, True), 21: (20, 3, False), 22: (20, 3, False),
    }


def test_connected_components_long_chain_converges(spark):
    from sandcrawler_spark.operators.dedup import connected_components

    # 64-node path: min-label propagation would need ~64 rounds;
    # large-star/small-star must finish within the max_iter=25 default
    df = spark.createDataFrame([(i, i + 1) for i in range(64)], "id1 long, id2 long")
    rows = connected_components(df).collect()
    assert len(rows) == 65
    assert all(r["cluster_id"] == 0 and r["cluster_size"] == 65 for r in rows)
    assert sum(r["is_canonical"] for r in rows) == 1


def test_connected_components_empty(spark):
    from sandcrawler_spark.operators.dedup import connected_components

    df = spark.createDataFrame([], "id1 long, id2 long")
    assert connected_components(df).count() == 0


def test_ngram_contamination(spark):
    from sandcrawler_spark.operators.text import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # shares 'alpha beta gamma' + 'beta gamma delta' → 2 of 3
            (1, "alpha beta gamma delta zeta"),
            (2, "zeta eta theta iota kappa"),      # clean
            (3, "alpha beta"),                      # too short for n=3
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["n_hit_ngrams"], r["n_ngrams"], r["overlap_frac"])
           for r in ngram_contamination(corpus, bench, "doc_id", "text", n=3).collect()}
    assert got == {1: (2, 3, 0.6667)}


def test_repetition_stats(spark):
    from sandcrawler_spark.operators.text import repetition_stats

    docs = [
        (1, "a b a b a b"),            # heavy 2-gram + dup-5-gram repetition
        (2, "one two three four"),     # no repetition, < 5 tokens
        (3, "x"),                      # shorter than both n
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: (r["doc_chars"], r["top_ngram_frac"], r["dup_ngram_frac"])
           for r in repetition_stats(df, "doc_id", "text").collect()}

    def oracle(text, top_n=2, dup_n=5):
        t = text.lower().split()
        s = " ".join(t)
        grams = lambda n: [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
        top = max((c * len(g) for g, c in Counter(grams(top_n)).items()),
                  default=0) if len(t) >= top_n else 0
        dup = sum(c * len(g) for g, c in Counter(grams(dup_n)).items()
                  if c >= 2) if len(t) >= dup_n else 0
        return (len(s), round(top / len(s), 4), round(dup / len(s), 4))

    for doc_id, text in docs:
        assert got[doc_id] == oracle(text), doc_id


def test_battery_cluster_cc_vs_pairs(spark, sf_dir):
    """Every near-dup pair must land in one cluster; every clustered doc
    must appear in some pair; cluster_id is the member minimum."""
    from sandcrawler_spark.queries.training import dd_cluster_cc, dd_jaccard_pairs

    pairs = dd_jaccard_pairs(spark, sf_dir).collect()
    cc = {r["doc_id"]: r["cluster_id"] for r in dd_cluster_cc(spark, sf_dir).collect()}
    nodes = {i for p in pairs for i in (p["id1"], p["id2"])}
    assert set(cc) == nodes
    for p in pairs:
        assert cc[p["id1"]] == cc[p["id2"]]
    by_cluster = {}
    for doc, cl in cc.items():
        by_cluster.setdefault(cl, []).append(doc)
    for cl, members in by_cluster.items():
        assert cl == min(members)
