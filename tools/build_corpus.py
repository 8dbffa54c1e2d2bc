"""Corpus-build CLI: the training-data curation pipeline as a product
surface over a `documents`-shaped parquet (doc_id, text).

Batch mode:
    python tools/build_corpus.py --data /root/testdata/sf0.01 --out /tmp/corpus

    1. exact dedup + Gopher quality gate → decisions.parquet
       (doc_id, reason ∈ {kept, exact_dup, gopher_fail}; with
       --quality-weights also quality_fail — the model-based filter
       stage scores rule-survivors with the hashed-ngram linear
       classifier and drops those under --quality-min)
    2. MinHash-LSH near-dup pairs over the survivors → connected
       components → non-canonical cluster members dropped
       (neardup_pairs.parquet)
    3. LPT shard packing by whitespace-token count → shards.parquet
    4. the MinHash band index of the FINAL kept set → minhash_index.parquet
       (the persisted state the next incremental batch probes)

Incremental mode (a later crawl batch joins an existing corpus):
    python tools/build_corpus.py --data NEW --out OUT \
        --index-in PREV/minhash_index.parquet --corpus-prev PREVDATA

    near-dup pairs come from dedup.minhash_probe_index (delta bands
    probe the stored index — the corpus is never re-signed); new docs
    that near-dup ANY previous doc are dropped, and intra-delta
    clusters keep their min-id canonical. The emitted index covers
    previous ∪ newly kept docs, so the mode chains.

Prints ONE JSON summary line; everything heavy is a DataFrame job.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="dir containing documents.parquet (or a parquet path)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--tau", type=float, default=0.8, help="near-dup Jaccard threshold")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--index-in", help="existing minhash band index parquet (incremental mode)")
    p.add_argument("--corpus-prev", help="previous corpus documents dir/parquet (incremental mode)")
    p.add_argument(
        "--quality-weights",
        help="(bucket, w) parquet of hashed-ngram linear-classifier weights "
        "(operators/classifier.py): enables the model-based quality-filter "
        "stage after the rule gates — docs scoring below --quality-min get "
        "reason 'quality_fail' and are excluded before near-dup dedup; "
        "scores land in quality_scores.parquet",
    )
    p.add_argument("--quality-bias", type=float, default=0.0)
    p.add_argument("--quality-min", type=float, default=0.5)
    p.add_argument("--quality-dim", type=int, default=4096)
    p.add_argument(
        "--clean",
        action="store_true",
        help="apply the unicode/text cleanup kernel (control strip, "
        "whitespace collapse, NFC — operators/text.py::clean_documents) "
        "before curation, so byte-form noise cannot split dup groups",
    )
    p.add_argument(
        "--write-shards",
        action="store_true",
        help="also materialize the sharded corpus itself: corpus.parquet/"
        "shard=N/ dirs with (doc_id, text, n_ws_tokens), one Hive "
        "partition per packed shard (write.partitionBy — the shard "
        "assignment join is the only added shuffle)",
    )
    args = p.parse_args()
    if bool(args.index_in) != bool(args.corpus_prev):
        p.error("--index-in and --corpus-prev must be given together")

    from pyspark.sql import functions as F

    from sandcrawler_spark.operators.curation import curation_decisions, pack_shards
    from sandcrawler_spark.operators.dedup import (
        build_minhash_index,
        connected_components,
        minhash_near_dups,
        minhash_probe_index,
    )
    from sandcrawler_spark.operators.text import token_stats
    from sandcrawler_spark.session import get_spark

    def docs_path(d: str) -> str:
        return d if d.endswith(".parquet") else os.path.join(d, "documents.parquet")

    spark = get_spark("build-corpus", cores=args.cores, shuffle_partitions=args.cores)
    docs = spark.read.parquet(docs_path(args.data)).select("doc_id", "text")
    if args.clean:
        from sandcrawler_spark.operators.text import clean_documents

        docs = clean_documents(docs).withColumnRenamed("id", "doc_id")

    decisions = curation_decisions(docs).persist()
    survivors = docs.join(
        decisions.filter(F.col("reason") == "kept"), "doc_id", "left_semi"
    ).persist()

    scores = None
    if args.quality_weights:
        from sandcrawler_spark.operators.curation import quality_filter

        wdf = spark.read.parquet(args.quality_weights)
        pre_decisions, pre_survivors = decisions, survivors
        decisions, survivors, scores = quality_filter(
            docs, decisions, wdf,
            bias=args.quality_bias,
            threshold=args.quality_min,
            dim=args.quality_dim,
        )
        decisions = decisions.persist()
        survivors = survivors.persist()
        scores = scores.persist()
        # materialize the post-filter caches, then release the
        # pre-filter ones — otherwise both generations stay pinned in
        # executor memory for the rest of the job
        decisions.count()
        survivors.count()
        pre_decisions.unpersist()
        pre_survivors.unpersist()

    if args.index_in:
        index = spark.read.parquet(args.index_in)
        prev = spark.read.parquet(docs_path(args.corpus_prev)).select("doc_id", "text")
        pairs = minhash_probe_index(
            survivors, index, prev, "doc_id", "text", tau=args.tau
        ).persist()
        prev_ids = prev.select(F.col("doc_id").alias("pid"))
        # any survivor near-dup'ing a PREVIOUS doc is dropped outright:
        # for each pair with one prev member, the OTHER member is new
        # (two equi semi-joins — no OR-condition nested-loop join)
        vs_prev = (
            pairs.join(prev_ids, pairs["id1"] == F.col("pid"), "left_semi")
            .select(F.col("id2").alias("doc_id"))
            .unionByName(
                pairs.join(prev_ids, pairs["id2"] == F.col("pid"), "left_semi")
                .select(F.col("id1").alias("doc_id"))
            )
            .distinct()
        )
        # intra-delta pairs cluster; min-id canonical survives
        both_new = pairs.join(
            prev_ids, pairs["id1"] == F.col("pid"), "left_anti"
        ).join(prev_ids, pairs["id2"] == F.col("pid"), "left_anti")
        clusters = connected_components(both_new, "id1", "id2")
        drop = clusters.filter(~F.col("is_canonical")).select(
            F.col("id").alias("doc_id")
        ).unionByName(vs_prev.select("doc_id")).distinct()
    else:
        pairs = minhash_near_dups(survivors, "doc_id", "text", tau=args.tau).persist()
        clusters = connected_components(pairs, "id1", "id2")
        drop = clusters.filter(~F.col("is_canonical")).select(F.col("id").alias("doc_id"))

    kept = survivors.join(drop, "doc_id", "left_anti").persist()
    stats = token_stats(kept, "doc_id", "text")
    sized = kept.join(
        stats.select(F.col("id").alias("doc_id"), "n_ws_tokens"), "doc_id"
    )
    packed = pack_shards(sized, "n_ws_tokens", "doc_id", args.shards)

    os.makedirs(args.out, exist_ok=True)
    decisions.write.mode("overwrite").parquet(os.path.join(args.out, "decisions.parquet"))
    if scores is not None:
        scores.write.mode("overwrite").parquet(
            os.path.join(args.out, "quality_scores.parquet")
        )
    pairs.write.mode("overwrite").parquet(os.path.join(args.out, "neardup_pairs.parquet"))
    packed.select("doc_id", "shard", "n_ws_tokens").write.mode("overwrite").parquet(
        os.path.join(args.out, "shards.parquet")
    )
    if args.write_shards:
        kept.join(
            packed.select("doc_id", "shard", "n_ws_tokens"), "doc_id"
        ).write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(args.out, "corpus.parquet")
        )
    new_index = build_minhash_index(kept, "doc_id", "text")
    if args.index_in:
        new_index = spark.read.parquet(args.index_in).unionByName(new_index)
    new_index.write.mode("overwrite").parquet(
        os.path.join(args.out, "minhash_index.parquet")
    )

    reasons = {r["reason"]: r["n"] for r in decisions.groupBy("reason").agg(F.count("*").alias("n")).collect()}
    summary = {
        "mode": "incremental" if args.index_in else "batch",
        "input_docs": docs.count(),
        "reasons": reasons,
        "neardup_pairs": pairs.count(),
        "kept_docs": kept.count(),
        "shards": args.shards,
        "total_ws_tokens": packed.agg(F.sum("n_ws_tokens")).collect()[0][0],
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
