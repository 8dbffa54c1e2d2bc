"""Bridge a finished crawl to the training-data pipeline: extract the
fetched documents from crawl state as a `documents`-shaped parquet
that `build_corpus.py` (and every txt_/dd_/cls_ operator) consumes.

    python tools/crawl_to_corpus.py --state S --data D --out OUT_DIR
    python tools/build_corpus.py --data OUT_DIR --out CORPUS [...]

What it does (all DataFrame, zero row-Python):

1. union the per-round `url_seen` deltas, keep `hit` rows, resolve
   last-round-wins per (ingest_type, canonical_url) — the same
   resolution the crawl itself uses on resume;
2. project distinct `terminal_sha1hex` (one doc may be reached via
   many URLs — the crawl-level exact dedup);
3. join the data dir's `docs` table on doc_id and flatten each doc's
   interleaved span sequence to text: filter kind='text', sort by
   offset (array_sort comparator — inside the array, no explode, no
   shuffle), join with single spaces. Media spans are counted, not
   decoded.

Writes OUT_DIR/documents.parquet (doc_id, text, n_text_spans,
n_media_spans, n_urls) and prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--state", required=True, help="crawl state dir (snapshot store)")
    p.add_argument("--data", required=True, help="crawl data dir (holds docs.parquet)")
    p.add_argument("--out", required=True, help="output dir for documents.parquet")
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from sandcrawler_spark.plans.frontier import resolve_url_seen
    from sandcrawler_spark.plans.state import SnapshotStore
    from sandcrawler_spark.session import get_spark

    spark = get_spark("crawl-to-corpus", cores=args.cores, shuffle_partitions=args.cores)
    store = SnapshotStore(args.state, spark)
    seen = store.read_table("url_seen")
    if seen is None:
        print(json.dumps({"error": "no committed url_seen in state dir"}))
        return 1
    fetched = resolve_url_seen(seen).filter(F.col("hit"))
    per_doc = fetched.groupBy(
        F.col("terminal_sha1hex").alias("doc_id")
    ).agg(F.count(F.lit(1)).alias("n_urls"))

    n_fetched = per_doc.count()
    from sandcrawler_spark.operators.spans import flatten_text

    docs = spark.read.parquet(os.path.join(args.data, "docs.parquet"))
    flat = flatten_text(docs.join(per_doc, "doc_id")).join(per_doc, "doc_id")

    os.makedirs(args.out, exist_ok=True)
    flat.write.mode("overwrite").parquet(os.path.join(args.out, "documents.parquet"))
    row = (
        spark.read.parquet(os.path.join(args.out, "documents.parquet"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_text_spans").alias("text_spans"),
            F.sum("n_media_spans").alias("media_spans"),
            F.sum("n_urls").alias("fetch_urls"),
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "out": args.out,
                # fetched_docs = distinct content digests the crawl hit;
                # docs = those with a span row in the data dir's docs
                # table (a fixture may only materialize spans for a
                # subset of digests — the gap is reported, not hidden)
                "fetched_docs": n_fetched,
                "docs": row["docs"],
                "text_spans": int(row["text_spans"] or 0),
                "media_spans": int(row["media_spans"] or 0),
                "fetch_urls": int(row["fetch_urls"] or 0),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
