"""Train the hashed-ngram quality classifier (operators/classifier.py)
from a labeled document parquet and write the (bucket, w) weight table
that `build_corpus.py --quality-weights` consumes.

    python tools/train_quality_model.py \
        --data DOCS.parquet --labels LABELS.parquet \
        --out WEIGHTS_DIR [--dim 4096] [--epochs 20] [--lr 1.0]

DOCS: (doc_id, text) — a documents.parquet dir/file like the corpus
builder reads. LABELS: (doc_id, y) with y in {0.0, 1.0} (1 = quality).
Writes WEIGHTS_DIR/weights.parquet (bucket long, w double) +
WEIGHTS_DIR/model.json (bias, losses, dims) and prints ONE JSON line.

Training is full-batch distributed logistic regression: per epoch one
broadcast-weights margin pass + one per-bucket gradient aggregation of
at most `dim` rows — the corpus never leaves the cluster, the driver
holds only the O(dim) model (classifier.train_linear_classifier).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="documents parquet (dir with documents.parquet, or a parquet path)")
    p.add_argument("--labels", required=True, help="(doc_id, y) parquet; y in {0,1}")
    p.add_argument("--out", required=True, help="output dir for weights.parquet + model.json")
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--l2", type=float, default=0.0)
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from sandcrawler_spark.operators.classifier import train_linear_classifier
    from sandcrawler_spark.session import get_spark

    def docs_path(d: str) -> str:
        return d if d.endswith(".parquet") else os.path.join(d, "documents.parquet")

    spark = get_spark("train-quality", cores=args.cores, shuffle_partitions=args.cores)
    docs = spark.read.parquet(docs_path(args.data)).select("doc_id", "text")
    labels = spark.read.parquet(args.labels).select("doc_id", "y")
    train = docs.join(labels, "doc_id")

    weights, bias, losses = train_linear_classifier(
        spark, train, "doc_id", "text", "y",
        dim=args.dim, epochs=args.epochs, lr=args.lr, l2=args.l2,
    )

    os.makedirs(args.out, exist_ok=True)
    weights.write.mode("overwrite").parquet(os.path.join(args.out, "weights.parquet"))
    meta = {
        "bias": bias,
        "dim": args.dim,
        "epochs": args.epochs,
        "lr": args.lr,
        "l2": args.l2,
        "losses": [round(x, 6) for x in losses],
        "n_train": train.count(),
        "nonzero_weights": weights.count(),
    }
    with open(os.path.join(args.out, "model.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps({"out": args.out, **meta}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
