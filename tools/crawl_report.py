"""Human-readable report over a committed crawl state dir.

    python tools/crawl_report.py --state DIR [--top-hosts N]

Prints, per committed round: the status funnel (the reference's
per-status counters, ingest_file.py result statuses), dedup/schedule
totals, frontier growth, and order digest; then the top-N hosts by
scheduled fetches across the whole crawl with their success rates —
the per-host politeness/yield view an operator actually checks.  All
aggregation is DataFrame-side; only the printed summary rows reach the
driver.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--top-hosts", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession()
    if spark is None:
        from sandcrawler_spark.session import get_spark

        spark = get_spark("crawl-report", cores=8, shuffle_partitions=8)

    from sandcrawler_spark.functions.urlkeys import host_col
    from sandcrawler_spark.plans.state import SnapshotStore

    store = SnapshotStore(args.state, spark)
    rounds = store.committed_rounds
    print(f"crawl state: {args.state}")
    print(f"generation {store.generation}, committed rounds: {rounds}\n")

    counters = store.counters()
    for r in rounds:
        c = counters.get(str(r)) or counters.get(r) or {}
        statuses = {
            k.split(":", 1)[1]: v for k, v in c.items() if k.startswith("status:")
        }
        funnel = "  ".join(f"{k}={v}" for k, v in sorted(statuses.items()))
        print(
            f"round {r}: input={c.get('frontier_input_rows', '?')} "
            f"deduped={c.get('deduped', '?')} scheduled={c.get('scheduled', '?')} "
            f"new_frontier={c.get('frontier_rows', '?')} "
            f"digest={c.get('order_digest', '?')}"
        )
        print(f"  {funnel}")

    fo = None
    for r in rounds:
        df = store.read_round_table(r, "fetch_order").withColumn(
            "round_id", F.lit(r)
        )
        fo = df if fo is None else fo.unionByName(df, allowMissingColumns=True)
    if fo is None:
        print("\nno fetch orders committed")
        return 0
    from sandcrawler_spark.plans.frontier import resolve_url_seen

    seen = resolve_url_seen(store.read_table("url_seen")).select(
        "canonical_url", "status"
    )
    hosts = (
        fo.select(host_col(F.col("canonical_url")).alias("host"), "canonical_url")
        .join(seen, "canonical_url", "left")
        .groupBy("host")
        .agg(
            F.count("*").alias("scheduled"),
            F.sum((F.col("status") == "success").cast("int")).alias("ok"),
        )
        .withColumn("success_rate", F.round(F.col("ok") / F.col("scheduled"), 3))
        .orderBy(F.desc("scheduled"), "host")
        .limit(args.top_hosts)
    )
    print(f"\ntop {args.top_hosts} hosts by scheduled fetches:")
    for row in hosts.collect():
        print(
            f"  {row['host']:<30} scheduled={row['scheduled']:<6} "
            f"success={row['ok']} rate={row['success_rate']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
