"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Two parts, one JSON line out:

1. Headline operator queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS] — per-query wall seconds, total as `value`.
2. Frontier scheduling-round throughput on a deterministic synthetic
   power-law frontier, measured at local[N//4] and local[N] cores (the
   sandbox stand-in for N vs 4N executors, per BASELINE.md): URLs
   scheduled+deduped/sec at both levels, scaling efficiency, and a
   crawl-order-digest equality check across parallelism levels.

Output: {"metric", "value" (total headline sec), "unit": "sec",
"queries": {name: sec}, "sf", "frontier": {...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

HEADLINE = [
    "q1_pricing_summary",
    "j1_broadcast_join",
    "j2_sortmerge_join",
    "a5_cube_rollup",
    "a8_last_wins_dedup",
    "w1_dedup_top1",
    "w3_politeness_topk",
    "o1_global_rank",
    "st_session_window",
    "dd_minhash_lsh",
    "dd_simhash",
    "ann_cosine_topk",
    "med_binary_meta",
]

FRONTIER_URLS = int(os.environ.get("SPARK_GRAFT_FRONTIER_URLS", "1000000"))
FRONTIER_HOSTS = int(os.environ.get("SPARK_GRAFT_FRONTIER_HOSTS", "20000"))
FRONTIER_ROUNDS = 2


def _new_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        SparkSession.builder._options = {}  # type: ignore[attr-defined]
    from sandcrawler_spark.session import get_spark

    return get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=cores)


def bench_queries(spark) -> dict[str, float]:
    from sandcrawler_spark.queries import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    return times


def _frontier_data() -> str:
    from sandcrawler_spark.plans.datagen import gen_frontier

    tag = f"u{FRONTIER_URLS}_h{FRONTIER_HOSTS}_s42"
    d = os.path.join(BENCH_CACHE, tag)
    if not os.path.exists(os.path.join(d, "seeds.parquet")):
        os.makedirs(d, exist_ok=True)
        gen_frontier(d, n_urls=FRONTIER_URLS, n_hosts=FRONTIER_HOSTS,
                     n_seeds=FRONTIER_URLS // 3, seed=42)
    return d


def bench_frontier(cores: int, data_dir: str) -> dict:
    from sandcrawler_spark.plans.frontier import run_crawl

    spark = _new_spark(cores)
    state = tempfile.mkdtemp(prefix=f"bench_state_{cores}_")
    try:
        t0 = time.perf_counter()
        store = run_crawl(spark, data_dir, state, max_rounds=FRONTIER_ROUNDS,
                          use_bloom=True)
        elapsed = time.perf_counter() - t0
        counters = store.counters()
        processed = sum(
            v for rc in counters.values() for k, v in rc.items()
            if k.startswith("status:")
        )
        digests = [counters[str(r)]["order_digest"] for r in sorted(map(int, counters))]
        return {
            "cores": cores,
            "urls_processed": processed,
            "seconds": round(elapsed, 3),
            "urls_per_sec": round(processed / elapsed, 1),
            "order_digests": digests,
        }
    finally:
        shutil.rmtree(state, ignore_errors=True)


def main() -> None:
    data_dir = _frontier_data()

    # frontier at N/4 cores first, then N (then reuse the N-core session)
    lo = bench_frontier(max(2, CPUS // 4), data_dir)
    hi = bench_frontier(CPUS, data_dir)
    eff = round(hi["urls_per_sec"] / (4 * lo["urls_per_sec"]), 3)

    spark = _new_spark(CPUS)
    times = bench_queries(spark)

    out = {
        "metric": "headline operator suite wall-clock (sf parquet) + frontier URLs scheduled+deduped/sec at N vs 4N cores",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "frontier": {
            "n_urls": FRONTIER_URLS,
            "rounds": FRONTIER_ROUNDS,
            "low": lo,
            "high": hi,
            "scaling_efficiency_n_to_4n": eff,
            "order_match_across_parallelism": lo["order_digests"] == hi["order_digests"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
