"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Two parts, one JSON line out:

1. Headline operator queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS] — per-query wall seconds, total as `value`.
2. Frontier scheduling-round throughput on a deterministic synthetic
   power-law frontier (4M URLs / 50k hosts by default; sized so a cold run with one-time fixture generation stays under ~8 min), measured at
   local[N] and local[4N] cores (the sandbox stand-in for N vs 4N
   executors, BASELINE.md protocol): URLs scheduled+deduped/sec at both
   levels (best of 2 timed runs after a JIT warm-up crawl — the
   sandbox VM's run-to-run variance is large), scaling efficiency, and
   the crawl-order-digest equality check across parallelism levels.

Environment calibration is included in the output: a pure-CPU
multiprocessing burn measures how much parallel speedup the box itself
can deliver between the two levels (this VM is memory-bandwidth-bound:
even embarrassingly-parallel work tops out well below 4× from N to 4N).

Output: {"metric", "value" (total headline sec), "unit": "sec",
"queries": {name: sec}, "sf", "frontier": {...}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# bench-only: shuffle files on tmpfs (the library default is disk; see
# session._tmpfs_local_dir for the opt-in + free-space guard)
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")

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
    "txt_tokens",
    "txt_langid_ngram",
    "med_sniff",
    "smp_hash_sample",
    "smp_stratified",
    "pack_shards_lpt",
    "rb_longest_match",
    "txt_line_dedup",
    "txt_pii_redact",
    "lg_pagerank",
    "lg_bfs_depth",
    "ir_bm25_topk",
    "fr_change_rate",
    "cu_dsir_score",
    "bib_metadata_filter",
    "ann_pq_search",
    "med_audio_segments",
    "aj_asof_join",
    "iv_interval_join",
    "fs_dataset_ingest",
    "mon_broken_domains",
    "txt_ccnet_buckets",
    "cdx_revisit_resolve",
    "med_pdf_spans",
    "cls_quality_score",
]

FRONTIER_URLS = int(os.environ.get("SPARK_GRAFT_FRONTIER_URLS", "4000000"))
FRONTIER_HOSTS = int(os.environ.get("SPARK_GRAFT_FRONTIER_HOSTS", "50000"))
FRONTIER_ROUNDS = 2
LOW_CORES = max(2, CPUS // 8)   # N
HIGH_CORES = max(4, CPUS // 2)  # 4N


def _new_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from sandcrawler_spark.session import get_spark

    return get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=cores)


def bench_queries(spark) -> dict[str, float]:
    from sandcrawler_spark.queries import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        times[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    return times


def _frontier_data(n_urls: int, n_hosts: int, tag_extra: str = "rel1") -> str:
    from sandcrawler_spark.plans.datagen import gen_frontier

    d = os.path.join(BENCH_CACHE, f"u{n_urls}_h{n_hosts}_{tag_extra}_s42")
    if not os.path.exists(os.path.join(d, "seeds.parquet")):
        os.makedirs(d, exist_ok=True)
        gen_frontier(d, n_urls=n_urls, n_hosts=n_hosts, n_seeds=n_urls // 3,
                     seed=42, budget_range=(16, 48))
    return d


def _crawl(spark, data_dir: str) -> tuple[float, int, list[int]]:
    from sandcrawler_spark.plans.frontier import run_crawl

    state = tempfile.mkdtemp(prefix="bench_state_")
    try:
        t0 = time.perf_counter()
        store = run_crawl(spark, data_dir, state, max_rounds=FRONTIER_ROUNDS)
        elapsed = time.perf_counter() - t0
        counters = store.counters()
        processed = sum(
            v for rc in counters.values() for k, v in rc.items()
            if k.startswith("status:")
        )
        digests = [counters[str(r)]["order_digest"] for r in sorted(map(int, counters))]
        return elapsed, processed, digests
    finally:
        shutil.rmtree(state, ignore_errors=True)


def bench_frontier(cores: int, data_dir: str, warmup_dir: str) -> dict:
    spark = _new_spark(cores)
    _crawl(spark, warmup_dir)  # JIT/codegen/python-worker warm-up
    runs: list[float] = []
    digests = None
    processed = 0
    # best-of-2, plus one retry if the pair disagrees by >40% — this
    # shared VM has multi-minute contention episodes (hypervisor steal)
    # that can poison a single run by 3×; a divergent pair means one of
    # the two landed in such an episode, so a third sample decides.
    for i in range(3):
        e, processed, d = _crawl(spark, data_dir)
        if digests is None:
            digests = d
        assert d == digests, "crawl order must be deterministic across reruns"
        runs.append(e)
        if i == 1 and max(runs) / min(runs) <= 1.4:
            break
    best = min(runs)
    return {
        "cores": cores,
        "urls_processed": processed,
        "seconds_best_of_2": round(best, 3),
        "seconds_runs": [round(e, 3) for e in runs],
        "urls_per_sec": round(processed / best, 1),
        "order_digests": digests,
    }


def bench_skew(spark) -> dict:
    """Hot-bucket skew row (round-4): LSH banding on a boilerplate-heavy
    corpus, where one band bucket ≫ all others. Two measurements:

    * contrast fixture (hot cluster small enough that the quadratic
      path is still runnable): capped vs uncapped wall-clock on the
      SAME input — the measured cost of leaving the cap off;
    * default-path fixture (hot cluster wider than DEFAULT_MAX_BUCKET,
      where the uncapped self-join would propose ~2.9·10^8 candidate
      pairs — the 100×-scale shape): wall-clock with library defaults
      plus the cap's no-silent-truncation counters
      (buckets_capped/rows_capped/widest_bucket via Observation) and
      the candidate-pair count the cap avoided, computed from the
      observed bucket widths rather than by running the quadratic plan.
    """
    from pyspark.sql import functions as F

    from sandcrawler_spark.operators.dedup import (
        minhash_near_dups,
        pop_cap_observations,
    )

    boiler = (
        "subscribe to our newsletter all rights reserved privacy policy "
        "terms of service cookie settings contact us about follow share"
    )

    def fixture(n_hot: int, n_unique: int):
        uniq = spark.range(n_unique).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("article"), F.col("id").cast("string"),
                *[
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(s), F.col("id").cast("string"))), 1, 7),
                        16, 10,
                    )
                    for s in "abcdefgh"
                ],
            ).alias("text"),
        )
        hot = spark.range(n_hot).select(
            (F.col("id") + 10_000_000).alias("doc_id"), F.lit(boiler).alias("text")
        )
        return uniq.unionAll(hot)

    out: dict = {}

    # --- contrast: both paths feasible (hot=2500 → 4 bands × 3.1M pairs)
    df_small = fixture(2500, 20_000).persist()
    df_small.count()
    t0 = time.perf_counter()
    n_unc = minhash_near_dups(df_small, "doc_id", "text", max_bucket=None).count()
    t_uncapped = time.perf_counter() - t0
    pop_cap_observations()
    t0 = time.perf_counter()
    n_cap = minhash_near_dups(df_small, "doc_id", "text", max_bucket=1000).count()
    t_capped = time.perf_counter() - t0
    obs = [o.get for _, o in pop_cap_observations()]
    df_small.unpersist()
    out["contrast_hot2500"] = {
        "uncapped_sec": round(t_uncapped, 2),
        "capped_sec": round(t_capped, 2),
        "speedup": round(t_uncapped / t_capped, 2),
        "uncapped_pairs": n_unc,
        "capped_pairs": n_cap,
        "buckets_capped": sum(m["buckets_capped"] for m in obs),
    }

    # --- default path: hot bucket wider than DEFAULT_MAX_BUCKET
    df_big = fixture(12_000, 48_000).persist()
    df_big.count()
    pop_cap_observations()
    t0 = time.perf_counter()
    n_def = minhash_near_dups(df_big, "doc_id", "text").count()
    t_default = time.perf_counter() - t0
    obs = [o.get for _, o in pop_cap_observations()]
    df_big.unpersist()
    widest = max((m["widest_bucket"] for m in obs), default=0)
    out["default_hot12000"] = {
        "default_capped_sec": round(t_default, 2),
        "pairs": n_def,
        "buckets_capped": sum(m["buckets_capped"] for m in obs),
        "rows_capped": sum(m["rows_capped"] for m in obs),
        "widest_bucket": widest,
        "candidate_pairs_avoided": sum(
            m["rows_capped"] * widest // 2 for m in obs
        ),
    }
    return out


def _burn(seconds: float) -> int:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < seconds:
        x += 1
    return x


def hardware_ceiling(lo: int, hi: int) -> float:
    """Pure-CPU parallel throughput ratio hi/lo workers — the box's own
    scaling ceiling, independent of Spark. OPTIMISTIC for shuffle
    workloads: a CPU burn shares no memory bandwidth, no shuffle files,
    no JVM — see :func:`spark_shuffle_ceiling` for the representative
    one."""
    with mp.Pool(hi) as p:
        t_hi = sum(p.map(_burn, [1.0] * hi))
    with mp.Pool(lo) as p:
        t_lo = sum(p.map(_burn, [1.0] * lo))
    return round(t_hi / t_lo, 2)


def spark_shuffle_ceiling(lo: int, hi: int, n: int = 40_000_000) -> float:
    """What Spark-on-this-box can deliver going lo→hi cores for a
    PERFECTLY parallel shuffle workload: one synthetic groupBy over n
    generated rows — zero algorithmic serialization, zero Python, zero
    skew, no IO beyond shuffle. The frontier job cannot scale better
    than this no matter how it is written, so crawl efficiency is
    reported against it as well as against the (optimistic) CPU burn.
    On a real N→4N cluster both ceilings are ≈4 because memory
    bandwidth and shuffle disks scale WITH the executors; on one shared
    VM they do not."""
    import time as _t

    from pyspark.sql import functions as F

    def one(cores: int) -> float:
        spark = _new_spark(cores)
        df = spark.range(0, n, 1, cores).select(
            (F.col("id") % 5_000_000).alias("k"), F.xxhash64("id").alias("h")
        )
        df.groupBy("k").agg(F.count("*")).count()  # warm
        runs = []
        for i in range(3):
            t0 = _t.perf_counter()
            df.groupBy("k").agg(F.count("*").alias("c"), F.max("h")).filter(
                "c>0"
            ).count()
            runs.append(_t.perf_counter() - t0)
            # same noise-episode retry rule as bench_frontier
            if i == 1 and max(runs) / min(runs) <= 1.4:
                break
        return min(runs)

    t_lo, t_hi = one(lo), one(hi)
    return round(t_lo / t_hi, 2)


def main() -> None:
    data_dir = _frontier_data(FRONTIER_URLS, FRONTIER_HOSTS)
    warmup_dir = _frontier_data(50_000, 2_000, tag_extra="warm")

    lo = bench_frontier(LOW_CORES, data_dir, warmup_dir)
    hi = bench_frontier(HIGH_CORES, data_dir, warmup_dir)
    eff = round(hi["urls_per_sec"] / (4 * lo["urls_per_sec"]), 3)

    spark_ceiling = spark_shuffle_ceiling(LOW_CORES, HIGH_CORES)
    spark = _new_spark(CPUS)
    times = bench_queries(spark)
    skew = bench_skew(spark)
    ceiling = hardware_ceiling(LOW_CORES, HIGH_CORES)

    out = {
        "metric": "headline operator suite wall-clock (sf parquet) + frontier URLs scheduled+deduped/sec at N vs 4N cores",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        # the suite has grown every round (r1: 13 queries, r2: 13,
        # r3: 33+) — compare wall-clock per query across rounds, not
        # the raw total
        "n_queries": len(times),
        "sec_per_query": round(sum(times.values()) / max(1, len(times)), 3),
        "queries": times,
        "skew_lsh_hot_bucket": skew,
        "sf": SF_DIR,
        "frontier": {
            "n_urls": FRONTIER_URLS,
            "n_hosts": FRONTIER_HOSTS,
            "rounds": FRONTIER_ROUNDS,
            "low": lo,
            "high": hi,
            "scaling_efficiency_n_to_4n": eff,
            "hardware_parallel_ceiling_n_to_4n": ceiling,
            "scaling_efficiency_vs_ceiling": round(
                eff * 4 / ceiling, 3
            ) if ceiling else None,
            "spark_shuffle_ceiling_n_to_4n": spark_ceiling,
            "scaling_efficiency_vs_spark_ceiling": round(
                eff * 4 / spark_ceiling, 3
            ) if spark_ceiling else None,
            "order_match_across_parallelism": lo["order_digests"] == hi["order_digests"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
