"""Cuckoo filter (operators/cuckoo.py): kernel invariants + the Spark
sharded build/probe/delete surface + anti-join parity with the exact
answer and with the bloom path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sandcrawler_spark.operators import cuckoo as C


@pytest.fixture(scope="module")
def keys():
    rng = np.random.default_rng(7)
    k = rng.integers(0, 2**63, 20_000, dtype=np.int64).astype(np.uint64)
    o = rng.integers(0, 2**63, 20_000, dtype=np.int64).astype(np.uint64)
    return np.unique(k), np.unique(o[~np.isin(o, k)])


class TestKernel:
    def test_no_false_negatives_and_low_fpr(self, keys):
        ins, other = keys
        k = C.CuckooKernel(capacity=len(ins))
        k.insert_batch(ins)
        assert k.contains_batch(ins).all()
        assert k.contains_batch(other).mean() < 0.01

    def test_serialization_roundtrip(self, keys):
        ins, _ = keys
        k = C.CuckooKernel(capacity=len(ins))
        k.insert_batch(ins)
        k2 = C.CuckooKernel.from_bytes(*k.to_bytes())
        assert k2.nbuckets == k.nbuckets
        assert k2.contains_batch(ins).all()

    def test_delete_is_safe_for_other_keys(self, keys):
        ins, _ = keys
        k = C.CuckooKernel(capacity=len(ins))
        k.insert_batch(ins)
        half = len(ins) // 2
        removed = k.delete_batch(ins[:half])
        assert removed == half
        # the cuckoo contract: deleting inserted keys never creates
        # false negatives for the keys still in the filter
        assert k.contains_batch(ins[half:]).all()
        assert k.contains_batch(ins[:half]).mean() < 0.01

    def test_overfill_stashes_exactly(self, keys):
        ins, _ = keys
        small = C.CuckooKernel(capacity=64)
        stashed = small.insert_batch(ins[:2000])
        assert stashed > 0 and len(small.stash) == stashed
        assert small.contains_batch(ins[:2000]).all()  # stash keeps exactness

    def test_insert_idempotent(self, keys):
        ins, _ = keys
        k = C.CuckooKernel(capacity=len(ins))
        k.insert_batch(ins[:500])
        before = k.table.copy()
        k.insert_batch(ins[:500])  # re-insert: no duplicate copies
        assert (k.table == before).all()


class TestSparkSurface:
    def test_anti_join_matches_exact(self, spark):
        cand = spark.range(0, 3000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"), "id"
        )
        seen = spark.range(0, 3000).where(F.col("id") % 3 == 0).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")
        )
        got = sorted(
            r["id"] for r in C.seen_anti_join_cuckoo(cand, seen, "url", 8).collect()
        )
        assert got == [i for i in range(3000) if i % 3 != 0]

    def test_probe_has_no_false_negatives(self, spark):
        seen = spark.range(0, 2000).select(
            F.concat(F.lit("s"), F.col("id").cast("string")).alias("url")
        )
        shards = C.build_cuckoo_shards(seen, "url", 8)
        probed = C.probe_cogrouped(seen, shards, "url", 8)
        assert probed.where(~F.col("maybe_seen")).count() == 0

    def test_delete_unseen_allows_recrawl(self, spark):
        seen = spark.range(0, 1000).select(
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("url"), "id"
        )
        shards = C.build_cuckoo_shards(seen.select("url"), "url", 8)
        to_delete = seen.where(F.col("id") < 300).select("url")
        updated = C.delete_keys(shards, to_delete, "url", 8)
        probed = C.probe_cogrouped(seen, updated, "url", 8)
        # all surviving keys still present (no false negatives) ...
        assert probed.where((F.col("id") >= 300) & ~F.col("maybe_seen")).count() == 0
        # ... and deleted keys now probe as unseen (minus fp noise)
        re_crawlable = probed.where((F.col("id") < 300) & ~F.col("maybe_seen")).count()
        assert re_crawlable >= 295

    def test_shards_never_touch_driver(self, spark):
        """The build plan is a FlatMapGroupsInPandas over the hash
        partitioning — no collect, no broadcast of table bytes."""
        seen = spark.range(0, 100).select(F.col("id").cast("string").alias("url"))
        plan = (
            C.build_cuckoo_shards(seen, "url", 4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "FlatMapGroupsInPandas" in plan
