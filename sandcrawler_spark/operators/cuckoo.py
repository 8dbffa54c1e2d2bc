"""Partitioned cuckoo filter for URL-seen membership (north rule:
"partitioned bloom/cuckoo filter ... as vectorized pandas/Arrow UDFs").

The bloom store (`operators/bloom.py`) covers the append-only fast
path; this is the CUCKOO half of the rule, and brings the one
capability bloom structurally cannot: DELETION (un-seeing a URL on
force-recrawl/rollback without a full rebuild).

Design (Fan et al. 2014, public paper — partial-key cuckoo hashing):

- Key space hash-partitioned into shards by ``pmod(h, num_shards)``
  (same convention as the bloom store); each shard owns an independent
  table of ``nbuckets x 4`` 16-bit fingerprint slots (0 = empty).
- fingerprint ``f = (h >> 24) % 65535 + 1`` (never 0); primary bucket
  ``i1 = h mod nbuckets``; alternate ``i2 = i1 XOR (f * 0x5bd1e995)
  mod nbuckets`` — partial-key: i1 is recoverable from (i2, f), which
  is what makes delete and eviction work without the original key.
- Batch insert is vectorized: all keys try i1's 4 slots in one numpy
  pass per slot, the remainder tries i2, and only the (rare at <=50%
  target load) residue walks the sequential eviction loop; keys whose
  eviction chain exceeds the kick budget land in a per-shard STASH
  (linear-checked, exact) so inserts NEVER fail silently.
- Exactness contract is identical to the bloom: the filter is a
  prefilter; "maybe seen" candidates are confirmed by an exact
  anti-join, so false positives cost work, never correctness. False
  negatives cannot happen for inserted keys (table or stash).
- Spark surface stores shards as a TABLE (one row per shard: packed
  uint16 table bytes + stash bytes) built executor-side via
  ``groupBy(shard).applyInPandas`` — no driver-resident state; probe
  and delete cogroup candidates with their shard row, so only
  candidates move and each task holds exactly one shard's table.

At the 10^10 design point a 16-bit-fingerprint cuckoo table at 50%
load spends ~4 bytes/key (vs the bloom's 2 bytes/key at fpr 0.6%) and
pays it back with O(1) delete and ~0.1% fpr.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4
MAX_KICKS = 500
_FP_MIX = np.uint64(0x5BD1E995)


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


class CuckooKernel:
    """One shard's cuckoo table: pure-numpy, Arrow-batch-friendly."""

    def __init__(self, capacity: int, table: np.ndarray | None = None,
                 stash: np.ndarray | None = None) -> None:
        # size for <=50% load so the eviction path stays rare
        self.nbuckets = _next_pow2(max(2, (2 * capacity) // SLOTS))
        if table is not None:
            self.table = table.reshape(-1, SLOTS).copy()
            self.nbuckets = self.table.shape[0]
        else:
            self.table = np.zeros((self.nbuckets, SLOTS), dtype=np.uint16)
        # stash rows are (bucket_i1, fingerprint) pairs
        self.stash = (
            stash.reshape(-1, 2).copy()
            if stash is not None and stash.size
            else np.empty((0, 2), dtype=np.uint64)
        )

    # --- hashing -----------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        return ((h >> np.uint64(24)) % np.uint64(65535) + np.uint64(1)).astype(np.uint64)

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return h % np.uint64(self.nbuckets)

    def _alt(self, i: np.ndarray, f: np.ndarray) -> np.ndarray:
        return (i ^ (f * _FP_MIX)) % np.uint64(self.nbuckets)

    # --- ops ---------------------------------------------------------
    def insert_batch(self, h: np.ndarray) -> int:
        """Insert hashes (uint64), idempotently (batch is uniqued and
        already-present keys skip). Returns how many went to the stash."""
        h = np.unique(h.astype(np.uint64))
        f = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, f)
        pending = ~self._contains(f, i1, i2)
        for buckets in (i1, i2):  # vectorized slot placement
            for s in range(SLOTS):
                if not pending.any():
                    break
                idx = np.nonzero(pending)[0]
                b = buckets[idx]
                cand = idx[self.table[b, s] == 0]
                # one writer per bucket per pass: np.unique keeps the
                # first candidate for each bucket, the rest requeue
                _, first = np.unique(buckets[cand], return_index=True)
                place = cand[first]
                self.table[buckets[place], s] = f[place].astype(np.uint16)
                pending[place] = False
        stashed = 0
        for j in np.nonzero(pending)[0]:  # rare eviction walk
            stashed += self._insert_one(int(i1[j]), int(f[j]))
        return stashed

    def _insert_one(self, i: int, f: int) -> int:
        for _ in range(MAX_KICKS):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = f
                return 0
            s = int(f) % SLOTS  # deterministic victim slot
            f, self.table[i, s] = int(self.table[i, s]), f
            i = int(self._alt(np.uint64(i), np.uint64(f)))
        self.stash = np.vstack(
            [self.stash, np.array([[i, f]], dtype=np.uint64)]
        )
        return 1

    def _contains(self, f: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
        hit = (self.table[i1.astype(np.int64)] == f[:, None].astype(np.uint16)).any(axis=1)
        hit |= (self.table[i2.astype(np.int64)] == f[:, None].astype(np.uint16)).any(axis=1)
        if len(self.stash):
            # alt() is involutive under pow-2 nbuckets, so a stashed
            # (b, f) is reachable from a probe iff b is one of the
            # probe's two buckets; pack (bucket, fp) to one uint64 key
            keys = self.stash[:, 0] * np.uint64(1 << 17) + self.stash[:, 1]
            probe1 = i1 * np.uint64(1 << 17) + f
            probe2 = i2 * np.uint64(1 << 17) + f
            hit |= np.isin(probe1, keys) | np.isin(probe2, keys)
        return hit

    def contains_batch(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64)
        f = self._fp(h)
        i1 = self._i1(h)
        return self._contains(f, i1, self._alt(i1, f))

    def delete_batch(self, h: np.ndarray) -> int:
        """Remove ONE copy of each hash's fingerprint (safe only for
        keys actually inserted — the cuckoo deletion contract).
        Returns the number of fingerprints removed."""
        h = h.astype(np.uint64)
        f = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, f)
        removed = 0
        for j in range(len(h)):
            done = False
            for b in (int(i1[j]), int(i2[j])):
                row = self.table[b]
                slots = np.nonzero(row == np.uint16(f[j]))[0]
                if len(slots):
                    self.table[b, slots[0]] = 0
                    removed += 1
                    done = True
                    break
            if done:
                continue
            if len(self.stash):
                m = (self.stash[:, 1] == f[j]) & (
                    (self.stash[:, 0] == i1[j]) | (self.stash[:, 0] == i2[j])
                )
                hits = np.nonzero(m)[0]
                if len(hits):
                    self.stash = np.delete(self.stash, hits[0], axis=0)
                    removed += 1
        return removed

    # --- serialization ----------------------------------------------
    def to_bytes(self) -> tuple[bytes, bytes]:
        return self.table.tobytes(), self.stash.tobytes()

    @classmethod
    def from_bytes(cls, table_b: bytes, stash_b: bytes | None) -> "CuckooKernel":
        table = np.frombuffer(table_b, dtype=np.uint16)
        stash = (
            np.frombuffer(stash_b, dtype=np.uint64) if stash_b else
            np.empty(0, dtype=np.uint64)
        )
        return cls(capacity=1, table=table, stash=stash)


# ---------------------------------------------------------------------------
# Spark surface (sharded table; executor-side build/probe/delete)
# ---------------------------------------------------------------------------

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("table", T.BinaryType()),
        T.StructField("stash", T.BinaryType()),
        T.StructField("n_keys", T.LongType()),
        T.StructField("n_stashed", T.LongType()),
    ]
)


def _hash_col(col: str) -> F.Column:
    return F.xxhash64(F.col(col))


def _shard_col(hcol: F.Column, num_shards: int) -> F.Column:
    return F.pmod(hcol, F.lit(num_shards)).cast("int")


def build_cuckoo_shards(
    df: DataFrame, key_col: str, num_shards: int = 32, capacity_per_shard: int | None = None
) -> DataFrame:
    """Distributed build: one cuckoo table per shard, built inside
    ``applyInPandas`` from only that shard's keys — the driver never
    holds a table. Returns the shard table DataFrame (SHARD_SCHEMA)."""
    n = capacity_per_shard
    hashes = df.select(_hash_col(key_col).alias("h")).withColumn(
        "shard", _shard_col(F.col("h"), num_shards)
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
        k = CuckooKernel(capacity=n if n else max(16, len(h)))
        stashed = k.insert_batch(h)
        tb, sb = k.to_bytes()
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [tb],
                "stash": [sb],
                "n_keys": [len(h)],
                "n_stashed": [stashed],
            }
        )

    return hashes.groupBy("shard").applyInPandas(build, SHARD_SCHEMA)


def probe_cogrouped(
    candidates: DataFrame, shards: DataFrame, key_col: str, num_shards: int = 32
) -> DataFrame:
    """candidates + ``maybe_seen`` boolean: cogroup each candidate
    partition with its single shard row — only candidates shuffle, each
    task holds exactly one shard's table (the bloom store's cogrouped
    probe shape, `bloom.py::probe_cogrouped`)."""
    cand = candidates.withColumn("__h", _hash_col(key_col)).withColumn(
        "__shard", _shard_col(F.col("__h"), num_shards)
    )
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def probe(c: pd.DataFrame, s: pd.DataFrame) -> pd.DataFrame:
        if s.empty:
            c["maybe_seen"] = False
            return c
        k = CuckooKernel.from_bytes(s["table"].iloc[0], s["stash"].iloc[0])
        h = c["__h"].to_numpy(dtype=np.int64).astype(np.uint64)
        c["maybe_seen"] = k.contains_batch(h)
        return c

    return (
        cand.groupBy("__shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(probe, out_schema)
        .drop("__h", "__shard")
    )


def delete_keys(
    shards: DataFrame, deletions: DataFrame, key_col: str, num_shards: int = 32
) -> DataFrame:
    """Un-see keys: cogroup each shard's deletions with its table row
    and remove one fingerprint copy per key — the operation a bloom
    filter cannot do. Returns the updated shard table DataFrame."""
    dels = deletions.select(_hash_col(key_col).alias("h")).withColumn(
        "shard", _shard_col(F.col("h"), num_shards)
    )

    def apply_del(s: pd.DataFrame, d: pd.DataFrame) -> pd.DataFrame:
        if s.empty:
            return pd.DataFrame(columns=[f.name for f in SHARD_SCHEMA.fields])
        if d.empty:
            return s
        k = CuckooKernel.from_bytes(s["table"].iloc[0], s["stash"].iloc[0])
        removed = k.delete_batch(d["h"].to_numpy(dtype=np.int64).astype(np.uint64))
        tb, sb = k.to_bytes()
        return pd.DataFrame(
            {
                "shard": [int(s["shard"].iloc[0])],
                "table": [tb],
                "stash": [sb],
                "n_keys": [int(s["n_keys"].iloc[0]) - removed],
                "n_stashed": [len(k.stash)],
            }
        )

    return (
        shards.groupBy("shard")
        .cogroup(dels.groupBy("shard"))
        .applyInPandas(apply_del, SHARD_SCHEMA)
    )


def seen_anti_join_cuckoo(
    candidates: DataFrame, seen: DataFrame, key_col: str, num_shards: int = 32
) -> DataFrame:
    """Exact new-keys anti-join with a cuckoo prefilter: definitely-new
    candidates (filter says no) skip the confirm shuffle; maybe-seen
    survivors are confirmed by the exact anti-join. Same exactness
    contract as `bloom.seen_anti_join` — identical answers, plus
    deletability of the underlying filter."""
    shards = build_cuckoo_shards(seen, key_col, num_shards)
    probed = probe_cogrouped(candidates, shards, key_col, num_shards)
    fast_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
    confirm = probed.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = confirm.join(
        seen.select(F.col(key_col).alias("__k")).distinct(),
        confirm[key_col] == F.col("__k"),
        "left_anti",
    )
    return fast_new.unionByName(confirmed_new)
