"""Sharded, incrementally-built bloom prefilter for the URL-seen
anti-join (north_rule; SURVEY §7.0).

Exactness contract: the bloom is ONLY a prefilter. Candidates that are
*definitely unseen* (bloom says no) bypass the anti-join shuffle
entirely; *maybe-seen* candidates are confirmed by the exact anti-join
on the full canonical string. False positives therefore cost extra
confirm-join work, never correctness (SURVEY §7.3 #4).

Layout (the design that survives 10^10 seen URLs):

- The key space is hash-partitioned into ``num_shards`` shards by
  ``pmod(xxhash64(url), B)``; each shard owns an independent bitmap of
  ``m_bits // B`` bits. k=7 probe positions are double-hashed from the
  single 64-bit key hash (h1 + i·h2 — Kirsch-Mitzenmacher), offset into
  the shard's bit range, so membership tests vectorize to pure numpy
  over Arrow batches.
- The build is INCREMENTAL: each scheduling round ORs in only that
  round's url_seen DELTA. The update job groups delta hashes by shard
  (`groupBy(shard).applyInPandas`) so every shard bitmap is built by
  one parallel task from only its rows — there is no monolithic
  full-history rescan and no driver-side OR over per-partition
  full-size bitmaps (the round-1 design rebuilt the whole bloom from
  the entire accumulated seen set every round: O(total²) cumulative).
- :class:`BloomStore` persists the bitmap + metadata per committed
  round next to the snapshot manifest, so resumed crawls reload it
  instead of rebuilding; a missing/stale file falls back to one
  distributed rebuild from the url_seen table.
- Capacity: ``m = 16n`` bits for the EXPECTED key count with headroom;
  when the live count outgrows it (fpr would degrade), the store
  schedules a full distributed rebuild at double capacity — amortized
  O(log n) rebuilds over the crawl's lifetime.

At sandbox scale the probe side broadcasts the (few-MB) bitmap. At the
12-GiB design point the same shard layout co-partitions candidates with
shard bitmaps instead (`probe_cogrouped`) — each executor then holds
only the blooms for its hash ranges, and NOTHING is driver-resident.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_K = 7  # probes; with m = 16n bits → fpr ≈ 0.6%
DEFAULT_SHARDS = 32


def _next_pow2(x: int) -> int:
    return 1 << max(10, (x - 1).bit_length())


def _probe_positions(h: np.ndarray, mask: int) -> list[np.ndarray]:
    h1 = h & mask
    h2 = ((h >> 33) | 1) & mask
    return [(h1 + i * h2) & mask for i in range(_K)]


def _shard_of(h: np.ndarray, num_shards: int) -> np.ndarray:
    # pmod semantics (Spark's pmod(xxhash64, B)): non-negative remainder
    return (h.astype(np.int64) % num_shards + num_shards) % num_shards


class BloomStore:
    """Persistent sharded bloom over int64 key hashes.

    The in-memory form is one concatenated uint8 array; shard ``s``
    owns bytes ``[s*m_shard/8, (s+1)*m_shard/8)``. Probe positions are
    local to the shard's bit range.
    """

    def __init__(self, root: str, num_shards: int = DEFAULT_SHARDS) -> None:
        self.root = root
        self.num_shards = num_shards
        self.m_shard_bits = 0  # bits per shard (pow2)
        self.n_keys = 0
        self.round_id = -1
        self.bits: np.ndarray | None = None
        os.makedirs(root, exist_ok=True)
        self._load()

    # ------------------------------------------------------------ persistence
    def _meta_path(self) -> str:
        return os.path.join(self.root, "bloom_meta.json")

    def _bits_path(self) -> str:
        return os.path.join(self.root, "bloom_bits.npy")

    def _load(self) -> None:
        if not os.path.exists(self._meta_path()):
            return
        with open(self._meta_path()) as f:
            meta = json.load(f)
        self.num_shards = meta["num_shards"]
        self.m_shard_bits = meta["m_shard_bits"]
        self.n_keys = meta["n_keys"]
        self.round_id = meta["round_id"]
        if os.path.exists(self._bits_path()):
            self.bits = np.load(self._bits_path())

    def _save(self) -> None:
        # bits first, then metadata via atomic rename: a crash between the
        # two leaves the previous consistent (meta, bits) pair readable
        np.save(self._bits_path(), self.bits)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "num_shards": self.num_shards,
                    "m_shard_bits": self.m_shard_bits,
                    "n_keys": self.n_keys,
                    "round_id": self.round_id,
                },
                f,
            )
        os.replace(tmp, self._meta_path())

    # ------------------------------------------------------------ state
    def ready_for(self, round_id: int) -> bool:
        """True iff the bloom reflects all rounds < ``round_id``."""
        return self.bits is not None and self.round_id == round_id - 1

    def _alloc(self, expected_keys: int) -> None:
        m_total = _next_pow2(16 * max(expected_keys, 1024))
        self.m_shard_bits = max(1024, m_total // self.num_shards)
        self.bits = np.zeros(self.num_shards * self.m_shard_bits // 8, dtype=np.uint8)

    def _shard_delta_df(self, hashes: DataFrame) -> DataFrame:
        """Distributed per-shard bitmap build over an int64 ``h`` column:
        one parallel task per shard, each emitting its own (small)
        bitmap — collected rows are ready-made per-shard results, never
        OR-reduced driver-side across partitions."""
        mask = self.m_shard_bits - 1
        n_bytes = self.m_shard_bits // 8
        B = self.num_shards

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bm = np.zeros(n_bytes, dtype=np.uint8)
            h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            for pos in _probe_positions(h, mask):
                np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "bm": [bm.tobytes()]})

        tagged = hashes.withColumn("shard", F.pmod(F.col("h"), F.lit(B)))
        return tagged.groupBy("shard").applyInPandas(build, schema="shard int, bm binary")

    def update(self, delta_hashes: DataFrame, n_delta: int, round_id: int) -> None:
        """OR this round's url_seen delta into the bloom (O(delta) work).

        ``delta_hashes``: DataFrame with int64 column ``h``. Triggers a
        capacity rebuild REQUEST instead of updating when the key count
        outgrows m/16 — caller then invokes :meth:`rebuild`."""
        if self.bits is None:
            self._alloc(max(8 * n_delta, 1 << 16))
        rows = self._shard_delta_df(delta_hashes).collect()
        n_bytes = self.m_shard_bits // 8
        for r in rows:
            s = r["shard"]
            self.bits[s * n_bytes : (s + 1) * n_bytes] |= np.frombuffer(
                r["bm"], dtype=np.uint8
            )
        self.n_keys += n_delta
        self.round_id = round_id
        self._save()

    def needs_rebuild(self) -> bool:
        return (
            self.bits is not None
            and 16 * self.n_keys > self.num_shards * self.m_shard_bits * 2
        )

    def rebuild(self, url_seen_hashes: DataFrame, n_keys: int, round_id: int) -> None:
        """Full distributed rebuild (capacity growth or resume without a
        persisted bloom). Amortized: capacity doubles each time, so over
        a crawl's lifetime total rebuild work is O(final size)."""
        self._alloc(2 * max(n_keys, 1))
        self.n_keys = 0
        rows = self._shard_delta_df(url_seen_hashes).collect()
        n_bytes = self.m_shard_bits // 8
        for r in rows:
            s = r["shard"]
            self.bits[s * n_bytes : (s + 1) * n_bytes] |= np.frombuffer(
                r["bm"], dtype=np.uint8
            )
        self.n_keys = n_keys
        self.round_id = round_id
        self._save()

    # ------------------------------------------------------------ probe
    def might_contain_udf(self, spark):
        """Vectorized membership probe over an int64 hash column
        (broadcast mode — bitmap is a few MB at sandbox scale)."""
        bc = spark.sparkContext.broadcast(self.bits.tobytes())
        mask = self.m_shard_bits - 1
        n_bytes = self.m_shard_bits // 8
        B = self.num_shards

        @F.pandas_udf(T.BooleanType())
        def might_contain(h: pd.Series) -> pd.Series:
            bm = np.frombuffer(bc.value, dtype=np.uint8)
            hv = h.to_numpy(dtype=np.int64).astype(np.uint64)
            base = _shard_of(hv, B).astype(np.uint64) * n_bytes
            out = np.ones(len(hv), dtype=bool)
            for pos in _probe_positions(hv, mask):
                idx = base + (pos >> 3)
                out &= (bm[idx] & (1 << (pos & 7)).astype(np.uint8)) != 0
            return pd.Series(out)

        return might_contain

    def probe_cogrouped(self, candidates: DataFrame, hash_col: str) -> DataFrame:
        """12-GiB-bloom probe path: co-partition candidates with shard
        bitmaps on the shard key so each task holds ONE shard's bitmap —
        nothing driver-resident or broadcast. Returns candidates with a
        ``__maybe`` boolean appended. Same answers as the broadcast
        probe (property-tested); used when the bloom outgrows broadcast."""
        spark = candidates.sparkSession
        mask = self.m_shard_bits - 1
        n_bytes = self.m_shard_bits // 8
        shard_rows = [
            (s, self.bits[s * n_bytes : (s + 1) * n_bytes].tobytes())
            for s in range(self.num_shards)
        ]
        shards_df = spark.createDataFrame(shard_rows, "shard int, bm binary")
        tagged = candidates.withColumn(
            "__h", F.xxhash64(hash_col)
        ).withColumn("shard", F.pmod(F.col("__h"), F.lit(self.num_shards)))
        out_schema = T.StructType(
            [f for f in tagged.schema.fields if f.name != "shard"]
            + [T.StructField("__maybe", T.BooleanType())]
        )
        cols = [f.name for f in tagged.schema.fields if f.name != "shard"]

        def probe(cand: pd.DataFrame, bm_rows: pd.DataFrame) -> pd.DataFrame:
            if cand.empty:
                return pd.DataFrame(columns=cols + ["__maybe"])
            if bm_rows.empty:
                cand = cand[cols]
                cand["__maybe"] = False
                return cand
            bm = np.frombuffer(bytes(bm_rows["bm"].iloc[0]), dtype=np.uint8)
            hv = cand["__h"].to_numpy(dtype=np.int64).astype(np.uint64)
            out = np.ones(len(hv), dtype=bool)
            for pos in _probe_positions(hv, mask):
                out &= (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            cand = cand[cols]
            cand["__maybe"] = out
            return cand

        return (
            tagged.groupBy("shard")
            .cogroup(shards_df.groupBy("shard"))
            .applyInPandas(probe, schema=out_schema)
            .drop("__h")
        )


# --------------------------------------------------------------- legacy API


def build_bloom(seen: DataFrame, key_col: str, n_keys: int | None = None) -> tuple[bytes, int]:
    """One-shot (unsharded) bloom build — kept for standalone anti-join
    use outside a crawl loop; the crawl driver itself maintains a
    :class:`BloomStore` incrementally."""
    n = n_keys if n_keys is not None else seen.count()
    m_bits = _next_pow2(max(1024, 16 * max(n, 1)))
    mask = m_bits - 1
    n_bytes = m_bits // 8

    hashes = seen.select(F.xxhash64(key_col).alias("h"))

    def part_bloom(it):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in it:
            h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            for pos in _probe_positions(h, mask):
                np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        yield pd.DataFrame({"bloom": [bm.tobytes()]})

    parts = hashes.mapInPandas(part_bloom, schema="bloom binary").collect()
    acc = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return acc.tobytes(), mask


def bloom_might_contain_udf(spark, bloom_bytes: bytes, mask: int):
    """Vectorized membership probe over an int64 hash column."""
    bc = spark.sparkContext.broadcast(bloom_bytes)

    @F.pandas_udf(T.BooleanType())
    def might_contain(h: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        hv = h.to_numpy(dtype=np.int64).astype(np.uint64)
        out = np.ones(len(hv), dtype=bool)
        for pos in _probe_positions(hv, mask):
            out &= (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return pd.Series(out)

    return might_contain


def seen_anti_join(
    candidates: DataFrame,
    url_seen: DataFrame,
    keys: list[str],
    hash_key: str,
    use_bloom: bool = True,
    n_keys: int | None = None,
    scratch: list | None = None,
    probe_udf=None,
) -> DataFrame:
    """candidates ∖ url_seen on ``keys`` (J3 left_anti), with the bloom
    short-circuit for definitely-new rows.

    ``probe_udf``: a prebuilt membership probe (from
    :meth:`BloomStore.might_contain_udf`) — the crawl driver passes its
    incrementally-maintained bloom so no per-round rebuild happens
    here. Without one, falls back to a one-shot build (standalone use).
    """
    seen_keys = url_seen.select(*[F.col(k).alias(f"__s_{k}") for k in keys])
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"__s_{k}")
        cond = c if cond is None else (cond & c)

    if not use_bloom:
        return candidates.join(seen_keys, cond, "left_anti")

    if probe_udf is None:
        bloom_bytes, mask = build_bloom(url_seen, hash_key, n_keys=n_keys)
        probe_udf = bloom_might_contain_udf(candidates.sparkSession, bloom_bytes, mask)
    tagged = candidates.withColumn("__maybe", probe_udf(F.xxhash64(hash_key)))
    tagged = tagged.persist()  # reused for both branches (columnar cache)
    if scratch is not None:
        scratch.append(tagged)
    definitely_new = tagged.filter(~F.col("__maybe")).drop("__maybe")
    maybe = tagged.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = maybe.join(seen_keys, cond, "left_anti")
    return definitely_new.unionByName(confirmed_new)
