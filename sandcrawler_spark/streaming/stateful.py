"""Custom stateful streaming operator: continuous URL-seen dedup.

The streaming twin of the frontier's anti-join: a stream of ingest
requests is deduplicated against state that LIVES IN THE STREAM ENGINE
(per-key group state, checkpointed), emitting only first-seen requests
— the reference's `check_existing_ingest` short-circuit
(ingest_file.py:231-248) as an ``applyInPandasWithState`` operator.

State is keyed by (ingest_type, canonical_url); the checkpoint makes
the seen-set survive restarts, so at-least-once upstream delivery still
yields exactly-one emission per key (the Kafka-consumer + Postgres-PK
behavior of the reference's worker loop).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("ingest_type", T.StringType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("n_duplicates", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    already = state.exists and state.get[0]
    total = 0
    first_seq = None
    for pdf in pdfs:
        total += len(pdf)
        mn = int(pdf["seq"].min())
        first_seq = mn if first_seq is None else min(first_seq, mn)
    if already:
        return iter(())  # duplicates of an established key: emit nothing
    state.update((True,))
    yield pd.DataFrame(
        {
            "ingest_type": [key[0]],
            "canonical_url": [key[1]],
            "first_seq": [first_seq],
            "n_duplicates": [total - 1],
        }
    )


def url_seen_dedup_stream(requests: DataFrame) -> DataFrame:
    """requests stream (ingest_type, canonical_url, seq) → first-seen rows."""
    return requests.groupBy("ingest_type", "canonical_url").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("seq", T.LongType()),
    ]
)
RATE_STATE_SCHEMA = T.StructType([T.StructField("tokens", T.LongType())])


def _make_rate_fn(refill: int, cap_mult: int):
    cap = cap_mult * refill

    def _rate_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # refill at the start of each batch the host appears in (the
        # state fn is only invoked for keys with traffic, so the bucket
        # clock ticks on ACTIVE batches); unconsumed tokens carry over
        # up to the burst capacity, and a never-seen host starts full
        tokens = min(cap, (state.get[0] if state.exists else cap - refill) + refill)
        take = min(tokens, len(pdf))
        state.update((tokens - take,))
        if take == 0:
            return iter(())
        adm = pdf.sort_values(["priority", "seq"], kind="mergesort").head(take)
        yield adm[["host", "canonical_url", "priority", "seq"]]

    return _rate_fn


def rate_limit_stream(
    requests: DataFrame, refill_per_batch: int = 3, cap_mult: int = 2
) -> DataFrame:
    """§2.9 backpressure as a custom stateful operator: per-host
    token-bucket admission over a request stream — the streaming twin
    of the batch crawl's ``token_bucket=True`` politeness (reference:
    per-host SPN slot gate ia.py:1071-1084 + backoff pause
    workers.py:569-591). At each micro-batch in which a host has
    traffic its bucket refills by ``refill_per_batch`` tokens up to
    ``cap_mult×refill`` (unconsumed tokens carry over, so a lightly
    loaded host banks burst capacity; a never-seen host starts full);
    the highest-priority rows (total order: priority, seq) are admitted
    up to the available tokens, the rest are SHED (the reference
    re-enqueues; a caller can recover the complement by anti-joining
    admissions back against the input). Token state is checkpointed
    group state, so rate limits survive restarts."""
    return requests.groupBy("host").applyInPandasWithState(
        _make_rate_fn(refill_per_batch, cap_mult),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
