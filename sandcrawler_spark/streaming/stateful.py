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
