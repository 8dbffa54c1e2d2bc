"""Bucketed state tables — co-located joins for the accumulated
url_seen set.

Why: every scheduling round anti-joins the (bloom-surviving) candidates
against the accumulated url_seen keys (``plans/frontier.py::
_new_candidates`` → ``bloom.seen_anti_join``'s exact confirm). Both
sides of that equi-join shuffle on the key each round; at the 10^10
design point the STATE side dwarfs the candidate side, and its shuffle
is pure waste — the table's partitioning never changes between rounds.
Writing the compacted url_seen bucketed by the join key removes the
state-side Exchange entirely: Catalyst sees the table's bucket spec,
shuffles ONLY the (small) candidate side into the matching
partitioning, and sort-merge-joins in place. This is the
``repartition/bucketing for co-located joins`` half of the north
rule's explicit-partitioning requirement; the Iceberg production
analogue is a ``bucket(N, key)`` partition transform on the url_seen
table, which Spark's Iceberg source exploits the same way (storage-
partitioned joins).

Mechanics in this sandbox: Spark only honors bucketing metadata through
the session catalog (``saveAsTable`` + ``bucketBy``), never through a
plain ``read.parquet``. The catalog here is session-scoped (in-memory
derby), so :func:`register_bucketed` re-attaches an on-disk bucketed
table after a restart — resume-safe: the files carry the bucket spec in
their layout, the catalog entry is recreated idempotently from the spec
JSON written next to them.

``tests/test_bucketed_join.py`` proves the plan shape: with the state
side bucketed, the join's physical plan has exactly ONE Exchange (the
candidate side) vs two in the plain-parquet twin, and both produce
identical anti-join answers.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _spec_path(path: str) -> str:
    return os.path.join(path, "_bucket_spec.json")


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    key_cols: list[str],
    n_buckets: int = 64,
) -> None:
    """Write ``df`` as an external bucketed table at ``path``: bucketed
    AND sorted by ``key_cols`` so the in-place side of a sort-merge
    join skips its sort too. Overwrites both files and catalog entry;
    writes the bucket spec next to the data for re-registration."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", os.path.abspath(path))
        .bucketBy(n_buckets, *key_cols)
        .sortBy(*key_cols)
        .format("parquet")
        .saveAsTable(table)
    )
    with open(_spec_path(path), "w") as f:
        json.dump({"table": table, "key_cols": key_cols, "n_buckets": n_buckets}, f)


def register_bucketed(spark: SparkSession, path: str, table: str | None = None) -> str:
    """Re-attach a bucketed table written by :func:`write_bucketed`
    into THIS session's catalog (idempotent; needed after restart
    because the local catalog is session-scoped). Returns the table
    name. Schema is inferred from the parquet files; the bucket spec
    comes from the sidecar JSON."""
    with open(_spec_path(path)) as f:
        spec = json.load(f)
    name = table or spec["table"]
    if spark.catalog.tableExists(name):
        return name
    schema = spark.read.parquet(os.path.abspath(path)).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    keys = ", ".join(spec["key_cols"])
    spark.sql(
        f"CREATE TABLE {name} ({cols}) USING parquet "
        f"OPTIONS (path '{os.path.abspath(path)}') "
        f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
        f"INTO {spec['n_buckets']} BUCKETS"
    )
    return name


def read_bucketed(spark: SparkSession, path: str, table: str | None = None) -> DataFrame:
    """Catalog-backed read that PRESERVES the bucket spec (a plain
    ``read.parquet`` of the same files would not)."""
    return spark.table(register_bucketed(spark, path, table))
