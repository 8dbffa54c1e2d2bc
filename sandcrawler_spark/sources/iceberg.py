"""Iceberg table layer (production state store).

The frontier's state tables are designed for Apache Iceberg: MERGE INTO
upserts with the reference's per-table ON CONFLICT policies
(db.py:153-508), snapshot time-travel for exact resume, partition-level
file lineage. This environment has no Iceberg runtime jars, so
``plans/state.SnapshotStore`` provides the same contract over parquet +
an atomic manifest; this module carries the production path: catalog
detection and MERGE statement construction (unit-tested as SQL text;
executed only when a catalog is configured).

Table DDL sketch (spark.sql against an Iceberg catalog):

    CREATE TABLE cat.crawl.url_seen (
        ingest_type string, canonical_url string, url_hash bigint,
        hit boolean, status string, terminal_url string,
        terminal_dt string, terminal_status_code int,
        terminal_sha1hex string, round_id int)
    USING iceberg
    PARTITIONED BY (bucket(1024, url_hash))   -- salted host-hash layout

Bucketing on the 64-bit URL hash co-locates the per-round anti-join and
the MERGE scan with the candidates' partitioning (north_rule's salted
partitions); Iceberg's bloom-filter write option
(`write.parquet.bloom-filter-enabled.column.url_hash`) gives file-level
skipping under the same exactness contract as operators/bloom.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def have_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.catalog.Catalog  # noqa: B018
        return True
    except Exception:  # noqa: BLE001
        return False


def merge_sql(
    target: str,
    source_view: str,
    keys: list[str],
    update_cols: list[str] | None,
    insert_cols: list[str],
) -> str:
    """MERGE INTO statement for the reference's two upsert policies:

    - ``update_cols=None`` → ON CONFLICT DO NOTHING (file_meta/requests,
      db.py:204-207): WHEN NOT MATCHED THEN INSERT only.
    - ``update_cols=[...]`` → ON CONFLICT DO UPDATE (results,
      db.py:474-485): WHEN MATCHED THEN UPDATE SET ... + INSERT.
    """
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    stmt = f"MERGE INTO {target} t USING {source_view} s ON {on}"
    if update_cols:
        sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
        stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
    cols = ", ".join(insert_cols)
    vals = ", ".join(f"s.{c}" for c in insert_cols)
    stmt += f" WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    return stmt


def merge_upsert(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    keys: list[str],
    update_cols: list[str] | None = None,
) -> None:
    """Execute a policy-correct MERGE when an Iceberg catalog is present."""
    if not have_iceberg(spark):
        raise RuntimeError(
            "no Iceberg runtime on classpath — use plans.state.SnapshotStore "
            "(same semantics over parquet snapshots)"
        )
    view = "__merge_src"
    df.createOrReplaceTempView(view)
    spark.sql(merge_sql(target, view, keys, update_cols, df.columns))
