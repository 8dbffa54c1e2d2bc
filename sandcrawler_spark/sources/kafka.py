"""Kafka source/sink wiring (S3/S4), gated on the Kafka connector jars.

Reference: KafkaJsonPusher (workers.py:500-605) consumes the three
priority request topics with manual offset-store-after-process
(at-least-once); KafkaSink/KafkaCompressSink (workers.py:265-349)
produce results keyed by sha1hex with acks=all.

Spark mapping: Structured Streaming ``format("kafka")``; offset
semantics become checkpointing, and the idempotent table MERGE
downstream upgrades at-least-once to effectively-once. The
spark-sql-kafka connector jars are not in this environment, so these
builders raise a clear error instead of failing deep inside the plan;
the streaming logic that would consume them is exercised against file
sources in streaming/rounds.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_kafka(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: B018
        return True
    except Exception:  # noqa: BLE001
        return False


def read_kafka_requests(
    spark: SparkSession,
    brokers: str,
    topics: str = "ingest-file-requests-priority,ingest-file-requests-daily,ingest-file-requests-bulk",
    max_offsets_per_trigger: int = 10000,
) -> DataFrame:
    """S3: the three priority tiers as one stream with a priority column
    derived from the topic name (kafka/topics.md:28-43)."""
    if not _has_kafka(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on classpath; add "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .load()
    )
    priority = (
        F.when(F.col("topic").contains("priority"), 0)
        .when(F.col("topic").contains("daily"), 1)
        .otherwise(2)
    )
    return raw.select(
        F.col("value").cast("string").alias("json"),
        priority.alias("priority"),
        "timestamp",
    )


def write_kafka_results(
    df: DataFrame, brokers: str, topic: str, checkpoint: str, key_col: str = "sha1hex"
):
    """S4: produce JSON results keyed by content sha1 (workers.py:265-349)."""
    if not _has_kafka(df.sparkSession):
        raise RuntimeError("spark-sql-kafka connector not on classpath")
    payload = df.select(
        F.col(key_col).alias("key"),
        F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
