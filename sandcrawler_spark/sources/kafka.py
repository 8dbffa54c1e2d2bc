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


def topic_priority_col(topic=F.col("topic")):
    """Topic name → priority tier (kafka/topics.md:28-43): the three
    request topics rank priority < daily < bulk. Pure column expression
    so the mapping is testable without the connector jars."""
    return (
        F.when(topic.contains("priority"), 0)
        .when(topic.contains("daily"), 1)
        .otherwise(2)
    )


def keyed_json_payload(df: DataFrame, key_col: str = "sha1hex") -> DataFrame:
    """Result rows → (key, value) Kafka records: key = content sha1,
    value = the full row as JSON (workers.py:265-349 KafkaSink shape).
    Pure projection, shared by the gated streaming sink and tests."""
    return df.select(
        F.col(key_col).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )


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
    return raw.select(
        F.col("value").cast("string").alias("json"),
        topic_priority_col().alias("priority"),
        "timestamp",
    )


def write_kafka_results(
    df: DataFrame, brokers: str, topic: str, checkpoint: str, key_col: str = "sha1hex"
):
    """S4: produce JSON results keyed by content sha1 (workers.py:265-349)."""
    if not _has_kafka(df.sparkSession):
        raise RuntimeError("spark-sql-kafka connector not on classpath")
    payload = keyed_json_payload(df, key_col)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
