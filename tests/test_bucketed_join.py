"""Plan-level proof for sources/bucketed.py: a url_seen-shaped state
table written bucketed joins WITHOUT a state-side Exchange (only the
candidate side shuffles), while the plain-parquet twin shuffles both
sides — and both give identical anti-join answers. Also covers the
restart path (re-registration from the sidecar spec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sandcrawler_spark.sources.bucketed import (
    read_bucketed,
    register_bucketed,
    write_bucketed,
)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


@pytest.fixture()
def state_dirs(spark, tmp_path):
    seen = spark.range(0, 20000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 500).cast("string"),
                 F.lit(".org/p"), F.col("id").cast("string")).alias("canonical_url"),
        F.lit("pdf").alias("ingest_type"),
    )
    plain = str(tmp_path / "seen_plain")
    seen.write.mode("overwrite").parquet(plain)
    bucketed = str(tmp_path / "seen_bucketed")
    write_bucketed(seen, bucketed, "t_seen_bucketed", ["canonical_url"], n_buckets=8)
    return plain, bucketed


def _candidates(spark):
    # half overlap with seen ids, half novel
    return spark.range(10000, 30000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 500).cast("string"),
                 F.lit(".org/p"), F.col("id").cast("string")).alias("canonical_url"),
    )


def test_bucketed_join_elides_state_shuffle(spark, state_dirs):
    plain_path, bucketed_path = state_dirs
    cand = _candidates(spark)
    # disable AQE coalescing/broadcast so the Exchange count is stable
    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in with_conf}
    for k, v in with_conf:
        spark.conf.set(k, v)
    try:
        plain = spark.read.parquet(plain_path)
        j_plain = cand.join(plain, "canonical_url", "left_anti")
        seen_b = read_bucketed(spark, bucketed_path)
        j_bucket = cand.join(seen_b, "canonical_url", "left_anti")
        n_plain, n_bucket = _exchanges(j_plain), _exchanges(j_bucket)
        # plain: both sides shuffle; bucketed: ONLY the candidate side
        assert n_plain == 2, f"expected 2 exchanges in plain plan, got {n_plain}"
        assert n_bucket == 1, f"expected 1 exchange in bucketed plan, got {n_bucket}"
        a = sorted(r.canonical_url for r in j_plain.collect())
        b = sorted(r.canonical_url for r in j_bucket.collect())
        assert a == b and len(a) == 10000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_reregistration_survives_catalog_loss(spark, state_dirs):
    _, bucketed_path = state_dirs
    # simulate restart: drop the catalog entry, re-register from the
    # sidecar spec, and confirm the bucket spec still takes effect
    spark.sql("DROP TABLE IF EXISTS t_seen_bucketed")
    name = register_bucketed(spark, bucketed_path)
    assert name == "t_seen_bucketed"
    # idempotent second call
    assert register_bucketed(spark, bucketed_path) == name
    df = spark.table(name)
    assert df.count() == 20000
    desc = spark.sql(f"DESCRIBE EXTENDED {name}").collect()
    txt = "\n".join(str(r) for r in desc)
    assert "8" in txt and "canonical_url" in txt
