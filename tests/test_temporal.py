"""As-of join: union-window plan vs the skew-proof bucketed plan vs a
pandas ``merge_asof`` oracle. The operator's contract: inclusive match
at equal timestamps, per-key, every left row preserved, and the two
physical strategies are row-identical."""

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sandcrawler_spark.operators.temporal import asof_join, interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    # 3 hosts; right = robots snapshots, left = fetches. Includes: exact
    # timestamp tie (must match inclusively), a left row before any
    # right row (null match), a key with no right rows at all, and
    # gaps larger than the bucket width (carry must cross empty buckets).
    right_rows = [
        ("a", _ts(0), 1, "r-a0"),
        ("a", _ts(10), 2, "r-a10"),
        ("a", _ts(500), 3, "r-a500"),
        ("b", _ts(5), 4, "r-b5"),
    ]
    left_rows = [
        ("a", _ts(0), 100),    # tie with r-a0 -> inclusive match
        ("a", _ts(9), 101),    # -> r-a0
        ("a", _ts(10), 102),   # tie -> r-a10
        ("a", _ts(499), 103),  # carry across ~8 empty hour-buckets
        ("a", _ts(501), 104),  # -> r-a500
        ("b", _ts(4), 105),    # before any b snapshot -> null
        ("b", _ts(1000), 106), # -> r-b5, long carry
        ("c", _ts(50), 107),   # no right rows for c -> null
    ]
    right = spark.createDataFrame(
        right_rows, "host string, ts timestamp, snap_id long, body string"
    )
    left = spark.createDataFrame(
        left_rows, "host string, ts timestamp, fetch_id long"
    )
    return left, right


def _expected(left_rows, right_rows):
    lpdf = pd.DataFrame(left_rows, columns=["host", "ts", "fetch_id"])
    rpdf = pd.DataFrame(right_rows, columns=["host", "ts", "snap_id", "body"])
    out = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts").rename(
            columns={"snap_id": "snap_id_right", "body": "body_right"}
        ),
        on="ts", by="host", direction="backward",
    )
    return {
        int(r.fetch_id): (
            None if pd.isna(r.snap_id_right) else int(r.snap_id_right),
            None if pd.isna(r.body_right) else r.body_right,
        )
        for r in out.itertuples()
    }


def _got(df):
    return {
        r["fetch_id"]: (r["snap_id_right"], r["body_right"])
        for r in df.collect()
    }


def test_asof_backward_matches_pandas(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="host", left_time="ts",
        right_cols=["snap_id", "body"],
    )
    assert out.count() == left.count()  # every left row survives
    got = _got(out)
    right_rows = [tuple(r) for r in right.collect()]
    left_rows = [tuple(r) for r in left.collect()]
    assert got == _expected(left_rows, right_rows)
    # null-match rows are explicit
    assert got[105] == (None, None)
    assert got[107] == (None, None)
    assert got[100] == (1, "r-a0")  # inclusive tie


def test_asof_bucketed_equals_plain(spark, frames):
    left, right = frames
    plain = asof_join(
        left, right, on="host", left_time="ts",
        right_cols=["snap_id", "body"],
    )
    for width in (60, 3600, 86400 * 365):  # minute / hour / everything-in-one
        bucketed = asof_join(
            left, right, on="host", left_time="ts",
            right_cols=["snap_id", "body"], bucket_s=width,
        )
        assert _got(bucketed) == _got(plain), f"bucket_s={width}"


def test_asof_forward(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="host", left_time="ts",
        right_cols=["snap_id"], direction="forward",
    )
    got = {r["fetch_id"]: r["snap_id_right"] for r in out.collect()}
    # forward = earliest right at-or-after
    assert got[100] == 1      # tie is inclusive forward too
    assert got[101] == 2
    assert got[103] == 3
    assert got[104] is None   # nothing after minute 501
    assert got[105] == 4
    assert got[106] is None
    assert got[107] is None


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    """tolerance_s = max staleness: matches older than the window are
    nulled (the refetch signal), like pandas merge_asof(tolerance=...).
    Both physical paths agree with the pandas oracle."""
    left, right = frames
    tol = dt.timedelta(minutes=5)
    lpdf = pd.DataFrame(
        [tuple(r) for r in left.collect()], columns=["host", "ts", "fetch_id"]
    )
    rpdf = pd.DataFrame(
        [tuple(r) for r in right.collect()],
        columns=["host", "ts", "snap_id_right", "body"],
    )
    exp = pd.merge_asof(
        lpdf.sort_values("ts"), rpdf[["host", "ts", "snap_id_right"]].sort_values("ts"),
        on="ts", by="host", direction="backward", tolerance=tol,
    )
    expected = {
        int(r.fetch_id): None if pd.isna(r.snap_id_right) else int(r.snap_id_right)
        for r in exp.itertuples()
    }
    for kwargs in ({}, {"bucket_s": 3600}):
        out = asof_join(
            left, right, on="host", left_time="ts",
            right_cols=["snap_id"], tolerance_s=300.0, **kwargs,
        )
        got = {r["fetch_id"]: r["snap_id_right"] for r in out.collect()}
        assert got == expected, f"{kwargs}"
    # sanity on the interesting rows: 9-min-stale match nulled, tie kept
    assert expected[101] is None
    assert expected[100] == 1


def test_asof_nearest_matches_pandas(spark, frames):
    """direction='nearest' (one shuffle, dual windows) against the
    pandas merge_asof oracle, with and without tolerance."""
    left, right = frames
    lpdf = pd.DataFrame(
        [tuple(r) for r in left.collect()], columns=["host", "ts", "fetch_id"]
    )
    rpdf = pd.DataFrame(
        [tuple(r) for r in right.collect()],
        columns=["host", "ts", "snap_id_right", "body"],
    )
    for tol_s in (None, 300.0):
        tol = None if tol_s is None else dt.timedelta(seconds=tol_s)
        exp = pd.merge_asof(
            lpdf.sort_values("ts"),
            rpdf[["host", "ts", "snap_id_right"]].sort_values("ts"),
            on="ts", by="host", direction="nearest", tolerance=tol,
        )
        expected = {
            int(r.fetch_id):
                None if pd.isna(r.snap_id_right) else int(r.snap_id_right)
            for r in exp.itertuples()
        }
        out = asof_join(
            left, right, on="host", left_time="ts",
            right_cols=["snap_id"], direction="nearest", tolerance_s=tol_s,
        )
        got = {r["fetch_id"]: r["snap_id_right"] for r in out.collect()}
        assert got == expected, f"tolerance={tol_s}"
    # the interesting rows: 105 (4 min before first b snapshot) now
    # matches forward; 107 still has no candidates
    assert expected[105] == 4
    assert expected[107] is None


def test_asof_rejects_bad_args(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="host", left_time="ts", direction="sideways")
    with pytest.raises(ValueError):
        asof_join(
            left, right, on="host", left_time="ts",
            direction="forward", bucket_s=60,
        )


def test_asof_plan_has_no_range_join(spark, frames):
    """The whole point: an as-of join that is NOT a range-condition
    join. The plan must contain window exchanges but no cartesian /
    nested-loop join, and stay Python-free."""
    left, right = frames
    for kwargs in ({}, {"bucket_s": 3600}):
        out = asof_join(
            left, right, on="host", left_time="ts",
            right_cols=["snap_id"], **kwargs,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Window" in plan


# ---------------------------------------------------------------------------
# interval_join


def _iv_frames(spark):
    # intervals engineered to hit: containment, partial overlap, exact
    # endpoint touch (closed intervals -> match), disjoint, long interval
    # spanning many buckets (multi-bucket candidate pairs must dedupe to
    # one), and key isolation.
    left_rows = [
        ("a", 1, 0.0, 10.0),
        ("a", 2, 20.0, 22.0),
        ("a", 3, 0.0, 10_000.0),   # spans ~3 hour-buckets
        ("b", 4, 0.0, 10.0),
    ]
    right_rows = [
        ("a", 10, 5.0, 6.0),       # inside 1 and 3
        ("a", 11, 10.0, 15.0),     # touches 1 at 10.0 (closed), inside 3
        ("a", 12, 16.0, 19.0),     # only 3
        ("a", 13, 9_999.0, 12_000.0),  # tail of 3, crosses bucket edge
        ("a", 14, 30_000.0, 30_001.0),  # disjoint from all
        ("b", 15, 20.0, 21.0),     # key b, disjoint from 4
    ]
    left = spark.createDataFrame(
        left_rows, "k string, lid long, s double, e double"
    )
    right = spark.createDataFrame(
        right_rows, "k string, rid long, s double, e double"
    )
    return left, right, left_rows, right_rows


def test_interval_join_matches_bruteforce(spark):
    left, right, left_rows, right_rows = _iv_frames(spark)
    got = interval_join(
        left, right, on="k", left_span=("s", "e"), right_span=("s", "e"),
        bucket_s=3600.0,
    )
    rows = got.collect()
    pairs = {(r["lid"], r["rid_right"]) for r in rows}
    expected = {
        (lid, rid)
        for (lk, lid, ls, le) in left_rows
        for (rk, rid, rs, re_) in right_rows
        if lk == rk and ls <= re_ and rs <= le
    }
    assert pairs == expected
    # multi-bucket overlap (3, 13) appears exactly once — canonical
    # bucket, not a distinct pass, does the dedupe
    dup = [r for r in rows if (r["lid"], r["rid_right"]) == (3, 13)]
    assert len(dup) == 1


def test_interval_join_timestamps_and_plan(spark):
    # timestamp inputs compare at microsecond precision; equi-join plan
    left = spark.createDataFrame(
        [("a", 1, _ts(0), _ts(10))], "k string, lid long, s timestamp, e timestamp"
    )
    right = spark.createDataFrame(
        [("a", 2, _ts(10), _ts(11)), ("a", 3, _ts(10) + dt.timedelta(microseconds=1), _ts(11))],
        "k string, rid long, s timestamp, e timestamp",
    )
    out = interval_join(
        left, right, on="k", left_span=("s", "e"), right_span=("s", "e"),
        bucket_s=60.0,
    )
    assert {r["rid_right"] for r in out.collect()} == {2}  # closed end; +1us misses
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan
