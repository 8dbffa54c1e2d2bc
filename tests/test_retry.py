"""Transient-failure retry with exponential backoff (run_crawl
max_retries>0): a fetch whose best capture is a 429/5xx re-enters the
frontier with attempt+1 and a not_before round gate instead of writing a
terminal url_seen row; exhausted retries record the reference's
"remote-server-error" slug. Engine vs oracle parity + exact resume
through a backoff window, plus default-off byte-compatibility."""

from __future__ import annotations

import pytest

from sandcrawler_spark.plans import schemas as S
from sandcrawler_spark.plans.datagen import gen_frontier
from sandcrawler_spark.plans.frontier import run_crawl
from sandcrawler_spark.plans.oracle import run_oracle

MAX_RETRIES = 2
ROUNDS = 8


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("retry_data"))
    # datagen emits 503 captures (~1/7 of capture rows); URLs whose BEST
    # capture is a 503 exercise the transient path
    gen_frontier(d, n_urls=800, n_hosts=25, n_seeds=200, seed=11)
    return d


def _orders(store):
    out = []
    for r in store.committed_rounds:
        rows = store.read_round_table(r, "fetch_order").orderBy("rank").collect()
        out.append([row["canonical_url"] for row in rows])
    return out


def _seen(store):
    return {
        (r["ingest_type"], r["canonical_url"]): (
            r["hit"], r["status"], r["terminal_url"], r["terminal_dt"],
            r["terminal_status_code"], r["terminal_sha1hex"], r["round_id"],
        )
        for r in store.read_table("url_seen").collect()
    }


@pytest.fixture(scope="module")
def engine(spark, fixture_dir, tmp_path_factory):
    return run_crawl(
        spark, fixture_dir, str(tmp_path_factory.mktemp("retry_state")),
        max_rounds=ROUNDS, max_retries=MAX_RETRIES,
    )


@pytest.fixture(scope="module")
def oracle(fixture_dir):
    return run_oracle(fixture_dir, max_rounds=ROUNDS, max_retries=MAX_RETRIES)


def test_retry_matches_oracle(engine, oracle):
    got_orders = _orders(engine)
    assert len(got_orders) == len(oracle.fetch_orders)
    for r, (got, want) in enumerate(zip(got_orders, oracle.fetch_orders)):
        assert got == want, f"fetch order diverged in round {r}"

    want_seen = {
        k: (
            v["hit"], v["status"], v["terminal_url"], v["terminal_dt"],
            v["terminal_status_code"], v["terminal_sha1hex"], v["round_id"],
        )
        for k, v in oracle.url_seen.items()
    }
    assert _seen(engine) == want_seen

    sc = engine.counters()
    for r, want in enumerate(oracle.counters):
        got = sc[str(r)]
        for key in set(want) | {"scheduled", "retried"}:
            if key.startswith("status:") or key in ("scheduled", "retried"):
                assert got.get(key, 0) == want.get(key, 0), (r, key)


def _schedule_rounds(store):
    """(ingest_type, canonical_url) -> sorted list of rounds scheduled."""
    sched: dict = {}
    for r in store.committed_rounds:
        for row in store.read_round_table(r, "fetch_order").collect():
            sched.setdefault(
                (row["ingest_type"], row["canonical_url"]), []
            ).append(r)
    return sched


def test_retry_actually_exercised(engine, oracle):
    """Guard the fixture: the transient path must fire, produce repeat
    schedules of the same key, and end in remote-server-error rows."""
    sc = engine.counters()
    assert sum(sc[r].get("retried", 0) for r in sc) > 0
    exhausted = [
        k for k, v in oracle.url_seen.items() if v["status"] == S.STATUS_TRANSIENT
    ]
    assert exhausted
    sched = _schedule_rounds(engine)
    for k in exhausted:
        tries = sched[k]
        # exhausted ⇒ tried exactly max_retries+1 times (attempts 0..2);
        # backoff sets a MINIMUM gap (politeness contention can delay
        # a retry past its not_before round, never before it)
        assert len(tries) == MAX_RETRIES + 1, (k, tries)
        assert tries[1] - tries[0] >= 1 and tries[2] - tries[1] >= 2, (k, tries)
    # at least one uncontended chain shows the exact 2^0, 2^1 gaps
    assert any(
        sched[k][1] - sched[k][0] == 1 and sched[k][2] - sched[k][1] == 2
        for k in exhausted
    )


def test_retry_no_seen_row_until_exhausted(engine, oracle):
    """Mid-backoff rounds leave NO url_seen record for the retried key;
    the single record that exists carries the final try's round id."""
    exhausted = [
        k for k, v in oracle.url_seen.items() if v["status"] == S.STATUS_TRANSIENT
    ]
    seen = _seen(engine)
    sched = _schedule_rounds(engine)
    for k in exhausted:
        assert seen[k][6] == sched[k][-1]  # round_id of the terminal write


def test_resume_through_backoff_window(spark, fixture_dir, tmp_path, engine):
    """Kill/resume mid-backoff: pending not_before state lives in the
    committed frontier_add + counters, so resume reproduces the one-shot
    crawl exactly (north_rule checkpoint requirement)."""
    part = run_crawl(
        spark, fixture_dir, str(tmp_path / "p"), max_rounds=2,
        max_retries=MAX_RETRIES,
    )
    part = run_crawl(
        spark, fixture_dir, str(tmp_path / "p"), max_rounds=ROUNDS,
        max_retries=MAX_RETRIES, resume=True,
    )
    assert _orders(part) == _orders(engine)
    assert _seen(part) == _seen(engine)


def test_default_off_is_unchanged(spark, fixture_dir, tmp_path):
    """max_retries=0 (default) must keep the historical semantics: 5xx
    terminal-bad, no remote-server-error slug, oracle parity."""
    store = run_crawl(spark, fixture_dir, str(tmp_path / "off"), max_rounds=3)
    oracle = run_oracle(fixture_dir, max_rounds=3)
    assert _orders(store) == [list(o) for o in oracle.fetch_orders]
    seen = _seen(store)
    statuses = {v[1] for v in seen.values()}
    assert S.STATUS_TRANSIENT not in statuses
    assert seen == {
        k: (
            v["hit"], v["status"], v["terminal_url"], v["terminal_dt"],
            v["terminal_status_code"], v["terminal_sha1hex"], v["round_id"],
        )
        for k, v in oracle.url_seen.items()
    }
