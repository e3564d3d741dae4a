"""Sequential-invariant tests for the trade simulator (SURVEY.md §5:
property tests for B5/B6 — no-overlap, next-open execution, exit
accounting, MFE/MAE bounds)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from pipeline_mf_etl_spark.queries.backtest import _HOLD, b6_trade_sim, _with_signals
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def trades(spark):
    return [r.asDict() for r in b6_trade_sim(spark, SF_ORACLE).collect()]


@pytest.fixture(scope="module")
def bars_by_user(spark):
    bars = _with_signals(spark, SF_ORACLE).select(
        "user_id", "ts", "event_id", "value", "signal", "side"
    )
    by_user = defaultdict(list)
    for r in bars.collect():
        by_user[r.user_id].append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
    return by_user


def test_trades_exist(trades):
    assert len(trades) > 100


def test_no_overlap_and_next_open(trades, bars_by_user):
    idx = {
        (uid, r.event_id): i
        for uid, rows in bars_by_user.items()
        for i, r in enumerate(rows)
    }
    by_user = defaultdict(list)
    for t in trades:
        by_user[t["user_id"]].append(t)
    for uid, ts_ in by_user.items():
        ts_.sort(key=lambda t: t["position_id"])
        prev_exit = -1
        for t in ts_:
            e = idx[(uid, t["entry_event_id"])]
            x = idx[(uid, t["exit_event_id"])]
            rows = bars_by_user[uid]
            # entry fills one bar after a signal bar, while flat
            assert e >= 1 and rows[e - 1].signal, (uid, t)
            assert e - 1 >= prev_exit, f"overlap: {uid} {t}"
            # horizon exit unless truncated by end of data
            if t["exit_reason"] == "HORIZON":
                assert x - e == _HOLD
            else:
                assert t["exit_reason"] == "END_OF_DATA" and x == len(rows) - 1
            assert t["bars_held"] == x - e
            prev_exit = x


def test_excursion_bounds(trades):
    for t in trades:
        if t["gross_return"] is None:
            continue
        assert t["mfe"] >= t["gross_return"] - 1e-9, t
        assert t["mae"] <= t["gross_return"] + 1e-9, t
        assert t["mfe"] >= t["mae"] - 1e-9, t
        # net = gross - fixed two-sided cost
        assert abs((t["gross_return"] - t["net_return"]) - 0.002) < 1e-9


def test_deterministic(spark):
    a = sorted(map(tuple, b6_trade_sim(spark, SF_ORACLE).collect()))
    b = sorted(map(tuple, b6_trade_sim(spark, SF_ORACLE).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# B3 overlay gating: pass-expr truth table + coverage verdict precedence
# ---------------------------------------------------------------------------
def test_overlay_pass_expr_truth_table(spark):
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.operators.overlay import (
        OVERLAY_MODES,
        UNKNOWN_HANDLINGS,
        overlay_pass_expr,
    )

    df = spark.createDataFrame(
        [("ALLOW",), ("WATCH",), ("BLOCK",), (None,)], "cls string"
    )
    got = {}
    for m in OVERLAY_MODES:
        for u in UNKNOWN_HANDLINGS:
            rows = df.select(
                "cls", overlay_pass_expr(F.col("cls"), m, u).alias("p")
            ).collect()
            got[(m, u)] = {r["cls"]: r["p"] for r in rows}
    fail, ok = "treat_unknown_as_fail", "treat_unknown_as_pass"
    assert got[("none", fail)] == {"ALLOW": True, "WATCH": True, "BLOCK": True, None: True}
    assert got[("allow_only", fail)] == {"ALLOW": True, "WATCH": False, "BLOCK": False, None: False}
    assert got[("allow_watch", fail)] == {"ALLOW": True, "WATCH": True, "BLOCK": False, None: False}
    assert got[("allow_or_unknown", fail)][None] is False
    assert got[("allow_or_unknown", ok)][None] is True
    assert got[("allow_or_unknown", ok)]["WATCH"] is False
    assert got[("block_veto", fail)] == {"ALLOW": True, "WATCH": True, "BLOCK": False, None: False}
    assert got[("block_veto", ok)] == {"ALLOW": True, "WATCH": True, "BLOCK": False, None: True}


def test_coverage_verdict_precedence():
    import pytest as _pytest

    from pipeline_mf_etl_spark.operators.overlay import (
        coverage_verdict,
        overlay_pass_expr,
    )

    base = dict(match_rate=0.99, unknown_rate=0.01, year_min_match_rate=0.95)
    assert coverage_verdict(**base).status == "OK"
    # duplicates trump everything
    v = coverage_verdict(**{**base, "match_rate": 0.1}, duplicate_key_count_overlay=2)
    assert v.status == "FAIL_DUPLICATES" and "overlay=2" in v.reasons[0]
    assert coverage_verdict(**{**base, "match_rate": 0.5}).status == "FAIL_LOW_MATCH"
    assert coverage_verdict(**{**base, "year_min_match_rate": 0.5}).status == "FAIL_LOW_MATCH"
    assert coverage_verdict(**{**base, "unknown_rate": 0.5}).status == "FAIL_HIGH_UNKNOWN"
    assert coverage_verdict(**{**base, "match_rate": 0.9}).status == "WARN_LOW_MATCH"
    assert coverage_verdict(**{**base, "unknown_rate": 0.1}).status == "WARN_HIGH_UNKNOWN"
    # None metrics are skipped, not failed
    assert coverage_verdict(match_rate=None, unknown_rate=None, year_min_match_rate=None).status == "OK"
    with _pytest.raises(ValueError):
        overlay_pass_expr(None, "bogus")
