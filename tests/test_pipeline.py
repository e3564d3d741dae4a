"""Integration test for the medallion run orchestrator: every layer is
written, readable, and consistent; the run summary describes the data
actually on disk; settings knobs flow into the run."""

from __future__ import annotations

import json
import os

import pytest

from pipeline_mf_etl_spark.config import Settings, override
from pipeline_mf_etl_spark.pipeline import run_pipeline

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("medallion"))
    summary = run_pipeline(spark, SF_SMALL, out, run_id="test-run")
    return out, summary


def test_all_layers_written_and_readable(spark, run):
    out, summary = run
    bronze = spark.read.parquet(os.path.join(out, "bronze"))
    silver = spark.read.parquet(os.path.join(out, "silver"))
    gold = spark.read.parquet(os.path.join(out, "gold"))
    research = spark.read.parquet(os.path.join(out, "research"))
    trades = spark.read.parquet(os.path.join(out, "trades"))

    n_bronze, n_silver = bronze.count(), silver.count()
    assert n_bronze == n_silver > 0
    # gold keeps only valid rows
    assert gold.count() == silver.filter("is_valid_row").count()
    # year partitioning exists on the layered parquet (hive dirs)
    assert any(
        d.startswith("event_year=") for d in os.listdir(os.path.join(out, "bronze"))
    )
    # layer schemas carry their stage's columns
    assert "quality_error_count" in silver.columns
    assert {"ewm", "flow_state_code", "signal"} <= set(gold.columns)
    assert {"flow_state_code", "n_rows", "mean_fwd_ret_5"} <= set(research.columns)
    assert {"user_id", "entry_value", "exit_value", "net_return"} <= set(trades.columns)
    assert trades.count() == summary["n_trades"]


def test_summary_matches_disk(spark, run):
    out, summary = run
    path = os.path.join(out, "run_summary.json")
    assert os.path.exists(path)
    with open(path) as fh:
        on_disk = json.load(fh)
    assert on_disk == summary
    silver = spark.read.parquet(os.path.join(out, "silver"))
    assert summary["rows_total"] == silver.count()
    assert summary["rows_valid"] == silver.filter("is_valid_row").count()
    assert summary["rows_invalid"] == summary["rows_total"] - summary["rows_valid"]
    assert summary["run_id"] == "test-run"


def test_settings_knob_changes_run(spark, tmp_path):
    """hold_bars=2 must yield a different trade count than the default 5
    (shorter holds → non-overlapping slots free up sooner → more trades),
    and the summary must echo the knob."""
    out = str(tmp_path / "alt")
    s = override(Settings(), backtest={"hold_bars": 2})
    alt = run_pipeline(spark, SF_SMALL, out, settings=s, run_id="alt")
    assert alt["settings"]["hold_bars"] == 2
    assert alt["n_trades"] > 0


def test_cli_list_and_run(tmp_path, capsys):
    """CLI surface (B9): `list` names every registered query; `run`
    executes the pipeline and prints the summary JSON."""
    from pipeline_mf_etl_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "a1_grouped_stats" in out and "b6_trade_sim" in out

    dest = str(tmp_path / "cli_out")
    assert main(["run", "--sf-dir", SF_SMALL, "--output", dest, "--run-id", "c1"]) == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["run_id"] == "c1"
    assert os.path.exists(os.path.join(dest, "run_summary.json"))


def test_precision_policy_on_disk(spark, run):
    """Reference precision contract: bronze stores float64; silver/gold
    store float32 on disk (compute stays float64 — gold's ewm derives
    from re-promoted doubles)."""
    out, _ = run
    bronze = spark.read.parquet(os.path.join(out, "bronze"))
    silver = spark.read.parquet(os.path.join(out, "silver"))
    gold = spark.read.parquet(os.path.join(out, "gold"))
    assert dict(bronze.dtypes)["value"] == "double"
    assert dict(silver.dtypes)["value"] == "float"
    assert dict(gold.dtypes)["ewm"] == "float"


def test_cli_query_subcommand(capsys):
    """`query <name>` pretty-prints a registered query's rows."""
    from pipeline_mf_etl_spark.__main__ import main

    assert main(["query", "a1_grouped_stats", "--sf-dir", SF_SMALL]) == 0
    out = capsys.readouterr().out
    assert "sum_qty" in out
    assert main(["query", "nope_not_real"]) == 2


def test_run_pipeline_empty_input(spark, tmp_path):
    """An empty events table must still complete the run and emit the
    run_summary.json artifact (zero counts), not crash on layer
    read-back or NULL aggregates."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    empty = pd.DataFrame(
        {
            "event_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "event_type": pd.Series(dtype=pd.StringDtype()),
            "value": pd.Series(dtype="float64"),
            "props": pd.Series(dtype=pd.StringDtype()),
        }
    )
    empty.to_parquet(src / "events.parquet")

    out = str(tmp_path / "out")
    summary = run_pipeline(spark, str(src), out, run_id="empty")
    assert summary["rows_total"] == 0
    assert summary["rows_valid"] == 0
    assert summary["n_trades"] == 0
    assert os.path.exists(os.path.join(out, "run_summary.json"))
