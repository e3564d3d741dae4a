"""Sanity-runner contract tests: every layer writes the QA summary JSON
with its required scalar keys plus parquet+CSV rollup twins (reference
``*-sanity`` command family, bronze/sanity_checks.py:158-302)."""

from __future__ import annotations

import json
import os

import pytest

from pipeline_mf_etl_spark.sanity import LAYERS, run_sanity
from tests.conftest import SF_ORACLE

_REQUIRED = {
    "bronze": {
        "ticker_count",
        "total_rows",
        "total_error_rows",
        "rows_in_duplicated_days",
        "global_min_day",
        "global_max_day",
        "top_series_by_errors",
        "rows_by_year",
    },
    "research": {"k", "silhouette_simplified", "within_sse", "cluster_sizes"},
    "backtest": {"n_trades", "per_side_metrics", "final_equity", "robustness"},
    "corpus": {"n_docs", "mean_quality", "dup_rate", "language_mix"},
    "silver": {
        "ticker_count",
        "total_rows",
        "global_min_ts",
        "global_max_ts",
        "feature_columns_present",
        "key_feature_null_rates",
    },
    "indicators": {
        "symbol_count",
        "total_rows",
        "tmf_null_count",
        "tti_proxy_null_count",
        "tmf_zero_cross_up_count",
        "tmf_zero_cross_down_count",
        "top_abs_tmf_by_symbol",
    },
    "events": {
        "symbol_count",
        "total_rows",
        "key_event_counts",
        "state_label_counts",
        "top_by_activity",
        "top_by_fails",
    },
    "features": {
        "symbol_count",
        "total_rows",
        "key_feature_null_rates",
        "top_avg_activity_bias",
    },
    "validation": {
        "top_states_by_fwd_ret_mean",
        "pairwise_significant_diff_share",
        "top_transition_codes",
        "state_stability_highlights",
        "nan_warnings",
    },
    "grid": {
        "n_combos",
        "zero_trade_combos",
        "non_finite_metric_cells",
        "errors",
        "status",
        "top_combos_by_robustness",
    },
}

_ROLLUPS = {
    "bronze": ("per_series_report", "rows_by_year"),
    "research": ("cluster_profile", "dwell_stats"),
    "backtest": ("trade_metrics", "robustness"),
    "corpus": ("language_mix",),
    "silver": ("per_series_nulls",),
    "indicators": ("indicator_report",),
    "events": ("event_flag_report", "state_counts"),
    "features": ("feature_report",),
    "validation": ("state_scorecard", "transition_summary"),
    "grid": ("grid_metrics_table",),
}


@pytest.mark.parametrize("layer", sorted(_REQUIRED))
def test_sanity_layer_contract(spark, tmp_path, layer):
    out = str(tmp_path)
    summary = run_sanity(spark, SF_ORACLE, out, layer)
    # summary JSON written atomically and round-trips
    path = os.path.join(out, f"{layer}_qa", f"{layer}_sanity_summary.json")
    assert os.path.exists(path)
    on_disk = json.load(open(path))
    assert on_disk["layer"] == layer
    assert "generated_ts" in on_disk and on_disk["sf_dir"] == SF_ORACLE
    missing = _REQUIRED[layer] - set(summary)
    assert not missing, f"{layer} summary missing keys: {missing}"
    # rollup parquet + csv twins exist
    for name in _ROLLUPS[layer]:
        base = os.path.join(out, f"{layer}_qa", name)
        assert any(f.endswith(".parquet") for f in os.listdir(base)), base
        assert os.path.isdir(base + "_csv"), base + "_csv"


def test_sanity_bronze_totals_match_gold_queries(spark, tmp_path):
    """Bronze sanity scalars must agree with the certified aggregates
    they are derived from."""
    summary = run_sanity(spark, SF_ORACLE, str(tmp_path), "bronze")
    from pipeline_mf_etl_spark.sources.readers import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    assert summary["total_rows"] == ev.count()
    assert summary["ticker_count"] == ev.select("user_id").distinct().count()


def test_sanity_grid_is_clean(spark, tmp_path):
    """The one-pass sensitivity grid must have unique combo keys and
    finite metrics — the checks the reference's grid sanity flags as
    hard errors (sensitivity_sanity.py:41-120)."""
    summary = run_sanity(spark, SF_ORACLE, str(tmp_path), "grid")
    assert summary["status"] == "PASS", summary["errors"]
    assert summary["n_combos"] > 0
    assert summary["non_finite_metric_cells"] == 0


def test_sanity_indicator_totals_match_panel(spark, tmp_path):
    """Indicator sanity totals must agree with the certified v1 panel."""
    summary = run_sanity(spark, SF_ORACLE, str(tmp_path), "indicators")
    from pipeline_mf_etl_spark.queries.viewer import v1_tmf_tti_panel

    pan = v1_tmf_tti_panel(spark, SF_ORACLE)
    assert summary["total_rows"] == pan.count()
    crosses = pan.filter("tmf_zero_cross").count()
    assert (
        summary["tmf_zero_cross_up_count"] + summary["tmf_zero_cross_down_count"]
        == crosses
    )


def test_sanity_rejects_unknown_layer(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown layer"):
        run_sanity(spark, SF_ORACLE, str(tmp_path), "gold-nope")
    assert set(LAYERS) == set(_REQUIRED)
