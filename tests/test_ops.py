"""Ops nightly ledger: append-only drift history (SURVEY.md §2.9 B13 /
reference candidate_rerun.py + ops-nightly-run)."""

from __future__ import annotations

import os

from pipeline_mf_etl_spark.ops import LEDGER_NAME, read_ledger, run_ops_nightly
from tests.conftest import SF_ORACLE


def test_nightly_ledger_appends(spark, tmp_path):
    out = str(tmp_path / "ops")
    e1 = run_ops_nightly(spark, SF_ORACLE, out, run_id="n1")
    e2 = run_ops_nightly(spark, SF_ORACLE, out, run_id="n2")

    # entries mirror the oracle-certified b13 drift table
    assert e1["n_candidates"] > 0
    assert e1["n_ok"] + e1["n_warn"] + e1["n_fail"] == e1["n_candidates"]
    assert e1["worst_verdict"] in ("OK", "DRIFT_WARN", "DRIFT_FAIL")
    for c in e1["candidates"]:
        assert c["drift_verdict"] in ("OK", "DRIFT_WARN", "DRIFT_FAIL")
        assert c["candidate_rank"] >= 1

    # append-only: the second run extends the file, keeps the first line
    ledger = read_ledger(out)
    assert [e["run_id"] for e in ledger] == ["n1", "n2"]
    assert ledger[0]["candidates"] == e1["candidates"]
    assert os.path.exists(os.path.join(out, LEDGER_NAME))


def test_ops_cli(tmp_path, capsys):
    from pipeline_mf_etl_spark.__main__ import main

    out = str(tmp_path / "ops")
    assert main([
        "ops", "--sf-dir", "/root/testdata/sf0.001", "--output", out,
        "--run-id", "cli-night",
    ]) == 0
    import json as _json

    entry = _json.loads(capsys.readouterr().out)
    assert entry["run_id"] == "cli-night"
    assert read_ledger(out)[0]["run_id"] == "cli-night"
