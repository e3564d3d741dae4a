"""Run-comparison surface: metric deltas + drift verdicts between two
JSON artifacts (reference *-compare commands)."""

from __future__ import annotations

import json
import os

from pipeline_mf_etl_spark.compare import compare_artifacts, run_compare


def _write(tmp_path, name, payload):
    p = str(tmp_path / name)
    with open(p, "w") as fh:
        json.dump(payload, fh)
    return p


def test_compare_verdict_ladder(tmp_path):
    a = _write(tmp_path, "a.json", {
        "expectancy": 0.010, "win_rate": 0.50, "n_trades": 100, "run_id": "r1",
    })
    b = _write(tmp_path, "b.json", {
        "expectancy": 0.013, "win_rate": 0.51, "n_trades": 100, "run_id": "r2",
    })
    rep = compare_artifacts(a, b)
    f = rep["fields"]
    # expectancy delta 0.003 -> between warn 0.002 and fail 0.005
    assert f["expectancy"]["verdict"] == "DRIFT_WARN"
    assert f["win_rate"]["verdict"] == "OK"
    assert f["n_trades"]["verdict"] == "OK"
    assert f["run_id"]["equal"] is False
    assert rep["worst_verdict"] == "DRIFT_WARN"

    c = _write(tmp_path, "c.json", {"expectancy": 0.017, "win_rate": 0.50})
    assert compare_artifacts(a, c)["fields"]["expectancy"]["verdict"] == "DRIFT_FAIL"


def test_compare_relative_fallback_and_artifact(tmp_path):
    a = _write(tmp_path, "a.json", {"custom_metric": 100.0})
    b = _write(tmp_path, "b.json", {"custom_metric": 104.0})  # 4% < 5% warn
    out = str(tmp_path / "cmp")
    rep = run_compare(a, b, out)
    assert rep["fields"]["custom_metric"]["verdict"] == "OK"
    c = _write(tmp_path, "c.json", {"custom_metric": 130.0})  # 30% > 15%
    assert compare_artifacts(a, c)["worst_verdict"] == "DRIFT_FAIL"
    with open(os.path.join(out, "compare_report.json")) as fh:
        assert json.load(fh)["n_fields"] == rep["n_fields"]


def test_compare_missing_and_bool_fields(tmp_path):
    a = _write(tmp_path, "a.json", {"only_a": 1, "flag": True})
    b = _write(tmp_path, "b.json", {"only_b": 2, "flag": True})
    f = compare_artifacts(a, b)["fields"]
    assert f["only_a"] == {"a": 1, "b": None, "equal": False}
    assert f["only_b"] == {"a": None, "b": 2, "equal": False}
    assert f["flag"]["equal"] is True


def test_compare_cli_exit_codes(tmp_path, capsys):
    """compare exits 0 for OK/WARN, 1 for DRIFT_FAIL — scriptable the
    way the reference's compare commands are."""
    from pipeline_mf_etl_spark.__main__ import main

    a = _write(tmp_path, "a.json", {"expectancy": 0.010})
    b = _write(tmp_path, "b.json", {"expectancy": 0.011})
    assert main(["compare", a, b]) == 0
    assert json.loads(capsys.readouterr().out)["worst_verdict"] == "OK"

    c = _write(tmp_path, "c.json", {"expectancy": 0.050})
    assert main(["compare", a, c]) == 1
    assert json.loads(capsys.readouterr().out)["worst_verdict"] == "DRIFT_FAIL"
