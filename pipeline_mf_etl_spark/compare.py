"""Run-comparison surface (reference ``validation-compare`` /
``backtest-compare`` / ``cluster-hardening-compare`` commands).

The reference diffs two runs' summary artifacts metric-by-metric and
grades each delta against drift thresholds — the same OK/DRIFT_WARN/
DRIFT_FAIL ladder the candidate rerun uses (backtest/candidate_rerun.py,
configs/settings.yaml ``candidate_rerun.drift``). This module compares
any two JSON artifacts the engine writes (run_summary.json,
backtest_report.json, backtest_summary.json): numeric fields get
absolute deltas and verdicts, non-numeric fields get equality checks,
and the result is itself an artifact (json twin via the atomic writer).
"""

from __future__ import annotations

import json
import os

from pipeline_mf_etl_spark.sources.writers import write_json_artifact

# absolute-delta thresholds per metric family; anything not listed uses
# the default. Mirrors the reference's per-metric drift config shape.
DEFAULT_THRESHOLDS = {
    "expectancy": (0.002, 0.005),
    "win_rate": (0.02, 0.05),
    "max_drawdown": (0.02, 0.05),
    "profit_factor": (0.1, 0.25),
}
DEFAULT_REL = (0.05, 0.15)  # relative fallback: 5% warn, 15% fail


def _verdict(key: str, a: float, b: float) -> tuple[float, str]:
    delta = b - a
    if key in DEFAULT_THRESHOLDS:
        warn, fail = DEFAULT_THRESHOLDS[key]
        mag = abs(delta)
    else:
        warn, fail = DEFAULT_REL
        base = max(abs(a), abs(b), 1e-12)
        mag = abs(delta) / base
    verdict = "OK" if mag <= warn else "DRIFT_WARN" if mag <= fail else "DRIFT_FAIL"
    return delta, verdict


def compare_artifacts(path_a: str, path_b: str) -> dict:
    """Field-by-field diff of two JSON artifacts. Numeric fields carry
    (a, b, delta, verdict); everything else carries an equality flag.
    Nested dicts/lists are compared by equality only (the reference
    compares flat metric tables)."""
    with open(path_a, encoding="utf-8") as fh:
        a = json.load(fh)
    with open(path_b, encoding="utf-8") as fh:
        b = json.load(fh)

    fields: dict[str, dict] = {}
    for key in sorted(set(a) | set(b)):
        va, vb = a.get(key), b.get(key)
        if isinstance(va, (int, float)) and isinstance(vb, (int, float)) and not (
            isinstance(va, bool) or isinstance(vb, bool)
        ):
            delta, verdict = _verdict(key, float(va), float(vb))
            fields[key] = {
                "a": va, "b": vb, "delta": round(delta, 9), "verdict": verdict
            }
        else:
            fields[key] = {"a": va, "b": vb, "equal": va == vb}

    verdicts = [f["verdict"] for f in fields.values() if "verdict" in f]
    worst = (
        "DRIFT_FAIL"
        if "DRIFT_FAIL" in verdicts
        else "DRIFT_WARN" if "DRIFT_WARN" in verdicts else "OK"
    )
    return {
        "a": path_a,
        "b": path_b,
        "worst_verdict": worst,
        "n_fields": len(fields),
        "n_drift_fail": verdicts.count("DRIFT_FAIL"),
        "n_drift_warn": verdicts.count("DRIFT_WARN"),
        "fields": fields,
    }


def run_compare(path_a: str, path_b: str, output_root: str | None = None) -> dict:
    report = compare_artifacts(path_a, path_b)
    if output_root:
        write_json_artifact(report, os.path.join(output_root, "compare_report.json"))
    return report
