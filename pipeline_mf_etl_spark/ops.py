"""Ops nightly candidate-rerun ledger (SURVEY.md §2.9 B13).

The reference's ``ops-nightly-run`` re-runs the locked production
candidates, compares their metrics against the locked snapshot with
thresholded OK/DRIFT_WARN/DRIFT_FAIL verdicts, and APPENDS the outcome
to a drift ledger so operations has a time series of candidate health
(reference backtest/candidate_rerun.py, cli.py ``ops-nightly-run``).

Here the drift computation is the oracle-certified ``b13_candidate_drift``
query (queries/backtest.py) and the ledger is an append-only JSONL file:
one line per nightly run, each line carrying the per-candidate verdicts
and a rollup. JSONL-append (not rewrite) is the point — the ledger is
the artifact operations greps/tails, and a crashed run leaves prior
history untouched.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

LEDGER_NAME = "ops_ledger.jsonl"


def append_ledger_entry(output_root: str, entry: dict) -> str:
    """Append one JSON line to the ledger (create if absent). Returns
    the ledger path. Plain O_APPEND write: each entry is a single
    line, so concurrent nightly runs cannot corrupt earlier lines."""
    os.makedirs(output_root, exist_ok=True)
    path = os.path.join(output_root, LEDGER_NAME)
    with open(path, "a", encoding="utf-8") as fh:
        fh.write(json.dumps(entry, sort_keys=True) + "\n")
    return path


def read_ledger(output_root: str) -> list[dict]:
    path = os.path.join(output_root, LEDGER_NAME)
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as fh:
        return [json.loads(line) for line in fh if line.strip()]


def run_ops_nightly(
    spark: SparkSession, sf_dir: str, output_root: str, run_id: str = "nightly-0"
) -> dict:
    """One nightly rotation: recompute the candidate drift table and
    append its verdicts to the ledger. Returns the appended entry."""
    from pipeline_mf_etl_spark.queries import all_queries

    drift = all_queries()["b13_candidate_drift"].spark(spark, sf_dir)
    rows = [r.asDict() for r in drift.orderBy("candidate_rank").collect()]
    verdicts = [r["drift_verdict"] for r in rows]
    entry = {
        "run_id": run_id,
        "ts_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf_dir": sf_dir,
        "n_candidates": len(rows),
        "n_ok": verdicts.count("OK"),
        "n_warn": verdicts.count("DRIFT_WARN"),
        "n_fail": verdicts.count("DRIFT_FAIL"),
        "worst_verdict": (
            "DRIFT_FAIL"
            if "DRIFT_FAIL" in verdicts
            else "DRIFT_WARN" if "DRIFT_WARN" in verdicts else "OK"
        ),
        "candidates": rows,
    }
    append_ledger_entry(output_root, entry)
    return entry
