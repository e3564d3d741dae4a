#!/usr/bin/env python
"""Capture ``explain("formatted")`` output for declared queries.

Writes one file per query to plans/<tag>/<name>_<suffix>.txt so plan
claims in OPTIMIZATION_*.md can be checked without running Spark.

Usage:
    python scripts/capture_plans.py before q1 q2 ...   # named queries
    python scripts/capture_plans.py before --headline  # bench headline set
    python scripts/capture_plans.py before --all       # every declared query

Eager queries (model fits, persisted exports) execute their build-time
actions while the plan is constructed — expected, same as the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_mf_etl_spark.queries import all_queries  # noqa: E402
from pipeline_mf_etl_spark.session import get_spark  # noqa: E402

TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r14")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    specs = all_queries()
    if names == ["--headline"]:
        import bench

        names = [n for n in bench.HEADLINE if n in specs]
    elif names == ["--all"]:
        names = list(specs)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("plans", TAG)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = spec.spark(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure inline
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
