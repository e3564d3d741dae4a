"""Command-line entry points (B9 run orchestration surface).

The reference exposes its layer runners through a CLI
(``mf-etl bronze-run`` / ``research-cluster-run`` / ``backtest-run``,
src/mf_etl/cli.py); here the same orchestration surface is three
subcommands over the Spark engine:

    python -m pipeline_mf_etl_spark run --sf-dir ... --output ...
    python -m pipeline_mf_etl_spark bronze|research|backtest --output ...
    python -m pipeline_mf_etl_spark walkforward --output ... --train-ends ...
    python -m pipeline_mf_etl_spark sanity bronze --output ...
    python -m pipeline_mf_etl_spark query a1_grouped_stats --sf-dir ...
    python -m pipeline_mf_etl_spark list

The ``sanity`` subcommand mirrors the reference's ``*-sanity`` command
family (reference cli.py:413,923,1074,1233): per-layer QA summary JSON
plus rollup parquet/CSV twins (sanity.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pipeline_mf_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the medallion pipeline end-to-end")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("--output", required=True)
    run.add_argument("--settings", default=None, help="YAML settings override file")
    run.add_argument("--run-id", default="cli-run")

    for stage in ("bronze", "research", "backtest"):
        sp = sub.add_parser(stage, help=f"run the {stage} stage only")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        sp.add_argument("--output", required=True)
        sp.add_argument("--settings", default=None, help="YAML settings override file")

    rep = sub.add_parser("report", help="write a sensitivity/calibration report pack")
    rep.add_argument("kind", choices=("sensitivity", "calibration"))
    rep.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    rep.add_argument("--output", required=True)

    ops = sub.add_parser("ops", help="nightly candidate rerun: append drift ledger")
    ops.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ops.add_argument("--output", required=True)
    ops.add_argument("--run-id", default="nightly-cli")

    wf = sub.add_parser("walkforward", help="run/resume a walk-forward pack")
    wf.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    wf.add_argument("--output", required=True)
    wf.add_argument(
        "--train-ends",
        required=True,
        help="comma-separated ISO cut dates, e.g. 2024-01-10,2024-01-15",
    )
    wf.add_argument("--force", action="store_true", help="recompute all splits")
    wf.add_argument("--max-splits", type=int, default=None)

    cmp_ = sub.add_parser("compare", help="diff two JSON artifacts with drift verdicts")
    cmp_.add_argument("artifact_a")
    cmp_.add_argument("artifact_b")
    cmp_.add_argument("--output", default=None, help="also write compare_report.json here")

    from pipeline_mf_etl_spark.sanity import LAYERS

    san = sub.add_parser("sanity", help="run per-layer QA sanity checks")
    san.add_argument("layer", choices=LAYERS)
    san.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    san.add_argument("--output", required=True)

    exp = sub.add_parser(
        "export-ml", help="export the stacked ML training dataset + metadata"
    )
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    exp.add_argument("--output", required=True)
    exp.add_argument("--start-date", default=None, help="ISO date lower bound")
    exp.add_argument("--end-date", default=None, help="ISO date upper bound")
    exp.add_argument("--symbols-limit", type=int, default=None)
    exp.add_argument("--sample-frac", type=float, default=None)

    cur = sub.add_parser(
        "curate",
        help="run the corpus-curation waterfall (dedupe + quality filters)",
    )
    cur.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    cur.add_argument("--output", required=True)
    cur.add_argument("--quality-min", type=float, default=None)

    q = sub.add_parser("query", help="run one registered query and print rows")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)

    cfg = sub.add_parser(
        "show-config", help="print the effective settings after overrides"
    )
    cfg.add_argument("--settings", default=None, help="YAML settings override file")

    cp = sub.add_parser(
        "compact",
        help="rewrite a small-files parquet dir into ~target-MB files",
    )
    cp.add_argument("src")
    cp.add_argument("dst")
    cp.add_argument("--target-mb", type=int, default=128)
    cp.add_argument(
        "--sort-cols",
        default=None,
        help="comma-separated sort keys (range-partitioned rewrite with "
        "tight per-file min/max stats); omit for byte balancing only",
    )

    sub.add_parser("list", help="list registered queries")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        from pipeline_mf_etl_spark.queries import all_queries

        for name, spec in all_queries().items():
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}\t{spec.doc.splitlines()[0] if spec.doc else ''}")
        return 0

    if args.cmd == "show-config":  # pure settings echo — no Spark needed
        import dataclasses

        from pipeline_mf_etl_spark.config import load_settings

        json.dump(
            dataclasses.asdict(load_settings(args.settings)),
            sys.stdout,
            indent=2,
            sort_keys=True,
        )
        print()
        return 0

    if args.cmd == "compare":  # pure artifact diff — no Spark session needed
        from pipeline_mf_etl_spark.compare import run_compare

        report = run_compare(args.artifact_a, args.artifact_b, args.output)
        json.dump(report, sys.stdout, indent=2, sort_keys=True)
        print()
        return 0 if report["worst_verdict"] != "DRIFT_FAIL" else 1

    from pipeline_mf_etl_spark.session import get_spark

    spark = get_spark()
    if args.cmd == "compact":
        from pipeline_mf_etl_spark.sources.writers import compact_parquet_dir

        stats = compact_parquet_dir(
            spark,
            args.src,
            args.dst,
            target_mb=args.target_mb,
            sort_cols=args.sort_cols.split(",") if args.sort_cols else None,
        )
        json.dump(stats, sys.stdout, indent=2, sort_keys=True)
        print()
        return 0

    if args.cmd == "run":
        from pipeline_mf_etl_spark.config import load_settings
        from pipeline_mf_etl_spark.pipeline import run_pipeline

        settings = load_settings(args.settings) if args.settings else None
        summary = run_pipeline(
            spark, args.sf_dir, args.output, settings=settings, run_id=args.run_id
        )
        json.dump(summary, sys.stdout, indent=2, sort_keys=True)
        print()
        return 0

    if args.cmd in ("bronze", "research", "backtest"):
        from pipeline_mf_etl_spark.config import load_settings
        from pipeline_mf_etl_spark.pipeline import run_backtest, run_bronze, run_research

        settings = load_settings(args.settings) if args.settings else None
        runner = {"bronze": run_bronze, "research": run_research, "backtest": run_backtest}[
            args.cmd
        ]
        summary = runner(spark, args.sf_dir, args.output, settings=settings)
        json.dump(summary, sys.stdout, indent=2, sort_keys=True)
        print()
        return 0

    if args.cmd == "report":
        from pipeline_mf_etl_spark.reports import (
            run_calibration_report,
            run_sensitivity_report,
        )

        runner = {
            "sensitivity": run_sensitivity_report,
            "calibration": run_calibration_report,
        }[args.kind]
        report = runner(spark, args.sf_dir, args.output)
        json.dump(
            {k: v for k, v in report.items() if k not in ("grid", "sweep")},
            sys.stdout, indent=2, sort_keys=True,
        )
        print()
        return 0

    if args.cmd == "ops":
        from pipeline_mf_etl_spark.ops import run_ops_nightly

        entry = run_ops_nightly(spark, args.sf_dir, args.output, run_id=args.run_id)
        json.dump(entry, sys.stdout, indent=2, sort_keys=True)
        print()
        return 0

    if args.cmd == "walkforward":
        from pipeline_mf_etl_spark.walkforward import run_walkforward

        manifest = run_walkforward(
            spark,
            args.sf_dir,
            args.output,
            [d.strip() for d in args.train_ends.split(",") if d.strip()],
            force=args.force,
            max_splits=args.max_splits,
        )
        json.dump(manifest, sys.stdout, indent=2, sort_keys=True)
        print()
        # scriptable like `compare`: any FAILED split is a non-zero exit
        failed = any(r.get("status") == "FAILED" for r in manifest.get("splits", []))
        return 1 if failed else 0

    if args.cmd == "sanity":
        from pipeline_mf_etl_spark.sanity import run_sanity

        summary = run_sanity(spark, args.sf_dir, args.output, args.layer)
        json.dump(summary, sys.stdout, indent=2, sort_keys=True, default=str)
        print()
        return 0

    if args.cmd == "curate":
        from pipeline_mf_etl_spark.corpus_curate import DEFAULT_QUALITY_MIN, curate_corpus

        report = curate_corpus(
            spark,
            args.sf_dir,
            args.output,
            quality_min=(
                args.quality_min if args.quality_min is not None else DEFAULT_QUALITY_MIN
            ),
        )
        json.dump(report, sys.stdout, indent=2, sort_keys=True)
        print()
        return 0

    if args.cmd == "export-ml":
        from pipeline_mf_etl_spark.ml_export import export_ml_dataset

        meta = export_ml_dataset(
            spark,
            args.sf_dir,
            args.output,
            start_date=args.start_date,
            end_date=args.end_date,
            symbols_limit=args.symbols_limit,
            sample_frac=args.sample_frac,
        )
        json.dump(meta, sys.stdout, indent=2, sort_keys=True)
        print()
        return 0

    if args.cmd == "query":
        from pipeline_mf_etl_spark.queries import all_queries

        specs = all_queries()
        if args.name not in specs:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        specs[args.name].spark(spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
