"""Raw TXT ingest + incremental manifest (SURVEY.md §2.1 S1-S2, §2.2
I1-I4, §2.3 P1-P2).

The reference walks a directory of per-ticker TXT files, reads them one
at a time with a Python csv loop, keeps malformed rows in a rejects
side-channel (ingest/read_txt.py:97-186), normalizes types
(transform/normalize.py:92-145), flags quality issues
(validate/rules.py:84-196) and skips files unchanged since the previous
run via a fingerprint manifest (ingest/manifest.py:76-199).

Spark-first shape: ONE ``spark.read.csv`` over the whole selected file
set (schema'd, PERMISSIVE, corrupt rows captured in-band), file lineage
via ``input_file_name``, per-series quality flags as window/boolean
expressions, and the manifest as a small parquet ledger classified with
a broadcast left join. The per-file Python loop disappears; error
isolation is row-level instead of file-level.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw stock-bar TXT schema (reference ingest/read_txt.py:19-36):
# <TICKER>,<PER>,<DATE>,<TIME>,<OPEN>,<HIGH>,<LOW>,<CLOSE>,<VOL>
RAW_COLUMNS = (
    "raw_ticker",
    "raw_per",
    "raw_date",
    "raw_time",
    "raw_open",
    "raw_high",
    "raw_low",
    "raw_close",
    "raw_vol",
)
_CORRUPT = "_corrupt_record"

RAW_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in RAW_COLUMNS]
    + [StructField(_CORRUPT, StringType(), True)]
)


def discover_txt_files(root: str) -> list[dict]:
    """S1: recursive discovery with exchange inferred from the path
    (reference ingest/discover.py:21-62)."""
    out = []
    for p in sorted(Path(root).rglob("*.txt")):
        path = str(p)
        low = path.lower()
        exchange = "NASDAQ" if "nasdaq" in low else ("NYSE" if "nyse" in low else "UNKNOWN")
        out.append({"source_file": path, "exchange": exchange, "ticker_hint": p.stem.upper()})
    return out


def sniff_delimiter(path: str, candidates: str = ",\t|;") -> str:
    """S2 delimiter sniff: first non-empty line, most frequent candidate
    (reference ingest/read_txt.py:39,73-78 — a driver-side peek)."""
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if line:
                return max(candidates, key=line.count)
    return ","


def read_txt_with_rejects(
    spark: SparkSession, paths: list[str], sep: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """S2: one distributed line read over the whole file set.

    Returns (valid, rejects). The reference rejects rows whose column
    count differs from the header contract (ingest/read_txt.py:133-156);
    Spark's CSV PERMISSIVE mode silently pads short rows instead, so the
    read goes through ``spark.read.text`` + split — the column-count
    check stays explicit and rejected raw lines keep their bytes. Header
    lines (``<TICKER>,...``) are filtered by content, not file position,
    so the read stays order-independent and distributable."""
    if sep is None:
        sep = sniff_delimiter(paths[0])
    n = len(RAW_COLUMNS)
    lines = (
        spark.read.text(list(paths))
        .withColumn("source_file", F.input_file_name())
        .filter(F.trim("value") != "")
        .withColumn("parts", F.split("value", re_escape(sep)))
    )
    is_header = F.upper(F.element_at("parts", 1)).isin("<TICKER>", "TICKER")
    body = lines.filter(~is_header)
    rejects = body.filter(F.size("parts") != n).select(
        "source_file",
        F.col("value").alias("raw_line"),
        F.lit("BAD_COLUMNS").alias("reason"),
    )
    valid = body.filter(F.size("parts") == n).select(
        *[F.element_at("parts", i + 1).alias(c) for i, c in enumerate(RAW_COLUMNS)],
        "source_file",
    )
    return valid, rejects


def re_escape(sep: str) -> str:
    """Regex-escape a single-char delimiter for ``F.split``."""
    return "\\" + sep if sep in ".|\\^$*+?()[]{}" else sep


def normalize_bronze(df: DataFrame, run_id: str = "run-0") -> DataFrame:
    """P1: trim/uppercase, D→D1 timeframe, yyyyMMdd date + zero-padded
    time → timestamp, non-strict numeric casts, lineage literals
    (reference transform/normalize.py:92-145)."""
    t = F.upper(F.trim(F.col("raw_ticker")))
    per = F.when(F.upper(F.trim(F.col("raw_per"))) == "D", "D1").otherwise(
        F.upper(F.trim(F.col("raw_per")))
    )
    date = F.to_date(F.trim(F.col("raw_date")), "yyyyMMdd")
    ts = F.to_timestamp(
        F.concat(F.trim(F.col("raw_date")), F.lpad(F.trim(F.col("raw_time")), 6, "0")),
        "yyyyMMddHHmmss",
    )
    num = lambda c: F.trim(F.col(c)).try_cast(DoubleType())  # noqa: E731
    return df.select(
        t.alias("ticker"),
        per.alias("timeframe"),
        date.alias("trade_date"),
        ts.alias("trade_dt"),
        num("raw_open").alias("open"),
        num("raw_high").alias("high"),
        num("raw_low").alias("low"),
        num("raw_close").alias("close"),
        F.trim(F.col("raw_vol")).try_cast(LongType()).alias("volume"),
        "source_file",
        F.lit(run_id).alias("run_id"),
        F.current_timestamp().alias("ingest_ts"),
    )


def quality_flags(df: DataFrame, gap_days: int = 7) -> DataFrame:
    """P2: the bronze hard/warn flag stack + error counts + is_valid_row
    (reference validate/rules.py:84-196)."""
    req = ["ticker", "timeframe", "trade_date", "open", "high", "low", "close", "volume"]
    missing = None
    for c in req:
        cond = F.col(c).isNull()
        missing = cond if missing is None else (missing | cond)
    w_dup = Window.partitionBy("ticker", "trade_date")
    w_seq = Window.partitionBy("ticker").orderBy("trade_date")
    flags = {
        "q_missing_field": missing,
        "q_bad_timeframe": F.col("timeframe") != "D1",
        "q_nonpositive_price": (
            (F.col("open") <= 0) | (F.col("high") <= 0) | (F.col("low") <= 0) | (F.col("close") <= 0)
        ),
        "q_high_lt_low": F.col("high") < F.col("low"),
        "q_ohlc_outside_hl": (
            (F.col("open") > F.col("high")) | (F.col("open") < F.col("low"))
            | (F.col("close") > F.col("high")) | (F.col("close") < F.col("low"))
        ),
        "q_negative_volume": F.col("volume") < 0,
        "q_duplicate_ticker_date": F.count("*").over(w_dup) > 1,
    }
    warns = {
        "q_suspicious_bar": (
            F.abs(F.col("close") / F.col("open") - 1) > 0.3
        ),
        "q_gap_in_calendar": F.datediff("trade_date", F.lag("trade_date").over(w_seq)) > gap_days,
    }
    out = df
    for name, expr in {**flags, **warns}.items():
        out = out.withColumn(name, F.coalesce(expr, F.lit(False)))
    err = sum(F.col(n).cast("int") for n in flags)
    warn = sum(F.col(n).cast("int") for n in warns)
    return (
        out.withColumn("quality_error_count", err)
        .withColumn("quality_warn_count", warn)
        .withColumn("is_valid_row", F.col("quality_error_count") == 0)
    )


# ---------------------------------------------------------------------------
# I1-I4: incremental manifest ledger
# ---------------------------------------------------------------------------
def build_manifest(spark: SparkSession, files: list[str]) -> DataFrame:
    """I1: stat every file → fingerprint rows (reference
    ingest/manifest.py:76-113). The listing is driver-side by design —
    it is file-count-sized, not data-sized."""
    rows = []
    for f in sorted(files):
        st = os.stat(f)
        rows.append((f, int(st.st_size), int(st.st_mtime_ns), f"{f}|{st.st_size}|{st.st_mtime_ns}"))
    schema = "source_file string, file_size_bytes long, mtime_ns long, fingerprint string"
    return spark.createDataFrame(rows, schema=schema)


def classify_manifest(current: DataFrame, previous: DataFrame | None) -> DataFrame:
    """I2: NEW / CHANGED / UNCHANGED via broadcast left join against the
    previous snapshot (reference ingest/manifest.py:155-199)."""
    if previous is None:
        return current.withColumn("status", F.lit("NEW"))
    prev = (
        previous.orderBy("source_file")
        .dropDuplicates(["source_file"])
        .select("source_file", F.col("fingerprint").alias("prev_fingerprint"))
    )
    joined = current.join(F.broadcast(prev), "source_file", "left")
    status = (
        F.when(F.col("prev_fingerprint").isNull(), "NEW")
        .when(F.col("prev_fingerprint") == F.col("fingerprint"), "UNCHANGED")
        .otherwise("CHANGED")
    )
    return joined.withColumn("status", status).drop("prev_fingerprint")


def select_for_processing(
    manifest: DataFrame, full: bool = False, limit: int | None = None
) -> DataFrame:
    """I3: NEW+CHANGED unless --full; optional head-limit (reference
    bronze/pipeline.py:98-112). DELETED tombstones from the merged
    ledger are never selected (nothing to read)."""
    sel = (
        manifest.filter(F.col("status") != "DELETED")
        if full
        else manifest.filter(F.col("status").isin("NEW", "CHANGED"))
    )
    sel = sel.orderBy("source_file")
    return sel.limit(limit) if limit else sel


def merge_manifest(
    current: DataFrame, previous: DataFrame | None, epoch: str = "epoch0"
) -> DataFrame:
    """I5: MERGE-style ledger upsert — the next stable manifest via ONE
    full-outer equi-join on the ledger key (cheap at 100 TB: the ledger
    is rows-per-FILE, not rows-per-record; Spark plans full-outer as a
    sort-merge on the tiny frame, no broadcast variant exists).

    Semantics (the warehouse MERGE idiom, re-expressed declaratively):

    - present only in ``current``            → ``NEW``, first_seen = epoch
    - present only in ``previous``           → ``DELETED`` tombstone
      (fingerprint + first_seen carried so the tombstone stays
      auditable; tombstones persist across later merges)
    - in both, previous row was ``DELETED``  → ``NEW`` (a reappearing
      file is re-ingested — downstream may have dropped its outputs)
    - in both, fingerprints equal            → ``UNCHANGED``
    - in both, fingerprints differ           → ``CHANGED`` (first_seen
      KEPT from the previous row — the MERGE point; wholesale
      replacement would reset provenance every run)

    Column contract: both sides need (source_file, fingerprint);
    ``first_seen``/``status`` on previous and the stat columns
    (file_size_bytes, mtime_ns) on either side are optional and carried
    through with current-side precedence.
    """
    cur_cols = set(current.columns)
    if previous is None:
        out = current.withColumn("status", F.lit("NEW")).withColumn(
            "first_seen", F.lit(epoch)
        )
        return out
    prev_cols = set(previous.columns)
    stat_cols = [c for c in ("file_size_bytes", "mtime_ns") if c in cur_cols or c in prev_cols]
    # duplicate-key previous rows (a corrupted/hand-edited ledger) are
    # collapsed DETERMINISTICALLY: keep the lexicographically-smallest
    # fingerprint's row per file. A bare dropDuplicates keeps an
    # arbitrary row (orderBy before it guarantees nothing), which would
    # let the same input classify CHANGED on one run and UNCHANGED on
    # the next.
    w_dedup = Window.partitionBy("source_file").orderBy(
        *[F.col(c) for c in previous.columns if c != "source_file"]
    )
    prev = (
        previous.withColumn("_rk", F.row_number().over(w_dedup))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    prev_sel = [F.col("source_file"), F.col("fingerprint").alias("prev_fingerprint")]
    prev_sel.append(
        (F.col("first_seen") if "first_seen" in prev_cols else F.lit(None).cast("string"))
        .alias("prev_first_seen")
    )
    prev_sel.append(
        (F.col("status") if "status" in prev_cols else F.lit(None).cast("string"))
        .alias("prev_status")
    )
    for c in stat_cols:
        prev_sel.append(
            (F.col(c) if c in prev_cols else F.lit(None).cast("long")).alias(f"prev_{c}")
        )
    cur_sel = [F.col("source_file"), F.col("fingerprint").alias("cur_fingerprint")]
    for c in stat_cols:
        cur_sel.append(
            (F.col(c) if c in cur_cols else F.lit(None).cast("long")).alias(f"cur_{c}")
        )
    merged = current.select(*cur_sel).join(
        prev.select(*prev_sel), "source_file", "full_outer"
    )
    status = (
        F.when(F.col("prev_fingerprint").isNull(), "NEW")
        .when(F.col("cur_fingerprint").isNull(), "DELETED")
        .when(F.col("prev_status") == "DELETED", "NEW")
        .when(F.col("cur_fingerprint") == F.col("prev_fingerprint"), "UNCHANGED")
        .otherwise("CHANGED")
    )
    out_cols = [F.col("source_file")]
    for c in stat_cols:
        out_cols.append(F.coalesce(f"cur_{c}", f"prev_{c}").alias(c))
    # a file that reappears after a DELETED tombstone is RE-ingested:
    # its first_seen is THIS epoch (the NEW contract), not the
    # tombstone-era provenance it abandoned
    reappeared = (
        F.col("cur_fingerprint").isNotNull() & (F.col("prev_status") == "DELETED")
    )
    out_cols += [
        F.coalesce("cur_fingerprint", "prev_fingerprint").alias("fingerprint"),
        status.alias("status"),
        F.when(reappeared, F.lit(epoch))
        .otherwise(F.coalesce("prev_first_seen", F.lit(epoch)))
        .alias("first_seen"),
    ]
    return merged.select(*out_cols)


def read_manifest_ledger(
    spark: SparkSession, ledger_dir: str, epoch: str | None = None
) -> DataFrame | None:
    """Read a ledger snapshot. Default: the live one via the
    atomically-swapped CURRENT pointer (None when no ledger exists
    yet). Pass ``epoch`` to TIME-TRAVEL to the snapshot a past
    promotion produced — old snapshot directories are retained and the
    HISTORY log maps epoch -> snapshot, so an auditor can reproduce
    exactly what any earlier incremental run saw. Unknown epochs fail
    loudly listing what exists."""
    import json

    if epoch is not None:
        hist_path = os.path.join(ledger_dir, "HISTORY")
        if not os.path.exists(hist_path):
            raise ValueError(f"no HISTORY log in {ledger_dir!r}")
        with open(hist_path, encoding="utf-8") as fh:
            doc = json.load(fh)
        # later promotions may reuse an epoch label: the LAST entry wins,
        # matching CURRENT's view of that epoch
        by_epoch = {h["epoch"]: h["snapshot"] for h in doc["snapshots"]}
        if epoch not in by_epoch:
            if epoch in doc.get("pruned", []):
                raise ValueError(
                    f"epoch {epoch!r} was pruned by the ledger retention "
                    f"policy (retained: {sorted(by_epoch)})"
                )
            n_pruned = doc.get("pruned_count", len(doc.get("pruned", [])))
            hint = (
                f"; {n_pruned} older epochs were pruned by retention "
                "(the recent pruned names are tracked, older ones only counted)"
                if n_pruned > len(doc.get("pruned", []))
                else ""
            )
            raise ValueError(
                f"epoch {epoch!r} not in ledger history "
                f"(have: {sorted(by_epoch)}{hint})"
            )
        return spark.read.parquet(os.path.join(ledger_dir, by_epoch[epoch]))
    cur = os.path.join(ledger_dir, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur, encoding="utf-8") as fh:
        snap = json.load(fh)["snapshot"]
    return spark.read.parquet(os.path.join(ledger_dir, snap))


#: bound on the exact-name pruned-epoch window kept in HISTORY —
#: beyond it, pruned epochs are only counted (pruned_count), keeping the
#: metadata file O(retain_epochs + _PRUNED_KEEP) forever
_PRUNED_KEEP = 64


def promote_manifest(
    spark: SparkSession,
    files: list[str],
    ledger_dir: str,
    epoch: str,
    retain_epochs: int | None = None,
    compact_target_mb: int | None = None,
) -> DataFrame:
    """I3+I5 ledger promotion: fingerprint the current file set, MERGE
    it into the persisted ledger (keeping first_seen, emitting DELETED
    tombstones — ``merge_manifest``), write the next snapshot to a
    fresh directory and atomically swap the CURRENT pointer (the
    _last_checkpoint idiom: a reader mid-promotion sees either the old
    snapshot or the new one, never a half-written directory).
    Replaces the pre-r8 wholesale snapshot replacement. Returns the
    merged ledger read back from the new snapshot.

    Concurrency: HISTORY is a read-modify-write, so promotion takes an
    exclusive lockfile (O_EXCL create of ``LOCK``) for the whole
    promote — a second concurrent promotion fails loudly instead of
    silently dropping the first one's HISTORY entry. Readers never take
    the lock (CURRENT/HISTORY swap atomically via temp+rename). A
    crashed promotion leaves a stale LOCK; the error message names it
    so an operator can remove it after confirming no promoter runs.

    Retention: at nightly-promotion cadence the ledger dir otherwise
    grows one snapshot per run, forever. ``retain_epochs=N`` keeps the
    newest N HISTORY entries (the new one included), deletes older
    snapshot directories, and records their epochs under ``pruned`` so
    a time-travel read of a pruned epoch fails loudly with the real
    reason. CURRENT always points at the newest snapshot, which
    retention never touches (N >= 1 enforced).

    Snapshot layout: by default the snapshot writes as ONE file
    (coalesce(1) — right for metadata-scale ledgers). At 100-TB file
    grain a ledger is itself a big table and a single-writer coalesce
    becomes the promotion bottleneck; ``compact_target_mb=M`` instead
    writes the merge at natural parallelism and compacts the snapshot
    to ~M-MiB files RANGE-SORTED ON source_file (compact_parquet_dir), so
    per-file point lookups prune row groups by min/max source_file stats. The
    ledger CONTENT is identical either way."""
    import json
    import shutil
    import uuid

    from pipeline_mf_etl_spark.sources.writers import write_json_artifact

    if retain_epochs is not None and retain_epochs < 1:
        raise ValueError("retain_epochs must be >= 1 (CURRENT must survive)")
    lock_path = os.path.join(ledger_dir, "LOCK")
    os.makedirs(ledger_dir, exist_ok=True)
    try:
        lock_fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"ledger {ledger_dir!r} is locked by a concurrent promotion "
            f"(or a crashed one left {lock_path!r} behind — remove it "
            "after confirming no promoter is running)"
        ) from None
    try:
        os.write(lock_fd, f"epoch={epoch} pid={os.getpid()}\n".encode())
        os.close(lock_fd)
        previous = read_manifest_ledger(spark, ledger_dir)
        current = build_manifest(spark, files)
        merged = merge_manifest(current, previous, epoch=epoch)
        snap = f"snapshot-{uuid.uuid4().hex}"
        snap_path = os.path.join(ledger_dir, snap)
        if compact_target_mb is None:
            merged.coalesce(1).write.mode("error").parquet(snap_path)
        else:
            from pipeline_mf_etl_spark.sources.writers import compact_parquet_dir

            tmp_path = snap_path + ".inprogress"
            merged.write.mode("error").parquet(tmp_path)
            compact_parquet_dir(
                spark, tmp_path, snap_path,
                target_mb=compact_target_mb, sort_cols=["source_file"],
            )
            shutil.rmtree(tmp_path)
        # append to the epoch->snapshot HISTORY log BEFORE swapping CURRENT
        # (the Iceberg metadata-log idiom): every snapshot CURRENT can name
        # is already in HISTORY, so time-travel reads never race promotion.
        # Both files swap atomically (write_json_artifact = temp+rename).
        hist_path = os.path.join(ledger_dir, "HISTORY")
        history, pruned, pruned_count = [], [], 0
        if os.path.exists(hist_path):
            with open(hist_path, encoding="utf-8") as fh:
                doc = json.load(fh)
            history = doc["snapshots"]
            pruned = doc.get("pruned", [])
            pruned_count = doc.get("pruned_count", len(pruned))
        history.append({"snapshot": snap, "epoch": epoch})
        drop: list[dict] = []
        if retain_epochs is not None and len(history) > retain_epochs:
            drop = history[: len(history) - retain_epochs]
            history = history[len(history) - retain_epochs :]
            pruned.extend(h["epoch"] for h in drop)
            pruned_count += len(drop)
            # the pruned list itself must stay BOUNDED (otherwise the
            # metadata file re-grows one entry per nightly promotion,
            # the problem retention exists to fix): keep the most
            # recent window for exact-name diagnostics, carry the
            # total as a counter so older reads still say "pruned,
            # not unknown" in aggregate
            if len(pruned) > _PRUNED_KEEP:
                pruned = pruned[-_PRUNED_KEEP:]
        write_json_artifact(
            {"snapshots": history, "pruned": pruned, "pruned_count": pruned_count},
            hist_path,
        )
        write_json_artifact(
            {"snapshot": snap, "epoch": epoch}, os.path.join(ledger_dir, "CURRENT")
        )
        # physical deletion LAST, after the metadata swap: a reader that
        # resolved an old snapshot before the swap races only the rm, and
        # the HISTORY it can re-read already explains the pruning
        kept = {h["snapshot"] for h in history}
        for h in drop:
            if h["snapshot"] not in kept:  # epoch labels may be reused
                shutil.rmtree(os.path.join(ledger_dir, h["snapshot"]), ignore_errors=True)
    finally:
        os.unlink(lock_path)
    return spark.read.parquet(os.path.join(ledger_dir, snap))


def manifest_rollups(manifest: DataFrame) -> DataFrame:
    """I4: status rollup (reference ingest/manifest.py:202-224)."""
    return manifest.groupBy("status").count().orderBy("status")
