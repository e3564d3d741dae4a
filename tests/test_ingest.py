"""Bronze ingest path end-to-end on synthetic TXT fixtures: S2 reader
with rejects side-channel, P1 normalize, P2 quality flags, I1-I4
manifest classification (SURVEY.md §3.1)."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from pipeline_mf_etl_spark.sources.ingest import (
    build_manifest,
    classify_manifest,
    discover_txt_files,
    manifest_rollups,
    normalize_bronze,
    quality_flags,
    read_txt_with_rejects,
    select_for_processing,
    sniff_delimiter,
)

GOOD = """<TICKER>,<PER>,<DATE>,<TIME>,<OPEN>,<HIGH>,<LOW>,<CLOSE>,<VOL>
AAA,D,20240102,0,10.0,11.0,9.5,10.5,1000
AAA,D,20240103,0,10.5,12.0,10.0,11.5,1200
AAA,D,20240115,0,11.5,16.0,11.0,15.5,900
"""

BAD = """BBB,D,20240102,0,5.0,4.0,6.0,5.5,-10
BBB,D,20240102,0,5.0,6.0,4.0,5.5,100
garbage line without enough columns
BBB,D,20240104,0,5.5,7.0,5.0,6.5
"""


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw") / "nasdaq stocks"
    d.mkdir(parents=True)
    (d / "aaa.txt").write_text(GOOD)
    (d / "bbb.txt").write_text(BAD)
    return d.parent


def test_discover_and_sniff(raw_dir):
    found = discover_txt_files(str(raw_dir))
    assert [f["ticker_hint"] for f in found] == ["AAA", "BBB"]
    assert all(f["exchange"] == "NASDAQ" for f in found)
    assert sniff_delimiter(found[0]["source_file"]) == ","


def test_read_normalize_flags(spark, raw_dir):
    files = [f["source_file"] for f in discover_txt_files(str(raw_dir))]
    valid, rejects = read_txt_with_rejects(spark, files)
    rej = rejects.collect()
    # one garbage line and one short row land in the side-channel
    assert len(rej) == 2
    assert all(r["reason"] == "BAD_COLUMNS" for r in rej)

    bronze = quality_flags(normalize_bronze(valid))
    collected = bronze.collect()
    assert len(collected) == 5  # 3 AAA + 2 BBB (duplicate date kept as rows)
    rows = {(r["ticker"], str(r["trade_date"])): r for r in collected}
    aaa = rows[("AAA", "2024-01-02")]
    assert aaa["timeframe"] == "D1" and aaa["is_valid_row"]
    # 12-day calendar gap on the third AAA bar (warn, still valid)
    gap = rows[("AAA", "2024-01-15")]
    assert gap["q_gap_in_calendar"] and gap["is_valid_row"]
    assert gap["q_suspicious_bar"]  # 15.5/11.5-1 > 0.3
    # BBB 2024-01-02 appears twice → duplicate flag on both; the bar
    # with high<low and negative volume is invalid
    bbb = [r for r in collected if r["ticker"] == "BBB" and str(r["trade_date"]) == "2024-01-02"]
    assert len(bbb) == 2 and all(r["q_duplicate_ticker_date"] for r in bbb)
    bad = next(r for r in bbb if r["volume"] < 0)
    assert bad["q_high_lt_low"] and bad["q_negative_volume"] and not bad["is_valid_row"]


def test_manifest_classify(spark, raw_dir):
    files = [f["source_file"] for f in discover_txt_files(str(raw_dir))]
    prev = build_manifest(spark, files)
    assert classify_manifest(prev, None).filter("status <> 'NEW'").count() == 0

    # touch one file with different content → CHANGED
    time.sleep(0.01)
    with open(files[0], "a") as fh:
        fh.write("AAA,D,20240116,0,15.5,16.0,15.0,15.8,500\n")
    os.utime(files[0])
    curr = build_manifest(spark, files)
    classified = classify_manifest(curr, prev)
    status = {r["source_file"]: r["status"] for r in classified.collect()}
    assert status[files[0]] == "CHANGED"
    assert status[files[1]] == "UNCHANGED"

    sel = select_for_processing(classified)
    assert [r["source_file"] for r in sel.collect()] == [files[0]]
    roll = {r["status"]: r["count"] for r in manifest_rollups(classified).collect()}
    assert roll == {"CHANGED": 1, "UNCHANGED": 1}


def test_promote_manifest_merge_across_runs(spark, tmp_path):
    """I5 wired into the REAL promotion path: across three promotions the
    persisted ledger must (a) keep first_seen through CHANGED updates,
    (b) emit a DELETED tombstone when a file vanishes, (c) persist the
    tombstone on later runs, (d) re-ingest a reappearing file as NEW,
    and (e) swap snapshots atomically via the CURRENT pointer."""
    import json

    from pipeline_mf_etl_spark.sources.ingest import (
        merge_manifest,
        promote_manifest,
        read_manifest_ledger,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    fa, fb, fc = (str(raw / n) for n in ("a.txt", "b.txt", "c.txt"))
    for f in (fa, fb, fc):
        with open(f, "w") as fh:
            fh.write("AAA,D,20240102,0,10.0,11.0,9.5,10.5,1000\n")
    ledger = str(tmp_path / "ledger")

    # run 1: everything NEW at epoch e1
    m1 = promote_manifest(spark, [fa, fb, fc], ledger, epoch="e1")
    rows1 = {r["source_file"]: r for r in m1.collect()}
    assert {r["status"] for r in rows1.values()} == {"NEW"}
    assert {r["first_seen"] for r in rows1.values()} == {"e1"}

    # run 2: a changed, b unchanged, c deleted
    time.sleep(0.01)
    with open(fa, "a") as fh:
        fh.write("AAA,D,20240103,0,10.5,12.0,10.0,11.5,1200\n")
    os.utime(fa)
    m2 = promote_manifest(spark, [fa, fb], ledger, epoch="e2")
    rows2 = {r["source_file"]: r for r in m2.collect()}
    assert rows2[fa]["status"] == "CHANGED"
    assert rows2[fa]["first_seen"] == "e1"  # the MERGE point: kept
    assert rows2[fb]["status"] == "UNCHANGED"
    assert rows2[fc]["status"] == "DELETED"
    assert rows2[fc]["fingerprint"] is not None  # tombstone auditable
    # selection never picks tombstones, even with --full
    sel = select_for_processing(m2, full=True)
    assert fc not in [r["source_file"] for r in sel.collect()]

    # run 3: c still absent -> tombstone persists; then c reappears -> NEW
    m3 = promote_manifest(spark, [fa, fb], ledger, epoch="e3")
    rows3 = {r["source_file"]: r for r in m3.collect()}
    assert rows3[fc]["status"] == "DELETED"
    assert rows3[fa]["status"] == "UNCHANGED" and rows3[fa]["first_seen"] == "e1"
    m4 = promote_manifest(spark, [fa, fb, fc], ledger, epoch="e4")
    rows4 = {r["source_file"]: r for r in m4.collect()}
    assert rows4[fc]["status"] == "NEW"  # reappearing file is re-ingested
    # ...and its provenance restarts: first_seen is the RE-ingest epoch,
    # not the tombstone-era e1 (the NEW contract)
    assert rows4[fc]["first_seen"] == "e4"
    assert rows4[fa]["first_seen"] == "e1"  # continuous files keep theirs

    # CURRENT pointer names the live snapshot; older snapshots remain
    with open(os.path.join(ledger, "CURRENT"), encoding="utf-8") as fh:
        ptr = json.load(fh)
    assert ptr["epoch"] == "e4"
    assert os.path.isdir(os.path.join(ledger, ptr["snapshot"]))
    readback = read_manifest_ledger(spark, ledger)
    assert {r["source_file"]: r["status"] for r in readback.collect()} == {
        k: v["status"] for k, v in rows4.items()
    }

    # merge_manifest with no previous snapshot handles the bootstrap
    boot = merge_manifest(build_manifest(spark, [fa]), None, epoch="e0")
    assert boot.collect()[0]["status"] == "NEW"


def test_merge_manifest_duplicate_prev_keys_deterministic(spark):
    """A corrupted/hand-edited previous ledger with duplicate
    source_file rows must collapse DETERMINISTICALLY (smallest
    fingerprint wins), never arbitrarily — the same input must yield
    the same CHANGED/UNCHANGED classification on every run."""
    from pipeline_mf_etl_spark.sources.ingest import merge_manifest

    prev = spark.createDataFrame(
        [("f1", "aaa", "e0"), ("f1", "zzz", "e0"), ("f2", "bbb", "e0")],
        "source_file string, fingerprint string, first_seen string",
    )
    cur = spark.createDataFrame(
        [("f1", "aaa"), ("f2", "ccc")], "source_file string, fingerprint string"
    )
    for _ in range(3):
        rows = {
            r["source_file"]: r
            for r in merge_manifest(cur, prev, epoch="e1").collect()
        }
        # 'aaa' < 'zzz' wins the dup -> f1 is UNCHANGED every run
        assert rows["f1"]["status"] == "UNCHANGED"
        assert rows["f2"]["status"] == "CHANGED"
        assert rows["f2"]["first_seen"] == "e0"


def test_ledger_time_travel_by_epoch(spark, tmp_path):
    """Snapshot time travel: every promotion's snapshot stays readable
    by epoch through the HISTORY log, reproducing exactly what that
    incremental run saw — including pre-tombstone states."""
    import pytest

    from pipeline_mf_etl_spark.sources.ingest import (
        promote_manifest,
        read_manifest_ledger,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    fa, fb = str(raw / "a.txt"), str(raw / "b.txt")
    for f in (fa, fb):
        with open(f, "w") as fh:
            fh.write("AAA,D,20240102,0,10.0,11.0,9.5,10.5,1000\n")
    ledger = str(tmp_path / "ledger")

    promote_manifest(spark, [fa, fb], ledger, epoch="e1")
    promote_manifest(spark, [fa], ledger, epoch="e2")  # b deleted

    e1 = {r["source_file"]: r["status"]
          for r in read_manifest_ledger(spark, ledger, epoch="e1").collect()}
    assert e1 == {fa: "NEW", fb: "NEW"}  # pre-tombstone state preserved
    e2 = {r["source_file"]: r["status"]
          for r in read_manifest_ledger(spark, ledger, epoch="e2").collect()}
    assert e2[fb] == "DELETED"
    # CURRENT still reads the live snapshot
    live = {r["source_file"]: r["status"]
            for r in read_manifest_ledger(spark, ledger).collect()}
    assert live == e2
    with pytest.raises(ValueError, match="e9.*not in ledger history"):
        read_manifest_ledger(spark, ledger, epoch="e9")


def test_ledger_retention_prunes_old_epochs(spark, tmp_path):
    """retain_epochs=N keeps the newest N snapshots: older epochs fail
    loudly as PRUNED (not 'unknown'), their snapshot dirs are deleted,
    and the CURRENT view is unchanged by retention."""
    import json
    import os

    import pytest

    from pipeline_mf_etl_spark.sources.ingest import (
        promote_manifest,
        read_manifest_ledger,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    fa = str(raw / "a.txt")
    with open(fa, "w") as fh:
        fh.write("AAA,D,20240102,0,10.0,11.0,9.5,10.5,1000\n")
    ledger = str(tmp_path / "ledger")

    promote_manifest(spark, [fa], ledger, epoch="e1", retain_epochs=2)
    promote_manifest(spark, [fa], ledger, epoch="e2", retain_epochs=2)
    promote_manifest(spark, [fa], ledger, epoch="e3", retain_epochs=2)

    # e2/e3 retained, e1 pruned with the real reason in the message
    assert read_manifest_ledger(spark, ledger, epoch="e2").count() == 1
    assert read_manifest_ledger(spark, ledger, epoch="e3").count() == 1
    with pytest.raises(ValueError, match="pruned by the ledger retention"):
        read_manifest_ledger(spark, ledger, epoch="e1")
    # a never-promoted epoch still reports 'not in ledger history'
    with pytest.raises(ValueError, match="not in ledger history"):
        read_manifest_ledger(spark, ledger, epoch="e9")

    # e1's snapshot directory is physically gone; exactly 2 remain
    snaps = [d for d in os.listdir(ledger) if d.startswith("snapshot-")]
    assert len(snaps) == 2
    with open(os.path.join(ledger, "HISTORY"), encoding="utf-8") as fh:
        doc = json.load(fh)
    assert [h["epoch"] for h in doc["snapshots"]] == ["e2", "e3"]
    assert doc["pruned"] == ["e1"]

    # CURRENT is untouched by retention
    live = {r["source_file"]: r["status"]
            for r in read_manifest_ledger(spark, ledger).collect()}
    assert live == {fa: "UNCHANGED"}

    with pytest.raises(ValueError, match="retain_epochs must be >= 1"):
        promote_manifest(spark, [fa], ledger, epoch="e4", retain_epochs=0)


def test_ledger_promotion_lock_guards_history(spark, tmp_path):
    """A concurrent (or crashed) promotion is detected via the LOCK
    file: the second promoter fails loudly naming the lock instead of
    silently dropping the first one's HISTORY entry, and a successful
    promotion always releases the lock."""
    import os

    import pytest

    from pipeline_mf_etl_spark.sources.ingest import promote_manifest

    raw = tmp_path / "raw"
    raw.mkdir()
    fa = str(raw / "a.txt")
    with open(fa, "w") as fh:
        fh.write("AAA,D,20240102,0,10.0,11.0,9.5,10.5,1000\n")
    ledger = str(tmp_path / "ledger")

    promote_manifest(spark, [fa], ledger, epoch="e1")
    assert not os.path.exists(os.path.join(ledger, "LOCK"))  # released

    # simulate a concurrent promoter holding the lock
    with open(os.path.join(ledger, "LOCK"), "w") as fh:
        fh.write("epoch=e2 pid=99999\n")
    with pytest.raises(RuntimeError, match="locked by a concurrent promotion"):
        promote_manifest(spark, [fa], ledger, epoch="e2")
    os.unlink(os.path.join(ledger, "LOCK"))

    # after operator intervention promotion proceeds and re-releases
    promote_manifest(spark, [fa], ledger, epoch="e2")
    assert not os.path.exists(os.path.join(ledger, "LOCK"))


def test_ledger_pruned_list_is_bounded(spark, tmp_path, monkeypatch):
    """The pruned-epoch metadata must stay bounded at promotion cadence:
    recent pruned names are kept for exact diagnostics, older ones only
    counted — and a read of an old pruned epoch still explains itself."""
    import json
    import os

    import pytest

    from pipeline_mf_etl_spark.sources import ingest as ing

    monkeypatch.setattr(ing, "_PRUNED_KEEP", 3)
    raw = tmp_path / "raw"
    raw.mkdir()
    fa = str(raw / "a.txt")
    with open(fa, "w") as fh:
        fh.write("AAA,D,20240102,0,10.0,11.0,9.5,10.5,1000\n")
    ledger = str(tmp_path / "ledger")
    for k in range(6):
        ing.promote_manifest(spark, [fa], ledger, epoch=f"e{k}", retain_epochs=1)

    with open(os.path.join(ledger, "HISTORY"), encoding="utf-8") as fh:
        doc = json.load(fh)
    assert [h["epoch"] for h in doc["snapshots"]] == ["e5"]
    assert doc["pruned"] == ["e2", "e3", "e4"]  # bounded window
    assert doc["pruned_count"] == 5  # total survives the cap

    # a recently pruned epoch names itself
    with pytest.raises(ValueError, match="e4.*pruned by the ledger retention"):
        ing.read_manifest_ledger(spark, ledger, epoch="e4")
    # an OLD pruned epoch (outside the window) still explains pruning
    with pytest.raises(ValueError, match="older epochs were pruned"):
        ing.read_manifest_ledger(spark, ledger, epoch="e0")


def test_ledger_promotion_compaction(spark, tmp_path):
    """compact_target_mb promotes through the parallel-write + compact
    path: the snapshot directory ends with FEWER parquet files than the
    merge's natural parallelism wrote, and read_manifest_ledger returns
    exactly the same ledger content as an uncompacted promotion."""
    from pipeline_mf_etl_spark.sources.ingest import (
        promote_manifest,
        read_manifest_ledger,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    files = []
    for i in range(12):
        f = str(raw / f"f{i:02d}.txt")
        with open(f, "w") as fh:
            fh.write("AAA,D,20240102,0,10.0,11.0,9.5,10.5,1000\n")
        files.append(f)

    plain = str(tmp_path / "ledger_plain")
    compacted = str(tmp_path / "ledger_compact")
    promote_manifest(spark, files, plain, epoch="e1")
    promote_manifest(spark, files, compacted, epoch="e1", compact_target_mb=128)

    def snap_files(ledger):
        import json

        with open(os.path.join(ledger, "CURRENT"), encoding="utf-8") as fh:
            snap = json.load(fh)["snapshot"]
        d = os.path.join(ledger, snap)
        return [f for f in os.listdir(d) for _ in [0] if f.endswith(".parquet")]

    # tiny ledger << 128 MiB -> exactly one compacted file, and the
    # in-progress parallel write was cleaned up
    assert len(snap_files(compacted)) == 1
    assert not [d for d in os.listdir(compacted) if d.endswith(".inprogress")]

    cols = ["source_file", "status", "first_seen", "fingerprint"]
    a = sorted(map(tuple, read_manifest_ledger(spark, plain).select(*cols).collect()))
    b = sorted(
        map(tuple, read_manifest_ledger(spark, compacted).select(*cols).collect())
    )
    assert a == b  # identical content either way
