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
