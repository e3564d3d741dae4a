#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{name: sec}, "sf": ...}.

Each query is forced to full execution by hash-aggregating every output
column — a bare count() would let Catalyst prune the plan to a scan.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import time

from pyspark.sql import functions as F

from pipeline_mf_etl_spark.queries import all_queries
from pipeline_mf_etl_spark.session import get_spark

# One headline query per operator family (SURVEY.md §2 groups).
HEADLINE = (
    "a1_grouped_stats",       # grouped aggregation core
    "j6_overlay_coverage",    # join + coverage rollup
    "s3_pushdown_scan",       # scan with pushed filters/pruning
    "w2_rolling_stats",       # per-key ordered windows
    "w6_run_length",          # two-window run-length idiom
    "w14_forward_labels",     # lead windows + guarded stddev
    "p2_p3_quality_flags",    # validation flag stack
    "m2_per_group_scaler",    # grouped-stats + join normalize
    "d2_minhash_lsh",         # MinHash+LSH near-dup
    "t2_quality_score",       # text quality scoring
    "e1_ann_bruteforce",      # brute-force cosine top-k
    "w3_ewm_wilder",          # applyInPandas EWM island
    "b6_trade_sim",           # sequential per-series simulation
    "st1_tumbling_daily",     # event-time tumbling windows
    # added round 4 (totals before r4 cover the first 14 only)
    "v1_tmf_tti_panel",       # viewer panel: 4 RMAs in one island pass
    # added round 5 (r4-comparable subtotal = first 15)
    "e6_ann_ivfpq",           # production ANN: IVF-PQ encode+ADC search
    "d7_curation_waterfall",  # end-to-end 5-stage corpus curation
    "t9_trigram_lm",          # corpus-trained trigram LM quality score
    "v4_hmm_ribbon",          # HMM decode ribbon (persisted-fit family)
    # added late round 5 (r5-comparable subtotal = first 19)
    "r1_bm25_topk",           # BM25: inverted postings + broadcast scoring
    "t12_bpe_tokenize",       # BPE train (word-count reduce) + encode
    "g1_pagerank_neardup",    # PageRank rounds over the pair graph
    # added round 8 (r7-comparable subtotal = first 22)
    "mm13_jpeg_decode",       # baseline JPEG entropy decode + IDCT pass
    "d10_record_linkage",     # masked-position blocked entity resolution
    # added round 9 (r8-comparable subtotal = first 24)
    "mm13b_jpeg_color",       # 4:2:0 interleaved color JPEG decode
    "mm15_mjpeg_decode",      # MP4 demux composed with per-frame JPEG decode
    # added round 10 (r9-comparable subtotal = first 26)
    "mm12b_png_color",        # color/palette/Adam7 PNG decode
    "mm21_h264_probe",        # H.264 NAL walk + SPS parse routing probe
    "mm22_avc1_route",        # avc1-in-MP4 demux + avcC/stss routing
    "mm23_aac_route",         # mp4a/AAC-in-MP4 esds audio routing
    "mm24_hevc_route",        # hvc1/HEVC-in-MP4 hvcC routing
    # added round 11 (r10-comparable subtotal = first 31): the corpus-
    # ingestion + codec family registered this round
    "c1_warc_extract",        # WARC gzip-member split + HTTP/HTML extract
    "c2_zip_extract",         # ZIP central-directory walk + DEFLATE
    "c3_pdf_extract",         # PDF xref/object walk + content-stream text
    "c4_avro_extract",        # Avro object-container zigzag-varint decode
    "t15_html_extract",       # pure-JVM HTML boilerplate strip
    "wd1_webdataset_roundtrip",  # tar shard build + loader round-trip
    "mm25_flac_decode",       # FLAC rice/predictor decode + CRC/MD5
    "mm26_mp3_probe",         # MP3 frame walk + ID3v2 skip
    "mm27_tiff_probe",        # TIFF/EXIF IFD chain walk
    "mm28_webp_probe",        # WebP VP8/VP8L/VP8X header routing
    "mm29_webm_probe",        # WebM/Matroska EBML walk
    "mm27b_tiff_decode",      # baseline-TIFF strip pixel decode
    "mm28b_webp_lossless_decode",  # full VP8L bitstream decode
    "t16_url_canonicalize",   # pure-JVM URL canonicalization
    "d12_url_domain_rollup",  # per-domain canonical-URL dedup rollup
    "c5_lz4_extract",         # LZ4 frame decode + xxh32 verification
    "c6_snappy_extract",      # framed Snappy decode + CRC-32C verification
    # added round 12 (r11-comparable subtotal = first 48)
    "c7_zstd_extract",        # zstd FSE+Huffman frame decode + xxh64
    "c8_seekable_extract",    # seekable-zstd range reads (partial decode)
    # added round 13 (r12-comparable subtotal = first 50)
    "c9_bzip2_extract",       # multistream bzip2 decode + CRC verification
    "c11_xz_extract",         # xz/LZMA2 range-coder decode (liblzma synth)
    # added round 14 (r13-comparable subtotal = first 52)
    "c12_bz2_dump_lookup",    # bzip2 dump-index write + per-stream lookups
    "c13_tfrecord_lookup",    # TFRecord shard write + per-record lookups
    "c14_arrow_lookup",       # Arrow IPC shard write + footer block lookups
    "c15_safetensors_lookup", # safetensors shard write + row range lookups
    "c16_npz_lookup",         # npz shard write + member offset row lookups
)

# Codec queries conflate SYNTHESIS (encoding the test payload) with the
# phase a production corpus actually pays — DECODE (r9 verdict task 2).
# For each, bench the two phases separately: encode = forcing the
# synthesis plan alone; decode = forcing the feature pass over payloads
# PERSISTED once under .artifacts/bench_payloads (so the decode number
# contains zero synthesis). The headline rows keep the combined time
# for round-over-round comparability; "codec_phases" carries the split.
CODEC_PHASES = (
    "mm13_jpeg_decode",
    "mm13b_jpeg_color",
    "mm15_mjpeg_decode",
    "mm12b_png_color",
    "c7_zstd_extract",
    "c9_bzip2_extract",
)


def _codec_phase_specs():
    from pipeline_mf_etl_spark.operators.multimodal import (
        decode_jpeg_color_features,
        decode_jpeg_features,
        decode_mp4_mjpeg_features,
        decode_png_color_features,
        with_jpeg_color_payload,
        with_jpeg_payload,
        with_mjpeg_mp4_payload,
        with_png_color_payload,
    )
    from pipeline_mf_etl_spark.sources.readers import fan_out, load_table

    def docs(spark, sf_dir):
        # same small-input fan-out the registered queries use: without
        # it both phases (and the persisted payload parquet the decode
        # phase reads back) inherit the test table's single row group
        # and run on one core
        return fan_out(load_table(spark, sf_dir, "documents"))

    return {
        "mm13_jpeg_decode": (
            lambda s, d: with_jpeg_payload(docs(s, d)),
            decode_jpeg_features,
        ),
        "mm13b_jpeg_color": (
            lambda s, d: with_jpeg_color_payload(docs(s, d)),
            decode_jpeg_color_features,
        ),
        "mm15_mjpeg_decode": (
            lambda s, d: with_mjpeg_mp4_payload(docs(s, d)),
            decode_mp4_mjpeg_features,
        ),
        "mm12b_png_color": (
            lambda s, d: with_png_color_payload(docs(s, d)),
            decode_png_color_features,
        ),
        "c7_zstd_extract": (
            lambda s, d: _with_zstd(docs(s, d)),
            _extract_zstd,
        ),
        "c9_bzip2_extract": (
            lambda s, d: _with_bz2(docs(s, d)),
            _extract_bz2,
        ),
    }


def _with_zstd(df):
    from pipeline_mf_etl_spark.sources.zstdframe import with_zstd_payload

    return with_zstd_payload(df)


def _extract_zstd(df):
    from pipeline_mf_etl_spark.sources.zstdframe import extract_zstd_documents

    return extract_zstd_documents(df)


def _with_bz2(df):
    from pipeline_mf_etl_spark.sources.bzip2 import with_bzip2_payload

    return with_bzip2_payload(df)


def _extract_bz2(df):
    from pipeline_mf_etl_spark.sources.bzip2 import extract_bzip2_documents

    return extract_bzip2_documents(df)


def _force(df) -> int:
    """Fully execute the plan: aggregate a hash of every column so no
    column/row can be pruned away, then count."""
    hashed = df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
    row = hashed.agg(F.count("h"), F.expr("bit_xor(h)")).collect()[0]
    return int(row[0])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    specs = all_queries()
    timings: dict[str, float] = {}

    # Warm the JVM/session on the smallest data so one-time startup costs
    # (JIT, parquet-footer caching, Python worker + Arrow serializer
    # spin-up for the pandas islands) don't pollute the first measured
    # number of whichever query happens to run first.
    _force(specs["a1_grouped_stats"].spark(spark, "/root/testdata/sf0.001"))
    _force(specs["w3_ewm_wilder"].spark(spark, "/root/testdata/sf0.001"))
    _force(specs["d2_minhash_lsh"].spark(spark, "/root/testdata/sf0.001"))
    # higher-order-function codegen (zip_with/aggregate cosine) is its own
    # JIT surface — warm it so e1 measures the scoring plan, not codegen
    _force(specs["e1_ann_bruteforce"].spark(spark, "/root/testdata/sf0.001"))

    # Pair-export cost visibility (r14 verdict task 2): the MinHash
    # verified-pair export is computed at most once per (process, sf)
    # and consumed by d7/g1 (HEADLINE) plus d6/d9/o11/g2/g3 — inside the
    # timed loop, run 1 of the FIRST consumer paid the whole chain +
    # parquet round-trip and min-of-3 then structurally excluded the
    # most expensive subplan in the repo from every published number.
    # Build it once HERE, timed, and publish the cost as its own field
    # ("export_build_sec" in the final JSON): every d7/g1 sample now
    # times the consumer's own plan (as min-of-3 already effectively
    # did), and the chain's real cost is visible instead of buried in a
    # discarded max. The export is still computed fresh from the
    # parquet inputs by THIS process — nothing crosses invocations.
    from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

    t0 = time.perf_counter()
    verified_pairs_export(spark, sf_dir)
    export_build_sec = round(time.perf_counter() - t0, 3)

    # Three timed executions per query, keep the MIN (timeit-style): on
    # a shared box single-shot numbers swing ±30% with unrelated load;
    # the min is the cleanest estimate of the plan's actual cost.
    # Disclosed in the output ("runs"/"agg") so rounds are compared
    # knowingly.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # Host-speed calibration: two fixed data-independent JVM jobs.
    # (1) codegen sum over a generated range — pure whole-stage-codegen
    # arithmetic; (2) a shuffle+window job (r6 verdict task 7) that
    # exercises a real exchange, a per-key ordered window and its sort,
    # the machinery shuffle/window-shaped queries actually spend time
    # in. Rounds run on a shared virtualized box whose effective speed
    # shifts between boots AND within a session (the r12 bench ran next
    # to a test suite and printed a phantom +9.6%), so the probes are
    # INTERLEAVED with the headline loop — one sample of each before
    # the loop, between every full round, and after — and the MEDIAN is
    # published: a contended stretch mid-run then moves the calibrator
    # with the queries it poisoned instead of being missed entirely
    # (r12 verdict task 2).
    def _calib_range_once() -> float:
        t0 = time.perf_counter()
        spark.range(1_000_000_000).selectExpr("sum(id * 2)").collect()
        return time.perf_counter() - t0

    def _calib_sw_once() -> float:
        t0 = time.perf_counter()
        (
            spark.range(20_000_000)
            .selectExpr("id % 100000 AS k", "id % 977 AS v")
            .selectExpr(
                "k",
                "SUM(v) OVER (PARTITION BY k ORDER BY v "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s",
            )
            .selectExpr("COUNT(*)", "SUM(s)")
            .collect()
        )
        return time.perf_counter() - t0

    calib_samples: list[float] = [_calib_range_once()]
    calib_sw_samples: list[float] = [_calib_sw_once()]

    # INTERLEAVED rounds (all queries once per round, then repeat):
    # back-to-back repetitions of one query sit inside the same
    # noise window on a shared host, so a multi-minute neighbor burst
    # poisons all of a query's samples at once; spreading each query's
    # samples across the full run makes min-of-N actually robust.
    best: dict[str, float] = {}
    for _ in range(runs):
        for name in HEADLINE:
            spec = specs.get(name)
            if spec is None:
                continue
            t0 = time.perf_counter()
            _force(spec.spark(spark, sf_dir))
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, dt), dt)
        calib_samples.append(_calib_range_once())
        calib_sw_samples.append(_calib_sw_once())
    # MIN is the cross-round calibrator (all prior rounds published
    # min-of-3, and min isolates the host's clean speed); the MEDIAN of
    # the interleaved samples is published alongside as the contention
    # signal — a median far above min means the run was contended and
    # the raw totals should be read accordingly.
    calib = min(calib_samples)
    calib_sw = min(calib_sw_samples)
    calib_median = statistics.median(calib_samples)
    calib_sw_median = statistics.median(calib_sw_samples)
    total = 0.0
    for name in HEADLINE:
        if name in best:
            timings[name] = round(best[name], 3)
            total += best[name]

    # Calibration-normalized timings (r7 verdict task 8): each query's
    # min-sec divided by the calibrator matching its plan shape, so
    # round-over-round deltas separate host drift from code changes
    # without judge-side arithmetic. Scan/arithmetic-bound queries
    # (pushdown scan, map-only text scoring, broadcast HOF cosine)
    # normalize by the codegen range-sum; everything else — shuffles,
    # windows, joins, pandas islands — by the shuffle+window job, which
    # exercises the exchange/sort/GC machinery those plans live in.
    scan_shaped = {"s3_pushdown_scan", "t2_quality_score", "e1_ann_bruteforce"}
    normalized = {
        name: round(sec / (calib if name in scan_shaped else calib_sw), 3)
        for name, sec in timings.items()
    }

    # Codec encode/decode phase split (r9 verdict task 2): persist each
    # codec query's payloads once, then time decode ALONE — the number
    # a production corpus (which arrives already encoded) actually pays.
    # The mm16 header probe runs on mm13b's persisted payloads too, so
    # "probe is near-free vs decode" becomes a same-payload measurement.
    from pipeline_mf_etl_spark.sources.readers import fan_out as _fo

    def _fan_out_read(spark, path):
        return _fo(spark.read.parquet(path))

    phase_specs = _codec_phase_specs()
    codec_phases: dict[str, dict[str, float]] = {}
    payload_dirs: dict[str, str] = {}
    for name in CODEC_PHASES:
        synth, decode = phase_specs[name]
        best_e = None
        for _ in range(runs):
            t0 = time.perf_counter()
            _force(synth(spark, sf_dir).select("doc_id", "payload"))
            dt = time.perf_counter() - t0
            best_e = dt if best_e is None else min(best_e, dt)
        pay = f".artifacts/bench_payloads/{name}/sf{sf}"
        synth(spark, sf_dir).select("doc_id", "payload").write.mode(
            "overwrite"
        ).parquet(pay)
        payload_dirs[name] = pay
        best_d = None
        for _ in range(runs):
            t0 = time.perf_counter()
            _force(decode(_fan_out_read(spark, pay)))
            dt = time.perf_counter() - t0
            best_d = dt if best_d is None else min(best_d, dt)
        codec_phases[name] = {
            "encode_sec": round(best_e, 3),
            "decode_sec": round(best_d, 3),
        }
    from pipeline_mf_etl_spark.operators.multimodal import probe_jpeg_features

    best_p = None
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(
            probe_jpeg_features(
                _fan_out_read(spark, payload_dirs["mm13b_jpeg_color"]),
                null_width=128,
                null_components=3,
            )
        )
        dt = time.perf_counter() - t0
        best_p = dt if best_p is None else min(best_p, dt)
    codec_phases["mm16_probe_on_mm13b_payloads"] = {"decode_sec": round(best_p, 3)}

    # Round-comparability anchors (r9 verdict task 8): the headline set
    # grew 14 -> 48 across rounds; these fields make the 2x-of-baseline
    # check and the round-over-round delta each ONE number.
    comparable_14 = [n for n in HEADLINE[:14] if n in timings]
    comparable_14_total = round(sum(timings[n] for n in comparable_14), 3)
    comparable_31 = [n for n in HEADLINE[:31] if n in timings]
    comparable_31_total = round(sum(timings[n] for n in comparable_31), 3)
    # pins the r11 48-query headline so the r12+ delta is one line
    comparable_48 = [n for n in HEADLINE[:48] if n in timings]
    comparable_48_total = round(sum(timings[n] for n in comparable_48), 3)
    # pins the r12 50-query headline (adds c7/c8) for the r13+ delta
    comparable_50 = [n for n in HEADLINE[:50] if n in timings]
    comparable_50_total = round(sum(timings[n] for n in comparable_50), 3)
    shared_prev = None
    import glob

    prev_files = sorted(
        glob.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    # Walk back to the newest round whose bench output the driver
    # actually parsed (r10's final line outgrew the driver's tail
    # window, leaving "parsed": null — the reason the detail sections
    # now live in .artifacts/bench_detail.json, not the final line).
    for prev_path in reversed(prev_files):
        with open(prev_path, encoding="utf-8") as fh:
            prev = json.load(fh)
        prev = prev.get("parsed", prev) or {}
        if not prev.get("queries"):
            continue
        inter = [n for n in timings if n in prev["queries"]]
        shared_prev = {
            "prev_file": os.path.basename(prev_path),
            "n_queries": len(inter),
            "this_total": round(sum(timings[n] for n in inter), 3),
            "prev_total": round(sum(prev["queries"][n] for n in inter), 3),
        }
        # Calibration-normalized pair (r12 verdict task 2): divide each
        # query by the shape-matched calibrator of ITS OWN round, so a
        # session-speed shift moves both sides together and the ratio
        # isolates code changes. Only possible when the prev round
        # published both calibrators.
        pc, pcsw = prev.get("calib_range_sum_sec"), prev.get(
            "calib_shuffle_window_sec"
        )
        if pc and pcsw:
            shared_prev["this_total_normalized"] = round(
                sum(
                    timings[n] / (calib if n in scan_shaped else calib_sw)
                    for n in inter
                ),
                3,
            )
            shared_prev["prev_total_normalized"] = round(
                sum(
                    prev["queries"][n] / (pc if n in scan_shaped else pcsw)
                    for n in inter
                ),
                3,
            )
        break

    # Bulky diagnostic sections (normalized timings, codec phase split)
    # go to a detail file + an EARLIER stdout line; the FINAL line stays
    # compact so the driver's tail-capture window always parses it
    # (r10 verdict nit #1: the r10 final line outgrew that window).
    detail = {
        "normalized_queries": normalized,
        "normalized_by": {
            "calib_range_sum_sec": sorted(scan_shaped),
            "calib_shuffle_window_sec": "all others",
        },
        "codec_phases": codec_phases,
    }
    os.makedirs(".artifacts", exist_ok=True)
    with open(".artifacts/bench_detail.json", "w", encoding="utf-8") as fh:
        json.dump(detail, fh)
    print(json.dumps({"bench_detail": detail}))

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": runs,
        "agg": "min",
        "calib_range_sum_sec": round(calib, 3),
        "calib_shuffle_window_sec": round(calib_sw, 3),
        "calib_range_sum_median_sec": round(calib_median, 3),
        "calib_shuffle_window_median_sec": round(calib_sw_median, 3),
        # once-per-(process, sf) MinHash pair-export chain, built before
        # the timed loop — the cost d7/g1's min-of-3 amortizes away
        "export_build_sec": export_build_sec,
        "comparable_14_total": comparable_14_total,
        "comparable_31_total": comparable_31_total,
        "comparable_48_total": comparable_48_total,
        "comparable_50_total": comparable_50_total,
        "shared_prev_round_total": shared_prev,
    }))


if __name__ == "__main__":
    main()
