"""Non-ASCII divergence-boundary tests for the byte-length oracle
families (r11 ADVICE follow-through).

Two distinct situations, pinned separately:

1. strlen-based oracles (wd1/c2/c5/c6/c7 sizes): DuckDB ``strlen`` is
   BYTES (``length`` is characters), so these are byte-exact on ANY
   corpus already — the test codifies that DuckDB semantic so an
   engine swap or oracle rewrite to ``length()`` gets caught.
2. ord(substr(...))-based oracles (mm2/mm4/mm25 sample values): DuckDB
   ``ord`` yields the CODE POINT of a character while the engine
   samples UTF-8 BYTES — equal only on pure-ASCII text
   (tests/test_multimodal.py::test_corpus_is_ascii pins the corpus).
   These tests assert the ENGINE side of that boundary: synthesis is
   byte-based, so a non-ASCII char becomes multiple samples. If the
   synthesis ever silently switched to characters, these fail before
   the oracle could drift.
"""

from __future__ import annotations

import numpy as np


NON_ASCII = "héllo wörld — ça va? 日本語"  # 2-, 3- and em-dash multibyte


def test_duckdb_strlen_is_bytes_not_chars():
    import duckdb

    n_bytes, n_chars = duckdb.sql(
        "SELECT strlen(?), length(?)", params=[NON_ASCII, NON_ASCII]
    ).fetchone()
    assert n_bytes == len(NON_ASCII.encode("utf-8"))
    assert n_chars == len(NON_ASCII)
    assert n_bytes > n_chars  # the divergence the strlen oracles rely on


def test_wd1_member_bytes_are_utf8_bytes(spark):
    """WebDataset tar members store UTF-8 bytes; the shard accounting
    must count them (matching the oracle's strlen), not characters."""
    from pipeline_mf_etl_spark.sources.webdataset import (
        build_webdataset_shards,
        explode_webdataset,
    )

    df = spark.createDataFrame(
        [(0, NON_ASCII, "fr", "web")], "doc_id long, text string, lang string, source string"
    )
    samples = explode_webdataset(build_webdataset_shards(df, 16)).collect()
    assert len(samples) == 1
    expected_meta = (
        '{"doc_id": 0, "lang": "fr", "source": "web"}'
    )
    assert samples[0]["n_bytes"] == len(NON_ASCII.encode("utf-8")) + len(
        expected_meta.encode("utf-8")
    )
    assert samples[0]["n_bytes"] > len(NON_ASCII) + len(expected_meta)


def test_mm25_flac_synthesis_samples_bytes(spark):
    """The FLAC synthesis maps UTF-8 BYTES to samples: a non-ASCII doc
    yields more samples than characters — the exact boundary where the
    mm25 ord(substr())-oracle (code points) stops matching, pinned so a
    silent switch to character-based synthesis cannot drift past the
    ASCII-corpus guard."""
    from pipeline_mf_etl_spark.operators.flac import _text_to_pcm, encode_flac, parse_flac

    pcm = _text_to_pcm(1, NON_ASCII)  # doc 1: mono
    raw = NON_ASCII.encode("utf-8")
    assert pcm.shape == (len(raw),)
    assert len(raw) > len(NON_ASCII)
    expected = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) * 256
    assert (pcm == expected).all()
    # and the full codec round-trips those byte-derived samples exactly
    out = parse_flac(encode_flac(pcm, sample_rate=8000, block_size=64))
    assert (out["samples"][0] == expected).all()


def test_mm4_wav_synthesis_samples_bytes(spark):
    """Same boundary for the WAV leg: byte-based sampling."""
    from pipeline_mf_etl_spark.operators.multimodal import with_wav_payload

    df = spark.createDataFrame([(7, NON_ASCII)], "doc_id long, text string")
    row = with_wav_payload(df).collect()[0]
    payload = bytes(row["payload"])
    # RIFF data chunk length = 2 bytes per sample, one sample per UTF-8 byte
    n_bytes = len(NON_ASCII.encode("utf-8"))
    assert payload[:4] == b"RIFF"
    data_at = payload.find(b"data")
    assert data_at > 0
    data_len = int.from_bytes(payload[data_at + 4 : data_at + 8], "little")
    assert data_len == 2 * n_bytes
    assert data_len > 2 * len(NON_ASCII)


# ---------------------------------------------------------------------------
# r13 migration (r12 verdict task 5): the multimodal oracles moved off
# ord(substr(text,i,1)) code points to hex-pair UTF-8 bytes, so engine
# and oracle must now agree on a NON-ASCII corpus for every migrated
# family — the assertion that makes test_corpus_is_ascii no longer
# load-bearing for hash parity.
# ---------------------------------------------------------------------------

_MIGRATED = [
    "mm1_binary_metadata",    # char-based on BOTH sides by design
    "mm3_frame_sample",       # octet_length-based from the start
    "mm2_byte_features",      # bytes family
    "mm4_wav_decode",         # audio: WAV
    "mm5_image_decode",       # image: PPM
    "mm6_video_decode",       # video: Y4M
    "mm7_image_phash_dedup",
    "mm8_audio_segments",
    "mm9_image_resize",
    "mm10_audio_downsample",
    "mm11_video_resize",
    "mm12_png_decode",        # image: PNG
    "mm12b_png_color",
    "mm13_jpeg_decode",       # image: JPEG
    "mm13b_jpeg_color",
    "mm14_mp4_demux",         # container: MP4
    "mm15_mjpeg_decode",
    "mm16_jpeg_probe",
    "mm17_jpeg_progressive",
    "mm18_adpcm_decode",      # audio: ADPCM
    "mm19_gif_decode",        # image: GIF
    "mm20_bmp_decode",        # image: BMP
    "mm21_h264_probe",        # routing: H.264
    "mm22_avc1_route",
    "mm23_aac_route",
    "mm24_hevc_route",
    "mm25_flac_decode",       # audio: FLAC
    "mm27b_tiff_decode",      # image: TIFF
    "mm28b_webp_lossless_decode",  # image: VP8L
    "c8_seekable_extract",    # seekable-zstd byte-range slice (r14)
]


def _nonascii_docs_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        ("héllo wörld — ça va bien? " * 12).strip(),       # 2-byte + em dash
        ("日本語のテキスト処理パイプライン。" * 18),          # 3-byte CJK
        ("mixed ascii and 🎉 emoji 🚀 rows " * 14).strip(),  # 4-byte emoji
        ("pure ascii control row for contrast " * 10).strip(),
        ("кириллица и łatin mixé " * 20).strip(),           # cyrillic
        ("short é" * 40),
        # 253 ASCII bytes then 4-byte emoji: the c8 256-byte slice cut
        # lands on the emoji's 4th byte -> the snap ladder's 3-step
        # branch fires (rows above only exercise the 1-step branch)
        "x" * 253 + "🎉" * 20,
    ]
    d = tmp_path_factory.mktemp("nonascii_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["fr", "ja", "en", "en", "ru", "fr", "en"]),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_migrated_multimodal_oracles_match_on_nonascii_corpus(
    spark, tmp_path_factory
):
    """Engine vs migrated oracle on a corpus of 2-/3-/4-byte UTF-8
    text: every multimodal family must hash-identically WITHOUT the
    ASCII assumption."""
    import math

    import duckdb

    from pipeline_mf_etl_spark.queries import all_queries

    sf_dir = _nonascii_docs_dir(tmp_path_factory)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def norm(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{round(v, 9):.9f}"
            return str(v)

        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    specs = all_queries()
    failures = []
    for name in _MIGRATED:
        spec = specs[name]
        sdf = spec.spark(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(spec.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        if sorted(sdf.columns) != sorted(dcols):
            failures.append((name, "schema"))
            continue
        if canon(srows, sdf.columns) != canon(drows, dcols):
            failures.append((name, f"values ({len(srows)} vs {len(drows)})"))
    assert not failures, failures
