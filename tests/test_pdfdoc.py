"""PDF source tests (sources/pdfdoc.py): real-structure round-trips,
the gate matrix (encryption, xref streams, filters), tokenizer edge
cases, and the Spark layer. c3 oracle parity runs in
tests/test_corpus_ingest.py."""

from __future__ import annotations

import re
import zlib

import pytest

from pipeline_mf_etl_spark.sources.pdfdoc import (
    _Lexer,
    extract_pdf_documents,
    parse_pdf,
    synth_pdf,
    with_pdf_payload,
)

SF = "/root/testdata/sf0.001"


class TestPdfRoundTrip:
    @pytest.mark.parametrize(
        "text",
        [
            "",
            "hello world",
            "x" * 80,
            "x" * 81,
            "paren ) and ( and backslash \\ inside",
            "multi page content " * 40,
        ],
    )
    def test_text_recovers(self, text):
        p = parse_pdf(synth_pdf(5, text))
        assert "".join(p["page_texts"]) == text
        want_pages = max(1, -(-len(text) // 80))
        assert p["n_pages"] == want_pages
        assert p["n_objects"] == 3 + 2 * want_pages

    def test_deterministic_bytes(self):
        assert synth_pdf(1, "same") == synth_pdf(1, "same")


class TestPdfGates:
    def test_encrypted_gates(self):
        blob = synth_pdf(0, "secret")
        blob = blob.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        with pytest.raises(ValueError, match="encrypted"):
            parse_pdf(blob)

    def test_xref_stream_gates(self):
        # point startxref at an object instead of an xref table
        blob = synth_pdf(0, "x")
        m = re.search(rb"startxref\s+(\d+)", blob)
        patched = blob.replace(m.group(1), b"9")  # offset 9: inside header
        with pytest.raises(ValueError, match="xref"):
            parse_pdf(patched)

    def test_unknown_filter_gates(self):
        blob = synth_pdf(0, "body text")
        patched = blob.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode ")
        with pytest.raises(ValueError, match="unsupported"):
            parse_pdf(patched)

    def test_corrupt_flate_fails(self):
        blob = bytearray(synth_pdf(0, "compressible body " * 10))
        at = blob.find(b"stream\n") + 10
        blob[at] ^= 0xFF
        with pytest.raises(ValueError, match="Flate|Length|truncated|endstream"):
            parse_pdf(bytes(blob))

    def test_not_a_pdf(self):
        with pytest.raises(ValueError, match="%PDF"):
            parse_pdf(b"plain text file")

    def test_missing_object_fails(self):
        blob = synth_pdf(0, "x")
        # corrupt the catalog's xref offset (first 10-digit 'n' entry)
        m = re.search(rb"\n(\d{10}) 00000 n", blob)
        patched = blob.replace(m.group(1), b"0000000001", 1)
        with pytest.raises(ValueError, match="header mismatch|not in the xref"):
            parse_pdf(patched)

    def test_page_count_mismatch_fails(self):
        blob = synth_pdf(0, "y" * 200)  # 3 pages
        patched = blob.replace(b"/Count 3", b"/Count 7")
        with pytest.raises(ValueError, match="Count"):
            parse_pdf(patched)


class TestPdfTokenizer:
    def _obj(self, raw: bytes):
        return _Lexer(raw).parse_object()

    def test_nested_structures(self):
        got = self._obj(b"<< /A [1 2 (s) /N] /B << /C 3 0 R >> /D 1.5 >>")
        assert got == {
            "A": [1, 2, b"s", ("name", "N")],
            "B": {"C": ("ref", 3)},
            "D": 1.5,
        }

    def test_string_escapes(self):
        assert self._obj(rb"(a\(b\)c\\d\ne\101)") == b"a(b)c\\d\ne" + b"A"

    def test_line_continuation_consumes_eol(self):
        """Backslash-EOL is a continuation: the spec drops the backslash
        AND the EOL (\\r, \\n, or \\r\\n) — real-world PDFs split long
        show strings this way, and keeping the EOL byte would inject
        spurious newlines into extracted text (ADVICE r10)."""
        assert self._obj(b"(ab\\\ncd)") == b"abcd"
        assert self._obj(b"(ab\\\rcd)") == b"abcd"
        assert self._obj(b"(ab\\\r\ncd)") == b"abcd"
        # an UNESCAPED EOL inside a string is kept (it is data)
        assert self._obj(b"(ab\ncd)") == b"ab\ncd"

    def test_nested_parens_in_string(self):
        assert self._obj(b"(outer (inner) tail)") == b"outer (inner) tail"

    def test_hex_string(self):
        assert self._obj(b"<48 65 6C>") == b"Hel"

    def test_comments_skipped(self):
        assert self._obj(b"% note\n42") == 42

    def test_booleans_and_null(self):
        assert self._obj(b"[true false null]") == [True, False, None]


class TestPdfSpark:
    def test_extraction_matches_documents(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
        out = (
            extract_pdf_documents(with_pdf_payload(docs))
            .join(docs.select("doc_id", "text"), "doc_id")
            .collect()
        )
        assert len(out) == 60
        for r in out:
            assert r["text_out"] == r["text"]
            assert r["n_pages"] == max(1, -(-len(r["text"]) // 80))
            assert r["pdf_version"] == "1.4"

    def test_plan_is_map_only(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            extract_pdf_documents(with_pdf_payload(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in plan


def test_stdlib_free_zlib_stream_contract():
    """The content streams must be RFC-1950 zlib (PDF FlateDecode) —
    decodable by any conforming inflater."""
    blob = synth_pdf(0, "abc")
    at = blob.find(b"stream\n") + 7
    end = blob.find(b"\nendstream", at)
    assert zlib.decompress(blob[at:end]).startswith(b"BT /F1 12 Tf")


class TestPdfTextEncoding:
    @pytest.mark.parametrize(
        "text",
        ["unicode é ü", "中文 text 混合", "emoji 🙂 ok", "cr\rlf\n mix"],
    )
    def test_non_latin_text_round_trips(self, text):
        """Non-Latin-1 text takes the REAL PDF text-string convention
        (UTF-16BE with the FE FF BOM) — the latin-1 single-byte path
        alone would mojibake it silently (found by an edge-case sweep;
        the engine forbids silent corruption classes)."""
        got = "".join(parse_pdf(synth_pdf(1, text))["page_texts"])
        assert got == text

    def test_latin1_stays_single_byte(self):
        blob = synth_pdf(1, "plain ascii")
        # no BOM in the content stream for latin-1-encodable text
        at = blob.find(b"stream\n") + 7
        end = blob.find(b"\nendstream", at)
        assert b"\xfe\xff" not in zlib.decompress(blob[at:end])
