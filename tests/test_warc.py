"""WARC/Common-Crawl ingestion + HTML boilerplate-strip tests.

Library coverage for the round-10 additions ``sources/warc.py`` and
``operators/html.py`` (their query registrations — c1/t15 — take r11
window slots; the r10 window was already full with the r9-verdict
rotation). The parity test here asserts the THREE-WAY html-strip
agreement (pure / Spark JVM / DuckDB SQL) the r11 oracle will rely on.
"""

from __future__ import annotations

import zlib

import pytest

from pipeline_mf_etl_spark.operators.html import (
    html_link_count_column,
    html_link_count_sql,
    html_title_column,
    html_title_sql,
    html_to_text,
    html_to_text_column,
    html_to_text_sql,
)
from pipeline_mf_etl_spark.sources.warc import (
    encode_http_response,
    encode_warc_record,
    extract_warc_documents,
    gzip_member,
    parse_http_response,
    parse_warc,
    split_gzip_members,
    synth_html_page,
    synth_warc_gz,
    with_warc_payload,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# gzip multi-member split
# ---------------------------------------------------------------------------
class TestGzipMembers:
    def test_round_trip_members(self):
        parts = [b"alpha", b"", b"g" * 100_000, bytes(range(256)) * 7]
        stream = b"".join(gzip_member(p) for p in parts)
        assert split_gzip_members(stream) == parts

    def test_single_member(self):
        assert split_gzip_members(gzip_member(b"x")) == [b"x"]

    def test_truncated_member_fails(self):
        stream = gzip_member(b"alpha") + gzip_member(b"beta")[:-4]
        with pytest.raises(ValueError, match="truncated"):
            split_gzip_members(stream)

    def test_corrupt_member_fails_with_index(self):
        good = gzip_member(b"alpha")
        bad = bytearray(gzip_member(b"beta"))
        bad[12] ^= 0xFF
        with pytest.raises(ValueError, match="member 1"):
            split_gzip_members(good + bytes(bad))

    def test_empty_stream_fails(self):
        with pytest.raises(ValueError, match="empty gzip stream"):
            split_gzip_members(b"")

    def test_deterministic_bytes(self):
        assert gzip_member(b"same input") == gzip_member(b"same input")


# ---------------------------------------------------------------------------
# WARC record grammar
# ---------------------------------------------------------------------------
def _rec(rec_type="response", payload=b"BODY", **extra):
    headers = {
        "WARC-Record-ID": "<urn:uuid:1>",
        "WARC-Date": "2026-01-01T00:00:00Z",
        **extra,
    }
    return encode_warc_record(rec_type, headers, payload)


class TestWarcGrammar:
    def test_round_trip_multiple_records(self):
        stream = _rec("warcinfo", b"fields\r\n") + _rec("response", b"HTTP...")
        recs = parse_warc(stream)
        assert [r["type"] for r in recs] == ["warcinfo", "response"]
        assert recs[1]["payload"] == b"HTTP..."

    def test_binary_payload_with_crlfs_survives(self):
        # Content-Length framing must win over any CRLFs inside the body
        payload = b"a\r\n\r\nb\r\n\r\n" * 3
        recs = parse_warc(_rec(payload=payload))
        assert recs[0]["payload"] == payload

    def test_header_continuation_folds(self):
        raw = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"WARC-Target-URI: https://example.com/a\r\n"
            b"\t/folded/tail\r\n"
            b"Content-Length: 0\r\n"
            b"\r\n\r\n\r\n"
        )
        recs = parse_warc(raw)
        assert recs[0]["headers"]["WARC-Target-URI"] == (
            "https://example.com/a /folded/tail"
        )

    def test_warc_11_accepted_other_versions_rejected(self):
        raw = _rec().replace(b"WARC/1.0", b"WARC/1.1", 1)
        assert parse_warc(raw)[0]["type"] == "response"
        with pytest.raises(ValueError, match="unsupported WARC version"):
            parse_warc(_rec().replace(b"WARC/1.0", b"WARC/0.18", 1))

    def test_missing_mandatory_header_fails(self):
        raw = (
            b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n"
            b"\r\n\r\n\r\n"
        )
        with pytest.raises(ValueError, match="WARC-Record-ID"):
            parse_warc(raw)

    def test_content_length_overrun_fails(self):
        raw = _rec(payload=b"1234").replace(b"Content-Length: 4", b"Content-Length: 400")
        with pytest.raises(ValueError, match="overruns"):
            parse_warc(raw)

    def test_missing_separator_fails(self):
        with pytest.raises(ValueError, match="separator"):
            parse_warc(_rec()[:-2])

    def test_header_value_with_newline_rejected_at_encode(self):
        with pytest.raises(ValueError, match="line break"):
            encode_warc_record("response", {"X": "a\r\nb"}, b"")


# ---------------------------------------------------------------------------
# HTTP response parse (framing x encoding matrix)
# ---------------------------------------------------------------------------
class TestHttpResponse:
    @pytest.mark.parametrize("chunked", [False, True])
    @pytest.mark.parametrize("gz", [False, True])
    def test_framing_matrix_round_trips(self, chunked, gz):
        body = b"<html>corpus body " + bytes(range(32, 127)) + b"</html>"
        raw = encode_http_response(body, chunked=chunked, gzip_body=gz)
        out = parse_http_response(raw)
        assert out["status"] == 200
        assert out["body"] == body
        assert out["content_type"].startswith("text/html")

    def test_chunk_extensions_tolerated(self):
        raw = encode_http_response(b"abcdef", chunked=True, chunk_size=3)
        raw = raw.replace(b"3\r\nabc", b"3;ext=1\r\nabc", 1)
        assert parse_http_response(raw)["body"] == b"abcdef"

    def test_truncated_content_length_fails(self):
        raw = encode_http_response(b"full body")[:-3]
        with pytest.raises(ValueError, match="truncated"):
            parse_http_response(raw)

    def test_unknown_content_encoding_fails(self):
        raw = encode_http_response(b"x" * 10).replace(
            b"Content-Type:", b"Content-Encoding: br\r\nContent-Type:", 1
        )
        with pytest.raises(ValueError, match="Content-Encoding 'br'"):
            parse_http_response(raw)

    def test_bad_chunk_size_fails(self):
        raw = encode_http_response(b"abc", chunked=True).replace(
            b"3\r\nabc", b"zz\r\nabc", 1
        )
        with pytest.raises(ValueError, match="bad chunk size"):
            parse_http_response(raw)

    def test_non_200_status_parses(self):
        raw = encode_http_response(b"gone", status=404, reason="Not Found")
        out = parse_http_response(raw)
        assert (out["status"], out["reason"]) == (404, "Not Found")


# ---------------------------------------------------------------------------
# end-to-end synthesis -> extraction (pure path)
# ---------------------------------------------------------------------------
class TestSynthCapture:
    def test_capture_layout(self):
        gz = synth_warc_gz(7, "hello corpus world")
        members = split_gzip_members(gz)
        assert len(members) == 3  # one record per member: the CC layout
        recs = [r for m in members for r in parse_warc(m)]
        assert [r["type"] for r in recs] == ["warcinfo", "request", "response"]

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 3])  # the 4 framing variants
    def test_text_recovers_through_all_layers(self, doc_id):
        text = "alpha & beta <tag> 3 > 2 spark engine"
        gz = synth_warc_gz(doc_id, text)
        resp = [
            r
            for m in split_gzip_members(gz)
            for r in parse_warc(m)
            if r["type"] == "response"
        ][0]
        http = parse_http_response(resp["payload"])
        stripped = html_to_text(http["body"].decode("utf-8"))
        # page adds title/h1/link text around the body paragraph
        assert text in stripped
        assert stripped == f"doc {doc_id} Document #{doc_id} {text} next"


# ---------------------------------------------------------------------------
# HTML strip: pure behavior + THREE-WAY engine parity
# ---------------------------------------------------------------------------
class TestHtmlStrip:
    def test_script_style_comment_content_removed(self):
        html = (
            "<p>keep</p><script>drop < this</script><style>p{x:1}</style>"
            "<!-- gone --><noscript>also gone</noscript><p>tail</p>"
        )
        assert html_to_text(html) == "keep tail"

    def test_entities_decode_single_level(self):
        # &amp;lt; is the ESCAPED text "&lt;" — must not double-decode
        assert html_to_text("a &amp;lt; b &lt; c &amp; d") == "a &lt; b < c & d"

    def test_whitespace_collapses(self):
        assert html_to_text("a\n\n  <br/>\t b") == "a b"

    def test_three_way_parity_spark_duckdb_pure(self, spark, duck):
        pages = [
            synth_html_page(i, t)
            for i, t in enumerate(
                [
                    "plain words only",
                    "amp & lt < gt > mix",
                    "quotes ' and \" here",
                    "",
                ]
            )
        ]
        pages.append("<a href='x'>1</a><a  href='y'>2</a><p>no title</p>")
        expected = [html_to_text(p) for p in pages]

        sdf = spark.createDataFrame([(p,) for p in pages], "html string")
        got_spark = [
            (r["t"], r["title"], r["links"])
            for r in sdf.select(
                html_to_text_column("html").alias("t"),  # type: ignore[arg-type]
                html_title_column("html").alias("title"),  # type: ignore[arg-type]
                html_link_count_column("html").alias("links"),  # type: ignore[arg-type]
            ).collect()
        ]
        import pandas as pd

        duck.register("html_pages", pd.DataFrame({"html": pages}))
        got_duck = duck.execute(
            f"SELECT {html_to_text_sql('html')} AS t,"
            f" {html_title_sql('html')} AS title,"
            f" {html_link_count_sql('html')} AS links"
            " FROM html_pages"
        ).fetchall()
        duck.unregister("html_pages")

        for exp, sp, dk in zip(expected, got_spark, got_duck):
            assert sp[0] == exp
            assert dk[0] == exp
            assert sp[1] == dk[1]
            assert int(sp[2]) == int(dk[2])
        assert got_spark[-1][2] == 2  # both href'd anchors counted


# ---------------------------------------------------------------------------
# Spark layer: synthesis + extraction over the real corpus
# ---------------------------------------------------------------------------
class TestWarcSpark:
    def test_extract_matches_documents(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(64)
        out = (
            extract_warc_documents(with_warc_payload(docs))
            .join(docs.select("doc_id", "text"), "doc_id")
            .collect()
        )
        assert len(out) == 64
        for r in out:
            assert r["http_status"] == 200
            assert r["content_type"].startswith("text/html")
            assert r["n_members"] == 3
            assert r["n_records"] == 3
            assert r["n_request"] == 1 and r["n_response"] == 1
            assert r["url"] == f"https://corpus.example/doc/{r['doc_id']}"
            assert html_to_text(r["html"]).endswith(f"{r['text']} next")

    def test_extraction_plan_is_shuffle_free(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            extract_warc_documents(with_warc_payload(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_corrupt_capture_fails_loudly(self, spark):
        import pandas as pd

        bad = zlib.compress(b"not a warc")  # zlib wrapper, not gzip
        pdf = pd.DataFrame({"doc_id": [1], "payload": [bad]})
        sdf = spark.createDataFrame(pdf)
        with pytest.raises(Exception, match="corrupt|invalid"):
            extract_warc_documents(sdf).collect()


class TestWarcStreaming:
    def test_stream_matches_batch_extraction(self, spark, tmp_path):
        """Streaming the .warc.gz drop-zone (availableNow) must yield the
        same responses the pure parser extracts, across multiple archive
        files landing as separate stream inputs."""
        from pipeline_mf_etl_spark.streaming.transforms import read_warc_stream

        zone = tmp_path / "crawl"
        zone.mkdir()
        texts = {i: f"warc stream doc {i} body" for i in range(6)}
        for i, t in texts.items():
            (zone / f"capture-{i:03d}.warc.gz").write_bytes(synth_warc_gz(i, t))
        (zone / "ignored.txt").write_text("not an archive")  # glob-filtered

        q = (
            read_warc_stream(spark, str(zone))
            .writeStream.format("memory")
            .queryName("warc_ingest")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["url"]: r for r in spark.sql("select * from warc_ingest").collect()}

        assert len(got) == 6
        for i, t in texts.items():
            r = got[f"https://corpus.example/doc/{i}"]
            assert r["http_status"] == 200
            assert r["n_records"] == 3
            assert t in html_to_text(r["html"])
            assert r["archive"].endswith(f"capture-{i:03d}.warc.gz")

    def test_non_utf8_page_does_not_wedge_stream(self, spark, tmp_path):
        """A drop-zone page in a non-UTF-8 (or mislabeled) encoding must
        flow through, not fail the micro-batch: the checkpointed
        binaryFile source would replay the same file forever (ADVICE
        r10). Declared charsets are honored; undecodable bytes get
        replacement chars."""

        def capture(doc_id, body: bytes, ctype: str) -> bytes:
            http = encode_http_response(body, content_type=ctype)
            rec = encode_warc_record(
                "response",
                {
                    "WARC-Record-ID": f"<urn:uuid:resp-{doc_id}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": f"https://corpus.example/doc/{doc_id}",
                    "Content-Type": "application/http;msgtype=response",
                },
                http,
            )
            return gzip_member(rec)

        zone = tmp_path / "crawl"
        zone.mkdir()
        # declared latin-1, body is real latin-1 (0xE9 = é)
        (zone / "a.warc.gz").write_bytes(
            capture(0, b"caf\xe9 page", "text/html; charset=iso-8859-1")
        )
        # claims utf-8 but carries an invalid sequence
        (zone / "b.warc.gz").write_bytes(
            capture(1, b"bad \xff\xfe bytes", "text/html; charset=utf-8")
        )
        # bogus charset name falls back to utf-8 + replace
        (zone / "c.warc.gz").write_bytes(
            capture(2, b"odd \xf0 charset", "text/html; charset=no-such-enc")
        )

        from pipeline_mf_etl_spark.streaming.transforms import read_warc_stream

        q = (
            read_warc_stream(spark, str(zone))
            .writeStream.format("memory")
            .queryName("warc_nonutf8")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["url"]: r for r in spark.sql("select * from warc_nonutf8").collect()
        }
        assert len(got) == 3  # nothing dropped, nothing wedged
        assert got["https://corpus.example/doc/0"]["html"] == "café page"
        assert "�" in got["https://corpus.example/doc/1"]["html"]
        assert "�" in got["https://corpus.example/doc/2"]["html"]
