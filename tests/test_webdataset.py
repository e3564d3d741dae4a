"""WebDataset tar-shard tests (round-10 library addition; the
round-trip query wd1 registers in the r11 window)."""

from __future__ import annotations

import io
import tarfile

import pytest

from pipeline_mf_etl_spark.sources.webdataset import (
    build_webdataset_shards,
    encode_tar_shard,
    explode_webdataset,
    parse_tar_shard,
    sample_key,
)

SF = "/root/testdata/sf0.001"


class TestTarShardPure:
    def test_round_trip(self):
        samples = [
            ("000000", {"txt": b"alpha", "json": b"{}"}),
            ("000001", {"txt": b"beta", "json": b'{"a":1}', "cls": b"3"}),
        ]
        assert parse_tar_shard(encode_tar_shard(samples)) == samples

    def test_deterministic_bytes(self):
        s = [("000000", {"txt": b"x", "json": b"{}"})]
        assert encode_tar_shard(s) == encode_tar_shard(s)

    def test_noncontiguous_key_fails(self):
        blob = encode_tar_shard(
            [
                ("000000", {"txt": b"a"}),
                ("000001", {"txt": b"b"}),
            ]
        )
        # splice member 0's header+block after member 1 by rebuilding
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            for name in ("000000.txt", "000001.txt", "000000.json"):
                info = tarfile.TarInfo(name=name)
                info.size = 1
                tar.addfile(info, io.BytesIO(b"x"))
        with pytest.raises(ValueError, match="reappears non-contiguously"):
            parse_tar_shard(buf.getvalue())

    def test_duplicate_member_fails(self):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            for _ in range(2):
                info = tarfile.TarInfo(name="000000.txt")
                info.size = 1
                tar.addfile(info, io.BytesIO(b"x"))
        with pytest.raises(ValueError, match="duplicate member"):
            parse_tar_shard(buf.getvalue())

    def test_extensionless_member_fails(self):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            info = tarfile.TarInfo(name="README")
            info.size = 1
            tar.addfile(info, io.BytesIO(b"x"))
        with pytest.raises(ValueError, match="key.*ext"):
            parse_tar_shard(buf.getvalue())

    def test_not_a_tar_fails(self):
        with pytest.raises(ValueError, match="not a tar shard"):
            parse_tar_shard(b"PK\x03\x04 definitely a zip")

    def test_empty_shard_fails(self):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w"):
            pass
        with pytest.raises(ValueError, match="no samples"):
            parse_tar_shard(buf.getvalue())

    def test_multi_extension_suffix_kept_whole(self):
        # 000000.seg.json splits at the FIRST dot: ext "seg.json"
        s = [("000000", {"seg.json": b"{}", "txt": b"t"})]
        assert parse_tar_shard(encode_tar_shard(s)) == s

    def test_sample_key_bounds(self):
        assert sample_key(42) == "000042"
        with pytest.raises(ValueError, match="key space"):
            sample_key(10**6)


class TestWebdatasetSpark:
    def test_round_trip_matches_documents(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        shards = build_webdataset_shards(docs, docs_per_shard=16)
        back = explode_webdataset(shards)
        orig = {
            r["doc_id"]: r
            for r in docs.select("doc_id", "text", "lang", "source").collect()
        }
        rows = back.collect()
        assert len(rows) == len(orig)
        for r in rows:
            o = orig[r["doc_id"]]
            assert r["text"] == o["text"]
            assert r["lang"] == o["lang"]
            assert r["source"] == o["source"]
            assert r["shard_id"] == r["doc_id"] // 16
            assert r["key"] == f"{r['doc_id'] % 10**6:06d}"

    def test_shard_sizes(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")  # 500 docs
        sizes = {
            r["shard_id"]: r["n_samples"]
            for r in build_webdataset_shards(docs, 64).select(
                "shard_id", "n_samples"
            ).collect()
        }
        assert sum(sizes.values()) == 500
        assert all(v == 64 for k, v in sizes.items() if k < 7)
        assert sizes[7] == 500 - 7 * 64

    def test_single_shuffle_plan(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            explode_webdataset(build_webdataset_shards(docs, 16))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1  # the shard groupBy, nothing else
