"""BPE tokenizer: merge learning matches a hand-computed sequence,
encoding reaches its fixpoint, lengths bound sensibly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.bpe import (
    train_bpe,
    word_bpe_lengths,
)


def test_train_learns_expected_merges(spark):
    # "aaab" x3 + "ab" x2: pair counts round 1: (a,a)=6, (a,b)=5 ->
    # merge (a,a) -> aaab = [aa,a,b]; round 2: (aa,a)=3, (a,b)=5 ->
    # merge (a,b) -> aaab=[aa,ab], ab=[ab]; round 3: (aa,ab)=3
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab ab")], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=3)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]


def test_encode_repeated_merge_fixpoint(spark):
    # merge (a,a) applied to 'aaaaa' must reach the fixpoint
    # ' aa aa a ' (left-to-right non-overlapping, repeated passes)
    words = spark.createDataFrame([("aaaaa",)], "word string")
    got = word_bpe_lengths(words, [("a", "a")]).collect()[0]
    assert got["bpe_len"] == 3  # [aa, aa, a]


def test_length_bounds_on_corpus(spark):
    from tests.conftest import SF_SMOKE
    from pipeline_mf_etl_spark.sources.readers import load_table
    from pipeline_mf_etl_spark.operators.dedupe import tokens

    docs = load_table(spark, SF_SMOKE, "documents")
    merges = train_bpe(docs, n_merges=8)
    assert len(merges) == 8
    words = docs.select(F.explode(tokens(F.col("text"))).alias("word")).distinct()
    lens = word_bpe_lengths(words, merges).withColumn(
        "n_chars", F.length("word")
    )
    bad = lens.filter(
        (F.col("bpe_len") < 1) | (F.col("bpe_len") > F.col("n_chars"))
    ).count()
    assert bad == 0
    # the learned merges actually compress: some word got shorter
    assert lens.filter(F.col("bpe_len") < F.col("n_chars")).count() > 0
