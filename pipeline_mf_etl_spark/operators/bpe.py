"""BPE tokenizer training + encoding over the corpus.

The real byte-pair-encoding workflow an LLM data pipeline runs, shaped
for scale the way production tokenizer trainers are:

- **Training reduces to word counts.** The corpus pass is ONE
  distributed groupBy(word) — merge learning then operates on the
  (bounded, top-V) weighted vocabulary on the driver, which is O(V ·
  merges), independent of corpus size. This is the standard
  decomposition (word-frequency training): the 100-TB scan happens
  once, in the JVM.
- **Encoding is map-only.** Each DISTINCT word is encoded once by
  applying the learned merge list as chained space-boundary string
  replacements (JVM `replace`, no Python), and the per-doc token
  stats come from a broadcast join of that word→length table onto the
  exploded corpus.

Cross-engine determinism: merge application is defined as
left-to-right non-overlapping replacement of ``' l r '`` with
``' lr '``, repeated ``_REPEATS`` times per merge (enough for a
fixpoint on bounded word lengths) — Spark's ``replace`` and DuckDB's
``replace`` share these semantics exactly, so the oracle replays the
persisted merge sequence with a recursive CTE and matches token counts
integer-for-integer (no float anywhere).

Merge selection ties are broken deterministically: highest pair count,
then lexicographically smallest (left, right). The TRAINER applies each
learned merge to its vocabulary under the same consumed-delimiter
replace semantics the encoder uses (a replacement eats its trailing
space, so the next symbol cannot start a match in the same pass), so
later merges' pair counts are computed on symbol sequences the encoder
actually produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.dedupe import tokens

BPE_MERGES = 12
BPE_TRAIN_VOCAB = 5000  # driver-side cap: top-V words by count
_REPEATS = 5  # replace passes per merge — fixpoint for words ≤ ~32 symbols


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word frequencies — the only corpus-sized stage."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    train_vocab: int = BPE_TRAIN_VOCAB,
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the weighted top-V vocabulary.

    Driver work is O(V · merges · avg_word_len) on the capped vocab —
    corpus size only affects the distributed count above. ``counts``:
    a precomputed :func:`word_counts` frame (e.g. persisted by the
    caller so the encoding stage can reuse the same corpus pass as its
    distinct vocabulary) — when None the count runs inline."""
    rows = (
        (counts if counts is not None else word_counts(docs, text_col))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(train_vocab)
        .collect()
    )
    seqs: list[tuple[list[str], int]] = [(list(r["word"]), int(r["n"])) for r in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in seqs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        # Apply the merge with STRING-REPLACE semantics, exactly like
        # the encoder's chained ``replace(' l r ', ' lr ')``: within a
        # pass, a replacement consumes its trailing delimiter, so the
        # symbol immediately after a merged pair cannot START the next
        # match (on 'aaaaaaaa' one pass yields [aa,a,aa,a,aa], not
        # [aa,aa,aa,aa]); _REPEATS passes mirror the encoder's repeat
        # count. Keeping trainer and encoder on identical semantics
        # means pair counts for later merges are computed on symbol
        # sequences the encoder actually produces.
        for sym, _ in seqs:
            for _pass in range(_REPEATS):
                changed = False
                i = 0
                while i < len(sym) - 1:
                    if sym[i] == l and sym[i + 1] == r:
                        sym[i : i + 2] = [l + r]
                        changed = True
                        i += 2
                    else:
                        i += 1
                if not changed:
                    break
    return merges


def merges_frame(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    return spark.createDataFrame(
        [(i + 1, l, r) for i, (l, r) in enumerate(merges)],
        "merge_idx int, l string, r string",
    )


def _apply_merges(col, merges: list[tuple[str, str]]):
    s = col
    for l, r in merges:
        for _ in range(_REPEATS):
            s = F.call_function("replace", s, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
    return s


def word_bpe_lengths(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, bpe_len): encode each distinct word through the merge
    list; bpe_len = surviving symbol count."""
    seed = F.concat(
        F.lit(" "), F.array_join(F.split(F.col("word"), ""), " "), F.lit(" ")
    )
    enc = _apply_merges(seed, merges)
    return words.select(
        "word", F.size(F.split(F.trim(enc), " ")).cast("long").alias("bpe_len")
    )
