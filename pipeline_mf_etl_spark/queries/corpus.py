"""Corpus-hygiene and sketch queries for training-data pipelines:
PII / banned-term scrubbing, deterministic stratified sampling,
token-budget corpus mixing, and approximate quantile / heavy-hitter
sketches.

The hygiene/sampling/mixing queries are pure built-in expressions
(regexp_replace / md5-hash Bernoulli) — no Python in the hot path —
and carry full DuckDB oracles; the sketches are rows-only by design
with property-tested error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.dedupe import md5_unit
from pipeline_mf_etl_spark.queries.dedup import _TOKS as _DOC_TOKS
from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.sources.readers import fan_out, load_table

# Scrub patterns, applied in fixed order; identical RE2-compatible
# syntax on both engines. The email/number patterns are the classic PII
# shapes (zero hits on this synthetic corpus — they exercise the path);
# the denylist term redaction is what actually fires here, standing in
# for boilerplate/banned-term scrubbing.
_SCRUB = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{7,}\b", "<NUM>"),
    (r"\bcustomer\b", "<TERM>"),
)


def scrub_text(col: F.Column) -> F.Column:
    """Chained regexp_replace over the scrub patterns (fixed order)."""
    out = col
    for pat, token in _SCRUB:
        out = F.regexp_replace(out, pat, token)
    return out


@query(
    "t6_pii_scrub",
    oracle=r"""
    WITH red AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\b\d{7,}\b', '<NUM>', 'g'),
                   '\bcustomer\b', '<TERM>', 'g') AS clean
        FROM documents
    )
    SELECT doc_id,
           md5(clean) AS clean_md5,
           CAST((length(clean) - length(replace(clean, '<EMAIL>', ''))) / 7
                AS BIGINT) AS n_email,
           CAST((length(clean) - length(replace(clean, '<TERM>', ''))) / 6
                AS BIGINT) AS n_term
    FROM red
    """,
)
def t6_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / banned-term scrubbing over the documents corpus: emails and
    long number runs (PII shapes) plus a denylist term → typed tokens.
    Output: redacted-text md5 + per-doc replacement counts, derived from
    token-length deltas with literal replace so both engines count the
    same way."""
    # fan_out (r14): the scrub regex chain is heavy scan-side map work
    # vs the driver's single-row-group file (no-op at production splits)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    cleaned = docs.select("doc_id", scrub_text(F.col("text")).alias("clean"))
    n_email = (
        (F.length("clean") - F.length(F.replace("clean", F.lit("<EMAIL>"), F.lit("")))) / 7
    ).cast("long")
    n_term = (
        (F.length("clean") - F.length(F.replace("clean", F.lit("<TERM>"), F.lit("")))) / 6
    ).cast("long")
    return cleaned.select(
        "doc_id",
        F.md5("clean").alias("clean_md5"),
        n_email.alias("n_email"),
        n_term.alias("n_term"),
    )


@query(
    "o9_stratified_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, lang,
               list_reduce(list_transform(split(substr(md5(
                   'strat:' || CAST(doc_id AS VARCHAR)), 1, 15), ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (acc, y) -> acc * 16 + y) AS h
        FROM documents
    ), rated AS (
        SELECT doc_id, lang, h,
               CASE WHEN lang = 'en' THEN 0.25 ELSE 0.75 END AS rate
        FROM keyed
    )
    SELECT lang,
           COUNT(*) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM rated
    WHERE (h % 1000000) / 1000000.0 < rate
    GROUP BY lang
    """,
)
def o9_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (per-language) sampling: md5-hash
    Bernoulli per row with a per-stratum rate (down-sample the dominant
    language, keep the rest) — the language-rebalancing step of a
    training-data pipeline, engine-agnostic and reproducible (same
    mechanism as o4b_hash_sample). Output: per-stratum admitted counts
    + id range."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 0.25).otherwise(0.75)
    kept = docs.select(
        "doc_id", "lang", md5_unit(F.col("doc_id"), "strat:").alias("u"), rate.alias("rate")
    ).filter(F.col("u") < F.col("rate"))
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


# Fraction of the corpus token count the mixed sample may spend (the
# "token budget" of a pretraining data recipe).
_MIX_BUDGET = 0.5
_MIX_TOK_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "o10_token_budget_mix",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               CAST(LEN(regexp_extract_all(LOWER(text),
                   '{_MIX_TOK_RE}')) AS BIGINT) AS n_tokens
        FROM documents
    ), tot AS (
        SELECT lang, SUM(n_tokens) AS lang_tokens FROM tok GROUP BY lang
    ), gl AS (
        SELECT SUM(lang_tokens) AS total_tokens, COUNT(*) AS n_langs FROM tot
    ), rates AS (
        SELECT lang,
               CASE WHEN lang_tokens = 0 THEN 1.0
                    ELSE LEAST(1.0,
                        ({_MIX_BUDGET!r} * total_tokens / n_langs) / lang_tokens) END
                   AS rate
        FROM tot CROSS JOIN gl
    ), keyed AS (
        SELECT t.lang, t.n_tokens, r.rate,
               list_reduce(list_transform(split(substr(md5(
                   'mix:' || CAST(t.doc_id AS VARCHAR)), 1, 15), ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (acc, y) -> acc * 16 + y) AS h
        FROM tok t JOIN rates r USING (lang)
    )
    SELECT lang,
           ROUND(rate, 6) AS rate,
           COUNT(*) AS n_docs_admitted,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_admitted
    FROM keyed
    WHERE (h % 1000000) / 1000000.0 < rate
    GROUP BY lang, rate
    """,
)
def o10_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: rebalance the corpus toward a UNIFORM
    per-language token mix under a global budget of ``_MIX_BUDGET`` of
    all tokens — the mixing/up-down-weighting step of a pretraining
    data recipe. Per-language admit rate = min(1, budget·total/L /
    lang_tokens); admission is the md5-fold Bernoulli (deterministic,
    repartition-stable, identical arithmetic on both engines).

    Plan shape: token counting is one projection; the rate table is a
    per-language aggregate crossed with a one-row global aggregate —
    both tiny — broadcast back onto the doc stream, so the only
    full-data operations are the scan, one groupBy(lang), and the
    final admitted aggregate. Nothing scales with anything but corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_MIX_TOK_RE), 0))
        .cast("long")
        .alias("n_tokens"),
    )
    tot = tok.groupBy("lang").agg(F.sum("n_tokens").alias("lang_tokens"))
    gl = tot.agg(
        F.sum("lang_tokens").alias("total_tokens"), F.count("*").alias("n_langs")
    )
    rates = tot.crossJoin(F.broadcast(gl)).select(
        "lang",
        F.when(F.col("lang_tokens") == 0, F.lit(1.0))
        .otherwise(
            F.least(
                F.lit(1.0),
                (F.lit(_MIX_BUDGET) * F.col("total_tokens") / F.col("n_langs"))
                / F.col("lang_tokens"),
            )
        )
        .alias("rate"),
    )
    admitted = tok.join(F.broadcast(rates), "lang").filter(
        md5_unit(F.col("doc_id"), "mix:") < F.col("rate")
    )
    return admitted.groupBy("lang", "rate").agg(
        F.count("*").alias("n_docs_admitted"),
        F.sum("n_tokens").alias("tokens_admitted"),
    ).select(
        "lang",
        F.round("rate", 6).alias("rate"),
        "n_docs_admitted",
        "tokens_admitted",
    )


# ---------------------------------------------------------------------------
# Sketch operators: the approximate counterparts a 100 TB pipeline runs
# when exact quantiles/top-k are too expensive. Both are rows-only by
# design (sketch internals are engine-specific); property tests bound
# the error against the exact answers (tests/test_sketches.py).
# ---------------------------------------------------------------------------
@query("a16_approx_quantiles", oracle=None, driver_visible=False)
def a16_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate value quantiles per event_type at
    1% relative error — the single-pass mergeable-summary path used when
    exact percentile would shuffle full columns."""
    ev = load_table(spark, sf_dir, "events")
    qs = F.percentile_approx(
        "value", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]), 10_000
    )
    return (
        ev.groupBy("event_type")
        .agg(qs.alias("q"))
        .select(
            "event_type",
            F.round(F.element_at("q", 1), 6).alias("p25"),
            F.round(F.element_at("q", 2), 6).alias("p50"),
            F.round(F.element_at("q", 3), 6).alias("p75"),
            F.round(F.element_at("q", 4), 6).alias("p95"),
        )
    )


# A16b: the exact-quantile twin of the a16 GK sketch — same grouping,
# same four quantiles, hash-certifiable (a18/a18b convention: the
# sketch member stays rows-only with an error-bound property test, the
# exact twin carries the hard signal). Exact `percentile` sorts each
# group's full value column through the shuffle — a16 remains the
# 100 TB default; a16b certifies the aggregation path and serves
# exact-audit runs. Both engines interpolate linearly on the sorted
# values and round to the shared 1e-6 grid.
@query(
    "a16b_exact_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75,
           ROUND(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a16b_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated value quantiles per event_type — the
    hash-certified sibling of the a16 GK sketch."""
    ev = load_table(spark, sf_dir, "events")
    qs = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))")
    return (
        ev.groupBy("event_type")
        .agg(qs.alias("q"))
        .select(
            "event_type",
            F.round(F.element_at("q", 1), 6).alias("p25"),
            F.round(F.element_at("q", 2), 6).alias("p50"),
            F.round(F.element_at("q", 3), 6).alias("p75"),
            F.round(F.element_at("q", 4), 6).alias("p95"),
        )
        .orderBy("event_type")
    )


def partial_topk_candidates(ev: DataFrame, key: str, k_per_partition: int = 50) -> DataFrame:
    """Per-partition partial top-k candidate generation: each partition
    emits at most ``k_per_partition`` (key, partial_count) rows BEFORE
    any shuffle, so the exchange moves O(partitions·k) rows instead of
    one row per distinct key — the SpaceSaving-style candidate pass a
    100 TB stream needs. A true global heavy hitter is frequent in many
    partitions, so it survives local truncation; keys near the k-th
    local rank can be under-summed (standard candidate-generation
    caveat — the CMS, not this pass, is the frequency authority)."""
    import pandas as pd

    def part(batches):
        counts: dict = {}
        for b in batches:
            for uid, c in b[key].value_counts().items():
                counts[uid] = counts.get(uid, 0) + int(c)
        if not counts:
            return
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:k_per_partition]
        yield pd.DataFrame({key: [t[0] for t in top], "partial_count": [t[1] for t in top]})

    return ev.select(key).mapInPandas(part, f"{key} long, partial_count long")


def _read_count_min(spark: SparkSession, blob: bytes):
    """Deserialize a count_min_sketch blob via the JVM bridge.

    ``pyspark.sql`` exposes no public reader for the sketch binary, so
    this reaches the (stable-since-2.0) ``org.apache.spark.util.sketch``
    classes through py4j. Guarded: under Spark Connect there is no
    ``_jvm`` and the probe fails with a clear message instead of an
    AttributeError."""
    try:
        # Connect raises on .sparkContext itself, so probe the session
        # attribute inside the guard — a bare getattr on sparkContext
        # would never reach the clear error below
        jvm = getattr(getattr(spark, "sparkContext"), "_jvm", None)
    except Exception:
        jvm = None
    if jvm is None:  # pragma: no cover - Connect-only path
        raise NotImplementedError(
            "count-min probe needs the JVM py4j bridge (classic Spark); "
            "under Spark Connect use an aggregate-side probe instead"
        )
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )


@query("a17_heavy_hitters", oracle=None, eager=True, driver_visible=False)
def a17_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the event stream's user ids.

    The frequency table is ONE distributed mergeable-sketch aggregate
    (`count_min_sketch`, eps=0.001 → overestimate bound ~0.1% of total
    stream length, delta=0.99). The candidate set comes from a
    per-partition partial top-k (no full exact aggregation on the key:
    the exchange carries ≤50 rows per partition, not one row per
    distinct user). Each candidate's estimated frequency is then read
    from the sketch blob on the driver — never from a second scan of
    the data — which is the whole point of the sketch.

    NOTE: like the ML family, this builder executes eagerly (the sketch
    aggregate and candidate pass run at build time); the returned frame
    is the materialized probe result."""
    ev = load_table(spark, sf_dir, "events")
    candidates = [
        int(r["user_id"])
        for r in partial_topk_candidates(ev, "user_id")
        .groupBy("user_id")
        .agg(F.sum("partial_count").alias("total"))
        .orderBy(F.desc("total"), F.asc("user_id"))
        .limit(10)
        .collect()
    ]
    blob = ev.agg(
        F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("cms")
    ).collect()[0]["cms"]
    cms = _read_count_min(spark, blob)
    rows = [(uid, int(cms.estimateCount(uid))) for uid in candidates]
    return spark.createDataFrame(
        rows, "user_id long, est_count long"
    ).orderBy(F.desc("est_count"), F.asc("user_id"))


# A17b: the exact top-k twin of the a17 count-min path — one full
# groupBy(user_id) + deterministic top-10 (count desc, user_id asc),
# hash-certifiable (a16/a16b, a18/a18b convention: the whole sketch
# family now carries an exact certified sibling). Exact distinct-key
# aggregation shuffles one row per user where a17 ships ≤50 candidate
# rows per partition plus one constant sketch — a17 remains the 100 TB
# default; a17b certifies the aggregation path.
@query(
    "a17b_exact_heavy_hitters",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC
    LIMIT 10
    """,
)
def a17b_exact_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 users by event count (count desc, user_id asc
    tie-break) — the hash-certified sibling of the a17 sketch probe."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# O11: train/val/test split + near-dup leakage matrix — the eval-
# contamination check a training-data pipeline runs before freezing a
# split: a near-duplicate pair straddling train and val/test leaks the
# held-out answer into training. Split assignment is the md5-fold
# Bernoulli (deterministic, repartition-stable); pairs are d2's
# verified MinHash pairs, so the leakage definition is exactly the
# certified near-dup semantics.
# ---------------------------------------------------------------------------
_SPLIT_TRAIN = 0.8
_SPLIT_VAL = 0.9  # val is [0.8, 0.9); u >= 0.9 is test


def _o11_oracle() -> str:
    # the fold comes from dedup's lockstep constant — one SQL source of
    # truth for the md5 hex-fold arithmetic
    from pipeline_mf_etl_spark.queries.dedup import _D2_CHAIN, _FOLD

    fold = _FOLD.format(x="'split:' || CAST({x} AS VARCHAR)")
    split = (
        f"CASE WHEN ({fold} % 1000000) / 1000000.0 < {_SPLIT_TRAIN!r} THEN 'train' "
        f"WHEN ({fold} % 1000000) / 1000000.0 < {_SPLIT_VAL!r} THEN 'val' "
        "ELSE 'test' END"
    )
    return f"""
    WITH {_D2_CHAIN},
    splits AS (
        SELECT doc_id, {split.format(x="doc_id")} AS split FROM documents
    )
    SELECT LEAST(sa.split, sb.split) AS split_lo,
           GREATEST(sa.split, sb.split) AS split_hi,
           COUNT(*) AS n_neardup_pairs,
           LEAST(sa.split, sb.split) <> GREATEST(sa.split, sb.split) AS is_leak
    FROM verified v
    JOIN splits sa ON sa.doc_id = v.a
    JOIN splits sb ON sb.doc_id = v.b
    GROUP BY 1, 2
    """


@query("o11_split_leakage", eager=True, oracle=_o11_oracle())
def o11_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup leakage matrix over a deterministic 80/10/10 split:
    every verified MinHash near-dup pair is mapped to the unordered
    (split, split) cell of its endpoints; off-diagonal rows
    (is_leak = true) are cross-split contamination — train↔val and
    train↔test cells leak a held-out document into training, and the
    val↔test cell couples the two eval sets. Plan shape: the split column is a pure projection on the
    hash key, pairs come from the d2 chain (equi-joins only), and the
    matrix is a tiny groupBy — nothing beyond d2's own cost. EAGER
    (r14): consumes the persisted pair export like d6/d7/d9 — the
    MinHash chain is computed at most once per (process, sf) across
    every pair-set consumer instead of re-running inline here; the
    export content is exactly the chain's output, so the oracle's
    full-chain SQL replay is unchanged."""
    from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

    docs = load_table(spark, sf_dir, "documents")
    u = md5_unit(F.col("doc_id"), "split:")
    splits = docs.select(
        "doc_id",
        F.when(u < _SPLIT_TRAIN, "train")
        .when(u < _SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    pairs = verified_pairs_export(spark, sf_dir).select("a", "b")
    joined = pairs.join(
        splits.select(F.col("doc_id").alias("a"), F.col("split").alias("split_a")), "a"
    ).join(
        splits.select(F.col("doc_id").alias("b"), F.col("split").alias("split_b")), "b"
    )
    lo = F.least("split_a", "split_b")
    hi = F.greatest("split_a", "split_b")
    return joined.groupBy(lo.alias("split_lo"), hi.alias("split_hi")).agg(
        F.count("*").alias("n_neardup_pairs")
    ).withColumn("is_leak", F.col("split_lo") != F.col("split_hi"))


# ---------------------------------------------------------------------------
# O12: sequence packing — fill fixed-capacity token contexts with
# documents (next-fit within md5-fold buckets). The packing step of a
# pretraining data pipeline: short documents share a context window
# instead of each paying padding to the context length. The oracle
# replays the per-bucket prefix recurrence as a recursive CTE (the b6
# pattern for sequential islands).
# ---------------------------------------------------------------------------


def _o12_oracle() -> str:
    from pipeline_mf_etl_spark.operators.packing import PACK_BUCKETS, PACK_BUDGET
    from pipeline_mf_etl_spark.queries.dedup import _FOLD

    fold = _FOLD.format(x="'pack:' || CAST(doc_id AS VARCHAR)")
    b = PACK_BUDGET
    return f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               {fold} % {PACK_BUCKETS} AS bucket,
               CAST(LEN(regexp_extract_all(LOWER(text),
                    '{_MIX_TOK_RE}')) AS BIGINT) AS n_tokens
        FROM documents
    ), ord AS (
        SELECT doc_id, bucket, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        FROM toks
    ), pack AS (
        SELECT bucket, rn, doc_id, n_tokens,
               CAST(1 AS BIGINT) AS seq_id, n_tokens AS fill
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN p.fill + o.n_tokens > {b}
                    THEN p.seq_id + 1 ELSE p.seq_id END,
               CASE WHEN p.fill + o.n_tokens > {b}
                    THEN o.n_tokens ELSE p.fill + o.n_tokens END
        FROM pack p
        JOIN ord o ON o.bucket = p.bucket AND o.rn = p.rn + 1
    )
    SELECT doc_id, bucket, seq_id, n_tokens,
           CAST(SUM(n_tokens) OVER w AS BIGINT) AS seq_tokens,
           CAST(COUNT(*) OVER w AS BIGINT) AS seq_n_docs,
           ROUND(SUM(n_tokens) OVER w * 1.0 / {b}, 6) AS fill_ratio
    FROM pack
    WINDOW w AS (PARTITION BY bucket, seq_id)
    """


@query("o12_sequence_packing", oracle=_o12_oracle())
def o12_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document context assignment under next-fit sequence packing:
    (bucket, seq_id) plus the packed sequence's token total, document
    count and fill ratio against the 256-token budget. Buckets are the
    scale/parallelism knob (one applyInPandas island per bucket; the
    bucket groupBy is the plan's only shuffle — see
    operators/packing.py). A doc longer than the budget sits alone in
    its sequence with fill_ratio > 1, reported not hidden."""
    from pipeline_mf_etl_spark.operators.packing import PACK_BUDGET, pack_next_fit

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(_MIX_TOK_RE), 0)
        ).cast("long").alias("n_tokens"),
    )
    packed = pack_next_fit(counted)
    return packed.withColumn(
        "fill_ratio", F.round(F.col("seq_tokens") * 1.0 / F.lit(PACK_BUDGET), 6)
    )


# ---------------------------------------------------------------------------
# O13: temperature-flattened source sampling — the multilingual/
# multi-domain rebalancing idiom (sample stratum s at an effective
# share ∝ n_s^α, α = 0.5): big sources are downsampled toward
# sqrt-growth, small sources kept whole, so no single domain dominates
# the mix. Per-stratum rate = min(1, sqrt(K / n_s)) gives an expected
# kept count min(n_s, sqrt(K·n_s)) — exactly the α = 0.5 flattening —
# WITHOUT any cross-stratum float sum: sqrt and division are IEEE
# correctly-rounded (pow is not), so both engines compute the
# bit-identical rate and the md5-fold Bernoulli admits the bit-
# identical doc set. K is the "keep-whole" pivot (strata smaller than
# K tokens^0 docs are untouched).
# ---------------------------------------------------------------------------
_TEMP_PIVOT = 100


@query(
    "o13_temperature_mix",
    oracle=f"""
    WITH cnt AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), rates AS (
        SELECT source, n_docs,
               LEAST(1.0, SQRT({_TEMP_PIVOT} * 1.0 / n_docs)) AS rate
        FROM cnt
    ), keyed AS (
        SELECT d.doc_id, d.source, r.n_docs, r.rate,
               list_reduce(list_transform(split(substr(md5(
                   'temp:' || CAST(d.doc_id AS VARCHAR)), 1, 15), ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (acc, y) -> acc * 16 + y) AS h
        FROM documents d JOIN rates r USING (source)
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(rate, 6) AS rate,
           COUNT(*) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM keyed
    WHERE (h % 1000000) / 1000000.0 < rate
    GROUP BY source, n_docs, rate
    """,
)
def o13_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened (α = 0.5) per-source sampling: admit each
    document Bernoulli(min(1, sqrt(K/n_source))) on the md5 fold —
    expected kept count min(n_s, sqrt(K·n_s)), the sqrt-growth
    flattening of a pretraining source mix. Plan shape: one
    groupBy(source) for the tiny rate table, broadcast back onto the
    doc stream, one admitted aggregate — same scale shape as o10."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    rates = cnt.select(
        "source",
        "n_docs",
        F.least(F.lit(1.0), F.sqrt(F.lit(_TEMP_PIVOT) * 1.0 / F.col("n_docs"))).alias(
            "rate"
        ),
    )
    admitted = docs.join(F.broadcast(rates), "source").filter(
        md5_unit(F.col("doc_id"), "temp:") < F.col("rate")
    )
    return admitted.groupBy("source", "n_docs", "rate").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    ).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round("rate", 6).alias("rate"),
        "n_sampled",
        "min_doc_id",
        "max_doc_id",
    )


# ---------------------------------------------------------------------------
# A18: HyperLogLog distinct-count sketch — completes the mergeable-
# sketch family (GK quantiles a16, count-min frequencies a17, HLL
# cardinalities a18): the constant-memory alternative to an exact
# COUNT(DISTINCT) whose shuffle grows with the key space. Rows-only by
# design (HLL++ register layouts are engine-specific); the property
# test bounds the estimate against the exact cardinality.
# ---------------------------------------------------------------------------
@query("a18_approx_distinct", oracle=None, driver_visible=False)
def a18_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users and distinct event days per event_type
    via HLL++ (rsd = 2%): one pass, mergeable partials, no
    key-space-sized shuffle — the 100 TB cardinality path."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.approx_count_distinct(F.to_date("ts"), rsd=0.02).alias("approx_days"),
        )
        .orderBy("event_type")
    )


# A18b: the exact COUNT(DISTINCT) twin of a18 — same grouping, same two
# cardinalities, hash-certifiable against the oracle (mirrors the
# o4/o4b seeded-vs-hash sampling pair: the native-RNG / sketch member
# stays rows-only, the deterministic twin carries the hard signal).
# Scale note: exact distinct shuffles the key space where a18 ships
# constant-size HLL registers — a18 remains the 100 TB default; a18b
# exists to certify the aggregation path and for exact-audit runs.
@query(
    "a18b_exact_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(DISTINCT CAST(ts AS DATE)) AS exact_days
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a18b_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users and distinct event days per event_type —
    the hash-certified sibling of the a18 HLL sketch."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.count_distinct(F.to_date("ts")).alias("exact_days"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# O14: sliding-window chunking — the context-preparation operator of a
# RAG / long-context training pipeline: split each document into
# overlapping fixed-size token windows (size 32, stride 24) with a
# per-chunk fingerprint for downstream chunk-level dedupe. Coverage
# rule: starts at 0, stride apart, last window truncated at the end of
# the doc; n_chunks = ceil(max(n - size, 0) / stride) + 1, so every
# token lands in >=1 chunk and no start position passes the end.
#
# Plan shape: tokenize + transform(sequence(...)) + one posexplode —
# map-only, ZERO exchanges; output rows grow ~n_tokens/stride, linear
# in corpus bytes. The 100 TB story is the same as a scan.
# ---------------------------------------------------------------------------
_O14_SIZE = 32
_O14_STRIDE = 24


@query(
    "o14_chunk_windows",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_DOC_TOKS} AS toks FROM documents
    ),
    geo AS (
        SELECT doc_id, toks, len(toks) AS n,
               CAST(ceil(greatest(len(toks) - {_O14_SIZE}, 0) * 1.0
                    / {_O14_STRIDE}) AS INTEGER) + 1 AS n_chunks
        FROM tok
    ),
    chunks AS (
        SELECT g.doc_id,
               CAST(i AS INTEGER) AS chunk_idx,
               CAST(i * {_O14_STRIDE} AS INTEGER) AS chunk_start,
               list_slice(g.toks, i * {_O14_STRIDE} + 1,
                          i * {_O14_STRIDE} + {_O14_SIZE}) AS sl
        FROM geo g, UNNEST(range(g.n_chunks)) AS u(i)
    )
    SELECT doc_id, chunk_idx, chunk_start,
           CAST(len(sl) AS INTEGER) AS n_chunk_tokens,
           md5(array_to_string(sl, ' ')) AS chunk_md5
    FROM chunks
    """,
)
def o14_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking with per-chunk md5 fingerprints
    (chunk text is identified by fingerprint, not re-emitted — at 100 TB
    the chunk payload ships to the sink, not through every stage)."""
    from pipeline_mf_etl_spark.operators.dedupe import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    n_chunks = (
        F.ceil(F.greatest(n - _O14_SIZE, F.lit(0)) * 1.0 / _O14_STRIDE).cast("int") + 1
    )
    geo = t.select("doc_id", "toks", n_chunks.alias("n_chunks"))
    ch = geo.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx", "_i"),
    )
    sl = F.slice(F.col("toks"), F.col("chunk_idx") * _O14_STRIDE + 1, _O14_SIZE)
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * _O14_STRIDE).cast("int").alias("chunk_start"),
        F.size(sl).cast("int").alias("n_chunk_tokens"),
        F.md5(F.array_join(sl, " ")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# o15: deterministic global shuffle + shard assignment — the last step
# before training-file export: every doc gets a pseudo-random shard
# (md5 fold, map-only — no global sort, no single-partition bottleneck)
# and a within-shard position from a second independent fold (the
# "shuffled" read order). Shard count is chosen for target file size;
# each shard sorts independently, so the only shuffle is the N-way
# hash partition by shard. Reproducible on any engine / partitioning.
# ---------------------------------------------------------------------------
_O15_SHARDS = 8


def _o15_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _FOLD

    shard_fold = _FOLD.format(x="'shard:' || CAST(doc_id AS VARCHAR)")
    ord_fold = _FOLD.format(x="'ord:' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST({shard_fold} % {_O15_SHARDS} AS INTEGER) AS shard,
               ({ord_fold} % 1000000) / 1000000.0 AS u
        FROM documents
    )
    SELECT shard, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY u, doc_id) AS INTEGER) AS pos
    FROM keyed
    """


@query("o15_shard_shuffle", oracle=_o15_oracle())
def o15_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard + shuffled read-order assignment per doc:
    shard = md5-fold('shard:'||id) mod N (map-only), pos = rank of an
    independent md5-fold within the shard (doc_id tie-break — the
    [0,1) fold has 1e6 distinct values, so collisions are expected at
    corpus scale and must not make the order ambiguous)."""
    from pyspark.sql import Window

    from pipeline_mf_etl_spark.operators.dedupe import md5_int64, md5_unit

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        (md5_int64(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
         % _O15_SHARDS).cast("int").alias("shard"),
        md5_unit(F.col("doc_id"), "ord:").alias("u"),
    )
    w = Window.partitionBy("shard").orderBy("u", "doc_id")
    return keyed.select(
        "shard",
        "doc_id",
        F.row_number().over(w).cast("int").alias("pos"),
    )


# ---------------------------------------------------------------------------
# o16: exact-k deterministic per-group sampling — the balanced-subset
# op (k docs per source, reproducibly, no RNG): rank an md5 fold within
# each group and keep the k smallest. Unlike o9's Bernoulli (expected
# rate, binomial count), this guarantees EXACTLY min(k, group size)
# rows per group — what an eval-set builder or per-source cap wants.
# One shuffle (the per-group rank); stable under repartitioning.
# ---------------------------------------------------------------------------
_O16_K = 20


def _o16_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _FOLD

    fold = _FOLD.format(x="'pick:' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH keyed AS (
        SELECT doc_id, source, ({fold} % 1000000) / 1000000.0 AS u
        FROM documents
    )
    SELECT source, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY u, doc_id) AS INTEGER) AS pick
    FROM keyed
    QUALIFY pick <= {_O16_K}
    """


@query("o16_per_group_sample", oracle=_o16_oracle())
def o16_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k=20 docs per source, chosen by md5-fold order with a
    doc_id tie-break (the fold's 1e6 values collide at corpus scale)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "source", md5_unit(F.col("doc_id"), "pick:").alias("u")
    )
    w = Window.partitionBy("source").orderBy("u", "doc_id")
    return (
        keyed.withColumn("pick", F.row_number().over(w).cast("int"))
        .filter(F.col("pick") <= _O16_K)
        .select("source", "doc_id", "pick")
    )


# ---------------------------------------------------------------------------
# o17: quality-WEIGHTED sampling — admission probability proportional
# to the document's t2 quality (rate = quality/2, so a 1.0-quality doc
# admits at 50% and junk near-0 almost never): the soft alternative to
# t10's hard floor when a budget must prefer, not require, quality.
# Deterministic (md5-fold vs per-doc rate), map-only decision, one
# per-source rollup; quality sums aggregate 6-dp multiples (boundary-
# safe, see d9).
# ---------------------------------------------------------------------------
_O17_BASE = 0.5


def _o17_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _FOLD
    from pipeline_mf_etl_spark.queries.text import T2_SQL

    fold = _FOLD.format(x="'wsample:' || CAST(d.doc_id AS VARCHAR)")
    return f"""
    WITH q AS ({T2_SQL}),
    decided AS (
        SELECT d.source, q.quality,
               ({fold} % 1000000) / 1000000.0
                   < ROUND(q.quality * {_O17_BASE}, 6) AS admitted
        FROM documents d JOIN q USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
           ROUND(SUM(CASE WHEN admitted THEN quality ELSE 0 END), 6)
               AS sum_quality_admitted
    FROM decided
    GROUP BY source
    """


@query("o17_weighted_sample", oracle=_o17_oracle())
def o17_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source admission report under quality-proportional sampling
    (deterministic md5-fold vs rate = quality/2)."""
    from pipeline_mf_etl_spark.queries.text import t2_quality_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = t2_quality_score(spark, sf_dir).select("doc_id", "quality")
    u = md5_unit(F.col("doc_id"), "wsample:")
    rate = F.round(F.col("quality") * _O17_BASE, 6)
    decided = docs.join(q, "doc_id").select(
        "source", "quality", (u < rate).alias("admitted")
    )
    return decided.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("admitted"), 1).otherwise(0)).cast("long").alias("n_admitted"),
        F.round(
            F.sum(F.when(F.col("admitted"), F.col("quality")).otherwise(0.0)), 6
        ).alias("sum_quality_admitted"),
    )


# ---------------------------------------------------------------------------
# O19: purged temporal K-fold split with embargo — the leakage-rigorous
# version of the reference's plain time split (research/pipeline.py's
# train<=end / test>end) and the standard protocol for financial CV:
# rows are folded by calendar week, and every row within the embargo
# horizon of a fold BOUNDARY is flagged for exclusion from training, so
# forward-looking labels computed near the boundary (fwd_ret_k, W14)
# cannot leak across folds. Pure column arithmetic — one scan, one
# deterministic week->fold map; the fold/embargo decision ships WITH
# each row so any downstream trainer filters locally (no join).
# ---------------------------------------------------------------------------
_O19_FOLDS = 4
_O19_EMBARGO_DAYS = 1


@query(
    "o19_purged_split",
    oracle=f"""
    WITH base AS (
        SELECT event_id, user_id, ts,
               CAST(date_trunc('week', ts) AS DATE) AS week_start,
               CAST((CAST(date_trunc('week', ts) AS DATE)
                     - DATE '1970-01-01') // 7
                    % {_O19_FOLDS} AS INTEGER) AS fold
        FROM events
    )
    SELECT event_id, user_id, week_start, fold,
           (ts < CAST(week_start AS TIMESTAMP) + INTERVAL {_O19_EMBARGO_DAYS} DAY
            OR ts >= CAST(week_start AS TIMESTAMP) + INTERVAL 7 DAY
                     - INTERVAL {_O19_EMBARGO_DAYS} DAY) AS embargoed
    FROM base
    """,
)
def o19_purged_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-folded purged split: fold = (epoch-week index) mod K, and
    rows within the embargo horizon of either weekly fold boundary are
    flagged ``embargoed`` (drop from TRAIN when the label looks
    forward; keep in eval). Deterministic, repartition-stable, no
    shuffle beyond the scan."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    fold = (
        F.floor(F.unix_date(week) / 7) % _O19_FOLDS
    ).cast("int")
    wk_ts = week.cast("timestamp")
    lo = wk_ts + F.expr(f"INTERVAL {_O19_EMBARGO_DAYS} DAY")
    hi = wk_ts + F.expr("INTERVAL 7 DAY") - F.expr(
        f"INTERVAL {_O19_EMBARGO_DAYS} DAY"
    )
    return ev.select(
        "event_id",
        "user_id",
        week.alias("week_start"),
        fold.alias("fold"),
        ((F.col("ts") < lo) | (F.col("ts") >= hi)).alias("embargoed"),
    )


# ---------------------------------------------------------------------------
# O20: weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
# round 14) — the missing member of the sampling family: o4b/o9/o13
# admit docs Bernoulli (independent coin per doc, random TOTAL), while
# a training-data budget usually wants EXACTLY k docs drawn
# length-proportionally. A-ES: each doc draws an Exp(1)/weight key and
# the k SMALLEST keys are the sample — distributionally exact, one
# pass, and embarrassingly parallel: per-partition top-k then a k·P
# driver merge (Spark's TakeOrderedAndProject), never a data shuffle.
# The draw is the engine-agnostic md5 fold (operators/dedupe.md5_unit),
# so the identical doc set falls out of any engine — the oracle
# replays the fold arithmetic exactly. -ln(1-u) keeps the draw finite
# (u in [0,1) so 1-u in (0,1]; a 1e-6 jackpot draw of key 0 is a draw,
# not an error); doc_id breaks exact key ties deterministically.
# ---------------------------------------------------------------------------
_O20_K = 200


@query(
    "o20_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               -ln(1.0 - (list_reduce(list_transform(split(substr(md5(
                   'wres:' || CAST(doc_id AS VARCHAR)), 1, 15), ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (acc, y) -> acc * 16 + y) % 1000000) / 1000000.0)
               / n_chars AS e
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           ROUND(e, 9) AS wkey
    FROM keyed
    ORDER BY e, doc_id
    LIMIT {_O20_K}
    """,
)
def o20_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Draw exactly K documents length-weighted (weight = n_chars)
    without replacement via deterministic A-ES keys. Plan shape: map
    pass + TakeOrderedAndProject (per-partition top-K, driver merge of
    K·P rows) — zero exchanges, the 100 TB fixed-budget sampler."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    )
    e = -F.log(F.lit(1.0) - md5_unit(F.col("doc_id"), "wres:")) / F.col(
        "n_chars"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            e.alias("e"),
        )
        .orderBy("e", "doc_id")
        .limit(_O20_K)
        .select(
            "doc_id", "source", "weight", F.round("e", 9).alias("wkey")
        )
    )
