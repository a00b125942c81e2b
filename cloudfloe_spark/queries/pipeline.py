"""End-to-end curation pipeline: the composition query.

A real training-data pipeline chains the individual operators this
catalog ships — exact dedup, quality scoring, language ID, deterministic
splitting — into one pass. This query IS that chain, and its oracle
reproduces every stage, so the composition (not just the parts) is
value-checked.

Stage order is the scale-correct one:
1. fingerprint dedup FIRST (cheapest blocker: one shuffle on a 16-byte
   hash removes exact copies before any scoring work),
2. per-row scoring (quality, lang-ID) — pure projections,
3. threshold + language filters,
4. deterministic hash split (train/eval) — a fact about the data, not
   about one job run,
5. a summary aggregation (per lang × split counts + total quality).

One wide shuffle (the dedup groupBy) + one tiny one (the final agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.functions.text import (
    fingerprint,
    lang_id,
    portable_hash64,
    portable_hash_sql,
    quality_score,
)
from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.queries.text import _lang_hits_sql, _WORDS_SQL
from cloudfloe_spark.sources.tables import load_table

_QUALITY_THRESHOLD = 0.5
_TRAIN_PCT = 90

# SQL twins of the stage expressions (same fragments the stage queries use)
_FP_SQL = "MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))"
_QUALITY_SQL = f"""
    ROUND((LEAST(CAST(LEN({_WORDS_SQL}) AS DOUBLE) / 50.0, 1.0)
        + (CASE WHEN (CASE WHEN LEN({_WORDS_SQL}) > 0
                THEN CAST(LIST_SUM(LIST_TRANSFORM({_WORDS_SQL}, w -> LENGTH(w))) AS DOUBLE)
                     / LEN({_WORDS_SQL}) ELSE 0.0 END) BETWEEN 3.0 AND 8.0
           THEN 1.0 ELSE 0.5 END)
        + (1.0 - LEAST((CASE WHEN LENGTH(text) > 0
                THEN CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                     / LENGTH(text) ELSE 0.0 END) * 5.0, 1.0))) / 3.0, 4)
"""
_LANG_SQL = f"""
    CASE WHEN GREATEST({_lang_hits_sql('en')}, {_lang_hits_sql('de')},
                       {_lang_hits_sql('fr')}, {_lang_hits_sql('es')}) = 0 THEN 'und'
         WHEN {_lang_hits_sql('en')} >= GREATEST({_lang_hits_sql('de')},
                  {_lang_hits_sql('fr')}, {_lang_hits_sql('es')}) THEN 'en'
         WHEN {_lang_hits_sql('de')} >= GREATEST({_lang_hits_sql('fr')},
                  {_lang_hits_sql('es')}) THEN 'de'
         WHEN {_lang_hits_sql('fr')} >= {_lang_hits_sql('es')} THEN 'fr'
         ELSE 'es' END
"""


@register(
    "curation_pipeline_summary",
    oracle=f"""
        WITH keepers AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       ROW_NUMBER() OVER (PARTITION BY {_FP_SQL}
                                          ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
        ),
        scored AS (
            SELECT doc_id,
                   {_QUALITY_SQL} AS quality,
                   {_LANG_SQL} AS lang_pred,
                   CASE WHEN ({portable_hash_sql("CAST(doc_id AS VARCHAR)")}) % 100
                             < {_TRAIN_PCT}
                        THEN 'train' ELSE 'eval' END AS split
            FROM keepers
        )
        SELECT lang_pred, split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(SUM(quality), 4) AS total_quality
        FROM scored
        WHERE quality >= {_QUALITY_THRESHOLD} AND lang_pred <> 'und'
        GROUP BY lang_pred, split
    """,
    tags=("pipeline", "dedup", "text", "sampling"),
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain in one plan: exact-dedup keeper →
    quality + lang-ID scoring → thresholds → deterministic train/eval
    split → per (lang, split) summary. See module docstring for why the
    stages run in this order at scale."""
    d = load_table(spark, sf_dir, "documents")

    # r15 optimization (guide §2.3 — shuffle metadata, not payloads): the
    # r14 shape shuffled the FULL text through the fingerprint window to
    # pick each group's min-doc_id row, then scored the keepers. Duplicate
    # copies have identical text, so scoring is fingerprint-constant —
    # score FIRST as a pure projection, then reduce each fingerprint group
    # with a map-side-combinable min_by over narrow columns. Only
    # (fp, doc_id, quality, lang) cross the exchange, no window sort, and
    # min_by(struct, doc_id) picks exactly the row the rn=1 window picked.
    # Measured 1.42 s → 0.96 s at sf0.1; identical output.
    scored_all = d.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_pred"),
    )
    keepers = (
        scored_all.groupBy("fp")
        .agg(
            F.min_by(
                F.struct("doc_id", "quality", "lang_pred"), F.col("doc_id")
            ).alias("k")
        )
        .select("k.doc_id", "k.quality", "k.lang_pred")
    )
    scored = keepers.withColumn(
        "split",
        F.when(
            portable_hash64(F.col("doc_id").cast("string")) % 100 < _TRAIN_PCT,
            F.lit("train"),
        ).otherwise(F.lit("eval")),
    )
    return (
        scored.filter(
            (F.col("quality") >= _QUALITY_THRESHOLD)
            & (F.col("lang_pred") != "und")
        )
        .groupBy("lang_pred", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("quality"), 4).alias("total_quality"),
        )
    )


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_SEED_SQL = """
    CASE WHEN doc_id % 10 = 0 THEN
        text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
    ELSE text END
"""


@register(
    "curation_pipeline_chunks",
    # Round-2 composition: PII scrub → exact dedup on the CLEAN text →
    # overlapping-window chunking → per-source stats. The fixture corpus
    # has no PII, so both sides seed a deterministic contact line into
    # every 10th document (same convention as text_pii_redact) — the
    # pipeline then demonstrably redacts, dedups, and chunks.
    oracle=f"""
        WITH seeded AS (
            SELECT doc_id, source, {_PII_SEED_SQL} AS text FROM documents
        ),
        clean AS (
            SELECT doc_id, source,
                   REGEXP_REPLACE(text, '{_PII_EMAIL}', '<EMAIL>', 'g') AS text,
                   (REGEXP_MATCHES(text, '{_PII_EMAIL}')) AS had_pii
            FROM seeded
        ),
        keepers AS (
            SELECT doc_id, source, text, had_pii FROM (
                SELECT clean.*,
                       ROW_NUMBER() OVER (PARTITION BY {_FP_SQL}
                                          ORDER BY doc_id) AS rn
                FROM clean
            ) WHERE rn = 1
        ),
        chunks AS (
            SELECT k.doc_id, k.source,
                   LEN(words[s.start+1 : LEAST(s.start+64, LEN(words))])
                       AS chunk_words
            FROM (SELECT *,
                         LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                     x -> x <> '') AS words
                  FROM keepers) k,
                 LATERAL (SELECT UNNEST(GENERATE_SERIES(
                              0, GREATEST(LEN(words) - 1, 0), 48)) AS start) s
        )
        SELECT k.source,
               CAST(COUNT(DISTINCT k.doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN k.had_pii THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_redacted_docs,
               CAST((SELECT COUNT(*) FROM chunks c WHERE c.source = k.source)
                   AS BIGINT) AS n_chunks,
               CAST((SELECT COALESCE(SUM(chunk_words), 0) FROM chunks c
                     WHERE c.source = k.source) AS BIGINT) AS total_chunk_words
        FROM keepers k
        GROUP BY k.source
    """,
    tags=("pipeline", "pii", "dedup", "chunking"),
)
def curation_pipeline_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 curation composition in one plan: PII scrubbing (emails →
    placeholder) BEFORE dedup — so documents identical up to their contact
    lines collapse — then exact dedup on the clean-text fingerprint, then
    overlapping-window chunking (64/48), summarized per source.

    Scale shape: redaction and chunking are pure projections; the only
    wide shuffle is the dedup window on the 16-byte fingerprint; the final
    per-source agg is tiny."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    d = load_table(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = seeded.select(
        "doc_id",
        "source",
        F.regexp_replace(F.col("text"), F.lit(email), F.lit("<EMAIL>")).alias(
            "text"
        ),
        (F.regexp_count(F.col("text"), F.lit(email)) > 0).alias("had_pii"),
    )
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    keepers = (
        clean.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    from cloudfloe_spark.functions.text import words as _words

    ws = _words(F.col("text"))
    chunks = keepers.select(
        "doc_id",
        "source",
        ws.alias("ws"),
    ).select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.size("ws") - 1, F.lit(0)), F.lit(48)
            )
        ).alias("start"),
        F.col("ws"),
    ).select(
        "doc_id",
        "source",
        F.size(F.slice(F.col("ws"), F.col("start") + 1, F.lit(64))).alias(
            "chunk_words"
        ),
    )
    doc_stats = keepers.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.col("had_pii").cast("bigint")).alias("n_redacted_docs"),
    )
    chunk_stats = chunks.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_words").cast("bigint").alias("total_chunk_words"),
    )
    return doc_stats.join(chunk_stats, "source")


@register(
    "curation_survival_funnel",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, text, lang,
                   LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                   w -> w <> '')) AS n_words,
                   MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))))
                       AS fp
            FROM documents
        ),
        s0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        q AS (SELECT * FROM base WHERE n_words BETWEEN 25 AND 1000),
        s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
        d AS (SELECT fp FROM q GROUP BY fp),
        s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
        SELECT * FROM (
            SELECT 0 AS stage_no, 'input' AS stage, n,
                   1.0 AS frac_of_input FROM s0
            UNION ALL
            SELECT 1, 'length_gate', s1.n,
                   ROUND(CAST(s1.n AS DOUBLE) / s0.n, 4) FROM s1, s0
            UNION ALL
            SELECT 2, 'exact_dedup', s2.n,
                   ROUND(CAST(s2.n AS DOUBLE) / s0.n, 4) FROM s2, s0
        )
    """,
    tags=("pipeline", "funnel"),
)
def curation_survival_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survival counts through the curation pipeline — input →
    word-count length gate (the Gopher bound) → exact dedup on the
    normalized fingerprint — the one-table yield report a data-curation
    run publishes ("we kept N% of the crawl"). Each stage's count and
    fraction-of-input in one frame, composed from the same primitives the
    standalone operators use.

    Scale shape: one corpus scan computes words + fingerprint; each
    stage is a 1-row aggregate combined by free cross joins (the DQ-check
    pattern); the dedup stage is the usual map-side-combinable fingerprint
    groupBy. No stage re-reads the corpus."""
    from cloudfloe_spark.functions.text import fingerprint, word_count

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        word_count(F.col("text")).alias("n_words"),
        fingerprint(F.col("text")).alias("fp"),
    )
    q = base.filter(F.col("n_words").between(25, 1000))
    s0 = base.agg(F.count("*").cast("bigint").alias("n0"))
    s1 = q.agg(F.count("*").cast("bigint").alias("n1"))
    s2 = q.select("fp").distinct().agg(F.count("*").cast("bigint").alias("n2"))
    joined = s0.crossJoin(s1).crossJoin(s2)
    rows = [
        joined.select(
            F.lit(0).alias("stage_no"),
            F.lit("input").alias("stage"),
            F.col("n0").alias("n"),
            F.lit(1.0).alias("frac_of_input"),
        ),
        joined.select(
            F.lit(1).alias("stage_no"),
            F.lit("length_gate").alias("stage"),
            F.col("n1").alias("n"),
            F.round(F.col("n1").cast("double") / F.col("n0"), 4).alias(
                "frac_of_input"
            ),
        ),
        joined.select(
            F.lit(2).alias("stage_no"),
            F.lit("exact_dedup").alias("stage"),
            F.col("n2").alias("n"),
            F.round(F.col("n2").cast("double") / F.col("n0"), 4).alias(
                "frac_of_input"
            ),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_SPLIT_SEED = 7
_VAL_PCT_LO, _VAL_PCT_HI = 80, 90  # train <80, val 80-89, test 90-99


@register(
    "pipeline_stratified_split",
    oracle=f"""
        WITH tagged AS (
            SELECT lang,
                   CASE
                     WHEN ({portable_hash_sql('CAST(doc_id AS VARCHAR)', _SPLIT_SEED)})
                          % 100 < {_VAL_PCT_LO} THEN 'train'
                     WHEN ({portable_hash_sql('CAST(doc_id AS VARCHAR)', _SPLIT_SEED)})
                          % 100 < {_VAL_PCT_HI} THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM documents
        )
        SELECT lang, split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER (PARTITION BY lang), 4) AS frac
        FROM tagged
        GROUP BY lang, split
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic three-way train/val/test split, audited per language:
    the split is a pure function of the row key (portable 60-bit hash mod
    100 → 80/10/10), never of job parallelism or run order, so re-running
    at any cluster size reproduces byte-identical membership — the property
    a training pipeline needs for split integrity across re-crawls. The
    output is the stratification audit (per-language counts + within-lang
    fractions) a data team reviews before shipping the split.

    Scale shape: a single scan, split stamped as a projection, one
    combinable groupBy on the tiny (lang, split) key space; the within-lang
    fraction is a window over the already-aggregated rows (|langs|x3 rows),
    not over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id").cast("string"), seed=_SPLIT_SEED) % 100
    tagged = d.select(
        "lang",
        F.when(bucket < _VAL_PCT_LO, "train")
        .when(bucket < _VAL_PCT_HI, "val")
        .otherwise("test")
        .alias("split"),
    )
    counts = tagged.groupBy("lang", "split").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "split",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 4
        ).alias("frac"),
    )


_REBALANCE_BUDGET = 0.6  # keep at most 60% of the corpus overall
_REBALANCE_SEED = 11
_REBALANCE_RES = 1_000_000  # hash-threshold resolution


@register(
    "pipeline_language_rebalance",
    oracle=f"""
        WITH per_lang AS (
            SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n_lang
            FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang, n_lang,
                   LEAST(1.0,
                         (SELECT SUM(n_lang) FROM per_lang) * {_REBALANCE_BUDGET}
                         / (SELECT COUNT(*) FROM per_lang) / n_lang) AS rate
            FROM per_lang
        ),
        kept AS (
            SELECT d.lang
            FROM documents d JOIN rates r ON r.lang = d.lang
            WHERE ({portable_hash_sql('CAST(doc_id AS VARCHAR)', _REBALANCE_SEED)})
                  % {_REBALANCE_RES}
                  < CAST(FLOOR(r.rate * {_REBALANCE_RES}) AS BIGINT)
        )
        SELECT r.lang,
               CAST(r.n_lang AS BIGINT) AS n_before,
               CAST(COUNT(k.lang) AS BIGINT) AS n_kept,
               ROUND(r.rate, 6) AS rate
        FROM rates r LEFT JOIN kept k ON k.lang = r.lang
        GROUP BY r.lang, r.n_lang, r.rate
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_language_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing by deterministic downsampling: compute the
    per-language keep-rate that caps every language at an equal share of a
    60%-of-corpus budget (rate = min(1, budget/|langs|/n_lang)), then keep a
    document iff its portable hash falls under the rate threshold — the
    standard recipe for flattening a crawl's language skew into a target
    training mix without a shuffle-heavy sample. Membership is again a pure
    function of the row key: any executor count reproduces the same kept
    set, and an incremental re-crawl appends without resampling old rows.

    Scale shape: one combinable per-lang count (tiny result), rates derived
    driver-free from that aggregate, broadcast back onto the corpus scan as
    an equi-join, and the kept set collapses map-side into per-lang counts.
    The corpus is scanned twice but shuffled ZERO times at corpus width —
    both aggregations carry |langs| rows."""
    d = load_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(F.count("*").cast("double").alias("n_lang"))
    totals = per_lang.agg(
        F.sum("n_lang").alias("n_total"), F.count("*").cast("double").alias("n_langs")
    )
    rates = per_lang.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_lang",
        F.least(
            F.lit(1.0),
            F.col("n_total") * _REBALANCE_BUDGET / F.col("n_langs") / F.col("n_lang"),
        ).alias("rate"),
    )
    thresh = F.floor(F.col("rate") * _REBALANCE_RES).cast("bigint")
    kept = (
        d.join(F.broadcast(rates), "lang")
        .filter(
            portable_hash64(F.col("doc_id").cast("string"), seed=_REBALANCE_SEED)
            % _REBALANCE_RES
            < thresh
        )
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n_lang").cast("bigint").alias("n_before"),
            F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
    )


_MIX_BUDGET_MULT = 2.0  # token budget = 2x corpus tokens (some sources repeat)
_MIX_MAX_EPOCHS = 4.0  # repetition cap per source (diminishing returns)


@register(
    "pipeline_epoch_mix_plan",
    oracle=f"""
        WITH per_source AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(LEN({_WORDS_SQL})) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        totals AS (
            SELECT SUM(n_tokens) AS total_tokens,
                   COUNT(*) AS n_sources
            FROM per_source
        )
        SELECT p.source, p.n_docs, p.n_tokens,
               ROUND(LEAST({_MIX_MAX_EPOCHS},
                     t.total_tokens * {_MIX_BUDGET_MULT} / t.n_sources
                     / p.n_tokens), 4) AS epochs,
               CAST(ROUND(LEAST({_MIX_MAX_EPOCHS},
                     t.total_tokens * {_MIX_BUDGET_MULT} / t.n_sources
                     / p.n_tokens) * p.n_tokens, 0) AS BIGINT)
                   AS planned_tokens
        FROM per_source p CROSS JOIN totals t
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_epoch_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix epoch plan: given per-source token counts, a token
    budget of 2x the corpus, and an equal-share target mix, compute each
    source's repetition factor (epochs = min(cap, budget_share /
    source_tokens), cap 4 — the diminishing-returns bound from the
    data-constrained-scaling literature) and the tokens it will actually
    contribute. This is the recipe table an LLM training run consumes to
    oversample scarce sources without unbounded repetition.

    Scale shape: one combinable (source, token-count) aggregate over the
    corpus — the only corpus-width work; the plan arithmetic runs on
    |sources| rows against a broadcast 1-row totals aggregate. Identical
    expression trees on both engines keep the double arithmetic
    ulp-aligned."""
    from cloudfloe_spark.functions.text import word_count

    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(word_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    epochs = F.least(
        F.lit(_MIX_MAX_EPOCHS),
        F.col("total_tokens") * _MIX_BUDGET_MULT / F.col("n_sources")
        / F.col("n_tokens"),
    )
    return per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(epochs, 4).alias("epochs"),
        F.round(epochs * F.col("n_tokens"), 0).cast("bigint").alias(
            "planned_tokens"
        ),
    )
