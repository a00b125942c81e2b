"""Text-analysis operators over ``documents``: language-ID, quality scoring,
token counting, fingerprinting, n-gram frequency.

Training-data-pipeline components (north-star extension surface). Every
expression is a built-in-function composition (see
``cloudfloe_spark.functions.text``) — JVM-side, no Python in the row path —
and each has an exact DuckDB oracle twin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.functions.text import (
    LANG_STOPWORDS,
    lang_id,
    portable_hash64,
    portable_hash_sql,
    mean_word_length,
    punct_ratio,
    quality_score,
    word_count,
    words,
)
from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table

_WORDS_SQL = "LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), w -> w <> '')"


def _lang_hits_sql(lang: str) -> str:
    sw = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"LEN(LIST_FILTER(LIST_TRANSFORM({_WORDS_SQL}, w -> LOWER(w)),"
        f" w -> w IN ({sw})))"
    )


@register(
    "text_token_count",
    oracle=f"""
        SELECT doc_id,
               CAST(LEN({_WORDS_SQL}) AS INT) AS n_tokens,
               CAST(LENGTH(text) AS BIGINT)   AS n_chars_actual,
               CAST(LEN(LIST_DISTINCT({_WORDS_SQL})) AS INT) AS n_unique_tokens
        FROM documents
    """,
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + distinct-token counting per document."""
    d = load_table(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    return d.select(
        "doc_id",
        F.size(ws).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(F.array_distinct(ws)).alias("n_unique_tokens"),
    )


@register(
    "text_quality_score",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(LEN({_WORDS_SQL}) AS DOUBLE) AS n_words,
                   CASE WHEN LEN({_WORDS_SQL}) > 0
                        THEN CAST(LIST_SUM(LIST_TRANSFORM({_WORDS_SQL}, w -> LENGTH(w))) AS DOUBLE)
                             / LEN({_WORDS_SQL})
                        ELSE 0.0 END AS mwl,
                   CASE WHEN LENGTH(text) > 0
                        THEN CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                             / LENGTH(text)
                        ELSE 0.0 END AS punct
            FROM documents
        )
        SELECT doc_id,
               ROUND((LEAST(n_words / 50.0, 1.0)
                      + (CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END)
                      + (1.0 - LEAST(punct * 5.0, 1.0))) / 3.0, 4) AS quality
        FROM feats
    """,
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length + word-length plausibility + low
    punctuation noise, closed-form (oracle-reproducible)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@register(
    "text_stats_by_lang",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(LEN({_WORDS_SQL})), 2) AS avg_tokens,
               ROUND(AVG(CASE WHEN LEN({_WORDS_SQL}) > 0
                        THEN CAST(LIST_SUM(LIST_TRANSFORM({_WORDS_SQL}, w -> LENGTH(w))) AS DOUBLE)
                             / LEN({_WORDS_SQL})
                        ELSE 0.0 END), 4) AS avg_word_len,
               ROUND(AVG(CASE WHEN LENGTH(text) > 0
                        THEN CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                             / LENGTH(text)
                        ELSE 0.0 END), 4) AS avg_punct_ratio
        FROM documents
        GROUP BY lang
    """,
    tags=("text", "agg"),
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text statistics grouped by language."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            word_count(F.col("text")).alias("wc"),
            mean_word_length(F.col("text")).alias("mwl"),
            punct_ratio(F.col("text")).alias("pr"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("wc"), 2).alias("avg_tokens"),
            F.round(F.avg("mwl"), 4).alias("avg_word_len"),
            F.round(F.avg("pr"), 4).alias("avg_punct_ratio"),
        )
    )


@register(
    "text_lang_id",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang AS actual_lang,
                   {_lang_hits_sql('en')} AS s_en,
                   {_lang_hits_sql('de')} AS s_de,
                   {_lang_hits_sql('fr')} AS s_fr,
                   {_lang_hits_sql('es')} AS s_es
            FROM documents
        )
        SELECT doc_id, actual_lang,
               CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                    WHEN s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
                    WHEN s_de >= GREATEST(s_fr, s_es) THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS predicted_lang
        FROM scored
    """,
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit-count language identification (n-gram heuristic):
    argmax over per-language function-word hit counts, ties broken by fixed
    language order, zero hits → 'und'."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )


@register(
    "text_fingerprint_rolling",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
        )
        SELECT doc_id,
               CAST(LIST_SUM(LIST_TRANSFORM(
                   GENERATE_SERIES(1, LEN(ws)),
                   i -> i * (LENGTH(ws[i]) * 131 + ASCII(SUBSTRING(ws[i], 1, 1)))
               )) % 2147483647 AS BIGINT) AS rolling_fp
        FROM toks
        WHERE LEN(ws) > 0
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint: position-weighted
    polynomial over (word length, first char) — permutations of the same
    words produce different prints, unlike bag-of-words md5."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "w")
    ).select("doc_id", (F.col("pos") + 1).alias("i"), "w")
    contrib = F.col("i") * (
        F.length("w") * 131 + F.ascii(F.substring("w", 1, 1))
    )
    return (
        toks.groupBy("doc_id")
        .agg((F.sum(contrib) % 2147483647).cast("bigint").alias("rolling_fp"))
    )


@register(
    "text_bigram_freq",
    oracle="""
        WITH raw AS (
            SELECT UNNEST(LIST_TRANSFORM(
                GENERATE_SERIES(1, GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) - 1, 0)),
                i -> ARRAY_TO_STRING(STRING_SPLIT_REGEX(TRIM(text), '\\s+')[i:i+1], ' ')
            )) AS bigram
            FROM documents
        )
        SELECT bigram, COUNT(*) AS n
        FROM raw
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 25
    """,
    tags=("text", "ngram"),
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level word-bigram frequency, top 25."""
    from cloudfloe_spark.functions.text import word_shingles

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(word_shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(25)
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(LIST_FILTER(
                       STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                       w -> w <> '')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6)
                       AS tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0))
                                DESC, tf.term
                   ) AS rnk
            FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
        )
        SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk
        FROM scored WHERE rnk <= 3
    """,
    tags=("text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1))).

    Scale shape: one explode + (doc,term) aggregation (the big shuffle),
    a small per-term document-frequency aggregate joined BACK by term
    (shuffle join — df is |vocab|-sized, broadcast it if vocab is small),
    and a per-doc top-k window that plans as WindowGroupLimit so the full
    scored list never materializes per partition."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))  # 1-row, broadcast; stays lazy
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("raw"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", F.round("raw", 6).alias("tfidf"), "rnk")
    )


@register(
    "text_decontaminate_ngram",
    oracle="""
        WITH toks AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id, ARRAY_TO_STRING(t[i.i:i.i + 3], ' ') AS gram
            FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 2, 1))) AS i(i)
        ),
        bench AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0
        )
        SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hits
        FROM grams g
        JOIN bench b ON b.gram = g.gram
        WHERE g.doc_id % 50 <> 0
        GROUP BY g.doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def text_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap (the GPT-3/Pile
    recipe): flag every training document sharing at least one n-gram with
    the held-out eval set, reporting the distinct overlapping grams per doc.
    Eval membership is the deterministic hash-mod split (doc_id % 50 == 0);
    n=4 fits this synthetic corpus' tiny vocabulary (production uses 8–13).

    Scale shape: the eval side is small by construction (benchmarks are
    ~1e4 docs), so its distinct grams BROADCAST and the exploded corpus
    grams never shuffle for the join; the per-doc hit count shuffles only
    the matched rows (rare by design). If the eval gram set ever outgrows
    broadcast, swap to a shuffle hash join on gram — same plan otherwise.
    Reference has no training-pipeline surface (SURVEY.md north-star);
    closest analogue is its UNNEST split (backend/main.py:767)."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.col("doc_id").__mod__(50).alias("bucket"),
        F.split(F.col("text"), " ").alias("t"),
    ).select(
        "doc_id",
        "bucket",
        F.explode(
            F.when(
                F.size("t") >= 4,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 3),
                    lambda i: F.array_join(F.slice("t", i, 4), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    bench = grams.filter(F.col("bucket") == 0).select("gram").distinct()
    return (
        grams.filter(F.col("bucket") != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hits"))
    )


@register(
    "text_repetition_filter",
    oracle="""
        WITH raw AS (
            SELECT doc_id, UNNEST(LIST_TRANSFORM(
                GENERATE_SERIES(1, GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) - 1, 0)),
                i -> ARRAY_TO_STRING(STRING_SPLIT_REGEX(TRIM(text), '\\s+')[i:i+1], ' ')
            )) AS bigram
            FROM documents
        ),
        counts AS (
            SELECT doc_id, bigram, COUNT(*) AS c
            FROM raw GROUP BY doc_id, bigram
        ),
        per_doc AS (
            SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total
            FROM counts GROUP BY doc_id
        )
        SELECT doc_id,
               ROUND(top_c / total, 6) AS top_bigram_frac,
               top_c / total > 0.09 AS flagged
        FROM per_doc
    """,
    tags=("text", "quality", "pipeline"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition quality filter: the fraction of a
    document's word bigrams accounted for by its single most frequent bigram;
    documents above the threshold (0.09 here, tuned to this corpus) are
    flagged as boilerplate/repetitive.

    Scale shape: one explode + (doc, bigram) partial-aggregated count (the
    only fact-sized shuffle), then a per-doc max/sum that reuses the doc_id
    prefix of the same hash partitioning — no window, no self-join, linear
    in corpus size. Reference has no curation surface (SURVEY.md
    north-star); nearest analogue is its UNNEST split (backend/main.py:767)."""
    from cloudfloe_spark.functions.text import word_shingles

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(word_shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total")
    )
    frac = F.col("top_c") / F.col("total")
    return per_doc.select(
        "doc_id",
        F.round(frac, 6).alias("top_bigram_frac"),
        (frac > 0.09).alias("flagged"),
    )


@register(
    "text_pii_redact",
    # The fixture corpus contains no PII, so both sides append a
    # deterministic synthetic contact line to every 10th document before
    # scrubbing — the redaction rules (not the corpus) are what's under
    # test. Patterns are written in the RE2 ∩ Java-regex common subset so
    # Spark and DuckDB agree character-for-character.
    oracle="""
        WITH seeded AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 0 THEN
                       text || ' contact u' || CAST(doc_id AS VARCHAR)
                            || '@example.com or 555-01'
                            || LPAD(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                            || '-4242 at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   ELSE text END AS text
            FROM documents
        ),
        redacted AS (
            SELECT doc_id,
                   REGEXP_REPLACE(
                     REGEXP_REPLACE(
                       REGEXP_REPLACE(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\b\\d{3}-\\d{4}-\\d{4}\\b|\\b\\d{3}-\\d{2}-\\d{4}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b',
                       '<PHONE>', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '<IP>', 'g') AS clean,
                   text
            FROM seeded
        )
        SELECT doc_id,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(LEN(REGEXP_EXTRACT_ALL(clean, '<PHONE>')) AS BIGINT) AS n_phones,
               CAST(LEN(REGEXP_EXTRACT_ALL(clean, '<IP>')) AS BIGINT) AS n_ips,
               MD5(clean) AS redacted_md5
        FROM redacted
    """,
    tags=("text", "pii", "pipeline"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (C4/Dolma-style pre-training hygiene): replace emails,
    phone numbers, and IPv4 addresses with typed placeholder tokens, and
    count what was found per document.

    Scale shape: pure per-row regexp_replace projections — no shuffle at
    all, whole-stage codegen, linear in corpus bytes. Redacted text is
    md5-hashed for the differential check so the comparison payload stays
    small. Reference has no PII surface (beyond-reference training-pipeline
    operator, SURVEY.md §6)."""
    d = load_table(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}-\d{4}-\d{4}\b|\b\d{3}-\d{2}-\d{4}\b|\b\d{3}-\d{3}-\d{4}\b"
    ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    seeded = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-01"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
                F.lit("-4242 at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), F.lit(email), F.lit("<EMAIL>")),
            F.lit(phone),
            F.lit("<PHONE>"),
        ),
        F.lit(ip),
        F.lit("<IP>"),
    )
    with_clean = seeded.select("doc_id", "text", clean.alias("clean"))
    return with_clean.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("clean"), F.lit("<PHONE>"), F.lit(0))).cast("bigint").alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("clean"), F.lit("<IP>"), F.lit(0))).cast("bigint").alias("n_ips"),
        F.md5(F.col("clean")).alias("redacted_md5"),
    )


@register(
    "text_chunk_windows",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                               x -> x <> '') AS words
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, s.start AS start_word,
                   words[s.start+1 : LEAST(s.start+64, LEN(words))] AS chunk
            FROM w, LATERAL (
                SELECT UNNEST(GENERATE_SERIES(0, GREATEST(LEN(words)-1, 0), 48))
                       AS start
            ) s
        )
        SELECT doc_id,
               CAST(start_word AS BIGINT) AS start_word,
               CAST(LEN(chunk) AS INT) AS chunk_words,
               MD5(ARRAY_TO_STRING(chunk, ' ')) AS chunk_md5
        FROM chunks
    """,
    tags=("text", "chunking", "pipeline"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (window=64 words, stride=48 —
    the training-prep / RAG segmentation step): each document explodes
    into word-window chunks; the final ragged chunk is kept.

    Scale shape: words computed once per row (let-bound), chunk starts via
    built-in ``sequence`` + ``explode`` (no UDF), per-chunk ``slice`` on
    the bound array — linear in corpus tokens, no shuffle at all. Chunk
    text is md5'd for the differential check."""
    W, STRIDE = 64, 48
    d = load_table(spark, sf_dir, "documents")
    withw = d.select(
        "doc_id", words(F.col("text")).alias("ws")
    )
    exploded = withw.select(
        "doc_id",
        F.col("ws"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("ws") - 1, F.lit(0)),
                F.lit(STRIDE),
            )
        ).alias("start_word"),
    )
    chunk = F.slice(F.col("ws"), F.col("start_word") + 1, F.lit(W))
    return exploded.select(
        "doc_id",
        F.col("start_word").cast("bigint").alias("start_word"),
        F.size(chunk).alias("chunk_words"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "text_pack_token_shards",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   CAST(LEN({_WORDS_SQL}) AS BIGINT) AS n_tokens
            FROM documents
        ), packed AS (
            SELECT lang, n_tokens,
                   CAST(FLOOR(
                       (SUM(n_tokens) OVER (
                            PARTITION BY lang ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - n_tokens) / 2000.0
                   ) AS BIGINT) AS shard_id
            FROM toks
        )
        SELECT lang, shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        FROM packed
        GROUP BY lang, shard_id
    """,
    tags=("text", "pipeline", "sharding"),
)
def text_pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing — the training-prep step that groups
    documents into fixed-budget shards (~2000 whitespace tokens here) so
    downstream tokenization/training reads balanced inputs. A document
    joins the shard its cumulative-token START offset falls in, so shards
    are contiguous in (lang, doc_id) order and deterministic.

    Scale shape: the running sum is a window PARTITIONED BY lang — the
    sort is per-language within its shuffle partition, never a global
    single-task sort. At 100 TB, partition further (e.g. by lang × hash
    bucket of doc ranges) and the construction is unchanged; no UDFs, one
    shuffle for the window + the map-side-combined final aggregation."""
    d = load_table(spark, sf_dir, "documents")
    BUDGET = 2000.0
    toks = d.select(
        "doc_id", "lang", F.size(words(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / BUDGET),
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )


@register(
    "text_gopher_quality_rules",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(LEN({_WORDS_SQL}) AS BIGINT) AS n_words,
                   ROUND(CASE WHEN LEN({_WORDS_SQL}) > 0
                        THEN CAST(LIST_SUM(LIST_TRANSFORM({_WORDS_SQL}, w -> LENGTH(w))) AS DOUBLE)
                             / LEN({_WORDS_SQL})
                        ELSE 0.0 END, 4) AS mean_word_len,
                   ROUND(CASE WHEN LEN({_WORDS_SQL}) > 0
                        THEN CAST(LEN(LIST_FILTER({_WORDS_SQL},
                                 w -> REGEXP_FULL_MATCH(w, '[a-z]+'))) AS DOUBLE)
                             / LEN({_WORDS_SQL})
                        ELSE 0.0 END, 4) AS alpha_frac,
                   ROUND(CASE WHEN LEN({_WORDS_SQL}) > 0
                        THEN CAST(LEN(LIST_DISTINCT({_WORDS_SQL})) AS DOUBLE)
                             / LEN({_WORDS_SQL})
                        ELSE 0.0 END, 4) AS distinct_ratio
            FROM documents
        )
        SELECT doc_id, n_words, mean_word_len, alpha_frac, distinct_ratio,
               (n_words BETWEEN 25 AND 1000
                AND mean_word_len BETWEEN 3.0 AND 10.0
                AND alpha_frac >= 0.8
                AND distinct_ratio >= 0.3) AS passes
        FROM feats
    """,
    tags=("text", "quality"),
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1,
    thresholds adapted to the fixture corpus): word-count bounds, mean word
    length bounds, alphabetic-word fraction, and distinct-word ratio, each
    emitted as a feature plus the conjunctive pass flag — the standard
    pre-training corpus filter, as a single projection.

    Scale: pure per-row array expressions (split once, folded by
    higher-order functions) — zero shuffle, whole-stage codegen, trivially
    linear; the filter column family a 100 TB curation run applies at scan
    time."""
    d = load_table(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    n = F.size(ws).cast("bigint")
    nz = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    alpha = F.size(F.filter(ws, lambda w: w.rlike("^[a-z]+$")))
    dr = F.size(F.array_distinct(ws))
    feats = d.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mean_word_length(F.col("text")), 4).alias("mean_word_len"),
        F.round(
            F.when(n > 0, alpha.cast("double") / nz).otherwise(0.0), 4
        ).alias("alpha_frac"),
        F.round(
            F.when(n > 0, dr.cast("double") / nz).otherwise(0.0), 4
        ).alias("distinct_ratio"),
    )
    return feats.withColumn(
        "passes",
        F.col("n_words").between(25, 1000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("distinct_ratio") >= 0.3),
    )


@register(
    "text_token_histogram",
    oracle=f"""
        WITH toks AS (
            SELECT lang, LEN({_WORDS_SQL}) AS n_tokens FROM documents
        )
        SELECT lang,
               CAST(POWER(2, CAST(FLOOR(LOG2(n_tokens)) AS BIGINT)) AS BIGINT)
                   AS bucket_low,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(n_tokens), 2) AS avg_tokens
        FROM toks
        WHERE n_tokens > 0
        GROUP BY lang, bucket_low
    """,
    tags=("text", "profiling"),
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two token-count histogram per language: the corpus-shape
    profile (how long are my documents, per language?) every training-data
    mixture decision starts from.

    Scale: a per-row bucket projection then a groupBy over the tiny
    (lang × log2-bucket) space — fully map-side-combined; the result is
    bounded by ~|langs|·64 rows regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = F.size(words(F.col("text")))
    bucketed = d.select(
        "lang",
        tok.alias("n_tokens"),
        F.pow(F.lit(2.0), F.floor(F.log2(tok)).cast("double"))
        .cast("bigint")
        .alias("bucket_low"),
    ).filter(F.col("n_tokens") > 0)
    return bucketed.groupBy("lang", "bucket_low").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )


# ---------------------------------------------------------------------------
# Boilerplate-segment removal (CCNet-style paragraph dedup)
# ---------------------------------------------------------------------------

_SEG_LEN = 3  # words per segment (fixture-scale; CCNet dedups paragraphs)
_SEG_MIN_DF = 5  # segments seen in >= this many docs are boilerplate


@register(
    "text_boilerplate_segments",
    oracle=f"""
        WITH ws AS (
            SELECT doc_id, {_WORDS_SQL} AS w FROM documents
        ),
        segs AS (
            SELECT doc_id, i AS pos,
                   ARRAY_TO_STRING(
                       w[(i * {_SEG_LEN} + 1):(i * {_SEG_LEN} + {_SEG_LEN})],
                       ' ') AS seg
            FROM ws, UNNEST(GENERATE_SERIES(
                0, CAST(CEIL(LEN(w) / {_SEG_LEN}.0) AS BIGINT) - 1)) t(i)
        ),
        boiler AS (
            SELECT seg FROM segs
            GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= {_SEG_MIN_DF}
        ),
        flagged AS (
            SELECT s.doc_id, s.pos, s.seg,
                   (b.seg IS NOT NULL) AS is_boiler
            FROM segs s LEFT JOIN boiler b ON s.seg = b.seg
        )
        SELECT doc_id,
               COUNT(*) AS n_segs,
               CAST(COUNT(*) FILTER (is_boiler) AS BIGINT) AS n_boiler,
               MD5(COALESCE(STRING_AGG(seg, ' ' ORDER BY pos)
                            FILTER (NOT is_boiler), '')) AS kept_fp
        FROM flagged
        GROUP BY doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def text_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal (Wenzek et al. 2020 §3.2, adapted
    from paragraphs to fixed {3}-word segments — the fixture corpus has no
    paragraph breaks): chop each document into contiguous segments, count
    each segment's distinct-document frequency over the WHOLE corpus, and
    strip segments that appear in >= {5} documents (headers, navigation,
    license blurbs at web scale). Emits per-doc segment counts plus an md5
    fingerprint of the surviving text, order preserved.

    Scale shape: segmenting is a per-row array transform (no shuffle);
    the corpus frequency is one map-side-combinable count keyed by the
    segment string; the flag join is an equi-join on the segment (AQE
    broadcasts the boilerplate set when it fits — by construction it is
    the high-frequency tail, far smaller than the corpus); reassembly is
    one groupBy(doc_id) with an ordered collect over each doc's own
    bounded segment list. Three shuffles total, all on hashable keys."""
    d = load_table(spark, sf_dir, "documents")

    def _segments(w):
        # Empty/whitespace-only doc guard: size(w)=0 would make
        # sequence(0, -1) = [0, -1] in Spark (a descending 2-step
        # range) while SQL GENERATE_SERIES(0,-1) is empty — emit no
        # segments for empty docs, matching the oracle.
        return F.when(
            F.size(w) > 0,
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(w) / float(_SEG_LEN)).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(w, i * _SEG_LEN + 1, _SEG_LEN), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # The word array is let-bound: F.slice(w, ...) inside the per-segment
    # lambda re-evaluates w per element, so the naive form re-ran the
    # whitespace split once per segment (guide §1.2 step 2 — measured
    # 1.21 s → 0.22 s for the segment projection alone at sf0.1).
    from cloudfloe_spark.functions.text import let

    segs = d.select(
        "doc_id",
        F.posexplode(let(words(F.col("text")), _segments)).alias("pos", "seg"),
    )
    boiler = (
        segs.groupBy("seg")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _SEG_MIN_DF)
        .select("seg", F.lit(True).alias("is_boiler"))
    )
    flagged = segs.join(boiler, "seg", "left").select(
        "doc_id",
        "pos",
        "seg",
        F.coalesce(F.col("is_boiler"), F.lit(False)).alias("is_boiler"),
    )
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    ~F.col("is_boiler"), F.struct(F.col("pos"), F.col("seg"))
                )
            )
        ),
        lambda s: s.seg,
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.sum(F.col("is_boiler").cast("bigint")).cast("bigint").alias("n_boiler"),
        F.md5(F.array_join(kept_sorted, " ")).alias("kept_fp"),
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_WORDS_SQL}) AS w FROM documents
        ),
        freq AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM freq)
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               ROUND(AVG(-LOG2(c / t)), 4) AS mean_nll_bits
        FROM toks JOIN freq USING (w) CROSS JOIN tot
        GROUP BY doc_id
    """,
    tags=("text", "quality", "lm"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per-document mean negative
    log2-probability under the corpus's own unigram language model — the
    in-engine stand-in for the KenLM/CCNet perplexity filter (Wenzek et
    al. 2020 §3.3; no external LM binaries in this container, and the
    unigram cross-entropy ranks outlier documents the same direction).
    Low bits = repetitive/common tokens; high bits = rare-token soup.

    Scale shape: token frequencies are one map-side-combinable count
    (vocabulary-sized result); the corpus total is a 1-row frame combined
    by cross join (never collected); scoring joins tokens to the
    vocabulary on the token key — at web scale the vocabulary is orders
    smaller than the token stream and AQE broadcasts it. Final per-doc
    AVG re-aggregates on doc_id. No UDFs anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    freq = toks.groupBy("w").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").cast("bigint").alias("t"))
    return (
        toks.join(freq, "w")
        .crossJoin(tot)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log2(F.col("c") / F.col("t"))), 4).alias(
                "mean_nll_bits"
            ),
        )
    )


_FH_BUCKETS = 64
_FH_SEED = 5


@register(
    "text_hashing_vectorizer",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_WORDS_SQL}) AS w FROM documents
        ),
        bucketed AS (
            SELECT doc_id,
                   ({portable_hash_sql("w", seed=_FH_SEED)}) % {_FH_BUCKETS}
                       AS bucket,
                   COUNT(*) AS n
            FROM toks
            GROUP BY doc_id, bucket
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_nonzero,
               STRING_AGG(bucket || ':' || n, ' ' ORDER BY bucket)
                   AS sparse_vec
        FROM bucketed
        GROUP BY doc_id
    """,
    tags=("text", "features"),
)
def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009, the 'hashing trick'):
    each token maps to one of {64} buckets via the portable seeded hash,
    per-document bucket counts form a fixed-width sparse vector — the
    vocabulary-free featurizer (no fitted dictionary to broadcast, no
    OOV) rendered as a deterministic "bucket:count" string so the
    cross-engine hash compares exactly.

    Scale shape: tokenize + hash is a per-row projection; the only
    shuffles are the (doc, bucket) count and the per-doc reassembly,
    both keyed on doc_id prefixes so the second reuses the first's
    partitioning. Output width is fixed at {64} buckets regardless of
    vocabulary growth — the property that makes the trick scale."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    bucketed = toks.groupBy(
        "doc_id",
        (portable_hash64(F.col("w"), seed=_FH_SEED) % _FH_BUCKETS).alias(
            "bucket"
        ),
    ).agg(F.count("*").alias("n"))
    entry = F.concat_ws(":", F.col("bucket"), F.col("n"))
    vec_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("bucket"), entry.alias("e")))),
        lambda s: s.e,
    )
    return bucketed.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_nonzero"),
        F.array_join(vec_sorted, " ").alias("sparse_vec"),
    )


@register(
    "text_zipf_fit",
    oracle=f"""
        WITH toks AS (
            SELECT UNNEST({_WORDS_SQL}) AS w FROM documents
        ),
        freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w),
        ranked AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk FROM freq
        )
        SELECT ROUND(REGR_SLOPE(LN(c), LN(rk)), 6) AS zipf_slope,
               ROUND(REGR_R2(LN(c), LN(rk)), 6) AS fit_r2,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM ranked
    """,
    tags=("text", "stats"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of log-frequency against log-rank over
    the corpus vocabulary (natural text sits near −1 with high R²; the
    synthetic fixture's 31-word vocabulary fits poorly, and the reported
    R² says so honestly) — the corpus-health diagnostic that catches
    template spam (too steep) and random-token soup (too flat) before
    training. Rank ties broken by token for cross-engine determinism.

    Scale shape: one vocabulary-sized frequency count (map-side
    combinable), a rank over the VOCABULARY (orders smaller than the
    token stream; range-partitioned sort at scale), and regr_slope /
    regr_r2 as single-pass moment aggregates — no collect, no loop."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    ranked = freq.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("w")))
    )
    lnc, lnr = F.log(F.col("c")), F.log(F.col("rk"))
    return ranked.agg(
        F.round(F.regr_slope(lnc, lnr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lnc, lnr), 6).alias("fit_r2"),
        F.count("*").cast("bigint").alias("n_types"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang AS actual_lang,
                   {_lang_hits_sql('en')} AS s_en,
                   {_lang_hits_sql('de')} AS s_de,
                   {_lang_hits_sql('fr')} AS s_fr,
                   {_lang_hits_sql('es')} AS s_es
            FROM documents
        ),
        pred AS (
            SELECT actual_lang,
                   CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                        WHEN s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
                        WHEN s_de >= GREATEST(s_fr, s_es) THEN 'de'
                        WHEN s_fr >= s_es THEN 'fr'
                        ELSE 'es' END AS predicted_lang
            FROM scored
        )
        SELECT actual_lang, predicted_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred
        GROUP BY actual_lang, predicted_lang
    """,
    tags=("text", "langid", "eval"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-hit language identifier against
    the stored language label — the eval harness every classifier-shaped
    curation stage needs before it gates a corpus (which languages leak
    into which, and how much lands in 'und').

    Scale shape: the classifier is a zero-shuffle per-row projection
    (same expression as text_lang_id); the matrix is one map-side-combined
    groupBy bounded by |langs|² cells."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("actual_lang"),
            lang_id(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


_KGRAM_LEN = 32
_KGRAM_STRIDE = 8


@register(
    "text_char_kgram_dup_rate",
    oracle=f"""
        WITH grams AS (
            SELECT DISTINCT doc_id,
                   UNNEST(LIST_TRANSFORM(
                       GENERATE_SERIES(1, LENGTH(text) - {_KGRAM_LEN - 1},
                                       {_KGRAM_STRIDE}),
                       i -> SUBSTRING(text, i, {_KGRAM_LEN})
                   )) AS g
            FROM documents
            WHERE LENGTH(text) >= {_KGRAM_LEN}
        ),
        freq AS (
            SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_grams,
               ROUND(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS dup_rate
        FROM grams JOIN freq USING (g)
        GROUP BY doc_id
    """,
    tags=("text", "dedup"),
)
def text_char_kgram_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-document duplication rate over CHARACTER
    {32}-grams sampled every {8} chars — the tractable stand-in for
    exact-substring dedup (Lee et al. 2022's ExactSubstr builds a corpus
    suffix array; the strided char-k-gram inverted index measures the same
    quantity — what fraction of a doc's text verbatim re-occurs elsewhere
    — with shuffle-friendly primitives).

    Scale shape: gram generation is a per-row projection bounded at
    len/stride rows per doc; the document-frequency count is one
    combinable groupBy keyed on the gram (hot boilerplate grams collapse
    map-side); the rate re-join is an equi-join on the gram. Nothing is
    ever all-pairs — the inverted index IS the candidate structure."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _KGRAM_LEN
    )
    grams = (
        d.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.length("text") - (_KGRAM_LEN - 1),
                        F.lit(_KGRAM_STRIDE),
                    ),
                    lambda i: F.col("text").substr(i, F.lit(_KGRAM_LEN)),
                )
            ).alias("g"),
        )
        .distinct()
    )
    freq = grams.groupBy("g").agg(
        F.count_distinct("doc_id").alias("df")
    )
    dup = F.sum((F.col("df") >= 2).cast("bigint"))
    return (
        grams.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            dup.cast("bigint").alias("n_dup_grams"),
            F.round(
                dup.cast("double") / F.count("*"), 6
            ).alias("dup_rate"),
        )
    )


@register(
    "text_within_doc_repetition",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
            WHERE LEN({_WORDS_SQL}) >= 2
        ),
        grams AS (
            SELECT doc_id, LEN(ws) AS n_words,
                   LEN(LIST_DISTINCT(ws)) AS n_distinct,
                   UNNEST(LIST_TRANSFORM(
                       GENERATE_SERIES(1, LEN(ws) - 1),
                       i -> ws[i] || ' ' || ws[i + 1]
                   )) AS bg
            FROM toks
        ),
        counts AS (
            SELECT doc_id, ANY_VALUE(n_words) AS n_words,
                   ANY_VALUE(n_distinct) AS n_distinct,
                   bg, COUNT(*) AS c
            FROM grams GROUP BY doc_id, bg
        )
        SELECT doc_id,
               CAST(ANY_VALUE(n_words) AS BIGINT) AS n_words,
               ROUND(1.0 - CAST(ANY_VALUE(n_distinct) AS DOUBLE)
                     / ANY_VALUE(n_words), 6) AS dup_word_frac,
               ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6)
                   AS top_bigram_share
        FROM counts GROUP BY doc_id
    """,
    tags=("text", "quality"),
)
def text_within_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition signals (Gopher rules, Rae et al. 2021
    §A1.3: templated/spammy pages repeat themselves): duplicate-word
    fraction (1 − distinct/total) and the share of all bigram slots taken
    by the single most frequent bigram. Complements the CROSS-document
    signals (char-kgram dup rate, boilerplate stripping) — a page can be
    unique corpus-wide and still be 90% one repeated phrase.

    Scale shape: everything is per-document — tokenize and distinct-count
    are row-local array ops; the bigram tally shuffles on (doc_id, bigram)
    and re-aggregates on doc_id, both combinable, no joins at all."""
    d = load_table(spark, sf_dir, "documents")
    # Tokenize ONCE into a real column (r15): element_at(w, i) sat inside
    # the per-bigram lambda, and Catalyst re-evaluates non-lambda
    # subtrees referenced from a lambda per element — the naive form
    # re-ran the whitespace split once per bigram slot.
    with_w = d.select("doc_id", words(F.col("text")).alias("w"))
    w = F.col("w")
    toks = with_w.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.explode(
            # guard: for a 0/1-word doc sequence(1, size-1) would be the
            # DESCENDING [1, 0] (same trap as text_boilerplate_segments)
            # and element_at(w, 0) errors under ANSI — emit no bigrams
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(w, i), F.element_at(w, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    ).filter(F.col("n_words") >= 2)
    counts = toks.groupBy("doc_id", "bg").agg(
        F.any_value("n_words").alias("n_words"),
        F.any_value("n_distinct").alias("n_distinct"),
        F.count("*").alias("c"),
    )
    return counts.groupBy("doc_id").agg(
        F.any_value("n_words").cast("bigint").alias("n_words"),
        F.round(
            1.0
            - F.any_value("n_distinct").cast("double")
            / F.any_value("n_words"),
            6,
        ).alias("dup_word_frac"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
            "top_bigram_share"
        ),
    )


@register(
    "text_source_js_divergence",
    oracle=f"""
        WITH toks AS (
            SELECT source, UNNEST({_WORDS_SQL}) AS w FROM documents
        ),
        counts AS (
            SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS c
            FROM toks GROUP BY source, w
        ),
        probs AS (
            SELECT source, w,
                   c / SUM(c) OVER (PARTITION BY source) AS p
            FROM counts
        ),
        pairs AS (
            SELECT a.source AS sa, b.source AS sb
            FROM (SELECT DISTINCT source FROM documents) a
            JOIN (SELECT DISTINCT source FROM documents) b
              ON a.source < b.source
        ),
        sides AS (
            SELECT pr.sa, pr.sb, p.w, p.p AS pa, 0.0 AS pb
            FROM probs p JOIN pairs pr ON p.source = pr.sa
            UNION ALL
            SELECT pr.sa, pr.sb, p.w, 0.0 AS pa, p.p AS pb
            FROM probs p JOIN pairs pr ON p.source = pr.sb
        ),
        merged AS (
            SELECT sa, sb, w, SUM(pa) AS pa, SUM(pb) AS pb
            FROM sides GROUP BY sa, sb, w
        )
        SELECT sa AS source_a, sb AS source_b,
               ROUND(SUM(
                   0.5 * CASE WHEN pa > 0
                              THEN pa * LOG2(2 * pa / (pa + pb)) ELSE 0 END
                 + 0.5 * CASE WHEN pb > 0
                              THEN pb * LOG2(2 * pb / (pa + pb)) ELSE 0 END
               ), 6) AS jsd,
               CAST(COUNT(*) AS BIGINT) AS n_union_vocab
        FROM merged
        GROUP BY sa, sb
    """,
    tags=("text", "distribution"),
)
def text_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of sources' word
    distributions — the bounded, symmetric corpus-drift measure (0 =
    identical vocabularies, 1 = disjoint, in bits) used to decide whether
    a new crawl slice matches the mixture a model was trained on.
    Complements priority_mix_drift_kl (bounded where KL is infinite on
    non-overlapping support).

    Scale shape: one (source, word) combinable count; per-source totals
    are windows over that aggregate; the pair expansion multiplies by
    |source pairs| (bounded metadata, not data); the final sum is one
    combinable rollup per pair. The corpus is tokenized exactly once."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(words(F.col("text"))).alias("w"))
    counts = toks.groupBy("source", "w").agg(
        F.count("*").cast("double").alias("c")
    )
    probs = counts.select(
        "source",
        "w",
        (F.col("c") / F.sum("c").over(Window.partitionBy("source"))).alias(
            "p"
        ),
    )
    srcs = d.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
    )
    side_a = probs.join(
        F.broadcast(pairs), probs.source == pairs.sa
    ).select("sa", "sb", "w", F.col("p").alias("pa"), F.lit(0.0).alias("pb"))
    side_b = probs.join(
        F.broadcast(pairs), probs.source == pairs.sb
    ).select("sa", "sb", "w", F.lit(0.0).alias("pa"), F.col("p").alias("pb"))
    merged = (
        side_a.unionByName(side_b)
        .groupBy("sa", "sb", "w")
        .agg(F.sum("pa").alias("pa"), F.sum("pb").alias("pb"))
    )
    m2 = F.col("pa") + F.col("pb")
    term = 0.5 * F.when(
        F.col("pa") > 0, F.col("pa") * F.log2(2 * F.col("pa") / m2)
    ).otherwise(0.0) + 0.5 * F.when(
        F.col("pb") > 0, F.col("pb") * F.log2(2 * F.col("pb") / m2)
    ).otherwise(0.0)
    return merged.groupBy(
        F.col("sa").alias("source_a"), F.col("sb").alias("source_b")
    ).agg(
        F.round(F.sum(term), 6).alias("jsd"),
        F.count("*").cast("bigint").alias("n_union_vocab"),
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_N_QTERMS = 5
_BM25_TOP_DOCS = 20

#: Persist the shared tf subtree only above this input size (r9, VERDICT
#: r08 #3): measured 1x-8x of sf0.1, the persist never won below ~5 MB
#: (see text_bm25_topk docstring; SCALING.md `bm25_persist_gate`) — the
#: threshold sits well beyond the measured no-win range, where the
#: corpus-sized cost of re-deriving the subtree provably dominates the
#: one aggregate-sized materialization.
_BM25_PERSIST_MIN_BYTES = 32 * 1024 * 1024


def _bm25_should_persist(d) -> bool:
    """True when the documents input is big enough that materializing the
    tf subtree beats re-deriving it, or when sizes are unknowable (remote
    storage — at real scale, always persist). Driver-side file metadata
    only; no Spark action."""
    import re as _re

    total = 0
    for p in d.inputFiles():
        local = _re.sub(r"^file:(//)?", "", p)
        if not local.startswith("/"):
            return True  # non-local scheme: assume big
        try:
            total += os.path.getsize(local)
        except OSError:
            return True
        if total >= _BM25_PERSIST_MIN_BYTES:
            return True
    return total >= _BM25_PERSIST_MIN_BYTES
_LTOKS_SQL = (
    "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'), w -> w <> '')"
)


@register(
    "text_bm25_topk",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_LTOKS_SQL}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
            FROM toks GROUP BY doc_id
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   AVG(dl) AS avgdl
            FROM dl
        ),
        qterms AS (
            SELECT term FROM (
                SELECT term, COUNT(*) AS n FROM toks GROUP BY term
                ORDER BY n DESC, term ASC LIMIT {_BM25_N_QTERMS}
            )
        ),
        df AS (
            SELECT t.term, CAST(COUNT(DISTINCT t.doc_id) AS DOUBLE) AS df
            FROM toks t JOIN qterms q ON q.term = t.term
            GROUP BY t.term
        ),
        scored AS (
            SELECT tf.doc_id,
                   SUM(
                       LN(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * ({_BM25_K1} + 1.0)
                       / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                          + {_BM25_B} * dl.dl / s.avgdl))
                   ) AS score
            FROM tf
            JOIN df ON df.term = tf.term
            JOIN dl ON dl.doc_id = tf.doc_id
            CROSS JOIN stats s
            GROUP BY tf.doc_id
        )
        SELECT doc_id, ROUND(score, 6) AS bm25,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ROUND(score, 6) DESC, doc_id ASC
               ) AS INT) AS rnk
        FROM scored
        ORDER BY ROUND(score, 6) DESC, doc_id ASC
        LIMIT {_BM25_TOP_DOCS}
    """,
    tags=("text", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (Robertson k1=1.2, b=0.75): score every document
    against the corpus' 5 most frequent terms and return the top 20
    documents — the classic sparse-retrieval ranker a training-data
    pipeline uses for quality-biased sampling and RAG-corpus selection,
    complementing text_tfidf_top_terms (per-doc salient terms) with
    corpus-level query-conditioned ranking.

    Scale shape: every input derives from the SAME (doc, term) tf aggregate
    subtree (dl = Σtf per doc, corpus term frequency = Σtf per term, df =
    tf row count per term). The subtree is persisted ONLY above an input-
    size gate (r9, VERDICT r08 #3 quantifying the r07 #6 trade): measured
    at 1x/4x/8x of sf0.1 (0.6-4.5 MB), the unconditional r8 persist LOST
    19% at 1x and converged to a wash by 8x (persist 2.26/2.46/2.71 s vs
    2 1.89/2.40/2.67 s, min-of-2 interleaved) — at toy scale the
    materialization costs more than the ≤4 subtree re-derivations it
    saves, while the deficit shrinks as the corpus grows (the re-derived
    tokenize+shuffle is corpus-sized; the persist cost is one aggregate-
    sized write). Below ``_BM25_PERSIST_MIN_BYTES`` the plan runs
    unpersisted (AQE ReuseExchange still serves most derivations; worst
    case re-derives a small subtree); above it — or when input sizes are
    unknowable (remote storage) — the persist makes the corpus tokenize +
    tf shuffle run EXACTLY once, deterministically (MEMORY_AND_DISK:
    spills, never OOMs; the cached set is the aggregated (doc, term, tf)
    triple, smaller than the token stream it replaces; blocks are freed
    by the ContextCleaner when the plan is GC'd). The query-term table is
    LIMIT-5 tiny and broadcast, so per-doc scoring touches only rows
    whose term is a query term (the broadcast join prunes
    ~|vocab - q|/|vocab| of the tf table before any arithmetic); the
    final top-k is a TakeOrderedAndProject(20), never a full sort, and
    the rank is stamped AFTER the limit so the row_number window sees 20
    rows, not the corpus. Ordering is on the ROUNDED score (both
    engines) so the rank-boundary pick is ulp-stable cross-engine.
    """
    # The isNotNull pre-filter matches what the doc_id equi-joins push down
    # anyway; stamping it on the shared scan keeps every tf branch
    # canonically IDENTICAL (see docstring; also lets Spark's cache manager
    # recognize repeated invocations as the same plan).
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    toks = d.select("doc_id", F.explode(words(F.lower(F.col("text")))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    if _bm25_should_persist(d):
        tf = tf.persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # One vocab aggregation serves BOTH query-term selection (top corpus
    # frequency) and df (r16 — guide §2.4): df is simply the tf row count
    # per term, so it rides the same groupBy instead of a second
    # vocab-wide exchange + broadcast-join re-aggregation. Restricting
    # df to the LIMIT-5 winners afterwards matches the old qterms⋈tf
    # exactly.
    df = (
        tf.groupBy("term")
        .agg(
            F.sum("tf").alias("n"),
            F.count("*").cast("double").alias("df"),
        )
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(_BM25_N_QTERMS)
        .select("term", "df")
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_BM25_TOP_DOCS)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select("doc_id", "bm25", "rnk")
    )
