"""Deduplication operators over the ``documents`` table.

A first-class training-data-pipeline component (north-star extension surface):
exact dedup, MinHash+LSH fuzzy dedup, SimHash, n-gram Jaccard, and
embedding-cosine near-dup. Every operator uses the portable md5-based hash
primitives from ``cloudfloe_spark.functions.text`` so the DuckDB oracle can
reproduce the exact same signatures — the fuzzy ops are fully SQL-checkable,
not rows-only.

Scale design:
- No pairwise O(n²) comparison anywhere: candidate pairs always come from an
  equi-join on a bucket key (fingerprint, LSH band, simhash prefix, shared
  shingle), which Spark executes as a shuffle hash join on the bucket key.
- Signatures are computed in one projection pass (no explode of the corpus
  until after blocking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.functions.text import (
    fingerprint,
    minhash_affine_sql,
    minhash_signature_from_shingles,
    portable_hash64,
    portable_hash_sql,
    word_shingles,
    words,
)
from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
        SELECT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fp,
               COUNT(*)     AS n_copies,
               MIN(doc_id)  AS keeper_doc_id
        FROM documents
        GROUP BY fp
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-text fingerprint: group on md5(normalized),
    keep min doc_id. One shuffle on the 16-byte fingerprint, never on the
    full text — at 100 TB the shuffle payload is the hash, not the document."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.col("doc_id"), fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


@register(
    "dedup_exact_distinct",
    oracle="""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))) AS n_unique,
               COUNT(*) - COUNT(DISTINCT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))) AS n_dupes
        FROM documents
    """,
    tags=("dedup",),
)
def dedup_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup stats (total vs unique fingerprints)."""
    d = load_table(spark, sf_dir, "documents")
    fp = fingerprint(F.col("text"))
    return d.select(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count("*") - F.countDistinct(fp)).alias("n_dupes"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

_MH_HASHES = 12
_MH_BAND_SIZE = 3  # 4 bands of 3 → catches Jaccard ≳ 0.6 reliably

_SHINGLE_SQL = (
    "LIST_TRANSFORM("
    "  GENERATE_SERIES(1, GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) - 2, 0)),"
    "  i -> ARRAY_TO_STRING(STRING_SPLIT_REGEX(TRIM(text), '\\s+')[i:i+2], ' ')"
    ")"
)


def _minhash_sig_sql() -> str:
    """DuckDB signature array from a base-hash array column ``hb``:
    one md5 per shingle, 12 affine derivations (mirrors
    ``minhash_signature_from_shingles``)."""
    mins = ", ".join(
        f"LIST_MIN(LIST_TRANSFORM(hb, h -> {minhash_affine_sql(i, 'h')}))"
        for i in range(_MH_HASHES)
    )
    return f"[{mins}]"


_MINHASH_SIGS_SQL = f"""
        WITH shingled AS (
            SELECT doc_id, {_SHINGLE_SQL} AS sh FROM documents
        ),
        based AS (
            SELECT doc_id,
                   LIST_TRANSFORM(sh, s -> {portable_hash_sql('s', seed=0)}) AS hb
            FROM shingled WHERE LEN(sh) > 0
        ),
        sigs AS (
            SELECT doc_id, {_minhash_sig_sql()} AS sig FROM based
        )
"""


def _spark_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Filter on a CHEAP predicate (word count ≥ 3 ⟺ shingle set nonempty):
    # Catalyst pushes deterministic filters below the spread() exchange, so
    # an expensive filter expression would run on the few scan partitions
    # (parquet row-group bound) instead of all cores — measured 8× slower
    # when the filter built the full shingle array.
    d = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.size(words(F.col("text"))) >= 3
        )
    )
    return d.select(
        "doc_id",
        minhash_signature_from_shingles(
            word_shingles(F.col("text"), 3), _MH_HASHES
        ).alias("sig"),
    )


@register(
    "dedup_minhash_signatures",
    oracle=_MINHASH_SIGS_SQL
    + "SELECT doc_id, ARRAY_TO_STRING(sig, ',') AS sig FROM sigs",
    tags=("dedup", "minhash"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (12 affine hashes over one md5 per 3-word
    shingle). Pure projection — embarrassingly parallel, no shuffle.

    The signature is emitted as a comma-joined string rather than
    ``array<bigint>``: scalar output keeps the result sortable/hashable by
    any downstream canonicalizer (pandas cannot factorize list cells) while
    preserving every value bit-for-bit."""
    sigs = _spark_minhash_sigs(spark, sf_dir)
    return sigs.select(
        "doc_id",
        F.array_join(F.col("sig").cast("array<string>"), ",").alias("sig"),
    )


# Giant-bucket guard: a degenerate band key (boilerplate, near-empty docs,
# exact-dup floods) would otherwise expand quadratically. Buckets above the
# cap are dropped from PAIR GENERATION — their members are exact-dup-level
# similar and belong to the exact-dedup pass that should precede LSH.
_LSH_MAX_BUCKET = 64

@register(
    "dedup_minhash_lsh_pairs",
    oracle=_MINHASH_SIGS_SQL + f"""
        , bands AS (
            SELECT doc_id, b.band,
                   ARRAY_TO_STRING(sig[(b.band*3+1):(b.band*3+3)], ',') AS band_key
            FROM sigs, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS band) b
        ),
        ok_buckets AS (
            SELECT band, band_key FROM bands
            GROUP BY band, band_key
            HAVING COUNT(*) BETWEEN 2 AND {_LSH_MAX_BUCKET}
        ),
        kept AS (
            SELECT bands.* FROM bands JOIN ok_buckets USING (band, band_key)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
    tags=("dedup", "minhash"),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: signature → 4 bands of 3 hashes →
    group by (band, band_key) → expand pairs within each bucket.

    One shuffle on the banded hash; signatures are computed exactly once
    (a naive self-join would recompute the whole signature lineage on both
    sides). Buckets larger than _LSH_MAX_BUCKET are excluded from pair
    expansion — the quadratic blowout guard for degenerate band keys; at
    the fixture scales no bucket approaches the cap, so results are
    identical, and the oracle applies the same HAVING bound."""
    sigs = _spark_minhash_sigs(spark, sf_dir)
    n_bands = _MH_HASHES // _MH_BAND_SIZE
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * _MH_BAND_SIZE + j + 1).cast(
                                    "string"
                                )
                                for j in range(_MH_BAND_SIZE)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .filter(
            (F.size("docs") > 1) & (F.size("docs") <= _LSH_MAX_BUCKET)
        )
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) ->"
                " transform(slice(docs, i + 2, size(docs) - i - 1),"
                " y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16


@register(
    "dedup_simhash",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))) AS w
            FROM documents
        ),
        hashed AS (
            SELECT doc_id, {portable_hash_sql('w', seed=7)} AS h FROM toks WHERE w <> ''
        ),
        bits AS (
            SELECT doc_id, b.bit,
                   SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS weight
            FROM hashed, (SELECT UNNEST(GENERATE_SERIES(0, {_SIMHASH_BITS - 1})) AS bit) b
            GROUP BY doc_id, b.bit
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN weight > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS simhash
        FROM bits
        GROUP BY doc_id
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit, portable hash): per-bit vote over distinct-token
    hashes, sign → bit. Near-dup docs land on nearby hashes; grouping on the
    value (or a prefix) is the blocking key. Explode is per distinct token
    ×16 bits — linear in corpus size, shuffles only (doc_id, bit) pairs."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(words(F.col("text")))).alias("w")
    ).filter(F.col("w") != "")
    hashed = toks.select("doc_id", portable_hash64(F.col("w"), seed=7).alias("h"))
    bits = (
        hashed.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))).alias("bit"),
            "h",
        )
        .groupBy("doc_id", "bit")
        .agg(
            F.sum(
                F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1)
            ).alias("weight")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("weight") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("simhash")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard
# ---------------------------------------------------------------------------


# Stop-shingle guard: a shingle present in more than this many documents
# contributes |df|² rows to the inverted-index self-join — boilerplate
# n-grams ("all rights reserved …") would dominate the shuffle at corpus
# scale. Such shingles carry ~no similarity signal and are dropped from
# the Jaccard universe on BOTH engines (so the differential stays exact).
# Fixture df max is 5, so results are unchanged at test scales.
_JACCARD_MAX_DF = 100


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, lang,
                   UNNEST(LIST_TRANSFORM(
                       GENERATE_SERIES(1, GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) - 2, 0)),
                       i -> ARRAY_TO_STRING(STRING_SPLIT_REGEX(TRIM(text), '\\s+')[i:i+2], ' ')
                   )) AS shingle
            FROM documents
        ),
        sh0 AS (SELECT DISTINCT doc_id, lang, shingle FROM raw),
        rare AS (
            SELECT lang, shingle FROM sh0
            GROUP BY lang, shingle
            HAVING COUNT(*) <= {_JACCARD_MAX_DF}
        ),
        sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (lang, shingle)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.doc_a, i.doc_b,
               ROUND(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.2
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity over the stop-shingle-filtered
    universe, for candidate pairs sharing ≥1 rare shingle (inverted-index
    join blocked by lang — the candidate join is on the shingle, never
    all-pairs; shingles above _JACCARD_MAX_DF docs are excluded, bounding
    the self-join at |df|² per shingle). Pairs ≥ 0.2 reported."""
    d = load_table(spark, sf_dir, "documents")
    sh0 = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias("shingle"),
        )
        .distinct()
    )
    rare = (
        sh0.groupBy("lang", "shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _JACCARD_MAX_DF)
        .select("lang", "shingle")
    )
    sh = sh0.join(rare, ["lang", "shingle"])
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        # Hint-free: per-document sizes have |corpus| cardinality — forcing a
        # broadcast here would OOM the driver at scale. AQE broadcasts when
        # the runtime size actually fits.
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    oracle="""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: block on label (stand-in for an ANN/LSH
    bucket), cosine ≥ threshold within block. The blocked join is an
    equi-join on the block key; within-block comparison is JVM-side
    zip_with/aggregate. Threshold 0.3 is tuned to the synthetic fixture
    embeddings (near-random vectors rarely exceed 0.5 cosine) so the
    differential check compares real rows, not two empty sets; a
    production near-dup pass would use ~0.9 on model embeddings."""
    from cloudfloe_spark.functions.vectors import cosine_cast

    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine_cast(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= 0.3)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Duplicate clusters (connected components over LSH pairs)
# ---------------------------------------------------------------------------

_LSH_PAIRS_CTE = f"""
        , bands AS (
            SELECT doc_id, b.band,
                   ARRAY_TO_STRING(sig[(b.band*3+1):(b.band*3+3)], ',') AS band_key
            FROM sigs, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS band) b
        ),
        ok_buckets AS (
            SELECT band, band_key FROM bands
            GROUP BY band, band_key
            HAVING COUNT(*) BETWEEN 2 AND {_LSH_MAX_BUCKET}
        ),
        kept AS (
            SELECT bands.* FROM bands JOIN ok_buckets USING (band, band_key)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM kept a JOIN kept b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )
"""


@register(
    "dedup_minhash_clusters",
    oracle="WITH RECURSIVE "
    + _MINHASH_SIGS_SQL.lstrip().removeprefix("WITH")
    + _LSH_PAIRS_CTE
    + """
        , sym AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM sigs
            UNION
            SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
        )
        SELECT n AS doc_id, MIN(m) AS cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY MIN(m)) AS BIGINT)
                   AS cluster_size
        FROM reach
        GROUP BY n
    """,
    tags=("dedup", "minhash", "graph"),
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: LSH candidate pairs → connected
    components (iterative min-label propagation, operators/graph.py) →
    every signed document labeled with its cluster's minimum doc_id and
    the cluster size. The 'keep one per cluster' step of a dedup pipeline
    is then a filter on doc_id == cluster_id.

    Oracle: DuckDB recursive CTE computing the same transitive closure —
    the strongest available differential check for an iterative
    distributed algorithm."""
    from cloudfloe_spark.operators.graph import connected_components

    sigs = _spark_minhash_sigs(spark, sf_dir).select("doc_id")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    labels = connected_components(
        pairs, src="doc_a", dst="doc_b", nodes=sigs
    )
    from pyspark.sql import Window

    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count("*")
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
    )


@register(
    "dedup_clusters_star",
    oracle="WITH RECURSIVE "
    + _MINHASH_SIGS_SQL.lstrip().removeprefix("WITH")
    + _LSH_PAIRS_CTE
    + """
        , sym AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM sigs
            UNION
            SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
        )
        SELECT n AS doc_id, MIN(m) AS cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY MIN(m)) AS BIGINT)
                   AS cluster_size
        FROM reach
        GROUP BY n
    """,
    tags=("dedup", "minhash", "graph"),
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-cluster assignment as ``dedup_minhash_clusters``,
    computed with the O(log n)-round large-star/small-star variant
    (``operators/graph.py::connected_components_star``) instead of
    min-label propagation — the construction to prefer at 100 TB, where a
    duplicate chain's diameter (propagation's round count) is unbounded
    but star-contraction converges logarithmically. Identical oracle:
    both must produce the exact same transitive closure."""
    from cloudfloe_spark.operators.graph import connected_components_star

    sigs = _spark_minhash_sigs(spark, sf_dir).select("doc_id")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    labels = connected_components_star(
        pairs, src="doc_a", dst="doc_b", nodes=sigs
    )
    from pyspark.sql import Window

    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count("*")
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
    )


@register(
    "dedup_keep_best_quality",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fp,
                   ROUND((LEAST(CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), w -> w <> '')) AS DOUBLE) / 50.0, 1.0)
                       + (CASE WHEN (CASE WHEN LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), w -> w <> '')) > 0
                               THEN CAST(LIST_SUM(LIST_TRANSFORM(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), w -> w <> ''), w -> LENGTH(w))) AS DOUBLE)
                                    / LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), w -> w <> '')) ELSE 0.0 END) BETWEEN 3.0 AND 8.0
                          THEN 1.0 ELSE 0.5 END)
                       + (1.0 - LEAST((CASE WHEN LENGTH(text) > 0
                               THEN CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                                    / LENGTH(text) ELSE 0.0 END) * 5.0, 1.0))) / 3.0, 4) AS quality
            FROM documents
        )
        SELECT doc_id, fp, quality FROM (
            SELECT doc_id, fp, quality,
                   ROW_NUMBER() OVER (PARTITION BY fp
                                      ORDER BY quality DESC, doc_id) AS rn
            FROM scored
        ) WHERE rn = 1
    """,
    tags=("dedup", "quality"),
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection: within each exact-duplicate group keep
    the HIGHEST-QUALITY copy (ties to lowest doc_id) — what a curation
    pipeline actually wants, vs. keep-min-id. One window over the
    fingerprint partition; quality is computed before the shuffle so only
    (doc_id, fp, quality) moves."""
    from cloudfloe_spark.functions.text import quality_score
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text")).alias("quality"),
    )
    w = Window.partitionBy("fp").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fp", "quality")
    )


_FUZZY_MAX_BLOCK = 64  # same idea as _LSH_MAX_BUCKET: caps pair blowup


@register(
    "dedup_fuzzy_editdistance_pairs",
    oracle=f"""
        WITH blocked AS (
            SELECT p_partkey, p_name, SUBSTRING(p_name, 1, 8) AS blk,
                   ROW_NUMBER() OVER (
                       PARTITION BY SUBSTRING(p_name, 1, 8)
                       ORDER BY p_partkey
                   ) AS rk
            FROM part
        ), capped AS (
            SELECT * FROM blocked WHERE rk <= {_FUZZY_MAX_BLOCK}
        )
        SELECT a.p_partkey AS left_id,
               b.p_partkey AS right_id,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
        FROM capped a
        JOIN capped b
          ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 6
    """,
    tags=("dedup", "fuzzy"),
)
def dedup_fuzzy_editdistance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-duplicate pairs by EDIT DISTANCE with prefix blocking —
    the string-similarity dedup family (typo'd titles, OCR noise) that
    shingle/minhash methods under-serve on short strings.

    Scale shape: candidate pairs come from an EQUI-join on an 8-char
    prefix block (shuffle on the block key, never an all-pairs cross),
    and each block is CAPPED at _FUZZY_MAX_BLOCK members (deterministic:
    lowest keys win) exactly like the LSH bucket cap — a prefix key's
    cardinality is bounded, so uncapped blocks would grow with the data
    and pairs quadratically within them. levenshtein runs only inside
    capped blocks; ``left < right`` halves the work. At 100 TB swap the
    prefix for a more selective phonetic/sorted-ngram key and raise the
    cap; the construction is unchanged."""
    w = Window.partitionBy("blk").orderBy("p_partkey")
    p = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey", "p_name", F.substring("p_name", 1, 8).alias("blk")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _FUZZY_MAX_BLOCK)
        .drop("rk")
    )
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("left_id"),
            F.col("b.p_partkey").alias("right_id"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 6)
    )


@register(
    "dedup_minhash_keep_rep",
    oracle="WITH RECURSIVE "
    + _MINHASH_SIGS_SQL.lstrip().removeprefix("WITH")
    + _LSH_PAIRS_CTE
    + """
        , sym AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM sigs
            UNION
            SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
        ),
        labels AS (
            SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n
        ),
        ranked AS (
            SELECT l.cluster_id, l.doc_id, d.n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY l.cluster_id
                       ORDER BY d.n_chars DESC, l.doc_id
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY l.cluster_id) AS sz
            FROM labels l JOIN documents d ON d.doc_id = l.doc_id
        )
        SELECT cluster_id,
               doc_id AS rep_doc_id,
               CAST(n_chars AS BIGINT) AS rep_n_chars,
               CAST(sz AS BIGINT) AS cluster_size,
               CAST(sz - 1 AS BIGINT) AS n_removed
        FROM ranked WHERE rk = 1
    """,
    tags=("dedup", "minhash", "graph"),
)
def dedup_minhash_keep_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'keep one' step that completes the fuzzy-dedup pipeline:
    cluster labels → keep the LONGEST document per cluster (n_chars,
    ties to the lower doc_id — the keep-longest policy C4/RefinedWeb use),
    reporting the representative and how many near-dups it displaces.

    Scale shape: one hash shuffle on cluster_id; the per-cluster argmax is
    a ``max_by`` over a (n_chars, -doc_id) struct — partial-aggregated
    map-side (no per-cluster sort, no window over the full corpus), so
    the reduce side sees one candidate row per cluster per partition."""
    labels = dedup_minhash_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = labels.join(docs, "doc_id")
    best = F.max_by(
        F.struct(
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_n_chars"),
        ),
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")),
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            best.alias("rep"),
            F.count("*").alias("cluster_size"),
        )
        .select(
            "cluster_id",
            F.col("rep.rep_doc_id").alias("rep_doc_id"),
            F.col("rep.rep_n_chars").cast("bigint").alias("rep_n_chars"),
            "cluster_size",
            (F.col("cluster_size") - 1).alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

_SEM_K = 8  # fixture-scale codebook; production: k ~ sqrt(corpus)
_SEM_TAU = 0.3  # within-cluster duplicate threshold (fixture-tuned, cf.
#                 dedup_embedding_cosine: synthetic vectors rarely pass 0.5;
#                 model embeddings would use ~0.93 per the SemDeDup paper)


@register(
    "dedup_semantic_clusters",
    oracle=f"""
        WITH cents AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings WHERE vec_id < {_SEM_K}
        ),
        assigned AS (
            SELECT e.vec_id, e.embedding, c.cid,
                   LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), c.cvec)
                       AS ccos
            FROM embeddings e CROSS JOIN cents c
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY e.vec_id ORDER BY ccos DESC, cid ASC) = 1
        ),
        dups AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                  >= {_SEM_TAU}
        )
        SELECT s.vec_id, s.cid AS cluster_id,
               (d.vec_id IS NOT NULL) AS is_dup
        FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
    """,
    tags=("dedup", "embedding", "semantic"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    around a codebook, then mark within-cluster items whose cosine to a
    LOWER-id cluster-mate exceeds tau as semantic duplicates — the
    keep-lowest-id policy makes the output deterministic on both engines.
    Codebook = the first K vectors by id (a k-means iteration would drift
    between engines; the assignment/prune mechanics are identical).

    Scale shape: the codebook is K rows — broadcast; assignment is a
    zero-shuffle argmax fold over K cosines per row. The duplicate scan
    self-joins ONLY within a cluster (equi-join on cluster id), the same
    bucketed-not-all-pairs bound every dedup operator here uses; cluster
    imbalance is the knob k controls at corpus scale (reference behavior:
    cloudfloe exposes no vector ops — this extends the engine for
    training-data curation)."""
    from cloudfloe_spark.functions.text import let
    from cloudfloe_spark.functions.vectors import as_double, cosine, cosine_cast

    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.filter(F.col("vec_id") < _SEM_K)
        .select(F.col("vec_id").alias("cid"), as_double(F.col("embedding")).alias("cvec"))
    )
    # The embedding cast is let-bound (cvec is already double): cosine
    # references its argument from four HOF lambdas, re-casting per
    # reference otherwise (r15).
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        let(
            as_double(F.col("embedding")),
            lambda ed: cosine(ed, F.col("cvec")),
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid").asc())
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "cid")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dups = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            cosine_cast(F.col("a.embedding"), F.col("b.embedding"))
            >= _SEM_TAU
        )
        .select(F.col("b.vec_id").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.join(dups, assigned.vec_id == dups.dup_id, "left")
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.col("dup_id").isNotNull().alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Containment (asymmetric near-dup: is A a sub-document of B?)
# ---------------------------------------------------------------------------

_CONTAIN_TAU = 0.8


@register(
    "dedup_shingle_containment",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, UNNEST(LIST_TRANSFORM(
                GENERATE_SERIES(1, GREATEST(
                    LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) - 2, 0)),
                i -> ARRAY_TO_STRING(
                    STRING_SPLIT_REGEX(TRIM(text), '\\s+')[i:i+2], ' ')
            )) AS shingle
            FROM documents
        ),
        sh AS (SELECT DISTINCT doc_id, shingle FROM raw),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_inner, b.doc_id AS doc_outer,
                   COUNT(*) AS n_common
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.doc_inner, i.doc_outer,
               ROUND(CAST(i.n_common AS DOUBLE) / sa.n, 4) AS containment
        FROM inter i JOIN sizes sa ON i.doc_inner = sa.doc_id
        WHERE CAST(i.n_common AS DOUBLE) / sa.n >= {_CONTAIN_TAU}
    """,
    tags=("dedup", "containment"),
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT C(A,B) = |S(A) ∩ S(B)| / |S(A)| (Broder 1997
    §2 — the asymmetric companion to Jaccard resemblance): catches a
    document embedded inside a longer one (quote-with-commentary, scraped
    page wrapping an article), which symmetric Jaccard misses because the
    union is dominated by the container. Pairs with C >= {0.8} reported,
    direction preserved (doc_inner ⊆ doc_outer).

    Scale shape: identical inverted-index bound as dedup_ngram_jaccard —
    candidate pairs come from the shingle-keyed equi-join (postings-list
    work, never all-pairs); at corpus scale the same stop-shingle df cap
    applies (omitted here to keep the fixture differential exact — the
    fixture's max df is single-digit)."""
    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias(
                "shingle"
            ),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_inner"),
            F.col("b.doc_id").alias("doc_outer"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    cont = F.col("n_common").cast("double") / F.col("sa.n")
    return (
        inter.join(sa, F.col("doc_inner") == F.col("sa.doc_id"))
        .filter(cont >= _CONTAIN_TAU)
        .select("doc_inner", "doc_outer", F.round(cont, 4).alias("containment"))
    )


# ---------------------------------------------------------------------------
# MinHash estimator-quality eval
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_estimate_eval",
    oracle="WITH "
    + _MINHASH_SIGS_SQL.lstrip().removeprefix("WITH")
    + _LSH_PAIRS_CTE
    + f"""
        , sets AS (
            SELECT doc_id, LIST_DISTINCT({_SHINGLE_SQL}) AS shd
            FROM documents
        )
        SELECT p.doc_a, p.doc_b,
               ROUND(CAST(LEN(LIST_FILTER(
                   GENERATE_SERIES(1, 12),
                   i -> sa2.sig[i] = sb2.sig[i])) AS DOUBLE) / 12, 4)
                   AS est_jaccard,
               ROUND(CAST(LEN(LIST_INTERSECT(sa.shd, sb.shd)) AS DOUBLE)
                     / (LEN(sa.shd) + LEN(sb.shd)
                        - LEN(LIST_INTERSECT(sa.shd, sb.shd))), 4)
                   AS exact_jaccard,
               ROUND(ABS(
                   CAST(LEN(LIST_FILTER(
                       GENERATE_SERIES(1, 12),
                       i -> sa2.sig[i] = sb2.sig[i])) AS DOUBLE) / 12
                   - CAST(LEN(LIST_INTERSECT(sa.shd, sb.shd)) AS DOUBLE)
                     / (LEN(sa.shd) + LEN(sb.shd)
                        - LEN(LIST_INTERSECT(sa.shd, sb.shd)))), 4)
                   AS abs_err
        FROM pairs p
        JOIN sets sa ON sa.doc_id = p.doc_a
        JOIN sets sb ON sb.doc_id = p.doc_b
        JOIN sigs sa2 ON sa2.doc_id = p.doc_a
        JOIN sigs sb2 ON sb2.doc_id = p.doc_b
    """,
    tags=("dedup", "minhash", "eval"),
)
def dedup_minhash_estimate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator quality: for every LSH candidate pair, the
    signature-agreement Jaccard estimate (matching components / 12,
    Broder's unbiased estimator) next to the EXACT shingle-set Jaccard
    and the absolute error — the tune-before-trust harness for the dedup
    index (same role sim_ann_recall_eval plays for the ANN index): if
    errors cluster high, the signature needs more permutations before
    anyone trusts its clusters at corpus scale.

    Scale shape: candidate pairs come from the capped LSH band join
    (never all-pairs); the exact side joins each pair to two per-doc
    distinct-shingle arrays (corpus-linear state, array intersection per
    pair is bounded by doc length). At 100 TB the exact side runs on a
    SAMPLE of pairs — the construction is unchanged."""
    from cloudfloe_spark.functions.text import word_shingles

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sigs = _spark_minhash_sigs(spark, sf_dir).select("doc_id", "sig")
    sets = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("shd")
    )
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    ga = sigs.alias("ga")
    gb = sigs.alias("gb")
    j = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .join(ga, F.col("doc_a") == F.col("ga.doc_id"))
        .join(gb, F.col("doc_b") == F.col("gb.doc_id"))
    )
    n_match = F.size(
        F.filter(
            F.zip_with(F.col("ga.sig"), F.col("gb.sig"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    n_inter = F.size(F.array_intersect(F.col("sa.shd"), F.col("sb.shd")))
    est = n_match.cast("double") / 12
    exact = n_inter.cast("double") / (
        F.size(F.col("sa.shd")) + F.size(F.col("sb.shd")) - n_inter
    )
    return j.select(
        "doc_a",
        "doc_b",
        F.round(est, 4).alias("est_jaccard"),
        F.round(exact, 4).alias("exact_jaccard"),
        F.round(F.abs(est - exact), 4).alias("abs_err"),
    )


@register(
    "dedup_cluster_size_histogram",
    oracle="WITH RECURSIVE "
    + _MINHASH_SIGS_SQL.lstrip().removeprefix("WITH")
    + _LSH_PAIRS_CTE
    + """
        , sym AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM sigs
            UNION
            SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
        ),
        labels AS (
            SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n
        ),
        sizes AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
            FROM labels GROUP BY cluster_id
        )
        SELECT CAST(FLOOR(LOG2(sz)) AS BIGINT) AS size_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(sz) AS BIGINT) AS n_docs,
               CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_removable
        FROM sizes
        GROUP BY size_bucket
    """,
    tags=("dedup", "minhash", "observability"),
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of duplicate-cluster sizes with the
    per-bucket removable-document count — the dedup run's observability
    report: bucket 0 is unique documents, a heavy top bucket means one
    near-identical blob dominates the corpus (and the LSH bucket cap is
    earning its keep). n_removable sums what a keep-one policy deletes.

    Scale shape: reuses the clustering (per-round linear in edges); the
    histogram is two map-side-combinable aggregations over cluster ids —
    bounded output (<= 64 buckets) at any corpus size."""
    labels = dedup_minhash_clusters(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("sz")
    )
    return sizes.groupBy(
        F.floor(F.log2("sz")).cast("bigint").alias("size_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
        (F.sum("sz") - F.count("*")).cast("bigint").alias("n_removable"),
    )


@register(
    "dedup_document_verdict",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id,
                   MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))))
                       AS f
            FROM documents
        ),
        exact AS (
            SELECT a.doc_id FROM fp a JOIN fp b
              ON a.f = b.f AND a.doc_id > b.doc_id
            GROUP BY a.doc_id
        ),
        raw AS (
            SELECT doc_id, lang, UNNEST({_SHINGLE_SQL}) AS sh FROM documents
        ),
        sh AS (SELECT DISTINCT doc_id, lang, sh FROM raw),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS nc
            FROM sh a JOIN sh b
              ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id <> b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        contained AS (
            SELECT DISTINCT i.da AS doc_id
            FROM inter i JOIN sizes sa ON i.da = sa.doc_id
            WHERE CAST(i.nc AS DOUBLE) / sa.n >= {_CONTAIN_TAU}
        ),
        near AS (
            SELECT DISTINCT i.da AS doc_id
            FROM inter i
            JOIN sizes sa ON i.da = sa.doc_id
            JOIN sizes sb ON i.db = sb.doc_id
            WHERE i.da > i.db
              AND CAST(i.nc AS DOUBLE) / (sa.n + sb.n - i.nc) >= 0.2
        )
        SELECT d.doc_id,
               CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                    WHEN c.doc_id IS NOT NULL THEN 'contained'
                    WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'unique' END AS verdict
        FROM documents d
        LEFT JOIN exact e ON d.doc_id = e.doc_id
        LEFT JOIN contained c ON d.doc_id = c.doc_id
        LEFT JOIN near n ON d.doc_id = n.doc_id
    """,
    tags=("dedup", "pipeline", "verdict"),
)
def dedup_document_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified per-document dedup DECISION, priority-ordered the way
    a curation pipeline actually rules: exact duplicate (normalized
    fingerprint shared with a lower id — keep-lowest) beats contained
    (shingle containment >= {0.8} in any other doc) beats near-duplicate
    (Jaccard >= 0.2 against a lower id) beats unique. One verdict per
    document — the column a `WHERE verdict = 'unique'` training filter
    consumes, composed from the same signals the standalone operators
    report individually.

    Scale shape: the fingerprint pass is one md5 groupBy; containment and
    Jaccard share ONE inverted-index shingle join (the intersection table
    is computed once and consumed by both rules); the verdicts are three
    left anti-ish joins on doc_id. Nothing beyond what the standalone
    operators already cost — the composition is free."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", fingerprint(F.col("text")).alias("f"))
    fa, fb = fp.alias("fa"), fp.alias("fb")
    exact = (
        fa.join(
            fb,
            (F.col("fa.f") == F.col("fb.f"))
            & (F.col("fa.doc_id") > F.col("fb.doc_id")),
        )
        .select(F.col("fa.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("is_exact", F.lit(True))
    )
    sh = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias("sh"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("nc"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    scored = inter.join(sa, "da").join(sb, "db")
    contained = (
        scored.filter(F.col("nc").cast("double") / F.col("na") >= _CONTAIN_TAU)
        .select(F.col("da").alias("doc_id"))
        .distinct()
        .withColumn("is_contained", F.lit(True))
    )
    near = (
        scored.filter(
            (F.col("da") > F.col("db"))
            & (
                F.col("nc").cast("double")
                / (F.col("na") + F.col("nb") - F.col("nc"))
                >= 0.2
            )
        )
        .select(F.col("da").alias("doc_id"))
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    return (
        d.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(contained, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("is_contained"), F.lit("contained"))
            .when(F.col("is_near"), F.lit("near_dup"))
            .otherwise(F.lit("unique"))
            .alias("verdict"),
        )
    )


_SIMHASH_HAM_MAX = 3
_SIMHASH_BANDS = 4  # 16 bits / 4 — a pair within hamming 3 shares >= 1 band


@register(
    "dedup_simhash_hamming_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))) AS w
            FROM documents
        ),
        hashed AS (
            SELECT doc_id, {portable_hash_sql('w', seed=7)} AS h FROM toks WHERE w <> ''
        ),
        bits AS (
            SELECT doc_id, b.bit,
                   SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS weight
            FROM hashed, (SELECT UNNEST(GENERATE_SERIES(0, {_SIMHASH_BITS - 1})) AS bit) b
            GROUP BY doc_id, b.bit
        ),
        sims AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN weight > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS sh
            FROM bits GROUP BY doc_id
        ),
        banded AS (
            SELECT doc_id, sh, b.band,
                   (sh >> (b.band * 4)) & 15 AS band_key
            FROM sims, (SELECT UNNEST(GENERATE_SERIES(0, {_SIMHASH_BANDS - 1})) AS band) b
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.sh AS sha, b.sh AS shb
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )
        SELECT CAST(BIT_COUNT(XOR(sha, shb)) AS INT) AS hamming,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(doc_a) AS BIGINT) AS example_doc_a,
               CAST(MIN(doc_b) AS BIGINT) AS example_doc_b
        FROM cand
        WHERE BIT_COUNT(XOR(sha, shb)) <= {_SIMHASH_HAM_MAX}
        GROUP BY hamming
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash collision PROFILE — the step that makes dedup_simhash a
    pipeline, mirroring what LSH banding does for MinHash: split the
    16-bit fingerprint into {4} 4-bit bands (pigeonhole: any pair within
    Hamming {3} shares at least one intact band), candidate-join on the
    band value, verify exact Hamming by xor+popcount, and report the
    PAIR COUNT per Hamming distance (with a deterministic example pair).
    Charikar 2002 banding over Manku et al.'s construction. The profile,
    not the pair dump: a 16-bit fingerprint over this fixture's 31-word
    vocabulary collides near-quadratically (6.5M pairs at sf0.1), which
    is itself the signal the profile surfaces — it says WIDEN THE
    FINGERPRINT before anyone materializes pairs at this density.

    Scale shape: the band join shuffles on a 4-bit-key×band axis (the
    same banded-equi-join bound as MinHash LSH — never all-pairs);
    Hamming verification is two integer ops per candidate; the profile
    collapses map-side to <= {4} rows. At corpus scale widen fingerprint
    and bands together until the profile's density justifies pair
    materialization."""
    sims = dedup_simhash(spark, sf_dir).select(
        "doc_id", F.col("simhash").alias("sh")
    )
    banded = sims.select(
        "doc_id",
        "sh",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn(
        # shiftright() takes a literal count; band varies per row
        "band_key", F.expr("shiftright(sh, band * 4) & 15")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sha"),
            F.col("b.sh").alias("shb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return (
        cand.filter(ham <= _SIMHASH_HAM_MAX)
        .groupBy(ham.cast("int").alias("hamming"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.min("doc_a").cast("bigint").alias("example_doc_a"),
            F.min("doc_b").cast("bigint").alias("example_doc_b"),
        )
    )
