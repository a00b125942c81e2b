"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Two paths, as a real vector pipeline would ship them:
- **Brute-force top-k**: exact cosine against every candidate — the baseline
  and the correctness oracle. Query side is tiny and broadcast; the scan side
  streams; per-query top-k is a windowed rank over (query, candidate) scores.
- **LSH-bucketed ANN**: random-hyperplane signatures (deterministic integer
  hyperplanes so the DuckDB oracle reproduces them exactly) → candidates only
  within the same bucket → exact cosine re-rank. The candidate join is an
  equi-join on the bucket id: at 100 TB this is the difference between
  n·k comparisons and n² (the bucket join shuffles on an 8-bit key instead
  of crossing the corpus).

All vector math is ``zip_with``/``aggregate`` in double precision — JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.functions.text import let
from cloudfloe_spark.functions.vectors import (
    as_double,
    cosine,
    cosine_cast,
    dot,
    norm,
)
from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table, spread

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_TOP_K = 3

# Deterministic integer hyperplanes: h[p][d] = ((p*97 + d*31) % 7) - 3.
# Small integers, identical formula in Spark and SQL; 8 planes → 256 buckets.
_N_PLANES = 8
_HP_SQL = (
    "LIST_TRANSFORM(GENERATE_SERIES(1, 64), d -> CAST((({p} * 97 + (d - 1) * 31) % 7) - 3 AS DOUBLE))"
)


def _plane_fn(p: int):
    # Single-arg closure on purpose: pyspark HOFs pass the element index to
    # two-parameter lambdas, which would clobber a `p=p` default.
    def f(d):
        return (((F.lit(p * 97) + (d - 1) * 31) % 7) - 3).cast("double")

    return f


def _bucket_col(vec):
    """LSH bucket id: Σ_p (dot(vec, plane_p) > 0) << p, via built-ins."""
    acc = F.lit(0)
    for p in range(_N_PLANES):
        plane = F.transform(F.sequence(F.lit(1), F.lit(64)), _plane_fn(p))
        dotp = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(dotp > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def _bucket_sql(vec_expr: str) -> str:
    terms = []
    for p in range(_N_PLANES):
        plane = _HP_SQL.format(p=p)
        terms.append(
            f"(CASE WHEN LIST_DOT_PRODUCT(CAST({vec_expr} AS DOUBLE[]), {plane}) > 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "sim_brute_force_topk",
    oracle=f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])) AS cos_raw
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
                   ) AS rk
            FROM scored
        )
        SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos_sim, rk
        FROM ranked WHERE rk <= {_TOP_K}
    """,
    tags=("similarity",),
)
def sim_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors across the corpus
    scan, score, per-query ROW_NUMBER rank. The corpus never shuffles —
    only (query × corpus) score rows move, and rank pushdown trims them."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = spread(e).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_cast(F.col("q_emb"), F.col("c_emb")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos_sim"), "rk")
    )


@register(
    "sim_lsh_buckets",
    oracle=f"""
        SELECT CAST({_bucket_sql('embedding')} AS INT) AS bucket,
               COUNT(*) AS n_vectors,
               MIN(vec_id) AS min_vec_id
        FROM embeddings
        GROUP BY bucket
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (8 deterministic planes →
    256 buckets) + bucket occupancy. Pure projection + small agg."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", _bucket_col(as_double(F.col("embedding"))).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


@register(
    "sim_lsh_ann_topk",
    oracle=f"""
        WITH bucketed AS (
            SELECT vec_id, embedding,
                   CAST({_bucket_sql('embedding')} AS INT) AS bucket
            FROM embeddings
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])) AS cos_raw
            FROM bucketed q JOIN bucketed c
              ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
                   ) AS rk
            FROM scored
        )
        SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos_sim, rk
        FROM ranked WHERE rk <= {_TOP_K}
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: score only within the query's LSH bucket (equi-join on
    bucket id), then exact cosine re-rank. The scale path: candidate
    generation cost is bucket-local."""
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = spread(e).select(
        "vec_id", "embedding", _bucket_col(as_double(F.col("embedding"))).alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine_cast(F.col("q_emb"), F.col("c_emb")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos_sim"), "rk")
    )


@register(
    "sim_pairwise_label_stats",
    # The AVG is summed as exact DECIMAL: a double SUM over thousands of
    # pairs is order-dependent (task scheduling changes it run to run) and
    # occasionally lands a rounding boundary differently than the oracle.
    # DECIMAL addition is exact and order-independent, so both engines
    # produce the identical average bit-for-bit.
    oracle="""
        SELECT a.label,
               COUNT(*) AS n_pairs,
               -- +0.0 canonicalizes IEEE negative zero (a tiny negative
               -- average rounds to -0.0 in DuckDB but 0.0 in Spark, which
               -- breaks value-hash comparison despite numeric equality)
               ROUND(CAST(SUM(CAST(
                   LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[]))
                   AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*), 4) + 0.0 AS avg_cos,
               ROUND(MAX(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[]))), 4) AS max_cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        GROUP BY a.label
    """,
    tags=("similarity",),
)
def sim_pairwise_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label pairwise cosine statistics (cluster cohesion metric) —
    blocked equi-join on label, no global cross. The average is summed in
    exact DECIMAL so it is independent of task/summation order."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine_cast(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.label").alias("label"), cos.alias("cos_raw"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            (
                F.round(
                    F.sum(F.col("cos_raw").cast("decimal(28,14)")).cast(
                        "double"
                    )
                    / F.count("*"),
                    4,
                )
                + F.lit(0.0)  # canonicalize -0.0 (see oracle comment)
            ).alias("avg_cos"),
            F.round(F.max("cos_raw"), 4).alias("max_cos"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

_IVF_K = 16  # centroid count
_IVF_SEED_BASE = _N_QUERIES  # vec_id ∈ [base, base+K) are the seed centroids
_IVF_NPROBE = 4

_COS_SQL = (
    "LIST_COSINE_SIMILARITY(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
)

_IVF_COMMON_SQL = f"""
        WITH cent AS (
            SELECT vec_id - {_IVF_SEED_BASE} AS centroid_id, embedding AS cent_emb
            FROM embeddings
            WHERE vec_id >= {_IVF_SEED_BASE} AND vec_id < {_IVF_SEED_BASE + _IVF_K}
        ),
        assign AS (
            SELECT vec_id, centroid_id AS list_id FROM (
                SELECT e.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_COS_SQL.format(a='e.embedding', b='c.cent_emb')} DESC,
                                    c.centroid_id
                       ) AS rk
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rk = 1
        )
"""


@register(
    "sim_ivf_lists",
    oracle=_IVF_COMMON_SQL + """
        SELECT list_id,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               MIN(vec_id) AS min_vec_id
        FROM assign
        GROUP BY list_id
    """,
    tags=("similarity", "ivf"),
)
def sim_ivf_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build: assign every vector to its nearest of K=16 seed
    centroids (deterministic seeds = rows of the table itself, so the
    oracle reproduces the index bit-for-bit) + list occupancy.

    Scale note: the assignment is a broadcast of K centroids across the
    corpus scan — one pass, no corpus shuffle except the small occupancy
    agg. In a stored index, list_id becomes the table's partition/bucket
    column so probes prune files."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        _ivf_assign(e)
        .groupBy("list_id")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


def _ivf_centroids(e: DataFrame) -> DataFrame:
    return e.filter(
        (F.col("vec_id") >= _IVF_SEED_BASE)
        & (F.col("vec_id") < _IVF_SEED_BASE + _IVF_K)
    ).select(
        (F.col("vec_id") - _IVF_SEED_BASE).alias("centroid_id"),
        F.col("embedding").alias("cent_emb"),
    )


def _ivf_cent_array(e: DataFrame) -> DataFrame:
    """The K centroids folded into ONE row: sorted array of (cid, cvec,
    cnorm) structs. K is bounded (an IVF codebook, not data), so the 1-row
    frame broadcasts for free and per-centroid norms are computed once.
    ``cnorm`` uses the same ``sqrt(dot(v,v))`` fold as :func:`norm`, so
    cosine arithmetic downstream is bit-identical to the previous
    crossJoin construction (and the DuckDB oracle)."""
    cent = _ivf_centroids(e)
    c = F.struct(
        F.col("centroid_id").cast("long").alias("cid"),
        as_double(F.col("cent_emb")).alias("cvec"),
        norm(as_double(F.col("cent_emb"))).alias("cnorm"),
    )
    return cent.select(c.alias("c")).agg(
        F.sort_array(F.collect_list("c")).alias("cents")
    )


def _ivf_assign_with_vec(e: DataFrame) -> DataFrame:
    """(vec_id, embedding, list_id): nearest centroid per vector, ties to
    the lower centroid id — computed as a ZERO-SHUFFLE projection.

    The centroid codebook rides along as a broadcast 1-row array; the
    argmax is a higher-order ``aggregate`` fold over it (iterated in cid
    order with strictly-greater comparison, so ties keep the lowest id —
    the same tie rule as the oracle's ROW_NUMBER). The corpus never
    leaves its scan partitioning: no crossJoin row explosion, no groupBy
    exchange, and the embedding column stays attached so consumers can
    re-rank without joining the corpus a second time. The previous
    construction (broadcast crossJoin + max_by combiner) shuffled the
    whole corpus once; this shuffles it zero times — at 100 TB the
    assignment becomes pure scan work.

    The query vector's cast AND its norm are let-bound (Catalyst
    re-evaluates subexpressions referenced from HOF lambdas per element —
    the r14 shape let-bound only the norm, so the float→double cast still
    re-ran once per centroid in the fold; r15)."""
    cents = _ivf_cent_array(e)
    emb_d = as_double(F.col("embedding"))

    def with_emb(ed):
        def argmax(nrm):
            zero = F.struct(
                F.lit(float("-inf")).alias("cos"),
                F.lit(-1).cast("long").alias("cid"),
            )

            def fold(acc, c):
                cos_c = dot(ed, c["cvec"]) / (nrm * c["cnorm"])
                return F.when(
                    cos_c > acc["cos"],
                    F.struct(cos_c.alias("cos"), c["cid"].alias("cid")),
                ).otherwise(acc)

            return F.aggregate(F.col("cents"), zero, fold)["cid"]

        return let(norm(ed), argmax)

    return (
        e.join(F.broadcast(cents))
        .select("vec_id", "embedding", let(emb_d, with_emb).alias("list_id"))
    )


def _ivf_assign(e: DataFrame) -> DataFrame:
    """(vec_id, list_id) — see :func:`_ivf_assign_with_vec`."""
    return _ivf_assign_with_vec(e).select("vec_id", "list_id")


@register(
    "sim_ivf_ann_topk",
    oracle=_IVF_COMMON_SQL + f"""
        , probe AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.vec_id AS query_id, c.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_COS_SQL.format(a='q.embedding', b='c.cent_emb')} DESC,
                                    c.centroid_id
                       ) AS rk
                FROM embeddings q CROSS JOIN cent c
                WHERE q.vec_id < {_N_QUERIES}
            ) WHERE rk <= {_IVF_NPROBE}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id AS neighbor_id
            FROM probe p JOIN assign a ON p.centroid_id = a.list_id
            WHERE p.query_id <> a.vec_id
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   {_COS_SQL.format(a='q.embedding', b='c.embedding')} AS cos_raw
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
                   ) AS rk
            FROM scored
        )
        SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos_sim, rk
        FROM ranked WHERE rk <= {_TOP_K}
    """,
    tags=("similarity", "ivf"),
)
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe search: rank the K centroids per query, take the top
    nprobe=4 lists, score ONLY vectors assigned to those lists, exact
    cosine re-rank. Candidate generation is an equi-join on list_id —
    at scale with list-partitioned storage this prunes ~ (K-nprobe)/K of
    the corpus from the scan entirely.

    Plan shape (r5 rework): assignment is a zero-shuffle projection that
    keeps the embedding attached, the tiny probe table broadcasts onto
    it, and the query vectors broadcast onto the candidates — so the
    corpus crosses exactly ONE exchange, the per-query top-k window over
    the candidate subset (rank pushdown trims it map-side). Previously
    the corpus shuffled twice more (assignment groupBy + re-rank join)."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(e)
    assign = _ivf_assign_with_vec(e)

    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probe_scored = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "centroid_id",
        cosine_cast(F.col("q_emb"), F.col("cent_emb")).alias("cos_c"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("centroid_id"))
    probe = (
        probe_scored.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= _IVF_NPROBE)
        .select("query_id", F.col("centroid_id").alias("list_id"))
    )

    cand = (
        assign.join(F.broadcast(probe), "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
        )
    )
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        cosine_cast(F.col("q_emb"), F.col("c_emb")).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos_sim"), "rk")
    )


@register(
    "vec_quantize_int8",
    oracle="""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), scaled AS (
            SELECT vec_id, v,
                   GREATEST(
                       LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))), 1e-12
                   ) / 127.0 AS s
            FROM base
        )
        SELECT vec_id,
               ROUND(s, 9) AS scale,
               CAST(LIST_SUM(LIST_TRANSFORM(v, x -> FLOOR(x / s + 0.5)))
                    AS BIGINT) AS q_sum,
               CAST(LIST_SUM(LIST_TRANSFORM(v, x -> ABS(FLOOR(x / s + 0.5))))
                    AS BIGINT) AS q_l1,
               ROUND(LIST_SUM(LIST_TRANSFORM(
                        v, x -> (x - FLOOR(x / s + 0.5) * s)
                                * (x - FLOOR(x / s + 0.5) * s)
                    )) / LEN(v), 9) AS mse
        FROM scaled
    """,
    tags=("vector", "quantization", "pipeline"),
)
def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the storage /
    ANN-memory compression step of a vector pipeline: per-vector scale
    ``max|x|/127``, code ``floor(x/scale + 0.5)`` ∈ [-127, 127], plus the
    reconstruction MSE so a pipeline can gate on quantization loss.

    The compared output is scalar per vector (scale, code checksums, MSE):
    the int8 codes themselves stay executor-side, exactly as a writer
    would stream them to parquet. Zero shuffles — pure projection via
    higher-order functions in double precision (float→double widening is
    exact, so Spark and DuckDB see bit-identical inputs); zero-vector
    guard pins the scale denominator at 1e-12."""
    e = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    s = (
        F.greatest(
            F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))),
            F.lit(1e-12),
        )
        / 127.0
    )
    withs = e.select("vec_id", v.alias("v"), s.alias("s"))
    q = F.transform(F.col("v"), lambda x: F.floor(x / F.col("s") + 0.5))
    err = F.transform(
        F.col("v"),
        lambda x: (x - F.floor(x / F.col("s") + 0.5) * F.col("s"))
        * (x - F.floor(x / F.col("s") + 0.5) * F.col("s")),
    )
    return withs.select(
        "vec_id",
        F.round("s", 9).alias("scale"),
        F.aggregate(q, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda a, x: a + F.abs(x)
        ).alias("q_l1"),
        F.round(
            F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / F.size("v"), 9
        ).alias("mse"),
    )


# ---- Product quantization (PQ) ------------------------------------------
# 64-dim → _PQ_M=8 subspaces × 8 dims, _PQ_K=16 codes per subspace. The
# codebook is "trained" on the same deterministic seed rows as the IVF
# index (vec_id ∈ [_IVF_SEED_BASE, +_PQ_K)) so the oracle reproduces it
# bit-for-bit — in production the seeds come from a k-means sample job.
_PQ_M = 8
_PQ_SUBDIM = 8
_PQ_K = _IVF_K


def _pq_codebook(e: DataFrame) -> DataFrame:
    """The K codebook vectors folded into ONE broadcastable row (sorted by
    code id, so HOF folds iterate in code order and ties keep the lowest
    code — same rule as the oracle's ROW_NUMBER ... ORDER BY d2, k)."""
    cent = e.filter(
        (F.col("vec_id") >= _IVF_SEED_BASE)
        & (F.col("vec_id") < _IVF_SEED_BASE + _PQ_K)
    ).select(
        F.struct(
            (F.col("vec_id") - _IVF_SEED_BASE).cast("long").alias("k"),
            as_double(F.col("embedding")).alias("cvec"),
        ).alias("c")
    )
    return cent.agg(F.sort_array(F.collect_list("c")).alias("cb"))


def _pq_sub_d2(vsub, cvec, m: int):
    """Squared L2 between a (materialized) query subvector and codebook
    vector ``cvec``'s subspace ``m`` — same zip_with + left-fold summation
    order as the original inline form, so results are bit-identical."""
    return F.aggregate(
        F.zip_with(
            vsub,
            F.slice(cvec, m * _PQ_SUBDIM + 1, _PQ_SUBDIM),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _pq_encode_structs(emb_expr):
    """PQ-encode a vector: array of M (d2, k) structs (argmin per
    subspace, ties to the lowest code — iterate in code order with
    strictly-less comparison).

    r15 optimization (guide §1.2 step 2): the embedding cast and the
    per-subspace slice are LET-BOUND. Both sat inside the per-codebook
    fold lambda before, and Catalyst re-evaluates non-lambda subtrees
    referenced from a lambda per element — the encode was re-casting the
    64-dim array once per (subspace, code) pair, 128 casts per row.
    Measured 1.08 s → 0.62 s for the corpus encode at sf0.1; codes
    bit-identical."""

    def with_emb(emb):
        def per_sub(m):
            def with_vsub(vsub):
                zero = F.struct(
                    F.lit(float("inf")).alias("d2"),
                    F.lit(-1).cast("long").alias("k"),
                )

                def fold(acc, c):
                    d2 = _pq_sub_d2(vsub, c["cvec"], m)
                    return F.when(
                        d2 < acc["d2"],
                        F.struct(d2.alias("d2"), c["k"].alias("k")),
                    ).otherwise(acc)

                return F.aggregate(F.col("cb"), zero, fold)

            return let(F.slice(emb, m * _PQ_SUBDIM + 1, _PQ_SUBDIM), with_vsub)

        return F.transform(F.sequence(F.lit(0), F.lit(_PQ_M - 1)), per_sub)

    return let(emb_expr, with_emb)


def _pq_query_lut(emb_expr):
    """Per-query ADC lookup table: M × K subspace distances, with the
    same let-binding as :func:`_pq_encode_structs` (the query cast/slice
    were re-evaluated per codebook entry before)."""

    def with_emb(emb):
        return F.transform(
            F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
            lambda m: let(
                F.slice(emb, m * _PQ_SUBDIM + 1, _PQ_SUBDIM),
                lambda vsub: F.transform(
                    F.col("cb"), lambda c: _pq_sub_d2(vsub, c["cvec"], m)
                ),
            ),
        )

    return let(emb_expr, with_emb)


@register(
    "sim_pq_codes",
    oracle=f"""
        WITH cb AS (
            SELECT vec_id - {_IVF_SEED_BASE} AS k,
                   CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings
            WHERE vec_id >= {_IVF_SEED_BASE}
              AND vec_id < {_IVF_SEED_BASE + _PQ_K}
        ),
        sub AS (
            SELECT e.vec_id, m.m, c.k,
                   LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {_PQ_SUBDIM}),
                       d -> (CAST(e.embedding[m.m * {_PQ_SUBDIM} + d] AS DOUBLE)
                             - c.cvec[m.m * {_PQ_SUBDIM} + d])
                          * (CAST(e.embedding[m.m * {_PQ_SUBDIM} + d] AS DOUBLE)
                             - c.cvec[m.m * {_PQ_SUBDIM} + d])
                   )) AS d2
            FROM embeddings e
            CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_PQ_M - 1})) AS m) m
            CROSS JOIN cb c
        ),
        best AS (
            SELECT vec_id, m, k, d2 FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, k
                ) AS rk
                FROM sub
            ) WHERE rk = 1
        )
        SELECT vec_id,
               STRING_AGG(CAST(k AS VARCHAR), ',' ORDER BY m) AS pq_codes,
               ROUND(LIST_SUM(LIST(d2 ORDER BY m)), 4) AS recon_err
        FROM best
        GROUP BY vec_id
    """,
    tags=("similarity", "quantization"),
)
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al., TPAMI'11): each vector
    compressed to M=8 sub-space code ids (4 bits each here — a 64-byte
    float vector becomes 8 codes) plus its total squared reconstruction
    error — the memory-bound ANN representation that IVF indexes store in
    their posting lists (IVF-PQ).

    Scale shape (mirrors the reworked IVF assignment): the codebook rides
    along as a broadcast 1-row array; per-subspace argmin is a
    higher-order fold over slices — the corpus is encoded in a ZERO-shuffle
    projection, so at 100 TB PQ encoding is pure scan work, pipelined with
    whatever wrote the embeddings. The encode fold is let-bound so the
    8×16 distance evaluations happen once, not once per output column."""
    e = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebook(e)
    emb_d = as_double(F.col("embedding"))

    packed = let(
        _pq_encode_structs(emb_d),
        lambda ci: F.struct(
            F.array_join(
                F.transform(ci, lambda x: x["k"].cast("string")), ","
            ).alias("pq_codes"),
            F.round(
                F.aggregate(ci, F.lit(0.0), lambda a, x: a + x["d2"]), 4
            ).alias("recon_err"),
        ),
    )
    return (
        e.join(F.broadcast(cb))
        .select("vec_id", packed.alias("p"))
        .select("vec_id", F.col("p.pq_codes").alias("pq_codes"),
                F.col("p.recon_err").alias("recon_err"))
    )


_PQ_D2_SQL = (
    "LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {sd}), "
    "d -> (CAST({q}[{m} * {sd} + d] AS DOUBLE) - {c}[{m} * {sd} + d])"
    " * (CAST({q}[{m} * {sd} + d] AS DOUBLE) - {c}[{m} * {sd} + d])))"
)


@register(
    "sim_pq_adc_topk",
    oracle=f"""
        WITH cb AS (
            SELECT vec_id - {_IVF_SEED_BASE} AS k,
                   CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings
            WHERE vec_id >= {_IVF_SEED_BASE}
              AND vec_id < {_IVF_SEED_BASE + _PQ_K}
        ),
        ms AS (SELECT UNNEST(GENERATE_SERIES(0, {_PQ_M - 1})) AS m),
        sub AS (
            SELECT e.vec_id, ms.m, c.k,
                   {_PQ_D2_SQL.format(sd=_PQ_SUBDIM, q='e.embedding', c='c.cvec', m='ms.m')} AS d2
            FROM embeddings e CROSS JOIN ms CROSS JOIN cb c
        ),
        codes AS (
            SELECT vec_id, m, k FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, k
                ) AS rk
                FROM sub
            ) WHERE rk = 1
        ),
        lut AS (
            SELECT q.vec_id AS query_id, ms.m, c.k,
                   {_PQ_D2_SQL.format(sd=_PQ_SUBDIM, q='q.embedding', c='c.cvec', m='ms.m')} AS qd2
            FROM embeddings q CROSS JOIN ms CROSS JOIN cb c
            WHERE q.vec_id < {_N_QUERIES}
        ),
        adc AS (
            SELECT l.query_id, cd.vec_id AS neighbor_id,
                   ROUND(LIST_SUM(LIST(l.qd2 ORDER BY l.m)), 4) AS approx_d2
            FROM codes cd
            JOIN lut l ON l.m = cd.m AND l.k = cd.k
            WHERE cd.vec_id <> l.query_id
            GROUP BY l.query_id, cd.vec_id
        )
        SELECT query_id, neighbor_id, approx_d2, rk FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY approx_d2, neighbor_id
            ) AS rk
            FROM adc
        ) WHERE rk <= {_TOP_K}
    """,
    tags=("similarity", "quantization", "ann"),
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (the IVF-PQ query path): each query
    precomputes an M×K lookup table of subspace distances against the
    codebook, then scores every candidate by summing 8 table lookups over
    its stored codes — no candidate vector is ever touched at query time.

    Scale shape: the corpus side carries only its 8 PQ codes (encoded in
    the same zero-shuffle fold as ``sim_pq_codes``); the query side — 5
    queries × an 8×16 double LUT — is broadcast. Scoring is a per-row
    array-lookup fold (no vector math at query time, the whole point of
    ADC); the only corpus exchange is the per-query top-k window. At
    100 TB: scan + one rank shuffle, with 16-byte codes instead of 256-byte
    vectors crossing it."""
    e = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebook(e)
    emb_d = as_double(F.col("embedding"))

    # Shared let-bound encode/LUT helpers (r15): see _pq_encode_structs —
    # the embedding cast and subspace slices are materialized once per row
    # instead of once per (subspace, code) fold step.
    corpus = (
        e.join(F.broadcast(cb))
        .select(
            "vec_id",
            F.transform(
                _pq_encode_structs(emb_d), lambda s: s["k"]
            ).alias("codes"),
        )
    )
    queries = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .join(F.broadcast(cb))
        .select(
            F.col("vec_id").alias("query_id"),
            _pq_query_lut(emb_d).alias("lut"),
        )
    )
    scored = (
        corpus.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                    F.lit(0.0),
                    lambda a, m: a
                    + F.element_at(
                        F.element_at(F.col("lut"), m + 1),
                        F.element_at(F.col("codes"), m + 1).cast("int") + 1,
                    ),
                ),
                4,
            ).alias("approx_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "neighbor_id", "approx_d2", "rk")
    )


_L2_FULL_SQL = (
    "LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64), "
    "d -> (CAST({q}[d] AS DOUBLE) - CAST({c}[d] AS DOUBLE))"
    " * (CAST({q}[d] AS DOUBLE) - CAST({c}[d] AS DOUBLE))))"
)


@register(
    "sim_ann_recall_eval",
    oracle=f"""
        WITH cb AS (
            SELECT vec_id - {_IVF_SEED_BASE} AS k,
                   CAST(embedding AS DOUBLE[]) AS cvec
            FROM embeddings
            WHERE vec_id >= {_IVF_SEED_BASE}
              AND vec_id < {_IVF_SEED_BASE + _PQ_K}
        ),
        ms AS (SELECT UNNEST(GENERATE_SERIES(0, {_PQ_M - 1})) AS m),
        sub AS (
            SELECT e.vec_id, ms.m, c.k,
                   {_PQ_D2_SQL.format(sd=_PQ_SUBDIM, q='e.embedding', c='c.cvec', m='ms.m')} AS d2
            FROM embeddings e CROSS JOIN ms CROSS JOIN cb c
        ),
        codes AS (
            SELECT vec_id, m, k FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, k
                ) AS rk
                FROM sub
            ) WHERE rk = 1
        ),
        lut AS (
            SELECT q.vec_id AS query_id, ms.m, c.k,
                   {_PQ_D2_SQL.format(sd=_PQ_SUBDIM, q='q.embedding', c='c.cvec', m='ms.m')} AS qd2
            FROM embeddings q CROSS JOIN ms CROSS JOIN cb c
            WHERE q.vec_id < {_N_QUERIES}
        ),
        adc_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY approx_d2, neighbor_id
                ) AS rk
                FROM (
                    SELECT l.query_id, cd.vec_id AS neighbor_id,
                           ROUND(LIST_SUM(LIST(l.qd2 ORDER BY l.m)), 4)
                               AS approx_d2
                    FROM codes cd
                    JOIN lut l ON l.m = cd.m AND l.k = cd.k
                    WHERE cd.vec_id <> l.query_id
                    GROUP BY l.query_id, cd.vec_id
                )
            ) WHERE rk <= {_TOP_K}
        ),
        exact_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_L2_FULL_SQL.format(q='q.embedding', c='c.embedding')},
                                    c.vec_id
                       ) AS rk
                FROM embeddings q
                JOIN embeddings c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {_N_QUERIES}
            ) WHERE rk <= {_TOP_K}
        )
        SELECT x.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
               ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {_TOP_K}, 4)
                   AS recall
        FROM exact_topk x
        LEFT JOIN adc_topk a
          ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
        GROUP BY x.query_id
    """,
    tags=("similarity", "ann", "eval"),
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ-ADC index against exact L2 ground truth — the
    eval harness any ANN deployment runs before trusting an index (the
    published IVF-PQ methodology: measure recall on a held-out query set,
    tune M/K/nprobe until it clears the bar).

    Scale shape: ground truth is the brute-force pattern (broadcast query
    set, corpus streams, per-query top-k window) — run on a SAMPLE of
    queries in production, which is exactly what the bounded query set
    models. The comparison join is tiny (queries × k rows). Nothing here
    touches the corpus more than the two scoring passes."""
    e = load_table(spark, sf_dir, "embeddings")
    adc = sim_pq_adc_topk(spark, sf_dir).select("query_id", "neighbor_id")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qemb"),
    )
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("cemb"),
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qemb"), F.col("cemb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy("exact_d2", "neighbor_id")
    exact = (
        cand.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", d2.alias("exact_d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "neighbor_id")
    )
    hits = exact.join(
        adc.withColumnRenamed("neighbor_id", "hit_id"),
        (exact["query_id"] == adc["query_id"])
        & (exact["neighbor_id"] == F.col("hit_id")),
        "left",
    ).select(exact["query_id"].alias("query_id"), F.col("hit_id"))
    return hits.groupBy("query_id").agg(
        F.count("hit_id").alias("n_hits"),
        F.round(F.count("hit_id").cast("double") / _TOP_K, 4).alias("recall"),
    )


_KNN_K = 5


@register(
    "sim_knn_label_vote",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {_N_QUERIES}
        ),
        c AS (
            SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv, label
            FROM embeddings WHERE vec_id >= {_N_QUERIES}
        ),
        topk AS (
            SELECT query_id, nid, label,
                   LIST_COSINE_SIMILARITY(qv, cv) AS s
            FROM q CROSS JOIN c
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY s DESC, nid) <= {_KNN_K}
        ),
        votes AS (
            SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS n_votes
            FROM topk GROUP BY query_id, label
        )
        SELECT query_id, label AS predicted_label, n_votes
        FROM votes
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY n_votes DESC, label) = 1
    """,
    tags=("similarity", "classify"),
)
def sim_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification by majority vote: each query vector takes the
    modal label of its {5} nearest corpus neighbors by cosine (ties to
    the lower label — deterministic). The labeled-neighbor voting loop
    that powers dataset auto-labeling / label-noise detection, expressed
    as two WindowGroupLimit stages over the brute-force scorer.

    Scale shape: identical to sim_brute_force_topk — queries broadcast,
    the corpus streams through one scoring projection and crosses one
    exchange for the per-query top-k; the vote re-agg then runs on k·|Q|
    rows, which is dimension-table sized. Swap the scorer for the
    LSH/IVF candidate path and the voting stages are unchanged."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qv")
    )
    c = e.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("nid"), as_double(F.col("embedding")).alias("cv"), "label"
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "nid", "label", cosine(F.col("qv"), F.col("cv")).alias("s")
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("nid"))
    topk = scored.withColumn("rk", F.row_number().over(wk)).filter(
        F.col("rk") <= _KNN_K
    )
    votes = topk.groupBy("query_id", "label").agg(
        F.count("*").cast("bigint").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), F.col("label"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "n_votes")
    )


_MRL_DIM = 32  # truncation prefix (full vectors are 64-dim)


@register(
    "sim_matryoshka_recall",
    oracle=f"""
        WITH q AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id < {_N_QUERIES}),
        trunc_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(
                               CAST(q.embedding[1:{_MRL_DIM}] AS DOUBLE[]),
                               CAST(c.embedding[1:{_MRL_DIM}] AS DOUBLE[])
                           ) DESC, c.vec_id
                       ) AS rk
                FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
            ) WHERE rk <= {_TOP_K}
        ),
        full_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[])
                           ) DESC, c.vec_id
                       ) AS rk
                FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
            ) WHERE rk <= {_TOP_K}
        )
        SELECT f.query_id,
               CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_hits,
               ROUND(CAST(COUNT(t.neighbor_id) AS DOUBLE) / {_TOP_K}, 4)
                   AS recall_at_k
        FROM full_topk f
        LEFT JOIN trunc_topk t
          ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
        GROUP BY f.query_id
    """,
    tags=("similarity", "eval"),
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022, arXiv:2205.13147):
    recall@k of cosine search over the first {32} of 64 dimensions against
    full-dimension ground truth — the measurement that decides whether a
    prefix-truncated index (2× cheaper storage/scan) is safe to deploy.
    Same harness shape as sim_ann_recall_eval with the index side swapped
    for the sliced-vector scorer.

    Scale shape: two brute-force passes over the bounded broadcast query
    set (a sample in production); the truncated pass reads HALF the vector
    bytes — on a columnar store with sliced storage this is the scan-cost
    saving being measured. Comparison join is queries × k rows."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))

    def topk(score_col):
        w = Window.partitionBy("query_id").orderBy(
            score_col.desc(), F.col("neighbor_id")
        )
        return (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _TOP_K)
            .select("query_id", "neighbor_id")
        )

    trunc = topk(
        let(
            as_double(F.slice(F.col("qv"), 1, _MRL_DIM)),
            lambda qa: let(
                as_double(F.slice(F.col("cv"), 1, _MRL_DIM)),
                lambda ca: cosine(qa, ca),
            ),
        )
    )
    full = topk(cosine_cast(F.col("qv"), F.col("cv")))
    t = trunc.select("query_id", F.col("neighbor_id").alias("t_nid"))
    return (
        full.join(
            t,
            (full.query_id == t.query_id) & (full.neighbor_id == t.t_nid),
            "left",
        )
        .groupBy(full.query_id)
        .agg(
            F.count(t.t_nid).cast("bigint").alias("n_hits"),
            F.round(F.count(t.t_nid) / float(_TOP_K), 4).alias("recall_at_k"),
        )
    )


@register(
    "sim_centroid_classify",
    oracle=f"""
        WITH pe AS (
            SELECT label, UNNEST(embedding) AS v,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS p
            FROM embeddings WHERE vec_id >= {_N_QUERIES}
        ),
        cent AS (
            SELECT label, p, AVG(CAST(v AS DOUBLE)) AS m
            FROM pe GROUP BY label, p
        ),
        cvecs AS (
            SELECT label, LIST(m ORDER BY p) AS cv FROM cent GROUP BY label
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.label,
                   LIST_COSINE_SIMILARITY(
                       CAST(q.embedding AS DOUBLE[]), c.cv) AS s
            FROM embeddings q CROSS JOIN cvecs c
            WHERE q.vec_id < {_N_QUERIES}
        )
        SELECT query_id, label AS predicted_label, ROUND(s, 4) AS centroid_cos
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY s DESC, label) AS rk
            FROM scored
        ) WHERE rk = 1
    """,
    tags=("similarity", "classify"),
)
def sim_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification: per-label mean vectors
    from the labeled corpus, each query taking the label of its most
    cosine-similar centroid — the O(|labels|) classifier that replaces
    kNN's O(corpus) scoring once labels are trusted. The distributed
    VECTOR MEAN is the new primitive here: posexplode to (label, dim)
    cells, average, and reassemble ordered — all built-ins.

    Scale shape: the centroid computation is one map-side-combinable
    average over |labels|x|dims| cells regardless of corpus size; the
    |labels| centroid table is broadcast-bounded by construction; query
    scoring is a zero-shuffle fold. Compare sim_knn_label_vote — same
    fixture, same queries — to see where the two classifiers disagree."""
    e = load_table(spark, sf_dir, "embeddings")
    cells = (
        e.filter(F.col("vec_id") >= _N_QUERIES)
        .select("label", F.posexplode(as_double(F.col("embedding"))).alias("p", "v"))
    )
    cent = cells.groupBy("label", "p").agg(F.avg("v").alias("m"))
    cvecs = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("p"), F.col("m")))),
            lambda s: s.m,
        ).alias("cv")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qv")
    )
    scored = q.crossJoin(F.broadcast(cvecs)).select(
        "query_id", "label", cosine(F.col("qv"), F.col("cv")).alias("s")
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("label"))
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("label").alias("predicted_label"),
            F.round("s", 4).alias("centroid_cos"),
        )
    )


@register(
    "sim_dedup_threshold_sweep",
    oracle=f"""
        WITH pairs AS (
            SELECT LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) AS s
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(*) FILTER (s >= 0.2) AS BIGINT) AS ge_020,
               CAST(COUNT(*) FILTER (s >= 0.3) AS BIGINT) AS ge_030,
               CAST(COUNT(*) FILTER (s >= 0.4) AS BIGINT) AS ge_040,
               CAST(COUNT(*) FILTER (s >= 0.5) AS BIGINT) AS ge_050
        FROM pairs
    """,
    tags=("similarity", "dedup", "eval"),
)
def sim_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning curve for embedding near-dup: candidate-pair
    counts at four cosine cutoffs in ONE scoring pass — the sweep a
    curation team runs before fixing tau (too low deletes distinct
    documents, too high keeps near-copies; the knee of this curve is the
    evidence). Same label-blocked candidate join as
    dedup_embedding_cosine, so the sweep prices exactly the pairs the
    production pass would score.

    Scale shape: one blocked equi-join (never all-pairs), conditional
    counts fold into a single map-side-combinable aggregate — adding a
    threshold costs one counter, not another scan."""
    from cloudfloe_spark.functions.vectors import cosine_cast

    e = load_table(spark, sf_dir, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    s = cosine_cast(F.col("a.embedding"), F.col("b.embedding"))
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(s.alias("s"))
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        *[
            F.sum((F.col("s") >= t).cast("bigint")).cast("bigint").alias(n)
            for t, n in [
                (0.2, "ge_020"),
                (0.3, "ge_030"),
                (0.4, "ge_040"),
                (0.5, "ge_050"),
            ]
        ],
    )


@register(
    "sim_silhouette_by_label",
    oracle=f"""
        WITH pe AS (
            SELECT label, UNNEST(embedding) AS v,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS p
            FROM embeddings WHERE vec_id >= {_N_QUERIES}
        ),
        cvecs AS (
            SELECT label, LIST(m ORDER BY p) AS cv FROM (
                SELECT label, p, AVG(CAST(v AS DOUBLE)) AS m
                FROM pe GROUP BY label, p
            ) GROUP BY label
        ),
        scored AS (
            SELECT e.vec_id, e.label AS own_label, c.label AS c_label,
                   1 - LIST_COSINE_SIMILARITY(
                       CAST(e.embedding AS DOUBLE[]), c.cv) AS d
            FROM embeddings e CROSS JOIN cvecs c
            WHERE e.vec_id >= {_N_QUERIES}
        ),
        ab AS (
            SELECT vec_id, own_label,
                   MIN(CASE WHEN c_label = own_label THEN d END) AS a,
                   MIN(CASE WHEN c_label <> own_label THEN d END) AS b
            FROM scored GROUP BY vec_id, own_label
        )
        SELECT own_label AS label,
               ROUND(AVG((b - a) / GREATEST(a, b)), 6) AS mean_silhouette,
               CAST(COUNT(*) AS BIGINT) AS n_points
        FROM ab
        GROUP BY own_label
    """,
    tags=("similarity", "eval", "cluster"),
)
def sim_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per label (Hruschka et al.'s centroid
    variant of Rousseeuw 1987): a = cosine distance to the OWN label
    centroid, b = distance to the nearest OTHER centroid, score
    (b−a)/max(a,b) averaged per label — the cluster-quality report card
    (near 0 here: the synthetic labels barely separate, and the number
    says so). Full silhouette needs all-pairs distances; the centroid
    variant is the construction that survives 100 TB.

    Scale shape: centroids via the distributed vector mean (bounded
    |labels|×|dims| aggregate); scoring is a zero-shuffle fold against
    the broadcast centroid table; a/b fold per point in one conditional
    aggregate. Corpus crosses one exchange (the per-point a/b groupBy)."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") >= _N_QUERIES
    )
    cells = e.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("p", "v")
    )
    cvecs = (
        cells.groupBy("label", "p")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("p"), F.col("m")))),
                lambda s: s.m,
            ).alias("cv")
        )
        .select(F.col("label").alias("c_label"), "cv")
    )
    scored = e.crossJoin(F.broadcast(cvecs)).select(
        "vec_id",
        F.col("label").alias("own_label"),
        "c_label",
        (
            1
            - let(
                as_double(F.col("embedding")),
                lambda ed: cosine(ed, F.col("cv")),
            )
        ).alias("d"),
    )
    ab = scored.groupBy("vec_id", "own_label").agg(
        F.min(F.when(F.col("c_label") == F.col("own_label"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("c_label") != F.col("own_label"), F.col("d"))).alias("b"),
    )
    return ab.groupBy(F.col("own_label").alias("label")).agg(
        F.round(
            F.avg((F.col("b") - F.col("a")) / F.greatest("a", "b")), 6
        ).alias("mean_silhouette"),
        F.count("*").cast("bigint").alias("n_points"),
    )


@register(
    "sim_cluster_purity",
    oracle=_IVF_COMMON_SQL + """
        , labeled AS (
            SELECT a.list_id, e.label, CAST(COUNT(*) AS BIGINT) AS n
            FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
            GROUP BY a.list_id, e.label
        ),
        ranked AS (
            SELECT list_id, label, n,
                   SUM(n) OVER (PARTITION BY list_id) AS total,
                   ROW_NUMBER() OVER (
                       PARTITION BY list_id ORDER BY n DESC, label
                   ) AS rk
            FROM labeled
        )
        SELECT list_id,
               CAST(total AS BIGINT) AS n_vectors,
               label AS majority_label,
               ROUND(CAST(n AS DOUBLE) / total, 6) AS purity
        FROM ranked WHERE rk = 1
    """,
    tags=("similarity", "eval", "clustering"),
)
def sim_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster purity of the IVF assignment against the stored labels:
    per list, the majority label's share (ties to the lower label — both
    engines rank identically). The external-validity companion to
    sim_silhouette_by_label (internal cohesion): purity says whether the
    codebook partitioning tracks the semantic classes, which is what
    decides if IVF probe pruning loses recall AT the class boundaries.

    Scale shape: assignment is the zero-shuffle broadcast-codebook fold;
    the label join is an equi-join on vec_id; everything after runs on
    |lists|x|labels| rows (bounded by the codebook, not the corpus)."""
    e = load_table(spark, sf_dir, "embeddings")
    labeled = (
        _ivf_assign(e)
        .join(e.select("vec_id", "label"), "vec_id")
        .groupBy("list_id", "label")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wt = Window.partitionBy("list_id")
    wr = Window.partitionBy("list_id").orderBy(
        F.col("n").desc(), F.col("label")
    )
    return (
        labeled.select(
            "list_id",
            "label",
            "n",
            F.sum("n").over(wt).alias("total"),
            F.row_number().over(wr).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "list_id",
            F.col("total").cast("bigint").alias("n_vectors"),
            F.col("label").alias("majority_label"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "purity"
            ),
        )
    )


_PCA_DIM = 64
_PCA_ITERS = 3


def _pca_oracle() -> str:
    dim, v0 = _PCA_DIM, 1.0 / 8.0  # ||v0|| = sqrt(64 * (1/64)) = 1
    steps = [
        f"""cells AS MATERIALIZED (
            SELECT ii.i AS i, jj.j AS j,
                   SUM(CAST(e.embedding AS DOUBLE[])[ii.i + 1]
                       * CAST(e.embedding AS DOUBLE[])[jj.j + 1]) AS g
            FROM embeddings e,
                 GENERATE_SERIES(0, {dim - 1}) ii(i),
                 GENERATE_SERIES(0, {dim - 1}) jj(j)
            GROUP BY ii.i, jj.j
        )""",
        f"v0 AS (SELECT j, CAST({v0} AS DOUBLE) AS v "
        f"FROM GENERATE_SERIES(0, {dim - 1}) t(j))",
    ]
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        steps.append(
            f"""x{k} AS MATERIALIZED (
               SELECT c.i, SUM(c.g * p.v) AS x
               FROM cells c JOIN {prev} p ON p.j = c.j GROUP BY c.i)"""
        )
        steps.append(f"n{k} AS (SELECT SQRT(SUM(x * x)) AS n FROM x{k})")
        steps.append(
            f"v{k} AS (SELECT i AS j, x / n{k}.n AS v FROM x{k}, n{k})"
        )
        prev = f"v{k}"
    return (
        "WITH "
        + ",\n        ".join(steps)
        + f"""
        SELECT j AS dim, ROUND(v, 6) AS component FROM {prev}"""
    )


@register(
    "vec_pca_top_component",
    oracle=_pca_oracle(),
    tags=("similarity", "linalg"),
)
def vec_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER ITERATION
    on the (uncentered) Gram matrix — {3} deterministic iterations from
    the uniform unit start vector. The distributed-PCA pattern: the
    corpus is touched ONCE to accumulate the d×d Gram (combinable sum
    keyed on the bounded (i,j) grid); every iteration afterwards is a
    matrix-vector product over d² = {4096} rows — corpus-size-independent.
    Used to whiten/de-bias embedding spaces and to pick Matryoshka
    truncation axes.

    Scale shape: cell generation expands each vector to d² (i,j) products
    here because d=64 keeps that cheap and fully declarative (oracle-
    matched); for d in the thousands the same one-pass accumulation runs
    as an Arrow mapInPandas partial-Gram per partition (d×d numpy
    accumulator, O(d²) memory) with the identical bounded merge — the
    iteration side is unchanged. Power iterations stay in-plan: each is
    one equi-join + combinable sum + a 1-row norm cross-joined back."""
    from cloudfloe_spark.functions.vectors import as_double

    e = load_table(spark, sf_dir, "embeddings")
    rows = e.select(
        F.posexplode(as_double(F.col("embedding"))).alias("i", "vi"),
        F.col("embedding"),
    )
    cells = (
        rows.select(
            "i", "vi", F.posexplode(as_double(F.col("embedding"))).alias("j", "vj")
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("vi") * F.col("vj")).alias("g"))
        .localCheckpoint(eager=False)  # 4096 rows; reused by every iteration
    )
    return _power_iterate(spark, cells)


def _power_iterate(spark: SparkSession, cells: DataFrame) -> DataFrame:
    """Shared power-iteration tail over a ``(i, j, g)`` Gram frame: 3
    rounds of matvec + normalize, all in-plan (the norm is a 1-row
    aggregate cross-joined back, never collected)."""
    v = spark.range(_PCA_DIM).select(
        F.col("id").cast("int").alias("j"), F.lit(1.0 / 8.0).alias("v")
    )
    for _ in range(_PCA_ITERS):
        x = (
            cells.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("x"))
        )
        nrm = x.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n"))
        v = x.crossJoin(nrm).select(
            F.col("i").alias("j"), (F.col("x") / F.col("n")).alias("v")
        )
    return v.select(
        F.col("j").cast("bigint").alias("dim"),
        F.round("v", 6).alias("component"),
    )


@register(
    "vec_pca_top_component_arrow",
    oracle=_pca_oracle(),
    tags=("similarity", "linalg", "arrow-udf"),
)
def vec_pca_top_component_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LARGE-d Gram accumulation path `vec_pca_top_component`'s
    docstring promises, implemented and proven against the SAME oracle:
    an Arrow ``mapInPandas`` stage accumulates one d×d numpy partial Gram
    PER PARTITION (``Mᵀ·M`` over each Arrow batch — O(d²) memory,
    corpus streamed through), emits it as (i, j, g) rows, and a
    combinable SUM merges the partials. At d in the thousands this emits
    |partitions|·d² rows where the declarative explode emits |corpus|·d²
    — the difference between feasible and not. The power-iteration tail
    is byte-identical to the declarative entry (shared helper).

    The closure is self-contained (numpy/pandas only) per the executor-
    pickling rule; results agree with the sequential-SQL oracle at the
    stated rounding because the partial-Gram float-sum reordering is
    absorbed by normalize + round(6)."""
    dim = _PCA_DIM

    def gram_partials(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            acc += m.T @ m
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        yield pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
        )

    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    cells = (
        e.mapInPandas(gram_partials, "i int, j int, g double")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .localCheckpoint(eager=False)
    )
    return _power_iterate(spark, cells)


_MRR_CAND_K = 10  # IVF candidate list depth the reciprocal rank is read from


@register(
    "sim_ivf_mrr_eval",
    oracle=_IVF_COMMON_SQL + f"""
        , probe AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.vec_id AS query_id, c.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_COS_SQL.format(a='q.embedding', b='c.cent_emb')} DESC,
                                    c.centroid_id
                       ) AS rk
                FROM embeddings q CROSS JOIN cent c
                WHERE q.vec_id < {_N_QUERIES}
            ) WHERE rk <= {_IVF_NPROBE}
        ),
        ivf_ranked AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
                   ) AS rk
            FROM (
                SELECT p.query_id, a.vec_id AS neighbor_id,
                       {_COS_SQL.format(a='q.embedding', b='c.embedding')} AS cos_raw
                FROM probe p
                JOIN assign a ON p.centroid_id = a.list_id
                JOIN embeddings q ON q.vec_id = p.query_id
                JOIN embeddings c ON c.vec_id = a.vec_id
                WHERE p.query_id <> a.vec_id
            )
        ),
        exact_nn AS (
            SELECT query_id, neighbor_id AS nn_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_COS_SQL.format(a='q.embedding', b='c.embedding')} DESC,
                                    c.vec_id
                       ) AS rk
                FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {_N_QUERIES}
            ) WHERE rk = 1
        )
        SELECT x.query_id, x.nn_id,
               CAST(COALESCE(MAX(CASE WHEN i.rk <= {_MRR_CAND_K} THEN i.rk END), 0)
                    AS INT) AS found_rank,
               ROUND(COALESCE(MAX(CASE WHEN i.rk <= {_MRR_CAND_K}
                                       THEN 1.0 / i.rk END), 0.0), 4) AS rr
        FROM exact_nn x
        LEFT JOIN ivf_ranked i
          ON i.query_id = x.query_id AND i.neighbor_id = x.nn_id
        GROUP BY x.query_id, x.nn_id
    """,
    tags=("similarity", "ivf", "eval"),
)
def sim_ivf_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank audit of the IVF index: for each query, find the
    TRUE nearest neighbor by exact cosine, then read its position out of the
    IVF nprobe candidate ranking (depth 10) — rr = 1/rank, 0 when the probe
    pruned the true neighbor's list away. Complements sim_ann_recall_eval
    (set overlap) with a rank-position metric, the retrieval-eval pair
    (recall@k, MRR) every embedding-index deployment reports.

    Scale shape: the exact-NN side is the brute-force broadcast pattern (5
    query rows broadcast across the corpus scan, rank pushdown keeps only
    rank 1); the IVF side reuses the zero-shuffle assignment + broadcast
    probe plan of sim_ivf_ann_topk. The eval intrinsically makes two corpus
    passes (it compares two retrieval methods); what moves through the
    rank exchanges is (query × candidates) score rows — 5× corpus on the
    exact side, the nprobe-pruned subset on the IVF side — never the
    embedding payloads themselves."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(e)
    assign = _ivf_assign_with_vec(e)

    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # exact NN per query: broadcast queries over the corpus, keep rank 1
    c_all = spread(e).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    exact_nn = (
        c_all.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_cast(F.col("q_emb"), F.col("c_emb")).alias(
                "cos_raw"
            ),
        )
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("neighbor_id").alias("nn_id"))
    )

    # IVF candidate ranking (same plan as sim_ivf_ann_topk, depth _MRR_CAND_K)
    probe_scored = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "centroid_id",
        cosine_cast(F.col("q_emb"), F.col("cent_emb")).alias("cos_c"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("centroid_id"))
    probe = (
        probe_scored.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= _IVF_NPROBE)
        .select("query_id", F.col("centroid_id").alias("list_id"))
    )
    ivf_ranked = (
        assign.join(F.broadcast(probe), "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_cast(F.col("q_emb"), F.col("c_emb")).alias(
                "cos_raw"
            ),
        )
        .withColumn("rk", F.row_number().over(wq))
        # truncate to the candidate depth BEFORE the comparison join: ranks
        # past _MRR_CAND_K are misses by definition, and the filter bounds
        # the table to |queries| x depth rows — broadcastable, so the final
        # join never sort-merges
        .filter(F.col("rk") <= _MRR_CAND_K)
        .select("query_id", "neighbor_id", "rk")
    )

    en = exact_nn.alias("en")
    ir = ivf_ranked.alias("ir")
    return (
        en.join(
            F.broadcast(ir),
            (F.col("ir.query_id") == F.col("en.query_id"))
            & (F.col("ir.neighbor_id") == F.col("en.nn_id")),
            "left",
        )
        .groupBy(
            F.col("en.query_id").alias("query_id"), F.col("en.nn_id").alias("nn_id")
        )
        .agg(
            F.coalesce(F.max(F.col("ir.rk")), F.lit(0)).cast("int").alias(
                "found_rank"
            ),
            F.round(
                F.coalesce(F.max(1.0 / F.col("ir.rk")), F.lit(0.0)), 4
            ).alias("rr"),
        )
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion constant
_RRF_DEPTH = 50  # per-list ranking depth feeding the fusion
_RRF_TOP = 15
_RRF_QUERY_VEC = 0  # vec_id of the dense-side query vector
_RRF_TOKS_SQL = (
    "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'), w -> w <> '')"
)


@register(
    "hybrid_rrf_retrieval",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_RRF_TOKS_SQL}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
            FROM dl
        ),
        qterms AS (
            SELECT term FROM (
                SELECT term, SUM(tf) AS n FROM tf GROUP BY term
                ORDER BY n DESC, term ASC LIMIT 5
            )
        ),
        df AS (
            SELECT t.term, CAST(COUNT(*) AS DOUBLE) AS df
            FROM tf t JOIN qterms q ON q.term = t.term GROUP BY t.term
        ),
        sparse AS (
            SELECT doc_id, ROW_NUMBER() OVER (
                       ORDER BY ROUND(score, 6) DESC, doc_id ASC
                   ) AS rk_s
            FROM (
                SELECT tf.doc_id,
                       SUM(LN(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                       ) AS score
                FROM tf
                JOIN df ON df.term = tf.term
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN stats s
                GROUP BY tf.doc_id
            )
            ORDER BY ROUND(score, 6) DESC, doc_id ASC LIMIT {_RRF_DEPTH}
        ),
        dense AS (
            SELECT vec_id AS doc_id, ROW_NUMBER() OVER (
                       ORDER BY cos_raw DESC, vec_id ASC
                   ) AS rk_d
            FROM (
                SELECT c.vec_id,
                       {_COS_SQL.format(a='q.embedding', b='c.embedding')} AS cos_raw
                FROM embeddings c
                JOIN embeddings q ON q.vec_id = {_RRF_QUERY_VEC}
                WHERE c.vec_id <> {_RRF_QUERY_VEC}
            )
            ORDER BY cos_raw DESC, vec_id ASC LIMIT {_RRF_DEPTH}
        )
        SELECT doc_id, rrf,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT)
                   AS rnk
        FROM (
            SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
                   ROUND(COALESCE(1.0 / ({_RRF_K} + s.rk_s), 0)
                         + COALESCE(1.0 / ({_RRF_K} + d.rk_d), 0), 6) AS rrf
            FROM sparse s FULL OUTER JOIN dense d ON d.doc_id = s.doc_id
        )
        ORDER BY rrf DESC, doc_id ASC
        LIMIT {_RRF_TOP}
    """,
    tags=("similarity", "retrieval", "hybrid"),
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (k=60): fuse the BM25
    sparse ranking (corpus' top-5 terms as the lexical query) with the
    dense cosine ranking against a query embedding, score = Σ 1/(60+rank)
    over the lists a document appears in — the standard RAG-stack ranker
    that needs no score calibration because it fuses RANKS, not scores.
    Documents and embeddings join on the shared id (docs lacking an
    embedding can still surface via the sparse list: FULL OUTER fusion).

    Scale shape: the sparse side is the text_bm25_topk plan (one
    (doc, term) shuffle, every derivation off the same subtree, broadcast
    query-term prune); the dense side broadcasts the single query vector
    across the embedding scan with rank pushdown; both lists are truncated
    to depth 50 BEFORE the fusion join, so the full-outer join runs on
    ≤100 rows. Fused ordering uses integer ranks — cross-engine exact."""
    from cloudfloe_spark.functions.text import words
    from cloudfloe_spark.sources.tables import load_table as _lt

    d = _lt(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    toks = d.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # One vocab aggregation serves BOTH query-term selection (top corpus
    # frequency) and df (r16 — guide §2.4, mirroring text_bm25_topk): df
    # is the tf row count per term, so it rides the same groupBy instead
    # of a second vocab-wide exchange + broadcast-join re-aggregation.
    dfreq = (
        tf.groupBy("term")
        .agg(
            F.sum("tf").alias("n"),
            F.count("*").cast("double").alias("df"),
        )
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(5)
        .select("term", "df")
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * 2.2 / denom
    sparse = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .withColumn(
            "rk_s",
            F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rk_s")
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == _RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb")
    )
    dense = (
        e.filter(F.col("vec_id") != _RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_cast(F.col("q_emb"), F.col("embedding")).alias(
                "cos_raw"
            ),
        )
        .orderBy(F.desc("cos_raw"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .withColumn(
            "rk_d",
            F.row_number().over(
                Window.orderBy(F.desc("cos_raw"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rk_d")
    )

    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("rk_s")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("rk_d")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_RRF_TOP)
    )
    return fused.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.desc("rrf"), F.asc("doc_id")))
        .cast("int"),
    )
