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

from cloudfloe_spark.functions.vectors import as_double, cosine
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
            cosine(as_double(F.col("q_emb")), as_double(F.col("c_emb"))).alias("cos_raw"),
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
            cosine(as_double(F.col("q_emb")), as_double(F.col("c_emb"))).alias("cos_raw"),
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
    oracle="""
        SELECT a.label,
               COUNT(*) AS n_pairs,
               ROUND(AVG(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[]))), 4) AS avg_cos,
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
    blocked equi-join on label, no global cross."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(as_double(F.col("a.embedding")), as_double(F.col("b.embedding")))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.label").alias("label"), cos.alias("cos_raw"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("cos_raw"), 4).alias("avg_cos"),
            F.round(F.max("cos_raw"), 4).alias("max_cos"),
        )
    )
