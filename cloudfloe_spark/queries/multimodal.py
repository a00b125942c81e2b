"""Multimodal-column queries: decode / frame-sample over opaque binary
payloads (north-star extension; no counterpart in the reference, which is
text-only SQL — `reference/README.md:26`).

The decode itself is the deterministic stub from
:mod:`cloudfloe_spark.functions.multimodal` (media libs aren't in this
container); what these queries actually pin is the REAL Spark machinery:
binary columns through Arrow ``mapInPandas`` batches, typed decoded
schema, and built-in sequence/explode frame planning. The oracle mirrors
the stub arithmetic in SQL: DuckDB ``md5(text)`` hashes the same UTF-8
bytes as Spark ``md5(encode(text, 'UTF-8'))``, and ``strlen`` is the byte
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfloe_spark.functions.multimodal import (
    decode_media,
    sample_frames,
    with_fake_media,
)
from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table, spread

# SQL twins of functions.multimodal.fake_decode_dims / with_fake_media —
# any change there must change these (and vice versa).
_MEDIA_TYPE_SQL = "['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]"
_BYTES_SQL = "STRLEN(COALESCE(text, ''))"
_MD5_SQL = "MD5(COALESCE(text, ''))"
_WIDTH_SQL = f"16 + {_BYTES_SQL} % 64"
_HEIGHT_SQL = f"16 + CAST(('0x' || SUBSTRING({_MD5_SQL}, 1, 2)) AS INT) % 64"
_DURATION_SQL = f"1000 + {_BYTES_SQL} % 9000"


def _decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return decode_media(with_fake_media(docs))


@register(
    "mm_decode_media",
    oracle=f"""
        SELECT doc_id,
               {_MEDIA_TYPE_SQL} AS media_type,
               CAST({_WIDTH_SQL} AS INT) AS width,
               CAST({_HEIGHT_SQL} AS INT) AS height,
               CAST({_DURATION_SQL} AS BIGINT) AS duration_ms,
               {_MD5_SQL} AS checksum
        FROM documents
    """,
    tags=("multimodal", "pandas-udf"),
)
def mm_decode_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level decode through Arrow-batched mapInPandas: binary payload →
    typed (width, height, duration, checksum). Embarrassingly parallel —
    no shuffle; blob column pruned everywhere downstream of the decode."""
    return _decoded(spark, sf_dir)


@register(
    "mm_decode_stats",
    oracle=f"""
        SELECT {_MEDIA_TYPE_SQL} AS media_type,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               ROUND(AVG({_WIDTH_SQL}), 6) AS avg_width,
               ROUND(AVG({_HEIGHT_SQL}), 6) AS avg_height,
               CAST(SUM({_BYTES_SQL}) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
    """,
    tags=("multimodal", "agg"),
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over decoded metadata: the decode is map-side; the single
    shuffle is the 3-key groupBy on media_type."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    media = with_fake_media(docs)
    decoded = decode_media(media).join(
        media.select("doc_id", "size_bytes"), "doc_id"
    )
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.sum("size_bytes").alias("total_bytes"),
        )
    )


@register(
    "mm_frame_sample",
    oracle=f"""
        WITH video AS (
            SELECT doc_id,
                   CAST({_DURATION_SQL} AS BIGINT) AS duration_ms,
                   {_MD5_SQL} AS checksum
            FROM documents
            WHERE {_MEDIA_TYPE_SQL} = 'video'
        )
        SELECT doc_id, CAST(f.frame_ms AS BIGINT) AS frame_ms, checksum
        FROM video,
             LATERAL (
                 SELECT UNNEST(GENERATE_SERIES(0, duration_ms - 1,
                                               duration_ms // 4)) AS frame_ms
             ) f
    """,
    tags=("multimodal", "explode"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: decode → sequence(0, duration, step) →
    explode. The sampling schedule is pure built-in Spark; only pixel
    extraction would be a pandas UDF (stubbed)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return sample_frames(with_fake_media(docs), n_frames=4)


@register(
    "mm_metadata_pruning",
    oracle=f"""
        SELECT {_MEDIA_TYPE_SQL} AS media_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM({_BYTES_SQL}) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
    """,
    tags=("multimodal", "pruning"),
)
def mm_metadata_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate over the media table: never touches the
    payload column, so column pruning keeps the blobs out of the scan —
    the property that makes 100 TB multimodal tables queryable."""
    media = with_fake_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum("size_bytes").alias("total_bytes"),
    )


@register(
    "mm_resize_thumbnail",
    oracle=f"""
        WITH decoded AS (
            SELECT doc_id,
                   {_MEDIA_TYPE_SQL} AS media_type,
                   CAST({_WIDTH_SQL} AS INT) AS width,
                   CAST({_HEIGHT_SQL} AS INT) AS height
            FROM documents
        )
        SELECT doc_id, media_type, width, height,
               CAST(GREATEST(width * 64 // GREATEST(width, height), 1)
                    AS INT) AS out_width,
               CAST(GREATEST(height * 64 // GREATEST(width, height), 1)
                    AS INT) AS out_height,
               CAST(GREATEST(width * 64 // GREATEST(width, height), 1)
                    * GREATEST(height * 64 // GREATEST(width, height), 1)
                    * 3 AS BIGINT) AS out_bytes
        FROM decoded
        WHERE media_type = 'image'
    """,
    tags=("multimodal",),
)
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-resize plumbing (the brief's decode → RESIZE stage):
    aspect-preserving 64-box fit of every image payload through a second
    Arrow ``mapInPandas`` stage, emitting output geometry + the byte size
    the RGB thumbnail occupies. Integer-exact arithmetic so the oracle
    checks the whole two-stage mapInPandas pipeline.

    Scale: both stages stream Arrow batches (peak memory O(batch));
    the media_type filter prunes non-images before the resize stage, and
    untouched payload bytes never cross into the second stage's Arrow
    frame (metadata-only columns selected)."""
    from cloudfloe_spark.functions.multimodal import resize_media

    decoded = _decoded(spark, sf_dir)
    return resize_media(decoded.filter(F.col("media_type") == "image"))


@register(
    "mm_dedup_candidates",
    oracle=f"""
        SELECT {_MEDIA_TYPE_SQL} AS media_type,
               CAST({_WIDTH_SQL} AS INT) AS width,
               CAST({_HEIGHT_SQL} AS INT) AS height,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(COUNT(DISTINCT {_MD5_SQL}) AS BIGINT)
                   AS n_distinct_contents,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
        FROM documents
        GROUP BY media_type, width, height
        HAVING COUNT(*) >= 2
    """,
    tags=("multimodal", "dedup"),
)
def mm_dedup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup candidate generation: bucket decoded payloads by their
    feature signature (media type x decoded dimensions — the stand-in for
    a perceptual hash, same blocking role LSH bands play for text), then
    count items and DISTINCT content digests per bucket. n_items minus
    n_distinct_contents is the exact-duplicate count inside the bucket;
    buckets with many items but few contents are where a perceptual
    near-dup pass would run next. The two-stage exact-then-perceptual
    recipe every multimodal curation pipeline uses.

    Scale shape: the decode runs through Arrow mapInPandas once; the
    aggregation shuffles ONLY the (type, width, height, md5) projection
    — 32-byte digests and three small ints, never the blobs (shuffling
    media bytes to dedup them is the classic multimodal pipeline
    mistake). Map-side combinable; candidate buckets are bounded by the
    signature space, not the corpus."""
    decoded = _decoded(spark, sf_dir)
    return (
        decoded.select("doc_id", "media_type", "width", "height", "checksum")
        .groupBy("media_type", "width", "height")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.count_distinct("checksum").cast("bigint").alias(
                "n_distinct_contents"
            ),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .filter(F.col("n_items") >= 2)
    )
