"""Multimodal column support: opaque binary media + typed metadata.

Pattern (per the north-star spec): image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
transforms over ``mapInPandas`` — the Spark-side plumbing (schema,
partitioning, batch shape) is real and tested, while the pixel/sample
decode itself is stubbed: the image/audio libraries are not in this
container, so ``decode_media_batch(real_decode=True)`` raises
``NotImplementedError`` and the default path computes a DETERMINISTIC fake
decode derived only from the payload bytes (size/md5 arithmetic). The fake
is pure SQL-expressible, which is what lets the DuckDB oracle check the
whole mapInPandas pipeline end-to-end.

Scale notes:

- ``mapInPandas`` streams Arrow record batches; peak executor memory is
  O(batch), not O(partition). Payload columns are pruned when untouched
  (column pruning reaches the parquet scan), so metadata-only queries
  never read the blobs.
- Real deployments should store payloads under a threshold inline and
  larger ones as object-store pointers; ``media_schema`` carries ``uri``
  for exactly that, and ``decode`` batches can fetch lazily per-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_TYPES = ("image", "audio", "video")


def media_schema() -> StructType:
    """Canonical multimodal column group: payload + typed metadata."""
    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("content", BinaryType()),  # opaque payload
            StructField("uri", StringType()),  # pointer for out-of-line blobs
            StructField("media_format", StringType()),  # e.g. png/wav/mp4
            StructField("size_bytes", LongType()),
        ]
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("checksum", StringType()),
    ]
)


def with_fake_media(documents: DataFrame) -> DataFrame:
    """Fixture adapter: the container has no media files, so derive an
    opaque payload deterministically from ``documents.text`` (utf-8 bytes)
    and assign media_type/format round-robin by doc_id. Everything
    downstream treats ``content`` as opaque, exactly as it would real
    bytes."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    return documents.select(
        "doc_id",
        mt.alias("media_type"),
        content.alias("content"),
        F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("uri"),
        fmt.alias("media_format"),
        F.length(content).cast("long").alias("size_bytes"),
    )


def fake_decode_dims(size_bytes: int, digest_hex: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decode: dimensions/duration from
    payload size and digest. Mirrored 1:1 by SQL in the oracle queries —
    any change here must change the oracle arithmetic too."""
    width = 16 + size_bytes % 64
    height = 16 + int(digest_hex[:2], 16) % 64
    duration_ms = 1000 + size_bytes % 9000
    return width, height, duration_ms


def decode_media_batch(real_decode: bool = False):
    """``mapInPandas`` function decoding a media batch → ``DECODED_SCHEMA``.

    ``real_decode=True`` is the integration point for PIL/librosa/ffmpeg;
    not available in this container, so it raises with a clear message.

    The closure is deliberately SELF-CONTAINED (stdlib + pandas only, no
    module-level references): cloudpickle then serializes it fully by
    value, so executors never need ``cloudfloe_spark`` importable — the
    package is also shipped via ``addPyFile`` (sources.tables), but UDFs
    in the hot path shouldn't depend on that.
    """

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hashlib

        import pandas as pd

        if real_decode:
            raise NotImplementedError(
                "real media decode requires PIL/librosa/ffmpeg; "
                "not installed in this environment"
            )
        for batch in batches:
            content = batch["content"]
            digests = content.map(
                lambda b: _hashlib.md5(bytes(b)).hexdigest()
            )
            sizes = content.map(len)
            # keep in sync with fake_decode_dims (oracle-mirrored)
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "media_type": batch["media_type"],
                    "width": [16 + s % 64 for s in sizes],
                    "height": [
                        16 + int(d[:2], 16) % 64 for d in digests
                    ],
                    "duration_ms": [1000 + s % 9000 for s in sizes],
                    "checksum": digests,
                }
            )

    return _decode


def decode_media(media: DataFrame, *, real_decode: bool = False) -> DataFrame:
    """Decode payloads into typed metadata via Arrow-batched mapInPandas.

    Only the three columns the decode function reads cross the Python
    boundary (r15, guide §4.1): mapInPandas is opaque to Catalyst, so
    without the explicit select every column of ``media`` — uri, format,
    size — would be Arrow-serialized into the worker and dropped there."""
    return media.select("doc_id", "media_type", "content").mapInPandas(
        decode_media_batch(real_decode=real_decode), schema=DECODED_SCHEMA
    )


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plan for video media: one row per sampled frame with
    its millisecond offset, evenly spaced over the (decoded) duration.

    The *sampling plan* is pure built-in Spark (sequence + explode — no
    Python in the hot path); only the eventual pixel extraction would be a
    pandas UDF, stubbed like :func:`decode_media_batch`.
    """
    decoded = decode_media(media).filter(F.col("media_type") == "video")
    step = (F.col("duration_ms") / n_frames).cast("long")
    return (
        decoded.withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, step)),
        )
        .select("doc_id", "frame_ms", "checksum")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_bytes", LongType()),
    ]
)


def resize_media_batch(max_dim: int = 64, real_resize: bool = False):
    """``mapInPandas`` thumbnail-resize stage → ``RESIZED_SCHEMA``.

    Aspect-preserving box fit: scale the longer edge to ``max_dim`` using
    pure integer arithmetic (``out_w = max(1, w*max_dim // max(w, h))``),
    so the oracle reproduces it exactly. ``real_resize=True`` is the
    PIL/ffmpeg integration point (absent in this container → clear raise);
    the stub computes the output geometry and the byte size the RGB
    thumbnail would occupy (w·h·3) without touching pixels.

    Self-contained closure (stdlib + pandas only) for the same
    pickle-by-value reason as :func:`decode_media_batch`.
    """

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if real_resize:
            raise NotImplementedError(
                "real thumbnailing requires PIL/ffmpeg; "
                "not installed in this environment"
            )
        for batch in batches:
            w = batch["width"].astype("int64")
            h = batch["height"].astype("int64")
            longer = w.where(w >= h, h)
            out_w = (w * max_dim // longer).clip(lower=1)
            out_h = (h * max_dim // longer).clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "media_type": batch["media_type"],
                    "width": batch["width"],
                    "height": batch["height"],
                    "out_width": out_w.astype("int32"),
                    "out_height": out_h.astype("int32"),
                    "out_bytes": (out_w * out_h * 3).astype("int64"),
                }
            )

    return _resize


def resize_media(decoded: DataFrame, max_dim: int = 64) -> DataFrame:
    """Thumbnail-resize a decoded media frame (see ``resize_media_batch``)."""
    cols = ["doc_id", "media_type", "width", "height"]
    return decoded.select(*cols).mapInPandas(
        resize_media_batch(max_dim=max_dim), schema=RESIZED_SCHEMA
    )
