"""Multimodal plumbing tests: binary columns through Arrow batches, typed
decode schema, stubbed real-decode gate. Value-level correctness is pinned
by the oracle catalog tests (mm_* entries)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cloudfloe_spark.functions.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    media_schema,
    sample_frames,
    with_fake_media,
)
from cloudfloe_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return with_fake_media(load_table(spark, sf_dir, "documents"))


def test_media_schema_shape(media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in media_schema().fields
    ]
    assert media.schema["content"].dataType.simpleString() == "binary"


def test_payload_is_opaque_bytes(media):
    row = media.filter(F.col("doc_id") == 0).collect()[0]
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["size_bytes"] == len(row["content"])


def test_decode_schema_and_checksum(media):
    decoded = decode_media(media)
    assert decoded.schema == DECODED_SCHEMA
    got = {r["doc_id"]: r for r in decoded.limit(50).collect()}
    src = {
        r["doc_id"]: r["content"]
        for r in media.filter(F.col("doc_id").isin(list(got))).collect()
    }
    for doc_id, row in got.items():
        assert row["checksum"] == hashlib.md5(bytes(src[doc_id])).hexdigest()
        assert 16 <= row["width"] < 80 and 16 <= row["height"] < 80


def test_real_decode_is_gated(media):
    with pytest.raises(Exception) as e:
        decode_media(media, real_decode=True).limit(1).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_frame_sampling_only_video(media):
    frames = sample_frames(media, n_frames=4)
    ids = frames.select("doc_id").distinct()
    # every sampled doc is a video doc (doc_id % 3 == 2 by construction)
    bad = ids.filter(F.col("doc_id") % 3 != 2).count()
    assert bad == 0
    per_doc = frames.groupBy("doc_id").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert per_doc[0] >= 4  # at least n_frames samples each


def test_blob_pruned_for_metadata_query(media):
    """Column pruning must keep the payload out of metadata-only plans —
    the property that makes 100 TB media tables cheap to query."""
    plan = (
        media.groupBy("media_type")
        .agg(F.sum("size_bytes"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "content" not in plan
