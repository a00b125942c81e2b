"""Continuous materialized-view maintenance from the commit-tail source
(r10, VERDICT r9 #6): instead of POLLING ``refresh_materialized_view``,
a streaming query tails the view's base table in CDC mode
(``streaming/iceberg_source.py``) and applies each micro-batch's
changelog to the target through the SAME transform + keyed-apply path
the batch incremental refresh uses — exactly-once per epoch by the
``changelog-id`` summary dedup (the construction the streaming sink and
batch applies already share), so a crash-replayed epoch is a no-op.

Scope: single-base ROW-shaped views (projection/filter), the shape whose
delta transform is a pure per-row function of the changelog — keyed, or
keyless over insert-only batches. Aggregate and join shapes need
base-side recompute per delta and stay on the batch
``refresh_materialized_view`` path (which IS incremental for them); a
non-qualifying view fails at start with a clear error instead of
silently degrading.

The target's ``cloudfloe.mv`` freshness property advances with every
applied epoch (to the LATEST base commit the batch covered, resolved by
snapshot-log order — ids are random, not ordered), so the batch
``materialized_view_status`` / ``refresh_materialized_view`` surface
stays coherent with the stream: a stopped follower can be polled, a
polled target can start following.

Scale shape: each micro-batch reads only the files its commits touched
(the source's per-commit pruning), the transform is delta-sized, the
apply is the broadcast-keys retraction + delta-sized insert, and the
property stamp is one O(1) metadata version. The base is never
re-scanned; the target is never rewritten.
"""

from __future__ import annotations

import json
import os
import uuid


from cloudfloe_spark.sources.iceberg_views import IcebergViewError


def follow_materialized_view(
    spark,
    view_root: str,
    target_root: str,
    *,
    checkpoint_dir: str,
    timestamp_ms: int,
    timeout_s: int = 180,
) -> dict:
    """Drain the base table's commit tail (Trigger.AvailableNow) into the
    materialized-view target at ``target_root``. The target must have
    been created by ``materialize_iceberg_view`` for the view at
    ``view_root`` (the freshness property supplies the start offset and
    the key columns). Returns ``{"batches": n, "skipped": n,
    "retracted": n, "inserted": n}``; restartable from the same
    checkpoint with exactly-once application.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources.iceberg_views import (
        _keyed_apply_safe,
        _stamp_mv_property,
        current_view_sql,
        incremental_shape,
    )
    from cloudfloe_spark.sources.maintenance import apply_changelog
    from cloudfloe_spark.streaming.iceberg_sink import _checkpoint_query_id
    from cloudfloe_spark.streaming.iceberg_source import (
        register_iceberg_commits_source,
    )

    shape = incremental_shape(current_view_sql(view_root))
    if shape is None or shape["kind"] != "row":
        raise IcebergViewError(
            "follow_materialized_view: only single-base row-shaped views "
            "(projection/filter) can be followed continuously; aggregate "
            "and join shapes use refresh_materialized_view, which applies "
            "their deltas incrementally per call"
        )
    base = shape["base"]
    meta = im.load_metadata(target_root)
    raw = (meta.get("properties") or {}).get("cloudfloe.mv")
    if not raw:
        raise IcebergViewError(
            f"follow_materialized_view: {target_root} is not a "
            "materialized view target"
        )
    rec = json.loads(raw)
    if rec.get("view", "").rstrip("/") != view_root.rstrip("/"):
        raise IcebergViewError(
            f"follow_materialized_view: target records view "
            f"{rec.get('view')!r}, not {view_root!r}"
        )
    if list(rec.get("bases") or {}) != [base]:
        raise IcebergViewError(
            "follow_materialized_view: target's recorded bases "
            f"{sorted(rec.get('bases') or {})} do not match the view's "
            f"single base {base!r}"
        )
    keys = list(rec.get("key-cols") or [])
    start = str(rec["bases"][base])
    if not start.lstrip("-").isdigit():
        raise IcebergViewError(
            "follow_materialized_view: the base snapshot recorded at "
            "materialize time is unreadable — re-materialize first"
        )

    register_iceberg_commits_source(spark)
    stream = (
        spark.readStream.format("iceberg_commits")
        .option("mode", "cdc")
        .option("start", start)
        .load(base)
    )

    stats = {"batches": 0, "skipped": 0, "retracted": 0, "inserted": 0}
    resolved: dict[str, str] = {}

    def _qid() -> str:
        if "v" not in resolved:
            resolved["v"] = _checkpoint_query_id(checkpoint_dir) or (
                "ck:" + os.path.realpath(checkpoint_dir)
            )
        return resolved["v"]

    def apply_batch(batch_df, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        base_cols = [
            c
            for c in batch_df.columns
            if c not in ("_change_type", "_commit_snapshot_id")
        ]
        tmp = f"__cf_mvf_{uuid.uuid4().hex[:8]}"
        batch_df.persist()
        batch_df.createOrReplaceTempView(tmp)
        try:
            sel = shape["select"]
            if sel.strip() == "*":
                sel = ", ".join(base_cols)
            sql = f"SELECT {sel}, _change_type FROM {tmp}"
            if shape["where"]:
                sql += f" WHERE {shape['where']}"
            try:
                changes = sess.sql(sql)
                plan = (
                    changes._jdf.queryExecution().analyzed().toString()
                )
            except AnalysisException as e:
                raise IcebergViewError(
                    f"follow_materialized_view: view transform failed "
                    f"analysis on the changelog batch: {e}"
                ) from None
            if "Aggregate" in plan or "Generate" in plan:
                raise IcebergViewError(
                    "follow_materialized_view: the view transform is not "
                    "row-shaped (aggregate/generator in plan)"
                )
            changelog_id = f"mvstream:{_qid()}:{epoch_id}"
            if keys:
                if not _keyed_apply_safe(sess, target_root, changes, keys):
                    raise IcebergViewError(
                        "follow_materialized_view: unique-keys contract "
                        "violated — stop the stream and run a full "
                        "refresh_materialized_view"
                    )
                res = apply_changelog(
                    sess, target_root, changes, keys,
                    timestamp_ms=timestamp_ms + int(epoch_id),
                    changelog_id=changelog_id,
                )
            else:
                has_retraction = (
                    changes.filter(
                        F.col("_change_type").isin(
                            "delete", "update_preimage"
                        )
                    )
                    .limit(1)
                    .count()
                )
                if has_retraction:
                    raise IcebergViewError(
                        "follow_materialized_view: keyless view met a "
                        "retracting commit — record key_cols at "
                        "materialize time to follow DML streams"
                    )
                res = apply_changelog(
                    sess, target_root, changes, [changes.columns[0]],
                    timestamp_ms=timestamp_ms + int(epoch_id),
                    changelog_id=changelog_id,
                )
            if res.get("skipped"):
                stats["skipped"] += 1
                return
            stats["batches"] += 1
            stats["retracted"] += res.get("retracted", 0)
            stats["inserted"] += res.get("inserted", 0)
            # advance the freshness lineage to the LAST base commit this
            # batch covered (snapshot-log order — ids are random)
            sids = {
                r[0]
                for r in batch_df.select("_commit_snapshot_id")
                .distinct()
                .collect()
            }
            if sids:
                log_ids = [
                    e["snapshot-id"]
                    for e in im.load_metadata(base).get("snapshot-log", [])
                ]
                applied = [i for i in log_ids if i in sids]
                if applied:
                    _stamp_mv_property(
                        target_root,
                        view_root=view_root,
                        view_version=rec.get("view-version"),
                        bases={base: str(applied[-1])},
                        timestamp_ms=timestamp_ms + int(epoch_id),
                        key_cols=keys or None,
                    )
        finally:
            sess.catalog.dropTempView(tmp)
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"follow_materialized_view: drain exceeded {timeout_s}s"
        )
    return stats
