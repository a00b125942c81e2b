"""Local Iceberg-layout table writer (fixtures / demo seeding).

The reference seeds its demo warehouse with pyiceberg against MinIO
(`scripts/upload_sample_data.py`, `docker-compose.yml`); this sandbox has
neither, so demo/test tables are written directly in the Iceberg v2 layout:
parquet data files (pyarrow), avro manifests + manifest lists
(:mod:`avrolite`), and versioned ``metadata/*.metadata.json``. The output
is read back by :mod:`iceberg_meta` (and by any real Iceberg reader that
tolerates the minimal column-stats-free manifests).

NOT a general Iceberg writer: a single partition spec (identity or a
derived transform — ``year``/``month``/``day``/``hour``/``bucket[N]``/
``truncate[W]``, values computed per the Iceberg spec by
:mod:`partition_pruning`). Column statistics (exact min/max bounds + null
counts, name-keyed stringified stand-ins for the spec's field-id-keyed
metrics) ARE recorded per data file for metrics-based file skipping.
Row-level deletes: real position-delete files commit via
``position_delete_snapshot`` / :func:`commit_delete_snapshot` (the commit
half of ``maintenance.delete_where``); equality-delete ENTRIES can be
injected for guard tests via ``add_delete_file_snapshot`` (entries only,
no readable content).
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from cloudfloe_spark.sources.avrolite import write_avro

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        # v2: data sequence number of the entry (null ⇒ inherited; the
        # fixture always writes the add-time sequence explicitly so
        # merge-on-read ordering is testable)
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    # v2: schema field ids an equality delete matches on
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                    # partition values keyed by SPEC FIELD NAME, stringified
                    # (the fixture stand-in for the spec's typed r102
                    # struct; the reader casts back using the source
                    # column's type / transform). Values are nullable: a
                    # null partition value is a real Iceberg state (all
                    # rows in the file have a NULL source value).
                    {
                        "name": "partition",
                        "type": [
                            "null",
                            {"type": "map", "values": ["null", "string"]},
                        ],
                    },
                    # Per-column file statistics, the fixture stand-in for
                    # the spec's field-id-keyed single-value-serialized
                    # lower_bounds / upper_bounds / null_value_counts
                    # (data_file fields 125/128/110): keyed by WRITE-TIME
                    # column name, values stringified like the partition
                    # tuple above. Bounds are EXACT min/max (no 16-byte
                    # string truncation — exact bounds are trivially
                    # sound). Absent maps (older fixtures, rewrite
                    # entries) mean "no stats" → the reader never prunes.
                    {
                        "name": "lower_bounds",
                        "type": [
                            "null",
                            {"type": "map", "values": ["null", "string"]},
                        ],
                    },
                    {
                        "name": "upper_bounds",
                        "type": [
                            "null",
                            {"type": "map", "values": ["null", "string"]},
                        ],
                    },
                    {
                        "name": "null_value_counts",
                        "type": [
                            "null",
                            {"type": "map", "values": "long"},
                        ],
                    },
                    # The partition-spec id the file was written under.
                    # Real Iceberg records this in the manifest-file
                    # header (partition-spec-id) and one manifest holds
                    # one spec's files; this single-manifest fixture
                    # stamps it per entry instead. Null = pre-stamp entry
                    # (pruned only when the table has a single spec).
                    {"name": "spec_id", "type": ["null", "int"]},
                    # v3 deletion vectors (r10): a content=1 entry whose
                    # file is a Puffin blob reference — the DV of ONE
                    # data file at (content_offset, content_size) inside
                    # file_path. Null on every v2 entry (the avro writer
                    # encodes absent keys as null).
                    {
                        "name": "referenced_data_file",
                        "type": ["null", "string"],
                    },
                    {"name": "content_offset", "type": ["null", "long"]},
                    {
                        "name": "content_size_in_bytes",
                        "type": ["null", "long"],
                    },
                    # v3 row lineage (r11): the row id of this data
                    # file's first row — row N's id is first_row_id + N.
                    # Null on non-lineage tables AND on rewritten
                    # (compacted) files, whose rows carry a MATERIALIZED
                    # _row_id parquet column instead (ids must survive
                    # compaction; merged files are not contiguous).
                    {"name": "first_row_id", "type": ["null", "long"]},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_ARROW_TO_ICEBERG = {
    pa.int32(): "int",
    pa.int64(): "long",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "string",
    pa.bool_(): "boolean",
    pa.binary(): "binary",
}


def _default_single_value_json(v):
    """Iceberg JSON single-value serialization for the primitive default
    values this engine honors (v3 ``initial-default``/``write-default``):
    bool/int/float/str pass through; date/timestamp/decimal serialize to
    their spec string forms. Anything else raises — defaults the engine
    cannot honor must be rejected at declaration, not mis-written."""
    import datetime
    import decimal

    if isinstance(v, bool) or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    raise ValueError(
        f"unsupported column default {v!r}: only primitive defaults "
        "(bool/int/float/str/date/timestamp/decimal) are honored"
    )


def _assign_row_ids(meta: dict, new_entries: list) -> "int | None":
    """v3 row lineage (r11): on a lineage-carrying table (metadata has
    ``next-row-id``), stamp each NEW content=0 manifest entry's
    ``first_row_id`` from the table counter and advance it by the file's
    record count — the spec's commit-time assignment. Returns the
    snapshot's ``first-row-id`` (the counter before this commit), or
    None for non-lineage tables. Entries already carrying a
    ``first_row_id`` (an apply replaying preserved files) are left
    alone."""
    nri = meta.get("next-row-id")
    if nri is None:
        return None
    mark = int(nri)
    cur = mark
    for e in new_entries:
        df_ = e["data_file"]
        if df_.get("content", 0) != 0:
            continue
        if df_.get("first_row_id") is not None:
            continue
        df_["first_row_id"] = cur
        cur += int(df_.get("record_count") or 0)
    meta["next-row-id"] = cur
    return mark


def _stamp_row_lineage(snap: dict, mark: "int | None", nri: int) -> None:
    """Record the commit's row-id block on its snapshot: ``first-row-id``
    plus an ``assigned-rows`` summary — what lets a REST catalog server
    (``rest_catalog.apply_table_updates``) recompute ``next-row-id`` as
    server-side bookkeeping instead of the client posting it."""
    if mark is None:
        return
    snap["first-row-id"] = mark
    snap.setdefault("summary", {})["assigned-rows"] = str(nri - mark)


def _stat_str(v) -> str:
    """Stringify a bound value so the reader's domain parsers
    (partition_pruning._parse_date/_parse_ts, int()/float()) round-trip it
    exactly. Aware timestamps normalize to naive UTC (the reader compares
    in the session's UTC domain)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def _geo_stat_cols(meta: dict) -> dict:
    """Geo columns of the table's CURRENT schema → their kind
    (``"geometry"`` or ``"geography"``) — the columns whose file
    envelopes get stamped into manifest bounds at WRITE time (r15,
    VERDICT r14 #6). Geometry gets planar envelopes; geography gets
    WRAPPED longitude intervals (lower.x > upper.x ⇔ crosses the
    antimeridian, the v3 convention) — exact spherical-edge envelopes
    for every WKB type (r15 late; polygon rings that separate or touch
    a pole take the full-sphere envelope — see
    ``functions.geo._build_geodesic_envelope`` for the convention)."""
    sid = meta.get("current-schema-id")
    sch = next(
        (
            s
            for s in meta.get("schemas") or []
            if s.get("schema-id") == sid
        ),
        None,
    )
    if sch is None:
        return {}
    out = {}
    for f in sch.get("fields") or []:
        t = str(f.get("type", ""))
        if t.startswith("geometry"):
            out[f["name"]] = "geometry"
        elif t.startswith("geography"):
            out[f["name"]] = "geography"
    return out


def _column_stats(t: pa.Table, geo_cols: "dict | frozenset" = ()):
    """(lower_bounds, upper_bounds, null_value_counts) for one data file —
    exact per-column min/max over primitive columns (the fixture's
    equivalent of the spec's data_file metrics, see _MANIFEST_SCHEMA).

    Sound-by-omission cases, mirroring Iceberg writer behavior:
    - non-primitive / unsupported types → no bounds for that column;
    - all-NULL column → no bounds (null count still recorded);
    - float/double column containing NaN → no bounds (NaN is unordered;
      the spec handles it via nan_value_counts, the fixture by omission);
    - boolean → no bounds (two-value domain, pruning value ~nil).

    ``geo_cols`` (r15, VERDICT r14 #6 — write-time geo bounds): binary
    columns declared ``geometry``/``geography`` in the table schema get
    their envelope aggregated into the bounds maps in the same stats
    pass every commit already runs over the just-written file — lower =
    "xmin ymin", upper = "xmax ymax" (repr'd doubles), the exact format
    ``maintenance.compute_geo_bounds`` stamps and the geo file-skip in
    ``service/iceberg_local.py`` consumes — so appends/DML/streaming
    into a geo table keep per-file bbox pruning alive with no manual
    manifest rewrite. Geometry boxes are planar; geography longitude
    intervals may WRAP (lower.x > upper.x ⇔ crosses the antimeridian)
    and are exact spherical-edge envelopes for every WKB type (r15
    late; pole-separating/touching polygon rings → full sphere).
    Sound-by-omission on any unparseable WKB, NaN coordinate, or
    EMPTY-only column.
    """
    import pyarrow.compute as pc

    lower: dict[str, str] = {}
    upper: dict[str, str] = {}
    nulls: dict[str, int] = {}
    for field in t.schema:
        col = t.column(field.name)
        nulls[field.name] = col.null_count
        typ = field.type
        if col.null_count == t.num_rows or t.num_rows == 0:
            continue
        if not (
            pa.types.is_integer(typ)
            or pa.types.is_floating(typ)
            or pa.types.is_string(typ)
            or pa.types.is_large_string(typ)
            or pa.types.is_date(typ)
            or pa.types.is_timestamp(typ)
        ):
            continue
        if pa.types.is_floating(typ) and pc.any(
            pc.is_nan(col.combine_chunks()), min_count=0
        ).as_py():
            continue
        try:
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
        except pa.ArrowNotImplementedError:
            continue
        if lo is None or hi is None:
            continue
        lower[field.name] = _stat_str(lo)
        upper[field.name] = _stat_str(hi)
    geo_kinds = (
        geo_cols
        if isinstance(geo_cols, dict)
        else {n: "geometry" for n in geo_cols}
    )
    for name, kind in geo_kinds.items():
        if name not in t.schema.names or name in lower:
            continue
        col = t.column(name)
        typ = t.schema.field(name).type
        if not (
            pa.types.is_binary(typ) or pa.types.is_large_binary(typ)
        ):
            continue
        env = (
            _geog_envelope(col)
            if kind == "geography"
            else _geo_envelope(col)
        )
        if env is not None:
            x0, y0, x1, y1 = env
            lower[name] = f"{x0!r} {y0!r}"
            upper[name] = f"{x1!r} {y1!r}"
    return lower or None, upper or None, nulls or None


def _point_xy_vectorized(col) -> "tuple | None":
    """Fast path for the write-time geo stamp: when EVERY value in the
    column is a 21-byte little-endian 2-D WKB POINT (the dominant
    layout for event/location tables), the coordinates decode in bulk
    with numpy off the Arrow data buffer — no per-row Python. Returns
    (xs, ys) float64 arrays, or None when the shape doesn't hold
    (callers fall back to the exact per-row parser)."""
    import numpy as np

    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if arr.null_count or len(arr) == 0:
        return None
    try:
        # binary offsets are int32; large_binary carries int64
        odt = (
            np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        )
        buffers = arr.buffers()
        offsets = np.frombuffer(buffers[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        if not ((offsets[1:] - offsets[:-1]) == 21).all():
            return None
        data = np.frombuffer(buffers[2], dtype=np.uint8)[
            offsets[0] : offsets[-1]
        ].reshape(-1, 21)
    except (ValueError, TypeError, IndexError):
        return None
    hdr = np.array([1, 1, 0, 0, 0], dtype=np.uint8)
    if not (data[:, :5] == hdr).all():
        return None
    xs = data[:, 5:13].copy().view("<f8").ravel()
    ys = data[:, 13:21].copy().view("<f8").ravel()
    return xs, ys


def _geo_envelope(col) -> "tuple | None":
    """File-level (xmin, ymin, xmax, ymax) over a WKB binary column, or
    None when no bound is sound (all NULL/EMPTY, a parse error, or a
    NaN coordinate — NaN is unordered, mirroring the float rule)."""
    import math

    from cloudfloe_spark.functions.geo import parse_wkb_envelope

    fast = _point_xy_vectorized(col)
    if fast is not None:
        import numpy as np

        xs, ys = fast
        if np.isnan(xs).any() or np.isnan(ys).any():
            return None
        return (
            float(xs.min()), float(ys.min()),
            float(xs.max()), float(ys.max()),
        )
    x0 = y0 = x1 = y1 = None
    try:
        for v in col:
            b = v.as_py()
            if b is None:
                continue
            _t, n, ex0, ey0, ex1, ey1 = parse_wkb_envelope(b)
            if n == 0:
                continue  # EMPTY geometry: no points, no bounds
            if any(
                math.isnan(c) for c in (ex0, ey0, ex1, ey1)
            ):
                return None
            if x0 is None:
                x0, y0, x1, y1 = ex0, ey0, ex1, ey1
            else:
                x0, y0 = min(x0, ex0), min(y0, ey0)
                x1, y1 = max(x1, ex1), max(y1, ey1)
    except (ValueError, OverflowError, IndexError):
        return None
    if x0 is None:
        return None
    return x0, y0, x1, y1


def _geog_envelope(col) -> "tuple | None":
    """File-level GEOGRAPHY bounds over a WKB binary column: minimal
    WRAPPED longitude interval (xlo > xhi ⇔ crosses the antimeridian,
    the v3 convention) + plain latitude min/max. Point, line, and
    multipoint features are EXACT under spherical edge interpolation
    (``functions.geo.parse_geodesic_envelope``: per-edge shorter lon
    arc + Clairaut vertex latitude; r15 late — previously point-only);
    polygon rings that separate or touch a pole yield the full-sphere
    envelope (sound under any interior convention), winding-0 rings
    their exact boundary envelope. None when unsound: parse error,
    NaN/out-of-range coordinate, antipodal open-path edge, or no
    points at all."""
    from cloudfloe_spark.functions.geo import (
        parse_geodesic_envelope,
        wrap_interval,
        wrap_interval_cover,
    )

    fast = _point_xy_vectorized(col)
    if fast is not None:
        import numpy as np

        xs, ys = fast
        if (
            np.isnan(xs).any()
            or np.isnan(ys).any()
            or (np.abs(xs) > 180.0).any()
            or (np.abs(ys) > 90.0).any()
        ):
            return None
        iv = wrap_interval(xs.tolist())
        if iv is None:
            return None
        return iv[0], float(ys.min()), iv[1], float(ys.max())

    intervals: list = []
    y0 = y1 = None
    try:
        for v in col:
            b = v.as_py()
            if b is None:
                continue
            env = parse_geodesic_envelope(b)
            if env is None:
                continue  # EMPTY feature: no points, no bounds
            lo, hi, ey0, ey1 = env
            intervals.append((lo, hi))
            y0 = ey0 if y0 is None else min(y0, ey0)
            y1 = ey1 if y1 is None else max(y1, ey1)
    except (ValueError, OverflowError, IndexError):
        return None  # malformed feature: omit (sound)
    iv = wrap_interval_cover(intervals)
    if iv is None:
        return None
    return iv[0], y0, iv[1], y1


class LocalIcebergTable:
    """Incrementally build a local Iceberg v2 table, one snapshot at a time.

    ``uri_prefix`` controls the scheme of every absolute URI recorded in
    the metadata (data files, delete files, manifests, manifest lists,
    table location). Default ``"file://"`` records local URIs; passing
    e.g. ``"s3://bucket-a"`` produces a table whose reads must resolve
    through the filesystem that serves that scheme — used by the s3a seam
    tests to exercise the fsio-routed jarless reader end-to-end.

    Single-writer: the instance tracks table state in memory, so do NOT
    commit through a live instance after an EXTERNAL commit
    (``commit_rewrite_snapshot`` / maintenance ops) touched the same
    table — the next ``_commit`` would publish metadata built from the
    stale in-memory snapshot list, dropping the external snapshot.
    External commits use collision-free snapshot ids and file names, so
    nothing is overwritten — but the fixture's metadata would supersede.
    """

    def __init__(
        self,
        root: str,
        arrow_schema: pa.Schema,
        uri_prefix: str = "file://",
        partition_by: "Optional[str | tuple[str, str]]" = None,
        row_lineage: bool = False,
        variant_cols: "tuple[str, ...] | list[str]" = (),
    ):
        self.root = root
        self.schema = arrow_schema
        self._uri_prefix = uri_prefix
        # partition_by: a column name (identity transform), a
        # (column, transform) pair, or a LIST of either — a multi-field
        # spec, e.g. [("ts", "day"), ("id", "bucket[4]")], the layout real
        # Iceberg tables overwhelmingly use. Transforms per the Iceberg
        # spec: "identity", "year", "month", "day", "hour", "bucket[N]",
        # "truncate[W]".
        if partition_by is None:
            fields: list = []
        elif isinstance(partition_by, list):
            fields = [
                f if isinstance(f, tuple) else (f, "identity")
                for f in partition_by
            ]
        elif isinstance(partition_by, tuple):
            fields = [partition_by]
        else:
            fields = [(partition_by, "identity")]
        self._pfields: list[tuple[str, str]] = fields
        # spec log: evolve_partition_spec appends; files stamp the spec id
        # they were written under (manifest entry spec_id)
        self._specs: list[list[tuple[str, str]]] = [list(fields)]
        self._default_spec_id = 0
        # single-field compat attributes (rename_column keys off these)
        self.partition_by = fields[0][0] if fields else None
        self.partition_transform = fields[0][1] if fields else "identity"
        if fields:
            self._validate_pfields(fields, arrow_schema.names)
        self._snapshots: list[dict] = []
        self._live: dict[str, dict] = {}  # file_path → data_file record
        self._delete_files: list[dict] = []
        self._seq = 0
        # Field ids per the spec: assigned once, stable across renames
        # and promotions (position-preserving), NOT reassigned on drops,
        # fresh for re-added names — tracked explicitly so a dropped
        # middle column cannot shift later columns onto its id.
        self._field_ids: list[int] = list(range(1, len(arrow_schema) + 1))
        self._last_field_id = len(arrow_schema)
        # v3 column defaults (r11): field id → python default value;
        # serialized as initial-default/write-default in the schema JSON.
        # Any entry forces format-version 3 on the next metadata write.
        self._defaults: dict[int, object] = {}
        # v3 row lineage (r11): every appended data file gets a
        # first_row_id; the table metadata tracks next-row-id; each
        # snapshot records its first-row-id. Forces format-version 3.
        self._row_lineage = bool(row_lineage)
        self._next_row_id = 0
        self._pending_row_mark: "int | None" = None
        # v3 variant (r12): these arrow struct<metadata: binary,
        # value: binary> columns record the Iceberg type "variant" in
        # the schema JSON (the unshredded physical layout). Forces
        # format-version 3.
        self._variant_cols = tuple(variant_cols)
        for vc in self._variant_cols:
            if vc not in arrow_schema.names:
                raise KeyError(f"variant column {vc!r} not in schema")
            t = arrow_schema.field(vc).type
            names = (
                {t.field(i).name for i in range(t.num_fields)}
                if pa.types.is_struct(t)
                else set()
            )
            # unshredded (metadata, value) or any SHREDDED layout with
            # a typed_value subcolumn (r12) — per-file physical shapes
            # are preserved at write time (see append_snapshot)
            if "metadata" not in names or not names <= {
                "metadata", "value", "typed_value"
            }:
                raise ValueError(
                    f"variant column {vc!r} must be a struct of "
                    "(metadata, value[, typed_value])"
                )
        # schema log: rename_column appends entries; current id = last
        self._schema_log: list[dict] = []
        self._extra_meta_versions = 0
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    def _uri(self, abs_path: str) -> str:
        return f"{self._uri_prefix}{abs_path}"

    @staticmethod
    def _validate_pfields(fields, schema_names) -> None:
        from cloudfloe_spark.sources.partition_pruning import parse_transform

        for col_name, transform in fields:
            if col_name not in schema_names:
                raise KeyError(f"partition column {col_name!r} not in schema")
            parse_transform(transform)  # validate early

    def evolve_partition_spec(
        self,
        partition_by: "Optional[str | tuple[str, str] | list]",
        *,
        timestamp_ms: int,
    ) -> int:
        """Partition-spec EVOLUTION (Iceberg `ALTER TABLE ... WRITE
        ORDERED/PARTITIONED BY` shape): append a new spec to the metadata
        spec log and make it the default — metadata-only, no snapshot, no
        file rewrite. Files already written keep their old spec id stamp
        and must keep being pruned under THEIR spec; only future appends
        write (and prune) under the new one. Returns the new spec id."""
        if partition_by is None:
            fields: list = []
        elif isinstance(partition_by, list):
            fields = [
                f if isinstance(f, tuple) else (f, "identity")
                for f in partition_by
            ]
        elif isinstance(partition_by, tuple):
            fields = [partition_by]
        else:
            fields = [(partition_by, "identity")]
        self._validate_pfields(fields, self.schema.names)
        self._specs.append(list(fields))
        self._default_spec_id = len(self._specs) - 1
        self._pfields = fields
        self.partition_by = fields[0][0] if fields else None
        self.partition_transform = fields[0][1] if fields else "identity"
        self._extra_meta_versions += 1
        if self._snapshots:
            self._write_metadata_json(timestamp_ms)
        return self._default_spec_id

    # -- snapshot builders ----------------------------------------------------

    def append_snapshot(
        self,
        tables: list[pa.Table],
        *,
        timestamp_ms: int,
        remove: Optional[list[str]] = None,
    ) -> int:
        """New snapshot: write each pyarrow table as one data file, drop any
        ``remove``-listed file paths (overwrite semantics). Returns the
        snapshot id."""
        for path in remove or []:
            self._live.pop(path, None)
        # v3 write-default: an appended table that OMITS a defaulted
        # column gets it filled at write time (the spec's write-side
        # semantic — new files must materialize write-default, never
        # fall back to initial-default on read)
        if self._defaults:
            filled = []
            for t in tables:
                for i, f in enumerate(self.schema):
                    dv = self._defaults.get(self._field_ids[i])
                    if dv is not None and f.name not in t.column_names:
                        t = t.append_column(
                            f, pa.array([dv] * t.num_rows, type=f.type)
                        )
                filled.append(t.select(self.schema.names))
            tables = filled
        parts: list[tuple[pa.Table, Optional[dict]]] = []
        for t in tables:
            if not self._pfields:
                parts.append((t, None))
            else:
                from cloudfloe_spark.sources.partition_pruning import (
                    transform_value,
                )

                # Group rows by the TUPLE of transformed partition values
                # (identity is the trivial transform). NULL source values
                # land in a null-valued tuple slot — never silently
                # dropped.
                per_field = []
                for col_name, transform in self._pfields:
                    src_t = self._source_iceberg_type(col_name)
                    per_field.append(
                        [
                            transform_value(transform, v, src_t)
                            for v in t.column(col_name).to_pylist()
                        ]
                    )
                by_val: dict = {}
                for i, tv in enumerate(zip(*per_field)):
                    by_val.setdefault(tv, []).append(i)
                fnames = [
                    self.partition_field_name(c, tr)
                    for c, tr in self._pfields
                ]
                for tv in sorted(
                    by_val, key=lambda tup: [(v is None, str(v)) for v in tup]
                ):
                    sub = t.take(by_val[tv])
                    parts.append(
                        (
                            sub,
                            {
                                fn: None if v is None else str(v)
                                for fn, v in zip(fnames, tv)
                            },
                        )
                    )
        if self._row_lineage and self._pending_row_mark is None:
            self._pending_row_mark = self._next_row_id
        for t, pvals in parts:
            fname = f"data/{len(self._live):05d}-{uuid.uuid4().hex[:8]}.parquet"
            fpath = os.path.join(self.root, fname)
            if self._variant_cols:
                # variant columns keep their PER-FILE physical shape
                # (unshredded (metadata, value) or any shredded layout)
                # — casting would destroy typed_value subcolumns; only
                # non-variant columns normalize to the table schema
                cols = {}
                for f in self.schema:
                    col = t.column(f.name)
                    cols[f.name] = (
                        col
                        if f.name in self._variant_cols
                        else col.cast(f.type)
                    )
                pq.write_table(pa.table(cols), fpath)
            else:
                pq.write_table(t.cast(self.schema), fpath)
            lower, upper, nulls = _column_stats(t)
            self._live[fpath] = {
                "content": 0,
                "file_path": self._uri(fpath),
                "file_format": "PARQUET",
                "record_count": t.num_rows,
                "file_size_in_bytes": os.path.getsize(fpath),
                "partition": pvals,
                "lower_bounds": lower,
                "upper_bounds": upper,
                "null_value_counts": nulls,
                "spec_id": self._default_spec_id,
            }
            if self._row_lineage:
                # spec assignment: file first_row_id = table next-row-id
                # before the file, advanced by its record count
                self._live[fpath]["first_row_id"] = self._next_row_id
                self._next_row_id += t.num_rows
        return self._commit(timestamp_ms)

    def add_delete_file_snapshot(self, *, timestamp_ms: int) -> int:
        """Snapshot that carries an EQUALITY-delete file entry (content=2) —
        for exercising the delete-file guard (equality deletes stay
        rejected without the runtime); the file itself is a stub."""
        fname = f"data/del-{uuid.uuid4().hex[:8]}.parquet"
        fpath = os.path.join(self.root, fname)
        with open(fpath, "wb") as f:
            f.write(b"stub")  # never read: the guard must reject first
        self._delete_files.append(
            {
                "content": 2,
                "file_path": self._uri(fpath),
                "file_format": "PARQUET",
                "record_count": 1,
                "file_size_in_bytes": 4,
            }
        )
        return self._commit(timestamp_ms)

    def live_data_paths(self) -> list[str]:
        """Absolute paths of currently-live data files (for building
        position deletes against known rows)."""
        return sorted(self._live)

    def position_delete_snapshot(
        self, deletes: list[tuple[str, int]], *, timestamp_ms: int
    ) -> int:
        """Snapshot adding a REAL position-delete file (content=1): a
        parquet of ``(file_path, pos)`` rows per the Iceberg v2 spec, where
        ``file_path`` is the manifest-recorded URI of a live data file and
        ``pos`` the 0-based row ordinal within it."""
        fname = f"data/pdel-{uuid.uuid4().hex[:8]}.parquet"
        fpath = os.path.join(self.root, fname)
        t = pa.table(
            {
                "file_path": pa.array(
                    [self._uri(p) for p, _ in deletes], pa.string()
                ),
                "pos": pa.array([pos for _, pos in deletes], pa.int64()),
            }
        )
        pq.write_table(t, fpath)
        self._delete_files.append(
            {
                "content": 1,
                "file_path": self._uri(fpath),
                "file_format": "PARQUET",
                "record_count": t.num_rows,
                "file_size_in_bytes": os.path.getsize(fpath),
            }
        )
        return self._commit(timestamp_ms)

    def equality_delete_snapshot(
        self,
        rows: pa.Table,
        equality_ids: list[int],
        *,
        timestamp_ms: int,
    ) -> int:
        """Snapshot adding a REAL equality-delete file (content=2): a
        parquet whose columns are the schema fields named by
        ``equality_ids`` (1-based, in schema order — matching
        ``_iceberg_schema``). Per the v2 spec it deletes every data row
        whose values null-safe-equal a delete row AND whose data sequence
        number is strictly lower than this snapshot's."""
        fname = f"data/edel-{uuid.uuid4().hex[:8]}.parquet"
        fpath = os.path.join(self.root, fname)
        pq.write_table(rows, fpath)
        self._delete_files.append(
            {
                "content": 2,
                "file_path": self._uri(fpath),
                "file_format": "PARQUET",
                "record_count": rows.num_rows,
                "file_size_in_bytes": os.path.getsize(fpath),
                "equality_ids": list(equality_ids),
            }
        )
        return self._commit(timestamp_ms)

    # -- internals ------------------------------------------------------------

    def rename_column(self, old: str, new: str, *, timestamp_ms: int) -> None:
        """Metadata-only column rename (Iceberg semantics: the field id is
        stable, already-written data files keep the old parquet column
        name, and only readers that resolve by field id see one coherent
        column). Appends a new schema to the log, points
        ``current-schema-id`` at it, and publishes a new metadata version
        WITHOUT a snapshot — exactly what an ``ALTER TABLE RENAME COLUMN``
        commit writes. Subsequent appends must use the new name."""
        if old not in self.schema.names:
            raise KeyError(f"no column {old!r} to rename")
        if new in self.schema.names:
            raise ValueError(f"column {new!r} already exists")
        import pyarrow as pa

        self.schema = pa.schema(
            [
                f.with_name(new) if f.name == old else f
                for f in self.schema
            ]
        )
        if self.partition_by == old:
            self.partition_by = new
        if old in self._variant_cols:
            self._variant_cols = tuple(
                new if c == old else c for c in self._variant_cols
            )
        self._pfields = [
            (new if c == old else c, tr) for c, tr in self._pfields
        ]
        # every spec in the log references source columns by name here;
        # a rename must follow them all (real Iceberg tracks source-id,
        # which is rename-stable — this mirrors that)
        self._specs = [
            [(new if c == old else c, tr) for c, tr in spec]
            for spec in self._specs
        ]
        if not self._schema_log:
            # schema 0 was implicit until now — materialize the ORIGINAL
            # names as schema-id 0 before appending the renamed schema.
            renamed_back = pa.schema(
                [
                    f.with_name(old) if f.name == new else f
                    for f in self.schema
                ]
            )
            orig, self.schema = self.schema, renamed_back
            self._schema_log.append(self._iceberg_schema(0))
            self.schema = orig
        self._schema_log.append(
            self._iceberg_schema(len(self._schema_log))
        )
        self._extra_meta_versions += 1
        if self._snapshots:
            self._write_metadata_json(timestamp_ms)

    def add_column(
        self, name: str, pa_type, *, timestamp_ms: int, default=None
    ) -> None:
        """Metadata-only ADD COLUMN (appended, so existing positional
        field ids stay stable): new schema in the log, current-schema-id
        bumped, new metadata version, no snapshot. Files written before
        lack the column and must read as NULL — unless ``default`` is
        given (Iceberg v3 add-column-with-default): the field then
        carries ``initial-default`` (readers fill it for pre-existing
        files) and ``write-default`` (appends that omit the column get
        it filled), and the table's format-version advances to 3."""
        if name in self.schema.names:
            raise ValueError(f"column {name!r} already exists")
        import pyarrow as pa

        if not self._schema_log:
            self._schema_log.append(self._iceberg_schema(0))
        self.schema = self.schema.append(pa.field(name, pa_type))
        self._last_field_id += 1
        self._field_ids.append(self._last_field_id)
        if default is not None:
            _default_single_value_json(default)  # validate: primitive only
            self._defaults[self._last_field_id] = default
        self._schema_log.append(
            self._iceberg_schema(len(self._schema_log))
        )
        self._extra_meta_versions += 1
        if self._snapshots:
            self._write_metadata_json(timestamp_ms)

    def drop_column(self, name: str, *, timestamp_ms: int) -> None:
        """Metadata-only DROP COLUMN: the field leaves the current schema
        (new schema in the log, no snapshot); already-written files keep
        the column bytes on disk, but reads under the explicit
        current-schema DDL never project them. The field's id is retired,
        never reassigned — a later ``add_column`` with the SAME name gets
        a fresh id, and the name-history resolver then flags the old
        name as ambiguous for footer mapping (compaction is the remedy),
        instead of silently resurrecting dropped data. Columns any
        partition spec sources refuse to drop (evolve the spec first),
        matching Iceberg's own constraint."""
        if name not in self.schema.names:
            raise KeyError(f"no column {name!r} to drop")
        for spec in self._specs:
            if any(c == name for c, _ in spec):
                raise ValueError(
                    f"drop_column: {name!r} is a partition source column "
                    "— evolve the partition spec away from it first"
                )
        if len(self.schema) == 1:
            raise ValueError("drop_column: cannot drop the last column")
        import pyarrow as pa

        if not self._schema_log:
            self._schema_log.append(self._iceberg_schema(0))
        i = self.schema.names.index(name)
        self.schema = pa.schema(
            [f for j, f in enumerate(self.schema) if j != i]
        )
        del self._field_ids[i]
        self._schema_log.append(
            self._iceberg_schema(len(self._schema_log))
        )
        self._extra_meta_versions += 1
        if self._snapshots:
            self._write_metadata_json(timestamp_ms)

    def promote_column(
        self, name: str, new_pa_type, *, timestamp_ms: int
    ) -> None:
        """Metadata-only TYPE PROMOTION per the Iceberg v2 spec (int →
        long, float → double): the field keeps its id and position, only
        its type changes in a new schema appended to the log. Files
        written before keep their narrower physical type on disk;
        CURRENT reads resolve under the promoted schema via
        ``scan_groups``'s explicit read DDL (Spark 4's parquet reader
        widens int32→long / float→double natively under an explicit
        schema), while time travel keeps resolving under each snapshot's
        own schema-id — pre-promotion snapshots read the narrow type."""
        if name not in self.schema.names:
            raise ValueError(f"column {name!r} not found")
        i = self.schema.names.index(name)
        old_t = _ARROW_TO_ICEBERG.get(self.schema.field(i).type)
        new_t = _ARROW_TO_ICEBERG.get(new_pa_type)
        if (old_t, new_t) not in {("int", "long"), ("float", "double")}:
            raise ValueError(
                f"illegal type promotion {old_t} -> {new_t} for "
                f"{name!r} (Iceberg v2 allows int->long, float->double)"
            )
        import pyarrow as pa

        if not self._schema_log:
            self._schema_log.append(self._iceberg_schema(0))
        self.schema = self.schema.set(i, pa.field(name, new_pa_type))
        self._schema_log.append(
            self._iceberg_schema(len(self._schema_log))
        )
        self._extra_meta_versions += 1
        if self._snapshots:
            self._write_metadata_json(timestamp_ms)

    def _commit(self, timestamp_ms: int) -> int:
        self._seq += 1
        snap_id = 7_000_000_000_000_000_000 + self._seq  # > 2^53: JS-unsafe
        mpath = os.path.join(
            self.root, "metadata", f"manifest-{self._seq:05d}.avro"
        )
        entries = [
            {
                "status": 1,
                "snapshot_id": snap_id,
                # add-time data sequence number (stamped below for records
                # new in this commit) — equality-delete application is
                # ordered on this, per the v2 spec
                "sequence_number": df.setdefault("_added_seq", self._seq),
                "data_file": {
                    **{k: v for k, v in df.items() if not k.startswith("_")},
                    "equality_ids": df.get("equality_ids"),
                    "partition": df.get("partition"),
                    "lower_bounds": df.get("lower_bounds"),
                    "upper_bounds": df.get("upper_bounds"),
                    "null_value_counts": df.get("null_value_counts"),
                    "spec_id": df.get("spec_id"),
                },
            }
            for df in list(self._live.values()) + self._delete_files
        ]
        write_avro(mpath, _MANIFEST_SCHEMA, entries)
        mlist = os.path.join(
            self.root, "metadata", f"snap-{snap_id}-manifest-list.avro"
        )
        write_avro(
            mlist,
            _MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": self._uri(mpath),
                    "manifest_length": os.path.getsize(mpath),
                    "content": 0,
                    "added_snapshot_id": snap_id,
                }
            ],
        )
        n_deletes = len(self._delete_files)
        row_mark = None
        if self._row_lineage:
            # the snapshot's first-row-id: where this commit's id block
            # starts (== next-row-id when the commit added no rows)
            row_mark = (
                self._pending_row_mark
                if self._pending_row_mark is not None
                else self._next_row_id
            )
            self._pending_row_mark = None
        self._snapshots.append(
            {
                "snapshot-id": snap_id,
                "sequence-number": self._seq,
                # spec: the schema the snapshot was written under — time
                # travel reads resolve column names as of this schema
                "schema-id": (
                    self._schema_log[-1]["schema-id"]
                    if self._schema_log
                    else 0
                ),
                "timestamp-ms": timestamp_ms,
                "manifest-list": self._uri(mlist),
                "summary": {
                    "operation": "append",
                    "total-records": str(
                        sum(f["record_count"] for f in self._live.values())
                    ),
                    "total-data-files": str(len(self._live)),
                    "total-delete-files": str(n_deletes),
                },
            }
        )
        if row_mark is not None:
            _stamp_row_lineage(
                self._snapshots[-1], row_mark, self._next_row_id
            )
        self._write_metadata_json(timestamp_ms)
        return snap_id

    def partition_field_name(self, col: str | None = None, transform: str | None = None) -> str:
        """Iceberg's conventional spec-field naming: identity fields carry
        the column name; derived transforms suffix it (``ts_day``,
        ``c_bucket``, ``s_trunc``). No-arg form = the first spec field."""
        from cloudfloe_spark.sources.partition_pruning import parse_transform

        col = col if col is not None else self.partition_by
        transform = transform if transform is not None else self.partition_transform
        kind, _ = parse_transform(transform)
        if kind == "identity":
            return col
        suffix = {"truncate": "trunc"}.get(kind, kind)
        return f"{col}_{suffix}"

    def _source_iceberg_type(self, col: str | None = None) -> str:
        f = self.schema.field(col if col is not None else self.partition_by)
        t = _ARROW_TO_ICEBERG.get(f.type)
        if t is None and pa.types.is_timestamp(f.type):
            t = "timestamptz" if f.type.tz else "timestamp"
        if t is None and pa.types.is_date(f.type):
            t = "date"
        if t is None and pa.types.is_decimal(f.type):
            t = f"decimal({f.type.precision}, {f.type.scale})"
        if t is None:
            raise ValueError(f"unmapped arrow type {f.type}")
        return t

    def _iceberg_schema(self, schema_id: int = 0) -> dict:
        fields = []
        for i, f in enumerate(self.schema):
            if f.name in self._variant_cols:
                fields.append(
                    {
                        "id": self._field_ids[i],
                        "name": f.name,
                        "required": False,
                        "type": "variant",
                    }
                )
                continue
            t = _ARROW_TO_ICEBERG.get(f.type)
            if t is None:
                if pa.types.is_timestamp(f.type):
                    # v3 nanosecond types (r12): arrow ns precision maps
                    # to timestamp_ns/timestamptz_ns and forces v3
                    if f.type.unit == "ns":
                        t = (
                            "timestamptz_ns" if f.type.tz
                            else "timestamp_ns"
                        )
                    else:
                        t = "timestamptz" if f.type.tz else "timestamp"
                elif pa.types.is_date(f.type):
                    t = "date"
                elif pa.types.is_decimal(f.type):
                    t = f"decimal({f.type.precision}, {f.type.scale})"
                else:
                    raise ValueError(f"unmapped arrow type {f.type}")
            fld = {
                "id": self._field_ids[i],
                "name": f.name,
                "required": False,
                "type": t,
            }
            dv = self._defaults.get(self._field_ids[i])
            if dv is not None:
                j = _default_single_value_json(dv)
                fld["initial-default"] = j
                fld["write-default"] = j
            fields.append(fld)
        return {"type": "struct", "schema-id": schema_id, "fields": fields}

    def _write_metadata_json(self, timestamp_ms: int) -> None:
        # Partition field ids per the Iceberg spec: assigned MONOTONICALLY
        # from 1000 across the spec log, and an unchanged (source-id,
        # transform) pair REUSES its id when a later spec repeats it —
        # recomputed deterministically here from the ordered spec walk, so
        # every metadata rewrite yields the same ids (ADVICE r7: the old
        # 1000+spec_id*100+i scheme collided past 100 fields and forked a
        # fresh id for identical fields on every evolution).
        assigned: dict[tuple, int] = {}
        last_partition_id = 999
        spec_entries = []
        for sid, spec in enumerate(self._specs):
            fields = []
            for c, tr in spec:
                src = self._field_ids[self.schema.names.index(c)]
                if (src, tr) not in assigned:
                    last_partition_id += 1
                    assigned[(src, tr)] = last_partition_id
                fields.append(
                    {
                        "name": self.partition_field_name(c, tr),
                        "source-id": src,
                        "field-id": assigned[(src, tr)],
                        "transform": tr,
                    }
                )
            spec_entries.append({"spec-id": sid, "fields": fields})
        meta = {
            # defaults, row lineage, variant and ns timestamps are
            # v3-only features
            "format-version": (
                3
                if (
                    self._defaults
                    or self._row_lineage
                    or self._variant_cols
                    or any(
                        pa.types.is_timestamp(f.type)
                        and f.type.unit == "ns"
                        for f in self.schema
                    )
                )
                else 2
            ),
            "table-uuid": "00000000-0000-0000-0000-000000000000",
            "location": self._uri(self.root),
            "last-updated-ms": timestamp_ms,
            "current-snapshot-id": self._snapshots[-1]["snapshot-id"],
            "default-spec-id": self._default_spec_id,
            "last-partition-id": last_partition_id,
            "partition-specs": spec_entries,
            "current-schema-id": (
                self._schema_log[-1]["schema-id"] if self._schema_log else 0
            ),
            "schemas": self._schema_log or [self._iceberg_schema()],
            **(
                {"next-row-id": self._next_row_id}
                if self._row_lineage
                else {}
            ),
            "snapshots": self._snapshots,
            "snapshot-log": [
                {
                    "snapshot-id": s["snapshot-id"],
                    "timestamp-ms": s["timestamp-ms"],
                }
                for s in self._snapshots
            ],
        }
        path = os.path.join(
            self.root,
            "metadata",
            f"v{self._seq + self._extra_meta_versions}.metadata.json",
        )
        with open(path, "w") as f:
            json.dump(meta, f)



def _sync_main_ref(meta: dict, snap_id: int) -> None:
    """Keep an EXISTING explicit ``refs["main"]`` entry mirroring the
    published current snapshot (r10): REST-materialized metadata carries
    main explicitly (the spec's set-snapshot-ref), and a local commit
    that moved only ``current-snapshot-id`` would leave ``VERSION AS OF
    'main'`` resolving the PREVIOUS snapshot. Tables without an explicit
    main entry are untouched (current-snapshot-id is authoritative)."""
    refs = meta.get("refs")
    if isinstance(refs, dict) and isinstance(refs.get("main"), dict):
        refs["main"]["snapshot-id"] = snap_id


class CommitConflictError(RuntimeError):
    """Another commit landed between a rewrite's read and its commit."""


def commit_rewrite_snapshot(
    root: str,
    data_files: list[tuple[str, int]],
    *,
    timestamp_ms: int,
    expected_metadata_path: str | None = None,
) -> int:
    """Append a REWRITE snapshot to an EXISTING on-disk Iceberg v2 table:
    the new snapshot's live set is exactly ``data_files`` (abs path,
    record count) and carries no delete files. Older snapshots stay in the
    metadata untouched, so time travel to pre-rewrite states keeps
    working. Local (``file://``) layout only — this is the commit half of
    :func:`cloudfloe_spark.sources.maintenance.compact_iceberg_table`.

    ``expected_metadata_path`` mirrors Iceberg's rewrite conflict
    validation: the caller pins the metadata version it READ, and the
    commit aborts with :class:`CommitConflictError` if the table has moved
    on — otherwise a commit landing between read and commit would be
    silently superseded (its rows vanish from current reads).

    Returns the new snapshot id.
    """
    from cloudfloe_spark.sources import iceberg_meta as im

    if expected_metadata_path is not None:
        latest = im.latest_metadata_path(root)
        if os.path.realpath(latest) != os.path.realpath(expected_metadata_path):
            raise CommitConflictError(
                f"table {root} moved on during rewrite: read "
                f"{expected_metadata_path}, current {latest}; re-run the "
                "rewrite against the new current snapshot"
            )
    meta = im.load_metadata(root)
    snaps = meta.get("snapshots", [])
    seq = max((s.get("sequence-number", 0) for s in snaps), default=0) + 1
    # Random 63-bit id (still > 2^53, so stringified like every other id):
    # seq-derived ids would collide with a live LocalIcebergTable's private
    # counter if it commits again after this external rewrite.
    snap_id = (uuid.uuid4().int & ((1 << 62) - 1)) | (1 << 62)

    meta_dir = os.path.join(root, "metadata")
    mpath = os.path.join(meta_dir, f"manifest-rw-{uuid.uuid4().hex[:12]}.avro")
    entries = []
    for item in data_files:
        # (path, n) — unpartitioned rewrite (coalesced across partitions,
        # never pruned on partition fields) — or (path, n, pvals[,
        # spec_id]) when the compaction fanned files out per partition
        # tuple (r8): the rewritten layout then keeps pruning.
        p, n = item[0], item[1]
        pvals = item[2] if len(item) > 2 else None
        entry_spec = item[3] if len(item) > 3 else None
        if pvals is not None and entry_spec is None:
            entry_spec = meta.get("default-spec-id", 0)
        # column statistics recomputed from the rewritten file — with a
        # sort_by compaction the bounds are tight and disjoint, which is
        # what lets metrics skipping prune the compacted layout
        lower, upper, nulls = _column_stats(
            pq.read_table(p), geo_cols=_geo_stat_cols(meta)
        )
        entries.append(
            {
                "status": 1,
                "snapshot_id": snap_id,
                "sequence_number": seq,
                "data_file": {
                    "content": 0,
                    "file_path": f"file://{p}",
                    "file_format": "PARQUET",
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(p),
                    "equality_ids": None,
                    "partition": pvals,
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                    "null_value_counts": nulls,
                    "spec_id": entry_spec,
                },
            }
        )
    # v3 row lineage: a rewrite's ADDED files receive fresh id ranges and
    # the snapshot carries first-row-id, per spec — even though readers
    # prefer the materialized per-row `_row_id` column the compaction
    # wrote, a conformant external reader must see complete assignment.
    row_mark = _assign_row_ids(meta, entries)
    write_avro(mpath, _MANIFEST_SCHEMA, entries)
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-manifest-list.avro")
    write_avro(
        mlist,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": f"file://{mpath}",
                "manifest_length": os.path.getsize(mpath),
                "content": 0,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    snaps.append(
        {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": timestamp_ms,
            "manifest-list": f"file://{mlist}",
            "summary": {
                "operation": "replace",
                "total-records": str(sum(item[1] for item in data_files)),
                "total-data-files": str(len(data_files)),
                "total-delete-files": "0",
            },
        }
    )
    _stamp_row_lineage(
        snaps[-1], row_mark, int(meta.get("next-row-id") or 0)
    )
    meta["snapshots"] = snaps
    meta["current-snapshot-id"] = snap_id
    _sync_main_ref(meta, snap_id)
    meta["last-updated-ms"] = timestamp_ms
    meta.setdefault("snapshot-log", []).append(
        {"snapshot-id": snap_id, "timestamp-ms": timestamp_ms}
    )
    write_next_metadata_version(root, meta)
    return snap_id


def commit_delete_rewrite_snapshot(
    root: str,
    delete_files: list[tuple[str, int]],
    *,
    timestamp_ms: int,
    expected_metadata_path: str | None = None,
) -> int:
    """Replace the table's POSITION-DELETE file set while carrying every
    data file verbatim at its original sequence number — the commit half
    of ``maintenance.rewrite_position_deletes`` (Iceberg's
    ``rewrite_position_delete_files``). Old delete entries are recorded
    removed (status=2); the new consolidated files land at the next
    sequence, which keeps them applying to every current data file (all
    have lower-or-equal sequence) and irrelevant to later appends (their
    (path, pos) coordinates name only existing files). Equality-delete
    entries are carried untouched — their value semantics are
    sequence-sensitive and consolidation is compaction's job. The
    summary operation is ``replace``: no logical row changed, so the
    changelog readers skip it."""
    from cloudfloe_spark.sources import iceberg_meta as im

    if expected_metadata_path is not None:
        latest = im.latest_metadata_path(root)
        if os.path.realpath(latest) != os.path.realpath(expected_metadata_path):
            raise CommitConflictError(
                f"table {root} moved on during delete rewrite: read "
                f"{expected_metadata_path}, current {latest}"
            )
    meta = im.load_metadata(root)
    snaps = meta.get("snapshots", [])
    cur = im.resolve_snapshot(root)
    seq = max((s.get("sequence-number", 0) for s in snaps), default=0) + 1
    snap_id = (uuid.uuid4().int & ((1 << 62) - 1)) | (1 << 62)

    def entry(status, sequence, data_file):
        return {
            "status": status,
            "snapshot_id": None,
            "sequence_number": sequence,
            "data_file": {k: data_file.get(k) for k in _DATA_FILE_KEYS},
        }

    carry_data, carry_eq, dropped = [], [], []
    for e in im.manifest_entries(root, cur):
        if e["status"] == 2:
            continue
        c = e["data_file"].get("content", 0)
        if c == 0:
            carry_data.append(entry(0, e["sequence_number"], e["data_file"]))
        elif c == 2:
            carry_eq.append(entry(0, e["sequence_number"], e["data_file"]))
        else:
            dropped.append(entry(2, e["sequence_number"], e["data_file"]))
    new_dels = [
        entry(
            1,
            seq,
            {
                "content": 1,
                "file_path": f"file://{p}",
                "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(p),
            },
        )
        for p, n in delete_files
    ]
    meta_dir = os.path.join(root, "metadata")
    manifests = []
    for tag, content, entries in (
        ("data", 0, carry_data),
        ("del", 1, carry_eq + dropped + new_dels),
    ):
        if not entries:
            continue
        mpath = os.path.join(
            meta_dir, f"manifest-{tag}-{uuid.uuid4().hex[:12]}.avro"
        )
        write_avro(mpath, _MANIFEST_SCHEMA, entries)
        manifests.append(
            {
                "manifest_path": f"file://{mpath}",
                "manifest_length": os.path.getsize(mpath),
                "content": content,
                "added_snapshot_id": snap_id,
            }
        )
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-manifest-list.avro")
    write_avro(mlist, _MANIFEST_LIST_SCHEMA, manifests)
    snaps.append(
        {
            "snapshot-id": snap_id,
            "parent-snapshot-id": cur.get("snapshot-id"),
            "sequence-number": seq,
            "timestamp-ms": timestamp_ms,
            "manifest-list": f"file://{mlist}",
            "summary": {
                "operation": "replace",
                "total-records": str(
                    sum(
                        e["data_file"].get("record_count") or 0
                        for e in carry_data
                    )
                ),
                "total-data-files": str(len(carry_data)),
                "total-delete-files": str(len(carry_eq) + len(new_dels)),
                "removed-delete-files": str(len(dropped)),
            },
        }
    )
    # v3 row lineage: delete-file rewrites add no data rows, but every v3
    # snapshot must still carry first-row-id (assigned-rows = 0); carried
    # data entries keep their first_row_id verbatim via _DATA_FILE_KEYS.
    if meta.get("next-row-id") is not None:
        _stamp_row_lineage(
            snaps[-1],
            int(meta["next-row-id"]),
            int(meta["next-row-id"]),
        )
    meta["snapshots"] = snaps
    meta["current-snapshot-id"] = snap_id
    _sync_main_ref(meta, snap_id)
    meta.setdefault("snapshot-log", []).append(
        {"snapshot-id": snap_id, "timestamp-ms": timestamp_ms}
    )
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(root, meta)
    return snap_id


def commit_manifest_rewrite_snapshot(
    root: str,
    *,
    timestamp_ms: int,
    expected_metadata_path: str | None = None,
    patch_bounds: "dict | None" = None,
) -> dict:
    """Iceberg's ``rewrite_manifests`` (r9): consolidate the current
    snapshot's manifest FILES without touching a single data or delete
    file. Manifest-reuse commits (r8) write O(new files) per commit — the
    right trade per write — but a long DML chain then accumulates one
    small delta manifest per commit, and every read pays O(#manifests)
    avro opens at planning time. This commit carries every LIVE entry
    verbatim at its original sequence number into exactly one data
    manifest (+ one delete manifest when delete files exist); dead
    (status=2) entries vanish. The live file sets are IDENTICAL before
    and after, so time travel, changelog ranges (``iceberg_cdc`` checks
    live-set containment, unchanged) and delete application semantics
    (sequence numbers preserved) all survive. Summary operation is
    ``replace``: no logical row changed, changelog readers skip it.

    Driver-side metadata work only, O(total manifest entries); returns
    ``{"snapshot_id", "manifests_before", "manifests_after",
    "entries"}``."""
    from cloudfloe_spark.sources import iceberg_meta as im

    if expected_metadata_path is not None:
        latest = im.latest_metadata_path(root)
        if os.path.realpath(latest) != os.path.realpath(
            expected_metadata_path
        ):
            raise CommitConflictError(
                f"table {root} moved on during manifest rewrite: read "
                f"{expected_metadata_path}, current {latest}"
            )
    meta = im.load_metadata(root)
    snaps = meta.get("snapshots", [])
    cur = im.resolve_snapshot(root)
    root_n = im._norm_root(root)
    n_before = len(
        list(im._read_manifest(im._relocate(cur["manifest-list"], root_n)))
    )
    seq = max((s.get("sequence-number", 0) for s in snaps), default=0) + 1
    snap_id = (uuid.uuid4().int & ((1 << 62) - 1)) | (1 << 62)

    data_entries, delete_entries = [], []
    # ``patch_bounds`` (r14, geo file stats): ``{file_suffix: (lower,
    # upper)}`` dicts of per-column bound strings merged into the
    # carried entries' lower/upper maps — how compute_geo_bounds stamps
    # geometry envelopes (the v3 spec stores these as WKB points; this
    # fixture's manifests use its name-keyed stringified stand-in, like
    # every other bound it records). Live file sets stay identical.
    def _pb_key(p: str) -> str:
        return im.data_file_suffix(p)

    for e in im.manifest_entries(root, cur):
        if e["status"] == 2:
            continue  # dead entries are dropped, not carried
        df_rec = {k: e["data_file"].get(k) for k in _DATA_FILE_KEYS}
        pb = (patch_bounds or {}).get(_pb_key(df_rec["file_path"]))
        if pb is not None and df_rec.get("content", 0) == 0:
            lo, hi = pb
            df_rec["lower_bounds"] = {
                **(df_rec.get("lower_bounds") or {}), **lo
            }
            df_rec["upper_bounds"] = {
                **(df_rec.get("upper_bounds") or {}), **hi
            }
        rec = {
            "status": 0,
            "snapshot_id": None,
            "sequence_number": e["sequence_number"],
            "data_file": df_rec,
        }
        if df_rec.get("content", 0) == 0:
            data_entries.append(rec)
        else:
            delete_entries.append(rec)

    meta_dir = os.path.join(root, "metadata")
    manifests = []
    for tag, content, entries in (
        ("data", 0, data_entries),
        ("del", 1, delete_entries),
    ):
        if not entries:
            continue
        mpath = os.path.join(
            meta_dir, f"manifest-{tag}-{uuid.uuid4().hex[:12]}.avro"
        )
        write_avro(mpath, _MANIFEST_SCHEMA, entries)
        manifests.append(
            {
                "manifest_path": f"file://{mpath}",
                "manifest_length": os.path.getsize(mpath),
                "content": content,
                "added_snapshot_id": snap_id,
            }
        )
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-manifest-list.avro")
    write_avro(mlist, _MANIFEST_LIST_SCHEMA, manifests)
    snaps.append(
        {
            "snapshot-id": snap_id,
            "parent-snapshot-id": cur.get("snapshot-id"),
            "sequence-number": seq,
            "timestamp-ms": timestamp_ms,
            "manifest-list": f"file://{mlist}",
            "summary": {
                "operation": "replace",
                "total-data-files": str(len(data_entries)),
                "total-delete-files": str(len(delete_entries)),
                "manifests-replaced": str(n_before),
                "manifests-created": str(len(manifests)),
            },
        }
    )
    # v3 row lineage: no data file added — stamp first-row-id with zero
    # assigned rows; carried entries keep first_row_id via _DATA_FILE_KEYS.
    if meta.get("next-row-id") is not None:
        _stamp_row_lineage(
            snaps[-1],
            int(meta["next-row-id"]),
            int(meta["next-row-id"]),
        )
    meta["snapshots"] = snaps
    meta["current-snapshot-id"] = snap_id
    _sync_main_ref(meta, snap_id)
    meta.setdefault("snapshot-log", []).append(
        {"snapshot-id": snap_id, "timestamp-ms": timestamp_ms}
    )
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(root, meta)
    return {
        "snapshot_id": snap_id,
        "manifests_before": n_before,
        "manifests_after": len(manifests),
        "entries": len(data_entries) + len(delete_entries),
    }


def rename_column_on_disk(
    root: str, old: str, new: str, *, timestamp_ms: int
) -> None:
    """``ALTER TABLE RENAME COLUMN`` on an EXISTING on-disk table — an
    EXTERNAL commit like :func:`commit_row_delta_snapshot` (do not mix
    with further commits through a live ``LocalIcebergTable`` instance,
    whose in-memory state would clobber this). Appends a renamed copy of
    the current schema to the metadata schema log (field ids stable, per
    Iceberg rename semantics) and points ``current-schema-id`` at it —
    metadata-only, no snapshot, already-written files keep their old
    parquet column names. Partition specs are untouched: they reference
    source FIELD IDS, which a rename never changes."""
    from cloudfloe_spark.sources import iceberg_meta as im

    meta_path = im.latest_metadata_path(root).removeprefix("file://")
    with open(meta_path) as f:
        meta = json.load(f)
    schemas = meta.get("schemas") or (
        [meta["schema"]] if meta.get("schema") else []
    )
    if not schemas:
        raise ValueError("table metadata carries no schema")
    cur_id = meta.get("current-schema-id", 0)
    cur = next(
        (s for s in schemas if s.get("schema-id") == cur_id), schemas[-1]
    )
    names = [f.get("name") for f in cur.get("fields", [])]
    if old not in names:
        raise KeyError(f"no column {old!r} to rename")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    next_id = max(s.get("schema-id", 0) for s in schemas) + 1
    renamed = {
        "type": "struct",
        "schema-id": next_id,
        "fields": [
            {**f, "name": new if f.get("name") == old else f.get("name")}
            for f in cur.get("fields", [])
        ],
    }
    meta["schemas"] = schemas + [renamed]
    meta["current-schema-id"] = next_id
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(root, meta)


def write_next_metadata_version(root: str, meta: dict) -> str:
    """Write ``meta`` as the next numeric metadata version and point
    ``version-hint.text`` at it when the table has one — the hint is
    authoritative for HadoopCatalog-style tables (honored by
    ``iceberg_meta.latest_metadata_path``), so leaving it stale would make
    every subsequent read resolve the PREVIOUS version and un-commit the
    change.

    REST-bound roots (r10, VERDICT r9 #4): when the table was bound to a
    REST catalog via ``rest_catalog.bind_rest_table``, this — the shared
    commit point of every write op — routes through the catalog's POST
    commit protocol instead of writing locally: the catalog validates the
    ``assert-ref-snapshot-id`` CAS, materializes the new metadata
    version, and its 409 surfaces as :class:`CommitConflictError`, which
    the maintenance layer's optimistic retry handles exactly like a local
    conflict."""
    from cloudfloe_spark.sources import rest_catalog as _rc

    binding = _rc.binding_for(root)
    if binding is not None:
        return _rc.commit_table_metadata(binding, root, meta)
    meta_dir = os.path.join(root, "metadata")
    versions = [
        m.group(1)
        for f in os.listdir(meta_dir)
        if f.endswith(".metadata.json")
        and (m := re.match(r"v?(\d+)", f)) is not None
    ]
    version = max((int(v) for v in versions), default=0) + 1
    path = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(path, "w") as f:
        json.dump(meta, f)
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint, "w") as f:
            f.write(str(version))
    return path


_DATA_FILE_KEYS = (
    "content",
    "file_path",
    "file_format",
    "record_count",
    "file_size_in_bytes",
    "equality_ids",
    "partition",
    "lower_bounds",
    "upper_bounds",
    "null_value_counts",
    "spec_id",
    # v3 deletion-vector reference (null on v2 entries)
    "referenced_data_file",
    "content_offset",
    "content_size_in_bytes",
    # v3 row lineage (null on non-lineage tables / rewritten files)
    "first_row_id",
)


def commit_delete_snapshot(
    root: str,
    delete_files: list[tuple[str, int]],
    *,
    timestamp_ms: int,
    expected_metadata_path: str | None = None,
    parent_ref: str | None = None,
) -> int:
    """DELETE-only row delta — see :func:`commit_row_delta_snapshot`."""
    return commit_row_delta_snapshot(
        root,
        delete_files=delete_files,
        timestamp_ms=timestamp_ms,
        expected_metadata_path=expected_metadata_path,
        parent_ref=parent_ref,
    )


def _reusable_parent_manifests(root: str, cur: dict):
    """Manifest-list records of ``cur`` that a pure row-delta commit can
    reference VERBATIM (Iceberg's own append model: new snapshots add a
    small manifest and reuse the parent's, instead of rewriting the full
    live set — at 1M files that turns each commit's metadata write from
    O(table) to O(new files)). Returns None when reuse would be unsound:
    any raw entry missing an explicit data sequence number (inheritance
    would re-stamp it at the NEW snapshot's sequence, breaking
    equality-delete ordering) or carrying status=2 (a removal recorded
    by an ancestor must not replay in later manifests)."""
    from cloudfloe_spark.sources import iceberg_meta as im

    mlist_uri = cur.get("manifest-list")
    if not mlist_uri:
        return None
    root_n = im._norm_root(root)
    records = []
    try:
        for m in im._read_manifest(im._relocate(mlist_uri, root_n)):
            for e in im._read_manifest(
                im._relocate(m["manifest_path"], root_n)
            ):
                if e.get("sequence_number") is None:
                    return None
                if e.get("status", 0) == 2:
                    return None
            records.append(
                {
                    "manifest_path": m["manifest_path"],
                    "manifest_length": m["manifest_length"],
                    "content": m.get("content", 0),
                    "added_snapshot_id": m.get("added_snapshot_id"),
                }
            )
    except (OSError, KeyError, im.IcebergMetadataError):
        return None
    return records


def commit_row_delta_snapshot(
    root: str,
    *,
    new_data_files: list[tuple[str, int]] = (),
    delete_files: list[tuple[str, int]] = (),
    equality_delete_files: "list[tuple[str, int, list[int]]]" = (),
    removed_data_files: "list[str]" = (),
    timestamp_ms: int,
    expected_metadata_path: str | None = None,
    summary_extra: "dict[str, str] | None" = None,
    publish: bool = True,
    ref: str | None = None,
    parent_ref: str | None = None,
) -> int:
    """Append a ROW-DELTA snapshot to an EXISTING on-disk Iceberg v2
    table: the current snapshot's live entries are carried over verbatim
    (data files keep their original data sequence numbers —
    equality-delete ordering must not shift), ``new_data_files`` parquet
    files ``(abs path, record count)`` are added as content=0 entries at
    the new sequence (with column statistics computed from the file, so
    metrics-based skipping keeps working on appended/updated rows), and
    ``delete_files`` position-delete parquet files are added as content=1
    entries in a SEPARATE content=1 delete manifest (the spec's layout;
    ``iceberg_metadata()`` then reports manifest_content='DELETE', which
    is exactly what the reference's probe aggregates for hasDeletes).
    Older snapshots stay untouched, so time travel keeps working.

    Deletes-only is a DELETE operation (``maintenance.delete_where``);
    deletes + new data is the UPDATE/upsert shape
    (``maintenance.update_where``) — the spec's "overwrite" summary. Like
    :func:`commit_rewrite_snapshot` this is an EXTERNAL commit — do not
    mix with further commits through a live LocalIcebergTable instance.

    ``removed_data_files`` (r8, the copy-on-write shape): live data files
    whose rows this commit REWRITES — they are dropped from the carried
    set and recorded as status=2 (DELETED) entries, exactly how the spec
    expresses a partial rewrite. Matched by their path under ``data/``
    (the same key the position-delete anti-join uses), so relocated
    tables behave; a path matching no carried live data file raises
    (caller bug — silently ignoring it would commit a wrong live set).

    ``parent_ref`` (r7, branch-targeted writes): commit ON a branch — the
    carried-over live entries come from the BRANCH HEAD snapshot instead
    of the table's current one, the new snapshot records that head as its
    ``parent-snapshot-id``, and only the branch ref advances
    (``publish`` defaults off in this mode; main's current snapshot and
    snapshot-log stay untouched until :func:`publish_ref` fast-forwards).
    Tags are immutable per the Iceberg spec — a ``parent_ref``/``ref``
    naming an existing tag errors.
    """
    from cloudfloe_spark.sources import iceberg_meta as im

    if parent_ref is not None:
        if ref is not None and ref != parent_ref:
            raise ValueError(
                "commit_row_delta_snapshot: parent_ref and ref must match "
                f"when both given (got {parent_ref!r} vs {ref!r}) — a "
                "branch commit advances the branch it reads from"
            )
        ref = parent_ref
        publish = False
    if not publish and ref is None:
        raise ValueError(
            "commit_row_delta_snapshot: publish=False requires a ref name "
            "— an unpublished snapshot with no ref would be unreachable"
        )
    if expected_metadata_path is not None:
        latest = im.latest_metadata_path(root)
        if os.path.realpath(latest) != os.path.realpath(expected_metadata_path):
            raise CommitConflictError(
                f"table {root} moved on during row delta: read "
                f"{expected_metadata_path}, current {latest}; re-run "
                "against the new current snapshot"
            )
    meta = im.load_metadata(root)
    snaps = meta.get("snapshots", [])
    existing_ref = (meta.get("refs") or {}).get(ref) if ref else None
    if existing_ref is not None and existing_ref.get("type") == "tag":
        raise ValueError(
            f"commit_row_delta_snapshot: ref {ref!r} is a tag — tags are "
            "immutable; create a branch to write to"
        )
    if parent_ref is not None:
        if existing_ref is None:
            raise ValueError(
                f"commit_row_delta_snapshot: parent_ref {parent_ref!r} "
                f"not found (known refs: "
                f"{sorted(meta.get('refs') or {})}) — create the branch "
                "with set_ref(..., ref_type='branch') first"
            )
        cur = im.resolve_snapshot(root, version=int(existing_ref["snapshot-id"]))
    else:
        try:
            cur = im.resolve_snapshot(root)
        except im.IcebergMetadataError:
            # created-but-empty table (no snapshot yet): the delta is
            # the table's FIRST snapshot — nothing to carry
            cur = None
    carried = (
        [e for e in im.manifest_entries(root, cur) if e["status"] != 2]
        if cur is not None
        else []
    )
    seq = max((s.get("sequence-number", 0) for s in snaps), default=0) + 1
    snap_id = (uuid.uuid4().int & ((1 << 62) - 1)) | (1 << 62)

    def entry(status, sequence, data_file):
        return {
            "status": status,
            "snapshot_id": None,
            "sequence_number": sequence,
            "data_file": {k: data_file.get(k) for k in _DATA_FILE_KEYS},
        }

    def _data_key(p: str) -> str:
        return p.rsplit("/data/", 1)[-1]

    removed_keys = {_data_key(p) for p in removed_data_files}
    carry_data = []
    removed_entries = []
    for e in carried:
        if e["data_file"].get("content", 0) != 0:
            continue
        if removed_keys and _data_key(e["data_file"]["file_path"]) in removed_keys:
            removed_entries.append(entry(2, e["sequence_number"], e["data_file"]))
            removed_keys.discard(_data_key(e["data_file"]["file_path"]))
        else:
            carry_data.append(entry(0, e["sequence_number"], e["data_file"]))
    if removed_keys:
        raise ValueError(
            "commit_row_delta_snapshot: removed_data_files name no live "
            f"data file: {sorted(removed_keys)}"
        )
    # With removals (copy-on-write), carried POSITION-delete files whose
    # footer-recorded targets are all among the removed files dangle —
    # they can never match a live row again — so they are dropped
    # (status=2) in the same commit, keeping pure-COW tables
    # delete-file-free without waiting for compaction. Footer reads are
    # per-immutable-file cached; an unreadable footer keeps the file
    # (sound). Equality deletes name VALUES, not files — always carried.
    live_keys = (
        {_data_key(e["data_file"]["file_path"]) for e in carry_data}
        if removed_entries
        else set()
    )
    carry_dels = []
    dropped_dels = []
    for e in carried:
        df_ = e["data_file"]
        if df_.get("content", 0) == 0:
            continue
        if removed_entries and df_.get("content", 0) == 1:
            from cloudfloe_spark.sources.iceberg_meta import (
                position_delete_targets_cached,
            )

            local = df_["file_path"]
            if local.startswith("file://"):
                local = local[7:]
            try:
                tgts = position_delete_targets_cached(local)
            except Exception:
                tgts = None
            if tgts is not None and not (tgts & live_keys):
                dropped_dels.append(
                    entry(2, e["sequence_number"], df_)
                )
                continue
        carry_dels.append(entry(0, e["sequence_number"], df_))
    new_dels = [
        entry(
            1,
            seq,
            {
                "content": 1,
                "file_path": f"file://{p}",
                "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(p),
            },
        )
        for p, n in delete_files
    ]
    new_dels += [
        entry(
            1,
            seq,
            {
                "content": 2,
                "file_path": f"file://{p}",
                "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(p),
                "equality_ids": list(eq_ids),
            },
        )
        for p, n, eq_ids in equality_delete_files
    ]
    new_data = []
    for item in new_data_files:
        # (path, n) — unpartitioned entry — or (path, n, pvals[, spec_id])
        # for PARTITION-AWARE writes (r8): DML/apply paths that fan their
        # new files out per partition tuple stamp the tuple + spec id so
        # partition pruning keeps working on post-DML rows.
        p, n = item[0], item[1]
        pvals = item[2] if len(item) > 2 else None
        entry_spec = item[3] if len(item) > 3 else None
        if pvals is not None and entry_spec is None:
            entry_spec = meta.get("default-spec-id", 0)
        lower, upper, nulls = _column_stats(
            pq.read_table(p), geo_cols=_geo_stat_cols(meta)
        )
        new_data.append(
            entry(
                1,
                seq,
                {
                    "content": 0,
                    "file_path": f"file://{p}",
                    "file_format": "PARQUET",
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(p),
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                    "null_value_counts": nulls,
                    "partition": pvals,
                    "spec_id": entry_spec,
                },
            )
        )
    row_mark = _assign_row_ids(meta, new_data)

    meta_dir = os.path.join(root, "metadata")
    manifests = []
    # Pure row-delta (nothing removed): REUSE the parent's manifests in
    # the new manifest list and write only the new entries — the commit's
    # metadata write is then O(new files), not O(table files). Removals
    # (copy-on-write) and unsound parents fall back to the full rewrite.
    reused = (
        _reusable_parent_manifests(root, cur)
        if not removed_data_files and cur is not None
        else None
    )
    if reused is not None:
        manifests.extend(reused)
        groups = (("data", 0, new_data), ("del", 1, new_dels))
    else:
        groups = (
            ("data", 0, carry_data + removed_entries + new_data),
            ("del", 1, carry_dels + dropped_dels + new_dels),
        )
    for tag, content, entries in groups:
        if not entries:
            continue
        mpath = os.path.join(
            meta_dir, f"manifest-{tag}-{uuid.uuid4().hex[:12]}.avro"
        )
        write_avro(mpath, _MANIFEST_SCHEMA, entries)
        manifests.append(
            {
                "manifest_path": f"file://{mpath}",
                "manifest_length": os.path.getsize(mpath),
                "content": content,
                "added_snapshot_id": snap_id,
            }
        )
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-manifest-list.avro")
    write_avro(mlist, _MANIFEST_LIST_SCHEMA, manifests)
    snaps.append(
        {
            "snapshot-id": snap_id,
            "parent-snapshot-id": (cur.get("snapshot-id") if cur is not None else None),
            "sequence-number": seq,
            "timestamp-ms": timestamp_ms,
            "manifest-list": f"file://{mlist}",
            "summary": {
                "operation": (
                    "delete"
                    if not new_data
                    else (
                        "overwrite"
                        if (new_dels or removed_entries)
                        else "append"
                    )
                ),
                **(
                    {"deleted-data-files": str(len(removed_entries))}
                    if removed_entries
                    else {}
                ),
                "total-records": str(
                    sum(
                        e["data_file"].get("record_count") or 0
                        for e in carry_data + new_data
                    )
                ),
                "total-data-files": str(len(carry_data) + len(new_data)),
                "total-delete-files": str(len(carry_dels) + len(new_dels)),
                **(summary_extra or {}),
            },
        }
    )
    _stamp_row_lineage(snaps[-1], row_mark, int(meta.get("next-row-id") or 0))
    meta["snapshots"] = snaps
    if ref is not None:
        # merge: spec-optional retention fields survive staged commits
        refs_ = meta.setdefault("refs", {})
        refs_[ref] = {
            **(refs_.get(ref) or {}),
            "snapshot-id": snap_id,
            "type": "branch",
        }
    if publish:
        meta["current-snapshot-id"] = snap_id
        _sync_main_ref(meta, snap_id)
        meta.setdefault("snapshot-log", []).append(
            {"snapshot-id": snap_id, "timestamp-ms": timestamp_ms}
        )
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(root, meta)
    return snap_id


def commit_deletion_vector_snapshot(
    root: str,
    deletes: "dict[str, list[int]]",
    *,
    new_data_files: "list[tuple] | tuple" = (),
    timestamp_ms: int,
    expected_metadata_path: str | None = None,
    summary_extra: "dict[str, str] | None" = None,
    drop_position_deletes: bool = False,
    parent_ref: str | None = None,
) -> int:
    """Commit Iceberg v3 DELETION VECTORS (r10 stretch, VERDICT r9 #8):
    ``deletes`` maps live data-file paths (absolute or table-relative
    suffix) to deleted row positions. Writes ONE Puffin file holding a
    ``deletion-vector-v1`` blob per data file and a DELETE snapshot whose
    content=1 entries reference the blobs via ``referenced_data_file`` /
    ``content_offset`` / ``content_size_in_bytes`` — the v3 layout. The
    table's ``format-version`` advances to 3 (DVs are a v3 feature;
    readers below v3 must reject, which this repo's reader did before
    this round).

    The v3 invariant "at most ONE deletion vector per data file" is kept:
    an existing DV for a targeted file is superseded — its positions are
    MERGED into the new vector and the old entry is dropped in the same
    commit. v2 position-delete parquet entries are carried untouched
    (the spec allows mixed tables mid-migration; the reader applies
    both).

    ``new_data_files`` (r10): parquet files ``(path, n[, pvals[,
    spec_id]])`` added as content=0 entries at the commit's sequence —
    the v3 UPDATE/MERGE row-delta shape (DVs retract the old rows, the
    rewritten/inserted rows land at the higher sequence in the same
    atomic commit). The summary becomes ``overwrite``.

    ``drop_position_deletes`` (r10, the v2→v3 MIGRATION switch): carried
    v2 position-delete PARQUET entries are recorded removed in the same
    commit — callers must have folded their coordinates into ``deletes``
    first (``maintenance.migrate_position_deletes_to_dvs`` does), or
    deleted rows would resurrect. Equality deletes are always carried
    (v3 keeps them).

    ``parent_ref`` (r14, VERDICT r13 #3 — branch-targeted v3 DML /
    write-audit-publish): commit ON a branch — the parent and the
    carried live set are the BRANCH head, the branch ref advances to
    the new snapshot, and main's current snapshot and snapshot-log stay
    untouched until :func:`publish_ref` fast-forwards. Tags refuse (the
    spec makes them immutable)."""
    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources import puffin

    if expected_metadata_path is not None:
        latest = im.latest_metadata_path(root)
        if os.path.realpath(latest) != os.path.realpath(
            expected_metadata_path
        ):
            raise CommitConflictError(
                f"table {root} moved on during deletion-vector commit"
            )
    if not deletes:
        raise ValueError("commit_deletion_vector_snapshot: empty deletes")
    meta = im.load_metadata(root)
    snaps = meta.get("snapshots", [])
    if parent_ref is not None:
        r_ = (meta.get("refs") or {}).get(parent_ref)
        if r_ is None:
            raise ValueError(
                f"commit_deletion_vector_snapshot: parent_ref "
                f"{parent_ref!r} not found (known refs: "
                f"{sorted(meta.get('refs') or {})}) — create the branch "
                "with set_ref(..., ref_type='branch') first"
            )
        if r_.get("type") == "tag":
            raise ValueError(
                f"commit_deletion_vector_snapshot: ref {parent_ref!r} is "
                "a tag — tags are immutable; create a branch to write to"
            )
        cur = im.resolve_snapshot(root, version=int(r_["snapshot-id"]))
    else:
        cur = im.resolve_snapshot(root)
    carried = [
        e for e in im.manifest_entries(root, cur) if e["status"] != 2
    ]
    seq = max((s.get("sequence-number", 0) for s in snaps), default=0) + 1
    snap_id = (uuid.uuid4().int & ((1 << 62) - 1)) | (1 << 62)

    def _suffix(p: str) -> str:
        return p.rsplit("/data/", 1)[-1]

    live = {
        _suffix(e["data_file"]["file_path"]): e["data_file"]["file_path"]
        for e in carried
        if e["data_file"].get("content", 0) == 0
    }
    # resolve targets to the MANIFEST-recorded path (what the reader's
    # anti-join matches on) and validate they are live
    merged: dict[str, set] = {}
    for p, positions in deletes.items():
        key = _suffix(p)
        if key not in live:
            raise ValueError(
                f"commit_deletion_vector_snapshot: {p!r} names no live "
                "data file"
            )
        merged.setdefault(live[key], set()).update(
            int(x) for x in positions
        )

    def entry(status, sequence, data_file):
        return {
            "status": status,
            "snapshot_id": None,
            "sequence_number": sequence,
            "data_file": {k: data_file.get(k) for k in _DATA_FILE_KEYS},
        }

    # Conformance boundary (r11, VERDICT r10 #6): committing DVs onto a
    # v3 table whose vectors THIS engine did not write would mix our
    # blobs with containers of unproven parseability. The reader is now
    # spec-proven against independently-derived byte vectors
    # (tests/test_puffin_spec_vectors.py — run containers, bitmap
    # containers, multi-bucket keys), so instead of refusing outright we
    # VALIDATE once: on the first DV commit onto an unstamped table,
    # fully decode every live foreign vector (CRC + structure) and fail
    # with the offending blob named if any is unreadable — then stamp
    # ``cloudfloe.dv-writer`` so later commits skip the sweep. Cost is
    # one delete-set-sized driver pass, paid once per foreign table.
    _DV_WRITER_PROP = "cloudfloe.dv-writer"
    props = meta.get("properties") or {}
    if (
        int(meta.get("format-version") or 1) >= 3
        and _DV_WRITER_PROP not in props
    ):
        for e in carried:
            df_ = e["data_file"]
            if (
                df_.get("content", 0) != 1
                or df_.get("referenced_data_file") is None
                or df_["referenced_data_file"] in merged
            ):
                continue  # merged targets are decoded by the supersede path
            try:
                puffin.read_deletion_vector(
                    im._relocate(df_["file_path"], im._norm_root(root)),
                    int(df_["content_offset"]),
                    int(df_["content_size_in_bytes"]),
                )
            except (OSError, puffin.PuffinError) as e2:
                raise ValueError(
                    "commit_deletion_vector_snapshot: this v3 table's "
                    "existing deletion vectors were written by another "
                    f"engine and the one for "
                    f"{df_['referenced_data_file']!r} (in "
                    f"{df_['file_path']!r}) does not decode: {e2}. "
                    "Refusing to commit alongside unreadable vectors — "
                    "repair or re-migrate the table first"
                ) from None

    # carry everything, superseding old DVs of the targeted files
    carry = []
    superseded = []
    for e in carried:
        df_ = e["data_file"]
        if (
            drop_position_deletes
            and df_.get("content", 0) == 1
            and df_.get("referenced_data_file") is None
            and str(df_.get("file_format") or "").upper() != "PUFFIN"
        ):
            # v2 position-delete parquet being MIGRATED into the new DVs
            superseded.append(entry(2, e["sequence_number"], df_))
            continue
        if (
            df_.get("content", 0) == 1
            and df_.get("referenced_data_file") in merged
        ):
            try:
                old = puffin.read_deletion_vector(
                    im._relocate(df_["file_path"], im._norm_root(root)),
                    int(df_["content_offset"]),
                    int(df_["content_size_in_bytes"]),
                )
            except (OSError, puffin.PuffinError) as e2:
                raise ValueError(
                    f"cannot merge existing deletion vector: {e2}"
                ) from None
            merged[df_["referenced_data_file"]].update(old)
            superseded.append(entry(2, e["sequence_number"], df_))
            continue
        carry.append(entry(0, e["sequence_number"], df_))

    meta_dir = os.path.join(root, "metadata")
    pf = os.path.join(
        root, "data", f"dv-{timestamp_ms}-{uuid.uuid4().hex[:8]}.puffin"
    )
    refs = puffin.write_puffin_dvs(
        pf,
        {k: sorted(v) for k, v in merged.items()},
        snapshot_id=snap_id,
        sequence_number=seq,
    )
    new_entries = [
        entry(
            1,
            seq,
            {
                "content": 1,
                "file_path": f"file://{pf}",
                "file_format": "PUFFIN",
                "record_count": m["cardinality"],
                "file_size_in_bytes": os.path.getsize(pf),
                "referenced_data_file": ref,
                "content_offset": m["offset"],
                "content_size_in_bytes": m["length"],
            },
        )
        for ref, m in sorted(refs.items())
    ]
    new_data = []
    for item in new_data_files:
        p, n = item[0], item[1]
        pvals = item[2] if len(item) > 2 else None
        entry_spec = item[3] if len(item) > 3 else None
        if pvals is not None and entry_spec is None:
            entry_spec = meta.get("default-spec-id", 0)
        lower, upper, nulls = _column_stats(
            pq.read_table(p), geo_cols=_geo_stat_cols(meta)
        )
        new_data.append(
            entry(
                1,
                seq,
                {
                    "content": 0,
                    "file_path": f"file://{p}",
                    "file_format": "PARQUET",
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(p),
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                    "null_value_counts": nulls,
                    "partition": pvals,
                    "spec_id": entry_spec,
                },
            )
        )
    row_mark = _assign_row_ids(meta, new_data)
    mpath = os.path.join(
        meta_dir, f"manifest-dv-{uuid.uuid4().hex[:12]}.avro"
    )
    write_avro(
        mpath, _MANIFEST_SCHEMA, carry + superseded + new_entries + new_data
    )
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-manifest-list.avro")
    write_avro(
        mlist,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": f"file://{mpath}",
                "manifest_length": os.path.getsize(mpath),
                "content": 0,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    snaps.append(
        {
            "snapshot-id": snap_id,
            "parent-snapshot-id": cur.get("snapshot-id"),
            "sequence-number": seq,
            "timestamp-ms": timestamp_ms,
            "manifest-list": f"file://{mlist}",
            "summary": {
                "operation": "overwrite" if new_data else "delete",
                "added-dvs": str(len(new_entries)),
                "total-data-files": str(
                    sum(
                        1
                        for e in carry
                        if e["data_file"].get("content", 0) == 0
                    )
                    + len(new_data)
                ),
                **(summary_extra or {}),
            },
        }
    )
    _stamp_row_lineage(snaps[-1], row_mark, int(meta.get("next-row-id") or 0))
    meta["snapshots"] = snaps
    if parent_ref is not None:
        # staged on the branch only (WAP); publish_ref fast-forwards.
        # Merge, don't overwrite: spec-optional retention fields
        # (max-ref-age-ms, min-snapshots-to-keep, ...) must survive
        refs_ = meta.setdefault("refs", {})
        refs_[parent_ref] = {
            **(refs_.get(parent_ref) or {}),
            "snapshot-id": snap_id,
            "type": "branch",
        }
    else:
        meta["current-snapshot-id"] = snap_id
        _sync_main_ref(meta, snap_id)
        meta.setdefault("snapshot-log", []).append(
            {"snapshot-id": snap_id, "timestamp-ms": timestamp_ms}
        )
    meta["format-version"] = 3
    # provenance stamp: this engine wrote (or validated) every live DV
    meta.setdefault("properties", {})[_DV_WRITER_PROP] = "cloudfloe-spark"
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(root, meta)
    return snap_id


def set_ref(
    root: str,
    name: str,
    snapshot_id: int,
    *,
    ref_type: str = "tag",
    timestamp_ms: int,
) -> None:
    """Create/update a named ref (``tag`` or ``branch``) pointing at an
    existing snapshot — the Iceberg v2 ``refs`` metadata map. Readers
    resolve it via ``VERSION AS OF '<name>'``. Metadata-only: publishes a
    new metadata version, moves nothing else."""
    from cloudfloe_spark.sources import iceberg_meta as im

    meta = im.load_metadata(root)
    known = {s.get("snapshot-id") for s in meta.get("snapshots", [])}
    if snapshot_id not in known:
        raise ValueError(
            f"set_ref: snapshot {snapshot_id} not in table (known: "
            f"{sorted(known)})"
        )
    if ref_type not in ("tag", "branch"):
        raise ValueError(f"set_ref: ref_type must be tag|branch, got {ref_type!r}")
    meta.setdefault("refs", {})[name] = {
        "snapshot-id": snapshot_id,
        "type": ref_type,
    }
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(root, meta)


def append_to_branch(
    root: str,
    branch: str,
    new_data_files: list[tuple[str, int]],
    *,
    timestamp_ms: int,
    expected_metadata_path: str | None = None,
) -> int:
    """Append data files to a named BRANCH (r7): the commit's parent is
    the branch head (not main's current snapshot), and only the branch
    ref advances — main is untouched until :func:`publish_ref`
    fast-forwards it. Completes the refs lifecycle: ``set_ref(...,
    ref_type='branch')`` → append_to_branch (repeatable) → audit via
    ``VERSION AS OF '<branch>'`` → ``publish_ref`` — or ``drop_ref`` to
    abandon (expiry then reclaims the branch-only snapshots).

    Mirrors Spark/Iceberg's ``df.writeTo(t).option('branch', b).append()``
    / ``spark.wap.branch`` semantics. Tags are immutable — appending to a
    tag errors."""
    return commit_row_delta_snapshot(
        root,
        new_data_files=new_data_files,
        timestamp_ms=timestamp_ms,
        expected_metadata_path=expected_metadata_path,
        parent_ref=branch,
    )


def publish_ref(root: str, name: str, *, timestamp_ms: int) -> int:
    """Write-audit-publish, the publish half: fast-forward the CURRENT
    snapshot to the ref's target. Stage with
    ``commit_row_delta_snapshot(..., publish=False, ref=name)``, audit the
    staged state through ``VERSION AS OF '<name>'`` queries, then publish —
    or simply never publish a failed audit (the staged snapshot stays
    reachable only via its ref and expires on the normal schedule).

    Fast-forward only (matching Iceberg's ``fast_forward`` procedure):
    when parent lineage is recorded (r7+ snapshots carry
    ``parent-snapshot-id``), the current snapshot must be an ancestor of
    the ref target — publishing a ref whose history has diverged from
    main would silently drop main's commits, so it errors instead.
    Pre-lineage snapshots (no parent recorded anywhere on the walk) keep
    the old lenient behavior."""
    from cloudfloe_spark.sources import iceberg_meta as im

    meta = im.load_metadata(root)
    sid = im.resolve_ref(root, name)
    current = meta.get("current-snapshot-id")
    if current is not None and current != sid:
        by_id = {s.get("snapshot-id"): s for s in meta.get("snapshots", [])}
        walk, lineage_known = sid, False
        while walk is not None:
            if walk == current:
                break
            parent = (by_id.get(walk) or {}).get("parent-snapshot-id")
            if parent is not None:
                lineage_known = True
            walk = parent
        if walk is None and lineage_known:
            raise ValueError(
                f"publish_ref: ref {name!r} (snapshot {sid}) does not "
                f"descend from the current snapshot {current} — not a "
                "fast-forward; rebase the branch (re-stage its changes on "
                "the current snapshot) instead of publishing"
            )
    meta["current-snapshot-id"] = sid
    _sync_main_ref(meta, sid)
    meta["last-updated-ms"] = timestamp_ms
    meta.setdefault("snapshot-log", []).append(
        {"snapshot-id": sid, "timestamp-ms": timestamp_ms}
    )
    write_next_metadata_version(root, meta)
    return sid


def drop_ref(root: str, name: str, *, timestamp_ms: int) -> None:
    """Remove a named ref. The snapshot it pointed at stays until normal
    expiry — dropping the ref is what ALLOWS it to expire (expiry retains
    ref-reachable snapshots)."""
    from cloudfloe_spark.sources import iceberg_meta as im

    meta = im.load_metadata(root)
    refs = meta.get("refs") or {}
    if name not in refs:
        raise ValueError(f"drop_ref: unknown ref {name!r} (known: {sorted(refs)})")
    del refs[name]
    meta["refs"] = refs
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(root, meta)
