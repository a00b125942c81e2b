"""Parquet/Iceberg VARIANT binary codec (r12, VERDICT r11 #1).

Implements the PUBLIC Parquet variant binary encoding (the format
Iceberg v3 adopts for its ``variant`` type, and the same binary layout
Spark 4's ``VariantType`` uses — see the r11 scoping spike in
COVERAGE.md, "Variant (v3)"):

- **metadata**: one header byte (``version=1`` in bits 0-3,
  ``sorted_strings`` in bit 4, ``offset_size - 1`` in bits 6-7), a
  dictionary size (``offset_size`` bytes, little-endian), ``size + 1``
  offsets, then the dictionary's UTF-8 name bytes.
- **value**: recursive; first byte packs ``basic_type`` (bits 0-1) and
  ``value_header`` (bits 2-7):

  - basic_type 0 = primitive, ``value_header`` is the type id
    (0 null, 1 true, 2 false, 3/4/5/6 int8/16/32/64 LE signed,
    7 double, 8/9/10 decimal4/8/16 (scale byte + LE two's-complement
    unscaled), 11 date (int32 days), 12 timestamptz-micros,
    13 timestampntz-micros, 14 float, 15 binary (int32 size + bytes),
    16 string (int32 size + bytes), 17 time-ntz-micros,
    18 timestamptz-nanos, 19 timestampntz-nanos, 20 uuid (16B
    big-endian));
  - basic_type 1 = short string, ``value_header`` is the byte length
    (0..63);
  - basic_type 2 = object: ``value_header = is_large << 4 |
    (field_id_size - 1) << 2 | (field_offset_size - 1)``; then
    ``num_elements`` (1 byte, or 4 LE when large), ``num`` field ids
    (dictionary indexes, sorted by field NAME), ``num + 1`` offsets
    into the values section, then the concatenated child values;
  - basic_type 3 = array: ``value_header = is_large << 2 |
    (field_offset_size - 1)``; same layout without field ids.

The READ surface this engine exposes for a variant column is a
**canonical JSON string** — BOTH physical layouts: unshredded scans
decode the ``(metadata, value)`` pair per row via an Arrow-batched
pandas UDF, and SHREDDED files are reassembled per the shredding spec
(``shredded_variant_json_udf``: typed_value wins, residuals merge,
both-null means missing, per-file footer descriptors) — the column
surfaces as ``STRING``; typed extraction then runs JVM-side
(``variant_get(parse_json(col), '$.path', 'type')`` or
``get_json_object``). Canonical rendering, documented and pinned by
``tests/test_variant_spec_vectors.py``:

- null/bool/int/string → the JSON natural form; object members in
  field-name order (the spec stores them sorted);
- double/float → shortest round-trip decimal (``repr``); non-finite
  floats render as the JSON STRINGS ``"NaN"`` / ``"Infinity"`` /
  ``"-Infinity"`` (JSON has no literals for them);
- decimal → an exact unquoted JSON number (never exponent form);
- date → ``"YYYY-MM-DD"``; timestamps → ``"YYYY-MM-DD HH:MM:SS[.ffffff]"``
  with ``+00:00`` appended for the tz-bearing ids (micros rendered only
  when nonzero — Python ``isoformat(sep=' ')``); nanosecond ids render
  a 9-digit fraction; time → ``"HH:MM:SS[.ffffff]"``;
- binary → base64 string; uuid → canonical hyphenated string.

The decode functions are built inside a factory (``_build_codec``) so
cloudpickle serializes them BY VALUE — Spark 4's Arrow UDF workers do
not import ``cloudfloe_spark``, so closures shipped to them must
pickle by value; only stdlib modules (pickled by name) are referenced.

The encoder (driver/fixture side, no pickling constraint) writes the
same spec: fixtures use it to build variant test tables, and the golden
vectors in ``tests/test_variant_spec_vectors.py`` pin both directions
against bytes hand-derived from the spec (never captured from this
codec).
"""

from __future__ import annotations

import datetime
import struct
import uuid as _uuidlib
from decimal import Decimal


def _build_codec():
    """Factory for the self-contained decode functions (see module
    docstring for why they must be locals, not module attributes)."""

    def _uint(b, off, n):
        return int.from_bytes(b[off : off + n], "little", signed=False)

    def metadata_names(md):
        """Dictionary of field-name strings from a metadata buffer."""
        if not md:
            raise ValueError("variant metadata is empty")
        h = md[0]
        version = h & 0x0F
        if version != 1:
            raise ValueError(
                f"unsupported variant metadata version {version}"
            )
        osz = ((h >> 6) & 0x3) + 1
        n = _uint(md, 1, osz)
        offs = [_uint(md, 1 + osz * (i + 1), osz) for i in range(n + 1)]
        base = 1 + osz * (n + 2)
        if base + offs[-1] > len(md):
            raise ValueError("variant metadata truncated")
        return [
            md[base + offs[i] : base + offs[i + 1]].decode("utf-8")
            for i in range(n)
        ]

    def decode_at(names, buf, pos):
        """Decode the value rooted at ``pos`` into a Python object."""
        import base64 as _b64
        import datetime as _dt
        import struct as _struct
        import uuid as _uuid
        from decimal import Decimal as _Dec

        if pos >= len(buf):
            raise ValueError("variant value truncated")
        b0 = buf[pos]
        bt = b0 & 0x3
        hdr = b0 >> 2
        p = pos + 1
        if bt == 1:  # short string
            if p + hdr > len(buf):
                raise ValueError("variant short string truncated")
            return buf[p : p + hdr].decode("utf-8")
        if bt == 2:  # object
            fo_sz = (hdr & 0x3) + 1
            fid_sz = ((hdr >> 2) & 0x3) + 1
            large = (hdr >> 4) & 0x1
            n = _uint(buf, p, 4 if large else 1)
            p += 4 if large else 1
            fids = [_uint(buf, p + i * fid_sz, fid_sz) for i in range(n)]
            p += n * fid_sz
            offs = [
                _uint(buf, p + i * fo_sz, fo_sz) for i in range(n + 1)
            ]
            p += (n + 1) * fo_sz
            out = {}
            for i in range(n):
                out[names[fids[i]]] = decode_at(names, buf, p + offs[i])
            return out
        if bt == 3:  # array
            fo_sz = (hdr & 0x3) + 1
            large = (hdr >> 2) & 0x1
            n = _uint(buf, p, 4 if large else 1)
            p += 4 if large else 1
            offs = [
                _uint(buf, p + i * fo_sz, fo_sz) for i in range(n + 1)
            ]
            p += (n + 1) * fo_sz
            return [decode_at(names, buf, p + offs[i]) for i in range(n)]
        # primitive
        tid = hdr
        if tid == 0:
            return None
        if tid == 1:
            return True
        if tid == 2:
            return False
        if tid in (3, 4, 5, 6):
            sz = {3: 1, 4: 2, 5: 4, 6: 8}[tid]
            return int.from_bytes(buf[p : p + sz], "little", signed=True)
        if tid == 7:
            return _struct.unpack("<d", buf[p : p + 8])[0]
        if tid in (8, 9, 10):
            sz = {8: 4, 9: 8, 10: 16}[tid]
            scale = buf[p]
            unscaled = int.from_bytes(
                buf[p + 1 : p + 1 + sz], "little", signed=True
            )
            # digit-exact construction from the sign/digits tuple:
            # Decimal(n).scaleb(-s) is bound by the active context
            # precision (default 28) and silently ROUNDS spec-legal
            # decimal16 values up to 38 digits; tuple construction
            # never consults the context
            return _Dec(
                (
                    1 if unscaled < 0 else 0,
                    tuple(int(d) for d in str(abs(unscaled))),
                    -scale,
                )
            )
        if tid == 11:
            days = int.from_bytes(buf[p : p + 4], "little", signed=True)
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
        if tid in (12, 13):
            us = int.from_bytes(buf[p : p + 8], "little", signed=True)
            base = _dt.datetime(
                1970, 1, 1,
                tzinfo=_dt.timezone.utc if tid == 12 else None,
            )
            return base + _dt.timedelta(microseconds=us)
        if tid == 14:
            return _struct.unpack("<f", buf[p : p + 4])[0]
        if tid in (15, 16):
            ln = _uint(buf, p, 4)
            raw = buf[p + 4 : p + 4 + ln]
            if len(raw) != ln:
                raise ValueError("variant binary/string truncated")
            return raw.decode("utf-8") if tid == 16 else bytes(raw)
        if tid == 17:
            us = int.from_bytes(buf[p : p + 8], "little", signed=True)
            return (
                _dt.datetime(1970, 1, 1)
                + _dt.timedelta(microseconds=us)
            ).time()
        if tid in (18, 19):
            ns = int.from_bytes(buf[p : p + 8], "little", signed=True)
            # nanos render with a 9-digit fraction (no stdlib ns type);
            # mark tz-ness so the JSON form matches the micros ids'
            return ("__variant_ns__", tid == 18, ns)
        if tid == 20:
            return _uuid.UUID(bytes=bytes(buf[p : p + 16]))
        raise ValueError(f"unsupported variant primitive type id {tid}")

    def decode(md, val):
        """(metadata, value) bytes → Python object tree."""
        return decode_at(metadata_names(md), val, 0)

    def render(v):
        """Decoded Python object tree → canonical JSON text."""
        import base64 as _b64
        import datetime as _dt
        import json as _json
        import uuid as _uuid
        from decimal import Decimal as _Dec

        def ser(v):
            if v is None:
                return "null"
            if v is True:
                return "true"
            if v is False:
                return "false"
            if isinstance(v, int):
                return str(v)
            if isinstance(v, float):
                if v != v:
                    return '"NaN"'
                if v == float("inf"):
                    return '"Infinity"'
                if v == float("-inf"):
                    return '"-Infinity"'
                return repr(v)
            if isinstance(v, str):
                return _json.dumps(v, ensure_ascii=False)
            if isinstance(v, _Dec):
                return format(v, "f")
            if isinstance(v, _dt.datetime):
                return _json.dumps(v.isoformat(sep=" "))
            if isinstance(v, (_dt.date, _dt.time)):
                return _json.dumps(v.isoformat())
            if isinstance(v, (bytes, bytearray)):
                return _json.dumps(_b64.b64encode(bytes(v)).decode())
            if isinstance(v, _uuid.UUID):
                return _json.dumps(str(v))
            if (
                isinstance(v, tuple)
                and len(v) == 3
                and v[0] == "__variant_ns__"
            ):
                _, tz, ns = v
                secs, frac = divmod(ns, 1_000_000_000)
                base = _dt.datetime(
                    1970, 1, 1,
                    tzinfo=_dt.timezone.utc if tz else None,
                ) + _dt.timedelta(seconds=secs)
                txt = base.isoformat(sep=" ")
                if tz:  # splice the fraction before the +00:00 suffix
                    txt = f"{txt[:-6]}.{frac:09d}{txt[-6:]}"
                else:
                    txt = f"{txt}.{frac:09d}"
                return _json.dumps(txt)
            if isinstance(v, dict):
                return (
                    "{"
                    + ",".join(
                        f"{_json.dumps(k, ensure_ascii=False)}:{ser(x)}"
                        for k, x in v.items()
                    )
                    + "}"
                )
            if isinstance(v, list):
                return "[" + ",".join(ser(x) for x in v) + "]"
                # pragma: no cover — decode_at never yields other types
            raise ValueError(f"unrenderable variant value {type(v)}")

        return ser(v)

    def to_json(md, val):
        """(metadata, value) bytes → canonical JSON text (None-safe)."""
        if md is None or val is None:
            return None
        return render(decode(bytes(md), bytes(val)))

    return metadata_names, decode_at, decode, render, to_json


(
    _metadata_names,
    _decode_at,
    decode_variant,
    _render_variant,
    variant_to_json,
) = _build_codec()


def variant_json_udf():
    """Arrow-batched pandas UDF: ``struct<metadata binary, value
    binary>`` column → canonical-JSON ``STRING`` column. Built inside
    this factory so everything shipped to the worker pickles by value
    (the decoder is a ``_build_codec`` local; stdlib pickles by name)."""
    from pyspark.sql.functions import pandas_udf

    to_json = variant_to_json

    def _conv(s):
        import pandas as pd

        md = s["metadata"]
        val = s["value"]
        return pd.Series(
            [to_json(m, v) for m, v in zip(md, val)], dtype=object
        )

    return pandas_udf(_conv, "string")


def decode_variant_columns(df, cols: "list[str]"):
    """Replace each physical variant struct column with its canonical
    JSON string form (the engine's variant read surface)."""
    if not cols:
        return df
    from pyspark.sql import functions as F

    udf = variant_json_udf()
    for c in cols:
        df = df.withColumn(c, udf(F.col(c)))
    return df


# --- encoder ------------------------------------------------------------------
#
# Like the decoder, the encode functions are built inside a factory so
# a worker-side UDF (``json_variant_encode_udf``, the write half of
# variant DML) ships them BY VALUE — module-level functions would
# pickle by name and fail on Arrow workers that never import
# ``cloudfloe_spark``. The driver/fixture surface (``encode_variant``)
# wraps one shared instance.


def _build_encoder():
    """Factory for the self-contained encode function: Python object
    tree → spec-conformant ``(metadata, value)`` bytes. Only stdlib
    names are referenced (pickled by name); everything else is a
    local."""
    import datetime
    import struct
    import uuid as _uuidlib
    from decimal import Decimal

    def _collect_keys(obj, keys: set) -> None:
        if isinstance(obj, dict):
            for k, v in obj.items():
                if not isinstance(k, str):
                    raise TypeError("variant object keys must be strings")
                keys.add(k)
                _collect_keys(v, keys)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                _collect_keys(v, keys)


    def _min_bytes(n: int) -> int:
        """Smallest 1..4-byte width that holds unsigned ``n``."""
        for w in (1, 2, 3, 4):
            if n < (1 << (8 * w)):
                return w
        raise ValueError(f"variant offset {n} exceeds 4 bytes")


    def _ule(n: int, w: int) -> bytes:
        return int(n).to_bytes(w, "little", signed=False)


    def _encode_value(obj, fid: "dict[str, int]") -> bytes:
        """Recursive value encoding (spec layout in the module docstring)."""

        def prim(tid: int, payload: bytes = b"") -> bytes:
            return bytes([tid << 2]) + payload

        if (
            isinstance(obj, tuple)
            and len(obj) == 3
            and obj[0] == "__variant_ns__"
        ):
            # nanosecond-timestamp marker from the shredded reassembly
            # (spec ids 18 tz / 19 ntz) — lets a shredded ns leaf
            # re-encode to the unshredded binary without precision loss
            _, _tz, _ns = obj
            return prim(
                18 if _tz else 19,
                int(_ns).to_bytes(8, "little", signed=True),
            )
        if obj is None:
            return prim(0)
        if obj is True:
            return prim(1)
        if obj is False:
            return prim(2)
        if isinstance(obj, int):
            for tid, w in ((3, 1), (4, 2), (5, 4), (6, 8)):
                if -(1 << (8 * w - 1)) <= obj < (1 << (8 * w - 1)):
                    return prim(tid, obj.to_bytes(w, "little", signed=True))
            # beyond int64 (a JSON integer literal can be arbitrarily
            # wide): the spec has no wider int id — ride decimal16
            # (scale 0, ±2^127), else the double fallback below
            obj = Decimal(obj)
        if isinstance(obj, float):
            return prim(7, struct.pack("<d", obj))
        if isinstance(obj, Decimal):
            # digit-exact normalization WITHOUT quantize/scaleb (both
            # are context-precision-bound and raise InvalidOperation on
            # wide values like 1E+300 — found by the round-trip fuzz)
            sign, digits, exp = obj.as_tuple()
            if not isinstance(exp, int):  # NaN/Inf markers
                return prim(7, struct.pack("<d", float(obj)))
            unscaled = int("".join(map(str, digits)) or "0")
            if sign:
                unscaled = -unscaled
            if exp > 0:  # integral with trailing zeros → scale 0
                unscaled *= 10 ** exp
                scale = 0
            else:
                scale = -exp
            if 0 <= scale <= 255:
                for tid, w in ((8, 4), (9, 8), (10, 16)):
                    if -(1 << (8 * w - 1)) <= unscaled < (1 << (8 * w - 1)):
                        return prim(
                            tid,
                            bytes([scale])
                            + unscaled.to_bytes(w, "little", signed=True),
                        )
            # beyond decimal16 precision or scale range: the value is
            # only representable as a double — lossy past 2^127 / 1e-255,
            # exactly like JSON consumers that parse numbers as doubles
            return prim(7, struct.pack("<d", float(obj)))
        if isinstance(obj, datetime.datetime):
            if obj.tzinfo is not None:
                us = (
                    obj - datetime.datetime(
                        1970, 1, 1, tzinfo=datetime.timezone.utc
                    )
                ) // datetime.timedelta(microseconds=1)
                return prim(12, us.to_bytes(8, "little", signed=True))
            us = (
                obj - datetime.datetime(1970, 1, 1)
            ) // datetime.timedelta(microseconds=1)
            return prim(13, us.to_bytes(8, "little", signed=True))
        if isinstance(obj, datetime.date):
            days = (obj - datetime.date(1970, 1, 1)).days
            return prim(11, days.to_bytes(4, "little", signed=True))
        if isinstance(obj, datetime.time):
            us = (
                obj.hour * 3600 + obj.minute * 60 + obj.second
            ) * 1_000_000 + obj.microsecond
            return prim(17, us.to_bytes(8, "little", signed=True))
        if isinstance(obj, _uuidlib.UUID):
            return prim(20, obj.bytes)  # spec: big-endian field order
        if isinstance(obj, (bytes, bytearray)):
            return prim(15, _ule(len(obj), 4) + bytes(obj))
        if isinstance(obj, str):
            raw = obj.encode("utf-8")
            if len(raw) < 64:
                return bytes([(len(raw) << 2) | 1]) + raw
            return prim(16, _ule(len(raw), 4) + raw)
        if isinstance(obj, dict):
            items = sorted(obj.items(), key=lambda kv: kv[0])
            vals = [_encode_value(v, fid) for _, v in items]
            offs, total = [], 0
            for v in vals:
                offs.append(total)
                total += len(v)
            offs.append(total)
            n = len(items)
            fids = [fid[k] for k, _ in items]
            fid_sz = _min_bytes(max(fids) if fids else 0)
            fo_sz = _min_bytes(total)
            large = n > 255
            hdr = (int(large) << 4) | ((fid_sz - 1) << 2) | (fo_sz - 1)
            out = bytearray([(hdr << 2) | 2])
            out += _ule(n, 4 if large else 1)
            for f in fids:
                out += _ule(f, fid_sz)
            for o in offs:
                out += _ule(o, fo_sz)
            for v in vals:
                out += v
            return bytes(out)
        if isinstance(obj, (list, tuple)):
            vals = [_encode_value(v, fid) for v in obj]
            offs, total = [], 0
            for v in vals:
                offs.append(total)
                total += len(v)
            offs.append(total)
            n = len(vals)
            fo_sz = _min_bytes(total)
            large = n > 255
            hdr = (int(large) << 2) | (fo_sz - 1)
            out = bytearray([(hdr << 2) | 3])
            out += _ule(n, 4 if large else 1)
            for o in offs:
                out += _ule(o, fo_sz)
            for v in vals:
                out += v
            return bytes(out)
        raise TypeError(f"cannot encode {type(obj).__name__} as variant")


    def encode_variant(obj) -> "tuple[bytes, bytes]":
        """Python object tree → spec-conformant ``(metadata, value)`` bytes.
        The metadata dictionary holds every object key in the tree, sorted
        (``sorted_strings`` set). Supported leaves: None, bool, int (→
        smallest intN), float (→ double), str, bytes, Decimal, date,
        datetime (tz-aware → timestamptz-micros, naive → ntz), time, UUID;
        dict/list nest."""
        keys: set = set()
        _collect_keys(obj, keys)
        names = sorted(keys, key=lambda s: s.encode("utf-8"))
        fid = {k: i for i, k in enumerate(names)}
        raw = [k.encode("utf-8") for k in names]
        offs, total = [], 0
        for r in raw:
            offs.append(total)
            total += len(r)
        offs.append(total)
        osz = _min_bytes(max(total, len(names)))
        md = bytearray([0x01 | (1 << 4) | ((osz - 1) << 6)])
        md += _ule(len(names), osz)
        for o in offs:
            md += _ule(o, osz)
        for r in raw:
            md += r
        return bytes(md), _encode_value(obj, fid)

    return encode_variant, _encode_value


#: shared driver-side instances — fixtures, changelog builders, the
#: shredding test writer and the golden-vector tests call these; UDF
#: factories call ``_build_encoder()`` themselves so the closure ships
#: by value.
encode_variant, _encode_value = _build_encoder()


def json_variant_encode_udf():
    """Arrow-batched pandas UDF: canonical/user JSON text column →
    physical ``struct<metadata binary, value binary>`` — the write half
    of variant DML (r13, VERDICT r12 #1). Parsing uses
    ``parse_float=Decimal`` so fractional literals round-trip digit-
    exact through the decimal primitive ids ("2.50" stays "2.50" on
    re-read, never a double's shortest form); ints stay ints. A SQL
    NULL input row yields a NULL struct (SQL-null variant)."""
    from pyspark.sql.functions import pandas_udf

    encode, _ = _build_encoder()

    def _conv(s):
        import json
        from decimal import Decimal as _Dec

        import pandas as pd

        mds, vals = [], []
        for txt in s:
            if txt is None or (isinstance(txt, float) and txt != txt):
                mds.append(None)
                vals.append(None)
                continue
            obj = json.loads(txt, parse_float=_Dec)
            md, val = encode(obj)
            mds.append(md)
            vals.append(val)
        return pd.DataFrame({"metadata": mds, "value": vals})

    return pandas_udf(_conv, "metadata BINARY, value BINARY")


# --- shredded reads (r12): typed_value reassembly -----------------------------
#
# The Parquet variant SHREDDING spec stores a variant column as
#   group v { metadata binary, value binary?, typed_value T? }
# where ``typed_value`` is a physical primitive, a list of
# ``{ value?, typed_value? }`` element groups, or a group with one
# ``{ value?, typed_value? }`` sub-group per shredded OBJECT field; the
# ``value`` at each level holds the variant-encoded RESIDUAL (whatever
# the shredding schema didn't capture). Reassembly (spec rules):
#
#   - ``typed_value`` non-null → the value is the typed one; for
#     objects, merge its present fields with the residual object's
#     fields (the spec guarantees the two sets are disjoint);
#   - else ``value`` non-null → decode the residual as variant against
#     the TOP-LEVEL metadata dictionary;
#   - both null → field MISSING (inside objects) / SQL NULL (top).
#
# The reassembly descriptor is derived from the parquet FOOTER (pyarrow
# types, `shred_descriptor`) because Spark normalizes physical types
# before pandas sees them — tz and ntz µs timestamps both arrive
# session-UTC, and ns timestamps arrive as raw longs under
# ``nanosAsLong`` — so the descriptor is what tells the UDF how to
# render each leaf exactly as the unshredded decoder would.

_SHRED_LEAVES = (
    "bool", "int", "float", "double", "string", "binary", "decimal",
    "date", "ts_us", "ts_us_tz", "ts_ns", "ts_ns_tz", "uuid",
)


def shred_descriptor(arrow_type) -> dict:
    """pyarrow ``typed_value`` type → reassembly descriptor
    (``{"kind": leaf}`` / ``{"kind": "object", "fields": {name:
    {"value": bool, "typed": desc|None}}}`` / ``{"kind": "array",
    "element": {"value": bool, "typed": desc|None}}``). Raises
    ``ValueError`` naming any leaf this reader cannot render."""
    import pyarrow as pa

    t = arrow_type

    def _vt_group(gt, what):
        names = {gt.field(i).name: gt.field(i).type
                 for i in range(gt.num_fields)}
        extra = set(names) - {"value", "typed_value"}
        if extra or not names:
            raise ValueError(
                f"shredded {what} is not a (value, typed_value) group "
                f"(fields {sorted(names)})"
            )
        return {
            "value": "value" in names,
            "typed": (
                shred_descriptor(names["typed_value"])
                if "typed_value" in names
                else None
            ),
        }

    if pa.types.is_struct(t):
        fields = {}
        for i in range(t.num_fields):
            f = t.field(i)
            if not pa.types.is_struct(f.type):
                raise ValueError(
                    f"shredded object field {f.name!r} is not a group"
                )
            fields[f.name] = _vt_group(f.type, f"object field {f.name!r}")
        return {"kind": "object", "fields": fields}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        et = t.value_type
        if not pa.types.is_struct(et):
            raise ValueError("shredded array element is not a group")
        return {"kind": "array", "element": _vt_group(et, "array element")}
    if pa.types.is_boolean(t):
        return {"kind": "bool"}
    if pa.types.is_integer(t):
        return {"kind": "int"}
    if pa.types.is_float32(t):
        return {"kind": "float"}
    if pa.types.is_float64(t):
        return {"kind": "double"}
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return {"kind": "string"}
    if pa.types.is_decimal(t):
        return {"kind": "decimal"}
    if pa.types.is_date(t):
        return {"kind": "date"}
    if pa.types.is_timestamp(t):
        if t.unit == "ns":
            return {"kind": "ts_ns_tz" if t.tz else "ts_ns"}
        if t.unit == "us":
            return {"kind": "ts_us_tz" if t.tz else "ts_us"}
        raise ValueError(f"unsupported shredded timestamp unit {t.unit}")
    if pa.types.is_fixed_size_binary(t) and t.byte_width == 16:
        return {"kind": "uuid"}
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return {"kind": "binary"}
    raise ValueError(f"unsupported shredded leaf type {t}")


def shredded_variant_json_udf(descriptor: dict, *, binary_out: bool = False):
    """Arrow-batched pandas UDF rendering a SHREDDED variant struct
    column to the same canonical-JSON STRING surface as the unshredded
    decoder. Fully self-contained closure: the codec functions are
    ``_build_codec()`` locals captured by value, the descriptor is a
    plain dict, and only stdlib/pandas are referenced by name.

    ``binary_out=True`` (r13, VERDICT r12 #3) re-encodes the
    reassembled VALUE TREE — not the JSON rendering, so timestamps,
    decimals, dates, uuids and binaries keep their exact primitive ids
    (ns leaves ride an internal marker → ids 18/19) — to the UNSHREDDED
    ``(metadata, value)`` pair: the shredded→unshredded normalization
    compaction applies."""
    from pyspark.sql.functions import pandas_udf

    metadata_names, decode_at, _decode, render, _to_json = _build_codec()
    encode, _ = _build_encoder()
    desc = descriptor
    _MISSING = object()

    def _udf(pdf):
        import datetime as _dt
        import uuid as _uuid

        import pandas as pd

        def conv(kind, v):
            if kind == "bool":
                return bool(v)
            if kind == "int":
                return int(v)
            if kind in ("float", "double"):
                return float(v)
            if kind == "string":
                return str(v)
            if kind == "binary":
                return bytes(v)
            if kind in ("decimal", "date"):
                return v
            if kind in ("ts_us", "ts_us_tz"):
                d = (
                    v.to_pydatetime()
                    if hasattr(v, "to_pydatetime")
                    else v
                )
                if kind == "ts_us":
                    return d.replace(tzinfo=None) if d.tzinfo else d
                return (
                    d.astimezone(_dt.timezone.utc)
                    if d.tzinfo
                    else d.replace(tzinfo=_dt.timezone.utc)
                )
            if kind == "ts_ns":
                return ("__variant_ns__", False, int(v))
            if kind == "ts_ns_tz":
                return ("__variant_ns__", True, int(v))
            if kind == "uuid":
                return _uuid.UUID(bytes=bytes(v))
            raise ValueError(f"unknown shred leaf kind {kind!r}")

        def _null(x):
            # Scalar null test covering None, float NaN, pd.NaT and
            # np.datetime64('NaT') — a top-level timestamp typed_value
            # leaf arrives as a datetime64 series whose nulls are NaT
            # (spec-legal foreign shredding); containers are never null.
            if x is None:
                return True
            if isinstance(
                x, (dict, list, tuple, bytes, bytearray, str)
            ):
                return False
            try:
                return bool(pd.isna(x))
            except (TypeError, ValueError):
                return False

        def node(names, d, val_b, tv):
            if d is not None and not _null(tv):
                if d["kind"] == "object":
                    out = {}
                    for fname, fd in d["fields"].items():
                        fn = tv.get(fname)
                        if _null(fn):
                            continue  # null field group → missing
                        fv = node(
                            names,
                            fd["typed"],
                            fn.get("value") if fd["value"] else None,
                            fn.get("typed_value"),
                        )
                        if fv is not _MISSING:
                            out[fname] = fv
                    if not _null(val_b):
                        resid = decode_at(names, bytes(val_b), 0)
                        if not isinstance(resid, dict):
                            raise ValueError(
                                "shredded object residual is not an "
                                "object"
                            )
                        for k, v in resid.items():
                            out.setdefault(k, v)
                    return dict(
                        sorted(
                            out.items(),
                            key=lambda kv: kv[0].encode("utf-8"),
                        )
                    )
                if d["kind"] == "array":
                    ed = d["element"]
                    out_l = []
                    for el in tv:
                        if _null(el):
                            raise ValueError(
                                "shredded array element group is null"
                            )
                        ev = node(
                            names,
                            ed["typed"],
                            el.get("value") if ed["value"] else None,
                            el.get("typed_value"),
                        )
                        if ev is _MISSING:
                            raise ValueError(
                                "shredded array element has neither "
                                "value nor typed_value"
                            )
                        out_l.append(ev)
                    return out_l
                return conv(d["kind"], tv)
            if not _null(val_b):
                return decode_at(names, bytes(val_b), 0)
            return _MISSING

        md_s = pdf["metadata"]
        v_s = pdf["value"] if "value" in pdf.columns else None
        tv_s = pdf["typed_value"] if "typed_value" in pdf.columns else None
        if binary_out:
            mds, vals = [], []
            for i in range(len(pdf)):
                md = md_s.iloc[i]
                if _null(md):
                    mds.append(None)
                    vals.append(None)
                    continue
                names = metadata_names(bytes(md))
                vb = v_s.iloc[i] if v_s is not None else None
                tv = tv_s.iloc[i] if tv_s is not None else None
                res = node(names, desc, vb, tv)
                if res is _MISSING:
                    mds.append(None)
                    vals.append(None)
                else:
                    m2, v2 = encode(res)
                    mds.append(m2)
                    vals.append(v2)
            return pd.DataFrame({"metadata": mds, "value": vals})
        out = []
        for i in range(len(pdf)):
            md = md_s.iloc[i]
            if _null(md):
                out.append(None)  # whole variant struct is NULL
                continue
            names = metadata_names(bytes(md))
            vb = v_s.iloc[i] if v_s is not None else None
            tv = tv_s.iloc[i] if tv_s is not None else None
            res = node(names, desc, vb, tv)
            out.append(None if res is _MISSING else render(res))
        return pd.Series(out, dtype=object)

    if binary_out:
        return pandas_udf(_udf, "metadata BINARY, value BINARY")
    return pandas_udf(_udf, "string")


#: SQL extraction types a native typed_value projection can serve, and
#: the shred-descriptor leaf kinds whose values are representable in
#: that type without a semantics change (a cast that can fail — e.g.
#: int64 → INT — is excluded: ``variant_get`` raises where CAST nulls).
_TYPED_PUSH = {
    "bigint": ("int",),
    "long": ("int",),
    "string": ("string",),
    "double": ("double", "float"),
    "boolean": ("bool",),
}


def shredded_typed_steps(
    descriptor: dict, path_parts: "list[str]", sql_type: str
):
    """Physical struct-navigation steps for extracting ``$.f1.f2`` from
    a SHREDDED variant column NATIVELY (r13, VERDICT r12 #2) — e.g.
    ``["typed_value", "f1", "typed_value", "f2", "typed_value"]`` — or
    ``None`` when the layout cannot guarantee equivalence with the
    reassemble-then-extract surface: a ``value`` residual exists
    anywhere along the path (the datum could hide there), the field is
    not shredded, or the leaf kind does not match the requested SQL
    type. The caller additionally requires the TOP-LEVEL ``value``
    subcolumn to be absent (checked against the file group's footer —
    presence is per-file, not in the descriptor)."""
    want = _TYPED_PUSH.get(sql_type.strip().lower())
    if want is None or not path_parts:
        return None
    d = descriptor
    steps = ["typed_value"]
    for part in path_parts:
        if not isinstance(d, dict) or d.get("kind") != "object":
            return None
        g = d.get("fields", {}).get(part)
        if g is None or g.get("value"):
            return None
        d = g.get("typed")
        if d is None:
            return None
        steps += [part, "typed_value"]
    if not isinstance(d, dict) or d.get("kind") not in want:
        return None
    return steps


def decode_shredded_variant_columns(df, col_descriptors: "dict[str, dict]"):
    """Replace each SHREDDED physical variant struct column with its
    canonical JSON string form."""
    if not col_descriptors:
        return df
    from pyspark.sql import functions as F

    for c, d in col_descriptors.items():
        df = df.withColumn(c, shredded_variant_json_udf(d)(F.col(c)))
    return df


def shredded_to_unshredded_columns(df, col_descriptors: "dict[str, dict]"):
    """Replace each SHREDDED physical variant struct column with the
    UNSHREDDED ``(metadata, value)`` pair — value-tree re-encode, type
    fidelity preserved (r13: the normalization compaction applies)."""
    if not col_descriptors:
        return df
    from pyspark.sql import functions as F

    for c, d in col_descriptors.items():
        df = df.withColumn(
            c, shredded_variant_json_udf(d, binary_out=True)(F.col(c))
        )
    return df


def _build_shredder():
    """Self-contained shredding pair (r15, VERDICT r14 #3): both
    returned functions close ONLY over ``_build_codec()`` /
    ``_build_encoder()`` locals, so cloudpickle ships them BY VALUE —
    the write-side shredding runs inside Arrow executor writes, and
    Arrow UDF workers cannot import this package (see the module's UDF
    factories for the same rule)."""
    _metadata_names, _decode_at, _decode_pair, _render, _to_json = (
        _build_codec()
    )
    encode_variant, _encode_value = _build_encoder()

    def shred_rows(objs: list, shred: dict, *, top_value: bool = True):
        """Fixture/test helper: shred Python object trees per a descriptor
        shaped like :func:`shred_descriptor` output (leaf kinds name arrow
        types) → a ``pyarrow`` StructArray for the full shredded variant
        column (``metadata``, ``value``, ``typed_value``). The residual at
        each level is variant-encoded against the row's full metadata
        dictionary — exactly the writer behavior the shredding spec
        describes. ``top_value=False`` models a perfectly-shredding writer:
        the top-level residual column is omitted (rows that would need one
        raise), which is the layout the typed-path pushdown serves
        natively. ``top_value="auto"`` (r15, write-side shredding) omits
        the residual column exactly when NO row in this batch needs one
        — the per-file layout decision a real shredding writer makes."""
        import datetime as _dt
        import uuid as _uuid

        import pyarrow as pa

        def _leaf_type(kind):
            return {
                "bool": pa.bool_(),
                "int": pa.int64(),
                "float": pa.float32(),
                "double": pa.float64(),
                "string": pa.string(),
                "binary": pa.binary(),
                # full decimal16 precision so >28-digit values shred
                # without rescale loss (scale 4 matches the test corpus)
                "decimal": pa.decimal128(38, 4),
                "date": pa.date32(),
                "ts_us": pa.timestamp("us"),
                "ts_us_tz": pa.timestamp("us", tz="UTC"),
                "ts_ns": pa.timestamp("ns"),
                "ts_ns_tz": pa.timestamp("ns", tz="UTC"),
                "uuid": pa.binary(16),
            }[kind]

        def _vt_type(d):
            if d is None:
                return None
            if d["kind"] == "object":
                return pa.struct(
                    [
                        (
                            n,
                            pa.struct(
                                ([("value", pa.binary())] if g["value"] else [])
                                + (
                                    [("typed_value", _vt_type(g["typed"]))]
                                    if g["typed"] is not None
                                    else []
                                )
                            ),
                        )
                        for n, g in d["fields"].items()
                    ]
                )
            if d["kind"] == "array":
                g = d["element"]
                return pa.list_(
                    pa.struct(
                        ([("value", pa.binary())] if g["value"] else [])
                        + (
                            [("typed_value", _vt_type(g["typed"]))]
                            if g["typed"] is not None
                            else []
                        )
                    )
                )
            return _leaf_type(d["kind"])

        def _leaf_matches(kind, v):
            return {
                "bool": lambda: isinstance(v, bool),
                "int": lambda: isinstance(v, int) and not isinstance(v, bool),
                "float": lambda: isinstance(v, float),
                "double": lambda: isinstance(v, float),
                "string": lambda: isinstance(v, str),
                "binary": lambda: isinstance(v, (bytes, bytearray)),
                "decimal": lambda: type(v).__name__ == "Decimal",
                "date": lambda: isinstance(v, _dt.date)
                and not isinstance(v, _dt.datetime),
                "ts_us": lambda: isinstance(v, _dt.datetime)
                and v.tzinfo is None,
                "ts_us_tz": lambda: isinstance(v, _dt.datetime)
                and v.tzinfo is not None,
                "ts_ns": lambda: False,
                "ts_ns_tz": lambda: False,
                "uuid": lambda: isinstance(v, _uuid.UUID),
            }[kind]()

        def split(obj, d, fid):
            """One VALUE (never a missing field) → ``(residual_value_bytes
            | None, typed_py | None)``; exactly one side is non-None except
            for objects, where both may contribute (typed fields + residual
            fields). A Python None is a variant NULL — it always lands in
            the residual (no typed leaf represents null)."""
            if obj is None or d is None:
                return _encode_value(obj, fid), None
            if d["kind"] == "object":
                if not isinstance(obj, dict):
                    return _encode_value(obj, fid), None
                typed = {}
                resid = {}
                for k, v in obj.items():
                    if k in d["fields"]:
                        g = d["fields"][k]
                        rv, tv = split(v, g["typed"], fid)
                        fld = {}
                        if g["value"]:
                            fld["value"] = rv
                        elif rv is not None:
                            raise ValueError(
                                f"field {k!r} needs a residual but the "
                                "shred schema has no value column"
                            )
                        if g["typed"] is not None:
                            fld["typed_value"] = tv
                        typed[k] = fld
                    else:
                        resid[k] = v
                for k, g in d["fields"].items():
                    if k not in obj:  # MISSING field: both sides null
                        fld = {}
                        if g["value"]:
                            fld["value"] = None
                        if g["typed"] is not None:
                            fld["typed_value"] = None
                        typed[k] = fld
                rb = _encode_value(resid, fid) if resid else None
                return rb, typed
            if d["kind"] == "array":
                if not isinstance(obj, list):
                    return _encode_value(obj, fid), None
                g = d["element"]
                els = []
                for v in obj:
                    rv, tv = split(v, g["typed"], fid)
                    fld = {}
                    if g["value"]:
                        fld["value"] = rv
                    elif rv is not None:
                        raise ValueError(
                            "array element needs a residual but the shred "
                            "schema has no value column"
                        )
                    if g["typed"] is not None:
                        fld["typed_value"] = tv
                    els.append(fld)
                return None, els
            if _leaf_matches(d["kind"], obj):
                if d["kind"] == "uuid":
                    return None, obj.bytes  # arrow stores fixed(16) bytes
                return None, obj
            return _encode_value(obj, fid), None

        mds, vals, tvs = [], [], []
        for obj in objs:
            if obj is None:
                mds.append(None)
                vals.append(None)
                tvs.append(None)
                continue
            md, _full = encode_variant(obj)
            names = _metadata_names(md)
            fid = {k: i for i, k in enumerate(names)}
            rv, tv = split(obj, shred, fid)
            mds.append(md)
            vals.append(rv)
            tvs.append(tv)

        vt = _vt_type(shred)
        if top_value == "auto":
            top_value = any(v is not None for v in vals)
        if not top_value:
            # a perfectly-shredding writer omits the top-level residual
            # column entirely (what makes typed-path pushdown provably
            # safe); any row that actually NEEDS one is a caller bug
            bad = [i for i, v in enumerate(vals) if v is not None]
            if bad:
                raise ValueError(
                    f"shred_rows(top_value=False): rows {bad} carry a "
                    "top-level residual"
                )
            struct_t = pa.struct(
                [("metadata", pa.binary()), ("typed_value", vt)]
            )
            return pa.array(
                [
                    None
                    if m is None
                    else {"metadata": m, "typed_value": t}
                    for m, t in zip(mds, tvs)
                ],
                struct_t,
            )
        struct_t = pa.struct(
            [("metadata", pa.binary()), ("value", pa.binary()),
             ("typed_value", vt)]
        )
        return pa.array(
            [
                None
                if m is None
                else {"metadata": m, "value": v, "typed_value": t}
                for m, v, t in zip(mds, vals, tvs)
            ],
            struct_t,
        )


    def shred_encoded_rows(mds, vals, shred, *, top_value=True):
        """The write half of LAYOUT CONVERSION: parallel sequences of
        unshredded ``metadata`` / ``value`` bytes → the SHREDDED
        StructArray ``shred_rows`` builds — each pair decodes to its
        value tree (type-exact: ns/uuid/decimal leaves ride the codec's
        internal markers) and re-splits per the descriptor. A None
        metadata (SQL-null variant) stays a null struct."""
        objs = []
        for md, val in zip(mds, vals):
            if md is None or val is None:
                objs.append(None)
                continue
            objs.append(
                _decode_at(
                    _metadata_names(bytes(md)), bytes(val), 0
                )
            )
        return shred_rows(objs, shred, top_value=top_value)

    return shred_rows, shred_encoded_rows


#: shared driver-side instances (fixtures/tests); executor closures
#: must call ``_build_shredder()`` themselves so everything pickles by
#: value.
shred_rows, shred_encoded_rows = _build_shredder()
