"""Minimal pure-Python Avro Object Container File reader/writer.

Iceberg stores its manifest lists and manifests as Avro files
(`reference/README.md:92` — the reference gets Avro decoding for free via
DuckDB's iceberg extension; `backend/main.py:464` iceberg_scan). This
sandbox has no avro/fastavro package and no network, so the snapshot
machinery (time travel, file listings, snapshot-pinned reads) needs its own
decoder. This is a deliberately small, schema-driven subset:

- Reader: any schema (records, arrays, maps, unions, enums, fixed,
  all primitives), ``null`` and ``deflate`` codecs. Schema comes from the
  container header, so real Iceberg manifests decode without any
  schema knowledge compiled in.
- Writer: same type coverage, ``null`` codec only — used for local fixture
  warehouses and tests, not a general-purpose Avro producer.

Not supported (raises): snappy/zstd codecs (no codec libs in the sandbox),
schema resolution against a differing reader schema, logical-type
conversion (values decode as their underlying primitive — exactly what the
Iceberg metadata readers want).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"


# --- binary primitives -------------------------------------------------------


def _read_long(buf: BinaryIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift = 0
    accum = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro varint")
        byte = b[0]
        accum |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (accum >> 1) ^ -(accum & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_bytes(buf: BinaryIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated avro bytes")
    return data


# --- schema-driven decode ----------------------------------------------------


def _decode(schema: Any, buf: BinaryIO) -> Any:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: zigzag branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("truncated boolean")
        return b[0] != 0
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            count = _read_long(buf)
            if count == 0:
                return out
            if count < 0:  # block size prefix follows — skip it
                _read_long(buf)
                count = -count
            for _ in range(count):
                out.append(_decode(schema["items"], buf))
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            count = _read_long(buf)
            if count == 0:
                return out_m
            if count < 0:
                _read_long(buf)
                count = -count
            for _ in range(count):
                k = _read_bytes(buf).decode("utf-8")
                out_m[k] = _decode(schema["values"], buf)
    raise ValueError(f"unsupported avro type {t!r}")


def _encode(schema: Any, value: Any, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        # Union: pick the first branch the value fits (null → "null").
        for i, branch in enumerate(schema):
            name = branch if isinstance(branch, str) else branch["type"]
            if (value is None) == (name == "null"):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    else:
        t = schema["type"]

    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "bytes":
        _write_long(out, len(value))
        out.write(value)
    elif t == "string":
        data = value.encode("utf-8")
        _write_long(out, len(data))
        out.write(data)
    elif t == "record":
        for f in schema["fields"]:
            # .get: an absent key encodes as null when the field is
            # nullable — lets the manifest schema grow optional fields
            # (e.g. v3 deletion-vector refs) without touching every
            # writer; a missing NON-nullable field still fails, in the
            # union/type encoder.
            _encode(f["type"], value.get(f["name"]), out)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        out.write(value)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                data = k.encode("utf-8")
                _write_long(out, len(data))
                out.write(data)
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


# --- object container file ---------------------------------------------------


def read_avro(path: str) -> list[dict]:
    """Decode every record of an Avro object container file using its own
    embedded writer schema."""
    with open(path, "rb") as f:
        return read_avro_fileobj(f, name=path)


def read_avro_bytes(data: bytes, name: str = "<bytes>") -> list[dict]:
    """Decode an in-memory Avro object container file — the entry point for
    manifests streamed through a Hadoop FileSystem (s3://, viewfs://)
    rather than opened from the local disk."""
    return read_avro_fileobj(io.BytesIO(data), name=name)


def read_avro_fileobj(f: BinaryIO, name: str = "<stream>") -> list[dict]:
    if f.read(4) != MAGIC:
        raise ValueError(f"{name}: not an avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, f)
    sync = f.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"{name}: unsupported avro codec {codec!r}")

    records: list[dict] = []
    while True:
        head = f.read(1)
        if not head:
            break  # clean EOF at a block boundary
        f.seek(-1, os.SEEK_CUR)
        count = _read_long(f)
        block = _read_bytes(f)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        buf = io.BytesIO(block)
        for _ in range(count):
            records.append(_decode(schema, buf))
        if f.read(16) != sync:
            raise ValueError(f"{name}: sync marker mismatch")
    return records


def write_avro(path: str, schema: dict, records: list[dict]) -> None:
    """Write records as a single-block, null-codec object container file."""
    sync = b"\x00" * 8 + b"cloudfloe"[:8]  # deterministic marker
    body = io.BytesIO()
    for r in records:
        _encode(schema, r, body)
    data = body.getvalue()
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null",
        }
        head = io.BytesIO()
        _encode({"type": "map", "values": "bytes"}, meta, head)
        f.write(head.getvalue())
        f.write(sync)
        out = io.BytesIO()
        _write_long(out, len(records))
        _write_long(out, len(data))
        f.write(out.getvalue())
        f.write(data)
        f.write(sync)
