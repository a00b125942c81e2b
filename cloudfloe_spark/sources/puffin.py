"""Puffin file + deletion-vector blob codec (Iceberg v3, stdlib only).

Iceberg format-version 3 replaces per-commit position-delete PARQUET
files with per-data-file DELETION VECTORS: roaring bitmaps of deleted row
positions, stored as ``deletion-vector-v1`` blobs inside a Puffin file
and referenced from content=1 manifest entries via
``referenced_data_file`` / ``content_offset`` / ``content_size_in_bytes``.
This module implements both halves with no dependencies:

- the Puffin container (spec: ``Magic "PFA1" · blobs · Magic ·
  FooterPayload(JSON) · FooterPayloadSize(4, LE) · Flags(4) · Magic``),
- the DV blob layout (``length(4, BE) of magic+vector · magic
  D1 D3 39 64 · 64-bit roaring bitmap, portable serialization ·
  CRC-32 of magic+vector (4, BE)``),
- the RoaringBitmap portable serialization (64-bit: u64 LE bucket count,
  then per bucket a u32 LE high key + the standard 32-bit format; 32-bit:
  both cookies, array / bitmap / run containers on read; array + bitmap
  on write).

Scale shape: a DV names ONE data file's deleted positions — decoding is
delete-set-sized driver work (like reading a position-delete parquet's
footer+rows), never table-scale; the read path applies the decoded
positions through the same broadcast anti-join as v2 position deletes.
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x39\x64"
BLOB_TYPE = "deletion-vector-v1"

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


class PuffinError(ValueError):
    pass


# --- 32-bit roaring ------------------------------------------------------------


def _serialize_rb32(values: list[int]) -> bytes:
    """Serialize sorted u32 values — array containers (≤4096 per 16-bit
    key bucket) or bitmap containers, no-run cookie (the simple writer;
    readers must accept it)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets (always present with the no-run cookie)
    off = len(out) + 4 * len(keys)
    body = bytearray()
    offsets = bytearray()
    for k in keys:
        vals = containers[k]
        offsets += struct.pack("<I", off + len(body))
        if len(vals) <= _ARRAY_MAX:
            body += struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            body += bits
    return bytes(out + offsets + body)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit roaring bitmap at ``pos``; returns (values,
    next_pos). Handles both cookies and array/bitmap/run containers."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    run_bitset = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nbits = (n + 7) // 8
        run_bitset = buf[pos:pos + nbits]
        pos += nbits
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
    else:
        raise PuffinError(f"roaring: unknown cookie {cookie}")
    keys_cards = []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((k, c + 1))
        pos += 4

    def _is_run(i: int) -> bool:
        return bool(
            run_bitset and (run_bitset[i // 8] & (1 << (i % 8)))
        )

    has_offsets = cookie == _SERIAL_COOKIE_NO_RUN or n >= _NO_OFFSET_THRESHOLD
    if has_offsets:
        pos += 4 * n  # container offsets — sequential parse ignores them
    values: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        base = k << 16
        if _is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            bits = buf[pos:pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & -byte
                    values.append(base + byte_i * 8 + low.bit_length() - 1)
                    byte ^= low
    return values, pos


# --- 64-bit portable roaring ---------------------------------------------------


def serialize_positions(positions) -> bytes:
    """Sorted iterable of u64 row positions → portable 64-bit roaring."""
    buckets: dict[int, list[int]] = {}
    for p in sorted(set(int(p) for p in positions)):
        if p < 0:
            raise PuffinError(f"negative position {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for hi in sorted(buckets):
        out += struct.pack("<I", hi)
        out += _serialize_rb32(buckets[hi])
    return bytes(out)


def deserialize_positions(buf: bytes) -> list[int]:
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    values: list[int] = []
    for _ in range(n_buckets):
        (hi,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, pos = _deserialize_rb32(buf, pos)
        values.extend((hi << 32) | v for v in lows)
    return values


# --- DV blob layout ------------------------------------------------------------


def encode_dv_blob(positions) -> bytes:
    vec = serialize_positions(positions)
    body = DV_MAGIC + vec
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def decode_dv_blob(blob: bytes) -> list[int]:
    if len(blob) < 12:
        raise PuffinError("deletion-vector blob too short")
    (length,) = struct.unpack_from(">I", blob, 0)
    body = blob[4:4 + length]
    if body[:4] != DV_MAGIC:
        raise PuffinError("deletion-vector blob: bad magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
        raise PuffinError("deletion-vector blob: CRC mismatch")
    return deserialize_positions(body[4:])


# --- Puffin container ----------------------------------------------------------


def write_puffin(
    path: str,
    blobs: "list[dict]",
    *,
    file_properties: "dict | None" = None,
) -> "list[dict]":
    """Write a generic Puffin container. Each blob dict carries
    ``data`` (bytes) plus its footer BlobMetadata fields (``type``,
    ``fields``, ``snapshot-id``, ``sequence-number``, optional
    ``properties``); offsets/lengths are computed here. Returns the
    footer blob-metadata list (offset/length filled in)."""
    blobs_meta = []
    out = bytearray(MAGIC)
    for b in blobs:
        data = b["data"]
        offset = len(out)
        out += data
        meta = {
            "type": b["type"],
            "fields": list(b.get("fields") or []),
            "snapshot-id": b["snapshot-id"],
            "sequence-number": b["sequence-number"],
            "offset": offset,
            "length": len(data),
        }
        if b.get("properties"):
            meta["properties"] = dict(b["properties"])
        blobs_meta.append(meta)
    payload = json.dumps(
        {"blobs": blobs_meta, "properties": dict(file_properties or {})},
        sort_keys=True,
    ).encode()
    out += MAGIC + payload
    out += struct.pack("<I", len(payload))
    out += struct.pack("<I", 0)  # flags: uncompressed footer
    out += MAGIC
    with open(path, "wb") as f:
        f.write(bytes(out))
    return blobs_meta


def puffin_footer_size(path: str) -> int:
    """The spec's FileFooter length for ``file-footer-size-in-bytes``:
    Magic + FooterPayload + FooterPayloadSize(4) + Flags(4) + Magic."""
    with open(path, "rb") as f:
        data = f.read()
    (psize,) = struct.unpack_from("<I", data, len(data) - 12)
    return 4 + psize + 4 + 4 + 4


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        return f.read(length)


def write_puffin_dvs(
    path: str,
    dvs: "dict[str, list[int]]",
    *,
    snapshot_id: int,
    sequence_number: int,
) -> dict:
    """Write one Puffin file holding a ``deletion-vector-v1`` blob per
    entry of ``dvs`` (referenced data-file path → deleted positions).
    Returns ``{data_file: {"offset", "length", "cardinality"}}`` — what
    the manifest entry needs."""
    blobs = []
    for ref, positions in dvs.items():
        card = len(set(int(p) for p in positions))
        blobs.append(
            {
                "type": BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "data": encode_dv_blob(positions),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(card),
                },
            }
        )
    metas = write_puffin(path, blobs)
    return {
        m["properties"]["referenced-data-file"]: {
            "offset": m["offset"],
            "length": m["length"],
            "cardinality": int(m["properties"]["cardinality"]),
        }
        for m in metas
    }


def read_puffin_footer(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise PuffinError(f"{path}: not a Puffin file")
    (flags,) = struct.unpack_from("<I", data, len(data) - 8)
    if flags & 1:
        raise PuffinError(
            f"{path}: compressed Puffin footer not supported"
        )
    (psize,) = struct.unpack_from("<I", data, len(data) - 12)
    payload = data[len(data) - 12 - psize: len(data) - 12]
    try:
        return json.loads(payload)
    except ValueError as e:
        raise PuffinError(f"{path}: bad footer payload: {e}") from None


def read_deletion_vector(path: str, offset: int, length: int) -> list[int]:
    """Decode the DV blob at (offset, length) — the manifest entry's
    content_offset / content_size_in_bytes."""
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    if len(blob) != length:
        raise PuffinError(
            f"{path}: truncated deletion vector at {offset}+{length}"
        )
    return decode_dv_blob(blob)
