"""Golden-vector conformance tests for the Puffin / deletion-vector /
roaring codec (VERDICT r10 #1): every byte of every expected value in
this file is DERIVED FROM THE PUBLIC SPECS by arithmetic written out
below — never captured from ``sources/puffin.py`` — so these tests fail
if the codec's serialized layout drifts from what OTHER engines read,
even while the codec round-trips against itself perfectly.

Specs used (all public):

- **Puffin container** (Iceberg's Puffin spec): ``Magic "PFA1" · Blobs
  · Magic · FooterPayload (UTF-8 JSON) · FooterPayloadSize (4 bytes,
  little-endian) · Flags (4 bytes; bit 0 of byte 0 = footer payload
  compressed) · Magic``.
- **deletion-vector-v1 blob** (Iceberg v3 spec): ``combined length of
  magic+vector as 4 bytes BIG-endian · magic D1 D3 39 64 · the vector
  as a 64-bit roaring bitmap in "portable" serialization · CRC-32 of
  magic+vector as 4 bytes BIG-endian``.
- **Portable 64-bit roaring** (RoaringFormatSpec): ``number of 32-bit
  buckets as u64 little-endian``, then per bucket in increasing key
  order: ``high 32 bits as u32 LE`` + the standard 32-bit roaring
  serialization of the low 32 bits.
- **Standard 32-bit roaring** (RoaringFormatSpec): without run
  containers: ``SERIAL_COOKIE_NO_RUNCONTAINER=12346 (u32 LE) ·
  container count n (u32 LE) · n descriptive headers (u16 LE 16-bit
  key, u16 LE cardinality-1) · n offsets (u32 LE, byte offset of each
  container FROM THE START of this 32-bit bitmap) · container data``.
  With run containers: ``(SERIAL_COOKIE=12347 | (n-1)<<16) as u32 LE ·
  run bitset of (n+7)//8 bytes (bit i set = container i is a run
  container) · descriptive headers · offsets ONLY when n >=
  NO_OFFSET_THRESHOLD=4 · containers``. Array container (cardinality
  <= 4096): sorted u16 LE values. Bitmap container: 8192 bytes, value
  v sets bit (v & 7) of byte (v >> 3). Run container: number of runs
  as u16 LE, then per run u16 LE start + u16 LE length, covering
  [start, start+length] INCLUSIVE.

CRC-32 here means the standard ISO-HDLC CRC-32 (the one zlib
implements); the hex literals below pin the exact expected words so a
polynomial/endianness regression cannot hide.
"""

from __future__ import annotations

import json
import struct
import zlib

import pytest

from cloudfloe_spark.sources import puffin
from cloudfloe_spark.sources.puffin import (
    PuffinError,
    decode_dv_blob,
    deserialize_positions,
    encode_dv_blob,
    read_deletion_vector,
    read_puffin_footer,
    serialize_positions,
    write_puffin_dvs,
)

DV_MAGIC = b"\xd1\xd3\x39\x64"


# --- spec arithmetic (independent of sources/puffin.py) -----------------------


def spec_rb32_arrays(key_vals: "dict[int, list[int]]") -> bytes:
    """32-bit roaring, all-array-container form, straight from the
    RoaringFormatSpec text quoted in the module docstring."""
    keys = sorted(key_vals)
    out = struct.pack("<ii", 12346, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(key_vals[k]) - 1)
    start = 8 + 4 * len(keys) + 4 * len(keys)  # cookie+count+headers+offsets
    offs, body = b"", b""
    for k in keys:
        offs += struct.pack("<I", start + len(body))
        body += struct.pack(f"<{len(key_vals[k])}H", *key_vals[k])
    return out + offs + body


def spec_rb64(buckets: "dict[int, bytes]") -> bytes:
    """Portable 64-bit wrapper: u64 LE bucket count, then (u32 LE high
    key, 32-bit bitmap) in increasing key order."""
    out = struct.pack("<Q", len(buckets))
    for hi in sorted(buckets):
        out += struct.pack("<I", hi) + buckets[hi]
    return out


def spec_dv_blob(vector: bytes) -> bytes:
    """deletion-vector-v1: BE length of magic+vector, magic, vector,
    BE CRC-32 of magic+vector."""
    body = DV_MAGIC + vector
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


# --- golden WRITE vectors ------------------------------------------------------

# Vector A — positions {0, 1, 4, 1000}: one u64 bucket (high key 0),
# one array container (16-bit key 0, cardinality 4). Walking the spec:
#   u64 LE 1                      01 00 00 00 00 00 00 00
#   u32 LE 0 (high key)           00 00 00 00
#   u32 LE 12346 (cookie)         3a 30 00 00
#   u32 LE 1  (container count)   01 00 00 00
#   u16 LE 0, u16 LE 3 (card-1)   00 00 03 00
#   u32 LE 16 (container offset:  10 00 00 00
#      8 header + 4 descriptive + 4 offset bytes)
#   u16 LE 0,1,4,1000             00 00 01 00 04 00 e8 03
GOLDEN_A_RB64 = bytes.fromhex(
    "0100000000000000" "00000000" "3a300000" "01000000"
    "00000300" "10000000" "0000" "0100" "0400" "e803"
)
# blob framing: len(magic+vector) = 4 + 36 = 40 = BE 00 00 00 28;
# CRC-32(magic+vector) = 0xf1f8e74a (ISO-HDLC), stored big-endian.
GOLDEN_A_BLOB = bytes.fromhex(
    "00000028" "d1d33964"
    "0100000000000000" "00000000" "3a300000" "01000000"
    "00000300" "10000000" "0000" "0100" "0400" "e803"
    "f1f8e74a"
)

# Vector B — the EMPTY vector: zero u64 buckets. Vector = 8 zero bytes,
# blob length = 4 + 8 = 12, CRC-32(D1D33964 + 8x00) = 0xbf18480c.
GOLDEN_B_BLOB = bytes.fromhex(
    "0000000c" "d1d33964" "0000000000000000" "bf18480c"
)

# Vector E — a RUN-container bitmap the reader must accept (the writer
# never emits runs; other engines do). Values 10..20 and 100..102 in
# bucket 0: cookie word = 12347 | (1-1)<<16 = 3b 30 00 00; run bitset
# 1 byte = 01; descriptive header key 0, card-1 = 13 (14 values);
# NO offsets (1 container < threshold 4); container = u16 LE run count
# 2, runs (10, len 10) and (100, len 2) — INCLUSIVE lengths.
GOLDEN_E_BLOB = bytes.fromhex(
    "00000023" "d1d33964"
    "0100000000000000" "00000000"
    "3b300000" "01" "0000" "0d00"
    "0200" "0a00" "0a00" "6400" "0200"
    "f5b1fe07"
)
GOLDEN_E_POSITIONS = list(range(10, 21)) + [100, 101, 102]


def test_write_vector_a_single_array_container():
    assert serialize_positions([0, 1, 4, 1000]) == GOLDEN_A_RB64
    assert encode_dv_blob([0, 1, 4, 1000]) == GOLDEN_A_BLOB
    # unsorted / duplicated input must serialize identically (the spec
    # format is canonical: sorted unique values)
    assert encode_dv_blob([1000, 4, 1, 0, 4, 0]) == GOLDEN_A_BLOB
    assert decode_dv_blob(GOLDEN_A_BLOB) == [0, 1, 4, 1000]


def test_write_vector_b_empty():
    assert encode_dv_blob([]) == GOLDEN_B_BLOB
    assert decode_dv_blob(GOLDEN_B_BLOB) == []


def test_write_vector_c_bitmap_container():
    """4097 values in one 16-bit bucket exceeds the 4096 array maximum:
    the spec requires a BITMAP container — 8192 bytes, value v sets bit
    (v & 7) of byte (v >> 3). Evens 0..8192 give bytes of 0x55 for
    0..1023 and a lone 0x01 at byte 1024."""
    vals = list(range(0, 8193, 2))
    bits = bytearray(8192)
    for v in vals:
        bits[v >> 3] |= 1 << (v & 7)
    assert bits[:1024] == b"\x55" * 1024 and bits[1024] == 0x01
    assert not any(bits[1025:])
    expected = spec_rb64(
        {
            0: struct.pack("<ii", 12346, 1)
            + struct.pack("<HH", 0, 4096)  # cardinality-1 = 4096
            + struct.pack("<I", 16)
            + bytes(bits)
        }
    )
    assert serialize_positions(vals) == expected
    assert deserialize_positions(expected) == vals
    assert decode_dv_blob(spec_dv_blob(expected)) == vals


def test_write_vector_d_multi_bucket_u64():
    """Positions above 2^32 split into multiple high-key buckets — the
    portable 64-bit wrapper, exercised across three buckets."""
    pos = [5, (1 << 32) + 7, (3 << 32) + 1]
    expected = spec_rb64(
        {
            0: spec_rb32_arrays({0: [5]}),
            1: spec_rb32_arrays({0: [7]}),
            3: spec_rb32_arrays({0: [1]}),
        }
    )
    assert serialize_positions(pos) == expected
    assert deserialize_positions(expected) == pos
    # pin the full hex so bucket ordering/endianness can't drift:
    # u64 LE 3, then per bucket (u32 LE high key, cookie 12346, count 1,
    # header, offset 16, one u16 value)
    assert expected.hex() == (
        "0300000000000000"
        "00000000" "3a300000" "01000000" "00000000" "10000000" "0500"
        "01000000" "3a300000" "01000000" "00000000" "10000000" "0700"
        "03000000" "3a300000" "01000000" "00000000" "10000000" "0100"
    )


def test_write_vector_d_boundary_positions():
    """Bucket/container boundary values: 0xFFFFFFFF is the LAST value of
    high bucket 0 (16-bit key 0xFFFF, low value 0xFFFF); 2^32 is the
    FIRST of bucket 1."""
    pos = [0xFFFFFFFF, 1 << 32]
    expected = spec_rb64(
        {
            0: spec_rb32_arrays({0xFFFF: [0xFFFF]}),
            1: spec_rb32_arrays({0: [0]}),
        }
    )
    assert serialize_positions(pos) == expected
    assert deserialize_positions(expected) == pos


def test_reader_accepts_run_containers():
    """The simple writer never emits run containers, but any engine
    following the spec's size heuristics will — the reader must decode
    them (hand-assembled golden bytes, inclusive run lengths)."""
    assert decode_dv_blob(GOLDEN_E_BLOB) == GOLDEN_E_POSITIONS


def test_reader_accepts_run_cookie_with_offsets():
    """With the run cookie AND >= NO_OFFSET_THRESHOLD=4 containers, the
    offset header IS present — a reader that ties offsets to the no-run
    cookie alone misparses. Four containers: key 0 a run (0..4), keys
    1..3 single-value arrays."""
    n = 4
    rb32 = struct.pack("<I", 12347 | ((n - 1) << 16))
    rb32 += bytes([0x01])  # run bitset: only container 0 is a run
    rb32 += struct.pack("<HH", 0, 4)  # key 0, card-1 (5 values: 0..4)
    for k in (1, 2, 3):
        rb32 += struct.pack("<HH", k, 0)
    start = len(rb32) + 4 * n
    # container sizes: run = 2 + 4*nruns = 6; arrays = 2 bytes each
    rb32 += struct.pack("<4I", start, start + 6, start + 8, start + 10)
    rb32 += struct.pack("<H", 1) + struct.pack("<HH", 0, 4)  # one run 0..4
    rb32 += struct.pack("<H", 9)  # key1 value 9 -> 65536+9
    rb32 += struct.pack("<H", 2)  # key2 value 2 -> 131074
    rb32 += struct.pack("<H", 7)  # key3 value 7 -> 196615
    blob = spec_dv_blob(spec_rb64({0: rb32}))
    assert decode_dv_blob(blob) == [0, 1, 2, 3, 4, 65545, 131074, 196615]


def test_reader_rejects_corruption():
    flipped = bytearray(GOLDEN_A_BLOB)
    flipped[10] ^= 0x01  # flip a vector bit -> CRC must catch it
    with pytest.raises(PuffinError, match="CRC"):
        decode_dv_blob(bytes(flipped))
    bad_magic = bytearray(GOLDEN_A_BLOB)
    bad_magic[4] ^= 0xFF
    with pytest.raises(PuffinError, match="magic"):
        decode_dv_blob(bytes(bad_magic))
    with pytest.raises(PuffinError):
        decode_dv_blob(GOLDEN_A_BLOB[:8])
    # unknown roaring cookie inside an otherwise-valid blob
    rb = struct.pack("<Q", 1) + struct.pack("<I", 0) + struct.pack("<i", 99)
    with pytest.raises(PuffinError, match="cookie"):
        decode_dv_blob(spec_dv_blob(rb))


# --- Puffin container framing ----------------------------------------------------


def _spec_puffin(blobs: "list[tuple[bytes, dict]]") -> bytes:
    """Hand-assemble a Puffin file per the container spec: Magic, blob
    bytes back to back, Magic, JSON payload, u32 LE payload size, u32
    flags (0 = uncompressed), Magic."""
    out = bytearray(b"PFA1")
    metas = []
    for blob, props in blobs:
        metas.append(
            {
                "type": "deletion-vector-v1",
                "fields": [],
                "snapshot-id": 7,
                "sequence-number": 3,
                "offset": len(out),
                "length": len(blob),
                "properties": props,
            }
        )
        out += blob
    payload = json.dumps({"blobs": metas, "properties": {}}).encode()
    out += b"PFA1" + payload
    out += struct.pack("<I", len(payload)) + struct.pack("<I", 0) + b"PFA1"
    return bytes(out)


def test_reader_accepts_hand_assembled_container(tmp_path):
    """A container built from the spec text alone (not by this repo's
    writer) must read: footer JSON parses, and each blob decodes at its
    advertised (offset, length) — exactly how the scan path reads
    content_offset/content_size_in_bytes."""
    p = str(tmp_path / "hand.puffin")
    data = _spec_puffin(
        [
            (GOLDEN_A_BLOB, {"referenced-data-file": "f1.parquet"}),
            (GOLDEN_E_BLOB, {"referenced-data-file": "f2.parquet"}),
        ]
    )
    with open(p, "wb") as f:
        f.write(data)
    footer = read_puffin_footer(p)
    assert [b["properties"]["referenced-data-file"] for b in footer["blobs"]] == [
        "f1.parquet",
        "f2.parquet",
    ]
    b1, b2 = footer["blobs"]
    assert b1["offset"] == 4 and b1["length"] == len(GOLDEN_A_BLOB)
    assert read_deletion_vector(p, b1["offset"], b1["length"]) == [0, 1, 4, 1000]
    assert (
        read_deletion_vector(p, b2["offset"], b2["length"])
        == GOLDEN_E_POSITIONS
    )


def test_reader_rejects_compressed_footer_flag(tmp_path):
    p = str(tmp_path / "flagged.puffin")
    data = bytearray(_spec_puffin([(GOLDEN_B_BLOB, {})]))
    data[-8] |= 0x01  # flags bit 0: footer payload compressed
    with open(p, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(PuffinError, match="compressed"):
        read_puffin_footer(p)


def test_writer_emits_spec_framing(tmp_path):
    """write_puffin_dvs byte-level conformance: the header magic, each
    blob byte-for-byte at its recorded offset, the footer magic, the LE
    payload-size word, zero flags, and the trailing magic — all checked
    against spec arithmetic, none against the codec's own reader."""
    p = str(tmp_path / "written.puffin")
    refs = write_puffin_dvs(
        p,
        {"a.parquet": [0, 1, 4, 1000], "b.parquet": []},
        snapshot_id=11,
        sequence_number=5,
    )
    with open(p, "rb") as f:
        data = f.read()
    assert data[:4] == b"PFA1" and data[-4:] == b"PFA1"
    (flags,) = struct.unpack_from("<I", data, len(data) - 8)
    assert flags == 0
    (psize,) = struct.unpack_from("<I", data, len(data) - 12)
    payload = data[len(data) - 12 - psize : len(data) - 12]
    footer = json.loads(payload)  # valid UTF-8 JSON by construction
    # the Magic that separates blobs from the footer payload
    assert data[len(data) - 12 - psize - 4 : len(data) - 12 - psize] == b"PFA1"
    # blob regions equal the GOLDEN bytes at the returned coordinates
    ra, rb = refs["a.parquet"], refs["b.parquet"]
    assert data[ra["offset"] : ra["offset"] + ra["length"]] == GOLDEN_A_BLOB
    assert data[rb["offset"] : rb["offset"] + rb["length"]] == GOLDEN_B_BLOB
    assert ra["cardinality"] == 4 and rb["cardinality"] == 0
    # footer metadata mirrors the same coordinates + required fields
    by_ref = {
        b["properties"]["referenced-data-file"]: b for b in footer["blobs"]
    }
    assert by_ref["a.parquet"]["offset"] == ra["offset"]
    assert by_ref["a.parquet"]["length"] == ra["length"]
    assert by_ref["a.parquet"]["type"] == "deletion-vector-v1"
    assert by_ref["a.parquet"]["snapshot-id"] == 11
    assert by_ref["a.parquet"]["sequence-number"] == 5
    assert by_ref["a.parquet"]["properties"]["cardinality"] == "4"
    # first blob starts immediately after the 4-byte header magic
    assert min(r["offset"] for r in refs.values()) == 4
