"""Apache DataSketches compact theta sketch codec for Iceberg
statistics files (r12, VERDICT r11 #3; stdlib + numpy only).

The Iceberg spec's StatisticsFile is a Puffin container holding one
``apache-datasketches-theta-v1`` blob per column — a serialized COMPACT
theta sketch (Apache DataSketches portable format, serial version 3)
built by updating the sketch with each value's Iceberg *single-value
serialization* (table-spec Appendix D), with the Puffin spec's two
documented cross-type promotions: ``int`` values hash as ``long`` and
``float`` as ``double``, so the sketch of an int column equals the
sketch of the same values cast to long. This module implements:

- **MurmurHash3 x64 128** (Austin Appleby's public-domain algorithm —
  the DataSketches update hash; seed 9001, DataSketches' default). A
  value's sketch entry is ``h1 >>> 1`` (unsigned), zero excluded.
- **Compact theta sketch serialization** (DataSketches wire format,
  derived from the published preamble layout): little-endian longs;
  preamble byte 0 = preamble-long count, byte 1 = serial version (3),
  byte 2 = family (3, COMPACT), byte 5 = flags (0x02 READ_ONLY,
  0x04 EMPTY, 0x08 COMPACT, 0x10 ORDERED, 0x20 SINGLE_ITEM), bytes
  6-7 = seed hash. Four layouts: EMPTY (1 preamble long, seed hash 0 —
  an empty sketch is seed-agnostic), SINGLE_ITEM (1 preamble long +
  1 hash), EXACT (2 preamble longs: retained count; theta
  implicitly 1.0), ESTIMATION (3 preamble longs: count + theta long).
  Retained hashes are stored ascending (ORDERED).
- **KMV-style accumulation/union**: keep the ``k = 2^lg_k`` smallest
  hashes; past ``k`` distinct, theta becomes the (k+1)-th smallest and
  the estimate is ``count / (theta / 2^63-1)`` — any (hashes < theta,
  theta) pair is a valid theta sketch, and union (min theta, merge,
  re-truncate) is exactly the DataSketches union semantics.

Scale shape: per-partition partial sketches are built inside one
Arrow-batched ``mapInPandas`` pass (values deduped per batch, numpy
fast path for 8-byte fixed-width inputs — the murmur block loop
vanishes for len<16 so the tail+finalization vectorizes); each
partition emits ≤ one (k·8)-byte row per column, and the driver unions
partials. One table scan total, Python cost bounded by per-partition
distinct values, never row count.

Everything shipped to executors is built inside the
``build_partial_sketch_fn`` factory so cloudpickle serializes it BY
VALUE (Spark 4 Arrow UDF workers do not import ``cloudfloe_spark`` —
the r10 finding; only stdlib/numpy/pandas are referenced by name).

Reference parity: the reference engine delegates statistics to DuckDB
and writes none; this surface exists so OTHER Iceberg engines
(Trino/Spark's own procedures) can read this engine's ANALYZE output
and vice versa — the same interop class as the r10/r11 Puffin DV work.
"""

from __future__ import annotations

import struct

DEFAULT_SEED = 9001
DEFAULT_LG_K = 12
LONG_MAX = (1 << 63) - 1  # thetaLong of 1.0

#: version of the single-value serialization feeding the hash. Bumped
#: to 2 when the decimal encoding adopted minimal two's-complement
#: length (Java BigInteger.toByteArray semantics) — blobs hashed under
#: version 1 encode negative exact powers of two differently, so
#: incremental ANALYZE must NOT union partials across versions (the
#: same logical value would count twice). Stamped into the Puffin file
#: properties as ``cloudfloe.hash-encoding``.
HASH_ENCODING_VERSION = 2

_FLAG_READ_ONLY = 0x02
_FLAG_EMPTY = 0x04
_FLAG_COMPACT = 0x08
_FLAG_ORDERED = 0x10
_FLAG_SINGLE_ITEM = 0x20


class ThetaError(ValueError):
    pass


def murmur3_x64_128(data: bytes, seed: int = DEFAULT_SEED):
    """MurmurHash3 x64 128-bit (public-domain reference algorithm),
    returning ``(h1, h2)`` as unsigned 64-bit ints."""
    M = 0xFFFFFFFFFFFFFFFF
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    h1 = seed & M
    h2 = seed & M
    n = len(data)
    nblocks = n // 16

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * c2) & M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M

    tail = data[nblocks * 16:]
    k1 = 0
    k2 = 0
    tl = len(tail)
    for i in range(tl - 1, 7, -1):  # bytes 8..14 → k2
        k2 ^= tail[i] << ((i - 8) * 8)
    if tl > 8:
        k2 = (k2 * c2) & M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
    for i in range(min(tl, 8) - 1, -1, -1):  # bytes 0..7 → k1
        k1 ^= tail[i] << (i * 8)
    if tl > 0:
        k1 = (k1 * c1) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1

    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & M
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & M
        k ^= k >> 33
        return k

    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2


def compute_seed_hash(seed: int = DEFAULT_SEED) -> int:
    """DataSketches seed hash: lower 16 bits of murmur(seed-as-8-LE-bytes,
    seed); zero is forbidden (reserved for the empty sketch)."""
    sh = murmur3_x64_128(struct.pack("<q", seed), seed)[0] & 0xFFFF
    if sh == 0:
        raise ThetaError(f"seed {seed} hashes to the reserved seed-hash 0")
    return sh


def hash_value(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """A value's sketch entry: murmur h1, unsigned-shifted right by 1
    (range [0, 2^63-1]); callers exclude 0 (reserved)."""
    return murmur3_x64_128(data, seed)[0] >> 1


def value_bytes(v, kind: str) -> "bytes | None":
    """Iceberg single-value serialization (table spec Appendix D) with
    the Puffin theta blob's documented promotions (int→long,
    float→double). ``None`` for SQL NULL (never hashed). Kinds:
    ``long`` (any integer), ``double`` (any float; -0.0 canonicalized,
    NaN → canonical quiet-NaN bits), ``string`` (UTF-8), ``boolean``,
    ``date`` (days, 4-byte LE int), ``timestamp`` (micros, 8-byte LE
    long), ``decimal`` (minimal two's-complement big-endian unscaled),
    ``binary`` (raw bytes)."""
    if v is None:
        return None
    if kind == "long":
        return struct.pack("<q", int(v))
    if kind == "double":
        d = float(v)
        if d != d:  # NaN → one canonical image
            return struct.pack("<Q", 0x7FF8000000000000)
        if d == 0.0:
            d = 0.0  # -0.0 and 0.0 hash identically
        return struct.pack("<d", d)
    if kind == "string":
        return str(v).encode("utf-8")
    if kind == "boolean":
        return b"\x01" if v else b"\x00"
    if kind == "date":
        return struct.pack("<i", int(v))
    if kind == "timestamp":
        return struct.pack("<q", int(v))
    if kind.startswith("decimal"):
        # callers pass the UNSCALED integer (Appendix D hashes the
        # unscaled value), or a Decimal plus a "decimal:<scale>" kind
        if not isinstance(v, int):
            import decimal as _decimal

            scale = int(kind.split(":", 1)[1]) if ":" in kind else 0
            v = int(_decimal.Decimal(v).scaleb(scale))
        # Minimal two's-complement length, matching Java
        # BigInteger.toByteArray (Appendix D's reference): for v < 0
        # the sign bit of the top byte carries the sign, so exact
        # negative powers of two (-128, -32768, ...) need one byte
        # FEWER than (bit_length + 8) // 8 would allocate.
        if v >= 0:
            length = v.bit_length() // 8 + 1
        else:
            length = (v + 1).bit_length() // 8 + 1
        return v.to_bytes(length, "big", signed=True)
    if kind == "binary":
        return bytes(v)
    raise ThetaError(f"value_bytes: unknown kind {kind!r}")


def serialize_compact(
    hashes, theta: int = LONG_MAX, *, seed: int = DEFAULT_SEED
) -> bytes:
    """Serialize ``(sorted-ascending hashes < theta, theta)`` as a
    compact ordered theta sketch (DataSketches wire format v3)."""
    hs = sorted(int(h) for h in hashes)
    if hs and (hs[0] <= 0 or hs[-1] >= theta):
        raise ThetaError("retained hashes must lie in (0, theta)")
    if not hs and theta == LONG_MAX:
        # EMPTY: one preamble long, seed hash 0 (seed-agnostic)
        return struct.pack("<BBBBBBH", 1, 3, 3, 0, 0,
                           _FLAG_READ_ONLY | _FLAG_EMPTY
                           | _FLAG_COMPACT | _FLAG_ORDERED, 0)
    sh = compute_seed_hash(seed)
    if len(hs) == 1 and theta == LONG_MAX:
        pre = struct.pack("<BBBBBBH", 1, 3, 3, 0, 0,
                          _FLAG_READ_ONLY | _FLAG_COMPACT
                          | _FLAG_ORDERED | _FLAG_SINGLE_ITEM, sh)
        return pre + struct.pack("<q", hs[0])
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if theta == LONG_MAX:
        pre = struct.pack("<BBBBBBH", 2, 3, 3, 0, 0, flags, sh)
        body = struct.pack("<II", len(hs), 0)
    else:
        pre = struct.pack("<BBBBBBH", 3, 3, 3, 0, 0, flags, sh)
        body = struct.pack("<II", len(hs), 0) + struct.pack("<q", theta)
    return pre + body + struct.pack(f"<{len(hs)}q", *hs)


def deserialize_compact(
    buf: bytes, *, seed: int = DEFAULT_SEED
) -> "tuple[list[int], int]":
    """Decode a compact theta sketch → ``(sorted hashes, theta)``.
    Accepts empty / single-item / exact / estimation layouts and
    unordered images (sorted on read); rejects other families, serial
    versions, and seed-hash mismatches."""
    if len(buf) < 8:
        raise ThetaError("theta sketch: truncated preamble")
    pre_longs, ser_ver, family, _lgn, _lga, flags, sh = struct.unpack_from(
        "<BBBBBBH", buf, 0
    )
    if ser_ver != 3:
        raise ThetaError(f"theta sketch: serial version {ser_ver}, want 3")
    if family != 3:
        raise ThetaError(f"theta sketch: family {family}, want 3 (COMPACT)")
    if flags & _FLAG_EMPTY:
        return [], LONG_MAX
    if sh != compute_seed_hash(seed):
        raise ThetaError(
            "theta sketch: seed hash mismatch (built with a different "
            f"update seed than {seed})"
        )
    if flags & _FLAG_SINGLE_ITEM or (
        pre_longs == 1 and len(buf) >= 16
    ):
        (h,) = struct.unpack_from("<q", buf, 8)
        return [h], LONG_MAX
    if pre_longs == 2:
        (count,) = struct.unpack_from("<I", buf, 8)
        theta = LONG_MAX
        off = 16
    elif pre_longs == 3:
        (count,) = struct.unpack_from("<I", buf, 8)
        (theta,) = struct.unpack_from("<q", buf, 16)
        off = 24
    else:
        raise ThetaError(f"theta sketch: bad preamble longs {pre_longs}")
    if len(buf) < off + 8 * count:
        raise ThetaError("theta sketch: truncated retained entries")
    hs = sorted(struct.unpack_from(f"<{count}q", buf, off))
    if hs and (hs[0] <= 0 or hs[-1] >= theta):
        raise ThetaError("theta sketch: retained hash outside (0, theta)")
    return hs, theta


def sketch_union(
    parts: "list[tuple[list[int], int]]", *, lg_k: int = DEFAULT_LG_K
) -> "tuple[list[int], int]":
    """Union partial sketches: min theta, merge + dedup below it,
    re-truncate to the k smallest (theta ← the (k+1)-th smallest)."""
    k = 1 << lg_k
    theta = min([t for _, t in parts], default=LONG_MAX)
    merged = sorted({h for hs, _ in parts for h in hs if h < theta})
    if len(merged) > k:
        theta = merged[k]
        merged = merged[:k]
    return merged, theta


def estimate(hashes, theta: int) -> float:
    """NDV estimate: exact count when theta is 1.0, else
    ``count / (theta / LONG_MAX)``."""
    n = len(hashes)
    if theta >= LONG_MAX:
        return float(n)
    return n * (LONG_MAX / theta)


def spark_kind(dtype: str) -> "str | None":
    """Map a Spark simple dtype string to a hashing kind, or None for
    types the theta blob spec has no single-value serialization for."""
    t = dtype.lower()
    if t in ("bigint", "int", "smallint", "tinyint"):
        return "long"
    if t in ("double", "float"):
        return "double"
    if t == "string":
        return "string"
    if t == "boolean":
        return "boolean"
    if t == "date":
        return "date"
    if t in ("timestamp", "timestamp_ntz"):
        return "timestamp"
    if t.startswith("decimal"):
        # carry the column scale: Appendix D hashes the UNSCALED value
        scale = 0
        if "," in t:
            scale = int(t.rsplit(",", 1)[1].rstrip(")"))
        return f"decimal:{scale}"
    if t == "binary":
        return "binary"
    return None


def build_partial_sketch_fn(
    col_kinds: "list[tuple[str, str]]",
    *,
    lg_k: int = DEFAULT_LG_K,
    seed: int = DEFAULT_SEED,
    file_col: "str | None" = None,
):
    """Factory for the ``mapInPandas`` partial-sketch function — fully
    self-contained (stdlib + numpy + pandas locals only; see module
    docstring). Output rows: one per column per partition,
    ``(column, rows, nulls, theta, hashes)`` where ``hashes`` packs the
    retained entries as little-endian int64.

    Output schema DDL: ``column STRING, rows BIGINT, nulls BIGINT,
    theta BIGINT, hashes BINARY``.

    ``file_col`` (r14, VERDICT r13 #7): name of an extra string column
    carrying each row's source data-file path; partials are then keyed
    per (file, column) — output schema :data:`FILE_PARTIAL_SCHEMA`
    (``file`` leads) — so the driver can cache per-FILE sketches and a
    later ANALYZE after a removal unions surviving files' cached
    partials instead of rescanning them. Theta union is exact and
    order-independent, so per-file partials union bit-identically to
    the single-pass sketch."""
    import datetime as _dt
    import struct as _struct

    specs = list(col_kinds)
    k = 1 << lg_k
    long_max = (1 << 63) - 1
    M = 0xFFFFFFFFFFFFFFFF
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F

    def _mm_h1(data: bytes) -> int:
        # murmur3_x64_128 h1 (same algorithm as the module-level
        # function, inlined so the closure pickles by value)
        h1 = seed & M
        h2 = seed & M
        n = len(data)
        for i in range(n // 16):
            k1, k2 = _struct.unpack_from("<QQ", data, i * 16)
            k1 = (k1 * c1) & M
            k1 = ((k1 << 31) | (k1 >> 33)) & M
            k1 = (k1 * c2) & M
            h1 ^= k1
            h1 = ((h1 << 27) | (h1 >> 37)) & M
            h1 = (h1 + h2) & M
            h1 = (h1 * 5 + 0x52DCE729) & M
            k2 = (k2 * c2) & M
            k2 = ((k2 << 33) | (k2 >> 31)) & M
            k2 = (k2 * c1) & M
            h2 ^= k2
            h2 = ((h2 << 31) | (h2 >> 33)) & M
            h2 = (h2 + h1) & M
            h2 = (h2 * 5 + 0x38495AB5) & M
        tail = data[(n // 16) * 16:]
        tl = len(tail)
        k1 = 0
        k2 = 0
        for i in range(tl - 1, 7, -1):
            k2 ^= tail[i] << ((i - 8) * 8)
        if tl > 8:
            k2 = (k2 * c2) & M
            k2 = ((k2 << 33) | (k2 >> 31)) & M
            k2 = (k2 * c1) & M
            h2 ^= k2
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 ^= tail[i] << (i * 8)
        if tl > 0:
            k1 = (k1 * c1) & M
            k1 = ((k1 << 31) | (k1 >> 33)) & M
            k1 = (k1 * c2) & M
            h1 ^= k1
        h1 ^= n
        h2 ^= n
        h1 = (h1 + h2) & M
        h2 = (h2 + h1) & M
        h1 ^= h1 >> 33
        h1 = (h1 * 0xFF51AFD7ED558CCD) & M
        h1 ^= h1 >> 33
        h1 = (h1 * 0xC4CEB9FE1A85EC53) & M
        h1 ^= h1 >> 33
        h2 ^= h2 >> 33
        h2 = (h2 * 0xFF51AFD7ED558CCD) & M
        h2 ^= h2 >> 33
        h2 = (h2 * 0xC4CEB9FE1A85EC53) & M
        h2 ^= h2 >> 33
        h1 = (h1 + h2) & M
        return h1

    def _hash_longs_np(vals):
        # numpy murmur3 x64 128 h1 for 8-byte LE inputs: the 16-byte
        # block loop never runs (len 8 < 16) — only the k1 tail and
        # finalization, which vectorize in uint64 with wraparound.
        import numpy as _np

        with _np.errstate(over="ignore"):
            k1 = vals.astype(_np.uint64, copy=False)
            h1 = _np.full(k1.shape, _np.uint64(seed), dtype=_np.uint64)
            h2 = h1.copy()
            k1 = k1 * _np.uint64(c1)
            k1 = (k1 << _np.uint64(31)) | (k1 >> _np.uint64(33))
            k1 = k1 * _np.uint64(c2)
            h1 = h1 ^ k1
            h1 = h1 ^ _np.uint64(8)
            h2 = h2 ^ _np.uint64(8)
            h1 = h1 + h2
            h2 = h2 + h1
            h1 = h1 ^ (h1 >> _np.uint64(33))
            h1 = h1 * _np.uint64(0xFF51AFD7ED558CCD)
            h1 = h1 ^ (h1 >> _np.uint64(33))
            h1 = h1 * _np.uint64(0xC4CEB9FE1A85EC53)
            h1 = h1 ^ (h1 >> _np.uint64(33))
            h2 = h2 ^ (h2 >> _np.uint64(33))
            h2 = h2 * _np.uint64(0xFF51AFD7ED558CCD)
            h2 = h2 ^ (h2 >> _np.uint64(33))
            h2 = h2 * _np.uint64(0xC4CEB9FE1A85EC53)
            h2 = h2 ^ (h2 >> _np.uint64(33))
            h1 = h1 + h2
            return (h1 >> _np.uint64(1)).astype(_np.int64)

    def _val_bytes(v, kind):
        if kind == "long":
            return _struct.pack("<q", int(v))
        if kind == "double":
            d = float(v)
            if d != d:
                return _struct.pack("<Q", 0x7FF8000000000000)
            if d == 0.0:
                d = 0.0
            return _struct.pack("<d", d)
        if kind == "string":
            return str(v).encode("utf-8")
        if kind == "boolean":
            return b"\x01" if v else b"\x00"
        if kind == "date":
            if isinstance(v, _dt.date):
                v = (v - _dt.date(1970, 1, 1)).days
            return _struct.pack("<i", int(v))
        if kind == "timestamp":
            return _struct.pack("<q", int(v))
        if kind.startswith("decimal"):
            import decimal as _decimal

            scale = int(kind.split(":", 1)[1]) if ":" in kind else 0
            unscaled = int(_decimal.Decimal(v).scaleb(scale))
            # Java BigInteger.toByteArray minimal signed length (see
            # value_bytes): negative exact powers of two fit one byte
            # tighter than the naive (bit_length + 8) // 8.
            if unscaled >= 0:
                length = unscaled.bit_length() // 8 + 1
            else:
                length = (unscaled + 1).bit_length() // 8 + 1
            return unscaled.to_bytes(length, "big", signed=True)
        return bytes(v)  # binary

    def partial(batches):
        import numpy as _np
        import pandas as _pd

        state = {}  # (fkey, col) -> (set, theta)
        rows = {}  # fkey -> row count
        nulls = {}  # (fkey, col) -> null count

        def _compress(hs, theta):
            if len(hs) > 4 * k:
                srt = sorted(hs)
                return set(srt[:k]), srt[k]
            return hs, theta

        def _accumulate(fkey, g):
            rows[fkey] = rows.get(fkey, 0) + len(g)
            for col, kind in specs:
                s = g[col]
                nn = s.dropna()
                nulls[(fkey, col)] = (
                    nulls.get((fkey, col), 0) + len(s) - len(nn)
                )
                if not len(nn):
                    state.setdefault((fkey, col), (set(), long_max))
                    continue
                hs, theta = state.get((fkey, col), (set(), long_max))
                if kind == "long" and str(nn.dtype).startswith(
                    ("int", "uint")
                ):
                    u = _np.unique(nn.to_numpy())
                    hv = _hash_longs_np(u.astype(_np.int64))
                elif kind == "timestamp" and str(nn.dtype).startswith(
                    "datetime64"
                ):
                    u = _np.unique(
                        nn.to_numpy().astype("datetime64[us]")
                        .astype(_np.int64)
                    )
                    hv = _hash_longs_np(u)
                elif kind == "double" and str(nn.dtype).startswith(
                    "float"
                ):
                    u = _np.unique(nn.to_numpy())
                    u = u + 0.0  # -0.0 → 0.0 (NaN dropped by dropna)
                    hv = _hash_longs_np(u.view(_np.int64))
                else:
                    uniq = _pd.unique(nn)
                    hv = [
                        (_mm_h1(_val_bytes(v, kind)) >> 1) for v in uniq
                    ]
                for h in hv:
                    h = int(h)
                    if 0 < h < theta:
                        hs.add(h)
                hs, theta = _compress(hs, theta)
                state[(fkey, col)] = (hs, theta)

        for pdf in batches:
            if file_col is None:
                _accumulate(None, pdf)
            else:
                # parquet batches rarely span files; the groupby is a
                # cheap within-batch split, never a shuffle
                for fkey, g in pdf.groupby(file_col, sort=False):
                    _accumulate(fkey, g)

        out = []
        fkeys = sorted(rows) if file_col is not None else [None]
        for fkey in fkeys:
            for col, _kind in specs:
                hs, theta = state.get((fkey, col), (set(), long_max))
                srt = sorted(hs)
                if len(srt) > k:
                    theta = srt[k]
                    srt = srt[:k]
                rec = (
                    col,
                    rows.get(fkey, 0),
                    nulls.get((fkey, col), 0),
                    theta,
                    _struct.pack(f"<{len(srt)}q", *srt),
                )
                out.append(rec if file_col is None else (fkey,) + rec)
        cols_out = ["column", "rows", "nulls", "theta", "hashes"]
        if file_col is not None:
            cols_out = ["file"] + cols_out
        yield _pd.DataFrame(out, columns=cols_out)

    return partial


PARTIAL_SCHEMA = (
    "column STRING, rows BIGINT, nulls BIGINT, theta BIGINT, hashes BINARY"
)

FILE_PARTIAL_SCHEMA = "file STRING, " + PARTIAL_SCHEMA


def unpack_hashes(buf: bytes) -> "list[int]":
    return list(struct.unpack_from(f"<{len(buf) // 8}q", buf, 0))
