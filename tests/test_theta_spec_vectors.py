"""Golden spec vectors for the theta sketch codec (r12, VERDICT r11
#3) — same discipline as ``test_puffin_spec_vectors.py``: every
expected byte is derived IN THIS FILE from the public specs, never
captured from the codec, so a layout drift that round-trips against
itself still fails here.

Sources (all public):
- MurmurHash3 x64 128: Austin Appleby's reference algorithm; the
  expected digests below are the widely published smhasher vectors.
- DataSketches compact theta wire format (serial version 3, family 3):
  the published preamble layout — see ``sources/theta.py`` docstring.
- Iceberg Puffin spec, blob type ``apache-datasketches-theta-v1``:
  values hashed via the table spec's Appendix D single-value
  serialization with int→long / float→double promotion.
"""

from __future__ import annotations

import struct

import pytest

from cloudfloe_spark.sources import theta as T

LONG_MAX = (1 << 63) - 1


# ---------------------------------------------------------------------------
# MurmurHash3 x64 128 — public vectors
# ---------------------------------------------------------------------------


def test_murmur3_empty_seed0():
    assert T.murmur3_x64_128(b"", 0) == (0, 0)


@pytest.mark.parametrize(
    "data,h1,h2",
    [
        # h1/h2 as unsigned 64-bit ints; the commonly quoted hex digest
        # "cbd8a7b341bd9b02 5b1e906a48ae1d19" prints h1 then h2
        (b"hello", 0xCBD8A7B341BD9B02, 0x5B1E906A48AE1D19),
        (b"hello, world", 0x342FAC623A5EBC8E, 0x4CDCBC079642414D),
        # 44 bytes — exercises two full 16-byte blocks + a 12-byte tail
        (
            b"The quick brown fox jumps over the lazy dog",
            0xE34BBC7BBC071B6C,
            0x7A433CA9C49A9347,
        ),
    ],
)
def test_murmur3_known_vectors(data, h1, h2):
    assert T.murmur3_x64_128(data, 0) == (h1, h2)


def test_murmur3_block_boundary_lengths():
    # 15/16/17 bytes hit tail-only, block-only, block+1 paths; the
    # function must differ across them (sanity on the fall-through)
    outs = {T.murmur3_x64_128(b"a" * n, 9001) for n in (15, 16, 17)}
    assert len(outs) == 3


def test_seed_hash_definition():
    # computeSeedHash(seed) = low 16 bits of murmur(seed as 8 LE bytes,
    # seeded with seed itself)
    expect = T.murmur3_x64_128(struct.pack("<q", 9001), 9001)[0] & 0xFFFF
    assert T.compute_seed_hash(9001) == expect
    assert T.compute_seed_hash() == expect  # 9001 is the default


def test_hash_value_is_h1_ushr_1():
    data = b"\x2a\x00\x00\x00\x00\x00\x00\x00"  # long 42, Appendix D
    h1 = T.murmur3_x64_128(data, 9001)[0]
    assert T.hash_value(data) == h1 >> 1
    assert 0 <= T.hash_value(data) <= LONG_MAX


# ---------------------------------------------------------------------------
# Single-value serialization (Iceberg Appendix D + Puffin promotions)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "v,kind,expect",
    [
        (42, "long", b"\x2a" + b"\x00" * 7),  # int promotes to long
        (-1, "long", b"\xff" * 8),
        (1.0, "double", struct.pack("<d", 1.0)),
        (True, "boolean", b"\x01"),
        (False, "boolean", b"\x00"),
        ("iceberg", "string", b"iceberg"),
        ("é", "string", b"\xc3\xa9"),  # UTF-8, not latin-1
        (19000, "date", struct.pack("<i", 19000)),  # 4-byte LE days
        (1700000000000000, "timestamp", struct.pack("<q", 1700000000000000)),
        (123, "decimal", b"\x7b"),  # unscaled, minimal big-endian
        (-1, "decimal", b"\xff"),
        (128, "decimal", b"\x00\x80"),  # sign byte required
        # negative exact powers of two: BigInteger.toByteArray packs
        # -2^(8k-1) into k bytes (the sign bit IS the top payload bit)
        (-128, "decimal", b"\x80"),
        (-129, "decimal", b"\xff\x7f"),
        (-32768, "decimal", b"\x80\x00"),
        (-256, "decimal", b"\xff\x00"),
        (b"\x01\x02", "binary", b"\x01\x02"),
    ],
)
def test_single_value_bytes(v, kind, expect):
    assert T.value_bytes(v, kind) == expect


def test_double_canonicalization():
    assert T.value_bytes(-0.0, "double") == T.value_bytes(0.0, "double")
    assert T.value_bytes(float("nan"), "double") == struct.pack(
        "<Q", 0x7FF8000000000000
    )
    assert T.value_bytes(None, "long") is None


def test_decimal_kind_with_scale():
    import decimal

    # Decimal('1.23') at scale 2 hashes its unscaled value 123
    assert T.value_bytes(decimal.Decimal("1.23"), "decimal:2") == b"\x7b"


# ---------------------------------------------------------------------------
# Compact theta sketch wire format — hand-assembled images
# ---------------------------------------------------------------------------


def _pre(pre_longs, flags, seed_hash):
    return struct.pack("<BBBBBBH", pre_longs, 3, 3, 0, 0, flags, seed_hash)


def test_empty_sketch_exact_bytes():
    # EMPTY: 8 bytes, preLongs=1, serVer=3, family=3, flags =
    # READ_ONLY|EMPTY|COMPACT|ORDERED = 0x1E, seed hash 0
    assert T.serialize_compact([]) == bytes.fromhex("0103030000" "1e" "0000")


def test_single_item_sketch_bytes():
    h = T.hash_value(T.value_bytes(7, "long"))
    # SINGLE_ITEM: preLongs=1, flags = READ_ONLY|COMPACT|ORDERED|
    # SINGLE_ITEM = 0x3A, real seed hash, then the one hash long
    expect = _pre(1, 0x3A, T.compute_seed_hash()) + struct.pack("<q", h)
    assert T.serialize_compact([h]) == expect
    assert T.deserialize_compact(expect) == ([h], LONG_MAX)


def test_exact_mode_sketch_bytes():
    hs = sorted(T.hash_value(T.value_bytes(v, "long")) for v in (1, 2, 3))
    # EXACT: preLongs=2, flags = READ_ONLY|COMPACT|ORDERED = 0x1A,
    # long 1 = retained count (u32 LE) + 4 zero bytes, hashes ascending
    expect = (
        _pre(2, 0x1A, T.compute_seed_hash())
        + struct.pack("<II", 3, 0)
        + struct.pack("<3q", *hs)
    )
    assert T.serialize_compact(hs) == expect
    assert T.deserialize_compact(expect) == (hs, LONG_MAX)


def test_estimation_mode_sketch_bytes():
    theta = LONG_MAX // 2
    hs = sorted(
        h
        for h in (
            T.hash_value(T.value_bytes(v, "long")) for v in range(20)
        )
        if h < theta
    )
    # ESTIMATION: preLongs=3, long 2 = theta
    expect = (
        _pre(3, 0x1A, T.compute_seed_hash())
        + struct.pack("<II", len(hs), 0)
        + struct.pack("<q", theta)
        + struct.pack(f"<{len(hs)}q", *hs)
    )
    assert T.serialize_compact(hs, theta) == expect
    assert T.deserialize_compact(expect) == (hs, theta)


def test_reader_accepts_unordered_exact_image():
    hs = [T.hash_value(T.value_bytes(v, "long")) for v in (1, 2, 3)]
    img = (
        _pre(2, 0x1A, T.compute_seed_hash())
        + struct.pack("<II", 3, 0)
        + struct.pack("<3q", hs[2], hs[0], hs[1])
    )
    assert T.deserialize_compact(img) == (sorted(hs), LONG_MAX)


def test_reader_rejects():
    ok = T.serialize_compact(
        [T.hash_value(T.value_bytes(1, "long"))]
    )
    bad_ver = bytearray(ok)
    bad_ver[1] = 2
    with pytest.raises(T.ThetaError, match="serial version"):
        T.deserialize_compact(bytes(bad_ver))
    bad_fam = bytearray(ok)
    bad_fam[2] = 1
    with pytest.raises(T.ThetaError, match="family"):
        T.deserialize_compact(bytes(bad_fam))
    bad_seed = bytearray(ok)
    bad_seed[6] ^= 0xFF
    with pytest.raises(T.ThetaError, match="seed hash"):
        T.deserialize_compact(bytes(bad_seed))
    with pytest.raises(T.ThetaError, match="truncated"):
        T.deserialize_compact(ok[:4])
    exact = T.serialize_compact(
        sorted(T.hash_value(T.value_bytes(v, "long")) for v in (1, 2, 3))
    )
    with pytest.raises(T.ThetaError, match="truncated"):
        T.deserialize_compact(exact[:-8])
    with pytest.raises(T.ThetaError):
        T.serialize_compact([0])  # 0 is reserved
    with pytest.raises(T.ThetaError):
        T.serialize_compact([10], 10)  # hash must be < theta


def test_empty_image_is_seed_agnostic():
    # readers must not seed-check the empty sketch (its seed hash is 0)
    assert T.deserialize_compact(T.serialize_compact([]), seed=123) == (
        [],
        LONG_MAX,
    )


# ---------------------------------------------------------------------------
# Estimate / union semantics
# ---------------------------------------------------------------------------


def test_exact_mode_estimate_is_exact():
    hs = {T.hash_value(T.value_bytes(v, "long")) for v in range(1000)}
    assert len(hs) == 1000  # no collisions over a small domain
    assert T.estimate(sorted(hs), LONG_MAX) == 1000.0


def test_estimation_mode_estimate_within_bounds():
    lg_k = 8  # k=256 to force estimation cheaply
    hs = sorted(
        T.hash_value(T.value_bytes(v, "long")) for v in range(10_000)
    )
    retained, theta = T.sketch_union([(hs, LONG_MAX)], lg_k=lg_k)
    assert len(retained) == 256 and theta < LONG_MAX
    est = T.estimate(retained, theta)
    # theta sketch RSE ≈ 1/sqrt(k) ≈ 6.25%; allow 4 sigma
    assert abs(est - 10_000) < 10_000 * 0.25


def test_union_of_partials_equals_single_sketch():
    a = sorted(T.hash_value(T.value_bytes(v, "long")) for v in range(500))
    b = sorted(
        T.hash_value(T.value_bytes(v, "long")) for v in range(250, 750)
    )
    u_hs, u_theta = T.sketch_union([(a, LONG_MAX), (b, LONG_MAX)])
    direct = sorted(
        T.hash_value(T.value_bytes(v, "long")) for v in range(750)
    )
    assert (u_hs, u_theta) == (direct, LONG_MAX)
    assert T.estimate(u_hs, u_theta) == 750.0


def test_union_respects_min_theta():
    theta = LONG_MAX // 3
    a = [h for h in range(1, 100) if h < theta]  # synthetic tiny hashes
    hs, t = T.sketch_union([(a, theta), ([theta + 5], LONG_MAX)])
    assert t == theta and (theta + 5) not in hs


# ---------------------------------------------------------------------------
# Executor closure: numpy fast path == scalar path, self-containment
# ---------------------------------------------------------------------------


def _run_partial(specs, pdf):
    import pandas as pd  # noqa: F401

    fn = T.build_partial_sketch_fn(specs)
    (out,) = list(fn([pdf]))
    return {
        r["column"]: (
            int(r["rows"]),
            int(r["nulls"]),
            int(r["theta"]),
            T.unpack_hashes(r["hashes"]),
        )
        for _, r in out.iterrows()
    }


def test_partial_fn_numpy_matches_scalar():
    import numpy as np
    import pandas as pd

    longs = np.array([0, 1, -1, 2**62, -(2**62), 42], dtype=np.int64)
    doubles = np.array([0.0, -0.0, 1.5, -2.25], dtype=np.float64)
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00.000001", "2024-06-30 12:00:00"],
        format="ISO8601",
    )
    n = 6
    pdf = pd.DataFrame(
        {
            "l": list(longs),
            "d": list(doubles) + [np.nan, np.nan],
            "t": list(ts) * 3,
            "s": ["a", "b", None, "a", "b", "é"],
        }
    )
    out = _run_partial(
        [("l", "long"), ("d", "double"), ("t", "timestamp"),
         ("s", "string")],
        pdf,
    )
    rows, nulls, theta, hs = out["l"]
    assert rows == n and nulls == 0 and theta == LONG_MAX
    assert hs == sorted(
        T.hash_value(T.value_bytes(int(v), "long")) for v in longs
    )
    _, nulls_d, _, hs_d = out["d"]
    assert nulls_d == 2  # NaN dropped like NULL
    assert hs_d == sorted(
        {T.hash_value(T.value_bytes(float(v), "double")) for v in doubles}
    )
    _, _, _, hs_t = out["t"]
    micros = [int(x.value // 1000) for x in ts]
    assert hs_t == sorted(
        T.hash_value(T.value_bytes(m, "timestamp")) for m in micros
    )
    _, nulls_s, _, hs_s = out["s"]
    assert nulls_s == 1
    assert hs_s == sorted(
        T.hash_value(T.value_bytes(s, "string")) for s in ("a", "b", "é")
    )


def test_partial_fn_decimal_matches_scalar_incl_neg_pow2():
    import decimal

    import pandas as pd

    vals = [
        decimal.Decimal("-1.28"),   # unscaled -128 = -2^7 → 1 byte
        decimal.Decimal("1.28"),
        decimal.Decimal("-327.68"),  # unscaled -32768 = -2^15 → 2 bytes
        decimal.Decimal("0.00"),
        decimal.Decimal("-0.01"),
    ]
    pdf = pd.DataFrame({"dec": vals})
    out = _run_partial([("dec", "decimal:2")], pdf)
    rows, nulls, theta, hs = out["dec"]
    assert rows == len(vals) and nulls == 0 and theta == LONG_MAX
    assert hs == sorted(
        T.hash_value(T.value_bytes(v, "decimal:2")) for v in vals
    )
    # pin the conformant byte images through the driver-side path too
    assert T.value_bytes(decimal.Decimal("-1.28"), "decimal:2") == b"\x80"
    assert (
        T.value_bytes(decimal.Decimal("-327.68"), "decimal:2")
        == b"\x80\x00"
    )


def test_partial_fn_pickles_by_value(tmp_path):
    """The mapInPandas closure must load and run in a worker that
    CANNOT import cloudfloe_spark (Spark 4 Arrow UDF workers don't ship
    the package) — proven in a subprocess with the repo off sys.path."""
    import subprocess
    import sys

    from pyspark.serializers import CloudPickleSerializer

    fn = T.build_partial_sketch_fn([("x", "long")])
    payload = tmp_path / "fn.pkl"
    payload.write_bytes(CloudPickleSerializer().dumps(fn))
    expected = sorted(
        T.hash_value(T.value_bytes(v, "long")) for v in (1, 2)
    )
    script = f"""
import sys
sys.path = [p for p in sys.path if 'repo' not in p]
sys.modules['cloudfloe_spark'] = None  # any import attempt explodes
import pickle, struct
import pandas as pd
fn = pickle.load(open({str(payload)!r}, 'rb'))
(out,) = list(fn([pd.DataFrame({{'x': [1, 2, 2]}})]))
hs = list(struct.unpack_from(
    '<%dq' % (len(out.iloc[0]['hashes']) // 8), out.iloc[0]['hashes']))
assert hs == {expected!r}, hs
print('SELF_CONTAINED_OK')
"""
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert "SELF_CONTAINED_OK" in res.stdout, (res.stdout, res.stderr)


def test_spark_kind_mapping():
    assert T.spark_kind("bigint") == "long"
    assert T.spark_kind("int") == "long"  # Puffin promotion
    assert T.spark_kind("float") == "double"
    assert T.spark_kind("decimal(10,2)") == "decimal:2"
    assert T.spark_kind("timestamp_ntz") == "timestamp"
    assert T.spark_kind("array<int>") is None
    assert T.spark_kind("map<string,int>") is None
