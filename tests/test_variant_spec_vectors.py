"""Golden byte vectors for the variant codec (r12, VERDICT r11 #1) —
the same discipline as ``test_puffin_spec_vectors.py``: every expected
byte below is HAND-DERIVED from the public Parquet variant binary
encoding spec in this file (never captured from the codec), so a layout
drift that round-trips against itself still fails here.

Layout recap (full table in ``cloudfloe_spark/functions/variant.py``):
metadata = header(version=1 | sorted<<4 | (offset_size-1)<<6), size,
offsets, name bytes; value first byte = basic_type(bits 0-1) |
value_header(bits 2-7); objects store sorted-by-name field ids +
offsets; primitives little-endian (uuid big-endian)."""

from __future__ import annotations

import datetime
import struct
import uuid
from decimal import Decimal

import pytest

from cloudfloe_spark.functions.variant import (
    decode_variant,
    encode_variant,
    variant_to_json,
)

UTC = datetime.timezone.utc


# --- writer vectors: encoder must emit EXACTLY these bytes -------------------


def test_metadata_bytes_simple_dict():
    # keys {"a","b"}: header = version 1 | sorted(0x10) | (osz=1-1)<<6
    md, _ = encode_variant({"a": 1, "b": "hi"})
    assert md == bytes(
        [0x11, 0x02, 0x00, 0x01, 0x02]
    ) + b"ab"


def test_metadata_bytes_empty_dict():
    # a pure-array value has an EMPTY dictionary: size 0, one offset (0)
    md, _ = encode_variant([None, True, False])
    assert md == bytes([0x11, 0x00, 0x00])


def test_object_value_bytes():
    # {"a": 1, "b": "hi"}:
    #   child a = primitive int8: header 3<<2 = 0x0C, payload 0x01
    #   child b = short string len 2: (2<<2)|1 = 0x09, "hi"
    #   object header: basic 2, value_header 0 (small, 1-byte ids and
    #   offsets) -> 0x02; n=2; ids [0,1]; offsets [0,2,5]
    _, val = encode_variant({"a": 1, "b": "hi"})
    assert val == bytes(
        [0x02, 0x02, 0x00, 0x01, 0x00, 0x02, 0x05, 0x0C, 0x01, 0x09]
    ) + b"hi"


def test_array_value_bytes():
    # [null, true, false]: header (0<<2)|3 = 0x03; n=3;
    # offsets [0,1,2,3]; children 0x00 (null), 0x04 (true), 0x08 (false)
    _, val = encode_variant([None, True, False])
    assert val == bytes(
        [0x03, 0x03, 0x00, 0x01, 0x02, 0x03, 0x00, 0x04, 0x08]
    )


@pytest.mark.parametrize(
    "obj, expected",
    [
        # int widths: smallest signed LE that fits
        (1, bytes([0x0C, 0x01])),
        (-1, bytes([0x0C, 0xFF])),
        (300, bytes([0x10, 0x2C, 0x01])),
        (70000, bytes([0x14]) + (70000).to_bytes(4, "little")),
        (2**40, bytes([0x18]) + (2**40).to_bytes(8, "little")),
        # double: id 7 -> header 0x1C + IEEE754 LE
        (1.5, bytes([0x1C]) + struct.pack("<d", 1.5)),
        # decimal4: id 8 -> header 0x20 + scale + int32 LE unscaled
        (
            Decimal("12.34"),
            bytes([0x20, 0x02]) + (1234).to_bytes(4, "little"),
        ),
        # decimal8: unscaled exceeds int32
        (
            Decimal("123456789012.3"),
            bytes([0x24, 0x01])
            + (1234567890123).to_bytes(8, "little"),
        ),
        # date: id 11 -> 0x2C + int32 LE days (2024-01-01 = 19723)
        (
            datetime.date(2024, 1, 1),
            bytes([0x2C]) + (19723).to_bytes(4, "little"),
        ),
        # timestamptz micros: id 12 -> 0x30
        (
            datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=UTC),
            bytes([0x30])
            + (1709294400_000000).to_bytes(8, "little"),
        ),
        # timestamp ntz micros: id 13 -> 0x34
        (
            datetime.datetime(2024, 3, 1, 12, 0, 0),
            bytes([0x34])
            + (1709294400_000000).to_bytes(8, "little"),
        ),
        # binary: id 15 -> 0x3C + int32 size + bytes
        (b"\x00\xff", bytes([0x3C, 0x02, 0x00, 0x00, 0x00, 0x00, 0xFF])),
        # short string (< 64 utf-8 bytes): basic 1, header = length
        ("abc", bytes([0x0D]) + b"abc"),
        # long string: id 16 -> 0x40 + int32 size
        (
            "x" * 70,
            bytes([0x40, 0x46, 0x00, 0x00, 0x00]) + b"x" * 70,
        ),
        # time ntz micros: id 17 -> 0x44 (12:30:01.000250)
        (
            datetime.time(12, 30, 1, 250),
            bytes([0x44])
            + (45001_000250).to_bytes(8, "little"),
        ),
        # uuid: id 20 -> 0x50 + 16 bytes BIG-endian field order
        (
            uuid.UUID("12345678-1234-5678-1234-567812345678"),
            bytes([0x50])
            + bytes.fromhex("12345678123456781234567812345678"),
        ),
    ],
)
def test_primitive_value_bytes(obj, expected):
    _, val = encode_variant(obj)
    assert val == expected, (obj, val.hex(), expected.hex())


def test_negative_decimal_twos_complement():
    # -0.001 at scale 3: unscaled -1 -> int32 two's complement
    _, val = encode_variant(Decimal("-0.001"))
    assert val == bytes([0x20, 0x03, 0xFF, 0xFF, 0xFF, 0xFF])


def test_large_object_uses_four_byte_count():
    # 300 fields: is_large set (bit 4), field ids need 2 bytes (max id
    # 299), offsets need 2 bytes (300 one-byte null children) ->
    # value_header = 0b10101 (21) -> header byte (21 << 2) | 2 = 0x56;
    # count as 4-byte LE
    obj = {f"k{i:03d}": None for i in range(300)}
    _, val = encode_variant(obj)
    assert val[0] == 0x56
    assert int.from_bytes(val[1:5], "little") == 300


def test_object_field_ids_sorted_by_name():
    # insertion order z,a — stored order must be name-sorted (a first)
    _, val = encode_variant({"z": 2, "a": 1})
    # header 0x02, n=2, ids [0,1] where metadata dict is sorted (a=0)
    assert val[:3] == bytes([0x02, 0x02, 0x00]) and val[3] == 0x01


# --- reader vectors: decoder accepts hand-assembled buffers ------------------


def test_decode_hand_assembled_object():
    md = bytes([0x11, 0x02, 0x00, 0x01, 0x02]) + b"ab"
    val = bytes(
        [0x02, 0x02, 0x00, 0x01, 0x00, 0x02, 0x05, 0x0C, 0x01, 0x09]
    ) + b"hi"
    assert decode_variant(md, val) == {"a": 1, "b": "hi"}


def test_decode_accepts_non_minimal_widths():
    # same object, hand-assembled with 2-byte field offsets and ids and
    # a 2-byte metadata offset width — legal per spec, the encoder just
    # never PICKS them at this size
    md = (
        bytes([0x01 | 0x10 | (1 << 6)])  # osz=2, sorted, v1
        + (2).to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + b"ab"
    )
    # value_header = id_sz_minus1(1)<<2 | off_sz_minus1(1) = 0b0101
    val = (
        bytes([(0b0101 << 2) | 2, 0x02])
        + (0).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + (5).to_bytes(2, "little")
        + bytes([0x0C, 0x01, 0x09])
        + b"hi"
    )
    assert decode_variant(md, val) == {"a": 1, "b": "hi"}


def test_decode_nested_array_in_object():
    # {"t": [7, "s"]} — children of the array: int8 7 (0x0C 0x07),
    # short string "s" (0x05 0x73); array = 03 02 00 02 03 0C 07 05 73
    md = bytes([0x11, 0x01, 0x00, 0x01]) + b"t"
    arr = bytes([0x03, 0x02, 0x00, 0x02, 0x03, 0x0C, 0x07, 0x05]) + b"s"
    val = bytes([0x02, 0x01, 0x00, 0x00, len(arr)]) + arr
    assert decode_variant(md, val) == {"t": [7, "s"]}


def test_decode_float32():
    # float: id 14 -> header 0x38 + IEEE754 single LE
    md = bytes([0x11, 0x00, 0x00])
    val = bytes([0x38]) + struct.pack("<f", 1.5)
    assert decode_variant(md, val) == 1.5


def test_decode_decimal16():
    # id 10 -> header 0x28 + scale + int128 LE
    md = bytes([0x11, 0x00, 0x00])
    unscaled = 10**20 + 7
    val = bytes([0x28, 0x02]) + unscaled.to_bytes(16, "little")
    assert decode_variant(md, val) == Decimal(unscaled).scaleb(-2)


def test_decode_timestamp_nanos_renders_nine_digits():
    # id 19 (ntz nanos) -> header 0x4C; 1709294400.000000001s
    md = bytes([0x11, 0x00, 0x00])
    ns = 1709294400 * 10**9 + 1
    val = bytes([0x4C]) + ns.to_bytes(8, "little")
    assert (
        variant_to_json(md, val)
        == '"2024-03-01 12:00:00.000000001"'
    )


def test_reject_bad_metadata_version():
    with pytest.raises(ValueError, match="version"):
        decode_variant(bytes([0x02, 0x00, 0x00]), bytes([0x00]))


def test_reject_truncated_value():
    md = bytes([0x11, 0x00, 0x00])
    with pytest.raises(ValueError):
        decode_variant(md, bytes([0x40, 0xFF, 0x00, 0x00, 0x00]))


def test_reject_unknown_primitive_id():
    md = bytes([0x11, 0x00, 0x00])
    with pytest.raises(ValueError, match="type id"):
        decode_variant(md, bytes([(21 << 2)]))


# --- canonical JSON rendering -------------------------------------------------


@pytest.mark.parametrize(
    "obj, expected",
    [
        ({"a": 1, "b": [True, None]}, '{"a":1,"b":[true,null]}'),
        (Decimal("12.300"), "12.300"),  # exact, never exponent form
        (Decimal("1E+2"), "100"),
        (datetime.date(2024, 1, 1), '"2024-01-01"'),
        (
            datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=UTC),
            '"2024-03-01 12:00:00+00:00"',
        ),
        (datetime.datetime(2024, 3, 1, 12, 0, 0, 250),
         '"2024-03-01 12:00:00.000250"'),
        (b"\x01\x02", '"AQI="'),  # base64
        (float("nan"), '"NaN"'),
        (float("inf"), '"Infinity"'),
        ("émoji ✓", '"émoji ✓"'),  # ensure_ascii off
    ],
)
def test_canonical_json(obj, expected):
    md, val = encode_variant(obj)
    assert variant_to_json(md, val) == expected


def test_json_object_members_in_name_order():
    md, val = encode_variant({"z": 1, "a": 2, "m": 3})
    assert variant_to_json(md, val) == '{"a":2,"m":3,"z":1}'


def test_null_pair_is_sql_null():
    assert variant_to_json(None, None) is None


# ---------------------------------------------------------------------------
# Property fuzz: encode → decode round-trip over random JSON-ish trees
# ---------------------------------------------------------------------------


def _json_scalars():
    from hypothesis import strategies as st

    return st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=80),
    )


def _json_trees():
    from hypothesis import strategies as st

    return st.recursive(
        _json_scalars(),
        lambda kids: st.one_of(
            st.lists(kids, max_size=6),
            st.dictionaries(st.text(max_size=12), kids, max_size=6),
        ),
        max_leaves=25,
    )


def test_wide_decimal_decode_is_digit_exact():
    """decimal16 carries up to 38 digits; the decoder must not consult
    the active decimal context (default precision 28) when rebuilding
    the value — ``Decimal(n).scaleb(-s)`` silently rounds, tuple
    construction never does. Regression for the decode→re-encode
    persistence paths (shredded compaction, variant UPDATE/MERGE)."""
    from decimal import Decimal

    from cloudfloe_spark.functions.variant import (
        encode_variant,
        variant_to_json,
    )

    wide = "12345678901234567890123456789012345678"
    for txt in (
        wide,
        "-" + wide,
        wide[:2] + "." + wide[2:],
        "-0." + wide[:37],
        "0." + "0" * 37 + "1",
    ):
        md, val = encode_variant({"x": Decimal(txt)})
        out = variant_to_json(md, val)
        assert out == '{"x":%s}' % format(Decimal(txt), "f"), (txt, out)


def _wide_decimals():
    from hypothesis import strategies as st

    return st.builds(
        lambda unscaled, scale: __import__("decimal").Decimal(
            (
                1 if unscaled < 0 else 0,
                tuple(int(d) for d in str(abs(unscaled))),
                -scale,
            )
        ),
        st.integers(min_value=-(2**127), max_value=2**127 - 1),
        st.integers(min_value=0, max_value=38),
    )


def test_wide_decimal_roundtrip_fuzz():
    """encode → decode over the full decimal16 domain (±2^127 unscaled,
    scale 0–38) is value-exact."""
    from hypothesis import given, settings

    from cloudfloe_spark.functions import variant as V

    names_decode = V._build_codec()
    metadata_names, decode_at = names_decode[0], names_decode[1]

    @settings(max_examples=200, deadline=None)
    @given(_wide_decimals())
    def run(d):
        md, val = V.encode_variant({"x": d})
        got = decode_at(metadata_names(md), val, 0)["x"]
        assert got == d, (d, got)

    run()


def test_encode_decode_roundtrip_fuzz():
    """Any JSON-representable tree survives encode → decode EXACTLY
    (the decoder returns the same Python values the encoder consumed;
    lists come back as lists, dict keys complete)."""
    from hypothesis import given, settings

    from cloudfloe_spark.functions import variant as V

    names_decode = V._build_codec()

    @settings(max_examples=300, deadline=None)
    @given(_json_trees())
    def run(obj):
        md, val = V.encode_variant(obj)
        metadata_names, decode_at = names_decode[0], names_decode[1]
        got = decode_at(metadata_names(md), val, 0)

        def norm(x):
            if isinstance(x, tuple):
                return [norm(e) for e in x]
            if isinstance(x, list):
                return [norm(e) for e in x]
            if isinstance(x, dict):
                return {k: norm(v) for k, v in x.items()}
            return x

        assert norm(got) == norm(obj)

    run()


def test_json_text_roundtrip_fuzz():
    """The DML write path's exact contract: JSON text → encode (via the
    UDF's parse rules, Decimal floats) → canonical JSON → re-parse is a
    fixpoint (parsing the canonical output and re-encoding yields the
    same canonical text)."""
    import json
    from decimal import Decimal

    from hypothesis import given, settings

    from cloudfloe_spark.functions import variant as V

    @settings(max_examples=200, deadline=None)
    @given(_json_trees())
    def run(obj):
        txt = json.dumps(obj)
        o1 = json.loads(txt, parse_float=Decimal)
        c1 = V.variant_to_json(*V.encode_variant(o1))
        o2 = json.loads(c1, parse_float=Decimal)
        c2 = V.variant_to_json(*V.encode_variant(o2))
        assert c1 == c2

    run()
