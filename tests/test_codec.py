"""Varbyte/delta-gap codec: round-trip properties + byte-level pins.

The byte pins encode the reference format rules directly
(HW2/engine/listio.py:246-256): little-endian 7-bit groups, MSB set on
the LAST byte of each integer.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from web_search_engine_spark.functions import codec


def test_vb_known_bytes():
    # 0 -> 0x80; 1 -> 0x81; 127 -> 0xFF; 128 -> low7=0x00 then 0x01|0x80
    assert codec.vb_encode(np.array([0])) == bytes([0x80])
    assert codec.vb_encode(np.array([1])) == bytes([0x81])
    assert codec.vb_encode(np.array([127])) == bytes([0xFF])
    assert codec.vb_encode(np.array([128])) == bytes([0x00, 0x81])
    assert codec.vb_encode(np.array([300])) == bytes([0x2C, 0x82])  # 300=0b100101100
    assert codec.vb_encode(np.array([5, 128])) == bytes([0x85, 0x00, 0x81])


def test_vb_dangling_partial_ignored():
    # trailing bytes with no terminator are dropped, as in the reference
    data = bytes([0x85, 0x03])  # 5, then dangling 0x03
    assert list(codec.vb_decode(data)) == [5]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(codec.vb_decode(codec.vb_encode(arr))) == vals


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=1000),
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
)
def test_docid_gap_roundtrip(base, gaps):
    docids = np.cumsum(np.array(gaps, dtype=np.int64)) + base
    enc = codec.encode_docids(docids, base=base)
    assert list(codec.decode_docids(enc, base=base)) == list(docids)


def test_docid_gaps_are_relative_to_base():
    # docids [10, 12] with base=10 -> gaps [0, 2] -> bytes [0x80, 0x82]
    enc = codec.encode_docids(np.array([10, 12]), base=10)
    assert enc == bytes([0x80, 0x82])


def test_reference_style_manual_encoding():
    """Byte-equality against a hand-rolled scalar encoder implementing
    the published format (independent of the numpy path)."""

    def scalar_vb(x):
        out = bytearray()
        while True:
            b = x & 0x7F
            x >>= 7
            if x == 0:
                out.append(b | 0x80)
                return bytes(out)
            out.append(b)

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**35, size=500)
    expect = b"".join(scalar_vb(int(v)) for v in vals)
    assert codec.vb_encode(vals.astype(np.uint64)) == expect


def test_raw_codec_roundtrip():
    vals = np.array([0, 1, 2**31, 2**32 - 1], dtype=np.int64)
    assert list(codec.raw_decode(codec.raw_encode(vals))) == list(vals)
    # little-endian uint32 layout
    assert codec.raw_encode(np.array([1])) == b"\x01\x00\x00\x00"
