"""Hand-computed byte-level goldens pinning wire-format conformance.

The reference validates against apache/parquet-testing golden files
(/root/reference/parquet_test.go); no network here, so the goldens are
hand-derived from the Parquet format spec (DELTA_BINARY_PACKED and
RLE/bit-packed hybrid layouts) and frozen as exact byte strings.
"""

import numpy as np

from parquet_go_ray.functions import bitpack, delta, hybrid


def test_delta_bp_spec_golden():
    # values [7,5,3,1,2,3,4,5]: header = uvarint(128) uvarint(4) uvarint(8)
    # zigzag(7); block: zigzag(minDelta=-2), widths [2,0,0,0], miniblock0 =
    # adjusted deltas [0,0,0,3,3,3,3] + zero padding at 2 bits LSB-first.
    vals = np.array([7, 5, 3, 1, 2, 3, 4, 5], dtype=np.int32)
    enc = delta.encode(vals, 32)
    expected = bytes(
        [0x80, 0x01, 0x04, 0x08, 0x0E, 0x03, 0x02, 0x00, 0x00, 0x00, 0xC0, 0x3F]
    ) + b"\x00" * 6
    assert enc == expected, enc.hex()
    np.testing.assert_array_equal(delta.decode(enc, 32), vals)


def test_hybrid_rle_run_golden():
    # 100 copies of value 4 at width 3 -> one RLE run: uvarint(100<<1)=200
    # (0xC8 0x01), value byte 0x04
    vals = np.full(100, 4, dtype=np.uint64)
    enc = hybrid.encode(vals, 3)
    assert enc == bytes([0xC8, 0x01, 0x04]), enc.hex()


def test_hybrid_bitpacked_run_golden():
    # [0..7] at width 3 -> one bit-packed run of 1 group: header (1<<1)|1 = 3,
    # then 3 bytes LSB-first: 0,1,2,3,4,5,6,7 -> 0x88 0xC6 0xFA
    vals = np.arange(8, dtype=np.uint64)
    enc = hybrid.encode(vals, 3)
    assert enc == bytes([0x03, 0x88, 0xC6, 0xFA]), enc.hex()


def test_bitpack_lsb_first_golden():
    # width 1: [1,0,1,1,0,0,1,0] -> single byte 0b01001101 = 0x4D
    vals = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=np.uint64)
    assert bitpack.pack(vals, 1) == bytes([0x4D])
    # width 8 is identity
    vals = np.arange(8, dtype=np.uint64)
    assert bitpack.pack(vals, 8) == bytes(range(8))


def test_plain_byte_array_golden():
    from parquet_go_ray.functions import plain

    offsets = np.array([0, 3, 3, 5], dtype=np.int64)
    data = np.frombuffer(b"abcde", dtype=np.uint8)
    enc = plain.encode_byte_array(offsets, data)
    assert enc == b"\x03\x00\x00\x00abc" + b"\x00\x00\x00\x00" + b"\x02\x00\x00\x00de"
