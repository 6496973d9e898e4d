"""Pure-numpy/stdlib media codecs (functions/imagecodec.py)."""

import struct
import zlib

import numpy as np
import pytest

from parquet_go_ray.functions import imagecodec as ic


def test_bmp_roundtrip_3_and_4_channels():
    rng = np.random.default_rng(0)
    for ch in (3, 4):
        px = rng.integers(0, 256, (17, 13, ch), dtype=np.uint8)  # odd width: padding
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        ic.decode_bmp(b"NOTABMP" + b"\x00" * 64)


def test_png_roundtrip_filters_and_channels():
    rng = np.random.default_rng(1)
    for ch in (1, 3, 4):
        px = rng.integers(0, 256, (23, 9, ch), dtype=np.uint8)
        for f in (0, 1, 2):
            assert np.array_equal(ic.decode_png(ic.encode_png(px, filter_type=f)), px)


def test_png_average_and_paeth_unfilter():
    """Hand-filter rows with types 3/4 (reference per-pixel arithmetic) and
    check the decoder reconstructs the source exactly."""
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    h, w, ch = px.shape
    flat = px.reshape(h, w * ch).astype(np.int64)
    rows, prev = [], np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        f = 3 if y % 2 == 0 else 4
        enc = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            enc[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    raw = b"".join(rows)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(ic.decode_png(png), px)


def test_png_rejects_unsupported():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = bytearray(ic.encode_png(px))
    with pytest.raises(ValueError):
        ic.decode_png(b"\x89PNG\r\n\x1a\x00" + bytes(good[8:]))
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR bit depth
    with pytest.raises(ValueError):
        ic.decode_png(bytes(bad_depth))


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(4)
    s = rng.integers(-30000, 30000, (1000, 2), dtype=np.int16)
    dec, rate = ic.decode_wav(ic.encode_wav(s, 22050))
    assert rate == 22050 and np.array_equal(dec, s)
    mono = rng.integers(-100, 100, 500, dtype=np.int16)
    dec2, _ = ic.decode_wav(ic.encode_wav(mono))
    assert np.array_equal(dec2[:, 0], mono)


def test_resize_box_exact_integer_downscale():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    small = ic.resize_box(px, 8, 6)
    expect = (px.reshape(8, 2, 6, 2, 3).astype(np.float64)
              .mean(axis=(1, 3)).round().astype(np.uint8))
    assert np.array_equal(small, expect)
    assert ic.resize_box(px, 32, 24).shape == (32, 24, 3)  # upscale (nearest)
    assert ic.resize_box(px[:, :, 0], 4, 4).shape == (4, 4)  # 2-D gray


def test_fuzz_parsers_raise_clean_valueerror():
    """Truncations, bit flips, random bytes, and duplications of valid
    files must all raise ValueError (never zlib/struct errors, hangs or
    silent garbage-size allocations) — the repo's malformed-input
    convention (tests/test_fuzz.py)."""
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    goods = {
        "bmp": ic.encode_bmp(px),
        "png": ic.encode_png(px, filter_type=1),
        "wav": ic.encode_wav(rng.integers(-100, 100, 256, dtype=np.int16)),
    }
    dec = {"bmp": ic.decode_bmp, "png": ic.decode_png, "wav": ic.decode_wav}
    for name, buf in goods.items():
        for probe in range(120):
            r = np.random.default_rng(probe)
            b = bytearray(buf)
            kind = probe % 4
            if kind == 0:
                b = b[: int(r.integers(0, len(b)))]
            elif kind == 1:
                for i in r.integers(0, len(b), 5):
                    b[int(i)] ^= int(r.integers(1, 256))
            elif kind == 2:
                b = bytearray(
                    r.integers(0, 256, len(b), dtype=np.uint8).tobytes())
            else:
                b = b[: len(b) // 2] + b[: len(b) // 2]
            try:
                dec[name](bytes(b))
            except ValueError:
                pass  # the only acceptable failure mode
