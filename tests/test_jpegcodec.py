"""Baseline JPEG codec (functions/jpegcodec.py): encoder<->decoder roundtrip
fidelity, subsampling modes, restart markers, and malformed-input gates."""

import numpy as np
import pytest

from parquet_go_ray.functions.jpegcodec import (_T, decode_jpeg, encode_jpeg)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        128 + 100 * np.sin(yy / 15) * np.cos(xx / 20),
        128 + 80 * np.cos(yy / 10),
        128 + 60 * np.sin(xx / 12),
    ], axis=-1).clip(0, 255).astype(np.uint8)


def _rms(a, b):
    return float(np.sqrt(((a.astype(np.float64) - b.astype(np.float64)) ** 2)
                         .mean()))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_T @ _T.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("sub,bound", [("4:4:4", 1.5), ("4:2:2", 2.5),
                                       ("4:2:0", 3.5)])
def test_roundtrip_smooth_rgb(sub, bound):
    img = _smooth_rgb(48, 64)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape
    assert _rms(out, img) < bound


def test_constant_color_exact():
    c = np.full((20, 30, 3), [200, 50, 120], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(c, quality=95))
    assert int(np.abs(out.astype(int) - c.astype(int)).max()) == 0


def test_grayscale_odd_dims():
    yy = np.mgrid[0:17, 0:23][0]
    g = (yy * 7 % 251).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (17, 23)
    assert _rms(out, g) < 2.0


def test_restart_markers_roundtrip():
    img = _smooth_rgb(40, 56)
    b = encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=2)
    assert b"\xff\xdd" in b  # DRI present
    assert _rms(decode_jpeg(b), img) < 4.0


def test_noise_image_quality_monotone():
    rng = np.random.default_rng(1)
    n = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    hi = _rms(decode_jpeg(encode_jpeg(n, quality=95)), n)
    lo = _rms(decode_jpeg(encode_jpeg(n, quality=30)), n)
    assert hi < lo  # higher quality -> lower error
    assert len(encode_jpeg(n, quality=30)) < len(encode_jpeg(n, quality=95))


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    img = _smooth_rgb(16, 16)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(b))


def test_truncated_scan_fails_or_degrades_cleanly():
    img = _smooth_rgb(24, 24)
    b = encode_jpeg(img)
    # cut mid-scan: decoder must not crash outside its error contract
    try:
        out = decode_jpeg(b[:len(b) // 2])
        assert out.shape == img.shape  # zero-padded tail per spec reading
    except ValueError:
        pass


def test_size_shrinks_vs_raw():
    img = _smooth_rgb(64, 64)
    assert len(encode_jpeg(img, quality=85)) < img.nbytes // 4
