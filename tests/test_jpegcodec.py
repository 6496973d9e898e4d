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


def test_rejects_non_jpeg_and_unsupported_processes():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    img = _smooth_rgb(16, 16)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC9  # arithmetic-coded sequential: genuinely unsupported
    with pytest.raises(ValueError, match="SOF marker"):
        decode_jpeg(bytes(b))
    # a baseline stream merely RELABELED SOF2 is malformed progressive (its
    # single scan says Ss=0,Se=63 — a DC scan may not span the AC band) and
    # must fail cleanly, not decode garbage
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
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


# ------------------------------------------------------------- progressive
def test_progressive_bit_equals_baseline():
    """A progressive stream carries the IDENTICAL quantized coefficients as
    the baseline stream of the same image, so the two decodes must be
    BIT-EQUAL — across subsamplings, grayscale, and spectral band splits."""
    rng = np.random.default_rng(5)
    h, w = 41, 67
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 3 + yy * 2) % 256, (xx * 5) % 256,
                    (yy * 7) % 256], axis=-1).astype(np.uint8)
    img = np.clip(img.astype(np.int32) + rng.integers(-20, 20, img.shape),
                  0, 255).astype(np.uint8)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        prog = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub,
                                       progressive=True))
        np.testing.assert_array_equal(prog, base)
    g = ((xx * 4 + yy * 3) % 256).astype(np.uint8)[:40, :48]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(g, quality=90, progressive=True)),
        decode_jpeg(encode_jpeg(g, quality=90)))
    bands = decode_jpeg(encode_jpeg(img, quality=85, progressive=True,
                                    spectral_bands=((1, 5), (6, 63))))
    np.testing.assert_array_equal(
        bands, decode_jpeg(encode_jpeg(img, quality=85)))


def test_progressive_rejects_restart_interval():
    img = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(img, progressive=True, restart_interval=2)


def test_progressive_eobrun_spanning_blocks():
    """Our encoder caps EOB runs at one block (Annex-K tables lack EOBn>0
    symbols); hand-pack a stream with a custom DHT whose AC-first and
    AC-refine scans carry an EOB2 spanning two blocks, and check it decodes
    identically to the capped-encoder stream of the same coefficients."""
    from parquet_go_ray.functions.jpegcodec import (
        _assemble_container, _BitWriter, _canonical_codes, DC_LUMA_SPEC)

    # 8x24 grayscale: 3 blocks. Block 0 has AC(k=1) = +4; blocks 1-2 zero AC.
    # DC values 16, 18, 20.
    dc = [16, 18, 20]
    ac_spec = ([0, 3] + [0] * 14, [0x00, 0x02, 0x10])  # EOB, (0,2), EOB2
    dc_codes = _canonical_codes(*DC_LUMA_SPEC)
    ac_codes = _canonical_codes(*ac_spec)

    def dc_first():
        bw = _BitWriter()
        pred = 0
        for v in dc:
            pv = v >> 1
            d = pv - pred
            pred = pv
            cat = int(abs(d)).bit_length() if d else 0
            code, ln = dc_codes[cat]
            bw.put(code, ln)
            if cat:
                bw.put(d if d > 0 else d + (1 << cat) - 1, cat)
        bw.flush()
        return bytes([1, 1, 0x00, 0, 0, 0x01]), bytes(bw.out)

    def dc_refine():
        bw = _BitWriter()
        for v in dc:
            bw.put(v & 1, 1)
        bw.flush()
        return bytes([1, 1, 0x00, 0, 0, 0x10]), bytes(bw.out)

    def ac_first(eobrun2: bool):
        bw = _BitWriter()
        # block 0: k=1 value 4>>1 = 2 -> (run 0, cat 2), extra bits '10'
        code, ln = ac_codes[0x02]
        bw.put(code, ln)
        bw.put(2, 2)
        code, ln = ac_codes[0x00]
        bw.put(code, ln)  # EOB for the rest of block 0's band
        if eobrun2:
            code, ln = ac_codes[0x10]  # EOB2: covers blocks 1 and 2
            bw.put(code, ln)
            bw.put(0, 1)  # extension bit: eobrun = (1<<1)-1+0 = 1 extra
        else:
            for _ in range(2):
                code, ln = ac_codes[0x00]
                bw.put(code, ln)
        bw.flush()
        return bytes([1, 1, 0x00, 1, 63, 0x01]), bytes(bw.out)

    def ac_refine(eobrun2: bool):
        bw = _BitWriter()
        # block 0: k=1 history nonzero -> correction bit (4 & 1 = 0), then
        # the band tail is an EOB carrying that buffered bit
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
        bw.put(0, 1)  # buffered correction bit for k=1
        if eobrun2:
            code, ln = ac_codes[0x10]
            bw.put(code, ln)
            bw.put(0, 1)  # eobrun = (1<<1)+0 = 2 -> blocks 1 and 2
        else:
            for _ in range(2):
                code, ln = ac_codes[0x00]
                bw.put(code, ln)
        bw.flush()
        return bytes([1, 1, 0x00, 1, 63, 0x10]), bytes(bw.out)

    import numpy as _np
    comps = [None]
    samp = [(1, 1)]
    qsel = [0]
    qt = [_np.full(64, 2, dtype=_np.int64)]

    def stream(eobrun2):
        return _assemble_container(
            8, 24, comps, samp, qsel, qt, [DC_LUMA_SPEC], [ac_spec], 0,
            [dc_first(), ac_first(eobrun2), ac_refine(eobrun2),
             dc_refine()], sof_marker=0xC2)

    a = decode_jpeg(stream(False))
    b = decode_jpeg(stream(True))
    assert a.shape == (8, 24)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) > 1  # the AC coefficient actually landed
