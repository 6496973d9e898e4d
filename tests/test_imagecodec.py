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


# ----------------------------------------------------------- audio features
def test_logmel_sine_peak_lands_in_expected_band():
    from parquet_go_ray.ops.multimodal import AudioFeaturizer, _mel_filterbank

    sr, n_fft, n_mels = 16000, 256, 24
    f = AudioFeaturizer(n_fft=n_fft, hop=128, n_mels=n_mels)
    for freq in (500.0, 2000.0, 6000.0):
        t = np.arange(sr, dtype=np.float64) / sr  # 1 s
        x = (10000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        v, nf = f.logmel(x, sr)
        assert nf > 0 and v.shape == (n_mels,)
        # expected band: the mel filter with max response at the tone's bin
        fb = _mel_filterbank(n_mels, n_fft, sr)
        bin_idx = int(round(freq * n_fft / sr))
        expect = int(np.argmax(fb[:, bin_idx]))
        assert abs(int(np.argmax(v)) - expect) <= 1, (freq, np.argmax(v), expect)


def test_logmel_silence_floor_and_stereo_mono():
    from parquet_go_ray.ops.multimodal import AudioFeaturizer

    f = AudioFeaturizer(n_fft=128, hop=64, n_mels=8, eps=1e-10)
    v, _ = f.logmel(np.zeros(1000, dtype=np.int16), 8000)
    assert np.allclose(v, np.log(1e-10))
    # stereo averages to mono: L = -R cancels to silence
    st = np.stack([np.ones(512), -np.ones(512)], axis=1) * 3000
    v2, _ = f.logmel(st.astype(np.int16), 8000)
    assert np.allclose(v2, np.log(1e-10))


def test_audio_features_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from parquet_go_ray.functions.imagecodec import encode_wav
    from parquet_go_ray.ops.multimodal import AudioFeaturizer, audio_features

    sr = 8000
    t = np.arange(2048, dtype=np.float64) / sr
    payloads, ids = [], []
    for i, freq in enumerate([400.0, 1200.0, 3000.0]):
        x = (8000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        payloads.append(encode_wav(x.reshape(-1, 1), sr))
        ids.append(i)
    tab = pa.table({"audio_id": pa.array(np.array(ids, dtype=np.int64)),
                    "payload": pa.array(payloads, pa.binary())})
    out = audio_features(rd.from_arrow(tab), n_fft=256, hop=128,
                         n_mels=24).to_pandas().sort_values("audio_id")
    assert len(out) == 3
    assert (out.sample_rate == sr).all()
    # distributed result identical to the local kernel
    local = AudioFeaturizer(n_fft=256, hop=128, n_mels=24)
    for i, freq in enumerate([400.0, 1200.0, 3000.0]):
        x = (8000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        v, _ = local.logmel(x.reshape(-1, 1), sr)
        got = np.array(out.iloc[i].logmel, dtype=np.float32)
        assert np.allclose(got, v.astype(np.float32))


# -------------------------------------------------------- image pHash dedup
def _smooth_image(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Low-frequency synthetic image (pHash is a low-frequency signature)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w), dtype=np.float64)
    for _ in range(4):
        fy, fx = rng.uniform(0.5, 3, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(30, 80) * np.sin(
            2 * np.pi * (fy * yy / h + fx * xx / w) + ph)
    img = (img - img.min()) / (img.ptp() + 1e-9) * 255
    return np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8)


def test_phash_near_dup_small_hamming_distinct_large():
    from parquet_go_ray.ops.multimodal import ImagePHash

    ph = ImagePHash()
    rng = np.random.default_rng(0)
    for seed in range(6):
        base = _smooth_image(seed)
        noisy = np.clip(base.astype(np.int16)
                        + rng.integers(-6, 7, base.shape), 0, 255).astype(np.uint8)
        ha, hb = ph.phash(base), ph.phash(noisy)
        d = bin(ha ^ hb).count("1")
        assert d <= 6, (seed, d)
    # distinct smooth images are far apart
    hs = [ph.phash(_smooth_image(s)) for s in range(6)]
    for i in range(6):
        for j in range(i + 1, 6):
            assert bin(hs[i] ^ hs[j]).count("1") > 6, (i, j)


def test_image_neardup_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from parquet_go_ray.functions.imagecodec import encode_png
    from parquet_go_ray.ops.multimodal import image_neardup_pairs

    rng = np.random.default_rng(1)
    payloads, ids = [], []
    planted = []
    for s in range(10):
        base = _smooth_image(100 + s)
        payloads.append(encode_png(base)); ids.append(2 * s)
        if s < 4:
            noisy = np.clip(base.astype(np.int16)
                            + rng.integers(-5, 6, base.shape), 0, 255).astype(np.uint8)
            payloads.append(encode_png(noisy)); ids.append(2 * s + 1)
            planted.append((2 * s, 2 * s + 1))
    t = pa.table({"image_id": pa.array(np.array(ids, dtype=np.int64)),
                  "payload": pa.array(payloads, pa.binary())})
    out = image_neardup_pairs(rd.from_arrow(t), max_hamming=6).to_pandas()
    found = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    assert set(planted) <= found, planted
    # no cross-base false pairs
    for a, b in found:
        assert a // 2 == b // 2, (a, b)
