"""FLAC codec (functions/flaccodec.py): lossless roundtrips across subframe
types, bit depths and stereo modes; CRC/MD5 integrity; clean failure on any
truncation or corruption (Rice quotients are bounds-checked, so crafted
streams cannot spin)."""

import numpy as np
import pytest

from parquet_go_ray.functions.flaccodec import decode_flac, encode_flac

RNG = np.random.default_rng(9)


def _tonal_stereo(n=10000):
    t = np.arange(n) / 44100
    return np.stack([
        (12000 * np.sin(2 * np.pi * 440 * t)).astype(np.int64),
        (9000 * np.sin(2 * np.pi * 554 * t)
         + RNG.integers(-100, 100, n)).astype(np.int64)], axis=1)


def test_roundtrip_stereo_modes():
    sig = _tonal_stereo()
    for stereo in ("independent", "mid_side"):
        out, sr, bps = decode_flac(encode_flac(sig, 44100, stereo=stereo))
        np.testing.assert_array_equal(out, sig)
        assert (sr, bps) == (44100, 16)


def test_roundtrip_bit_depths_and_compression():
    t = np.arange(5000) / 16000
    for bps, scale in ((8, 100), (16, 20000), (24, 4_000_000)):
        m = (scale * np.sin(2 * np.pi * 100 * t)).astype(np.int64)[:, None]
        b = encode_flac(m, 16000, bps=bps)
        out, _, got_bps = decode_flac(b)
        np.testing.assert_array_equal(out, m)
        assert got_bps == bps
        assert len(b) < 0.6 * len(m) * bps // 8  # tonal: fixed preds win


def test_constant_verbatim_and_multiblock():
    con = np.full((5000, 1), -42, dtype=np.int64)
    b = encode_flac(con, 8000)
    assert len(b) < 200  # CONSTANT subframes: near-free
    np.testing.assert_array_equal(decode_flac(b)[0], con)
    noise = RNG.integers(-32768, 32768, (3000, 2)).astype(np.int64)
    np.testing.assert_array_equal(
        decode_flac(encode_flac(noise, 48000))[0], noise)
    # block_size smaller than the signal: multi-frame stream + partial tail
    sig = _tonal_stereo(3000)
    np.testing.assert_array_equal(
        decode_flac(encode_flac(sig, 44100, block_size=1024))[0], sig)


def test_malformed_inputs_fail_cleanly():
    sig = (5000 * np.sin(2 * np.pi * 300 * np.arange(4000) / 8000)) \
        .astype(np.int64)[:, None]
    b = encode_flac(sig, 8000)
    for cut in range(0, len(b), 23):
        with pytest.raises(ValueError):
            decode_flac(b[:cut])
    rng = np.random.default_rng(1)
    for _ in range(200):
        bb = bytearray(b)
        bb[int(rng.integers(len(bb)))] ^= 0xFF
        # a flip may land in STREAMINFO's unchecksummed min/max size fields
        # (ignored by decode, same as libFLAC) — then the output must still
        # be exact; anywhere else CRC-8/16 or MD5 must catch it
        try:
            out, _, _ = decode_flac(bytes(bb))
        except ValueError:
            continue
        np.testing.assert_array_equal(out, sig)


def test_out_of_range_and_bad_args():
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([[300]], dtype=np.int64), 8000, bps=8)
    with pytest.raises(ValueError, match="mid_side"):
        encode_flac(np.zeros((10, 1), dtype=np.int64), 8000,
                    stereo="mid_side")
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF....")


def test_decode_audio_stage_mixes_wav_and_flac(ray_session):
    import ray.data as rd

    from parquet_go_ray.ops.multimodal import (DecodeAudio,
                                               make_real_audio_table)

    auds = make_real_audio_table(12, seed=12)
    heads = [bytes(p.as_py()[:4]) for p in auds.column("payload")]
    assert b"fLaC" in heads and b"RIFF" in heads  # the mix is real
    out = (rd.from_arrow(auds)
           .map_batches(DecodeAudio, fn_constructor_kwargs={"fake": False},
                        batch_format="pyarrow", batch_size=4, concurrency=2)
           .to_pandas().sort_values("audio_id"))
    assert (out.sample_rate.to_numpy()
            == np.asarray(auds.column("sample_rate"))).all()
    assert (out.n_samples.to_numpy() > 0).all()


def test_long_stream_frame_numbers_roundtrip():
    """Review finding: the UTF-8-style coded frame number was spec-invalid
    for indices >= 128, so any stream past 128 frames failed its own decode
    (~12 s of 44.1 kHz audio at the default block size). Pin a 130-frame
    stream plus the raw coded-number helper across the capacity ladder."""
    from parquet_go_ray.functions.flaccodec import (_BR, _read_utf8_coded,
                                                    _utf8_coded)

    sig = (np.arange(256 * 130)[:, None] % 1000).astype(np.int64)
    out, _, _ = decode_flac(encode_flac(sig, 8000, block_size=256))
    np.testing.assert_array_equal(out, sig)
    for n in (0, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 36) - 1):
        assert _read_utf8_coded(_BR(_utf8_coded(n))) == n
    with pytest.raises(ValueError, match="36 bits"):
        _utf8_coded(1 << 36)


def test_block_size_contract():
    sig = np.zeros((100, 1), dtype=np.int64)
    for bad in (8, 65536, 70000):
        with pytest.raises(ValueError, match="block_size"):
            encode_flac(sig, 8000, block_size=bad)
    out, _, _ = decode_flac(encode_flac(
        np.arange(65535 * 2)[:, None].astype(np.int64) % 500, 8000,
        block_size=65535))
    assert out.shape[0] == 65535 * 2
