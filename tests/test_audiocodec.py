"""G.711 + IMA-ADPCM codecs (functions/audiocodec.py).

Validation strategy: the vectorized decoders are compared against
independent SCALAR reference implementations written here straight from
the public specs (ITU-T G.711 segment/mantissa formulas; the IMA DVI-4
state machine) — byte-for-byte over the full code space / random streams.
No external codec libs exist in this container, so the spec itself is the
oracle.
"""

import numpy as np
import pytest

from parquet_go_ray.functions import audiocodec as ac
from parquet_go_ray.functions.imagecodec import decode_wav

RNG = np.random.default_rng(41)


# ---- scalar references (spec transcriptions, deliberately naive) --------

def _mulaw_decode_scalar(code: int) -> int:
    code = ~code & 0xFF
    sign = code & 0x80
    exponent = (code >> 4) & 0x07
    mantissa = code & 0x0F
    magnitude = (((mantissa << 1) + 33) << exponent) - 33
    val = -magnitude if sign else magnitude
    return val << 2


def _alaw_decode_scalar(code: int) -> int:
    code ^= 0x55
    sign = code & 0x80
    exponent = (code >> 4) & 0x07
    mantissa = code & 0x0F
    if exponent == 0:
        magnitude = (mantissa << 1) + 1
    else:
        magnitude = ((mantissa << 1) + 33) << (exponent - 1)
    # g711.c alaw2linear: sign bit set (post-XOR) -> POSITIVE. The first
    # version of this oracle transcribed the inversion the implementation
    # also had, so the round-5 review's external check (idle code 0xD5
    # must decode +8) is pinned separately below.
    val = magnitude if sign else -magnitude
    return val << 3


def _ima_decode_scalar(data: bytes, channels: int, block_align: int):
    step_t = ac.IMA_STEP_TABLE.tolist()
    idx_t = ac.IMA_INDEX_TABLE.tolist()
    out = [[] for _ in range(channels)]
    nblocks = len(data) // block_align
    for b in range(nblocks):
        blk = data[b * block_align: (b + 1) * block_align]
        preds, idxs = [], []
        for c in range(channels):
            h = blk[c * 4: c * 4 + 4]
            p = int.from_bytes(h[:2], "little", signed=True)
            preds.append(p)
            idxs.append(h[2])
            out[c].append(p)
        body = blk[4 * channels:]
        ngroups = len(body) // (4 * channels)
        for g in range(ngroups):
            for c in range(channels):
                chunk = body[(g * channels + c) * 4: (g * channels + c) * 4 + 4]
                for byte in chunk:
                    for code in (byte & 0x0F, byte >> 4):
                        step = step_t[idxs[c]]
                        diff = step >> 3
                        if code & 4:
                            diff += step
                        if code & 2:
                            diff += step >> 1
                        if code & 1:
                            diff += step >> 2
                        p = preds[c] - diff if code & 8 else preds[c] + diff
                        p = max(-32768, min(32767, p))
                        preds[c] = p
                        idxs[c] = max(0, min(88, idxs[c] + idx_t[code]))
                        out[c].append(p)
    n = min(len(o) for o in out) if channels else 0
    return np.array([o[:n] for o in out], dtype=np.int16).T


def test_g711_tables_match_scalar_spec_full_code_space():
    for code in range(256):
        assert ac.MULAW_TABLE[code] == _mulaw_decode_scalar(code), code
        assert ac.ALAW_TABLE[code] == _alaw_decode_scalar(code), code


def test_g711_encode_decode_error_bounded():
    s = RNG.integers(-32768, 32767, 20000).astype(np.int16)
    for enc, table in [(ac.encode_mulaw, ac.MULAW_TABLE),
                       (ac.encode_alaw, ac.ALAW_TABLE)]:
        dec = table[enc(s)].astype(np.int32)
        err = np.abs(dec - s.astype(np.int32))
        # logarithmic companding: error bounded by half the largest segment
        # quantile step (~1024 for µ-law at 14-bit scaled to 16)
        assert err.max() <= 2048
        # and the encode is NEAREST-code: re-encoding the decode is a
        # fixpoint IN VALUE (µ-law has two zero codes, so code identity
        # can differ on exact zeros)
        assert np.array_equal(table[enc(dec.astype(np.int16))], table[enc(s)])


def test_g711_decode_exact_on_code_points():
    # decoding any code then re-encoding returns a code with the SAME value
    # (µ-law 0x7F/0xFF both decode to 0 — value equality, not code identity)
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        ac.MULAW_TABLE[ac.encode_mulaw(ac.MULAW_TABLE[codes])],
        ac.MULAW_TABLE[codes])
    assert np.array_equal(
        ac.ALAW_TABLE[ac.encode_alaw(ac.ALAW_TABLE[codes])],
        ac.ALAW_TABLE[codes])


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("block_align", [256, 1024])
def test_ima_vectorized_matches_scalar(channels, block_align):
    spb = ac.samples_per_block(block_align, channels)
    n = spb * 3 + 7  # three full blocks + padded tail
    t = np.arange(n)
    wave = (8000 * np.sin(t / 50) + 3000 * np.sin(t / 7)
            + RNG.normal(0, 500, n)).clip(-32768, 32767)
    s = np.stack([wave.astype(np.int16)] * channels, axis=1)
    s[:, 1:] = s[:, 1:] // 2  # decorrelate channels
    data = ac.encode_ima_adpcm(s, block_align)
    fast = ac.decode_ima_adpcm(data, channels, block_align)
    slow = _ima_decode_scalar(data, channels, block_align)
    assert np.array_equal(fast, slow)


def test_ima_encode_decode_tracks_signal():
    t = np.arange(30000)
    s = (10000 * np.sin(t / 100)).astype(np.int16)
    dec = ac.decode_ima_adpcm(ac.encode_ima_adpcm(s), 1, 1024)[: len(s), 0]
    err = np.abs(dec.astype(np.int32) - s.astype(np.int32))
    assert np.median(err) < 200  # ADPCM is lossy but must track closely


def test_ima_rejects_bad_geometry():
    with pytest.raises(ValueError):
        ac.decode_ima_adpcm(b"\x00" * 64, 0, 64)
    with pytest.raises(ValueError):
        ac.decode_ima_adpcm(b"\x00" * 64, 1, 2)
    bad = bytearray(ac.encode_ima_adpcm(np.zeros(100, np.int16), 256))
    bad[2] = 99  # step index out of range
    with pytest.raises(ValueError):
        ac.decode_ima_adpcm(bytes(bad), 1, 256)


def test_wav_container_g711_end_to_end():
    s = (6000 * np.sin(np.arange(4001) / 30)).astype(np.int16)
    for law, tag in [("ulaw", 7), ("alaw", 6)]:
        wav = ac.encode_wav_g711(s, sample_rate=8000, law=law)
        dec, rate = decode_wav(wav)
        assert rate == 8000 and dec.shape == (4001, 1)
        table = ac.MULAW_TABLE if law == "ulaw" else ac.ALAW_TABLE
        enc_fn = ac.encode_mulaw if law == "ulaw" else ac.encode_alaw
        assert np.array_equal(dec[:, 0], table[enc_fn(s)])


def test_wav_container_ima_end_to_end_trims_fact():
    n = 2500  # not a multiple of samples_per_block: fact chunk must trim
    s = np.stack([
        (9000 * np.sin(np.arange(n) / 40)).astype(np.int16),
        (4000 * np.sin(np.arange(n) / 17)).astype(np.int16),
    ], axis=1)
    wav = ac.encode_wav_ima(s, sample_rate=16000, block_align=512)
    dec, rate = decode_wav(wav)
    assert rate == 16000
    assert dec.shape == (n, 2)
    raw = ac.decode_ima_adpcm(ac.encode_ima_adpcm(s, 512), 2, 512)
    assert np.array_equal(dec, raw[:n])


def test_wav_unsupported_format_still_rejected():
    import struct

    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 8)  # MP3-in-WAV
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(wav)


def test_decode_audio_stage_handles_g711_and_ima():
    import pyarrow as pa

    from parquet_go_ray.ops.multimodal import DecodeAudio

    s = (7000 * np.sin(np.arange(3000) / 25)).astype(np.int16)
    payloads = [
        ac.encode_wav_g711(s, 8000, law="ulaw"),
        ac.encode_wav_g711(s, 8000, law="alaw"),
        ac.encode_wav_ima(s, 16000, block_align=256),
    ]
    batch = pa.table({"audio_id": pa.array([1, 2, 3], pa.int64()),
                      "payload": pa.array(payloads, pa.binary())})
    out = DecodeAudio(fake=False)(batch)
    assert out.column("sample_rate").to_pylist() == [8000, 8000, 16000]
    assert out.column("n_samples").to_pylist() == [3000, 3000, 3000]
    rms = out.column("rms").to_pylist()
    true_rms = float(np.sqrt((s.astype(np.float64) ** 2).mean()))
    for r in rms:  # lossy codecs: RMS within 2% of the source signal
        assert abs(r - true_rms) / true_rms < 0.02


# ---- round-5 review findings, pinned ------------------------------------

def test_alaw_idle_code_decodes_positive():
    # g711.c alaw2linear(0xD5) == +8; the inverted-sign version (which the
    # original scalar oracle here ALSO transcribed) returned -8
    assert ac.ALAW_TABLE[0xD5] == 8
    assert ac.ALAW_TABLE[0x55] == -8
    # µ-law unchanged: ~0xFF == 0x00 -> +0
    assert ac.MULAW_TABLE[0xFF] == 0


def test_riff_size_field_matches_file_length():
    import struct

    s = (4000 * np.sin(np.arange(3000) / 25)).astype(np.int16)
    for wav in [ac.encode_wav_ima(s, 16000, block_align=512),
                ac.encode_wav_g711(s, 8000, "ulaw"),
                ac.encode_wav_g711(s[:2999], 8000, "alaw")]:  # odd data len
        (riff,) = struct.unpack_from("<I", wav, 4)
        assert riff == len(wav) - 8, (riff, len(wav))


def test_ima_block_align_not_group_multiple():
    # block_align 1020 passes %4 but is not whole 4-byte groups for stereo:
    # decode must use the whole groups (not crash); encode must refuse with
    # the valid suggestion; the WAV writer auto-rounds
    with pytest.raises(ValueError, match="block_align 1020 invalid"):
        ac.encode_ima_adpcm(np.zeros((100, 2), np.int16), 1020)
    dec = ac.decode_ima_adpcm(bytes(2040), channels=2, block_align=1020)
    assert dec.shape[1] == 2 and len(dec) > 0
    s = np.stack([np.arange(3000, dtype=np.int16)] * 2, axis=1)
    wav = ac.encode_wav_ima(s, 16000, block_align=1020)
    out, rate = decode_wav(wav)
    assert out.shape == (3000, 2)


def test_ima_three_channels_encode_decode():
    # (spb-1) % 8 != 0 at the default block_align for 3ch crashed encode
    s = np.stack([(1000 * np.sin(np.arange(5000) / (20 + c))).astype(np.int16)
                  for c in range(3)], axis=1)
    wav = ac.encode_wav_ima(s, 16000)  # writer auto-rounds block_align
    dec, rate = decode_wav(wav)
    assert dec.shape == (5000, 3)
    err = np.abs(dec.astype(np.int32) - s.astype(np.int32))
    assert np.median(err) < 300


def test_ima_trailing_partial_block_decodes():
    s = (9000 * np.sin(np.arange(8000) / 40)).astype(np.int16)
    data = ac.encode_ima_adpcm(s, 1024)
    full = ac.decode_ima_adpcm(data, 1, 1024)
    # cut mid-final-block: the available groups must still decode
    cut = data[: len(data) - 100]
    part = ac.decode_ima_adpcm(cut, 1, 1024)
    assert len(part) > len(full) - 2041  # lost at most the cut bytes' samples
    assert len(part) < len(full)
    assert np.array_equal(part, full[: len(part)])
