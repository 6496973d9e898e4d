"""G.711 (a-law / µ-law) and IMA-ADPCM audio codecs, pure numpy.

Narrows the audio capability gate in ops/multimodal.py further (after PCM
WAV and FLAC): telephony dumps (G.711) and classic compressed WAV
(IMA/DVI ADPCM, WAVE format tag 0x11) now REALLY decode. Both are public
ITU/IMA specs:

- G.711 (ITU-T, 1972): 8-bit logarithmic companding. Decode is a 256-entry
  table lookup built once at import from the standard segment/mantissa
  formula; encode is the inverse (used for test fixtures and the writer).
- IMA ADPCM (IMA Digital Audio Pack, 1992; WAV embedding per Microsoft
  RIFF registry): 4 bits/sample with a (predictor, step-index) state
  machine. The recurrence is sequential per block, so the decoder runs the
  ~505 in-block steps as a Python loop but VECTORIZES each step across
  all blocks × channels — a 10-minute file is thousands of independent
  blocks, so the hot dimension is wide, not long.

MP3/OGG/AAC stay honestly gated in ops/multimodal.py (no codec libs in
this container, and a full MDCT psychoacoustic decoder is out of scope).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- G.711
# Tables built from the ITU formulas over the full 8-bit code space.


def _build_mulaw_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32) ^ 0xFF  # µ-law transmits inverted
    sign = codes >> 7
    exponent = (codes >> 4) & 0x07
    mantissa = codes & 0x0F
    magnitude = ((mantissa << 1) + 33 << exponent) - 33
    # scale: µ-law is defined on 14-bit magnitudes; shift to int16 range
    out = np.where(sign, -magnitude, magnitude) << 2
    return out.astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32) ^ 0x55  # a-law even-bit inversion
    sign = codes >> 7
    exponent = (codes >> 4) & 0x07
    mantissa = codes & 0x0F
    magnitude = np.where(
        exponent == 0,
        (mantissa << 1) + 1,
        ((mantissa << 1) + 33) << (exponent - 1),
    )
    # sign bit SET after the 0x55 XOR means POSITIVE (ITU G.711 / g711.c
    # alaw2linear) — the opposite of µ-law's convention; the idle code 0xD5
    # must decode to +8, not -8
    out = np.where(sign, magnitude, -magnitude) << 3  # 13-bit -> int16
    return out.astype(np.int16)


MULAW_TABLE = _build_mulaw_table()
ALAW_TABLE = _build_alaw_table()


def decode_mulaw(codes: np.ndarray | bytes) -> np.ndarray:
    return MULAW_TABLE[np.frombuffer(codes, dtype=np.uint8)
                       if isinstance(codes, (bytes, memoryview)) else
                       np.asarray(codes, dtype=np.uint8)]


def decode_alaw(codes: np.ndarray | bytes) -> np.ndarray:
    return ALAW_TABLE[np.frombuffer(codes, dtype=np.uint8)
                      if isinstance(codes, (bytes, memoryview)) else
                      np.asarray(codes, dtype=np.uint8)]


def _encode_g711(samples: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Nearest-code encode by inverting the decode table (exact for any
    value the table produces; nearest otherwise). 256-way argmin via
    searchsorted over the sorted table — vectorized, no per-sample loop."""
    s = np.ascontiguousarray(samples, dtype=np.int16).astype(np.int32)
    order = np.argsort(table.astype(np.int32), kind="stable")
    tbl = table.astype(np.int32)[order]
    pos = np.searchsorted(tbl, s).clip(1, 255)
    left, right = tbl[pos - 1], tbl[pos.clip(0, 255)]
    pick = np.where(np.abs(s - left) <= np.abs(right - s), pos - 1, pos)
    return order[pick].astype(np.uint8)


def encode_mulaw(samples: np.ndarray) -> np.ndarray:
    return _encode_g711(samples, MULAW_TABLE)


def encode_alaw(samples: np.ndarray) -> np.ndarray:
    return _encode_g711(samples, ALAW_TABLE)


# ------------------------------------------------------------- IMA ADPCM
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32)


def _ima_step(pred: np.ndarray, idx: np.ndarray, code: np.ndarray):
    """One IMA recurrence step, vectorized over (blocks × channels)."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    diff += np.where(code & 4, step, 0)
    diff += np.where(code & 2, step >> 1, 0)
    diff += np.where(code & 1, step >> 2, 0)
    pred = np.where(code & 8, pred - diff, pred + diff).clip(-32768, 32767)
    idx = (idx + IMA_INDEX_TABLE[code]).clip(0, 88)
    return pred, idx


def samples_per_block(block_align: int, channels: int) -> int:
    return (block_align - 4 * channels) * 2 // channels + 1


def valid_block_align(block_align: int, channels: int) -> int:
    """Largest valid IMA block size <= the requested one: 4*ch header bytes
    plus a whole number of 4-byte groups per channel (at least one)."""
    group = 4 * channels
    return group + max((block_align - group) // group, 1) * group


def decode_ima_adpcm(data: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA-ADPCM 'data' chunk -> (n, channels) int16.

    Layout per block (WAVE format 0x11): per channel a 4-byte header
    (predictor int16 LE, step index u8, reserved u8), then 4-byte groups of
    8 nibbles interleaved channel0, channel1, ... Low nibble first within
    each byte. A trailing partial block decodes its available groups."""
    if channels < 1 or block_align <= 4 * channels or block_align % 4:
        raise ValueError("IMA ADPCM: bad channels/block_align")
    buf = np.frombuffer(data, dtype=np.uint8)
    nblocks = len(buf) // block_align
    # a trailing PARTIAL block (short final block in a truncated or
    # size-exact stream) decodes its available full groups rather than
    # being silently dropped: pad it to block_align with zeros and trim the
    # decoded samples to what the real bytes cover
    rem = len(buf) - nblocks * block_align
    tail_samples = 0
    if rem >= 4 * channels + 4 * channels:  # header + at least one group
        tail_groups = (rem - 4 * channels) // (4 * channels)
        tail_samples = 1 + tail_groups * 8
        pad = np.zeros(block_align - rem, dtype=np.uint8)
        buf = np.concatenate([buf, pad])
        nblocks += 1
    if nblocks == 0:
        return np.empty((0, channels), dtype=np.int16)
    spb = samples_per_block(block_align, channels)
    blocks = buf[: nblocks * block_align].reshape(nblocks, block_align)
    heads = blocks[:, : 4 * channels].reshape(nblocks, channels, 4)
    pred = (heads[:, :, 0].astype(np.int32)
            | (heads[:, :, 1].astype(np.int32) << 8))
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16 LE
    idx = heads[:, :, 2].astype(np.int32)
    if (idx > 88).any():
        raise ValueError("IMA ADPCM: step index out of range")
    # payload: (nblocks, ngroups, channels, 4 bytes); groups interleave
    # channels in 4-byte units
    payload = blocks[:, 4 * channels:]
    ngroups = payload.shape[1] // (4 * channels)
    # slack bytes past the last whole group (block_align ≡ 0 mod 4 admits
    # payloads that are not a multiple of 4*channels) are padding, not data
    payload = payload[:, : ngroups * 4 * channels]
    payload = payload.reshape(nblocks, ngroups, channels, 4)
    lo = payload & 0x0F
    hi = payload >> 4
    # nibble order within a group: b0.lo, b0.hi, b1.lo, b1.hi, ...
    nib = np.empty((nblocks, ngroups, channels, 8), dtype=np.uint8)
    nib[..., 0::2] = lo
    nib[..., 1::2] = hi
    # time-major: (samples-1, nblocks, channels)
    codes = nib.transpose(1, 3, 0, 2).reshape(ngroups * 8, nblocks, channels)
    out = np.empty((nblocks, spb, channels), dtype=np.int16)
    out[:, 0, :] = pred.astype(np.int16)
    nsteps = min(spb - 1, codes.shape[0])
    for t in range(nsteps):
        pred, idx = _ima_step(pred, idx, codes[t].astype(np.int32))
        out[:, t + 1, :] = pred.astype(np.int16)
    res = out[:, : nsteps + 1, :]
    if tail_samples:  # the padded tail block only vouches for its real bytes
        full = res[:-1].reshape(-1, channels)
        tail = res[-1][: min(tail_samples, res.shape[1])]
        return np.concatenate([full, tail])
    return res.reshape(-1, channels)


def encode_ima_adpcm(samples: np.ndarray, block_align: int = 1024) -> bytes:
    """(n, channels) int16 -> IMA-ADPCM 'data' chunk bytes (fixture/writer
    path; pads the tail block by repeating the last sample)."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n == 0:
        return b""
    if ch < 1 or block_align <= 4 * ch or (block_align - 4 * ch) % (4 * ch):
        # the payload must be whole 4-byte groups per channel, else
        # (spb-1) is not a multiple of 8 and no valid block exists —
        # encode_wav_ima auto-rounds; this low-level API is explicit
        raise ValueError(
            f"IMA ADPCM encode: block_align {block_align} invalid for "
            f"{ch} channel(s) — need 4*{ch} header bytes plus a multiple "
            f"of {4 * ch} payload bytes (e.g. {valid_block_align(block_align, ch)})")
    spb = samples_per_block(block_align, ch)
    nblocks = -(-n // spb)
    padded = np.empty((nblocks * spb, ch), dtype=np.int16)
    padded[:n] = s
    padded[n:] = s[-1]
    blk = padded.reshape(nblocks, spb, ch).astype(np.int32)
    pred = blk[:, 0, :].copy()
    idx = np.zeros((nblocks, ch), dtype=np.int32)
    codes = np.empty((spb - 1, nblocks, ch), dtype=np.uint8)
    for t in range(spb - 1):
        target = blk[:, t + 1, :]
        step = IMA_STEP_TABLE[idx]
        delta = target - pred
        code = np.where(delta < 0, 8, 0)
        mag = np.abs(delta)
        c4 = mag >= step
        mag -= np.where(c4, step, 0)
        c2 = mag >= step >> 1
        mag -= np.where(c2, step >> 1, 0)
        c1 = mag >= step >> 2
        code = code | c4 * 4 | c2 * 2 | c1 * 1
        pred, idx = _ima_step(pred, idx, code)
        codes[t] = code.astype(np.uint8)
    # assemble blocks
    heads = np.empty((nblocks, ch, 4), dtype=np.uint8)
    p16 = blk[:, 0, :].astype(np.int16).view(np.uint8).reshape(nblocks, ch, 2)
    heads[:, :, :2] = p16
    heads[:, :, 2] = 0  # initial index always 0 in this writer
    heads[:, :, 3] = 0
    ngroups = (spb - 1) // 8
    nib = codes.reshape(ngroups, 8, nblocks, ch).transpose(2, 0, 3, 1)
    packed = (nib[..., 0::2] | (nib[..., 1::2] << 4)).astype(np.uint8)
    out = np.concatenate(
        [heads.reshape(nblocks, -1), packed.reshape(nblocks, -1)], axis=1)
    return out.tobytes()


# ------------------------------------------------- WAV container writers
def encode_wav_g711(samples: np.ndarray, sample_rate: int = 8000,
                    law: str = "ulaw") -> bytes:
    """(n,) or (n, ch) int16 -> G.711 WAV (fmt 7 = µ-law, 6 = a-law)."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    enc = encode_mulaw(s.reshape(-1)) if law == "ulaw" else encode_alaw(s.reshape(-1))
    data = enc.tobytes()
    tag = 7 if law == "ulaw" else 6
    # non-PCM formats need WAVEFORMATEX (cbSize field, here 0) and a fact
    # chunk with the frame count — the PCM-style bare 16-byte fmt chunk is
    # rejected by strict parsers
    fmt = (struct.pack("<HHIIHH", tag, ch, sample_rate, sample_rate * ch, ch, 8)
           + struct.pack("<H", 0))
    pad = b"\x00" if len(data) & 1 else b""
    riff = 4 + (8 + len(fmt)) + (8 + 4) + (8 + len(data) + len(pad))
    return (b"RIFF" + struct.pack("<I", riff) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n)
            + b"data" + struct.pack("<I", len(data)) + data + pad)


def encode_wav_ima(samples: np.ndarray, sample_rate: int = 16000,
                   block_align: int = 1024) -> bytes:
    """(n,) or (n, ch) int16 -> IMA-ADPCM WAV (fmt 0x11), with the
    fact-chunk sample count standard players expect."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    block_align = valid_block_align(block_align, ch)  # whole groups per ch
    data = encode_ima_adpcm(s, block_align)
    spb = samples_per_block(block_align, ch)
    byte_rate = (sample_rate * block_align + spb - 1) // max(spb, 1)
    fmt = (struct.pack("<HHIIHH", 0x11, ch, sample_rate, byte_rate,
                       block_align, 4)
           + struct.pack("<HH", 2, spb))  # cbSize=2, samples per block
    pad = b"\x00" if len(data) & 1 else b""
    riff = 4 + (8 + len(fmt)) + (8 + 4) + (8 + len(data) + len(pad))
    return (b"RIFF" + struct.pack("<I", riff) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n)
            + b"data" + struct.pack("<I", len(data)) + data + pad)
