"""Pure-numpy / stdlib media codecs for the multimodal pipeline.

The container has no PIL/opencv/ffmpeg, but three real interchange formats
are decodable with nothing beyond numpy and stdlib zlib:

  * BMP  — uncompressed 24/32-bpp Windows bitmaps (header + raw BGR rows),
  * PNG  — stdlib ``zlib`` inflate + scanline unfiltering (8-bit gray /
           RGB / RGBA, non-interlaced; filters None/Sub/Up vectorized,
           Average/Paeth per-pixel within the affected rows only),
  * WAV  — RIFF PCM 8/16-bit.

These replace the round-1/2 ``NotImplementedError`` stubs for every format
the container can actually represent; formats that genuinely need external
codec libraries (JPEG, MP3/FLAC, video) stay behind honest capability
gates. Encoders exist for all three so tests roundtrip real files.

Reference for the pipeline role: the reference engine treats multimodal
payloads as opaque byte_array columns; decode/feature stages are this
repo's Ray-side addition (SURVEY.md §2 'beyond the reference').
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ------------------------------------------------------------------- BMP
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 RGB(A) -> 24/32-bpp uncompressed BMP bytes."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch not in (3, 4):
        raise ValueError("BMP encoder supports 3 or 4 channels")
    bpp = ch * 8
    stride = (w * ch + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    bgr = px[..., [2, 1, 0]] if ch == 3 else px[..., [2, 1, 0, 3]]
    body[:, : w * ch] = bgr.reshape(h, w * ch)
    body = body[::-1]  # bottom-up row order
    off = 14 + 40
    size = off + body.size
    hdr = (b"BM" + struct.pack("<IHHI", size, 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, body.size,
                         2835, 2835, 0, 0))
    return hdr + body.tobytes()


def decode_bmp(buf: bytes | memoryview) -> np.ndarray:
    """BMP bytes -> (H, W, 3|4) uint8 RGB(A). 24/32-bpp uncompressed only."""
    head = bytes(buf[:54])
    if head[:2] != b"BM" or len(head) < 54:
        raise ValueError("not a BMP file")
    off = struct.unpack_from("<I", head, 10)[0]
    w, h = struct.unpack_from("<ii", head, 18)
    bpp = struct.unpack_from("<H", head, 28)[0]
    comp = struct.unpack_from("<I", head, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    flip = h > 0
    h = abs(h)
    data = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off)
    px = data.reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if flip:
        px = px[::-1]
    return px[..., [2, 1, 0]] if ch == 3 else px[..., [2, 1, 0, 3]]


# ------------------------------------------------------------------- PNG
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CH_OF_COLOR = {0: 1, 2: 3, 6: 4}


def encode_png(pixels: np.ndarray, *, filter_type: int = 0,
               level: int = 6) -> bytes:
    """(H, W[, C]) uint8 -> PNG bytes. ``filter_type`` applies one scanline
    filter to every row (0=None, 1=Sub, 2=Up — handy for exercising the
    decoder's unfilter paths)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError("PNG encoder supports 1/3/4 channels")
    flat = px.reshape(h, w * ch).astype(np.uint8)
    if filter_type == 0:
        filtered = flat
    elif filter_type == 1:  # Sub
        left = np.zeros_like(flat)
        left[:, ch:] = flat[:, :-ch]
        filtered = flat - left
    elif filter_type == 2:  # Up
        up = np.zeros_like(flat)
        up[1:] = flat[:-1]
        filtered = flat - up
    else:
        raise ValueError("encoder supports filter types 0/1/2")
    raw = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), filtered],
        axis=1).tobytes()

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, level))
            + chunk(b"IEND", b""))


def decode_png(buf: bytes | memoryview) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8. 8-bit gray/RGB/RGBA, non-interlaced."""
    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4: pos + 8]
        payload = buf[pos + 8: pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError("PNG: truncated chunk")
        if tag == b"IHDR":
            if ln != 13:
                raise ValueError("PNG: bad IHDR length")
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or color not in _CH_OF_COLOR or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace})")
            meta = (w, h, _CH_OF_COLOR[color])
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    try:
        inflated = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG: corrupt IDAT stream ({e})") from e
    raw = np.frombuffer(inflated, dtype=np.uint8)
    rowbytes = w * ch
    if len(raw) != h * (rowbytes + 1):
        raise ValueError("PNG data size mismatch")
    rows = raw.reshape(h, rowbytes + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    for y in range(h):
        f = ftypes[y]
        cur = rows[y, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub — cumulative along x with lag ch: vectorized
            cur = cur.reshape(w, ch).astype(np.int64).cumsum(axis=0)
            cur = (cur % 256).astype(np.uint8).reshape(rowbytes)
        elif f == 2:  # Up
            cur += prev
        elif f == 3:  # Average — sequential in x (per-pixel loop)
            for x in range(rowbytes):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (int(rows[y, 1 + x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x (per-pixel loop)
            for x in range(rowbytes):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[x] = (int(rows[y, 1 + x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


# ------------------------------------------------------------------- WAV
def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> PCM WAV bytes."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(buf: bytes | memoryview) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 samples, sample_rate).

    Formats: 1 = PCM 8/16-bit, 6 = G.711 a-law, 7 = G.711 µ-law,
    0x11 = IMA ADPCM (all pure numpy; see functions/audiocodec.py)."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, rate, ch, bits, data = 12, None, None, None, None
    audio_fmt, block_align, fact_samples = None, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos: pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8: pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError("WAV: truncated chunk")
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError("WAV: truncated fmt chunk")
            audio_fmt, ch, rate, _, block_align, bits = struct.unpack_from("<HHIIHH", payload)
            if audio_fmt == 1 and bits not in (8, 16):
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
            if audio_fmt not in (1, 6, 7, 0x11):
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif tag == b"fact" and ln >= 4:
            (fact_samples,) = struct.unpack_from("<I", payload)
        elif tag == b"data":
            data = payload
        pos += 8 + ln + (ln & 1)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if audio_fmt == 0x11:
        from .audiocodec import decode_ima_adpcm

        s = decode_ima_adpcm(data, ch, block_align)
        if fact_samples is not None:  # trim encoder tail padding
            s = s[:fact_samples]
        return s, rate
    if audio_fmt in (6, 7):
        from .audiocodec import decode_alaw, decode_mulaw

        s = decode_alaw(data) if audio_fmt == 6 else decode_mulaw(data)
    elif bits == 16:
        s = np.frombuffer(data, dtype="<i2")
    else:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    return s.reshape(-1, ch), rate


# ------------------------------------------------------------------ resize
def resize_box(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize via index-mapped box averaging (pure numpy): each
    output pixel averages the input rows/cols that map onto it. Exact box
    filter for integer downscales, nearest-with-averaging otherwise."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(np.int64).clip(0, h)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(np.int64).clip(0, w)
    ys[1:] = np.maximum(ys[1:], ys[:-1] + 1) if out_h <= h else ys[1:]
    xs[1:] = np.maximum(xs[1:], xs[:-1] + 1) if out_w <= w else xs[1:]
    acc = pixels.astype(np.float64)
    # reduce rows then cols with add.reduceat (handles ragged boxes);
    # upscale boxes can round onto the end -> clamp starts into range
    # (a zero-size box degenerates to nearest-pixel, which is intended)
    ys[:-1] = ys[:-1].clip(0, h - 1)
    xs[:-1] = xs[:-1].clip(0, w - 1)
    rowsum = np.add.reduceat(acc, ys[:-1], axis=0)
    rcount = np.diff(ys).clip(1)[:, None, None] if pixels.ndim == 3 else np.diff(ys).clip(1)[:, None]
    rows = rowsum / rcount
    colsum = np.add.reduceat(rows, xs[:-1], axis=1)
    ccount = np.diff(xs).clip(1)[None, :, None] if pixels.ndim == 3 else np.diff(xs).clip(1)[None, :]
    return (colsum / ccount).round().clip(0, 255).astype(np.uint8)
