"""ISO Base Media File Format (MP4) container mux/demux in pure stdlib.

The container layer is REAL: box parsing (including 64-bit ``largesize``
and size-0 to-end boxes), ``moov/trak/mdia/minf/stbl`` traversal, and the
full sample-table walk — ``stsz`` sizes, ``stts`` time deltas, ``stsc``
sample-to-chunk runs, ``stco``/``co64`` chunk offsets — so any MP4's sample
payloads and timing come out exactly. Codec payload DECODE stays an honest
``NotImplementedError`` gate in ops/multimodal.py (no av libs in this
container) except the self-describing ``raw `` RGB24 sample entry this
module's muxer emits, which closes a real end-to-end roundtrip for tests.

Format knowledge is from the public ISO/IEC 14496-12 specification. The
reference engine has no video support; this is part of the multimodal
surface this repo adds as first-class.

Every malformed-input path raises ``ValueError`` (never hangs or
over-allocates): box sizes are bounds-checked against the buffer, child
walks cannot run past their parent, and sample tables are validated against
the declared counts before any allocation sized by them.
"""

from __future__ import annotations

import struct


def _u32(b, o):
    return struct.unpack_from(">I", b, o)[0]


def _u64(b, o):
    return struct.unpack_from(">Q", b, o)[0]


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


# ---------------------------------------------------------------- mux
def mux_mp4(tracks: list[dict]) -> bytes:
    """Write a minimal-but-valid MP4. Each track dict:
    ``{"codec": 4-char str, "timescale": int, "delta": int per-sample
    duration, "samples": list[bytes], optional "width"/"height"}``.
    All of a track's samples land in ONE chunk (one ``stsc`` run, one
    ``stco`` entry) — the simple layout every demuxer must support."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    # mdat: per-track contiguous chunks; record absolute chunk offsets
    mdat_payload = bytearray()
    chunk_offsets = []
    mdat_start = len(ftyp) + 8  # mdat header is 8 bytes
    for t in tracks:
        chunk_offsets.append(mdat_start + len(mdat_payload))
        for s in t["samples"]:
            mdat_payload += s
    mdat = _box(b"mdat", bytes(mdat_payload))

    traks = []
    movie_dur = 0
    for ti, t in enumerate(tracks):
        n = len(t["samples"])
        dur = n * t["delta"]  # in the track's OWN timescale (mdhd)
        # mvhd/tkhd durations are in the MOVIE timescale (1000)
        dur_movie = dur * 1000 // t["timescale"]
        movie_dur = max(movie_dur, dur_movie)
        codec = t["codec"].encode("ascii")
        if len(codec) != 4:
            raise ValueError(f"codec fourcc must be 4 chars, got {t['codec']!r}")
        is_video = "width" in t
        if is_video:
            w, h = int(t["width"]), int(t["height"])
            # VisualSampleEntry (14496-12 12.1.3): 6 reserved + data_ref_idx,
            # then pre_defined/reserved, width/height, resolution, frame
            # count, compressorname, depth, pre_defined
            entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1)
                         + b"\x00" * 16
                         + struct.pack(">HH", w, h)
                         + struct.pack(">II", 0x480000, 0x480000)
                         + struct.pack(">IH", 0, 1)
                         + b"\x00" * 32
                         + struct.pack(">Hh", 24, -1))
            hdlr_type, mhd = b"vide", _full(b"vmhd", 0, 1, b"\x00" * 8)
        else:
            # AudioSampleEntry: 6 reserved + data_ref_idx, 8 reserved,
            # channelcount/samplesize, pre_defined/reserved, samplerate<<16
            entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1)
                         + b"\x00" * 8 + struct.pack(">HHHH", 2, 16, 0, 0)
                         + struct.pack(">I", t["timescale"] << 16))
            hdlr_type, mhd = b"soun", _full(b"smhd", 0, 0, b"\x00" * 4)
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stts = _full(b"stts", 0, 0,
                     struct.pack(">III", 1, n, t["delta"]))
        stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(s))
                                for s in t["samples"]))
        stco = _full(b"stco", 0, 0,
                     struct.pack(">II", 1, chunk_offsets[ti]))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full(b"url ", 0, 1, b""))
        minf = _box(b"minf", mhd + _box(b"dinf", dref) + stbl)
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, t["timescale"], dur, 0x55C4, 0))  # lang "und"
        hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + hdlr_type + b"\x00" * 12
                     + b"pgr\x00")
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        wh = (struct.pack(">II", (t.get("width", 0)) << 16,
                          (t.get("height", 0)) << 16))
        tkhd = _full(b"tkhd", 0, 7, struct.pack(
            ">IIIII", 0, 0, ti + 1, 0, dur_movie) + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0 if is_video else 0x0100, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000) + wh)
        traks.append(_box(b"trak", tkhd + mdia))
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, movie_dur)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000) + b"\x00" * 24
                 + struct.pack(">I", len(tracks) + 1))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return ftyp + mdat + moov


# -------------------------------------------------------------- demux
def _walk(buf: memoryview, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) of the child boxes in
    [start, end) — bounds-checked, largesize-aware, progress-guaranteed."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: truncated box header")
        size = _u32(buf, pos)
        fourcc = bytes(buf[pos + 4:pos + 8])
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = _u64(buf, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos  # box extends to end of the enclosing space
        if size < body - pos or pos + size > end:
            raise ValueError(f"mp4: box {fourcc!r} size {size} out of bounds")
        yield fourcc, body, pos + size
        pos += size


def _find(buf, start, end, fourcc: bytes):
    for fc, b, e in _walk(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


def _full_payload(buf, b, e):
    if e - b < 4:
        raise ValueError("mp4: truncated full box")
    vf = _u32(buf, b)
    return vf >> 24, b + 4, e


def demux_mp4(data: bytes | memoryview) -> list[dict]:
    """Parse an MP4: returns one dict per track —
    ``{"codec", "timescale", "duration", "width", "height", "samples":
    list[bytes], "deltas": list[int]}``. Raises ``ValueError`` on any
    malformed structure."""
    try:
        return _demux_mp4(data)
    except struct.error as e:  # crafted short full-box payloads
        raise ValueError(f"mp4: truncated structure ({e})") from None


def _demux_mp4(data) -> list[dict]:
    buf = memoryview(bytes(data))
    n = len(buf)
    moov = _find(buf, 0, n, b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    tracks = []
    for fc, tb, te in _walk(buf, *moov):
        if fc != b"trak":
            continue
        mdia = _find(buf, tb, te, b"mdia")
        if mdia is None:
            raise ValueError("mp4: trak without mdia")
        mdhd = _find(buf, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("mp4: mdia without mdhd")
        ver, mb, me = _full_payload(buf, *mdhd)
        if ver == 1:
            timescale, duration = _u32(buf, mb + 16), _u64(buf, mb + 20)
        else:
            timescale, duration = _u32(buf, mb + 8), _u32(buf, mb + 12)
        hdlr = _find(buf, *mdia, b"hdlr")
        handler = bytes(buf[hdlr[0] + 8:hdlr[0] + 12]) if hdlr else b""
        minf = _find(buf, *mdia, b"minf")
        stbl = minf and _find(buf, *minf, b"stbl")
        if not stbl:
            raise ValueError("mp4: track without sample table")
        boxes = {fc2: (b2, e2) for fc2, b2, e2 in _walk(buf, *stbl)}
        for req in (b"stsd", b"stsz", b"stsc", b"stts"):
            if req not in boxes:
                raise ValueError(f"mp4: sample table missing {req!r}")
        if b"stco" not in boxes and b"co64" not in boxes:
            raise ValueError("mp4: sample table missing stco/co64")

        # stsd: first sample entry's fourcc (+ video dims when present)
        _v, sb, se = _full_payload(buf, *boxes[b"stsd"])
        if se - sb < 4 or _u32(buf, sb) < 1:
            raise ValueError("mp4: empty stsd")
        entry = next(iter(_walk(buf, sb + 4, se)), None)
        if entry is None:
            raise ValueError("mp4: stsd without sample entry")
        codec = entry[0].decode("ascii", "replace")
        # width/height live at sample-entry offset 24 only for VIDEO tracks
        # (an AudioSampleEntry has samplerate<<16 there) — dispatch on the
        # hdlr handler type, never on entry length
        width = height = 0
        is_video = handler == b"vide"
        if is_video and entry[2] - entry[1] >= 28:
            width = struct.unpack_from(">H", buf, entry[1] + 24)[0]
            height = struct.unpack_from(">H", buf, entry[1] + 26)[0]

        # stsz
        _v, zb, ze = _full_payload(buf, *boxes[b"stsz"])
        fixed, count = _u32(buf, zb), _u32(buf, zb + 4)
        if fixed:
            # validate BEFORE allocating count-sized structures: a crafted
            # 32-bit count would otherwise exhaust memory from a tiny file
            if fixed * count > n:
                raise ValueError(
                    f"mp4: stsz claims {count} x {fixed} B > file size")
            sizes = [fixed] * count
        else:
            if ze - zb - 8 < 4 * count:
                raise ValueError("mp4: stsz shorter than sample count")
            sizes = [_u32(buf, zb + 8 + 4 * i) for i in range(count)]

        # stts -> per-sample deltas
        _v, sttsb, sttse = _full_payload(buf, *boxes[b"stts"])
        n_ent = _u32(buf, sttsb)
        if sttse - sttsb - 4 < 8 * n_ent:
            raise ValueError("mp4: stts shorter than entry count")
        deltas = []
        for i in range(n_ent):
            cnt = _u32(buf, sttsb + 4 + 8 * i)
            dl = _u32(buf, sttsb + 8 + 8 * i)
            if len(deltas) + cnt > count:
                raise ValueError("mp4: stts covers more samples than stsz")
            deltas.extend([dl] * cnt)
        if len(deltas) < count:
            raise ValueError("mp4: stts covers fewer samples than stsz")

        # chunk offsets
        if b"stco" in boxes:
            _v, cb, ce = _full_payload(buf, *boxes[b"stco"])
            nch = _u32(buf, cb)
            if ce - cb - 4 < 4 * nch:
                raise ValueError("mp4: stco shorter than chunk count")
            offs = [_u32(buf, cb + 4 + 4 * i) for i in range(nch)]
        else:
            _v, cb, ce = _full_payload(buf, *boxes[b"co64"])
            nch = _u32(buf, cb)
            if ce - cb - 4 < 8 * nch:
                raise ValueError("mp4: co64 shorter than chunk count")
            offs = [_u64(buf, cb + 4 + 8 * i) for i in range(nch)]

        # stsc runs -> samples per chunk (last run extends to the end)
        _v, scb, sce = _full_payload(buf, *boxes[b"stsc"])
        n_runs = _u32(buf, scb)
        if sce - scb - 4 < 12 * n_runs:
            raise ValueError("mp4: stsc shorter than entry count")
        runs = [(_u32(buf, scb + 4 + 12 * i), _u32(buf, scb + 8 + 12 * i))
                for i in range(n_runs)]  # (first_chunk 1-based, per_chunk)
        for ri, (first, _per) in enumerate(runs):
            if first < 1 or (ri and first <= runs[ri - 1][0]):
                raise ValueError("mp4: stsc first_chunk not increasing")
        samples = []
        si = 0
        for ri, (first, per) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offs)
            for ch in range(first - 1, last):
                if ch >= len(offs):
                    raise ValueError("mp4: stsc run past chunk table")
                pos = offs[ch]
                for _ in range(per):
                    if si >= count:
                        break
                    sz = sizes[si]
                    if pos + sz > n:
                        raise ValueError("mp4: sample extends past file end")
                    samples.append(bytes(buf[pos:pos + sz]))
                    pos += sz
                    si += 1
        if si != count:
            raise ValueError(
                f"mp4: sample tables cover {si} of {count} samples")
        tracks.append({"codec": codec, "handler": handler.decode("ascii", "replace"),
                       "timescale": timescale,
                       "duration": duration, "width": width,
                       "height": height, "samples": samples,
                       "deltas": deltas})
    if not tracks:
        raise ValueError("mp4: moov without tracks")
    return tracks
