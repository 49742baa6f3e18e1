"""Motion-JPEG in MP4 (ISO Base Media File Format), pure stdlib + the
in-repo JPEG codec.

The MP4 CONTAINER is just a box tree — nothing in walking it needs a
codec library — and a ``jpeg`` video track stores every sample as an
independent baseline JPEG, exactly like MJPEG-in-AVI (:mod:`.avi`).
So the container half of the "MP4 stub" closes for real: ftyp/moov/
mdat parse, the sample tables (stsd/stts/stsc/stsz/stco) map samples
to byte ranges, and each extracted sample decodes through
:func:`.jpeg.decode_jpeg`.  Inter-frame codecs inside MP4 (``avc1``
H.264 etc.) remain honestly out of reach — their sample entries raise
:class:`Mp4FormatError` and the Spark frame sampler falls back to the
metadata stub path, same as before.

Boxes written (the QuickTime/ffmpeg-compatible minimum)::

    ftyp(isom) mdat(<jpeg><jpeg>...) moov{mvhd trak{tkhd mdia{mdhd
    hdlr(vide) minf{vmhd dinf{dref(url )} stbl{stsd(jpeg) stts stsc
    stsz stco}}}}}

The reader walks the tree tolerantly (unknown boxes skipped, 64-bit
``largesize`` and to-end-of-file sizes honored), resolves the general
stsc chunk mapping (not just the single-chunk shape this writer
emits), and returns raw JPEG sample bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import encode_jpeg


class Mp4FormatError(ValueError):
    """Unsupported or corrupt MP4 stream (quarantine/fallback type)."""


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mjpeg_mp4(
    frames: list[np.ndarray],
    frame_ms: int = 1000,
    quality: int = 85,
    subsampling: str = "4:2:0",
) -> bytes:
    """uint8 frames (H, W[, 3]) -> MJPEG MP4 bytes (one ``jpeg`` video
    track, timescale 1000 so sample deltas are milliseconds).  All
    frames must share one geometry; each becomes an independent
    baseline JPEG sample, so any sample decodes without references."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
    samples = [encode_jpeg(f, quality=quality, subsampling=subsampling) for f in frames]
    n = len(samples)
    duration = n * frame_ms

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    mdat_data_offset = len(ftyp) + 8  # first sample byte in the file

    # VisualSampleEntry 'jpeg': 6 reserved + data_ref_index, then the
    # fixed 70-byte visual fields (ISO 14496-12 12.1.3)
    stsd_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + struct.pack(">HHIII", 0, 0, 0, 0, 0)
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname (pascal, zeroed)
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, frame_ms))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_data_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")))
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"MJPEG\x00")
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, duration, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + struct.pack(">IIHHHH", 0, 0, 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1000, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + struct.pack(">II", 0, 0)
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --- reader ----------------------------------------------------------------


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in [start,
    end): 32-bit sizes, 64-bit ``largesize`` (size==1) and
    to-end-of-enclosure (size==0) all per ISO 14496-12."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4FormatError("truncated largesize box")
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4FormatError("box overruns its enclosure")
        yield fourcc, body, pos + size
        pos += size


def _child(buf: bytes, start: int, end: int, fourcc: bytes) -> tuple[int, int]:
    for fc, b, e in _walk(buf, start, end):
        if fc == fourcc:
            return b, e
    raise Mp4FormatError(f"missing {fourcc.decode('latin1')} box")


def _children(buf: bytes, start: int, end: int, fourcc: bytes) -> list[tuple[int, int]]:
    return [(b, e) for fc, b, e in _walk(buf, start, end) if fc == fourcc]


def _u32s(buf: bytes, pos: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", buf[pos : pos + 4 * n]))


def decode_mjpeg_mp4(payload: bytes) -> tuple[int, int, int, list[tuple[int, bytes]]]:
    """MJPEG MP4 bytes -> (frame_ms, width, height, [(sample_index,
    jpeg_bytes), ...]).  Raises :class:`Mp4FormatError` for corrupt
    streams and for video tracks whose sample entry is not an
    independent-JPEG codec (``avc1``/H.264 etc. — the honest limit)."""
    try:
        return _decode(payload)
    except Mp4FormatError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise Mp4FormatError(f"corrupt MP4 stream: {e!r}") from e


_JPEG_ENTRIES = (b"jpeg", b"mjpa", b"mjpb", b"MJPG")


def _decode(payload: bytes) -> tuple[int, int, int, list[tuple[int, bytes]]]:
    buf = bytes(payload)
    moov = _children(buf, 0, len(buf), b"moov")
    if not moov:
        raise Mp4FormatError("no moov box")
    for trak_b, trak_e in _children(buf, *moov[0], b"trak"):
        mdia_b, mdia_e = _child(buf, trak_b, trak_e, b"mdia")
        hdlr_b, _he = _child(buf, mdia_b, mdia_e, b"hdlr")
        if buf[hdlr_b + 8 : hdlr_b + 12] != b"vide":
            continue
        mdhd_b, _me = _child(buf, mdia_b, mdia_e, b"mdhd")
        version = buf[mdhd_b]
        timescale = struct.unpack(
            ">I", buf[mdhd_b + (20 if version else 12) : mdhd_b + (24 if version else 16)]
        )[0]
        if timescale == 0:
            raise Mp4FormatError("mdhd timescale is zero")
        minf_b, minf_e = _child(buf, mdia_b, mdia_e, b"minf")
        stbl_b, stbl_e = _child(buf, minf_b, minf_e, b"stbl")

        stsd_b, stsd_e = _child(buf, stbl_b, stbl_e, b"stsd")
        entries = list(_walk(buf, stsd_b + 8, stsd_e))
        if not entries:
            raise Mp4FormatError("empty stsd")
        fourcc, ent_b, _ent_e = entries[0]
        if fourcc not in _JPEG_ENTRIES:
            raise Mp4FormatError(
                f"unsupported video sample entry {fourcc.decode('latin1')!r} "
                "(inter-frame codec: no stdlib decoder)"
            )
        w, h = struct.unpack(">HH", buf[ent_b + 24 : ent_b + 28])

        stts_b, stts_e = _child(buf, stbl_b, stbl_e, b"stts")
        n_stts = _u32s(buf, stts_b + 4, 1)[0]
        if n_stts < 1 or stts_b + 8 + 8 * n_stts > stts_e:
            raise Mp4FormatError("empty or overrunning stts")
        stts_rows = [_u32s(buf, stts_b + 8 + 8 * i, 2) for i in range(n_stts)]
        total_ticks = sum(c * delta for c, delta in stts_rows)
        total_stts = sum(c for c, _d in stts_rows)
        if total_stts < 1:
            raise Mp4FormatError("stts counts no samples")
        # frame_ms = AVERAGE sample duration: exact for constant-rate
        # tracks (a single stts run — the MJPEG norm); for variable-rate
        # tracks it keeps the TOTAL duration right so sampling covers
        # the whole clip, at the cost of per-frame timestamp precision
        frame_ms = max(1, round(total_ticks * 1000 / timescale / total_stts))

        stsz_b, _ze = _child(buf, stbl_b, stbl_e, b"stsz")
        uniform, n_samples = _u32s(buf, stsz_b + 4, 2)
        # a corrupt header can claim absurd counts/sizes: every sample is
        # at least 1 byte of this file, so bound BEFORE allocating —
        # quarantine, not an executor OOM
        if n_samples > len(buf) or uniform * n_samples > len(buf):
            raise Mp4FormatError("stsz claims more sample bytes than the file holds")
        sizes = [uniform] * n_samples if uniform else _u32s(buf, stsz_b + 12, n_samples)
        if any(s == 0 for s in sizes):
            raise Mp4FormatError("zero-byte sample")

        try:
            stco_b, _ce = _child(buf, stbl_b, stbl_e, b"stco")
            n_chunks = _u32s(buf, stco_b + 4, 1)[0]
            offsets = _u32s(buf, stco_b + 8, n_chunks)
        except Mp4FormatError:
            co64_b, _ce = _child(buf, stbl_b, stbl_e, b"co64")
            n_chunks = _u32s(buf, co64_b + 4, 1)[0]
            offsets = list(
                struct.unpack(f">{n_chunks}Q", buf[co64_b + 8 : co64_b + 8 + 8 * n_chunks])
            )

        stsc_b, _sce = _child(buf, stbl_b, stbl_e, b"stsc")
        n_stsc = _u32s(buf, stsc_b + 4, 1)[0]
        stsc_rows = [
            _u32s(buf, stsc_b + 8 + 12 * i, 3)[:2] for i in range(n_stsc)
        ]  # (first_chunk, samples_per_chunk)

        # general chunk mapping: expand samples-per-chunk over the runs
        frames: list[tuple[int, bytes]] = []
        si = 0
        for ri, (first_chunk, per_chunk) in enumerate(stsc_rows):
            last_chunk = (
                stsc_rows[ri + 1][0] - 1 if ri + 1 < len(stsc_rows) else n_chunks
            )
            for ch in range(first_chunk, last_chunk + 1):
                if ch - 1 >= len(offsets):
                    raise Mp4FormatError("stsc refers past stco")
                pos = offsets[ch - 1]
                for _ in range(per_chunk):
                    if si >= n_samples:
                        break
                    size = sizes[si]
                    if pos + size > len(buf):
                        raise Mp4FormatError("sample overruns file")
                    frames.append((si, buf[pos : pos + size]))
                    pos += size
                    si += 1
        if si != n_samples:
            raise Mp4FormatError(
                f"sample tables disagree: mapped {si} of {n_samples} samples"
            )
        return frame_ms, int(w), int(h), frames
    raise Mp4FormatError("no video track")
