"""FLAC lossless audio codec, pure stdlib + NumPy.

Closes the compressed-audio gap the way :mod:`.jpeg`/:mod:`.png` closed
images: FLAC is the archival interchange format for lossless audio, and
its machinery — Rice-coded residuals of fixed/LPC predictors — needs no
codec library.  The decoder speaks the full frame surface a real
archive contains (CONSTANT/VERBATIM/FIXED/LPC subframes, all four
channel assignments incl. mid/side, Rice and Rice2 partitions with raw
escapes, wasted bits); the encoder emits a spec-legal subset (16-bit
PCM, independent channels, CONSTANT/FIXED(2) subframes, one Rice
partition) that any FLAC reader accepts.  Lossless means the tests pin
EXACT sample equality, not a PSNR floor.

Layout::

    fLaC STREAMINFO [frames: header(sync/blocksize/rate/chan/bps/
    frame#/crc8) subframe-per-channel footer-crc16]

Reference: the FLAC format specification (RFC 9639); no reference-repo
counterpart exists — this is beyond-reference multimodal surface.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacFormatError(ValueError):
    """Unsupported or corrupt FLAC stream (quarantine type)."""


# --- CRCs (frame header crc8 poly 0x07, frame crc16 poly 0x8005) -----------


def _make_crc_table(poly: int, width: int) -> list[int]:
    mask, top = (1 << width) - 1, 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8 = _make_crc_table(0x07, 8)
_CRC16 = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# --- bit I/O (MSB first, no stuffing) --------------------------------------


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.byte = pos
        self.bit = 0

    def bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            if self.byte >= len(self.buf):
                raise FlacFormatError("truncated stream")
            out = (out << 1) | ((self.buf[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        n = 0
        while self.bits(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nacc = 0

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def flush(self) -> bytes:
        if self.nacc:
            self.out.append(self.acc << (8 - self.nacc))
            self.acc = 0
            self.nacc = 0
        return bytes(self.out)


def _utf8_number(value: int) -> bytes:
    """FLAC's UTF-8-style frame/sample number coding."""
    if value < 0x80:
        return bytes([value])
    out = []
    n = 1
    while value >= (1 << (6 * n + (6 - n))):
        n += 1
    lead_bits = 6 - n
    out.append(((0xFF << (lead_bits + 1)) & 0xFF) | (value >> (6 * n)))
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((value >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: _BitReader) -> int:
    first = r.bits(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise FlacFormatError("bad UTF-8 frame number")
    value = first & (mask - 1)
    for _ in range(n):
        cont = r.bits(8)
        if cont & 0xC0 != 0x80:
            raise FlacFormatError("bad UTF-8 continuation")
        value = (value << 6) | (cont & 0x3F)
    return value


# --- encoder ---------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res.astype(np.float64)))) + 1.0
    return min(14, max(0, int(np.ceil(np.log2(mean)))))


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Method 0 (4-bit Rice), partition order 0 — one partition."""
    param = _rice_param(res)
    w.write(0, 2)
    w.write(0, 4)
    w.write(param, 4)
    for r in (int(x) for x in res):
        u = (r << 1) if r >= 0 else (-(r << 1) - 1)
        w.unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples, shape (n,) mono or (n, channels) -> FLAC bytes.

    Spec-legal FIXED-predictor subset: 4096-sample frames, independent
    channels, CONSTANT subframes for flat blocks and FIXED order-2
    elsewhere, one Rice partition per subframe.  Decoding returns the
    input EXACTLY (lossless)."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        raise ValueError("encode_flac takes int16 samples")
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not 1 <= nch <= 8:
        raise ValueError(f"unsupported channel count {nch}")
    bps = 16
    block = 4096

    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    streaminfo = (
        struct.pack(">HH", block, block)
        + b"\x00\x00\x00" * 2  # min/max framesize unknown
        + (
            (sample_rate << 44)
            | ((nch - 1) << 41)
            | ((bps - 1) << 36)
            | (n & ((1 << 36) - 1))
        ).to_bytes(8, "big")
        + md5
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, start in enumerate(range(0, n, block)):
        chunk = x[start : start + block]
        bs = len(chunk)
        # header: sync(14) reserved(1) strategy(1)=0, blocksize code 0b0111
        # (16-bit value follows), rate code 0b0000 (STREAMINFO), channel
        # assignment = nch-1 (independent), bps code 0b100 (16), reserved
        head = bytearray()
        head += bytes([0xFF, 0xF8])
        head.append((0b0111 << 4) | 0b0000)
        head.append(((nch - 1) << 4) | (0b100 << 1))
        head += _utf8_number(fi)
        head += struct.pack(">H", bs - 1)
        head.append(_crc8(bytes(head)))

        w = _BitWriter()
        for ch in range(nch):
            s = chunk[:, ch].astype(np.int64)
            if bs and np.all(s == s[0]):
                w.write(0, 1)
                w.write(0, 6)  # CONSTANT
                w.write(0, 1)  # no wasted bits
                w.write(int(s[0]) & ((1 << bps) - 1), bps)
                continue
            order = 2 if bs > 2 else 0
            w.write(0, 1)
            w.write(0b001000 | order, 6)  # FIXED(order)
            w.write(0, 1)
            for i in range(order):
                w.write(int(s[i]) & ((1 << bps) - 1), bps)
            if order == 2:
                res = s[2:] - (2 * s[1:-1] - s[:-2])
            else:
                res = s
            _write_residual(w, res)
        body = w.flush()
        frame = bytes(head) + body
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# --- decoder ---------------------------------------------------------------

_BLOCKSIZE_CODES = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
                    **{i: 256 << (i - 8) for i in range(8, 16)}}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _read_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.bits(2)
    if method > 1:
        raise FlacFormatError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.bits(4)
    nparts = 1 << po
    if bs % nparts:
        raise FlacFormatError("block size not divisible by partitions")
    res = np.empty(bs - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        count = (bs >> po) - (order if p == 0 else 0)
        if count < 0:
            raise FlacFormatError("partition smaller than predictor order")
        param = r.bits(pbits)
        if param == escape:
            raw = r.bits(5)
            for i in range(count):
                res[idx] = r.sbits(raw) if raw else 0
                idx += 1
        else:
            for i in range(count):
                u = (r.unary() << param) | (r.bits(param) if param else 0)
                res[idx] = (u >> 1) ^ -(u & 1)
                idx += 1
    return res


def _read_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.bits(1):
        raise FlacFormatError("subframe padding bit set")
    sftype = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = r.unary() + 1
        bps -= wasted
    if sftype == 0:  # CONSTANT
        v = r.sbits(bps)
        out = np.full(bs, v, dtype=np.int64)
    elif sftype == 1:  # VERBATIM
        out = np.array([r.sbits(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= sftype <= 12:  # FIXED
        order = sftype - 8
        warm = [r.sbits(bps) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = pred + res[i - order]
    elif sftype >= 32:  # LPC
        order = sftype - 31
        warm = [r.sbits(bps) for _ in range(order)]
        precision = r.bits(4) + 1
        if precision == 16:
            raise FlacFormatError("invalid LPC precision escape")
        shift = r.sbits(5)
        if shift < 0:
            raise FlacFormatError("negative LPC shift")
        coefs = [r.sbits(precision) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs)) >> shift
            out[i] = pred + res[i - order]
    else:
        raise FlacFormatError(f"reserved subframe type {sftype}")
    return out << wasted if wasted else out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes -> (int32 samples of shape (n, channels), sample_rate,
    bits_per_sample).

    Full frame surface: CONSTANT/VERBATIM/FIXED/LPC subframes, Rice and
    Rice2 partitions with raw-bits escapes, wasted bits, and all four
    channel assignments (independent, left/side, right/side, mid/side).
    Raises :class:`FlacFormatError` on corrupt or reserved streams."""
    try:
        return _decode(bytes(payload))
    except FlacFormatError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise FlacFormatError(f"corrupt FLAC stream: {e!r}") from e


def _decode(buf: bytes) -> tuple[np.ndarray, int, int]:
    if buf[:4] != b"fLaC":
        raise FlacFormatError("missing fLaC signature")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(buf):
            raise FlacFormatError("truncated metadata")
        last = buf[pos] & 0x80
        btype = buf[pos] & 0x7F
        size = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise FlacFormatError("metadata block overruns the payload")
        if btype == 0:
            if size < 34:
                raise FlacFormatError("short STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            streaminfo = {
                "rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bps": ((packed >> 36) & 0x1F) + 1,
                "total": packed & ((1 << 36) - 1),
            }
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise FlacFormatError("no STREAMINFO block")
    rate, nch_si, bps_si = streaminfo["rate"], streaminfo["channels"], streaminfo["bps"]
    if rate == 0:
        raise FlacFormatError("STREAMINFO sample rate is zero")

    chunks: list[np.ndarray] = []
    while pos < len(buf):
        if pos + 2 > len(buf) or buf[pos] != 0xFF or (buf[pos + 1] & 0xFC) != 0xF8:
            raise FlacFormatError("lost frame sync")
        r = _BitReader(buf, pos)
        r.bits(16)  # sync + reserved + strategy
        bs_code = r.bits(4)
        rate_code = r.bits(4)
        chan_code = r.bits(4)
        bps_code = r.bits(3)
        r.bits(1)
        _read_utf8_number(r)
        if bs_code == 0:
            raise FlacFormatError("reserved block size code")
        elif bs_code == 6:
            bs = r.bits(8) + 1
        elif bs_code == 7:
            bs = r.bits(16) + 1
        else:
            bs = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 12:
            r.bits(8)
        elif rate_code in (13, 14):
            r.bits(16)
        elif rate_code == 15:
            raise FlacFormatError("invalid sample rate code")
        bps = bps_si if bps_code == 0 else _BPS_CODES.get(bps_code)
        if bps is None:
            raise FlacFormatError("reserved bps code")
        r.bits(8)  # crc8 (not verified; sync pattern guards alignment)

        if chan_code < 8:
            nch = chan_code + 1
            chans = [_read_subframe(r, bs, bps) for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            nch = 2
            bumps = {8: (0, 1), 9: (1, 0), 10: (0, 1)}[chan_code]
            a = _read_subframe(r, bs, bps + bumps[0])
            b = _read_subframe(r, bs, bps + bumps[1])
            if chan_code == 8:  # left/side
                chans = [a, a - b]
            elif chan_code == 9:  # right/side: a=side, b=right
                chans = [b + a, b]
            else:  # mid/side
                m2 = (a << 1) | (b & 1)
                chans = [(m2 + b) >> 1, (m2 - b) >> 1]
        else:
            raise FlacFormatError(f"reserved channel assignment {chan_code}")
        if nch != nch_si:
            raise FlacFormatError("frame channel count != STREAMINFO")
        r.align()
        r.byte += 2  # frame crc16 (not verified)
        pos = r.byte
        chunks.append(np.stack(chans, axis=1))
    if not chunks:
        return np.zeros((0, nch_si), dtype=np.int32), rate, bps_si
    out = np.concatenate(chunks, axis=0)
    total = streaminfo["total"]
    if total and len(out) > total:
        out = out[:total]
    return out.astype(np.int32), rate, bps_si
