"""IMA ADPCM (DVI4) WAV codec — compressed audio, pure stdlib + NumPy.

The compressed-audio analog of the FLAC/TIFF additions: IMA ADPCM
(WAVE format tag 0x0011) is the classic 4-bit block-predictive codec
telephony and game assets ship in, and the stdlib ``wave`` module
refuses it outright ("unknown format: 17").  This module parses the
RIFF container directly and implements the IMA step/index tables:

- **Decode**: mono or stereo, any block align; each block carries a
  per-channel 4-byte header (predictor sample + step index) followed by
  nibble data (stereo interleaves 4-byte words per channel); invalid
  headers/truncated blocks raise :class:`AdpcmFormatError`.
- **Encode**: mono int16 -> blocks of the configured align, successive-
  approximation quantizer mirroring the decoder update, so
  decode(encode(x)) equals the encoder's own reconstruction EXACTLY
  (tested) and tracks x within quantization noise (SNR-tested).

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np


class AdpcmFormatError(ValueError):
    """Unsupported or corrupt IMA-ADPCM WAV stream."""


_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_INDEX_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _decode_nibbles(nibbles: np.ndarray, pred: int, index: int) -> np.ndarray:
    """Sequential IMA update over a nibble vector (the recurrence is
    inherently serial; blocks are short, and the per-document batch
    rides the Arrow lane like every codec here)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, n in enumerate(nibbles):
        step = int(_STEPS[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            diff = -diff
        pred = min(32767, max(-32768, pred + diff))
        index = min(88, max(0, index + int(_INDEX_ADJUST[n & 7])))
        out[i] = pred
    return out


def _walk_riff(payload: bytes) -> tuple[dict, bytes]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AdpcmFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise AdpcmFormatError("short fmt chunk")
            tag, ch, rate, _bps, align, bits = struct.unpack("<HHIIHH", body[:16])
            fmt = {"tag": tag, "channels": ch, "rate": rate, "align": align, "bits": bits}
        elif cid == b"fact" and len(body) >= 4:
            if fmt is not None:
                (fmt["n_samples"],) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise AdpcmFormatError("missing fmt/data chunk")
    return fmt, data


def decode_ima_adpcm_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """IMA-ADPCM WAV bytes -> (int16 samples — (n,) mono or (n, ch),
    sample_rate).  Raises :class:`AdpcmFormatError` on non-ADPCM tags
    (use the PCM path for 0x0001), bad headers, or truncated blocks."""
    fmt, data = _walk_riff(payload)
    if fmt["tag"] != 0x0011:
        raise AdpcmFormatError(f"not IMA ADPCM (fmt tag {fmt['tag']:#06x})")
    if fmt["bits"] != 4:
        raise AdpcmFormatError(f"IMA ADPCM must be 4-bit, got {fmt['bits']}")
    ch = fmt["channels"]
    align = fmt["align"]
    if ch not in (1, 2) or align < 4 * ch or align % (4 * ch):
        raise AdpcmFormatError(f"bad channels/align: {ch}/{align}")
    per_ch: list[list[np.ndarray]] = [[] for _ in range(ch)]
    for base in range(0, len(data) - (len(data) % align or 0), align):
        block = data[base : base + align]
        if len(block) < align:
            break  # trailing partial block: quarantine-by-omission
        preds, indexes = [], []
        for c in range(ch):
            pred, index, _res = struct.unpack("<hBB", block[4 * c : 4 * c + 4])
            if index > 88:
                raise AdpcmFormatError(f"step index {index} out of range")
            preds.append(pred)
            indexes.append(index)
            per_ch[c].append(np.array([pred], dtype=np.int16))
        body = np.frombuffer(block[4 * ch :], dtype=np.uint8)
        nibbles = np.empty(len(body) * 2, dtype=np.uint8)
        nibbles[0::2] = body & 0x0F  # low nibble first, per spec
        nibbles[1::2] = body >> 4
        if ch == 1:
            per_ch[0].append(_decode_nibbles(nibbles, preds[0], indexes[0]))
        else:
            # stereo: 4-byte (8-nibble) words alternate channels
            groups = nibbles.reshape(-1, 8)
            for c in range(ch):
                mine = groups[c::ch].reshape(-1)
                per_ch[c].append(_decode_nibbles(mine, preds[c], indexes[c]))
    chans = [np.concatenate(p) if p else np.empty(0, np.int16) for p in per_ch]
    # fact chunk = true per-channel sample count: the last block's
    # nibble padding must not surface as trailing phantom samples
    true_n = fmt.get("n_samples")
    if ch == 1:
        out = chans[0]
        return (out[:true_n] if true_n is not None else out), fmt["rate"]
    m = min(len(c) for c in chans)
    if true_n is not None:
        m = min(m, true_n)
    return np.stack([c[:m] for c in chans], axis=1), fmt["rate"]


def encode_ima_adpcm_wav(
    samples: np.ndarray, rate: int, block_align: int = 1024
) -> bytes:
    """Mono int16 samples -> IMA-ADPCM WAV bytes (fmt tag 0x0011 with
    the samples-per-block extension + fact chunk).  The quantizer
    mirrors the decoder update exactly, so the decode of this stream is
    the encoder's own reconstruction."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise AdpcmFormatError("need mono int16 samples")
    if block_align < 8 or block_align % 4:
        raise AdpcmFormatError("block_align must be a multiple of 4, >= 8")
    spb = (block_align - 4) * 2 + 1  # header sample + 2 nibbles/byte
    blocks = []
    pred, index = 0, 0
    pos = 0
    n = len(samples)
    while pos < n:
        chunk = samples[pos : pos + spb]
        pred = int(chunk[0])
        header = struct.pack("<hBB", pred, index, 0)
        nibbles = bytearray()
        cur = 0
        have_low = False
        for s in chunk[1:]:
            step = int(_STEPS[index])
            diff = int(s) - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            tmp = step
            for bit in (4, 2, 1):
                if diff >= tmp:
                    nib |= bit
                    diff -= tmp
                tmp >>= 1
            # decoder-mirror update
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            if nib & 8:
                d = -d
            pred = min(32767, max(-32768, pred + d))
            index = min(88, max(0, index + int(_INDEX_ADJUST[nib & 7])))
            if have_low:
                cur |= nib << 4
                nibbles.append(cur)
                have_low = False
            else:
                cur = nib
                have_low = True
        if have_low:
            nibbles.append(cur)
        body = bytes(nibbles).ljust(block_align - 4, b"\x00")
        blocks.append(header + body)
        pos += spb
    data = b"".join(blocks)
    byte_rate = rate * block_align // spb if spb else rate
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", n)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
