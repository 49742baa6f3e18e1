"""Multimodal (image/audio/video) column plumbing for a training-data
pipeline at scale.

Media are opaque ``binary`` columns with a typed metadata struct; all
per-item work (decode, feature-extract, resize, frame-sample) runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects one at a time, and the pipeline parallelizes like any other
scan -> map -> write plan.

Codec status per modality: **audio (WAV + lossless FLAC), image (PNM, baseline JPEG
AND PNG) and video (MJPEG in AVI and MP4 containers + the PNMV intra-only
container) decode REAL bytes** —
pure stdlib + NumPy, no external library needed (see
:func:`decode_wav` / :func:`decode_audio_features`, :func:`decode_pnm`
/ the baseline JFIF codec in :mod:`.jpeg` / :func:`decode_image_features`
/ :func:`resize_pnm`, :func:`decode_pnmv` / :func:`frame_sample_video`).
Remaining stubbed formats (inter-frame codecs such as H.264 inside
any container; arithmetic/12-bit JPEG):
``_decode_stub`` derives a small deterministic pseudo-feature from the
bytes so schemas, batch shapes, partitioning and tests stay real
end-to-end; swap the stub for Pillow / pyav calls in production —
every signature stays the same.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: canonical media table schema (DDL) — binary payload + typed metadata
MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime: string, width: int, height: int, duration_ms: bigint>"
)

#: which modalities decode real bytes vs the deterministic stub
#: (image = real for PNM/P5/P6, baseline 4:4:4/grayscale JFIF, and
#: 8-bit PNG; video = real for MJPEG in AVI and MP4 plus the PNMV
#: container; inter-frame codecs (H.264) and exotic JPEG variants still
#: stub/quarantine)
PRODUCTION_DECODERS = {"audio": True, "image": True, "video": True}


def _decode_stub(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8 pseudo-features from
    the md5 of the bytes, scaled to [0, 1). Replace with a real decode
    (e.g. PIL.Image.open + embed) in production."""
    digest = hashlib.md5(payload or b"").digest()
    return np.frombuffer(digest[: n_features * 2], dtype=np.uint16).astype(np.float64) / 65536.0


_WAV_WIDTH_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode, pure stdlib: RIFF/WAVE bytes -> (mono float64
    samples in [-1, 1], sample_rate). Supports 8-bit unsigned and
    16/32-bit signed little-endian PCM, any channel count (channels are
    averaged to mono). Raises ``wave.Error``/``ValueError`` on
    malformed or unsupported payloads."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width, rate, n_frames = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(n_frames)
    dtype = _WAV_WIDTH_DTYPE.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width: {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, midpoint 128
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * width - 1))
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _audio_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """(mono float64 samples in [-1, 1], rate) from a WAV, FLAC or
    IMA-ADPCM payload — the dispatcher behind the feature path, so
    compressed archives (lossless FLAC, 4-bit ADPCM) take the same REAL
    decode as raw PCM."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        s, rate, bps = decode_flac(payload)
        x = s.astype(np.float64) / float(1 << (bps - 1))
        return (x.mean(axis=1) if x.ndim == 2 else x), rate
    try:
        return decode_wav(payload)
    except wave.Error:
        # stdlib wave refuses compressed WAVs ("unknown format: 17");
        # IMA ADPCM gets the real block-predictive decode
        from .adpcm import AdpcmFormatError, decode_ima_adpcm_wav

        try:
            s, rate = decode_ima_adpcm_wav(payload)
        except AdpcmFormatError:
            raise ValueError("unsupported WAV variant") from None
        x = s.astype(np.float64) / 32768.0
        return (x.mean(axis=1) if x.ndim == 2 else x), rate


def _wav_features(payload: bytes) -> list[float]:
    """8 real signal features of a WAV or FLAC payload: duration_s,
    sample_rate, n_samples, rms, peak, zero-crossing rate, mean,
    abs-mean."""
    x, rate = _audio_samples(payload)
    n = len(x)
    if n == 0:
        return [0.0, float(rate), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    return [
        n / float(rate),
        float(rate),
        float(n),
        float(np.sqrt(np.mean(x * x))),
        float(np.max(np.abs(x))),
        zcr,
        float(np.mean(x)),
        float(np.mean(np.abs(x))),
    ]


def decode_audio_features(df: DataFrame) -> DataFrame:
    """(media_id, features array<double>) from REAL WAV/FLAC decoding —
    Arrow-batched ``mapInPandas``, stdlib codec on the executors.
    Undecodable payloads yield null features (quarantine rows, never a
    job abort — at 100 TB some bytes are always corrupt)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = []
            for p in batch["payload"]:
                try:
                    feats.append(_wav_features(p) if p is not None else None)
                except (wave.Error, ValueError, EOFError):
                    # ValueError covers FlacFormatError (a subclass)
                    feats.append(None)
            yield pd.DataFrame({"media_id": batch["media_id"], "features": feats})

    # project to the two consumed columns so only they cross the Arrow
    # boundary (a caller's wide media frame would otherwise serialize
    # every column into the Python workers — guide-§4 column pruning)
    return df.select("media_id", "payload").mapInPandas(
        run, schema="media_id bigint, features array<double>"
    )


def _pnm_header(payload: bytes, offset: int = 0) -> tuple[int, int, int, int, int]:
    """Parse one binary PNM header starting at ``offset``: returns
    (width, height, maxval, channels, raster_offset). Header comments
    (#...) are honored; raises ``ValueError`` on malformed payloads."""
    if len(payload) < offset + 2 or payload[offset : offset + 2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    channels = 3 if payload[offset : offset + 2] == b"P6" else 1
    # Tokenize the header: magic, width, height, maxval — whitespace
    # separated, with # comments running to end of line.
    pos, fields = offset + 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PNM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if not (0 < maxval < 65536) or width <= 0 or height <= 0:
        raise ValueError(f"bad PNM dimensions {width}x{height} maxval {maxval}")
    return width, height, maxval, channels, pos


def decode_pnm(payload: bytes, offset: int = 0) -> np.ndarray:
    """REAL image decode, pure stdlib: binary PNM bytes -> uint8/uint16
    array of shape (height, width) for P5 (grayscale) or
    (height, width, 3) for P6 (RGB); maxval > 255 means 16-bit
    big-endian samples per the spec."""
    width, height, maxval, channels, pos = _pnm_header(payload, offset)
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    n = width * height * channels
    raster = np.frombuffer(payload, dtype=dtype, count=n, offset=pos)
    if raster.size < n:
        raise ValueError("truncated PNM raster")
    img = raster.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def _pnm_end(payload: bytes, offset: int = 0) -> int:
    """Byte offset one past the PNM frame starting at ``offset``."""
    width, height, maxval, channels, pos = _pnm_header(payload, offset)
    return pos + width * height * channels * (2 if maxval > 255 else 1)


def encode_pnm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_pnm` (8-bit only): (H, W[, 3]) uint8 ->
    binary P5/P6 bytes."""
    arr = np.asarray(img, dtype=np.uint8)
    magic = b"P6" if arr.ndim == 3 else b"P5"
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def _decode_any_image(payload: bytes) -> np.ndarray:
    """REAL decode for the supported raster formats: PNM (P5/P6) via
    :func:`decode_pnm`, baseline JFIF via :mod:`.jpeg`. Raises
    ValueError/JpegFormatError on anything else (callers quarantine)."""
    if bytes(payload[:2]) in (b"P5", b"P6"):
        return decode_pnm(payload)
    if bytes(payload[:2]) == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if bytes(payload[:4]) == b"\x89PNG":
        from .png import decode_png

        return decode_png(payload)
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        _fms, frames = decode_gif(payload)
        return frames[0]  # still-image features come from the first frame
    if bytes(payload[:4]) in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        return decode_tiff(payload)
    raise ValueError("unsupported raster format")


def _is_real_image(payload) -> bool:
    return payload is not None and (
        bytes(payload[:2]) in (b"P5", b"P6", b"\xff\xd8")
        or bytes(payload[:4]) in (b"\x89PNG", b"II*\x00", b"MM\x00*")
        or bytes(payload[:6]) in (b"GIF87a", b"GIF89a")
    )


def _image_features(payload: bytes) -> list[float]:
    """8 real image features of a PNM or baseline-JPEG payload: width,
    height, channels, mean, std, min, max, mean |horizontal gradient|
    (sharpness proxy)."""
    img = _decode_any_image(payload)
    x = img.astype(np.float64)
    grad = float(np.mean(np.abs(np.diff(x, axis=1)))) if x.shape[1] > 1 else 0.0
    return [
        float(img.shape[1]),
        float(img.shape[0]),
        float(img.shape[2] if img.ndim == 3 else 1),
        float(x.mean()),
        float(x.std()),
        float(x.min()),
        float(x.max()),
        grad,
    ]


def decode_image_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """(media_id, features array<double>) via Arrow-batched decode.

    PNM (P5/P6 magic), baseline JPEG (FFD8) and PNG (\x89PNG) payloads
    get the REAL decode (:func:`decode_pnm` / :mod:`.jpeg` /
    :mod:`.png`): corrupt or unsupported-variant payloads quarantine to
    null features. Anything else falls to the deterministic stub; swap
    ``_decode_stub`` for Pillow in production, signatures unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = []
            for p in batch["payload"]:
                if p is None:
                    feats.append(None)
                elif _is_real_image(p):
                    try:
                        feats.append(_image_features(p))
                    except ValueError:
                        feats.append(None)
                else:
                    feats.append(_decode_stub(p, n_features).tolist())
            yield pd.DataFrame({"media_id": batch["media_id"], "features": feats})

    # same Arrow-boundary column pruning as decode_audio_features
    return df.select("media_id", "payload").mapInPandas(
        run, schema="media_id bigint, features array<double>"
    )


def _resize_nn(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor index sampling — the ONE resize kernel every
    format-specific path shares (a sampling-math fix lands once)."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[rows][:, cols]


def resize_pnm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of an 8-bit PNM payload, pure
    NumPy index sampling, re-encoded as PNM bytes."""
    img = decode_pnm(payload)
    if img.dtype != np.uint8:
        raise ValueError("resize supports 8-bit PNM only")
    return encode_pnm(_resize_nn(img, width, height))


def resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """REAL JPEG resize: decode (baseline JFIF), nearest-neighbor
    sample, re-encode at quality 90 — output is a valid JPEG."""
    from .jpeg import encode_jpeg

    return encode_jpeg(_resize_nn(_decode_any_image(payload), width, height), quality=90)


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """REAL lossless PNG resize: decode, nearest-neighbor sample,
    re-encode (exact — PNG has no quality loss)."""
    from .png import encode_png

    return encode_png(_resize_nn(_decode_any_image(payload), width, height))


def resize_tiff(payload: bytes, width: int, height: int) -> bytes:
    """REAL lossless TIFF resize: decode, nearest-neighbor sample,
    re-encode LZW+predictor (exact — no quality loss)."""
    from .tiff import encode_tiff

    return encode_tiff(
        _resize_nn(_decode_any_image(payload), width, height),
        compression="lzw",
        predictor=True,
    )


#: magic-byte predicate -> real resizer; resize_images dispatches here
#: (adding a decodable format = one entry, not a new if/elif branch).
_RESIZERS: list[tuple] = [
    (lambda p: bytes(p[:2]) in (b"P5", b"P6"), resize_pnm),
    (lambda p: bytes(p[:2]) == b"\xff\xd8", resize_jpeg),
    (lambda p: bytes(p[:4]) == b"\x89PNG", resize_png),
    (lambda p: bytes(p[:4]) in (b"II*\x00", b"MM\x00*"), resize_tiff),
]


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, payload, meta) resized to the target dimensions.

    PNM, baseline-JPEG and PNG payloads are REALLY resized
    (nearest-neighbor; JPEG is decoded, resized and re-encoded at
    quality 90, staying a valid JPEG); other formats keep their bytes
    (stub path) with meta rewritten, so downstream schema contracts
    hold for every kind. Undecodable payloads null out (quarantine).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for p in batch["payload"]:
                out = p
                if p is not None:
                    for matches, resizer in _RESIZERS:
                        if matches(p):
                            try:
                                out = resizer(p, width, height)
                            except ValueError:
                                out = None
                            break
                payloads.append(out)
            meta = [
                {**(m or {}), "width": width, "height": height} for m in batch["meta"]
            ]
            yield pd.DataFrame(
                {"media_id": batch["media_id"], "payload": payloads, "meta": meta}
            )

    return df.mapInPandas(
        run,
        schema="media_id bigint, payload binary, "
        "meta struct<mime: string, width: int, height: int, duration_ms: bigint>",
    )


def encode_pnmv(frames: list[np.ndarray], frame_ms: int = 1000) -> bytes:
    """REAL (toy but honest) video container, pure stdlib: ``PNMV``
    magic + frame count + per-frame duration, then concatenated binary
    PNM frames. Stands in for an MJPEG-style intra-only stream so the
    whole video path — container parse, frame boundary walk, per-frame
    decode — exercises real bytes without pyav."""
    body = b"".join(encode_pnm(f) for f in frames)
    return b"PNMV\n%d %d\n" % (len(frames), frame_ms) + body


def decode_pnmv(payload: bytes) -> tuple[int, list[tuple[int, bytes]]]:
    """Parse a PNMV container: returns (frame_ms, [(ts_ms, pnm_bytes)])
    by walking real PNM frame boundaries (header + raster length)."""
    if not payload or not payload.startswith(b"PNMV\n"):
        raise ValueError("not a PNMV payload")
    nl = payload.index(b"\n", 5)
    n_frames, frame_ms = (int(x) for x in payload[5:nl].split())
    frames, pos = [], nl + 1
    for i in range(n_frames):
        end = _pnm_end(payload, pos)
        if end > len(payload):
            raise ValueError("truncated PNMV frame")
        frames.append((i * frame_ms, payload[pos:end]))
        pos = end
    return frame_ms, frames


def frame_sample_video(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Explode videos into sampled frame rows (media_id, frame_idx,
    frame_ts_ms, frame binary).

    PNMV and MJPEG-AVI payloads take the REAL path: the container is
    parsed, frame boundaries walked, and each sample timestamp emits the
    actual frame bytes covering it (``ts // frame_ms`` — PNM bytes for
    PNMV, independent baseline JPEGs for MJPEG in AVI or MP4, decodable
    per frame by :func:`..multimodal.jpeg.decode_jpeg`). Other payloads
    (inter-frame codecs like H.264 — no stdlib decoder exists) keep the
    honest stub: correct row explosion/timestamps from metadata, digest
    bytes; an MP4 whose video track is not Motion-JPEG falls through to
    that stub rather than being dropped.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import AviFormatError, decode_mjpeg_avi

        for batch in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, payload, meta in zip(batch["media_id"], batch["payload"], batch["meta"]):
                if (
                    payload is not None
                    and payload[:4] == b"RIFF"
                    and payload[8:12] == b"AVI "
                ):
                    try:
                        frame_ms, _w, _h, frames = decode_mjpeg_avi(bytes(payload))
                    except AviFormatError:
                        continue  # corrupt / non-MJPEG video: quarantine row
                    if not frames:
                        continue
                    duration = frame_ms * len(frames)
                    for idx, ts in enumerate(range(0, max(duration, 1), every_ms)):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["frame_ts_ms"].append(ts)
                        out["frame"].append(frames[min(ts // frame_ms, len(frames) - 1)][1])
                    continue
                if payload is not None and len(payload) >= 12 and payload[4:8] == b"ftyp":
                    from .mp4 import Mp4FormatError, decode_mjpeg_mp4

                    try:
                        frame_ms, _w, _h, mframes = decode_mjpeg_mp4(bytes(payload))
                    except Mp4FormatError:
                        # inter-frame codec (avc1/H.264) or corrupt: keep
                        # the metadata stub path below — honest limit
                        mframes = None
                    if mframes:
                        duration = frame_ms * len(mframes)
                        for idx, ts in enumerate(range(0, max(duration, 1), every_ms)):
                            out["media_id"].append(mid)
                            out["frame_idx"].append(idx)
                            out["frame_ts_ms"].append(ts)
                            out["frame"].append(
                                mframes[min(ts // frame_ms, len(mframes) - 1)][1]
                            )
                        continue
                    if mframes is not None:
                        continue  # valid but zero-frame container
                if payload is not None and payload[:6] in (b"GIF87a", b"GIF89a"):
                    from .gif import GifFormatError, decode_gif

                    try:
                        frame_ms, gframes = decode_gif(bytes(payload))
                    except GifFormatError:
                        continue  # corrupt / unsupported-variant: quarantine
                    duration = frame_ms * len(gframes)
                    for idx, ts in enumerate(range(0, max(duration, 1), every_ms)):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["frame_ts_ms"].append(ts)
                        fr = gframes[min(ts // max(frame_ms, 1), len(gframes) - 1)]
                        out["frame"].append(encode_pnm(fr))
                    continue
                if payload is not None and payload.startswith(b"PNMV\n"):
                    frame_ms, frames = decode_pnmv(bytes(payload))
                    if not frames:
                        # A valid zero-frame container has nothing to
                        # sample; without this guard max(duration, 1)
                        # would force one sample that indexes frames[-1]
                        # of an empty list and kill the task.
                        continue
                    duration = frame_ms * len(frames)
                    for idx, ts in enumerate(range(0, max(duration, 1), every_ms)):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["frame_ts_ms"].append(ts)
                        out["frame"].append(frames[min(ts // frame_ms, len(frames) - 1)][1])
                    continue
                duration = int((meta or {}).get("duration_ms") or 0)
                for idx, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(ts)
                    digest = hashlib.md5((payload or b"") + ts.to_bytes(8, "little")).digest()
                    out["frame"].append(digest)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="media_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Per-kind size/duration stats — pure built-in aggregation."""
    from pyspark.sql import functions as F

    return df.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
    )
