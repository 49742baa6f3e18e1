"""Multimodal (image/audio/video) column plumbing for a training-data
pipeline at scale.

Media are opaque ``binary`` columns with a typed metadata struct; all
per-item work (decode, feature-extract, resize, frame-sample) runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects one at a time, and the pipeline parallelizes like any other
scan -> map -> write plan.

The actual codec calls are STUBBED in this container (no image/audio
libraries are installed): ``_decode_stub`` derives a small deterministic
pseudo-feature from the bytes so schemas, batch shapes, partitioning
and tests are real end-to-end; swap ``_decode_stub`` for Pillow /
torchaudio / pyav calls in production — every signature stays the same.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: canonical media table schema (DDL) — binary payload + typed metadata
MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime: string, width: int, height: int, duration_ms: bigint>"
)

PRODUCTION_DECODERS = False  # flipped when real codec libs are wired in


def _decode_stub(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8 pseudo-features from
    the md5 of the bytes, scaled to [0, 1). Replace with a real decode
    (e.g. PIL.Image.open + embed) in production."""
    digest = hashlib.md5(payload or b"").digest()
    return np.frombuffer(digest[: n_features * 2], dtype=np.uint16).astype(np.float64) / 65536.0


def decode_image_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """(media_id, features array<double>) via Arrow-batched decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [
                _decode_stub(p, n_features).tolist() if p is not None else None
                for p in batch["payload"]
            ]
            yield pd.DataFrame({"media_id": batch["media_id"], "features": feats})

    return df.mapInPandas(run, schema="media_id bigint, features array<double>")


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, payload, meta) with meta rewritten to the target size.

    The byte transform is the stub (identity); the plumbing — schema,
    struct rewrite, batch shape — is production-real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            meta = [
                {**(m or {}), "width": width, "height": height} for m in batch["meta"]
            ]
            yield pd.DataFrame(
                {"media_id": batch["media_id"], "payload": batch["payload"], "meta": meta}
            )

    return df.mapInPandas(
        run,
        schema="media_id bigint, payload binary, "
        "meta struct<mime: string, width: int, height: int, duration_ms: bigint>",
    )


def frame_sample_video(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Explode videos into sampled frame rows (media_id, frame_idx,
    frame_ts_ms, frame binary). Frame bytes are stubbed; the row
    explosion, timestamps and shapes follow the metadata for real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, payload, meta in zip(batch["media_id"], batch["payload"], batch["meta"]):
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
