"""Multimodal (image/audio/video) column plumbing — SURVEY.md §2C
north_star surface: opaque ``binary`` content + typed metadata struct,
with decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages.

This container has no codec libraries, so REAL codec decode (JPEG/PNG/
WAV/MP4) is stubbed behind ``require_codec`` (clearly-marked
NotImplementedError unless PIL/soundfile happen to be importable). The
Spark-side plumbing is real and tested: schema convention, binary
generation, Arrow batch shapes, UDF signatures, partition-parallel
decode, and a deterministic FAKE raw format (solid-value grayscale
buffer, row-major, dimensions in ``meta``) whose features have
closed-form values — the declared queries check the whole
binary->Python->features path against analytic DuckDB oracles.

Scale notes: decode parallelism = partition count (``repartition`` by id
upstream for skewed blob sizes); Arrow transfer is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB blobs
set it low (e.g. 64) so a batch stays within executor memory; features
flow back as narrow rows so the wide binary never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width: int, height: int, format: string>"
)
FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "mean_byte double, min_byte int, max_byte int"
)


def require_codec(fmt: str):
    """Real-codec gate: returns a decoder callable or raises
    NotImplementedError — the documented stub for environments without
    imaging/audio libraries."""
    if fmt in ("jpeg", "png"):
        try:
            from PIL import Image  # noqa: F401

            return Image.open
        except ImportError as exc:  # pragma: no cover - no PIL here
            raise NotImplementedError(
                f"real {fmt} decode needs Pillow; only the 'raw' fake "
                "format is available in this environment"
            ) from exc
    if fmt == "raw":
        return lambda buf: np.frombuffer(buf, dtype=np.uint8)
    raise NotImplementedError(f"unsupported media format {fmt!r}")


def fake_image_table(
    df: DataFrame, key: str, kind: str = "image"
) -> DataFrame:
    """Deterministic fake media: a solid grayscale buffer of value
    ``k % 251`` with width ``k%8+2`` and height ``k%5+2`` — generated
    JVM-side as ``unhex(repeat(hex(v), w*h))`` so content bytes are
    exact and the same expression is writable in oracle SQL."""
    k = F.col(key)
    v = (k % 251).cast("int")
    w = (k % 8 + 2).cast("int")
    h = (k % 5 + 2).cast("int")
    content = F.unhex(F.repeat(F.lpad(F.hex(v), 2, "0"), w * h))
    return df.select(
        k.cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            w.alias("width"), h.alias("height"), F.lit("raw").alias("format")
        ).alias("meta"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract: per blob, parse the raw buffer and emit
    narrow numeric features. Arrow-batched; the binary column never
    leaves the executor."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                decode = require_codec(row.meta["format"])
                buf = decode(bytes(row.content))
                out.append(
                    (
                        row.media_id,
                        row.meta["width"],
                        row.meta["height"],
                        len(buf),
                        float(buf.mean()) if len(buf) else 0.0,
                        int(buf.min()) if len(buf) else 0,
                        int(buf.max()) if len(buf) else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_bytes",
                    "mean_byte",
                    "min_byte",
                    "max_byte",
                ],
            )

    return media.mapInPandas(gen, FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize of raw grayscale buffers — real pixel
    index arithmetic (no codec needed), same MEDIA_SCHEMA out."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                w, h = row.meta["width"], row.meta["height"]
                buf = np.frombuffer(bytes(row.content), dtype=np.uint8)
                img = buf.reshape(h, w)
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                resized = img[np.ix_(ys, xs)]
                out.append(
                    (
                        row.media_id,
                        row.kind,
                        resized.tobytes(),
                        {"width": out_w, "height": out_h, "format": "raw"},
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "content", "meta"]
            )

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int, every_k: int
) -> DataFrame:
    """Video frame sampling: treat the buffer as ``n_frames`` equal
    chunks, keep every k-th — one output row per kept frame
    ``(media_id, frame_idx, frame binary)``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                buf = bytes(row.content)
                size = len(buf) // n_frames
                for i in range(0, n_frames, every_k):
                    out.append((row.media_id, i, buf[i * size:(i + 1) * size]))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame"]
            )

    return media.mapInPandas(
        gen, "media_id long, frame_idx int, frame binary"
    )
