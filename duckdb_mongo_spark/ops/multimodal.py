"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB media pipelines:

- media is an opaque ``binary`` column plus a typed metadata struct
  (mime, n_bytes, checksum, and decoded shape fields)
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` operators — executor-parallel, batch-at-a-time, never
  row-at-a-time Python
- the actual codec step is STUBBED (no image/audio libs in this
  container): ``decode_image_meta`` raises ``NotImplementedError`` unless
  a real decoder is importable, and ``fake_decode_meta`` provides a
  deterministic md5-derived stand-in so all Spark-side plumbing (schema,
  partitioning, UDF signatures, batch shapes) is real and testable.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def attach_media_column(df: DataFrame, payload_col, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a binary payload column into the engine's media layout:
    ``media`` (binary) + ``media_mime``."""
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    return df.withColumn("media", c.cast("binary")).withColumn("media_mime", F.lit(mime))


def _fake_shape(digest_hex: str) -> tuple[int, int, int]:
    """Deterministic stand-in for decoded media shape, derived from the
    payload checksum (stable across engines/runs)."""
    w = 64 + int(digest_hex[:4], 16) % 1985  # 64..2048
    h = 64 + int(digest_hex[4:8], 16) % 1985
    frames = 1 + int(digest_hex[8:12], 16) % 300
    return w, h, frames


def fake_decode_meta(df: DataFrame, media_col: str = "media", mime_col: str = "media_mime") -> DataFrame:
    """mapInPandas media-metadata extraction with the stubbed decoder.

    Output schema = input schema (minus payload) + MEDIA_META_SCHEMA
    fields. Real decode would swap `_fake_shape` for PIL/ffmpeg probes —
    the Spark plumbing is identical.
    """
    in_fields = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(in_fields + list(MEDIA_META_SCHEMA.fields))

    def batches(it):
        for pdf in it:
            payload = pdf[media_col]
            meta = {"mime": [], "n_bytes": [], "checksum": [], "width": [], "height": [], "n_frames": []}
            for raw, mime in zip(payload, pdf[mime_col]):
                b = bytes(raw) if raw is not None else b""
                digest = hashlib.md5(b).hexdigest()
                w, h, fr = _fake_shape(digest)
                meta["mime"].append(mime)
                meta["n_bytes"].append(len(b))
                meta["checksum"].append(digest)
                meta["width"].append(w)
                meta["height"].append(h)
                meta["n_frames"].append(fr)
            out = pdf.drop(columns=[media_col]).copy()
            for k in ("n_bytes", "checksum", "width", "height", "n_frames"):
                out[k] = meta[k]
            out["mime"] = meta["mime"]
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(batches, schema=out_schema)


def decode_image_meta(df: DataFrame, media_col: str = "media") -> DataFrame:  # pragma: no cover
    """Real image decode (PIL). STUB: raises in this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, not present in this container; "
            "use fake_decode_meta for plumbing tests"
        ) from e
    raise NotImplementedError("real decoder wiring lands when PIL is available")


def resize_stub(df: DataFrame, width: int, height: int, media_col: str = "media") -> DataFrame:
    """Resize plumbing: passes payload through mapInPandas with the target
    shape recorded (decode step stubbed)."""
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("target_width", T.LongType()), T.StructField("target_height", T.LongType())]
    )

    def batches(it):
        for pdf in it:
            out = pdf.copy()
            out["target_width"] = width
            out["target_height"] = height
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_n: int, n_frames_col: str = "n_frames") -> DataFrame:
    """Frame-sampling plan: explode sampled frame indices 0, n, 2n, ...
    per media row (pure built-ins — the decode of each frame is the
    stubbed step)."""
    idx = F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_idx", F.explode(idx))
