"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode kernels* are
stubbed (clearly-marked deterministic fakes / NotImplementedError
gates) while everything Spark-side is real and tested: schemas,
binary column handling, Arrow batch shapes, partition-preserving
mapInPandas plumbing, and the metadata/feature projections.

At 100 TB the rules this module encodes:
* blobs travel ONCE per stage — metadata extraction is a narrow
  mapInPandas, never a shuffle of binaries;
* per-batch vectorization (operate on the whole Arrow batch, not per
  row) keeps the Python tax to one crossing per ~10k rows;
* derived features (dims, hashes, embeddings) land in slim typed
  columns so downstream ops never touch the blob again.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: set True only in an environment that ships PIL/ffmpeg; the fake
#: path is the tested default in this container
REAL_CODECS = False

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text", blob_col: str = "blob") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of a
    text column — a stand-in with the exact storage/transport profile
    of a real media blob) plus size + content-hash metadata."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.withColumns(
        {
            blob_col: blob,
            f"{blob_col}_bytes": F.octet_length(blob),
            f"{blob_col}_sha256": F.sha2(blob, 256),
        }
    )


def _fake_decode(blob: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake image header parse. REAL IMPLEMENTATION
    WOULD: PIL.Image.open(io.BytesIO(blob)) -> (size, mode, format).
    The fake derives stable dims from the content hash so tests can
    assert exact values."""
    h = hashlib.sha256(blob).digest()
    width = 64 + h[0] % 192          # 64..255
    height = 64 + h[1] % 192
    channels = 1 if h[2] % 4 == 0 else 3
    return width, height, channels, "fake"


def decode_image_meta(
    df: DataFrame, blob_col: str = "blob", out_col: str = "image_meta"
) -> DataFrame:
    """Extract typed image metadata from the blob column with a
    mapInPandas pass (one Python crossing per Arrow batch)."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, IMAGE_META_SCHEMA)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if REAL_CODECS:  # pragma: no cover
                raise NotImplementedError(
                    "real codec path requires PIL; not shipped in this container"
                )
            metas = [
                None
                if b is None
                else dict(
                    zip(("width", "height", "channels", "format"), _fake_decode(bytes(b)))
                )
                for b in pdf[blob_col]
            ]
            pdf = pdf.copy()
            pdf[out_col] = metas
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def resize_images(
    df: DataFrame, blob_col: str = "blob", target: tuple[int, int] = (224, 224)
) -> DataFrame:
    """Resize kernel plumbing. The fake 'resize' truncates/pads the
    blob to a deterministic length (target area bytes) — same I/O
    profile, obviously-fake content. REAL IMPLEMENTATION WOULD run
    PIL thumbnail + re-encode per batch."""
    n = target[0] * target[1] // 64

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if REAL_CODECS:  # pragma: no cover
                raise NotImplementedError("real codec path requires PIL")
            pdf = pdf.copy()
            pdf[blob_col] = [
                None if b is None else (bytes(b) * (n // max(len(b), 1) + 1))[:n]
                for b in pdf[blob_col]
            ]
            yield pdf

    return df.mapInPandas(batches, schema=df.schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Video-frame sampling shape: one input blob -> N frame rows
    (explode), each with a frame index and a 'frame' binary. The fake
    slices the blob; the real kernel would demux with ffmpeg. What's
    real: the 1->N row fan-out, frame indexing, and that only the
    sampled slices (not the source blob) flow downstream."""
    frames = F.slice(
        F.transform(
            F.sequence(F.lit(0), F.lit(max_frames - 1)),
            lambda i: F.struct(
                i.alias("frame_idx"),
                F.substring(
                    F.col(blob_col).cast("string"), i * every_n_bytes + 1, every_n_bytes
                ).alias("frame_text"),
            ),
        ),
        1,
        max_frames,
    )
    ex = df.select(F.col(id_col), F.explode(frames).alias("f")).select(
        id_col,
        F.col("f.frame_idx").alias("frame_idx"),
        F.encode(F.col("f.frame_text"), "utf-8").alias("frame"),
    )
    return ex.filter(F.octet_length("frame") > 0)
