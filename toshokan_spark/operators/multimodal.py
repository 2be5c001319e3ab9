"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode/resize kernels use PIL when it is importable (``codec='auto'``,
the default) and deterministic clearly-marked fakes otherwise; either
way everything Spark-side is real and tested: schemas, binary column
handling, Arrow batch shapes, partition-preserving mapInPandas
plumbing, and the metadata/feature projections. Oracle-checked
queries pin ``codec='stub'`` so their values stay reproducible in
any environment.

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
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional dependency — the sandbox ships no image codecs
    from PIL import Image as _PILImage  # type: ignore
except Exception:  # pragma: no cover - exercised where PIL exists
    _PILImage = None

#: True when PIL imported — the real decode/resize kernels are used by
#: default then; the deterministic fakes remain selectable (and are
#: what the value-level oracle entries pin, since fake output is
#: reproducible from the content hash alone)
REAL_CODECS = _PILImage is not None


def _resolve_codec(codec: str) -> bool:
    """'auto' -> real iff PIL importable; 'real' -> require PIL;
    'stub' -> deterministic fakes. Returns use_real."""
    if codec == "auto":
        return REAL_CODECS
    if codec == "real":
        if _PILImage is None:
            raise NotImplementedError(
                "codec='real' requires PIL, which is not importable here"
            )
        return True
    if codec == "stub":
        return False
    raise ValueError(f"codec must be auto|real|stub, got {codec!r}")

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


def _real_decode(blob: bytes) -> Optional[tuple]:
    """PIL header parse; None for undecodable bytes (corrupt blobs
    are routine at corpus scale — flag, never fail the job)."""
    import io

    try:
        with _PILImage.open(io.BytesIO(blob)) as im:
            return im.width, im.height, len(im.getbands()), im.format or "unknown"
    except Exception:
        return None


def decode_image_meta(
    df: DataFrame,
    blob_col: str = "blob",
    out_col: str = "image_meta",
    codec: str = "auto",
) -> DataFrame:
    """Extract typed image metadata from the blob column with a
    mapInPandas pass (one Python crossing per Arrow batch).

    ``codec='auto'`` decodes with PIL when it is importable and falls
    back to the deterministic fake otherwise; ``'stub'`` pins the fake
    (what the value-level oracle entries use — fake metadata derives
    from the content hash, so it is reproducible anywhere);
    ``'real'`` requires PIL. Real-path decode failures yield a NULL
    meta struct rather than failing the batch."""
    use_real = _resolve_codec(codec)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, IMAGE_META_SCHEMA)]
    )
    keys = ("width", "height", "channels", "format")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for b in pdf[blob_col]:
                if b is None:
                    metas.append(None)
                    continue
                tup = _real_decode(bytes(b)) if use_real else _fake_decode(bytes(b))
                metas.append(None if tup is None else dict(zip(keys, tup)))
            pdf = pdf.copy()
            pdf[out_col] = metas
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def resize_images(
    df: DataFrame,
    blob_col: str = "blob",
    target: tuple[int, int] = (224, 224),
    codec: str = "auto",
) -> DataFrame:
    """Bounded-resize kernel (thumbnail semantics: fit within
    ``target``, preserve aspect). With PIL (``codec='auto'`` when
    importable, or ``'real'``) each blob is decoded, thumbnailed and
    re-encoded as PNG per Arrow batch; undecodable blobs become NULL.
    The ``'stub'`` fake truncates/pads the blob to a deterministic
    length (target area bytes) — same I/O profile, obviously-fake
    content, reproducible anywhere."""
    use_real = _resolve_codec(codec)
    n = target[0] * target[1] // 64

    def _real_resize(b: bytes) -> Optional[bytes]:
        import io

        try:
            with _PILImage.open(io.BytesIO(b)) as im:
                im.thumbnail(target)
                out = io.BytesIO()
                im.save(out, format="PNG")
                return out.getvalue()
        except Exception:
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if use_real:
                pdf[blob_col] = [
                    None if b is None else _real_resize(bytes(b))
                    for b in pdf[blob_col]
                ]
            else:
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
