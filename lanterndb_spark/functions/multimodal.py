"""Multimodal (image/audio/video) column plumbing.

Not in the reference beyond the CLIP visual model it ships
(ort_runtime.rs:286 'clip/ViT-B-32-visual'); these operators make binary
media a first-class pipeline citizen per the build plan:

- media are opaque ``binary`` columns + a typed metadata struct;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so bytes never leave the executors;
- the actual codec calls are STUBBED (image/audio libs are not in this
  container): ``decode_image`` raises NotImplementedError unless
  ``fake=True``, which produces a deterministic fake decode whose shape /
  schema / partition behavior is identical to a real one — the Spark-side
  contract is real and tested, the codec is a drop-in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "struct<kind:string, mime:string, width:int, height:int, n_frames:int, sample_rate:int>"


def attach_media_meta(
    df: DataFrame, bin_col: str, kind: str, mime: str, out_col: str = "media_meta"
) -> DataFrame:
    """Typed metadata for an opaque binary column (width/height/frames are
    NULL until a decode stage fills them)."""
    return df.withColumn(
        out_col,
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_pixels(data: bytes, w: int, h: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(data).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image(
    df: DataFrame,
    bin_col: str,
    width: int = 32,
    height: int = 32,
    out_col: str = "pixels",
    fake: bool = False,
) -> DataFrame:
    """Decode+resize images to a flat uint8 RGB array column
    (array<int>, length w*h*3) via mapInPandas.

    ``fake=False`` raises NotImplementedError (no image libs in this
    container); ``fake=True`` produces a deterministic md5-seeded decode
    with the real schema and batch shape."""
    cols = df.columns
    schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in cols)
    out_schema = f"{schema}, {out_col} array<int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode needs a codec library (PIL/opencv); "
                    "re-run with fake=True for the deterministic stub"
                )
            pdf[out_col] = pdf[bin_col].map(
                lambda b: _fake_pixels(bytes(b), width, height).ravel().tolist()
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def image_embedding(
    df: DataFrame,
    bin_col: str,
    model: str = "clip/ViT-B-32-visual",
    dim: int = 512,
    out_col: str = "embedding",
    fake: bool = False,
) -> DataFrame:
    """Visual embedding of a binary image column (CLIP-visual analogue).
    Stub semantics identical to decode_image."""
    @F.pandas_udf("array<float>")
    def run(s: pd.Series) -> pd.Series:
        if not fake:
            raise NotImplementedError(
                f"{model} needs onnxruntime; re-run with fake=True for the stub"
            )
        def one(b):
            seed = int.from_bytes(hashlib.md5(bytes(b)).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            return (v / (np.linalg.norm(v) or 1.0)).astype(np.float32).tolist()
        return s.map(one)

    return df.withColumn(out_col, run(F.col(bin_col)))


def sample_frames(
    df: DataFrame,
    bin_col: str,
    every_n: int = 10,
    max_frames: int = 8,
    out_col: str = "frames",
    fake: bool = False,
) -> DataFrame:
    """Frame-sample a binary video column into an array of binary frames.
    Stubbed like decode_image: fake=True slices the payload into
    deterministic chunks standing in for decoded frames."""
    @F.pandas_udf("array<binary>")
    def run(s: pd.Series) -> pd.Series:
        if not fake:
            raise NotImplementedError("video decode needs ffmpeg bindings; use fake=True")
        def one(b):
            b = bytes(b)
            if not b:
                return []
            step = max(1, len(b) // max(every_n, 1))
            return [b[i : i + step] for i in range(0, len(b), step)][:max_frames]
        return s.map(one)

    return df.withColumn(out_col, run(F.col(bin_col)))
