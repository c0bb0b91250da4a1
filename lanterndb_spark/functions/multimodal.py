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
  contract is real and tested, the codec is a drop-in. A deployment with
  PIL/ffmpeg/onnxruntime installed plugs them in WITHOUT editing this
  module via :func:`register_codec` (same pluggable-client dispatch as
  ``operators.embed.register_embedding_client``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "struct<kind:string, mime:string, width:int, height:int, n_frames:int, sample_rate:int>"

# user-pluggable codec callables, keyed by stage. Each receives one Arrow
# batch's payloads and returns one result (or None = quarantine) per row:
#   "image_decode":    fn(list[bytes], width, height) -> list[list[int] | None]
#   "image_embedding": fn(list[bytes], model, dim)    -> list[list[float] | None]
#   "video_frames":    fn(list[bytes], every_n, max_frames) -> list[list[bytes] | None]
_CODEC_KINDS = ("image_decode", "image_embedding", "video_frames")
_CODECS: dict = {}


def register_codec(kind: str, batch_fn) -> None:
    """Wire a real codec into a stage slot — captured into the UDF
    closure at call time, so it must be picklable (it ships to
    executors). Pass ``None`` to unregister; ``fake=True`` keeps
    precedence so tests stay deterministic."""
    if kind not in _CODEC_KINDS:
        raise ValueError(f"unknown codec kind {kind!r}; one of {_CODEC_KINDS}")
    if batch_fn is None:
        _CODECS.pop(kind, None)
    else:
        _CODECS[kind] = batch_fn


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

    codec = None if fake else _CODECS.get("image_decode")  # driver-time

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is not None:
                pdf[out_col] = codec(
                    [bytes(b) for b in pdf[bin_col]], width, height
                )
            elif fake:
                pdf[out_col] = pdf[bin_col].map(
                    lambda b: _fake_pixels(bytes(b), width, height).ravel().tolist()
                )
            else:
                raise NotImplementedError(
                    "image decode needs a codec library (PIL/opencv); "
                    "register one with register_codec('image_decode', fn) "
                    "or re-run with fake=True for the deterministic stub"
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
    codec = None if fake else _CODECS.get("image_embedding")  # driver-time

    @F.pandas_udf("array<float>")
    def run(s: pd.Series) -> pd.Series:
        if codec is not None:
            return pd.Series(codec([bytes(b) for b in s], model, dim))
        if not fake:
            raise NotImplementedError(
                f"{model} needs onnxruntime; register a client with "
                "register_codec('image_embedding', fn) or re-run with "
                "fake=True for the stub"
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
    codec = None if fake else _CODECS.get("video_frames")  # driver-time

    @F.pandas_udf("array<binary>")
    def run(s: pd.Series) -> pd.Series:
        if codec is not None:
            return pd.Series(codec([bytes(b) for b in s], every_n, max_frames))
        if not fake:
            raise NotImplementedError(
                "video decode needs ffmpeg bindings; register one with "
                "register_codec('video_frames', fn) or use fake=True"
            )
        def one(b):
            b = bytes(b)
            if not b:
                return []
            step = max(1, len(b) // max(every_n, 1))
            return [b[i : i + step] for i in range(0, len(b), step)][:max_frames]
        return s.map(one)

    return df.withColumn(out_col, run(F.col(bin_col)))
