"""Multimodal (image/audio/video) column plumbing.

Beyond-reference addition (SURVEY.md §2C): media travels as opaque
`binary` columns with typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched Pandas iterators
(`mapInPandas`), the right shape for GPU/codec work at scale — each batch
is a contiguous Arrow buffer handed to one Python worker.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are gated behind import-tries with a clearly-marked
deterministic fake fallback; the Spark-side plumbing — schema, batch
iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def attach_media(
    df: DataFrame, id_col: str, binary_col: str, media_type: str
) -> DataFrame:
    """Normalize arbitrary (id, bytes) columns into the MEDIA_SCHEMA shape."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(binary_col).cast("binary").alias("content"),
        F.create_map(
            F.lit("n_bytes"), F.length(F.col(binary_col)).cast("string")
        ).alias("metadata"),
    )


def _fake_decode(buf: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: derives a pseudo
    width/height and an 8-dim feature vector from the raw bytes.  Marked
    fake — replace the body with PIL/torchvision when available."""
    n = len(buf)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feats = [float((sum(buf[i::8]) % 1000) / 1000.0) if n else 0.0 for i in range(8)]
    return width, height, feats


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def decode_images(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode image bytes -> (media_id, width, height, features, decoder).

    Arrow-batched mapInPandas: one pandas batch in, one out, zero
    driver-side collection.  Uses PIL when importable, else the
    deterministic fake (decoder column says which ran).
    """
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image  # noqa: F401

        def decode_one(buf: bytes):
            img = Image.open(io.BytesIO(buf))
            w, h = img.size
            small = img.convert("L").resize((4, 2))
            feats = [p / 255.0 for p in small.getdata()]
            return w, h, feats, "pil"

    except ImportError:

        def decode_one(buf: bytes):
            w, h, feats = _fake_decode(buf or b"")
            return w, h, feats, "fake"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_one(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "features": [r[2] for r in rows],
                    "decoder": [r[3] for r in rows],
                }
            )

    return media.select("media_id", "content").mapInPandas(run, DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame sampling stub: emits one pseudo-frame per N bytes of
    content (a real implementation would invoke the codec here; the
    explode-per-frame row shape and partition behavior are what matter).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = buf or b""
                n_frames = max(1, len(buf) // every_n_bytes)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(buf[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_bytes": frames}
            )

    return media.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("resizer", T.StringType(), True),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize image bytes to a fixed (width, height) — the standard
    pre-training normalization step.  Arrow-batched mapInPandas; PIL when
    importable, else a deterministic fake that truncates/pads the byte
    buffer to width*height bytes (the `resizer` column says which ran).
    The output keeps the MEDIA-like shape so resize chains into
    decode_images / extract_features.
    """
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        def resize_one(buf: bytes):
            img = Image.open(io.BytesIO(buf)).resize((width, height))
            out = io.BytesIO()
            img.save(out, format="PNG")
            return out.getvalue(), "pil"

    except ImportError:

        def resize_one(buf: bytes):
            buf = buf or b""
            target = width * height
            out = (buf * (target // max(len(buf), 1) + 1))[:target] if buf else bytes(target)
            return out, "fake"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [resize_one(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "content": [r[0] for r in rows],
                    "resizer": [r[1] for r in rows],
                }
            )

    return media.select("media_id", "content").mapInPandas(run, RESIZE_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        T.StructField("extractor", T.StringType(), True),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Media bytes -> fixed-dim embedding (the encoder step of a
    multimodal pipeline).  A real deployment swaps the kernel for a GPU
    model over the same Arrow batches — batch shape, schema, and
    partitioning are identical; here the fallback is a deterministic
    byte-histogram projection (`extractor` column marks it fake).
    The output plugs straight into operators.similarity (ANN / near-dup /
    clustering) as the `embedding` column.
    """

    def embed_one(buf: bytes) -> list[float]:
        buf = buf or b""
        # byte-value histogram folded to `dim` buckets, L1-normalized —
        # deterministic, locality-ish: similar byte streams embed nearby
        hist = [0] * dim
        for b in buf:
            hist[b % dim] += 1
        total = max(sum(hist), 1)
        return [h / total for h in hist]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "embedding": [embed_one(b) for b in pdf["content"]],
                    "extractor": ["fake"] * len(pdf),
                }
            )

    return media.select("media_id", "content").mapInPandas(run, FEATURE_SCHEMA)
