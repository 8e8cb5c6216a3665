"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no image/audio codecs, so the decode kernels are
STUBBED (clearly marked): ``decode='fake'`` produces deterministic
features derived from the bytes so the Spark-side plumbing — schema,
batch shape, partition sizing — is real and testable;
``decode='real'`` raises ``NotImplementedError`` where PIL/librosa
would be called.

Scale shape: binary payloads dominate row size, so operators
repartition by a size budget (``target_rows_per_batch``) before the
Arrow exchange, and metadata-only plans never touch the blob column
(column pruning keeps the scan cheap — verified in tests via the
physical plan's ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),      # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, media_type: str = "image") -> DataFrame:
    """Synthesize a deterministic opaque blob + typed metadata from an
    id column — the fixture generator for multimodal plumbing tests
    (blob = repeated md5 bytes; metadata derived from the id hash)."""
    h = F.md5(F.col(id_col).cast("string"))
    blob = F.unhex(F.concat(h, h, h, h))  # 64 deterministic bytes
    return df.withColumn("media", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("png" if media_type == "image" else "wav").alias("format"),
            (F.pmod(F.xxhash64(F.col(id_col)), F.lit(512)) + 16).cast("int").alias("width"),
            (F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), F.lit(512)) + 16).cast("int").alias("height"),
            (F.pmod(F.xxhash64(F.col(id_col), F.lit(2)), F.lit(60_000)) + 100).cast("int").alias("duration_ms"),
        ),
    )


FEATURE_SCHEMA = "id long, n_bytes int, byte_mean double, byte_histogram array<int>"


def extract_media_features(
    df: DataFrame,
    id_col: str,
    blob_col: str = "media",
    decode: str = "fake",
    target_rows_per_batch: int = 1024,
) -> DataFrame:
    """Decode/feature-extract over the blob column via mapInPandas.

    ``decode='real'`` is the integration point for actual codecs —
    STUB: raises NotImplementedError (no PIL/librosa in this image).
    ``decode='fake'`` computes deterministic byte statistics with the
    same batch shape/signature a real decoder would use.
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/librosa — not available in this image"
                )
            blobs = pdf[blob_col]
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int32"),
                    "byte_mean": blobs.map(lambda b: float(sum(b)) / max(len(b), 1)),
                    "byte_histogram": blobs.map(
                        lambda b: [sum(1 for x in b if (x >> 6) == q) for q in range(4)]
                    ),
                }
            )
            yield out

    # size Arrow batches for blob-heavy rows
    narrowed = df.select(F.col(id_col), F.col(blob_col))
    return narrowed.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, blob_col: str = "media", every_n_bytes: int = 16
) -> DataFrame:
    """'Frame sampling' stand-in: slice the blob every N bytes (the
    plumbing twin of video frame extraction) — pure column expressions
    (substring on binary), no Python."""
    n_frames = F.floor(F.length(F.col(blob_col)) / every_n_bytes).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: F.substring(F.col(blob_col), (i * every_n_bytes + 1).cast("int"), every_n_bytes),
    )
    return df.select(F.col(id_col), F.posexplode(frames).alias("frame_idx", "frame_bytes"))
