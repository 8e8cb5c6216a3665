"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no image/audio codecs, so the default decode kernel
is a STUB (clearly marked): ``decode='fake'`` produces deterministic
features derived from the bytes so the Spark-side plumbing — schema,
batch shape, partition sizing — is real and testable.
``decode='real'`` is guarded optional-dependency code: it decodes via
PIL (images) or soundfile (audio) when those packages are importable
on the executors, and raises ``NotImplementedError`` naming the
missing package otherwise. Feature shape is identical either way, so
a pipeline developed against the fake path runs unchanged where
codecs exist.

Scale shape: binary payloads dominate row size, so the feature
operator re-spreads the (id, blob) projection to a byte budget per
partition (``target_bytes_per_partition``, plan-stats-derived, no
probe job) before the Arrow exchange, and metadata-only plans never
touch the blob column (column pruning keeps the scan cheap — verified
in tests via the physical plan's ReadSchema).
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


def _decode_real(blob: bytes, media_type: str):
    """Optional-dependency decode: PIL for images, soundfile for
    audio. Raises NotImplementedError naming the missing package when
    the codec isn't installed — same behavior on driver and executor,
    so the error surfaces clearly on the first batch."""
    import io

    import numpy as np

    if media_type == "image":
        try:
            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                "decode='real' for images requires PIL (pillow) — not installed; "
                "use decode='fake' for codec-free plumbing"
            ) from None
        return np.asarray(Image.open(io.BytesIO(bytes(blob))).convert("L"), dtype=np.uint8).ravel()
    if media_type == "audio":
        try:
            import soundfile
        except ImportError:
            raise NotImplementedError(
                "decode='real' for audio requires soundfile — not installed; "
                "use decode='fake' for codec-free plumbing"
            ) from None
        data, _sr = soundfile.read(io.BytesIO(bytes(blob)))
        return np.clip(np.asarray(data, dtype="float64").ravel() * 127.0 + 128.0, 0, 255).astype(
            np.uint8
        )
    if media_type == "video":
        try:
            import av
        except ImportError:
            raise NotImplementedError(
                "decode='real' for video requires av (PyAV) — not installed; "
                "use decode='fake' for codec-free plumbing"
            ) from None
        try:
            import PIL  # noqa: F401 — frame.to_image() needs Pillow at runtime
        except ImportError:
            raise NotImplementedError(
                "decode='real' for video requires PIL (pillow) for frame "
                "conversion — not installed; use decode='fake'"
            ) from None
        with av.open(io.BytesIO(bytes(blob))) as container:
            frames = []
            for frame in container.decode(video=0):
                frames.append(
                    np.asarray(frame.to_image().convert("L"), dtype=np.uint8).ravel()
                )
            if not frames:
                return np.zeros(0, dtype=np.uint8)
            return np.concatenate(frames)
    raise NotImplementedError(f"decode='real' not supported for media_type={media_type!r}")


def extract_media_features(
    df: DataFrame,
    id_col: str,
    blob_col: str = "media",
    decode: str = "fake",
    media_type: str = "image",
    target_bytes_per_partition: int | None = 64 << 20,
) -> DataFrame:
    """Decode/feature-extract over the blob column via mapInPandas.

    ``decode='fake'`` computes deterministic byte statistics straight
    from the blob — numpy-vectorized per blob (frombuffer + bincount),
    so the stub's throughput is representative of a real decoder's
    post-decode feature pass. ``decode='real'`` decodes first (PIL /
    soundfile when importable, else NotImplementedError) and computes
    the same features over the decoded samples; ``n_bytes`` always
    reports the raw blob size.

    Blob payloads dominate row size, so before the Arrow exchange the
    narrowed (id, blob) projection is re-spread until its estimated
    partitions hold at most ``target_bytes_per_partition`` each — the
    estimate comes from logical-plan size statistics (driver-side, no
    job), and partitions already under budget are never coalesced. A
    10 MB-blob corpus under the default 128 MB scan split would
    otherwise feed multi-GB working sets to each decode task; the
    per-Arrow-batch row count within a partition stays governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``. Pass ``None`` to
    skip the re-spread."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = pdf[blob_col]
            raw = [np.frombuffer(b, dtype=np.uint8) for b in blobs]
            if decode == "real":
                arrs = [_decode_real(b, media_type) for b in blobs]
            else:
                arrs = raw
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": np.fromiter((a.size for a in raw), dtype="int32", count=len(raw)),
                    "byte_mean": [
                        float(a.sum()) / max(a.size, 1) for a in arrs
                    ],
                    "byte_histogram": [
                        np.bincount(a >> 6, minlength=4).astype("int32").tolist() for a in arrs
                    ],
                }
            )
            yield out

    narrowed = df.select(F.col(id_col), F.col(blob_col))
    if target_bytes_per_partition:
        # same driver-side plan-stats probe as dedup's shingle
        # re-spread — never a Spark job, never an .rdd conversion
        from odibel_spark.functions.dedup import _estimated_scan_partitions

        try:
            size = int(
                narrowed._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            # stats-less plans (RDD-backed, some views) report
            # defaultSizeInBytes = Long.MaxValue — that is "unknown",
            # not "huge"; re-spreading on it would ask for ~1.4e11
            # partitions (and overflow repartition's int argument)
            want = None if size >= 2**60 else max(1, -(-size // target_bytes_per_partition))
        except Exception:
            want = None
        have = _estimated_scan_partitions(narrowed)
        if want is not None and have is not None and have < want <= 2**31 - 1:
            narrowed = narrowed.repartition(want)
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
