"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
UDF signatures, batch shapes. The actual codec work (image decode, audio
resample, frame extraction) is STUBBED: the sandbox has no PIL/ffmpeg, so
``decode=...`` functions raise NotImplementedError unless
``deterministic_fake=True``, which produces seeded fake features with the
right shapes (useful for pipeline tests at any scale).

Pattern: ``mapInPandas`` over an iterator of Arrow batches — constant
memory per task regardless of blob sizes, the standard Spark idiom for
binary-heavy columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque blob
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("feat_dim", T.IntegerType(), True),
    ]
)


def synth_media(spark, n: int, seed: int = 42, blob_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes
    built JVM-side; no Python in the data path).

    Blobs are concatenated md5 digests of (seed, id, chunk) — md5 being a
    cross-engine standard means an independent SQL engine can regenerate
    the exact bytes, so downstream feature extraction is value-checkable
    end-to-end (blob_bytes must be a multiple of 16)."""
    if blob_bytes % 16 != 0:
        raise ValueError("blob_bytes must be a multiple of the md5 chunk size (16)")
    df = spark.range(n).withColumnRenamed("id", "i")
    # kind from the first md5 nibble (cross-engine reproducible, like blobs)
    kind_idx = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("-", F.lit(seed), F.lit("k"), F.col("i"))), 1, 1),
            16,
            10,
        ).cast("int"),
        F.lit(3),
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (kind_idx + 1).cast("int"),
    )
    # blob: concat of 16-byte md5 chunks — opaque, deterministic
    words = F.transform(
        F.sequence(F.lit(1), F.lit(blob_bytes // 16)),
        lambda j: F.unhex(F.md5(F.concat_ws("-", F.lit(seed), F.col("i"), j))),
    )
    payload = F.aggregate(words, F.lit(b""), lambda acc, w: F.concat(acc, w))
    return df.select(
        F.format_string("m-%08d", F.col("i").cast("int")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
    )


def extract_features(
    df: DataFrame, feat_dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """Binary blobs → fixed-dim float features via mapInPandas.

    Real deployment: replace the fake branch with the codec call (PIL /
    torchaudio / ffmpeg) — the iterator/batch plumbing stays identical.
    """

    if not deterministic_fake:
        # driver-side, BEFORE the UDF is built: checked inside the batch
        # loop, an empty input silently succeeded (masking the
        # misconfiguration) and a non-empty one failed only as a remote
        # task error at action time
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; use deterministic_fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf["payload"]:
                if blob is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                # seeded fake "embedding": byte histogram folded to feat_dim
                hist = np.bincount(arr % feat_dim, minlength=feat_dim)
                feats.append((hist / max(len(arr), 1)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": np.int32(feat_dim),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, deterministic_fake: bool = True
) -> DataFrame:
    """Image resize over binary blobs via mapInPandas.

    Real deployment: PIL/opencv decode → resize → re-encode inside the
    iterator. Sandbox has no codecs, so the fake branch produces a
    deterministic downsample: the blob byte-stream is re-sampled to
    width*height bytes (stride sampling) — same memory/batch shape as the
    real thing, value-checkable by any engine that can regenerate blobs.
    """

    if not deterministic_fake:
        # driver-side, BEFORE the UDF is built: checked inside the batch
        # loop, an empty input silently succeeded (masking the
        # misconfiguration) and a non-empty one failed only as a remote
        # task error at action time
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; use deterministic_fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height
        for pdf in batches:
            out = []
            for blob in pdf["payload"]:
                if blob is None or len(blob) == 0:
                    out.append(None if blob is None else b"")
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                idx = (np.arange(target) * len(arr)) // target
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("ts_ms", T.IntegerType(), True),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, deterministic_fake: bool = True
) -> DataFrame:
    """Video frame sampling: one input row fans out to n_frames rows
    (mapInPandas iterator keeps memory constant per task regardless of
    video size). Fake branch slices the blob into n_frames equal chunks
    with evenly-spaced timestamps over duration_ms."""

    if not deterministic_fake:
        # driver-side, BEFORE the UDF is built: checked inside the batch
        # loop, an empty input silently succeeded (masking the
        # misconfiguration) and a non-empty one failed only as a remote
        # task error at action time
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; use deterministic_fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, frames, tss = [], [], [], []
            for mid, blob, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if blob is None:
                    continue
                raw = bytes(blob)
                step = max(len(raw) // n_frames, 1)
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[k * step : (k + 1) * step])
                    # pd.isna, not `or 0`: Arrow hands a nullable int
                    # column over as float64 NaN / pd.NA, both of which
                    # `or` passes through (int(NaN) kills the task)
                    d = 0 if pd.isna(dur) else int(dur)
                    tss.append(d * k // n_frames)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "frame": frames,
                    "ts_ms": np.array(tss, dtype=np.int32),
                }
            )

    return df.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)
