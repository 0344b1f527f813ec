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
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("i")), F.lit(3)) + 1).cast("int"),
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; use deterministic_fake=True"
                )
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
