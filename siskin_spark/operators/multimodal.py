"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas`` (SURVEY.md §7.5).

The container has no image/audio libraries, so the actual decoders are
STUBBED: ``decode_image_stub`` raises NotImplementedError and
``fake_decode_features`` produces deterministic pseudo-features from
the bytes (md5-derived), keeping the Spark-side plumbing — schema,
batch iteration, partitioning, UDF signatures — real and tested.
Swap ``fake_decode_features`` for a Pillow/librosa call in a real
deployment; nothing else changes.

Scale notes: binary payloads ride in Parquet binary columns;
``spark.sql.files.maxPartitionBytes`` bounds scan partitions, and the
mapInPandas batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``)
bounds executor memory per batch — at 100 TB you tune those two knobs,
not the code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_stub(content: bytes) -> tuple[int, int]:
    """Real decoder slot — requires an image library not present in
    this container."""
    raise NotImplementedError(
        "image decoding requires Pillow/libvips; use fake_decode_features "
        "for plumbing tests"
    )


def fake_decode_features(content: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: pseudo width/height and a unit
    feature vector derived from the md5 of the bytes."""
    h = hashlib.md5(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    raw = [float(b) - 127.5 for b in h[2 : 2 + dim]]
    n = sum(x * x for x in raw) ** 0.5 or 1.0
    return width, height, [x / n for x in raw]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media rows.

    Arrow-batched: each pandas batch holds whole payloads; the iterator
    form keeps peak memory at one batch regardless of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(c, dim) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "sha1": [hashlib.sha1(c).hexdigest() for c in pdf["content"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "feature": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through (a real impl transforms
    ``content``); records the target size in ``meta`` so downstream
    stages see the declared dimensions."""
    return media.withColumn(
        "meta",
        F.map_concat(
            F.coalesce(F.col("meta"), F.create_map().cast("map<string,string>")),
            F.create_map(
                F.lit("resize_w"), F.lit(str(width)),
                F.lit("resize_h"), F.lit(str(height)),
            ),
        ),
    )


def frame_sample_stub(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: emits one pseudo-frame row per
    media row per sampled offset (deterministic count from byte length);
    a real impl would demux with pyav."""
    n_frames = (F.length(F.col("content")) % 4 + 1).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_offset_s", F.col("frame_idx") * F.lit(every_s))
    )
