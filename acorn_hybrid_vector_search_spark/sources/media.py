"""Multimodal columns: image/audio/video as typed binary + metadata.

Charter extension (the reference is image-only and single-machine —
vector_embeddings.py loads JPEGs one at a time). The engine-side contract
at 100 TB:

- media is an opaque ``BINARY`` column + typed metadata (codec, duration,
  dims), NEVER a decoded tensor at rest — decode happens inside Arrow
  batches on executors, bounded by batch size;
- per-modality transforms are ``mapInPandas`` stages (iterator form: one
  Python worker per partition, streaming batches, constant memory);
- frame sampling / resize / feature extraction emit EXPLODED rows (one
  per frame/window) with the parent id — downstream joins/aggregations
  are plain relational ops.

Codec decode itself (PIL/ffmpeg/torchaudio) is NOT available in this
container: ``decoder=None`` uses a deterministic fake that preserves every
contract (schema, batch shapes, row multiplicity, determinism) so the
pipeline is fully testable; a real decoder is a one-argument swap.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("uri", StringType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("codec", StringType()),
        StructField("duration_ms", LongType()),  # NULL for images
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def read_media_dir(spark, path: str, modality: str, pattern: str = "*") -> DataFrame:
    """binaryFile scan + media metadata columns (modality from the caller,
    codec from the extension; dims/duration NULL until probed)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return df.select(
        F.xxhash64("path").alias("media_id"),
        F.col("path").alias("uri"),
        F.lit(modality).alias("modality"),
        F.lower(F.element_at(F.split(F.col("path"), r"\."), -1)).alias("codec"),
        F.lit(None).cast(LongType()).alias("duration_ms"),
        F.lit(None).cast(IntegerType()).alias("width"),
        F.lit(None).cast(IntegerType()).alias("height"),
        F.col("content"),
    )


# ---------------------------------------------------------------------------
# deterministic fake decoders (container has no PIL/ffmpeg — see module doc)


def _fake_frames(content: bytes, n: int) -> list[bytes]:
    """n deterministic pseudo-frames derived from the payload hash."""
    base = hashlib.md5(content[:4096] if content else b"").digest()
    return [hashlib.md5(base + i.to_bytes(4, "big")).digest() for i in range(n)]


def _fake_features(frame: bytes, dim: int) -> list[float]:
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(frame + counter.to_bytes(4, "big")).digest()
        out.extend(int.from_bytes(h[j : j + 4], "big") / 2**31 - 1.0 for j in range(0, 16, 4))
        counter += 1
    return out[:dim]


# ---------------------------------------------------------------------------
# transforms (mapInPandas — iterator of batches, constant memory)

_FRAMES_FIELDS = [
    StructField("media_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("frame", BinaryType()),
]


def sample_frames(
    media: DataFrame,
    frames_per_item: int = 4,
    *,
    decoder: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """video/audio → one row per sampled frame/window (uniform stride).

    Output: (media_id, frame_no, frame BINARY). With a real decoder this is
    ffmpeg-over-bytes inside the executor; the plan shape (narrow map,
    explode-like fan-out, no shuffle) is identical either way.
    """
    decode = decoder or _fake_frames
    schema = StructType(_FRAMES_FIELDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            nos: list[int] = []
            frames: list[bytes] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i, fr in enumerate(decode(bytes(content or b""), frames_per_item)):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.select("media_id", "content").mapInPandas(gen, schema)


def extract_features(
    frames: DataFrame,
    dim: int = 64,
    *,
    featurizer: Callable[[bytes, int], list[float]] | None = None,
    frame_col: str = "frame",
) -> DataFrame:
    """frame → fixed-dim float feature vector (pandas UDF, Arrow batches).
    The real path wraps a vision/audio model exactly like
    sources.images.with_embeddings does for ResNet-50."""
    feat = featurizer or _fake_features

    @F.pandas_udf(ArrayType(FloatType()))
    def fx(col: pd.Series) -> pd.Series:
        return col.map(lambda b: feat(bytes(b or b""), dim))

    return frames.withColumn("features", fx(F.col(frame_col)))


def media_summary(media: DataFrame) -> DataFrame:
    """Per-modality storage stats — the operational query every media lake
    needs (bytes scanned from metadata only: content column pruned)."""
    return media.groupBy("modality", "codec").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
    )
