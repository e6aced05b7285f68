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

Compressed-codec decode (PIL/ffmpeg/torchaudio) is NOT available in this
container: for those, ``decoder=None`` uses a deterministic fake that
preserves every contract (schema, batch shapes, row multiplicity,
determinism) so the pipeline is fully testable; a real decoder is a
one-argument swap. PCM WAV and YUV4MPEG2 however need no codec library,
so ``decode_audio`` / ``decode_y4m_frames`` below are REAL decoders over
the committed ``fixtures/media`` files (tools/make_media_fixture.py),
with integer-exact stats that DuckDB replays from the same blobs in
oracle SQL.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
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
    return _media_columns(df, modality)


def read_media_stream(
    spark, path: str, modality: str, pattern: str = "*"
) -> DataFrame:
    """STREAMING binaryFile source over a media landing directory — the
    continuous-ingest front of the same pipeline (new objects are
    decoded as they land; every downstream transform — decode_audio,
    decode_y4m_frames, featurization — is a stateless narrow map, so it
    runs unchanged on the stream). The binaryFile streaming source
    requires an explicit schema; it is fixed for this format."""
    from pyspark.sql.types import TimestampType

    src_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    df = (
        spark.readStream.format("binaryFile")
        .schema(src_schema)
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return _media_columns(df, modality)


def _media_columns(df: DataFrame, modality: str) -> DataFrame:
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


# ---------------------------------------------------------------------------
# REAL decoders — PCM WAV and YUV4MPEG2 are simple public formats that
# need no external codec library, so unlike the image path (ResNet-50 is
# torch-gated) the audio/video decode below is the genuine article:
# header walk + sample math on the actual bytes, executed inside
# mapInPandas batches. Integer stats (sum of squares, peak, luma sums)
# are exact, which lets DuckDB replay the decode from the same blobs in
# oracle SQL (__spark_entry__.py audio_etl / video_frames_etl).


def parse_wav(content: bytes) -> dict:
    """Walk the RIFF chunk list of a PCM WAV file and decode the
    samples (8-bit unsigned, 16/24/32-bit signed — the real-world PCM
    depths, including WAVE_FORMAT_EXTENSIBLE containers with a PCM
    subformat). Returns header fields plus integer-exact waveform
    stats; 8-bit samples are centered (−128) so stats share the
    signed-zero convention across depths.

    Chunk-walking (not fixed offsets): tolerates LIST/INFO/fact chunks
    between ``fmt `` and ``data`` as real-world WAVs have.
    """
    import numpy as np

    if len(content) < 12 or content[0:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"fmt chunk truncated ({len(body)} < 16 bytes)")
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _align, bit_depth = fmt
    # corrupt headers must surface as ValueError — the permissive-mode
    # quarantine catches exactly that, and a struct.error or
    # ZeroDivisionError leaking out of one bad object would abort the
    # whole ingest the quarantine exists to protect
    if n_channels <= 0 or sample_rate <= 0:
        raise ValueError(
            f"invalid fmt header (channels={n_channels}, rate={sample_rate})"
        )
    if audio_format == 0xFFFE and len(fmt_body) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the first 2 bytes
        # of the 16-byte SubFormat GUID (offset 24 in the fmt body)
        (audio_format,) = struct.unpack("<H", fmt_body[24:26])
    if audio_format != 1:
        raise ValueError(f"only PCM supported (fmt={audio_format})")
    # a data chunk that is not a whole number of sample frames is
    # corrupt for EVERY depth — raise the same quarantinable ValueError
    # the 16/32-bit np.frombuffer paths raise, instead of the 24-bit
    # path silently truncating trailing bytes into wrong stats
    frame_bytes = (bit_depth // 8) * n_channels
    if bit_depth in (8, 16, 24, 32) and frame_bytes and len(data) % frame_bytes:
        raise ValueError(
            f"data chunk length {len(data)} is not a multiple of the "
            f"{frame_bytes}-byte sample frame ({bit_depth}-bit × "
            f"{n_channels}ch)"
        )
    if bit_depth == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
        samples <<= 8  # normalize to 16-bit full scale (see below)
    elif bit_depth == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif bit_depth == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw.reshape(-1, 3).astype(np.int64)
        u = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        samples = np.where(u >= 1 << 23, u - (1 << 24), u) >> 8
    elif bit_depth == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.int64) >> 16
    else:
        raise ValueError(f"unsupported PCM bit depth {bit_depth}")
    # Stats are computed over samples NORMALIZED to 16-bit full scale
    # (8-bit << 8, 24-bit >> 8 arithmetic, 32-bit >> 16): sum_sq/peak
    # become depth-invariant loudness probes AND stay exactly
    # representable in the LongType columns — a full-scale 32-bit
    # square is ~2^62, so native-unit accumulation would overflow
    # after TWO samples. 16-bit input (the fixtures, and the oracle's
    # replay) is bit-identical to the unnormalized decode.
    n_frames = len(samples) // n_channels
    # normalized samples are ≤ 2^15 in magnitude → each square ≤ 2^30;
    # int64 accumulation is exact to ~2^33 samples (≈ 13 h @ 44.1 kHz
    # stereo) — raise loudly rather than wrap beyond that
    if len(samples) > 1 << 33:
        raise ValueError("clip too long for exact int64 sum_sq accumulation")
    sum_sq = int((samples * samples).sum())
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bit_depth": bit_depth,
        "n_samples": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
        "sum_sq": sum_sq,
        "peak_abs": int(np.abs(samples).max()) if len(samples) else 0,
        "rms": float(math.sqrt(sum_sq / len(samples))) if len(samples) else 0.0,
    }


_AUDIO_FIELDS = [
    StructField("media_id", LongType()),
    StructField("filename", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("bit_depth", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_ms", LongType()),
    StructField("sum_sq", LongType()),
    StructField("peak_abs", LongType()),
    StructField("rms", DoubleType()),
]

AUDIO_SCHEMA = StructType(_AUDIO_FIELDS)
AUDIO_SCHEMA_PERMISSIVE = StructType(
    _AUDIO_FIELDS + [StructField("corrupt_reason", StringType())]
)

_AUDIO_STAT_KEYS = (
    "sample_rate", "n_channels", "bit_depth", "n_samples",
    "duration_ms", "sum_sq", "peak_abs", "rms",
)


def decode_audio(media: DataFrame, *, mode: str = "failfast") -> DataFrame:
    """audio binary → header fields + integer-exact waveform stats.

    One output row per input file; narrow map (no shuffle). At 100 TB
    this is the canonical "probe + fingerprint" pass over an audio lake:
    constant memory per batch, the binary column never leaves the
    executor, and the emitted row is a few dozen bytes.

    ``mode``: ``failfast`` (default) raises on the first undecodable
    object — the contract correctness gates want. ``permissive`` is the
    100 TB contract (mirrors spark.read's PERMISSIVE/_corrupt_record):
    a lake WILL contain truncated/mislabeled objects, and one of them
    must not kill a week-long ingest — the row survives with NULL stats
    and the parse error in ``corrupt_reason``, so the quarantine branch
    is an ordinary ``filter(corrupt_reason IS NOT NULL)``.
    """
    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    permissive = mode == "permissive"
    schema = AUDIO_SCHEMA_PERMISSIVE if permissive else AUDIO_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, uri, content in zip(pdf["media_id"], pdf["uri"], pdf["content"]):
                try:
                    rec = parse_wav(bytes(content or b""))
                    if permissive:
                        rec["corrupt_reason"] = None
                except ValueError as e:
                    if not permissive:
                        raise
                    rec = dict.fromkeys(_AUDIO_STAT_KEYS)
                    rec["corrupt_reason"] = str(e)
                rec["media_id"] = mid
                rec["filename"] = uri.rsplit("/", 1)[-1]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return media.select("media_id", "uri", "content").mapInPandas(gen, schema)


_IMAGE_FIELDS = [
    StructField("media_id", LongType()),
    StructField("filename", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_components", IntegerType()),
    StructField("y_sum", LongType()),
    StructField("y_min", IntegerType()),
    StructField("y_max", IntegerType()),
    StructField("pix_sha256", StringType()),
]

IMAGE_SCHEMA = StructType(_IMAGE_FIELDS)
IMAGE_SCHEMA_PERMISSIVE = StructType(
    _IMAGE_FIELDS + [StructField("corrupt_reason", StringType())]
)

_IMAGE_STAT_KEYS = (
    "width", "height", "n_components", "y_sum", "y_min", "y_max", "pix_sha256",
)


def decode_images(
    media: DataFrame, *, mode: str = "failfast", emit_pixels: bool = False
) -> DataFrame:
    """image binary → REAL baseline-JPEG decode (sources/jpeg.py):
    dimensions + integer-exact Y-plane stats + a sha256 of the decoded
    pixel bytes. The image-modality analog of ``decode_audio`` — the
    reference's PIL ``Image.open`` step
    (/root/reference/vector_embeddings.py:41-59) re-expressed as a
    stateless narrow map with a from-the-spec decoder.

    Same ``failfast``/``permissive`` quarantine contract as the other
    decoders; the pixel digest is what the golden-parity gate compares
    (fixtures/golden/jpeg_pixels.parquet, generated by an independent
    pure-python IDCT — agreement is bit-exact because the IDCT contract
    is fixed-point integer arithmetic).

    ``emit_pixels=True`` adds a ``frame`` binary column holding the
    decoded Y plane, schema-compatible with ``luma_grid_features`` —
    the decode→featurize composition the video path already has
    (quarantine rows carry NULL ``frame`` and flow through it as NULL
    features).
    """
    import hashlib

    from acorn_hybrid_vector_search_spark.sources.jpeg import parse_jpeg

    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    permissive = mode == "permissive"
    fields = list(_IMAGE_FIELDS)
    if emit_pixels:
        fields.append(StructField("frame", BinaryType()))
    if permissive:
        fields.append(StructField("corrupt_reason", StringType()))
    schema = StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, uri, content in zip(pdf["media_id"], pdf["uri"], pdf["content"]):
                try:
                    dec = parse_jpeg(bytes(content or b""))
                    px = dec["pixels"]
                    y = px if px.ndim == 2 else px[..., 0]
                    rec = {
                        "width": dec["width"],
                        "height": dec["height"],
                        "n_components": dec["n_components"],
                        "y_sum": int(y.sum(dtype="int64")),
                        "y_min": int(y.min()),
                        "y_max": int(y.max()),
                        "pix_sha256": hashlib.sha256(px.tobytes()).hexdigest(),
                    }
                    if emit_pixels:
                        rec["frame"] = y.tobytes()
                    if permissive:
                        rec["corrupt_reason"] = None
                except ValueError as e:
                    if not permissive:
                        raise
                    rec = dict.fromkeys(_IMAGE_STAT_KEYS)
                    if emit_pixels:
                        rec["frame"] = None
                    rec["corrupt_reason"] = str(e)
                rec["media_id"] = mid
                rec["filename"] = uri.rsplit("/", 1)[-1]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return media.select("media_id", "uri", "content").mapInPandas(gen, schema)


def parse_y4m(content: bytes) -> tuple[dict, list[bytes]]:
    """Parse a YUV4MPEG2 stream: header line + FRAME-delimited raw
    planes. Returns (header fields, list of per-frame plane payloads).
    Supports C444 (3·W·H) and C420 (W·H + 2·(W/2·H/2))."""
    nl = content.index(b"\n")
    tokens = content[:nl].decode("ascii").split(" ")
    if tokens[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    fps_num, fps_den = 0, 1
    colorspace = "C420"
    for t in tokens[1:]:
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            fps_num, fps_den = (int(x) for x in t[1:].split(":"))
        elif t.startswith("C"):
            colorspace = t
    if width is None or height is None:
        raise ValueError("missing W/H in y4m header")
    if colorspace.startswith("C444"):
        frame_bytes = 3 * width * height
    elif colorspace.startswith("C420"):
        frame_bytes = width * height + 2 * ((width // 2) * (height // 2))
    else:
        raise ValueError(f"unsupported colorspace {colorspace}")
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(content):
        fnl = content.index(b"\n", pos)
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        frame = content[fnl + 1 : fnl + 1 + frame_bytes]
        if len(frame) != frame_bytes:
            # a silently-short final frame would yield wrong luma stats
            # and crash the reshape in luma_grid_features — truncation
            # is a parse error (ValueError → quarantinable)
            raise ValueError(
                f"truncated stream: frame {len(frames)} has "
                f"{len(frame)}/{frame_bytes} bytes"
            )
        frames.append(frame)
        pos = fnl + 1 + frame_bytes
    return (
        {
            "width": width,
            "height": height,
            "fps_num": fps_num,
            "fps_den": fps_den,
            "n_frames": len(frames),
        },
        frames,
    )


_Y4M_FIELDS = [
    StructField("media_id", LongType()),
    StructField("filename", StringType()),
    StructField("frame_no", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("luma_sum", LongType()),
    StructField("frame", BinaryType()),
]

Y4M_FRAMES_SCHEMA = StructType(_Y4M_FIELDS)
Y4M_FRAMES_SCHEMA_PERMISSIVE = StructType(
    _Y4M_FIELDS + [StructField("corrupt_reason", StringType())]
)


def decode_y4m_frames(
    media: DataFrame, stride: int = 1, *, mode: str = "failfast"
) -> DataFrame:
    """video binary → one row per sampled frame (every ``stride``-th),
    with the decoded Y-plane payload and its integer luma sum.

    The explode-like fan-out happens inside the executor (mapInPandas),
    so a 1-hour clip never materializes as one driver-side object; at
    100 TB the per-frame rows feed straight into extract_features /
    dedup without a shuffle.

    ``mode='permissive'`` (same contract as :func:`decode_audio`): an
    unparseable stream yields ONE quarantine row (NULL frame fields,
    parse error in ``corrupt_reason``) instead of failing the job;
    good rows carry ``corrupt_reason`` NULL.
    """
    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    permissive = mode == "permissive"
    schema = Y4M_FRAMES_SCHEMA_PERMISSIVE if permissive else Y4M_FRAMES_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, uri, content in zip(pdf["media_id"], pdf["uri"], pdf["content"]):
                fname = uri.rsplit("/", 1)[-1]
                try:
                    head, frames = parse_y4m(bytes(content or b""))
                except ValueError as e:
                    if not permissive:
                        raise
                    rows.append(
                        {
                            "media_id": mid,
                            "filename": fname,
                            "frame_no": None,
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "luma_sum": None,
                            "frame": None,
                            "corrupt_reason": str(e),
                        }
                    )
                    continue
                plane = head["width"] * head["height"]
                for i in range(0, len(frames), stride):
                    y = frames[i][:plane]
                    row = {
                        "media_id": mid,
                        "filename": fname,
                        "frame_no": i,
                        "width": head["width"],
                        "height": head["height"],
                        "n_frames": head["n_frames"],
                        "luma_sum": sum(y),
                        "frame": y,
                    }
                    if permissive:
                        row["corrupt_reason"] = None
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return media.select("media_id", "uri", "content").mapInPandas(gen, schema)


def luma_grid_features(
    frames: DataFrame, grid: int = 8, *, dtype: str = "float32"
) -> DataFrame:
    """REAL frame featurization: block-mean pool the decoded Y plane to
    a ``grid×grid`` intensity map (the classic decode→resize→feature
    step, here an exact area-binned downscale — numpy reduceat over row
    and column bins, no codec needed). Output column ``features`` is
    ``grid²`` floats; frames smaller than the grid bin to their own
    pixel rows/cols (bins are ``i*dim//grid`` boundaries, never empty
    for dim ≥ grid, degenerate-safe below).

    This is the production shape for video near-dup / similarity over
    the frames relation: a pandas-UDF-free mapInPandas batch, fed
    straight into operators.dedup.embedding_near_dups or the ANN
    family.

    ``dtype='float32'`` (default) is the storage-efficient engine
    contract; ``'float64'`` keeps each cell the EXACT IEEE quotient of
    integer pixel-sum / block-count, which an oracle SQL ``AVG(ord(…))``
    reproduces bit-for-bit (__spark_entry__.py video_frame_similarity).

    Quarantine rows pass through with NULL ``features``: permissive-mode
    decoding emits rows with NULL frame/width/height and a
    ``corrupt_reason``, and the documented decode→features composition
    must not abort the job on them (the quarantine contract is that
    corruption stays a *data* property, never an exception).
    """
    import numpy as np

    if dtype not in ("float32", "float64"):
        raise ValueError(f"dtype must be float32|float64, got {dtype!r}")
    elem = FloatType() if dtype == "float32" else DoubleType()
    out_fields = list(frames.schema.fields) + [
        StructField("features", ArrayType(elem))
    ]
    schema = StructType(out_fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for frame, w, h in zip(pdf["frame"], pdf["width"], pdf["height"]):
                if frame is None or pd.isna(w) or pd.isna(h):
                    feats.append(None)
                    continue
                y = np.frombuffer(bytes(frame), dtype=np.uint8)[: w * h]
                y = y.reshape(int(h), int(w)).astype(np.float64)
                gh, gw = min(grid, y.shape[0]), min(grid, y.shape[1])
                rb = (np.arange(gh) * y.shape[0]) // gh
                cb = (np.arange(gw) * y.shape[1]) // gw
                pooled = np.add.reduceat(np.add.reduceat(y, rb, axis=0), cb, axis=1)
                counts = np.outer(
                    np.diff(np.append(rb, y.shape[0])),
                    np.diff(np.append(cb, y.shape[1])),
                )
                feats.append((pooled / counts).astype(dtype).ravel().tolist())
            out = pdf.copy()
            out["features"] = feats
            yield out

    return frames.mapInPandas(gen, schema)


def media_summary(media: DataFrame) -> DataFrame:
    """Per-modality storage stats — the operational query every media lake
    needs (bytes scanned from metadata only: content column pruned)."""
    return media.groupBy("modality", "codec").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
    )
