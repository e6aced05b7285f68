"""Multimodal media plumbing: binary scan schema, frame fan-out
multiplicity, feature shapes, determinism across executions."""

from __future__ import annotations

import pytest

from acorn_hybrid_vector_search_spark.sources.media import (
    MEDIA_SCHEMA,
    extract_features,
    media_summary,
    read_media_dir,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    for shard in ("00", "01"):
        (d / shard).mkdir()
    (d / "00" / "a.mp4").write_bytes(b"\x00fakevideo-a" * 100)
    (d / "00" / "b.mp4").write_bytes(b"\x00fakevideo-b" * 50)
    (d / "01" / "c.wav").write_bytes(b"\x00fakeaudio-c" * 80)
    return d


@pytest.fixture(scope="module")
def media(spark, media_dir):
    return read_media_dir(spark, str(media_dir), "video", "*.mp4").cache()


def test_read_media_schema_and_rows(media):
    # names + types (nullability differs: computed cols are non-nullable)
    assert [(f.name, f.dataType) for f in media.schema] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA
    ]
    rows = media.collect()
    assert len(rows) == 2
    assert {r["codec"] for r in rows} == {"mp4"}
    assert all(r["modality"] == "video" for r in rows)
    assert len({r["media_id"] for r in rows}) == 2  # distinct ids


def test_sample_frames_multiplicity(media):
    frames = sample_frames(media, frames_per_item=4)
    rows = frames.collect()
    assert len(rows) == 2 * 4
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)
    assert {r["frame_no"] for r in rows} == {0, 1, 2, 3}
    assert all(isinstance(r["frame"], (bytes, bytearray)) for r in rows)


def test_frames_deterministic(media):
    a = {(r["media_id"], r["frame_no"]): bytes(r["frame"])
         for r in sample_frames(media, 3).collect()}
    b = {(r["media_id"], r["frame_no"]): bytes(r["frame"])
         for r in sample_frames(media, 3).collect()}
    assert a == b


def test_extract_features_shape(media):
    feats = extract_features(sample_frames(media, 2), dim=16)
    rows = feats.collect()
    assert len(rows) == 4
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same frame → same features
    again = extract_features(sample_frames(media, 2), dim=16).collect()
    assert {(r["media_id"], r["frame_no"]): r["features"] for r in rows} == {
        (r["media_id"], r["frame_no"]): r["features"] for r in again
    }


def test_media_summary(spark, media_dir, media):
    audio = read_media_dir(spark, str(media_dir), "audio", "*.wav")
    allm = media.unionByName(audio)
    s = {(r["modality"], r["codec"]): (r["n_items"], r["total_bytes"])
         for r in media_summary(allm).collect()}
    assert s[("video", "mp4")][0] == 2
    assert s[("audio", "wav")] == (1, 12 * 80)


def test_custom_decoder_swap(media):
    """The decoder is a one-argument swap (the real-ffmpeg contract)."""
    frames = sample_frames(
        media, 2, decoder=lambda content, n: [b"frame%d" % i for i in range(n)]
    )
    assert {bytes(r["frame"]) for r in frames.collect()} == {b"frame0", b"frame1"}


# ---------------------------------------------------------------------------
# REAL decoders: PCM WAV + YUV4MPEG2 over the committed fixtures


MEDIA_FIXTURE = "/root/repo/fixtures/media"


def test_parse_wav_matches_stdlib_wave():
    """Header fields from our RIFF chunk walk == the stdlib wave module,
    for every committed fixture."""
    import glob
    import wave as wavmod

    from acorn_hybrid_vector_search_spark.sources.media import parse_wav

    paths = sorted(glob.glob(f"{MEDIA_FIXTURE}/audio/*/*.wav"))
    assert len(paths) == 8
    for p in paths:
        rec = parse_wav(open(p, "rb").read())
        w = wavmod.open(p)
        assert rec["sample_rate"] == w.getframerate()
        assert rec["n_channels"] == w.getnchannels()
        assert rec["bit_depth"] == 8 * w.getsampwidth()
        assert rec["n_samples"] == w.getnframes()


def test_parse_wav_stats_pure_python_oracle():
    """sum_sq/peak/rms vs an independent struct-unpack recompute."""
    import struct as st
    import wave as wavmod

    from acorn_hybrid_vector_search_spark.sources.media import parse_wav

    p = f"{MEDIA_FIXTURE}/audio/00/alarm_b.wav"
    rec = parse_wav(open(p, "rb").read())
    w = wavmod.open(p)
    raw = w.readframes(w.getnframes())
    vals = st.unpack(f"<{len(raw)//2}h", raw)
    assert rec["sum_sq"] == sum(v * v for v in vals)
    assert rec["peak_abs"] == max(abs(v) for v in vals)
    assert rec["rms"] == (sum(v * v for v in vals) / len(vals)) ** 0.5


def test_parse_wav_skips_interleaved_chunks():
    """A LIST chunk between fmt and data must be walked over (real-world
    WAV layout), and odd-sized chunks are word-aligned."""
    import io
    import struct as st

    from acorn_hybrid_vector_search_spark.sources.media import parse_wav

    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = st.pack("<4h", 1, -2, 3, -4)
    junk = b"INFOx"  # odd size → 1 pad byte
    body = (
        b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"LIST" + st.pack("<I", len(junk)) + junk + b"\x00"
        + b"data" + st.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body
    rec = parse_wav(blob)
    assert rec["n_samples"] == 4
    assert rec["sum_sq"] == 1 + 4 + 9 + 16
    assert rec["peak_abs"] == 4


def test_parse_wav_rejects_non_wav():
    import pytest as pt

    from acorn_hybrid_vector_search_spark.sources.media import parse_wav

    with pt.raises(ValueError):
        parse_wav(b"\x00not a riff file at all")


def test_decode_audio_spark(spark):
    """End-to-end: binaryFile scan → mapInPandas decode, all 8 fixtures,
    values equal the local parse."""
    import glob

    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_audio,
        parse_wav,
        read_media_dir,
    )

    media = read_media_dir(spark, f"{MEDIA_FIXTURE}/audio", "audio", "*.wav")
    rows = {r["filename"]: r for r in decode_audio(media).collect()}
    assert len(rows) == 8
    for p in glob.glob(f"{MEDIA_FIXTURE}/audio/*/*.wav"):
        exp = parse_wav(open(p, "rb").read())
        got = rows[p.rsplit("/", 1)[-1]]
        for k in ("sample_rate", "n_channels", "bit_depth", "n_samples",
                  "duration_ms", "sum_sq", "peak_abs"):
            assert got[k] == exp[k], (p, k)
        assert abs(got["rms"] - exp["rms"]) < 1e-9


def test_parse_y4m_structure_and_luma():
    from acorn_hybrid_vector_search_spark.sources.media import parse_y4m

    p = f"{MEDIA_FIXTURE}/video/00/clip_b.y4m"
    content = open(p, "rb").read()
    head, frames = parse_y4m(content)
    assert (head["width"], head["height"], head["n_frames"]) == (12, 8, 6)
    assert (head["fps_num"], head["fps_den"]) == (30, 1)
    plane = 12 * 8
    assert all(len(f) == 3 * plane for f in frames)
    # luma bytes are the generator's (i + 7f) % 26 cycle
    assert frames[0][:4] == bytes(ord("a") + i % 26 for i in range(4))


def test_parse_y4m_c420_geometry():
    """C420 framing (the common ffmpeg default) splits planes 4:1:1."""
    from acorn_hybrid_vector_search_spark.sources.media import parse_y4m

    w, h = 4, 2
    frame = bytes(range(w * h)) + bytes(2 * ((w // 2) * (h // 2)))
    blob = f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode() + b"FRAME\n" + frame
    head, frames = parse_y4m(blob)
    assert head["n_frames"] == 1
    assert len(frames[0]) == w * h + 2 * ((w // 2) * (h // 2))


def test_decode_y4m_frames_spark_stride(spark):
    """Stride sampling: ceil(n_frames/stride) rows per clip, luma sums
    equal the local parse, Y-plane payload carried through Arrow."""
    import glob

    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_y4m_frames,
        parse_y4m,
        read_media_dir,
    )

    media = read_media_dir(spark, f"{MEDIA_FIXTURE}/video", "video", "*.y4m")
    rows = {(r["filename"], r["frame_no"]): r
            for r in decode_y4m_frames(media, stride=3).collect()}
    n_expected = 0
    for p in glob.glob(f"{MEDIA_FIXTURE}/video/*/*.y4m"):
        head, frames = parse_y4m(open(p, "rb").read())
        plane = head["width"] * head["height"]
        fname = p.rsplit("/", 1)[-1]
        for i in range(0, len(frames), 3):
            n_expected += 1
            got = rows[(fname, i)]
            assert got["luma_sum"] == sum(frames[i][:plane])
            assert bytes(got["frame"]) == frames[i][:plane]
            assert got["n_frames"] == head["n_frames"]
    assert len(rows) == n_expected


def test_decode_audio_permissive_quarantine(spark, tmp_path):
    """A truncated object must not kill the job in permissive mode; the
    corrupt row carries NULL stats + the reason, good rows are intact."""
    import shutil

    d = tmp_path / "mixed"
    (d / "00").mkdir(parents=True)
    shutil.copy(f"{MEDIA_FIXTURE}/audio/00/alarm_a.wav", d / "00" / "ok.wav")
    (d / "00" / "broken.wav").write_bytes(b"RIFFxxxxJUNK" + b"\x00" * 40)

    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_audio,
        read_media_dir,
    )

    media = read_media_dir(spark, str(d), "audio", "*.wav")
    rows = {r["filename"]: r for r in decode_audio(media, mode="permissive").collect()}
    assert rows["ok.wav"]["corrupt_reason"] is None
    assert rows["ok.wav"]["sample_rate"] == 8000
    assert rows["broken.wav"]["corrupt_reason"] == "not a RIFF/WAVE file"
    assert rows["broken.wav"]["sample_rate"] is None

    # failfast: the same input raises (the correctness-gate contract)
    import pytest as pt

    with pt.raises(Exception):
        decode_audio(media, mode="failfast").collect()


def test_luma_grid_features_exact_pooling(spark):
    """grid=2 over a 4×2 frame: each cell is the mean of a 2×1 block —
    verify against hand-computed means, plus the degenerate 1-pixel-dim
    case (grid larger than the frame)."""
    import numpy as np

    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_y4m_frames,
        luma_grid_features,
        parse_y4m,
        read_media_dir,
    )

    media = read_media_dir(spark, f"{MEDIA_FIXTURE}/video", "video", "*.y4m")
    frames = decode_y4m_frames(media, stride=4)
    rows = luma_grid_features(frames, grid=4).collect()
    assert all(len(r["features"]) == 16 for r in rows)
    # exact check against a numpy recompute for one known clip
    r = next(x for x in rows if x["filename"] == "clip_a.y4m" and x["frame_no"] == 0)
    head, fr = parse_y4m(open(f"{MEDIA_FIXTURE}/video/00/clip_a.y4m", "rb").read())
    y = np.frombuffer(fr[0][: 8 * 6], dtype=np.uint8).reshape(6, 8).astype(float)
    exp = []
    rb = [(i * 6) // 4 for i in range(4)] + [6]
    cb = [(j * 8) // 4 for j in range(4)] + [8]
    for i in range(4):
        for j in range(4):
            exp.append(y[rb[i]:rb[i + 1], cb[j]:cb[j + 1]].mean())
    got = r["features"]
    assert max(abs(a - b) for a, b in zip(got, exp)) < 1e-5


def test_frames_to_near_dup_composition(spark):
    """The documented scale path composes: decoded frames → pooled
    features → embedding_near_dups (LSH-confinable pair join). Planting
    one duplicated clip verifies identical frames surface as cosine-1.0
    pairs and distinct-geometry frames never join."""
    import shutil

    from acorn_hybrid_vector_search_spark.operators.dedup import (
        embedding_near_dups,
    )
    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_y4m_frames,
        luma_grid_features,
        read_media_dir,
    )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        shutil.copytree(f"{MEDIA_FIXTURE}/video/00", f"{d}/00")
        # a byte-identical re-upload of clip_a under a new name
        shutil.copy(f"{d}/00/clip_a.y4m", f"{d}/00/clip_a_copy.y4m")

        media = read_media_dir(spark, d, "video", "*.y4m")
        frames = decode_y4m_frames(media, stride=2)
        feats = luma_grid_features(frames, grid=4).withColumn(
            "frame_key",
            F.concat_ws("#", "filename", F.col("frame_no").cast("string")),
        )
        pairs = embedding_near_dups(
            feats,
            0.9999,
            vec_col="features",
            id_col="frame_key",
            bucket_col="width",  # coarse bucket: identical clips share geometry
        ).collect()
        sims = {tuple(sorted([r["id_a"], r["id_b"]])): r["cosine"] for r in pairs}
        # every sampled frame of the copied clip pairs with its original at
        # exactly cosine 1.0 (byte-identical decode → identical features)
        for fno in (0, 2, 4, 6, 8):
            pair = tuple(sorted([f"clip_a.y4m#{fno}", f"clip_a_copy.y4m#{fno}"]))
            assert sims.get(pair) == 1.0
        # the bucket confines the join: no pair crosses frame geometry
        widths = {
            r["frame_key"]: r["width"]
            for r in feats.select("frame_key", "width").collect()
        }
        assert all(widths[a] == widths[b] for a, b in sims)


from pyspark.sql import functions as F  # noqa: E402  (used by the test above)


def test_decode_y4m_permissive_quarantine(spark, tmp_path):
    import shutil

    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_y4m_frames,
        read_media_dir,
    )

    d = tmp_path / "vids"
    (d / "00").mkdir(parents=True)
    shutil.copy(f"{MEDIA_FIXTURE}/video/00/clip_c.y4m", d / "00" / "ok.y4m")
    (d / "00" / "junk.y4m").write_bytes(b"MPEG4 something else entirely\n")

    media = read_media_dir(spark, str(d), "video", "*.y4m")
    rows = decode_y4m_frames(media, stride=2, mode="permissive").collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["filename"], []).append(r)
    assert len(by_file["ok.y4m"]) == 6  # 12 frames, stride 2
    assert all(r["corrupt_reason"] is None for r in by_file["ok.y4m"])
    (junk,) = by_file["junk.y4m"]
    assert junk["corrupt_reason"] == "not a YUV4MPEG2 stream"
    assert junk["frame_no"] is None and junk["luma_sum"] is None

    import pytest as pt

    with pt.raises(Exception):
        decode_y4m_frames(media, mode="failfast").collect()


def test_stream_decode_equals_batch(spark):
    """Continuous-ingest parity: the streaming binaryFile source through
    the same decode_audio stage produces bit-identical rows to batch."""
    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_audio,
        read_media_dir,
        read_media_stream,
    )

    batch = decode_audio(
        read_media_dir(spark, f"{MEDIA_FIXTURE}/audio", "audio", "*.wav")
    )
    stream = decode_audio(
        read_media_stream(spark, f"{MEDIA_FIXTURE}/audio", "audio", "*.wav")
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stream_audio_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_stream_audio_parity")
    cols = [c for c in batch.columns if c != "media_id"]  # xxhash64(path) differs per tmp URI? no — same paths; keep all but be safe
    b = sorted(map(tuple, batch.select(*cols).collect()))
    s = sorted(map(tuple, got.select(*cols).collect()))
    assert b == s and len(b) == 8


def test_luma_grid_features_passes_quarantine_rows(spark, tmp_path):
    """decode→features composition on a permissive-mode relation: rows
    quarantined by the decoder (NULL frame/width/height + corrupt_reason)
    must flow through luma_grid_features as NULL features, not abort the
    job (ADVICE r4 medium)."""
    import shutil

    from acorn_hybrid_vector_search_spark.sources.media import (
        decode_y4m_frames,
        luma_grid_features,
        read_media_dir,
    )

    d = tmp_path / "vids"
    (d / "00").mkdir(parents=True)
    shutil.copy(f"{MEDIA_FIXTURE}/video/00/clip_c.y4m", d / "00" / "ok.y4m")
    (d / "00" / "junk.y4m").write_bytes(b"MPEG4 nope\n")

    media = read_media_dir(spark, str(d), "video", "*.y4m")
    frames = decode_y4m_frames(media, stride=2, mode="permissive")
    rows = luma_grid_features(frames, grid=4).collect()
    good = [r for r in rows if r["corrupt_reason"] is None]
    bad = [r for r in rows if r["corrupt_reason"] is not None]
    assert len(good) == 6 and len(bad) == 1
    assert all(r["features"] is not None and len(r["features"]) == 16 for r in good)
    assert bad[0]["features"] is None
