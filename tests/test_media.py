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
