"""Property tests for the REAL media parsers (pure Python — no Spark):
round-trip parse_wav against stdlib wave encoding, parse_y4m against a
direct encoder, across randomized geometry/rates/payloads."""

from __future__ import annotations

import io
import struct
import wave

from hypothesis import given, settings
from hypothesis import strategies as st

from acorn_hybrid_vector_search_spark.sources.media import parse_wav, parse_y4m


@settings(max_examples=40, deadline=None)
@given(
    rate=st.sampled_from([8000, 11025, 16000, 22050, 44100, 48000]),
    channels=st.integers(1, 2),
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
)
def test_parse_wav_roundtrip(rate, channels, samples):
    """Encode with stdlib wave, decode with our chunk walker: header and
    integer stats must match an independent recompute."""
    n_frames = len(samples) // channels
    payload = samples[: n_frames * channels]
    if not payload:
        return
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(struct.pack(f"<{len(payload)}h", *payload))
    w.close()

    rec = parse_wav(buf.getvalue())
    assert rec["sample_rate"] == rate
    assert rec["n_channels"] == channels
    assert rec["bit_depth"] == 16
    assert rec["n_samples"] == n_frames
    assert rec["duration_ms"] == n_frames * 1000 // rate
    assert rec["sum_sq"] == sum(v * v for v in payload)
    assert rec["peak_abs"] == max(abs(v) for v in payload)


def _encode_y4m(width, height, frames, colorspace="C444", fps=(25, 1)):
    header = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    out = [header.encode()]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f)
    return b"".join(out)


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(2, 16).map(lambda x: 2 * x),   # even dims (C420-safe)
    height=st.integers(1, 12).map(lambda x: 2 * x),
    n_frames=st.integers(1, 8),
    c420=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_parse_y4m_roundtrip(width, height, n_frames, c420, seed):
    plane = width * height
    frame_bytes = (
        plane + 2 * ((width // 2) * (height // 2)) if c420 else 3 * plane
    )
    frames = [
        bytes((seed + f * 31 + i) % 256 for i in range(frame_bytes))
        for f in range(n_frames)
    ]
    blob = _encode_y4m(width, height, frames, "C420" if c420 else "C444")
    head, got = parse_y4m(blob)
    assert (head["width"], head["height"]) == (width, height)
    assert head["n_frames"] == n_frames
    assert got == frames


@settings(max_examples=20, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_parse_wav_rejects_garbage(junk):
    """Arbitrary non-RIFF bytes never parse as audio (no silent
    misdecode on a corrupt object in a 100 TB lake — the error is the
    contract the quarantine path relies on)."""
    import pytest

    if junk[:4] == b"RIFF" and junk[8:12] == b"WAVE":
        return
    with pytest.raises(ValueError):
        parse_wav(junk)


@settings(max_examples=25, deadline=None)
@given(
    depth=st.sampled_from([8, 24, 32]),
    channels=st.integers(1, 2),
    n=st.integers(1, 120),
    seed=st.integers(0, 2**31),
)
def test_parse_wav_deep_depths(depth, channels, n, seed):
    """8/24/32-bit PCM: hand-encoded canonical WAV vs exact recompute
    (24/32-bit squares overflow int64 — exact big-int accumulation)."""
    rng = __import__("random").Random(seed)
    lo, hi = (0, 255) if depth == 8 else (-(1 << (depth - 1)), (1 << (depth - 1)) - 1)
    vals = [rng.randint(lo, hi) for _ in range(n * channels)]
    bw = depth // 8
    body = b"".join(
        v.to_bytes(bw, "little", signed=(depth != 8)) for v in vals
    )
    fmt = struct.pack(
        "<HHIIHH", 1, channels, 8000, 8000 * channels * bw, channels * bw, depth
    )
    blob = (
        b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    rec = parse_wav(blob)
    # stats are 16-bit-normalized: 8-bit << 8, 24-bit >> 8, 32-bit >> 16
    shift = {8: 8, 24: -8, 32: -16}[depth]
    centered = [v - 128 for v in vals] if depth == 8 else vals
    norm = [v << shift if shift > 0 else v >> -shift for v in centered]
    assert rec["bit_depth"] == depth
    assert rec["n_samples"] == n
    assert rec["sum_sq"] == sum(v * v for v in norm)
    assert rec["peak_abs"] == max(abs(v) for v in norm)


def test_parse_wav_extensible_container():
    """WAVE_FORMAT_EXTENSIBLE with a PCM subformat parses as PCM."""
    body = struct.pack("<4h", 5, -6, 7, -8)
    sub = struct.pack("<H", 1) + b"\x00" * 14  # PCM GUID head
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<HHI", 22, 16, 0x4)
        + sub[2:]  # cbSize=22, validbits, channel mask, then GUID tail
    )
    # rebuild properly: fmt body = 16 base + 2 cbSize + 22 ext (validbits u16,
    # mask u32, subformat GUID 16B whose first 2 bytes are the format code)
    ext = struct.pack("<HI", 16, 0x4) + struct.pack("<H", 1) + b"\x00" * 14
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + struct.pack("<H", 22) + ext
    blob = (
        b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    rec = parse_wav(blob)
    assert rec["n_samples"] == 4
    assert rec["sum_sq"] == 25 + 36 + 49 + 64


def test_parse_wav_corrupt_headers_raise_valueerror():
    """Corrupt headers must raise ValueError (the quarantinable type),
    never struct.error / ZeroDivisionError."""
    import pytest

    # fmt chunk shorter than 16 bytes
    short_fmt = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        parse_wav(short_fmt)
    # zero channels / zero sample rate
    for ch, rate in ((0, 8000), (1, 0)):
        fmt = struct.pack("<HHIIHH", 1, ch, rate, 1, 2, 16)
        blob = (
            b"RIFF" + struct.pack("<I", 20 + len(fmt) + 4) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + struct.pack("<hh", 1, 2)
        )
        with pytest.raises(ValueError):
            parse_wav(blob)


def test_parse_y4m_truncated_frame_raises():
    """A stream cut mid-frame must raise, not return short luma data."""
    import pytest

    w, h = 4, 2
    full = bytes(range(32, 32 + 3 * w * h))
    blob = f"YUV4MPEG2 W{w} H{h} F25:1 C444\n".encode() + b"FRAME\n" + full
    head, frames = parse_y4m(blob)          # intact parses fine
    assert head["n_frames"] == 1
    with pytest.raises(ValueError, match="truncated"):
        parse_y4m(blob[:-5])                 # cut into the V plane


@given(
    depth=st.sampled_from([8, 16, 24, 32]),
    channels=st.integers(1, 2),
    n=st.integers(1, 40),
    cut=st.integers(1, 5),
)
def test_parse_wav_misaligned_data_raises_valueerror(depth, channels, n, cut):
    """A data chunk that is not a whole number of sample frames must be
    a quarantinable ValueError for EVERY depth — the 24-bit path used to
    silently truncate trailing bytes into wrong stats while 16/32-bit
    raised (ADVICE r4)."""
    bw = depth // 8
    frame_bytes = bw * channels
    cut = cut % frame_bytes if frame_bytes > 1 else 0
    if cut == 0:
        cut = 1 if frame_bytes > 1 else 0
    if cut == 0:
        return  # 8-bit mono: every length is frame-aligned
    body = bytes(frame_bytes * n - cut)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, 8000, 8000 * frame_bytes, frame_bytes, depth
    )
    blob = (
        b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    import pytest

    with pytest.raises(ValueError, match="not a multiple"):
        parse_wav(blob)
