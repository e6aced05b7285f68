"""Generate the committed deterministic media fixtures under
``fixtures/media/`` — real files in real public formats:

- ``audio/<shard>/*.wav``: canonical 44-byte-header PCM WAV (RIFF/WAVE,
  fmt + data chunks only), 16-bit, mono/stereo, mixed sample rates.
  Waveforms are INTEGER-ARITHMETIC sawtooth/square signals (no float
  trig) so the bytes are bit-identical on any platform/python.
- ``video/<shard>/*.y4m``: YUV4MPEG2 (the plain-text-header raw video
  interchange format used by ffmpeg/x264 test suites), C444, with every
  plane byte constrained to ASCII ``a..z`` so DuckDB can cast the blob
  to VARCHAR and regexp the structure in oracle SQL (SURVEY.md §2 S3
  evidence pattern, like the ASCII JPEG stand-ins in fixtures/abo).

Run from the repo root: ``python tools/make_media_fixture.py``.
Deterministic: re-running reproduces byte-identical files.
"""

from __future__ import annotations

import io
import os
import struct
import wave

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEDIA = os.path.join(ROOT, "fixtures", "media")

# (name, shard, sample_rate, n_channels, n_samples, period, amplitude)
WAVS = [
    ("alarm_a", "00", 8000, 1, 1200, 50, 12000),
    ("alarm_b", "00", 8000, 2, 800, 80, 9000),
    ("chirp_c", "00", 16000, 1, 2400, 33, 15000),
    ("chirp_d", "01", 16000, 2, 1600, 121, 7000),
    ("tone_e", "01", 22050, 1, 2205, 63, 11000),
    ("tone_f", "01", 22050, 1, 441, 17, 3000),
    ("noise_g", "02", 44100, 2, 4410, 211, 14000),
    ("noise_h", "02", 44100, 1, 882, 97, 5000),
]

# (name, shard, width, height, n_frames, fps_num, fps_den, colorspace)
Y4MS = [
    ("clip_a", "00", 8, 6, 10, 25, 1, "C444"),
    ("clip_b", "00", 12, 8, 6, 30, 1, "C444"),
    ("clip_c", "00", 4, 4, 12, 24, 1, "C444"),
    ("clip_d", "01", 16, 10, 5, 30000, 1001, "C444"),
    ("clip_e", "01", 6, 6, 8, 25, 1, "C444"),
    ("clip_f", "01", 10, 4, 7, 50, 1, "C444"),
    # C420 (the ffmpeg default): Y plane + quarter-size U/V planes
    ("clip_g", "02", 8, 6, 9, 25, 1, "C420"),
    ("clip_h", "02", 12, 10, 4, 30, 1, "C420"),
]


def make_wav(sample_rate: int, n_channels: int, n_samples: int,
             period: int, amplitude: int) -> bytes:
    """Canonical PCM16 WAV with an integer sawtooth (channel 0) and its
    negated square wave (channel 1, if stereo)."""
    frames = []
    for i in range(n_samples):
        saw = ((i % period) * (2 * amplitude) // max(period - 1, 1)) - amplitude
        if n_channels == 1:
            frames.append(struct.pack("<h", saw))
        else:
            sq = amplitude if (i // period) % 2 == 0 else -amplitude
            frames.append(struct.pack("<hh", saw, -sq))
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_channels)
    w.setsampwidth(2)
    w.setframerate(sample_rate)
    w.writeframes(b"".join(frames))
    w.close()
    out = buf.getvalue()
    # CANONICAL-LAYOUT CONTRACT: the driver oracles (__spark_entry__.py
    # audio_etl) replay the decode with hardcoded 44-byte-header /
    # 16-bit offsets, far narrower than what parse_wav accepts
    # (LIST/fact chunks, 8/24/32-bit, EXTENSIBLE). Fixture drift must
    # break GENERATION loudly, never silently diverge the oracle.
    assert out[:4] == b"RIFF" and out[8:12] == b"WAVE"
    assert out[12:16] == b"fmt " and struct.unpack("<I", out[16:20])[0] == 16
    assert struct.unpack("<H", out[20:22])[0] == 1  # plain PCM, no EXTENSIBLE
    assert struct.unpack("<H", out[34:36])[0] == 16  # sampwidth 2
    assert out[36:40] == b"data", "header is not the canonical 44 bytes"
    assert struct.unpack("<I", out[40:44])[0] == len(out) - 44
    return out


def make_y4m(width: int, height: int, n_frames: int,
             fps_num: int, fps_den: int, colorspace: str = "C444") -> bytes:
    """YUV4MPEG2: header line, then per frame ``FRAME\\n`` + planes
    (C444: three W*H planes; C420: Y = W*H plus two quarter-size
    chroma planes). Plane bytes cycle through ``a..z`` with a per-frame
    offset — ASCII-only (so blob→VARCHAR round-trips in oracle SQL) and
    never contains the uppercase ``FRAME`` marker."""
    header = f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 {colorspace}\n"
    out = [header.encode()]
    y_plane = width * height
    if colorspace == "C444":
        plane_sizes = [y_plane, y_plane, y_plane]
    elif colorspace == "C420":
        c = (width // 2) * (height // 2)
        plane_sizes = [y_plane, c, c]
    else:
        raise ValueError(colorspace)
    for f in range(n_frames):
        # CANONICAL-LAYOUT CONTRACT: bare 6-byte ``FRAME\n`` lines (no
        # frame parameters) — the video oracles hardcode this offset
        # arithmetic even though parse_y4m accepts FRAME params. Keep
        # the generator the narrow one so drift fails here, not there.
        out.append(b"FRAME\n")
        body = bytearray()
        for p, size in enumerate(plane_sizes):
            for i in range(size):
                body.append(ord("a") + (i + 7 * f + 11 * p) % 26)
        assert all(97 <= b <= 122 for b in body) and b"FRAME" not in bytes(body)
        out.append(bytes(body))
    return b"".join(out)


def main() -> None:
    for name, shard, rate, ch, n, period, amp in WAVS:
        d = os.path.join(MEDIA, "audio", shard)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{name}.wav"), "wb") as f:
            f.write(make_wav(rate, ch, n, period, amp))
    for name, shard, w, h, nf, fn, fd, cs in Y4MS:
        d = os.path.join(MEDIA, "video", shard)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{name}.y4m"), "wb") as f:
            f.write(make_y4m(w, h, nf, fn, fd, cs))
    print(f"wrote {len(WAVS)} wav + {len(Y4MS)} y4m under {MEDIA}")


if __name__ == "__main__":
    main()
