"""Generate committed REAL baseline-JPEG fixtures + the golden pixel
parquet — the image-modality analog of tools/make_media_fixture.py.

Each fixture is a genuine JFIF/baseline-sequential JPEG (SOI, APP0,
DQT, SOF0, DHT, SOS, entropy-coded scan with 0xFF00 stuffing, EOI)
produced by a from-scratch encoder: forward DCT + quantization over
deterministic synthetic images, canonical Huffman tables built from
the symbols actually emitted (legal per the spec — tables travel in
DHT), plus one coefficient-level "torture" file exercising ZRL runs,
EOB, and negative amplitudes.

The EXPECTED decode is computed here by an INDEPENDENT pure-python
IDCT loop (per-definition quadruple loop over the same fixed-point
integer contract as sources/jpeg.py::idct_2d_fixed — integer ops, so
agreement is bit-exact, not approximate) and written to
``fixtures/golden/jpeg_pixels.parquet``: per file width/height/
components, Y-plane integer stats, and a sha256 of the full decoded
pixel bytes. tests/test_jpeg.py pins decoder == golden digest;
the driver oracle joins the stats and re-reads the header fields
straight from the canonical byte offsets.

CANONICAL-LAYOUT CONTRACT (asserted below, mirroring the WAV/Y4M
generators): every file carries exactly one 16-byte APP0, then ONE
combined DQT segment holding BOTH quant tables (even grayscale), so
SOF0 always sits at byte offset 154 — precision at 158, height BE at
159, width BE at 161, n_components at 163. Oracle SQL hardcodes these;
drift must break generation, not the oracle.

Run from the repo root: ``python tools/make_jpeg_fixture.py``.
Deterministic: re-running reproduces byte-identical files.
"""

from __future__ import annotations

import hashlib
import math
import os
import struct
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from acorn_hybrid_vector_search_spark.sources.jpeg import (  # noqa: E402
    IDCT_TABLE,
    ZIGZAG,
)

IMAGES = os.path.join(ROOT, "fixtures", "media", "images")
GOLDEN = os.path.join(ROOT, "fixtures", "golden")
SOF0_OFFSET = 154  # the canonical-layout contract (see module docstring)

# Annex-K-style quantization tables (natural row-major order); exact
# values are irrelevant to correctness — they travel in DQT.
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


# ---------------------------------------------------------------------------
# deterministic synthetic images

def _pix(kind: str, x: int, y: int, w: int, h: int, chan: int) -> int:
    if kind == "gradient":
        return (2 * x + 3 * y + 37 * chan) % 256
    if kind == "checker":
        return 255 * ((x // 4 + y // 4 + chan) % 2)
    if kind == "blob":
        cx, cy = w / 2.0, h / 2.0
        d = math.hypot(x - cx, y - cy)
        return max(0, min(255, int(255 - 9 * d) + 11 * chan))
    if kind == "noise":
        v = (x * 73 + y * 149 + chan * 31 + 7) * 2654435761
        return (v >> 16) & 0xFF
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# forward path: FDCT + quantization (float here is fine — the CONTRACT
# is fixed the moment the quantized integers exist; golden and decoder
# both start from those)

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]


def _fdct_quant(block: list[list[int]], qtable: list[int]) -> list[int]:
    """8×8 pixel block → quantized coefficients in ZIGZAG order."""
    out = [0] * 64
    for k, (u, v) in enumerate(ZIGZAG):
        cu = 1 / math.sqrt(2) if u == 0 else 1.0
        cv = 1 / math.sqrt(2) if v == 0 else 1.0
        s = 0.0
        for x in range(8):
            for y in range(8):
                s += (block[x][y] - 128) * _COS[u][x] * _COS[v][y]
        q = qtable[u * 8 + v]
        out[k] = int(round(s * cu * cv / 4.0 / q))
    return out


# ---------------------------------------------------------------------------
# canonical Huffman construction + bit writing

class _Huff:
    """Equal-length canonical table over the symbols actually used (a
    legal JPEG table: BITS/HUFFVAL travel in DHT). One spare slot keeps
    the all-ones code unused, as the standard tables do."""

    def __init__(self, symbols: set[int]) -> None:
        syms = sorted(symbols)
        length = max(1, (len(syms) + 1 - 1).bit_length())
        while (1 << length) < len(syms) + 1:
            length += 1
        self.length = length
        self.bits = [0] * 16
        self.bits[length - 1] = len(syms)
        self.huffval = bytes(syms)
        self.codes = {s: (length, i) for i, s in enumerate(syms)}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_align(self) -> None:
        """1-pad to a byte boundary (F.1.2.3); a 0xFF pad byte gets the
        usual 0x00 stuffing so decoders unstuff it transparently."""
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # 1-pad per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def raw(self, bs: bytes) -> None:
        """Append marker bytes verbatim (caller must be byte-aligned)."""
        assert self.n == 0
        self.out += bs

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.out)


def _size_cat(v: int) -> int:
    return abs(v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _scan_symbols(
    block_seq: list[tuple[int, list[int]]], resets: set[int] = frozenset()
) -> tuple[dict, dict]:
    """Collect the (run,size)/(size) symbols each component class emits.
    ``block_seq`` is [(component_class, zigzag_coeffs)] in MCU order;
    class 0 = luma tables, 1 = chroma tables. ``resets`` holds block
    indices where a restart boundary resets every DC predictor."""
    dc_syms: dict[int, set[int]] = {0: set(), 1: set()}
    ac_syms: dict[int, set[int]] = {0: set(), 1: set()}
    pred = {}
    for bi, (cls, comp_id, zz) in enumerate(block_seq):
        if bi in resets:
            pred = {}
        diff = zz[0] - pred.get(comp_id, 0)
        pred[comp_id] = zz[0]
        dc_syms[cls].add(_size_cat(diff))
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, 64):
            if k > last_nz:
                ac_syms[cls].add(0x00)  # EOB
                break
            if zz[k] == 0:
                run += 1
                if run == 16:
                    ac_syms[cls].add(0xF0)  # ZRL
                    run = 0
                continue
            ac_syms[cls].add((run << 4) | _size_cat(zz[k]))
            run = 0
        else:
            pass
    for d in (dc_syms, ac_syms):
        for s in d.values():
            if not s:
                s.add(0)
    return dc_syms, ac_syms


def _emit_scan(
    block_seq, dc_tables, ac_tables, resets: set[int] = frozenset()
) -> bytes:
    bw = _BitWriter()
    pred = {}
    rst = 0
    for bi, (cls, comp_id, zz) in enumerate(block_seq):
        if bi in resets:
            bw.pad_align()
            bw.raw(bytes((0xFF, 0xD0 + rst)))
            rst = (rst + 1) & 7
            pred = {}
        diff = zz[0] - pred.get(comp_id, 0)
        pred[comp_id] = zz[0]
        size = _size_cat(diff)
        ln, code = dc_tables[cls].codes[size]
        bw.write(code, ln)
        if size:
            bw.write(_amplitude(diff, size), size)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, 64):
            if k > last_nz:
                ln, code = ac_tables[cls].codes[0x00]
                bw.write(code, ln)
                break
            if zz[k] == 0:
                run += 1
                if run == 16:
                    ln, code = ac_tables[cls].codes[0xF0]
                    bw.write(code, ln)
                    run = 0
                continue
            size = _size_cat(zz[k])
            ln, code = ac_tables[cls].codes[(run << 4) | size]
            bw.write(code, ln)
            bw.write(_amplitude(zz[k], size), size)
            run = 0
    return bw.flush()


# ---------------------------------------------------------------------------
# independent golden decode (pure-python per-definition loops)

def _golden_block(zz: list[int], qtable: list[int]) -> list[list[int]]:
    """Quantized zigzag coeffs → 8×8 pixels via the fixed-point IDCT
    contract, written as the literal per-definition quadruple loop
    (deliberately NOT the numpy matrix form the decoder uses)."""
    f = [[0] * 8 for _ in range(8)]
    for k, (u, v) in enumerate(ZIGZAG):
        f[u][v] = zz[k] * qtable[u * 8 + v]
    pix = [[0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            acc = 0
            for u in range(8):
                for v in range(8):
                    acc += IDCT_TABLE[u][x] * IDCT_TABLE[v][y] * f[u][v]
            p = ((acc + (1 << 25)) >> 26) + 128
            pix[x][y] = 0 if p < 0 else (255 if p > 255 else p)
    return pix


# ---------------------------------------------------------------------------
# file assembly

def _segments(n_components: int, w: int, h: int, samplings: list[tuple[int, int]],
              dc_tables: dict, ac_tables: dict, restart_interval: int = 0) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # ONE combined DQT with BOTH tables — the canonical-layout contract
    dqt = bytearray()
    for tq, table in ((0, QT_LUMA), (1, QT_CHROMA)):
        dqt.append(tq)
        dqt += bytes(table[u * 8 + v] for (u, v) in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    assert len(out) == SOF0_OFFSET, f"SOF0 at {len(out)}, contract {SOF0_OFFSET}"
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([n_components])
    for i in range(n_components):
        hs, vs = samplings[i]
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytearray()
    classes = [0] if n_components == 1 else [0, 1]
    for cls in classes:
        for tc, tbl in ((0, dc_tables[cls]), (1, ac_tables[cls])):
            dht.append((tc << 4) | cls)
            dht += bytes(tbl.bits) + tbl.huffval
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        # DRI after DHT keeps SOF0 at the canonical offset 154
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytearray([n_components])
    for i in range(n_components):
        cls = 0 if i == 0 else 1
        sos += bytes([i + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return bytes(out)


def encode(kind: str, w: int, h: int, n_components: int,
           subsample: bool, coeff_blocks=None,
           restart_interval: int = 0) -> tuple[bytes, dict]:
    """Encode one fixture; returns (jpeg_bytes, golden_record)."""
    samplings = [(1, 1)] * n_components
    if n_components == 3 and subsample:
        samplings[0] = (2, 2)
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # component pixel planes (pre-encode source)
    planes = []
    for ci in range(n_components):
        hs, vs = samplings[ci]
        pw, ph = mcux * 8 * hs, mcuy * 8 * vs
        if ci == 0 or not subsample:
            plane = [[_pix(kind, min(x, w - 1), min(y, h - 1), w, h, ci)
                      for x in range(pw)] for y in range(ph)]
        else:
            # 2x2 integer-mean subsample of the full-res chroma signal
            plane = [
                [
                    sum(
                        _pix(kind, min(2 * x + dx, w - 1), min(2 * y + dy, h - 1), w, h, ci)
                        for dx in (0, 1)
                        for dy in (0, 1)
                    )
                    // 4
                    for x in range(pw)
                ]
                for y in range(ph)
            ]
        planes.append(plane)

    # quantized blocks in interleaved MCU order
    block_seq = []
    decoded_blocks: dict[tuple[int, int, int], list[list[int]]] = {}
    bi = 0
    mcu_starts = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_starts.append(len(block_seq))
            for ci in range(n_components):
                hs, vs = samplings[ci]
                cls = 0 if ci == 0 else 1
                qt = QT_LUMA if cls == 0 else QT_CHROMA
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        if coeff_blocks is not None:
                            zz = coeff_blocks[bi]
                            bi += 1
                        else:
                            blk = [
                                [planes[ci][y0 + xx][x0 + yy] for yy in range(8)]
                                for xx in range(8)
                            ]
                            zz = _fdct_quant(blk, qt)
                        block_seq.append((cls, ci, zz))
                        decoded_blocks[(ci, y0, x0)] = _golden_block(zz, qt)

    resets: set[int] = set()
    if restart_interval:
        resets = {
            mcu_starts[i]
            for i in range(restart_interval, len(mcu_starts), restart_interval)
        }
    dc_syms, ac_syms = _scan_symbols(block_seq, resets)
    dc_tables = {c: _Huff(s) for c, s in dc_syms.items()}
    ac_tables = {c: _Huff(s) for c, s in ac_syms.items()}
    head = _segments(n_components, w, h, samplings, dc_tables, ac_tables,
                     restart_interval)
    scan = _emit_scan(block_seq, dc_tables, ac_tables, resets)
    jpeg = head + scan + b"\xff\xd9"

    # assemble golden planes exactly as the decoder contract: blocks →
    # plane, replicate chroma, crop to (h, w)
    out_planes = []
    for ci in range(n_components):
        hs, vs = samplings[ci]
        pw, ph = mcux * 8 * hs, mcuy * 8 * vs
        plane = [[0] * pw for _ in range(ph)]
        for (cci, y0, x0), blk in decoded_blocks.items():
            if cci != ci:
                continue
            for xx in range(8):
                for yy in range(8):
                    plane[y0 + xx][x0 + yy] = blk[xx][yy]
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = [
                [plane[y // ry][x // rx] for x in range(pw * rx)]
                for y in range(ph * ry)
            ]
        out_planes.append([row[:w] for row in plane[:h]])

    flat = bytearray()
    for y in range(h):
        for x in range(w):
            for ci in range(n_components):
                flat.append(out_planes[ci][y][x])
    yp = out_planes[0]
    yvals = [v for row in yp for v in row]
    golden = {
        "width": w,
        "height": h,
        "n_components": n_components,
        "y_sum": sum(yvals),
        "y_min": min(yvals),
        "y_max": max(yvals),
        "pix_sha256": hashlib.sha256(bytes(flat)).hexdigest(),
        "n_bytes": len(jpeg),
        # the decoded Y plane itself (fixtures are tiny): lets oracle SQL
        # re-derive downstream featurization from PIXELS, not from a
        # digest — the video_frame_similarity evidence pattern
        "y_plane": bytes(yvals),
    }
    return jpeg, golden


# (name, shard, kind, w, h, n_components, subsample, restart_interval)
FIXTURES = [
    ("gray_gradient", "00", "gradient", 16, 16, 1, False, 0),
    ("gray_checker", "00", "checker", 24, 16, 1, False, 0),
    ("gray_blob_crop", "00", "blob", 20, 13, 1, False, 0),  # partial MCU crop
    ("color_gradient", "01", "gradient", 16, 16, 3, False, 0),
    ("color_noise_420", "01", "noise", 32, 24, 3, True, 0),
    ("color_blob_420_crop", "01", "blob", 17, 13, 3, True, 0),  # 4:2:0 + crop
    ("gray_noise_wide", "02", "noise", 64, 8, 1, False, 0),
    # DRI fixtures (r5 verdict missing #2): real camera baseline files
    # routinely carry restart intervals. 80x16 gray = 20 MCUs, Ri=2 →
    # 9 RSTn markers, so the sequence wraps RST7→RST0 (wraparound
    # exercised); the 4:2:0 color one restarts mid-row.
    ("gray_noise_dri", "02", "noise", 80, 16, 1, False, 2),
    ("color_gradient_420_dri", "01", "gradient", 48, 32, 3, True, 2),
]

# coefficient-level torture: 16×8 grayscale, 2 blocks. Block 1: DC=7,
# zigzag[20]=-3 (19-zero run → ZRL + run3), zigzag[50]=12 (29-zero run
# → ZRL + run13). Block 2: DC drops to -2 (negative diff), EOB at once.
_TORTURE = [
    [7] + [0] * 19 + [-3] + [0] * 29 + [12] + [0] * 13,
    [-2] + [0] * 63,
]
assert all(len(b) == 64 for b in _TORTURE)


def main() -> None:
    records = []
    for name, shard, kind, w, h, nc, sub, ri in FIXTURES:
        d = os.path.join(IMAGES, shard)
        os.makedirs(d, exist_ok=True)
        jpeg, golden = encode(kind, w, h, nc, sub, restart_interval=ri)
        fn = f"{name}.jpg"
        with open(os.path.join(d, fn), "wb") as f:
            f.write(jpeg)
        records.append({"filename": fn, **golden})
        print(f"{shard}/{fn}: {w}x{h}x{nc} {len(jpeg)}B y_sum={golden['y_sum']}")
    d = os.path.join(IMAGES, "02")
    os.makedirs(d, exist_ok=True)
    jpeg, golden = encode("gradient", 16, 8, 1, False, coeff_blocks=_TORTURE)
    with open(os.path.join(d, "gray_torture.jpg"), "wb") as f:
        f.write(jpeg)
    records.append({"filename": "gray_torture.jpg", **golden})
    print(f"02/gray_torture.jpg: {len(jpeg)}B y_sum={golden['y_sum']}")

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(GOLDEN, exist_ok=True)
    cols = ["filename", "width", "height", "n_components", "y_sum",
            "y_min", "y_max", "pix_sha256", "n_bytes", "y_plane"]
    table = pa.table({c: [r[c] for r in records] for c in cols})
    pq.write_table(table, os.path.join(GOLDEN, "jpeg_pixels.parquet"))
    print(f"wrote {len(records)} jpegs + golden parquet")


if __name__ == "__main__":
    main()
