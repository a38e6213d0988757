"""Baseline JPEG (JFIF) codec in pure numpy + stdlib — no image library.

The last "real decode" integration point from the multimodal family
(SURVEY.md §2.11; the PPM and PNG paths landed in rounds 3-4, see
``stages/multimodal.py``).  Everything here follows the public ITU-T
T.81 / ISO 10918-1 spec:

- ``decode_jpeg``: baseline sequential DCT, 8-bit, Huffman entropy
  coding (SOF0/SOF1), grayscale or 3-component YCbCr with any integer
  sampling-factor ratios (4:4:4 / 4:2:2 / 4:2:0 ...), restart markers
  (DRI/RSTn), byte-stuffing, multi-table DQT/DHT segments.  Returns
  (h, w, 3) uint8 RGB or None for malformed/unsupported payloads
  (progressive SOF2, arithmetic coding, 12-bit precision) — the same
  contract as ``decode_ppm`` / ``decode_png``.
- ``encode_jpeg``: the matching fixture/synth writer — Annex K
  quantization tables scaled by the libjpeg quality formula, Annex K
  "typical" Huffman tables, 4:4:4 / 4:2:0 / grayscale, optional
  restart intervals.

Shape discipline: the entropy-coded segment is inherently sequential
(each Huffman symbol's position depends on the previous — a per-symbol
Python loop is the honest cost, exactly like the PNG Paeth rows), but
everything after it is vectorized: dequantization, de-zigzag,
and the 2-D IDCT run as single einsum/fancy-index passes over ALL
blocks of a component at once.
"""

from __future__ import annotations

import numpy as np

# Zigzag scan order: ZIGZAG[i] = natural (row-major) index of the i-th
# coefficient in scan order (T.81 Figure 5 / libjpeg jpeg_natural_order).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 quantization tables (natural row-major order).
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II basis C: forward F = C @ x @ C.T, inverse
    x = C.T @ F @ C."""
    u = np.arange(8, dtype=np.float64)
    x = np.arange(8, dtype=np.float64)
    c = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16.0) * 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """{symbol -> (code, length)} — the same canonical assignment."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    FF00, feeds 1-padding at markers / end of data (T.81 F.2.2.5), and
    never consumes a real marker — ``expect_restart`` does that."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        buf, pos = self.buf, self.pos
        if pos < len(buf):
            b = buf[pos]
            if b != 0xFF:
                self.pos = pos + 1
            else:
                nxt = buf[pos + 1] if pos + 1 < len(buf) else None
                if nxt == 0x00:
                    self.pos = pos + 2
                else:
                    # a real marker: stop consuming, pad with 1-bits
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    return
        else:
            b = 0xFF
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self.n < nbits:
            self._fill()
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def expect_restart(self, idx: int) -> None:
        """Byte-align (discarding pad bits), consume RST(idx % 8)."""
        self.acc = 0
        self.n = 0
        buf, pos = self.buf, self.pos
        if pos + 1 >= len(buf) or buf[pos] != 0xFF \
                or buf[pos + 1] != 0xD0 + (idx & 7):
            raise ValueError("missing restart marker")
        self.pos = pos + 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to a signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


# declared-dimension budget for untrusted payloads; decode_jpeg callers
# with a vetted large-image corpus can pass a bigger max_pixels
JPEG_MAX_PIXELS = 16_000_000


def decode_jpeg(p: bytes, *,
                max_pixels: int = JPEG_MAX_PIXELS) -> "np.ndarray | None":
    """Baseline JFIF payload -> (h, w, 3) uint8 RGB, or None.

    ``max_pixels`` bounds the SOF-declared h*w before any coefficient
    allocation (crafted tiny headers can otherwise declare 65535^2);
    legitimate larger images decode by raising it."""
    try:
        return _decode(p, max_pixels=max_pixels)
    except Exception:
        return None


def _decode(p: bytes, *,
            max_pixels: int = JPEG_MAX_PIXELS) -> "np.ndarray | None":
    if len(p) < 4 or p[0] != 0xFF or p[1] != 0xD8:
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}          # id -> 64 zigzag-order values
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return None
        marker = p[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            return None
        ln = int.from_bytes(p[pos + 2:pos + 4], "big")
        seg = p[pos + 4:pos + 2 + ln]
        if len(seg) != ln - 2:
            return None
        if marker == 0xDB:  # DQT — one or more tables
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                if prec != 0:  # 12-bit tables unsupported
                    return None
                qt[tid] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8).astype(np.int64)
                if len(qt[tid]) != 64:
                    return None
                i += 65
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline sequential
            if seg[0] != 8:
                return None
            h_img = int.from_bytes(seg[1:3], "big")
            w_img = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3) or min(h_img, w_img) < 1:
                return None
            # sanity cap for UNTRUSTED web-archive payloads: a crafted
            # <200-byte header can otherwise declare 65535x65535 and
            # drive a multi-GB coefficient allocation plus tens of
            # millions of entropy-loop iterations before any bitstream
            # error surfaces.  Legitimate larger images: raise the
            # module knob (a real photo pipeline would also budget the
            # per-image decode wall, which is what the cap bounds).
            if h_img * w_img > max_pixels:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
                if not (1 <= comps[-1]["h"] <= 4 and 1 <= comps[-1]["v"] <= 4):
                    return None
            if ncomp == 1:
                # T.81 A.2: a single-component scan is NON-interleaved —
                # one 8x8 data unit per MCU in raster order, regardless
                # of the sampling factors the SOF declares (some
                # encoders keep 2x2 luma factors when writing gray)
                comps[0]["h"] = comps[0]["v"] = 1
            frame = {"h": h_img, "w": w_img, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / lossless / arithmetic
        elif marker == 0xC4:  # DHT — one or more tables
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                if len(vals) != nv:
                    return None
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if frame is None or ns != len(frame["comps"]):
                return None
            tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                tables[cid] = (tt >> 4, tt & 15)
            scan = (tables, pos + 2 + ln)
            break
        pos += 2 + ln
    if frame is None or scan is None:
        return None

    tables, data_pos = scan
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            return None  # non-integer upsample ratio
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # entropy decode: the per-symbol loop is inherent to Huffman coding;
    # coefficients land in zigzag order, one row per block
    reader = _BitReader(p, data_pos)
    coefs = []
    for c in comps:
        coefs.append(np.zeros((n_mcus * c["h"] * c["v"], 64), dtype=np.int64))
        c["dc_tab"] = huff.get((0, tables[c["id"]][0]))
        c["ac_tab"] = huff.get((1, tables[c["id"]][1]))
        if c["dc_tab"] is None or c["ac_tab"] is None or c["tq"] not in qt:
            return None
    pred = [0] * len(comps)
    bidx = [0] * len(comps)
    n_restarts = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            reader.expect_restart(n_restarts)
            n_restarts += 1
            pred = [0] * len(comps)
        for ci, c in enumerate(comps):
            dc_tab, ac_tab = c["dc_tab"], c["ac_tab"]
            for _ in range(c["h"] * c["v"]):
                row = coefs[ci][bidx[ci]]
                s = reader.decode_huff(dc_tab)
                pred[ci] += _extend(reader.read(s), s)
                row[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_huff(ac_tab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            break  # EOB
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("AC index overflow")
                    row[k] = _extend(reader.read(s), s)
                    k += 1
                bidx[ci] += 1

    # vectorized tail: dequant (zigzag x zigzag), de-zigzag, IDCT, +128
    planes = []
    for ci, c in enumerate(comps):
        zz = coefs[ci] * qt[c["tq"]][None, :]
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        plane = (px.reshape(mcus_y, mcus_x, c["v"], c["h"], 8, 8)
                 .transpose(0, 2, 4, 1, 3, 5)
                 .reshape(mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[: frame["h"], : frame["w"]])

    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixtures + synthetic media; same spec, inverse direction)
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit writer with FF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables (public formula)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROM * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_component(bw: _BitWriter, blocks: np.ndarray, pred: int,
                      dc_tab: dict, ac_tab: dict) -> int:
    """Quantized zigzag blocks (n, 64) -> entropy-coded bits; returns
    the updated DC predictor."""
    for row in blocks:
        diff = int(row[0]) - pred
        pred = int(row[0])
        s = abs(diff).bit_length()
        code, ln = dc_tab[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        nz = np.nonzero(row[1:])[0]
        prev = 0
        for idx in nz:
            k = int(idx) + 1
            run = k - prev - 1
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            v = int(row[k])
            s = abs(v).bit_length()
            code, ln = ac_tab[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            prev = k
        if prev != 63:
            code, ln = ac_tab[0x00]  # EOB
            bw.write(code, ln)
    return pred


def encode_jpeg(img: np.ndarray, *, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) grayscale -> baseline JFIF bytes.

    ``subsampling``: "4:4:4" (no chroma subsampling) or "4:2:0" (2x2 Y
    blocks per MCU, chroma averaged 2x2) — the two shapes that dominate
    real archives.  ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's restart path)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("need (h, w, 3) RGB or (h, w) grayscale uint8")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h_img, w_img = img.shape[:2]
    ql, qc = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qids = [0]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            samp = [(2, 2), (1, 1), (1, 1)]
            cbp = _pad_to_blocks(cb, 2, 2)
            crp = _pad_to_blocks(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    # FDCT + quantize every block of every component, vectorized; keep
    # them in (mcus_y, mcus_x, v, h) order for the MCU-interleaved scan
    qblocks = []
    for plane, (sh, sv), qid in zip(planes, samp, qids):
        q = ql if qid == 0 else qc
        padded = _pad_to_blocks(plane, mcus_y * sv * 8, mcus_x * sh * 8) \
            if plane.shape != (mcus_y * sv * 8, mcus_x * sh * 8) else plane
        padded = padded[: mcus_y * sv * 8, : mcus_x * sh * 8]
        blocks = (padded.reshape(mcus_y, sv, 8, mcus_x, sh, 8)
                  .transpose(0, 3, 1, 4, 2, 5)
                  .reshape(-1, 8, 8))
        f = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)
        zz = f.reshape(-1, 64)[:, ZIGZAG]
        qb = np.round(zz / q[ZIGZAG][None, :]).astype(np.int64)
        qblocks.append(qb.reshape(mcus_y * mcus_x, sv * sh, 64))
    # NB: q[ZIGZAG] puts the quant table into zigzag order to match zz.

    dc_enc = [_build_encode_table(DC_LUM_BITS, DC_LUM_VALS),
              _build_encode_table(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_enc = [_build_encode_table(AC_LUM_BITS, AC_LUM_VALS),
              _build_encode_table(AC_CHROM_BITS, AC_CHROM_VALS)]

    bw = _BitWriter()
    preds = [0] * len(planes)
    n_restarts = 0
    for m in range(mcus_y * mcus_x):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out.extend(bytes([0xFF, 0xD0 + (n_restarts & 7)]))
            n_restarts += 1
            preds = [0] * len(planes)
        for ci in range(len(planes)):
            tid = 0 if ci == 0 else 1
            preds[ci] = _encode_component(
                bw, qblocks[ci][m], preds[ci], dc_enc[tid], ac_enc[tid])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0x00]) + bytes(ql[ZIGZAG].astype(np.uint8))
    if not gray:
        dqt += bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8))
    out += seg(0xDB, dqt)
    sof = bytes([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big") \
        + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qids[ci]])
    out += seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS) \
        + bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS)
    if not gray:
        dht += bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS) \
            + bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
