"""Pure numpy/stdlib baseline JPEG codec (ITU-T T.81 / JFIF).

Closes the "JPEG decode requires Pillow" capability gap the multimodal
family documented: this is a REAL baseline sequential decoder — marker
parse (DQT/DHT/SOF0/DRI/SOS), canonical Huffman entropy decode with
0xFF00 byte-stuffing and RSTn restart handling, dequantisation, exact
zigzag inversion, numpy IDCT, level shift, and JFIF YCbCr→RGB — plus
the matching encoder used to synthesize fixtures. Only the two marker
families a baseline JFIF file can carry are supported; progressive
(SOF2) and subsampled chroma raise ``NotImplementedError`` loudly.

Exact-round-trip construction for the oracle queries: an image whose
pixels are CONSTANT within each 8×8 block has all AC coefficients
exactly zero, and with the DC quantisation step set to 8 the quantised
DC is exactly ``v - 128`` — so the lossy codec becomes bit-exact on
that family and the DuckDB oracle can regenerate the decoded channel
sums from the closed-form block formula. The decoder itself is fully
general (the unit tests drive random images through every Huffman
category and AC run-length path with a reconstruction-error bound).

All tables below are the public Annex K defaults from the JPEG spec.

100 TB shape: the codec is row-local library code — it only ever runs
inside Arrow-batched ``mapInPandas`` (see operators/multimodal.py), so
decode cost scales linearly with executors and no pixel data crosses a
shuffle boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# -- zigzag order: ZIGZAG[k] = natural (8*v + u) index of the k-th
#    coefficient in transmission order -------------------------------------
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 luminance quantisation table (natural order, row-major [v][u]).
STD_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

# DC step 8 makes the quantised DC of a block-constant image exactly
# v-128 (DC = 8·(v-128); 8·(v-128)/8 round-trips losslessly).
EXACT_DC_QUANT = STD_QUANT.copy()
EXACT_DC_QUANT[0, 0] = 8

# Annex K.3 default Huffman tables: (BITS[1..16], HUFFVAL).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II basis: M[u, x] = C(u)/2 · cos((2x+1)uπ/16).
# FDCT of a block B[y][x] is  S = M · B · Mᵀ  (S indexed [v][u]);
# IDCT is the transpose sandwich  B = Mᵀ · S · M  (M is orthogonal).
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def fdct_quant(block: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Level-shift, forward DCT, quantise → int coefficients [v][u]."""
    shifted = block.astype(np.float64) - 128.0
    coefs = _DCT_M @ shifted @ _DCT_M.T
    return np.rint(coefs / quant).astype(np.int32)


def dequant_idct(coefs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Dequantise, inverse DCT, level-shift back, clamp to [0, 255]."""
    spatial = _DCT_M.T @ (coefs * quant).astype(np.float64) @ _DCT_M
    return np.clip(np.rint(spatial + 128.0), 0, 255).astype(np.uint8)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical construction of C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits) for a DC diff / AC value (F.1.2.1)."""
    if v == 0:
        return 0, 0
    cat = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    """Inverse of :func:`_magnitude` (decoder EXTEND, F.2.2.1)."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF → 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s
        return bytes(self.out)

    def align_emit(self, raw: bytes) -> None:
        """Byte-align (1-pad) then append raw marker bytes unstuffed."""
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)
        self.out.extend(raw)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            # Bounds-check every byte fetch so malformed / truncated
            # payloads fail with the codec's documented ValueError
            # contract instead of an executor IndexError (r8 advisor
            # finding).
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    raise ValueError("truncated JPEG entropy data")
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2  # stuffed data byte
                else:
                    raise EOFError("marker inside entropy data")
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def byte_align(self) -> None:
        self._n = 0

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dqt_segment(quant: np.ndarray, table_id: int = 0) -> bytes:
    flat = quant.reshape(64)
    zz = bytes(int(flat[ZIGZAG[k]]) for k in range(64))
    return _seg(0xFFDB, bytes([table_id]) + zz)


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xFFC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))


def _encode_block(coefs: np.ndarray, dc_pred: int, writer: _BitWriter,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one quantised coefficient block; returns its DC."""
    zz = [int(coefs.reshape(64)[ZIGZAG[k]]) for k in range(64)]
    cat, bits = _magnitude(zz[0] - dc_pred)
    code, length = dc_codes[cat]
    writer.put(code, length)
    if cat:
        writer.put(bits, cat)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL: 16 zeros
            writer.put(code, length)
            run -= 16
        cat, bits = _magnitude(zz[k])
        code, length = ac_codes[(run << 4) | cat]
        writer.put(code, length)
        writer.put(bits, cat)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.put(code, length)
    return zz[0]


def _component_blocks(plane: np.ndarray) -> tuple[int, int, list[np.ndarray]]:
    """Edge-pad a plane to 8×8 multiples and split into raster blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = [padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
              for by in range(ph // 8) for bx in range(pw // 8)]
    return pw // 8, ph // 8, blocks


def jpeg_encode(planes: list[np.ndarray], quant: np.ndarray | None = None,
                restart_interval: int = 0) -> bytes:
    """Encode 1 plane (grayscale) or 3 planes (JFIF YCbCr, 4:4:4) as a
    baseline sequential JFIF file using the Annex K default Huffman
    tables and one shared quantisation table."""
    if len(planes) not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) planes")
    quant = STD_QUANT if quant is None else quant
    h, w = planes[0].shape
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += _dqt_segment(quant, 0)
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid in range(1, len(planes) + 1):
        sof += bytes([cid, 0x11, 0])  # 1×1 sampling, quant table 0
    out += _seg(0xFFC0, sof)
    out += _dht_segment(0, 0, DC_BITS, DC_VALS)
    out += _dht_segment(1, 0, AC_BITS, AC_VALS)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for cid in range(1, len(planes) + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    per_comp = [_component_blocks(p) for p in planes]
    n_mcus = per_comp[0][0] * per_comp[0][1]
    writer = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            writer.align_emit(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            preds = [0] * len(planes)
        for ci, (_, _, blocks) in enumerate(per_comp):
            coefs = fdct_quant(blocks[m], quant)
            preds[ci] = _encode_block(coefs, preds[ci], writer,
                                      dc_codes, ac_codes)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def rgb_to_ycbcr(rgb: np.ndarray) -> list[np.ndarray]:
    """JFIF full-range RGB→YCbCr, rounded to uint8 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.clip(np.rint(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def is_jpeg(raw: bytes) -> bool:
    return len(raw) >= 4 and raw[0] == 0xFF and raw[1] == 0xD8 \
        and raw[2] == 0xFF


def jpeg_decode(raw: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a baseline JFIF byte string to (width, height, RGB rows).

    General over what baseline files carry: multiple DQT/DHT segments,
    8/16-bit quant precision, restart intervals, 1- or 3-component
    scans. Chroma subsampling (sampling factors ≠ 1×1) and progressive
    SOF2 raise NotImplementedError — honest seams, not silent wrongness.
    """
    raw = bytes(raw)
    if not is_jpeg(raw):
        raise ValueError("not a JPEG payload")
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    pos = 2
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("expected marker")
        if pos + 1 >= len(raw):
            raise ValueError("truncated JPEG: marker byte missing")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(raw):
            raise ValueError("truncated JPEG: segment header missing")
        length = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        payload = raw[pos + 4:pos + 2 + length]
        if marker == 0xDB:  # DQT — one or more tables per segment
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                flat = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    if pq:
                        flat[ZIGZAG[k]] = struct.unpack(
                            ">H", payload[p:p + 2])[0]
                        p += 2
                    else:
                        flat[ZIGZAG[k]] = payload[p]
                        p += 1
                quants[tq] = flat.reshape(8, 8)
        elif marker == 0xC4:  # DHT — one or more tables per segment
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                table: dict[tuple[int, int], int] = {}
                for sym, (code, ln) in _canonical_codes(bits, vals).items():
                    table[(ln, code)] = sym
                huff[(tc, th)] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack(">HH", payload[1:5])
            nf = payload[5]
            for ci in range(nf):
                cid, hv, tq = payload[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling not supported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan = []
            for ci in range(ns):
                cid, tdta = payload[1 + 2 * ci:3 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0xF})
            return _decode_scan(raw, pos + 2 + length, scan, quants, huff,
                                w, h, restart_interval)
        pos += 2 + length
    raise ValueError("no SOS marker found")


def _decode_scan(raw: bytes, pos: int, scan: list[dict], quants, huff,
                 w: int, h: int, restart_interval: int):
    bw, bh = -(-w // 8), -(-h // 8)
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.uint8) for _ in scan]
    reader = _BitReader(raw, pos)
    preds = [0] * len(scan)
    for m in range(bw * bh):
        if restart_interval and m and m % restart_interval == 0:
            reader.byte_align()
            if (reader.pos + 1 < len(raw) and raw[reader.pos] == 0xFF
                    and 0xD0 <= raw[reader.pos + 1] <= 0xD7):
                reader.pos += 2
            preds = [0] * len(scan)
        by, bx = divmod(m, bw)
        for ci, comp in enumerate(scan):
            coefs = np.zeros(64, dtype=np.int32)
            cat = reader.decode_symbol(huff[(0, comp["td"])])
            preds[ci] += _extend(reader.bits(cat), cat)
            coefs[0] = preds[ci]
            k = 1
            while k < 64:
                sym = reader.decode_symbol(huff[(1, comp["ta"])])
                if sym == 0x00:  # EOB
                    break
                run, cat = sym >> 4, sym & 0xF
                if cat == 0:  # ZRL
                    k += 16
                    continue
                k += run
                if k >= 64:  # corrupt entropy data, not an index bug
                    raise ValueError("invalid AC run in JPEG scan")
                coefs[ZIGZAG[k]] = _extend(reader.bits(cat), cat)
                k += 1
            block = dequant_idct(coefs.reshape(8, 8), quants[comp["tq"]])
            planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        g = planes[0]
        rows = [[(int(v), int(v), int(v)) for v in row] for row in g]
        return w, h, rows
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = np.clip(np.rint(y + 1.402 * cr), 0, 255).astype(np.int32)
    g = np.clip(np.rint(y - 0.344136 * cb - 0.714136 * cr), 0, 255).astype(np.int32)
    b = np.clip(np.rint(y + 1.772 * cb), 0, 255).astype(np.int32)
    rows = [[(int(r[yy, xx]), int(g[yy, xx]), int(b[yy, xx]))
             for xx in range(w)] for yy in range(h)]
    return w, h, rows


# ---------------------------------------------------------------------------
# MJPEG container: concatenated baseline JPEG frames. The demux WALKS the
# marker structure (segment lengths; entropy data via the stuffing rules)
# rather than string-searching for EOI, so 0xFFD9 byte pairs inside
# segments can never split a frame early.
# ---------------------------------------------------------------------------

def _jpeg_frame_end(raw: bytes, start: int) -> int:
    """Offset just past the EOI of the frame beginning at ``start``."""
    pos = start + 2  # past SOI
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("corrupt MJPEG frame: expected marker")
        if pos + 1 >= len(raw):
            raise ValueError("corrupt MJPEG frame: truncated marker")
        marker = raw[pos + 1]
        if marker == 0xD9:
            return pos + 2
        if pos + 4 > len(raw):
            raise ValueError("corrupt MJPEG frame: truncated segment")
        length = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        pos += 2 + length
        if marker == 0xDA:  # entropy data: skip to next real marker
            while True:
                if pos >= len(raw):
                    raise ValueError("corrupt MJPEG frame: no EOI")
                if raw[pos] != 0xFF:
                    pos += 1
                elif pos + 1 >= len(raw):
                    raise ValueError("corrupt MJPEG frame: no EOI")
                elif raw[pos + 1] == 0x00 or 0xD0 <= raw[pos + 1] <= 0xD7:
                    pos += 2  # stuffed byte / restart marker
                else:
                    break
    raise ValueError("corrupt MJPEG frame: no EOI")


def mjpeg_split(raw: bytes) -> list[bytes]:
    """Split a concatenated-JPEG clip into its frame byte strings."""
    raw = bytes(raw)
    frames = []
    pos = 0
    while pos < len(raw):
        if not is_jpeg(raw[pos:pos + 4]):
            raise ValueError("MJPEG frame does not start with SOI")
        end = _jpeg_frame_end(raw, pos)
        frames.append(raw[pos:end])
        pos = end
    return frames
