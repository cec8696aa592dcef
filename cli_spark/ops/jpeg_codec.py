"""Pure-numpy baseline JPEG codec (ITU-T T.81 baseline DCT, JFIF).

Closes the last decode gap of :mod:`cli_spark.ops.media_codecs` without
any external codec library: encoder and decoder for baseline sequential
JPEG — 8-bit samples, Huffman entropy coding with the standard Annex K
tables, 4:4:4 or 4:2:0 chroma subsampling, grayscale or YCbCr color,
restart markers on decode. Progressive (SOF2), arithmetic coding,
12-bit precision and hierarchical modes raise typed
``NotImplementedError`` (same policy as the other codecs here: a typed
feature rejection, never a wrong answer).

Layout mirrors the sibling codecs: bytes→ndarray / ndarray→bytes on one
object; callers batch through Arrow (mapInPandas) so the per-image
Python cost rides the executor-parallel axis. The hot inner math —
forward/inverse DCT over every 8×8 block, quantization, color
transform — is vectorized numpy (one einsum over all blocks); only the
entropy coder walks coefficients in Python, which is the irreducible
serial part of the format itself.

Reference parity note: the reference CLI (Jelly-RDF) has no media path
at all (`src/main/scala` has no image code); this module serves the
training-data-pipeline mandate (multimodal binary columns).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1/K.2 example quantization tables (public spec).

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: forward F = D @ f @ D.T
_D = np.array([
    [
        (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


class JpegUnsupportedError(NotImplementedError):
    """A JPEG feature outside the baseline subset (progressive,
    arithmetic, 12-bit, hierarchical)."""


# ---------------------------------------------------------------- huffman


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the T.81 canonical algorithm."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(size, appended-bits) for a nonzero/zero coefficient value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over unstuffed scan bytes."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG scan data exhausted mid-symbol")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG scan data exhausted mid-symbol")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        out = 0
        for b in chunk:
            out = (out << 1) | int(b)
        return out

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------- encoder


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """plane (H,W) multiple-of-8 -> (nblocks_y, nblocks_x, 64) zigzagged
    quantized coefficients; all blocks in one einsum."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,abjk,lk->abil", _D, blocks, _D)
    q = np.round(coef / qtab).astype(np.int32)
    return q.reshape(h // 8, w // 8, 64)[..., ZIGZAG]


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    size, mbits = _magnitude(dc - pred)
    code, ln = dc_codes[size]
    w.put(code, ln)
    w.put(mbits, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        size, mbits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        w.put(code, ln)
        w.put(mbits, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return dc


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    f = arr.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """(H,W,3) uint8 RGB or (H,W) uint8 gray -> baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 (2×2 box-averaged chroma, the
    dominant wild layout); default 4:4:4 is exact-chroma."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects uint8 (H,W) or (H,W,3)")
    gray = arr.ndim == 2
    h0, w0 = arr.shape[:2]
    qy, qc = _quality_tables(quality)

    if gray:
        planes = [_pad_edge(arr.astype(np.float64), 8)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if subsample:
            y = _pad_edge(y, 16)
            cb = _pad_edge(cb, 16)
            cr = _pad_edge(cr, 16)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            y, cb, cr = _pad_edge(y, 8), _pad_edge(cb, 8), _pad_edge(cr, 8)
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    zz = [
        _fdct_quant(p, qy if qs == 0 else qc) for p, qs in zip(planes, qsel)
    ]

    dc_tables = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tables = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_tables.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tables.append(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    # interleaved MCU scan
    wtr = _BitWriter()
    preds = [0] * len(planes)
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_y = zz[0].shape[0] // samp[0][1]
    mcus_x = zz[0].shape[1] // samp[0][0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (ch, cv) in enumerate(samp):
                t = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        block = zz[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_block(
                            wtr, block, preds[ci], dc_tables[t], ac_tables[t]
                        )
    scan = wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, bytes([0]) + bytes(qy.flatten()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _marker(0xDB, bytes([1]) + bytes(qc.flatten()[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h0, w0, ncomp)
    for ci in range(ncomp):
        ch, cv = samp[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, qsel[ci]])
    out += _marker(0xC0, sof)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


def _unstuff(data: bytes) -> tuple[bytes, list[tuple[int, int]]]:
    """Strip 0xFF00 stuffing; return (clean bytes, [(clean_offset,
    restart_marker_n)]) for any embedded RSTn."""
    out = bytearray()
    restarts: list[tuple[int, int]] = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF and i + 1 < n:
            nxt = data[i + 1]
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                restarts.append((len(out), nxt - 0xD0))
                i += 2
                continue
            break  # any other marker terminates the scan
        out.append(b)
        i += 1
    return bytes(out), restarts


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H,W,3) uint8 RGB (or (H,W) for a
    single-component stream)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h0 = w0 = 0
    restart_interval = 0
    i = 2
    scan_comps: list[dict] = []
    scan_data = b""
    while i < len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        tag = blob[i + 1]
        if tag == 0xD9:  # EOI
            break
        if tag in (0x01,) or 0xD0 <= tag <= 0xD7:
            i += 2
            continue
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        body = blob[i + 4 : i + 2 + ln]
        if tag == 0xDB:  # DQT (possibly several tables per marker)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq == 1:
                    vals = np.frombuffer(
                        body[j + 1 : j + 1 + 128], dtype=">u2"
                    ).astype(np.int32)
                    j += 129
                else:
                    vals = np.frombuffer(
                        body[j + 1 : j + 1 + 64], dtype=np.uint8
                    ).astype(np.int32)
                    j += 65
                qtabs[tq] = vals[UNZIGZAG].reshape(8, 8)
        elif tag in (0xC1, 0xC0):  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise JpegUnsupportedError(f"{prec}-bit JPEG (baseline is 8)")
            h0, w0 = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupportedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif tag == 0xC4:  # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(cls, tid)] = _decode_table(bits, vals)
                j += 17 + nv
        elif tag == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan_comps.append({**comp, "td": tt >> 4, "ta": tt & 0xF})
            scan_data = blob[i + 2 + ln :]
            i = i + 2 + ln
            break
        i += 2 + ln
    if not scan_comps:
        raise ValueError("JPEG has no scan (missing SOS)")

    clean, _restarts = _unstuff(scan_data)
    rdr = _BitReader(clean)

    max_h = max(c["h"] for c in scan_comps)
    max_v = max(c["v"] for c in scan_comps)
    mcus_x = -(-w0 // (8 * max_h))
    mcus_y = -(-h0 // (8 * max_v))
    for c in scan_comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
    preds = [0] * len(scan_comps)

    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                # RSTn bytes were stripped by _unstuff, so the restart is
                # just a byte-align + DC predictor reset here
                rdr.align()
                preds = [0] * len(scan_comps)
            for ci, c in enumerate(scan_comps):
                dct = huff[(0, c["td"])]
                act = huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = rdr.read_symbol(dct)
                        diff = _extend(rdr.read_bits(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.read_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(rdr.read_bits(s), s)
                            k += 1
                        row = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        c["coef"][row] = zz
            mcu_index += 1

    # batch dequantize + IDCT per component (one einsum each)
    planes = []
    for c in scan_comps:
        q = qtabs[c["tq"]]
        coef = c["coef"][:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64) * q
        pix = np.einsum("ji,ajk,kl->ail", _D, coef, _D) + 128.0
        blocks = pix.reshape(c["bh"], c["bw"], 8, 8)
        plane = blocks.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        plane = np.repeat(plane, max_v // c["v"], axis=0)
        plane = np.repeat(plane, max_h // c["h"], axis=1)
        planes.append(plane[:h0, :w0])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
