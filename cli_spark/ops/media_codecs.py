"""Pure-numpy codecs for the uncompressed media containers: 24-bit BMP,
binary PPM (P6), and PCM-16 WAV.

These give :mod:`cli_spark.ops.multimodal` REAL decode / resize /
frame-sample paths with zero new dependencies — the compressed formats
(JPEG/PNG/MP3/H.264) still raise ``NotImplementedError`` because their
codec libraries are absent from this image. The reference CLI has no
media path at all; this exists for the training-data-pipeline side of
the engine (multimodal columns over Iceberg binary columns), where
uncompressed intermediates are the common on-cluster representation.

All functions are bytes→ndarray/ndarray→bytes on one object; callers
batch them through Arrow (mapInPandas). The inner work is vectorized
numpy (frombuffer + stride tricks), never per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    h, w, c = arr.shape
    assert c == 3, "RGB only"
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BMP stores BGR, bottom row first, rows padded to 4 bytes
    bgr = arr[::-1, :, ::-1].astype(np.uint8, copy=False)
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB. Top-down (negative
    height) and bottom-up layouts both supported."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    (hdr_size,) = struct.unpack_from("<I", blob, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP (got bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob, dtype=np.uint8, count=h * stride, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB, contiguous


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    h, w, c = arr.shape
    assert c == 3, "RGB only"
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8, copy=False).tobytes()


def _ppm_header(blob: bytes, start: int = 0) -> tuple[int, int, int]:
    """Parse 'P6 <w> <h> <maxval>' with comment/whitespace handling;
    returns (w, h, offset-of-pixel-data)."""
    if blob[start : start + 2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    pos = start + 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        num = b""
        while pos < len(blob) and blob[pos : pos + 1].isdigit():
            num += blob[pos : pos + 1]
            pos += 1
        if not num:
            raise ValueError("malformed PPM header")
        fields.append(int(num))
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    return w, h, pos + 1  # single whitespace byte after maxval


def decode_ppm(blob: bytes, start: int = 0) -> np.ndarray:
    w, h, off = _ppm_header(blob, start)
    px = np.frombuffer(blob, dtype=np.uint8, count=h * w * 3, offset=off)
    return px.reshape(h, w, 3).copy()


def split_ppm_frames(blob: bytes) -> list[np.ndarray]:
    """Concatenated-P6 'video' container → list of frames (each stream's
    length is implied by its own header, so frames split exactly)."""
    frames = []
    pos = 0
    while pos < len(blob):
        w, h, off = _ppm_header(blob, pos)
        frames.append(
            np.frombuffer(blob, dtype=np.uint8, count=h * w * 3, offset=off)
            .reshape(h, w, 3)
            .copy()
        )
        pos = off + h * w * 3
    return frames


# ---------------------------------------------------------------- WAV (PCM16)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 mono PCM → RIFF/WAVE."""
    pcm = samples.astype("<i2", copy=False).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM-16 mono → (sample_rate, int16 ndarray). Walks the
    chunk list (fmt /data may be separated by LIST etc.)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", blob, body)
            if audio_fmt != 1 or channels != 1:
                raise NotImplementedError("only PCM mono WAV")
            bits = struct.unpack_from("<H", blob, body + 14)[0]
            if bits != 16:
                raise NotImplementedError("only 16-bit WAV")
        elif cid == b"data":
            data = np.frombuffer(blob, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sample_rate, data.copy()


# ---------------------------------------------------------------- transforms


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via vectorized index sampling (the
    pixel-center convention scipy/PIL use: src = floor((i+0.5)*scale))."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys[:, None], xs[None, :]]


def image_features(arr: np.ndarray, grid: int = 4) -> np.ndarray:
    """(h, w, 3) → grid×grid mean-luma features in [0, 1] (dim grid²):
    a deterministic, resolution-invariant thumbnail signature."""
    luma = arr.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], dtype=np.float32)
    h, w = luma.shape
    ys = (np.arange(h) * grid) // max(h, 1)
    xs = (np.arange(w) * grid) // max(w, 1)
    sums = np.zeros((grid, grid), dtype=np.float64)
    counts = np.zeros((grid, grid), dtype=np.int64)
    np.add.at(sums, (ys[:, None], xs[None, :]), luma)
    np.add.at(counts, (ys[:, None], xs[None, :]), 1)
    return (sums / np.maximum(counts, 1) / 255.0).ravel().astype(np.float32)


def audio_features(samples: np.ndarray, bands: int = 16) -> np.ndarray:
    """1-D PCM → per-band RMS energy in [0, 1] over `bands` equal time
    windows (a bandwidth-cheap loudness envelope)."""
    n = len(samples)
    if n == 0:
        return np.zeros(bands, dtype=np.float32)
    x = (samples.astype(np.float64) / 32768.0) ** 2
    edges = (np.arange(bands + 1) * n) // bands
    sums = np.add.reduceat(x, edges[:-1])
    widths = np.maximum(np.diff(edges), 1)
    return np.sqrt(sums / widths).astype(np.float32)
