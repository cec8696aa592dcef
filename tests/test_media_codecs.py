"""Pure-numpy media codecs (BMP / PPM / WAV) + the real decode paths
of the multimodal ops (Spark-side)."""

from __future__ import annotations

import numpy as np
import pytest

from cli_spark.ops import media_codecs as mc


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------ round trips


@pytest.mark.parametrize("h,w", [(7, 5), (16, 16), (3, 9)])  # odd widths hit BMP row padding
def test_bmp_roundtrip(h, w):
    img = _img(h, w)
    np.testing.assert_array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        mc.decode_bmp(b"P6\n1 1\n255\n\x00\x00\x00")


@pytest.mark.parametrize("h,w", [(4, 6), (11, 3)])
def test_ppm_roundtrip(h, w):
    img = _img(h, w, seed=1)
    np.testing.assert_array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)


def test_ppm_comment_header():
    img = _img(2, 2, seed=2)
    blob = b"P6\n# a comment\n2 2\n255\n" + img.tobytes()
    np.testing.assert_array_equal(mc.decode_ppm(blob), img)


def test_wav_roundtrip():
    pcm = np.random.default_rng(3).integers(-32768, 32768, 1000).astype(np.int16)
    sr, back = mc.decode_wav(mc.encode_wav(pcm, 8000))
    assert sr == 8000
    np.testing.assert_array_equal(back, pcm)


def test_split_ppm_frames():
    frames = [_img(4, 4, seed=i) for i in range(5)]
    blob = b"".join(mc.encode_ppm(f) for f in frames)
    out = mc.split_ppm_frames(blob)
    assert len(out) == 5
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------ transforms


def test_resize_nearest_identity_and_downscale():
    img = _img(8, 8, seed=4)
    np.testing.assert_array_equal(mc.resize_nearest(img, 8, 8), img)
    half = mc.resize_nearest(img, 4, 4)
    assert half.shape == (4, 4, 3)
    # pixel-center convention: output (0,0) samples input (1,1)
    np.testing.assert_array_equal(half[0, 0], img[1, 1])


def test_image_features_shape_and_range():
    f = mc.image_features(_img(10, 14, seed=5), grid=4)
    assert f.shape == (16,)
    assert (0 <= f).all() and (f <= 1).all()
    # constant image → constant features
    const = np.full((6, 6, 3), 128, dtype=np.uint8)
    np.testing.assert_allclose(mc.image_features(const), mc.image_features(const)[0])


def test_audio_features_envelope():
    # silence then full-scale: energy must land in the later bands
    pcm = np.concatenate(
        [np.zeros(500, np.int16), np.full(500, 20000, np.int16)]
    )
    f = mc.audio_features(pcm, bands=4)
    assert f.shape == (4,)
    assert f[0] == 0 and f[3] > 0.5


# ------------------------------------------------------------ Spark paths


def test_multimodal_real_decode(spark):
    from cli_spark.ops.multimodal import decode_features, resize_images, sample_frames

    img = _img(6, 6, seed=6)
    wav = mc.encode_wav(np.arange(800, dtype=np.int16), 8000)
    vid = b"".join(mc.encode_ppm(_img(4, 4, seed=i)) for i in range(6))
    rows = [
        (0, mc.encode_bmp(img)),
        (1, mc.encode_ppm(img)),
        (2, wav),
        (3, mc.encode_png(img)),
        (4, mc.encode_jpeg(img, quality=95)),
    ]
    blobs = spark.createDataFrame(rows, "id long, blob binary")

    feats = {r["id"]: r["features"] for r in decode_features(blobs, decode_stub=False).collect()}
    assert len(feats) == 5 and all(len(v) == 16 for v in feats.values())
    # BMP, PPM, and PNG of the same image must featurize identically
    assert feats[0] == pytest.approx(feats[1])
    assert feats[0] == pytest.approx(feats[3])
    # JPEG is lossy: features close, not identical
    assert feats[4] == pytest.approx(feats[0], abs=0.05)

    resized = {
        r["id"]: r["blob"]
        for r in resize_images(blobs.filter("id != 2"), 3, 3, decode_stub=False).collect()
    }
    assert mc.decode_bmp(bytes(resized[0])).shape == (3, 3, 3)
    assert mc.decode_jpeg(bytes(resized[4])).shape == (3, 3, 3)
    np.testing.assert_array_equal(
        mc.decode_bmp(bytes(resized[0])), mc.decode_ppm(bytes(resized[1]))
    )
    np.testing.assert_array_equal(
        mc.decode_bmp(bytes(resized[0])), mc.decode_png(bytes(resized[3]))
    )

    frames = sample_frames(
        spark.createDataFrame([(7, vid), (8, wav)], "id long, blob binary"),
        n_frames=3,
        decode_stub=False,
    ).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[7]) == 3 and len(by_id[8]) == 3
    assert bytes(by_id[7][0]["frame_bytes"])[:2] == b"P6"
    sr, pcm0 = mc.decode_wav(bytes(by_id[8][0]["frame_bytes"]))
    assert sr == 8000 and len(pcm0) > 0
    # an unknown container is still refused under real decode
    with pytest.raises(Exception):
        decode_features(
            spark.createDataFrame([(9, b"ID3\x04mp3 frame data")], "id long, blob binary"),
            decode_stub=False,
        ).collect()


# ------------------------------------------------------------ PNG


@pytest.mark.parametrize("shape", [(7, 5), (16, 16, 3), (3, 9, 4)])
def test_png_roundtrip(shape):
    arr = np.random.default_rng(3).integers(0, 256, shape, dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(arr))
    np.testing.assert_array_equal(out, arr)


def _filter_png(arr, ftypes):
    """Build a PNG whose scanlines use the given filter types (forward
    filtering done here independently of the codec under test)."""
    import struct
    import zlib

    h, w, ch = arr.shape
    bpp = ch
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        ft = ftypes[y % len(ftypes)]
        if ft == 0:
            enc = line
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = line - left
        elif ft == 2:  # Up
            enc = line - prior
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = line - (left + prior) // 2
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
            enc = line - pred
        raw.append(ft)
        raw += (enc % 256).astype(np.uint8).tobytes()
        prior = line

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types(ftypes):
    arr = np.random.default_rng(7).integers(0, 256, (11, 6, 3), dtype=np.uint8)
    out = mc.decode_png(_filter_png(arr, ftypes))
    np.testing.assert_array_equal(out, arr)


def test_png_gray_and_alpha_normalize():
    gray = np.random.default_rng(1).integers(0, 256, (5, 4), dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(gray))
    assert out.shape == (5, 4)
    rgb = mc.to_rgb(out)
    assert rgb.shape == (5, 4, 3)
    np.testing.assert_array_equal(rgb[:, :, 0], gray)
    rgba = np.random.default_rng(2).integers(0, 256, (5, 4, 4), dtype=np.uint8)
    np.testing.assert_array_equal(mc.to_rgb(mc.decode_png(mc.encode_png(rgba))), rgba[:, :, :3])


def test_png_palette():
    import struct
    import zlib

    idx = np.random.default_rng(5).integers(0, 4, (6, 7), dtype=np.uint8)
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    raw = bytearray()
    for y in range(6):
        raw.append(0)
        raw += idx[y].tobytes()

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(mc.decode_png(blob), plte[idx])


def test_png_rejects():
    with pytest.raises(ValueError):
        mc.decode_png(b"nope")
    import struct
    import zlib

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    interlaced = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        mc.decode_png(interlaced)


# ---------------------------------------------------------------- JPEG


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                xx * 255 / max(w - 1, 1),
                yy * 255 / max(h - 1, 1),
                127 + 120 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
            ],
            axis=-1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


@pytest.mark.parametrize("h,w", [(48, 64), (37, 21), (8, 8), (9, 17)])
def test_jpeg_roundtrip_444(h, w):
    img = _smooth_rgb(h, w)
    blob = mc.encode_jpeg(img, quality=90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    out = mc.decode_jpeg(blob)
    assert out.shape == img.shape
    assert _psnr(img, out) > 32.0


@pytest.mark.parametrize("h,w", [(48, 64), (37, 21)])
def test_jpeg_roundtrip_420(h, w):
    img = _smooth_rgb(h, w)
    out = mc.decode_jpeg(mc.encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == img.shape
    assert _psnr(img, out) > 28.0


def test_jpeg_gray_roundtrip():
    yy, xx = np.mgrid[0:40, 0:56]
    g = ((xx + yy) * 255 // (40 + 56)).astype(np.uint8)
    out = mc.decode_jpeg(mc.encode_jpeg(g, quality=90))
    assert out.shape == g.shape and out.ndim == 2
    assert _psnr(g, out) > 40.0


def test_jpeg_flat_color_near_exact():
    flat = np.full((16, 24, 3), (200, 30, 90), dtype=np.uint8)
    out = mc.decode_jpeg(mc.encode_jpeg(flat, quality=95))
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 1


def test_jpeg_quality_monotonic_and_lossy_tradeoff():
    img = _smooth_rgb(64, 64)
    lo, hi = mc.encode_jpeg(img, quality=30), mc.encode_jpeg(img, quality=95)
    assert len(hi) > len(lo)
    assert _psnr(img, mc.decode_jpeg(hi)) > _psnr(img, mc.decode_jpeg(lo))


def test_jpeg_rejects_progressive_and_non_jpeg():
    img = _smooth_rgb(16, 16)
    blob = bytearray(mc.encode_jpeg(img))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(NotImplementedError):
        mc.decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        mc.decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_jpeg_random_noise_dims_survive():
    # worst-case content (pure noise) must still round-trip the
    # container: shape preserved, no entropy-coder desync
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    out = mc.decode_jpeg(mc.encode_jpeg(img, quality=75))
    assert out.shape == img.shape


def test_wav_stereo_downmix_and_8bit():
    t = np.arange(800)
    left = (3000 * np.sin(t / 7.0)).astype(np.int16)
    right = (3000 * np.sin(t / 11.0)).astype(np.int16)
    rate, mono = mc.decode_wav(mc.encode_wav(np.stack([left, right], axis=1), 8000))
    assert rate == 8000 and mono.shape == (800,)
    expect = ((left.astype(np.int32) + right.astype(np.int32)) // 2).astype(np.int16)
    assert np.array_equal(mono, expect)

    # hand-build an 8-bit unsigned mono WAV
    u8 = ((np.sin(t / 5.0) * 100) + 128).astype(np.uint8)
    fmt = np.array([1, 1], dtype="<u2").tobytes() + np.array([8000, 8000], dtype="<u4").tobytes() + np.array([1, 8], dtype="<u2").tobytes()
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(u8).to_bytes(4, "little") + u8.tobytes()
    blob = b"RIFF" + len(chunks).to_bytes(4, "little") + chunks
    rate, wide = mc.decode_wav(blob)
    assert rate == 8000
    assert np.array_equal(wide, (u8.astype(np.int16) - 128) << 8)

    # μ-law (fmt 7) still rejected with a typed error
    bad = bytearray(blob)
    bad[20] = 7
    with pytest.raises(NotImplementedError):
        mc.decode_wav(bytes(bad))
