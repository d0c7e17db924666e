"""Vendored PNG codec + real-codec multimodal path: decode_mode="real"
must execute end-to-end in this environment (no Pillow installed) for
PNG payloads, with the fake path remaining the oracle domain."""

from __future__ import annotations

import io
import struct
import zlib

import pytest

from fluss_spark.functions import png


def _rgb_image(w=5, h=4):
    pixels = bytes((x * 40 + y * 7 + c * 13) % 256 for y in range(h) for x in range(w) for c in range(3))
    return png.PngImage(w, h, 3, pixels)


def test_png_roundtrip_rgb_and_grey():
    img = _rgb_image()
    data = png.encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = png.decode(data)
    assert back.size == (5, 4) and back.channels == 3
    assert back.tobytes() == img.tobytes()

    grey = png.PngImage(3, 3, 1, bytes(range(9)))
    assert png.decode(png.encode(grey)).tobytes() == grey.tobytes()


def test_png_decode_all_filter_types():
    """Hand-build an image whose scanlines use filters 1-4 (our encoder
    emits 0 only, but real-world encoders use all five)."""
    w, h, ch = 4, 5, 3
    stride = w * ch
    rng = [((x * 31 + y * 17 + c * 5) % 256) for y in range(h) for x in range(w) for c in range(ch)]
    pixels = bytes(rng)

    rows = [bytearray(pixels[y * stride : (y + 1) * stride]) for y in range(h)]
    filtered = bytearray()
    prev = bytearray(stride)
    for y, row in enumerate(rows):
        ftype = y % 5
        out = bytearray(row)
        if ftype == 1:
            for i in range(stride - 1, ch - 1, -1):
                out[i] = (row[i] - row[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                out[i] = (row[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                out[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                out[i] = (row[i] - png._paeth(left, prev[i], ul)) & 0xFF
        filtered += bytes([ftype]) + out
        prev = row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + png._chunk(b"IEND", b"")
    )
    assert png.decode(data).tobytes() == pixels


def test_png_resize_nearest_neighbor():
    img = _rgb_image(4, 4)
    up = img.resize((8, 8))
    assert up.size == (8, 8)
    # every 2x2 block replicates the source pixel (nearest neighbor)
    for y in range(8):
        for x in range(8):
            src = img.pixels[((y // 2) * 4 + (x // 2)) * 3 : ((y // 2) * 4 + (x // 2)) * 3 + 3]
            got = up.pixels[(y * 8 + x) * 3 : (y * 8 + x) * 3 + 3]
            assert got == src


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        png.decode(b"\x00" * 32)
    with pytest.raises(ValueError, match="CRC"):
        data = bytearray(png.encode(_rgb_image()))
        data[20] ^= 0xFF  # corrupt IHDR payload, CRC now mismatches
        png.decode(bytes(data))


@pytest.mark.slow
def test_real_decode_and_resize_through_spark(spark):
    """decode_mode='real' end-to-end: real PNG payloads through the
    production mapInPandas kernels — decode reads true dimensions,
    resize re-encodes at 32x32 and the re-decoded output confirms it."""
    from fluss_spark.operators.multimodal import decode_images, resize_images

    payloads = []
    for i, (w, h) in enumerate([(5, 4), (7, 3), (12, 12)]):
        buf = io.BytesIO()
        png.PngImage(w, h, 3, bytes((i + x) % 256 for x in range(w * h * 3))).save(buf)
        payloads.append((i, buf.getvalue(), "image/png"))
    media = spark.createDataFrame(payloads, "doc_id long, media binary, mime string")

    meta = {r["doc_id"]: r for r in decode_images(media, decode_mode="real").collect()}
    assert (meta[0]["width"], meta[0]["height"]) == (5, 4)
    assert (meta[1]["width"], meta[1]["height"]) == (7, 3)
    assert all(m["mime"] == "image/png" for m in meta.values())

    resized = resize_images(media, 32, 32, decode_mode="real")
    out = {r["doc_id"]: r for r in decode_images(resized, decode_mode="real").collect()}
    assert all((r["width"], r["height"]) == (32, 32) for r in out.values())
    # resized payloads are themselves valid PNGs with the right raster size
    sample = png.decode(bytes(next(iter(resized.collect()))["media"]))
    assert sample.size == (32, 32) and len(sample.tobytes()) == 32 * 32 * 3


def test_auto_mode_does_not_upgrade_to_png_fallback(spark):
    """decode_mode='auto' must fall back to fake when only the PNG-only
    fallback codec is available (no PIL in this image) — arbitrary
    payloads would otherwise crash in the kernel instead of decoding
    fake."""
    from fluss_spark.operators.multimodal import (
        _image_codec,
        _resolve_mode,
        decode_images,
    )

    codec = _image_codec()
    assert codec is not None  # fallback always present
    if getattr(codec, "IS_FALLBACK", False):
        assert _resolve_mode("auto", codec) == "fake"
        assert _resolve_mode("real", codec) == "real"  # explicit real uses it
    # fake md5 payloads through auto mode: must decode via the fake path
    media = spark.createDataFrame(
        [(1, b"\x10" * 16, "image/fake")], "doc_id long, media binary, mime string"
    )
    out = decode_images(media, decode_mode="auto").collect()
    assert out[0]["width"] == 1 + 0x10 % 64


def test_wav_roundtrip_and_real_segmentation(spark):
    """The stdlib WAV fallback executes decode_mode='real' for audio:
    PCM16 payloads decode, segment into 500 ms windows, and the
    per-segment RMS matches a straight numpy recomputation."""
    import numpy as np

    from fluss_spark.functions import wav
    from fluss_spark.operators.multimodal import segment_audio

    s = [0, 1000, -1000, 32767, -32768]
    assert wav.decode(wav.encode(s, 16000)) == (s, 16000)

    rows = []
    for doc_id, n in ((1, 24000), (2, 8000), (3, 100)):
        samples = [int(2000 * ((i * doc_id) % 7 - 3)) for i in range(n)]
        rows.append((doc_id, bytearray(wav.encode(samples, 16000))))
    df = spark.createDataFrame(rows, "doc_id long, audio binary")
    got = {
        (r["doc_id"], r["seg_no"]): r
        for r in segment_audio(df, 500, decode_mode="real").collect()
    }
    # 16 kHz x 500 ms = 8000-sample windows: 24000 -> 3, 8000 -> 1, 100 -> 1
    assert sorted(got) == [(1, 0), (1, 1), (1, 2), (2, 0), (3, 0)]
    assert got[(1, 2)]["start_ms"] == 1000
    seg0 = np.asarray(
        [2000 * ((i * 1) % 7 - 3) for i in range(8000)], dtype=np.float64
    ) / 32768.0
    assert abs(got[(1, 0)]["rms"] - float(np.sqrt(np.mean(seg0 * seg0)))) < 1e-12
    # short clip: one partial window, RMS over its actual samples
    tail = np.asarray(
        [2000 * ((i * 3) % 7 - 3) for i in range(100)], dtype=np.float64
    ) / 32768.0
    assert abs(got[(3, 0)]["rms"] - float(np.sqrt(np.mean(tail * tail)))) < 1e-12


def test_audio_auto_mode_stays_fake_with_fallback(spark):
    """Same auto-mode contract as images: the WAV-only fallback must not
    auto-upgrade (arbitrary fake payloads are not WAV containers)."""
    from fluss_spark.operators.multimodal import (
        _audio_codec,
        _resolve_mode,
        segment_audio,
    )

    codec = _audio_codec()
    assert codec is not None
    if getattr(codec, "IS_FALLBACK", False):
        assert _resolve_mode("auto", codec) == "fake"
    media = spark.createDataFrame(
        [(1, b"\x10" * 16, "audio/fake")], "doc_id long, audio binary, mime string"
    )
    out = segment_audio(media, decode_mode="auto").collect()
    assert len(out) == 1 + 0x10 % 4  # fake n_seg from payload hex byte 1


def test_real_feature_extract_pixel_stats(spark):
    """decode_mode='real' feature extraction: decode actual PNGs through
    the fallback codec, emit per-channel means + variance + dims — the
    values must match a direct numpy recomputation."""
    import numpy as np

    from fluss_spark.operators.multimodal import extract_features

    img = _rgb_image(6, 3)
    payload = png.encode(img)
    df = spark.createDataFrame(
        [(7, bytearray(payload), "image/png")], "doc_id long, media binary, mime string"
    )
    out = extract_features(df, decode_mode="real").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 7
    f = out[0]["features"]
    px = np.frombuffer(img.tobytes(), dtype=np.uint8).astype(np.float64).reshape(-1, 3)
    assert np.allclose(f[:3], px.mean(axis=0) / 255.0)
    assert abs(f[3] - px.var() / 255.0**2) < 1e-12
    assert f[4] == 6 / 4096.0 and f[5] == 3 / 4096.0
    assert f[6] == 3 / 4.0  # channel count
    # grey image: single-channel mean replicated into the 3 slots
    grey = png.PngImage(2, 2, 1, bytes([10, 20, 30, 40]))
    df = spark.createDataFrame(
        [(8, bytearray(png.encode(grey)), "image/png")],
        "doc_id long, media binary, mime string",
    )
    g = extract_features(df, decode_mode="real").collect()[0]["features"]
    assert g[0] == g[1] == g[2] == (10 + 20 + 30 + 40) / 4 / 255.0


# ---------------------------------------------------------------- video


def test_y4m_roundtrip_and_c420_decode():
    """Vendored YUV4MPEG2 codec: grey levels survive RGB->YUV->RGB
    exactly (u=v=128), colour within BT.601 rounding; hand-built C420
    streams upsample chroma to the luma grid."""
    import numpy as np

    from fluss_spark.functions import y4m

    g1 = np.full((4, 6, 3), 50, dtype=np.uint8)
    g2 = np.full((4, 6, 3), 200, dtype=np.uint8)
    red = np.zeros((4, 6, 3), dtype=np.uint8)
    red[..., 0] = 250
    data = y4m.encode_y4m([g1, g2, red], framerate=(25, 1))
    c = y4m.open(data)
    assert (c.width, c.height, c.colourspace) == (6, 4, "444")
    frames = [f.to_ndarray() for f in c.decode(video=0)]
    assert len(frames) == 3
    assert np.array_equal(frames[0], g1) and np.array_equal(frames[1], g2)
    assert np.abs(frames[2].astype(int) - red.astype(int)).max() <= 2

    # mono: bit-exact
    m = np.arange(24, dtype=np.uint8).reshape(4, 6)
    mono_frames = list(y4m.open(y4m.encode_y4m([m])).decode(video=0))
    assert np.array_equal(mono_frames[0].to_ndarray(), m)

    # hand-built C420: 2x2 chroma upsampled to 4x4 luma
    w = h = 4
    yp = np.full((4, 4), 128, dtype=np.uint8)
    up = np.array([[0, 255], [128, 64]], dtype=np.uint8)
    vp = np.full((2, 2), 128, dtype=np.uint8)
    raw = (
        b"YUV4MPEG2 W4 H4 F30:1 C420jpeg\nFRAME\n"
        + yp.tobytes() + up.tobytes() + vp.tobytes()
    )
    f = next(y4m.open(raw).decode(video=0))
    rgb = f.to_ndarray()
    # u=0 quadrant (top-left 2x2) pushes blue down hard; u=255 pushes it up
    assert rgb[0, 0, 2] < 10 and rgb[0, 3, 2] > 245

    with pytest.raises(y4m.Y4mError):
        y4m.open(b"RIFFnotvideo")
    with pytest.raises(y4m.Y4mError):
        list(y4m.open(data[: len(data) - 5]).decode(video=0))  # truncated last frame


def test_real_frame_sampling_through_spark(spark):
    """decode_mode='real' for VIDEO end-to-end via the vendored Y4M
    fallback: 12-frame clips through the production sample_frames
    mapInPandas kernel; every 10th frame survives and its bytes decode
    to the synthesized colours."""
    import numpy as np

    from fluss_spark.functions import y4m
    from fluss_spark.operators.multimodal import _resolve_mode, _video_codec, sample_frames

    codec = _video_codec()
    assert codec is not None  # fallback always present
    if getattr(codec, "IS_FALLBACK", False):
        assert _resolve_mode("auto", codec) == "fake"  # Y4M-only: no auto upgrade

    def clip(doc_id: int, n: int) -> bytes:
        frames = [np.full((4, 6, 3), 10 * doc_id + 7 * i, dtype=np.uint8) for i in range(n)]
        return y4m.encode_y4m(frames)

    media = spark.createDataFrame(
        [(1, clip(1, 12), "video/y4m"), (2, clip(2, 5), "video/y4m")],
        "doc_id long, media binary, mime string",
    )
    rows = sample_frames(media, every_n=10, decode_mode="real").collect()
    got = {(r["doc_id"], r["frame_no"]): bytes(r["frame"]) for r in rows}
    assert set(got) == {(1, 0), (1, 10), (2, 0)}  # 12 frames -> 0,10; 5 -> 0
    # grey frames round-trip exactly: frame 10 of doc 1 is value 10+70=80
    assert got[(1, 10)] == bytes([80]) * (4 * 6 * 3)
    assert got[(2, 0)] == bytes([20]) * (4 * 6 * 3)


def test_real_scene_cut_through_spark(spark):
    """Scene-boundary detection on real Y4M payloads: solid-colour
    blocks produce exact cut points through the production
    segment_scenes kernel."""
    import numpy as np

    from fluss_spark.functions import y4m
    from fluss_spark.operators.multimodal import segment_scenes

    frames = [np.full((4, 6, 3), v, dtype=np.uint8) for v in [10, 10, 10, 200, 200, 90, 90, 90, 90]]
    media = spark.createDataFrame(
        [(1, y4m.encode_y4m(frames), "video/y4m")], "doc_id long, media binary, mime string"
    )
    rows = sorted(
        (r["scene_no"], r["start_frame"], r["n_frames"])
        for r in segment_scenes(media, decode_mode="real").collect()
    )
    assert rows == [(0, 0, 3), (1, 3, 2), (2, 5, 4)]
    # below-threshold flicker does not cut
    soft = [np.full((4, 6, 3), v, dtype=np.uint8) for v in [100, 110, 100, 110]]
    media2 = spark.createDataFrame(
        [(2, y4m.encode_y4m(soft), "video/y4m")], "doc_id long, media binary, mime string"
    )
    rows2 = segment_scenes(media2, decode_mode="real").collect()
    assert len(rows2) == 1 and rows2[0]["n_frames"] == 4


def test_y4m_roundtrip_property():
    """Property check: any stack of same-shape frames round-trips —
    mono and grey-RGB bit-exactly, colour within BT.601 rounding."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fluss_spark.functions import y4m

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 17),
        h=st.integers(1, 13),
        n=st.integers(1, 5),
        mono=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, n, mono, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if mono else (h, w, 3)
        frames = [rng.integers(0, 256, size=shape, dtype=np.uint8) for _ in range(n)]
        data = y4m.encode_y4m(frames)
        c = y4m.open(data)
        out = [f.to_ndarray() for f in c.decode(video=0)]
        assert len(out) == n and (c.width, c.height) == (w, h)
        for a, b in zip(frames, out):
            if mono:
                assert np.array_equal(a, b)
            else:
                assert np.abs(a.astype(int) - b.astype(int)).max() <= 3

    check()


def test_y4m_grey_rgb_exact_roundtrip():
    """r=g=b frames have u=v=128 exactly -> the colour path is
    bit-exact on greyscale content of any value."""
    import numpy as np

    from fluss_spark.functions import y4m

    g = np.repeat(np.arange(256, dtype=np.uint8).reshape(16, 16)[..., None], 3, axis=-1)
    out = next(y4m.open(y4m.encode_y4m([g])).decode(video=0)).to_ndarray()
    assert np.array_equal(out, g)


def test_scene_cut_zero_frame_clip_emits_no_scenes(spark):
    """A header-only Y4M stream (zero frames) must produce zero scene
    rows, not a spurious (scene 0, n_frames 0) row."""
    media = spark.createDataFrame(
        [(9, b"YUV4MPEG2 W4 H4 F30:1 C444\n", "video/y4m")],
        "doc_id long, media binary, mime string",
    )
    from fluss_spark.operators.multimodal import segment_scenes

    assert segment_scenes(media, decode_mode="real").count() == 0


def test_real_perceptual_hash_ahash(spark):
    """decode_mode='real' aHash through the production kernel on actual
    PNGs: two nearly identical images (one pixel nudged) must land
    within a few hamming bits, while an inverted image is far — the
    property the banded dedup join relies on."""
    from fluss_spark.operators.multimodal import perceptual_hash

    w = h = 8
    # a gradient image, a near-copy with one pixel nudged, and an inverse
    base = [((x * 30 + y * 4) % 256) for y in range(h) for x in range(w) for _ in range(3)]
    near = list(base)
    near[0] = (near[0] + 12) % 256  # nudge one channel of one pixel
    inv = [255 - v for v in base]
    payloads = []
    for i, px in enumerate([base, near, inv]):
        buf = io.BytesIO()
        png.PngImage(w, h, 3, bytes(px)).save(buf)
        payloads.append((i, buf.getvalue(), "image/png"))
    media = spark.createDataFrame(payloads, "doc_id long, media binary, mime string")

    rows = {r["doc_id"]: [r[f"b{i}"] for i in range(4)] for r in
            perceptual_hash(media, decode_mode="real").collect()}

    def hamming(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert hamming(rows[0], rows[1]) <= 4      # near-copy stays near
    assert hamming(rows[0], rows[2]) >= 32     # inverse flips ~every bit
    # all bands are 16-bit values
    assert all(0 <= v < (1 << 16) for bands in rows.values() for v in bands)
