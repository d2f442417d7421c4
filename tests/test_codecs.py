"""In-repo media codecs (PNG / BMP / WAV) and the real-decode multimodal
operators built on them.

Oracle strategy: encoders and decoders are exercised round-trip
(encode→decode == original array), plus hand-built streams for the
decoder paths the encoder never emits (PNG filters 1-4, palette,
top-down BMP, 8-bit WAV). Spark-side operators are checked against
numpy computed directly on the same arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from duckdb_mongo_spark.ops import codecs


def _rng(seed=7):
    return np.random.default_rng(seed)


class TestPngRoundTrip:
    @pytest.mark.parametrize("shape", [(5, 7), (4, 4, 2), (8, 3, 3), (2, 9, 4)])
    def test_round_trip(self, shape):
        arr = _rng().integers(0, 256, size=shape, dtype=np.uint8)
        out = codecs.decode_png(codecs.encode_png(arr))
        expect = arr[:, :, None] if arr.ndim == 2 else arr
        np.testing.assert_array_equal(out, expect)

    def test_known_pixel(self):
        arr = np.zeros((2, 2, 3), dtype=np.uint8)
        arr[0, 1] = [255, 128, 7]
        out = codecs.decode_png(codecs.encode_png(arr))
        assert out[0, 1].tolist() == [255, 128, 7]
        assert out[1, 0].tolist() == [0, 0, 0]

    def test_header_metadata_agrees(self):
        from duckdb_mongo_spark.ops.multimodal import parse_image_header

        b = codecs.encode_png(np.zeros((480, 640, 3), dtype=np.uint8))
        assert parse_image_header(b) == ("image/png", 640, 480)


def _png_with_filters(rows_rgb: np.ndarray, filters: list[int]) -> bytes:
    """Hand-assemble a PNG whose scanlines use the given filter types,
    computing the filtered bytes per the PNG spec (the inverse of what
    the decoder must undo)."""
    h, w, c = rows_rgb.shape
    assert len(filters) == h
    bpp = c
    stride = w * c
    flat = rows_rgb.reshape(h, stride).astype(np.int64)
    out = bytearray()
    for y, ft in enumerate(filters):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        line = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b_ = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b_
            elif ft == 3:
                pred = (a + b_) >> 1
            else:  # Paeth
                p = a + b_ - cc
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else cc)
            line[x] = (cur[x] - pred) & 0xFF
        out.append(ft)
        out += bytes(line.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        codecs._PNG_MAGIC
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + codecs._png_chunk(b"IEND", b"")
    )


class TestPngFilters:
    def test_all_five_filters_decode(self):
        arr = _rng(3).integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
        b = _png_with_filters(arr, [0, 1, 2, 3, 4])
        np.testing.assert_array_equal(codecs.decode_png(b), arr)

    def test_paeth_heavy(self):
        arr = _rng(11).integers(0, 256, size=(7, 4, 3), dtype=np.uint8)
        b = _png_with_filters(arr, [4] * 7)
        np.testing.assert_array_equal(codecs.decode_png(b), arr)


class TestPngPalette:
    def _palette_png(self, idx: np.ndarray, palette: np.ndarray, trns: bytes | None = None):
        h, w = idx.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        raw = b"".join(b"\x00" + bytes(idx[y]) for y in range(h))
        chunks = codecs._png_chunk(b"IHDR", ihdr) + codecs._png_chunk(
            b"PLTE", palette.astype(np.uint8).tobytes()
        )
        if trns is not None:
            chunks += codecs._png_chunk(b"tRNS", trns)
        chunks += codecs._png_chunk(b"IDAT", zlib.compress(raw))
        chunks += codecs._png_chunk(b"IEND", b"")
        return codecs._PNG_MAGIC + chunks

    def test_palette_expands_to_rgb(self):
        palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]])
        idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
        out = codecs.decode_png(self._palette_png(idx, palette))
        assert out.shape == (2, 2, 3)
        assert out[0, 1].tolist() == [0, 255, 0]

    def test_palette_trns_adds_alpha(self):
        palette = np.array([[10, 20, 30], [40, 50, 60]])
        idx = np.array([[0, 1]], dtype=np.uint8)
        out = codecs.decode_png(self._palette_png(idx, palette, trns=bytes([128])))
        assert out.shape == (1, 2, 4)
        assert out[0, 0, 3] == 128  # tRNS entry 0
        assert out[0, 1, 3] == 255  # beyond tRNS table -> opaque

    def test_bad_palette_index_raises(self):
        palette = np.array([[1, 2, 3]])
        idx = np.array([[5]], dtype=np.uint8)
        with pytest.raises(codecs.CodecError):
            codecs.decode_png(self._palette_png(idx, palette))


class TestPngRejections:
    def test_not_png(self):
        with pytest.raises(codecs.CodecError):
            codecs.decode_png(b"JFIF not a png")

    def test_truncated_idat(self):
        b = codecs.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        # corrupt the IDAT body (flip bytes after the chunk tag)
        i = b.index(b"IDAT")
        bad = b[: i + 8] + b"\x00\x00\x00\x00" + b[i + 12 :]
        with pytest.raises(codecs.CodecError):
            codecs.decode_png(bad)

    def test_16bit_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        b = (
            codecs._PNG_MAGIC
            + codecs._png_chunk(b"IHDR", ihdr)
            + codecs._png_chunk(b"IDAT", zlib.compress(b"\x00" * 7))
            + codecs._png_chunk(b"IEND", b"")
        )
        with pytest.raises(codecs.CodecError):
            codecs.decode_png(b)


class TestBmp:
    def test_round_trip_24bit(self):
        arr = _rng(5).integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
        np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(arr)), arr)

    def test_row_padding(self):
        # width 3 -> 9-byte rows pad to 12; decoder must skip the pad
        arr = np.arange(45, dtype=np.uint8).reshape(5, 3, 3)
        np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(arr)), arr)

    def test_top_down(self):
        arr = _rng(9).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
        b = bytearray(codecs.encode_bmp(arr))
        # flip height sign -> top-down; pixel rows were written bottom-up
        h = struct.unpack("<i", bytes(b[22:26]))[0]
        b[22:26] = struct.pack("<i", -h)
        out = codecs.decode_bmp(bytes(b))
        np.testing.assert_array_equal(out, arr[::-1])

    def test_compressed_rejected(self):
        b = bytearray(codecs.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        b[30:34] = struct.pack("<I", 1)  # BI_RLE8
        with pytest.raises(codecs.CodecError):
            codecs.decode_bmp(bytes(b))


class TestWav:
    def test_round_trip_16bit(self):
        t = np.linspace(0, 1, 800, endpoint=False)
        sig = 0.5 * np.sin(2 * np.pi * 440 * t)
        out, rate = codecs.decode_wav(codecs.encode_wav(sig, 8000))
        assert rate == 8000
        assert out.shape == (800, 1)
        np.testing.assert_allclose(out[:, 0], sig, atol=1.0 / 32767)

    def test_stereo(self):
        sig = np.stack([np.ones(10) * 0.25, np.ones(10) * -0.25], axis=1)
        out, rate = codecs.decode_wav(codecs.encode_wav(sig, 44100))
        assert out.shape == (10, 2)
        np.testing.assert_allclose(out, sig, atol=1.0 / 32767)

    def test_8bit_unsigned(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        data = bytes([128, 255, 0, 128])
        riff = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + data
        )
        b = b"RIFF" + struct.pack("<I", len(riff)) + riff
        out, rate = codecs.decode_wav(b)
        np.testing.assert_allclose(out[:, 0], [0.0, 127 / 128, -1.0, 0.0])

    def test_float_wav_rejected(self):
        b = bytearray(codecs.encode_wav(np.zeros(4), 8000))
        i = bytes(b).index(b"fmt ") + 8
        b[i : i + 2] = struct.pack("<H", 3)  # IEEE float format tag
        with pytest.raises(codecs.CodecError):
            codecs.decode_wav(bytes(b))

    def test_header_parse_agrees(self):
        from duckdb_mongo_spark.ops.multimodal import parse_audio_header

        b = codecs.encode_wav(np.zeros((100, 2)), 16000)
        assert parse_audio_header(b) == ("audio/wav", 2, 16000, 100)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Literal-code GIF LZW writer (test oracle): emits every pixel as a
    root code, inserting CLEAR whenever the decoder's table would force a
    code-width change — the classic "uncompressed GIF" technique, valid
    per the GIF89a spec and decodable by any conforming decoder."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    table_size = end + 1
    for i, px in enumerate(indices):
        emit(int(px))
        if i > 0:
            table_size += 1  # decoder adds an entry per code after the first
        if table_size >= (1 << code_size) - 1:
            emit(clear)
            table_size = end + 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(grid: np.ndarray, palette: np.ndarray, interlace=False,
              transparent=None, version=b"89a") -> bytes:
    h, w = grid.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    gct_n = 1 << max(1, bits)
    pal = np.zeros((gct_n, 3), np.uint8)
    pal[:n] = palette
    b = bytearray(b"GIF" + version)
    b += struct.pack("<HHBBB", w, h, 0x80 | (max(1, bits) - 1), 0, 0)
    b += pal.tobytes()
    if transparent is not None:
        b += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    rows = grid
    if interlace:
        order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for r in range(start, h, step)]
        rows = grid[order]
    b += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    min_code = max(2, bits)
    b += bytes([min_code])
    data = _lzw_encode(rows.reshape(-1), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        b += bytes([len(chunk)]) + chunk
    b += bytes([0, 0x3B])
    return bytes(b)


class TestGif:
    PAL = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)

    def test_round_trip_rgb(self):
        grid = _rng(11).integers(0, 4, size=(9, 7), dtype=np.uint8)
        out = codecs.decode_gif(_make_gif(grid, self.PAL))
        np.testing.assert_array_equal(out, self.PAL[grid])

    def test_interlaced(self):
        grid = _rng(12).integers(0, 4, size=(11, 5), dtype=np.uint8)
        out = codecs.decode_gif(_make_gif(grid, self.PAL, interlace=True))
        np.testing.assert_array_equal(out, self.PAL[grid])

    def test_transparency_yields_rgba(self):
        grid = np.array([[0, 1], [2, 0]], np.uint8)
        out = codecs.decode_gif(_make_gif(grid, self.PAL, transparent=0))
        assert out.shape == (2, 2, 4)
        np.testing.assert_array_equal(out[..., 3],
                                      np.where(grid == 0, 0, 255))
        np.testing.assert_array_equal(out[..., :3], self.PAL[grid])

    def test_gif87a(self):
        grid = _rng(13).integers(0, 4, size=(3, 3), dtype=np.uint8)
        out = codecs.decode_gif(_make_gif(grid, self.PAL, version=b"87a"))
        np.testing.assert_array_equal(out, self.PAL[grid])

    def test_dispatch_and_header_agree(self):
        from duckdb_mongo_spark.ops.multimodal import parse_image_header

        grid = _rng(14).integers(0, 4, size=(6, 10), dtype=np.uint8)
        payload = _make_gif(grid, self.PAL)
        assert codecs.decode_image(payload).shape[:2] == (6, 10)
        fmt, width, height = parse_image_header(payload)
        assert (fmt, width, height) == ("image/gif", 10, 6)

    def test_truncated_rejected(self):
        grid = _rng(15).integers(0, 4, size=(8, 8), dtype=np.uint8)
        payload = _make_gif(grid, self.PAL)
        with pytest.raises(codecs.CodecError):
            codecs.decode_gif(payload[:40])

    def test_wide_palette_codes(self):
        # 200-color palette exercises 8-bit roots + width growth/clears
        pal = _rng(16).integers(0, 256, size=(200, 3), dtype=np.uint8)
        grid = _rng(17).integers(0, 200, size=(16, 16), dtype=np.uint8)
        out = codecs.decode_gif(_make_gif(grid, pal))
        np.testing.assert_array_equal(out, pal[grid])


class TestResizeNearest:
    def test_identity(self):
        arr = _rng(2).integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
        np.testing.assert_array_equal(codecs.resize_nearest(arr, 6, 4), arr)

    def test_downscale_2x(self):
        # 2x2 blocks of constant color -> each survives a 2x downscale
        blocks = _rng(4).integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
        arr = np.repeat(np.repeat(blocks, 2, axis=0), 2, axis=1)
        np.testing.assert_array_equal(codecs.resize_nearest(arr, 5, 3), blocks)

    def test_upscale_shape(self):
        arr = np.zeros((2, 2), dtype=np.uint8)
        assert codecs.resize_nearest(arr, 7, 5).shape == (5, 7)

    def test_bad_target(self):
        with pytest.raises(codecs.CodecError):
            codecs.resize_nearest(np.zeros((2, 2)), 0, 2)


class TestSparkOperators:
    """image_pixel_features / resize_image / audio_pixel_features over a
    mixed decodable + undecodable corpus."""

    @pytest.fixture(scope="class")
    def media_df(self, spark):
        png = codecs.encode_png(
            np.full((4, 6, 3), [10, 200, 30], dtype=np.uint8)
        )
        bmp = codecs.encode_bmp(np.full((2, 2, 3), 100, dtype=np.uint8))
        junk = b"\xff\xd8\xff\xe0 pretend jpeg"
        rows = [(1, png), (2, bmp), (3, junk), (4, None)]
        return spark.createDataFrame(rows, "id long, payload binary")

    def test_image_pixel_features(self, spark, media_df):
        from duckdb_mongo_spark.ops import multimodal

        df = multimodal.attach_media_column(media_df, "payload").drop("payload")
        out = {r["id"]: r for r in multimodal.image_pixel_features(df).collect()}
        png_row = out[1]
        assert png_row["mime"] == "image/png"
        assert (png_row["width"], png_row["height"], png_row["channels"]) == (6, 4, 3)
        assert png_row["mean_r"] == pytest.approx(10.0)
        assert png_row["mean_g"] == pytest.approx(200.0)
        assert png_row["luma_mean"] == pytest.approx(0.299 * 10 + 0.587 * 200 + 0.114 * 30)
        assert png_row["luma_std"] == pytest.approx(0.0)
        bmp_row = out[2]
        assert bmp_row["mime"] == "image/bmp"
        assert bmp_row["mean_r"] == pytest.approx(100.0)
        junk_row = out[3]
        assert junk_row["width"] is None and junk_row["mean_r"] is None
        assert out[4]["mime"] == "application/octet-stream"

    def test_resize_image_real(self, spark, media_df):
        from duckdb_mongo_spark.ops import multimodal

        df = multimodal.attach_media_column(media_df, "payload").drop("payload")
        out = {r["id"]: r for r in multimodal.resize_image(df, 3, 2).collect()}
        assert out[1]["resized"] is True
        resized = codecs.decode_png(bytes(out[1]["media"]))
        assert resized.shape == (2, 3, 3)
        assert resized[0, 0].tolist() == [10, 200, 30]  # constant image survives
        assert out[3]["resized"] is False
        assert bytes(out[3]["media"]) == b"\xff\xd8\xff\xe0 pretend jpeg"
        # transcoded rows update media_mime; untouched rows keep theirs
        assert out[2]["media_mime"] == "image/png"  # was BMP, re-encoded
        assert out[3]["media_mime"] == "application/octet-stream"

    def test_audio_pixel_features(self, spark):
        from duckdb_mongo_spark.ops import multimodal

        t = np.arange(1000)
        sig = 0.5 * np.sin(2 * np.pi * 50 * t / 1000)  # 50 cycles
        wav = codecs.encode_wav(sig, 8000)
        df = spark.createDataFrame([(1, wav), (2, b"nope")], "id long, payload binary")
        df = multimodal.attach_media_column(df, "payload", mime="audio/wav").drop("payload")
        out = {r["id"]: r for r in multimodal.audio_pixel_features(df).collect()}
        row = out[1]
        assert row["mime"] == "audio/wav"
        assert row["sample_rate"] == 8000
        assert row["n_samples"] == 1000
        assert row["duration_ms"] == 125
        assert row["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
        assert row["peak"] == pytest.approx(0.5, rel=1e-3)
        # 50 cycles -> ~100 zero crossings over 999 transitions
        assert row["zero_crossing_rate"] == pytest.approx(100 / 999, rel=0.05)
        assert out[2]["rms"] is None


class TestJpeg:
    """Baseline JPEG (T.81): lossy round-trips with error bounds scaled
    to quality, hand-checked invariants (flat blocks exact, DC-only
    streams), every decoder feature driven by the encoder's options
    (4:2:0 subsampling, restart markers), and rejection of the
    unsupported variants (progressive)."""

    def _smooth_rgb(self, h=48, w=64):
        y, x = np.mgrid[0:h, 0:w]
        return np.stack([
            np.clip(x * 3 + 20, 0, 255),
            np.clip(y * 4, 0, 255),
            np.clip(200 - x - y, 0, 255),
        ], axis=-1).astype(np.uint8)

    def test_round_trip_rgb_high_quality(self):
        img = self._smooth_rgb()
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=95))
        assert out.shape == img.shape and out.dtype == np.uint8
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 6 and err.mean() < 1.5

    def test_round_trip_grayscale_odd_dims(self):
        y, x = np.mgrid[0:37, 0:51]
        g = np.clip(x * 2 + y, 0, 255).astype(np.uint8)
        out = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=92))
        assert out.shape == g.shape
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 6

    def test_flat_image_is_exact(self):
        # a constant block quantizes to DC-only with zero loss
        for v in (0, 128, 255):
            flat = np.full((24, 40, 3), v, np.uint8)
            out = codecs.decode_jpeg(codecs.encode_jpeg(flat, quality=75))
            assert np.array_equal(out, flat)

    def test_420_subsampling_round_trip(self):
        img = self._smooth_rgb(45, 61)  # odd dims force chroma edge pad
        b = codecs.encode_jpeg(img, quality=92, subsampling="420")
        b444 = codecs.encode_jpeg(img, quality=92, subsampling="444")
        assert len(b) < len(b444)  # 4:2:0 actually subsamples
        out = codecs.decode_jpeg(b)
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0

    def test_restart_markers_round_trip(self):
        img = self._smooth_rgb(40, 72)
        b = codecs.encode_jpeg(img, quality=92, restart_interval=2)
        assert b"\xff\xdd" in b  # DRI segment present
        assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))  # RSTn
        out = codecs.decode_jpeg(b)
        no_rst = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=92))
        assert np.array_equal(out, no_rst)  # restarts change framing only

    def test_quality_monotone(self):
        img = self._smooth_rgb()
        sizes = [len(codecs.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
        assert sizes == sorted(sizes)
        errs = [
            np.abs(codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q)).astype(int)
                   - img.astype(int)).mean()
            for q in (30, 90)
        ]
        assert errs[0] > errs[1]

    def test_header_parse_agrees_with_decode(self):
        from duckdb_mongo_spark.ops.multimodal import parse_image_header

        img = self._smooth_rgb(33, 57)
        for kwargs in ({"subsampling": "444"}, {"subsampling": "420"},
                       {"restart_interval": 4}):
            b = codecs.encode_jpeg(img, quality=90, **kwargs)
            mime, w, h = parse_image_header(b)
            decoded = codecs.decode_jpeg(b)
            assert mime == "image/jpeg"
            assert (h, w) == decoded.shape[:2] == (33, 57)

    def test_decode_image_dispatches_jpeg(self):
        img = self._smooth_rgb(16, 16)
        out = codecs.decode_image(codecs.encode_jpeg(img, quality=95))
        assert out.shape == (16, 16, 3)

    def test_progressive_round_trip_identical_to_baseline(self):
        # progressive emission reorders the SAME quantized coefficients,
        # so both modes must decode to IDENTICAL pixels
        for sub in ("444", "420"):
            img = self._smooth_rgb(45, 61)
            base = codecs.decode_jpeg(codecs.encode_jpeg(img, 90, subsampling=sub))
            prog = codecs.decode_jpeg(
                codecs.encode_jpeg(img, 90, subsampling=sub, progressive=True))
            assert np.array_equal(base, prog)

    def test_progressive_grayscale(self):
        y, x = np.mgrid[0:37, 0:51]
        g = ((x * 2 + y) % 251).astype(np.uint8)
        base = codecs.decode_jpeg(codecs.encode_jpeg(g, 88))
        prog = codecs.decode_jpeg(codecs.encode_jpeg(g, 88, progressive=True))
        assert np.array_equal(base, prog)

    def test_progressive_marker_and_header(self):
        from duckdb_mongo_spark.ops.multimodal import parse_image_header

        b = codecs.encode_jpeg(self._smooth_rgb(16, 24), 90, progressive=True)
        assert b"\xff\xc2" in b and b"\xff\xc0" not in b
        assert b.count(b"\xff\xda") >= 4  # DC + DC-refine + AC bands
        assert parse_image_header(b) == ("image/jpeg", 24, 16)

    def test_progressive_rejects_restart_interval(self):
        with pytest.raises(codecs.CodecError, match="baseline only"):
            codecs.encode_jpeg(self._smooth_rgb(16, 16), 90,
                               progressive=True, restart_interval=2)

    def test_invalid_progressive_scan_rejected(self):
        # SOF0 -> SOF2 flip makes the full-spectrum interleaved scan
        # illegal under the progressive scan rules (Ss=0 requires Se=0)
        b = bytearray(codecs.encode_jpeg(self._smooth_rgb(16, 16), 90))
        i = b.find(b"\xff\xc0")
        assert i > 0
        b[i + 1] = 0xC2
        with pytest.raises(codecs.CodecError, match="Ss=0 requires Se=0"):
            codecs.decode_jpeg(bytes(b))

    def test_arithmetic_coding_rejected(self):
        b = bytearray(codecs.encode_jpeg(self._smooth_rgb(16, 16), 90))
        i = b.find(b"\xff\xc0")
        b[i + 1] = 0xC9  # SOF9: arithmetic sequential
        with pytest.raises(codecs.CodecError, match="arithmetic"):
            codecs.decode_jpeg(bytes(b))

    def test_hand_built_ac_refinement_stream(self):
        # Single 8x8 grayscale block, NO DC scan; two AC scans over
        # Ss=1..63: first with Al=1 (sends magnitudes >> 1), then the
        # successive-approximation refinement with Al=0 (correction
        # bits). Target coefficients: zigzag c1 = 3, c2 = -2.
        # Scan 1 symbols (AC table: '0'=EOB, '10'=(0,1)):
        #   (0,1)+bit1 -> c1 = 1<<1 = 2; (0,1)+bit0 -> c2 = -1<<1 = -2;
        #   EOB.  Bits '10 1 10 0 0' + pad '1' = 0xB1.
        # Scan 2: EOB first (eobrun=1), then correction bits for the two
        # nonzero-history coefficients: c1 bit 1 (2 -> 3), c2 bit 0
        # (stays -2). Bits '0 1 0' + pad '11111' = 0x5F.
        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
        sof = seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        dht_ac = seg(0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14) + bytes([0x00, 0x01]))
        sos1 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        sos2 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        stream = (b"\xff\xd8" + dqt + sof + dht_ac
                  + sos1 + bytes([0xB1]) + sos2 + bytes([0x5F]) + b"\xff\xd9")
        out = codecs.decode_jpeg(stream)
        # expected: dequantized F[0,1] = 3*16, F[1,0] = -2*16, IDCT + 128
        F = np.zeros((8, 8))
        F[0, 1] = 48.0
        F[1, 0] = -32.0
        M = codecs._DCT_M
        expected = np.clip(np.round(M.T @ F @ M + 128.0), 0, 255).astype(np.uint8)
        assert np.array_equal(out, expected)

    def test_not_jpeg_rejected(self):
        with pytest.raises(codecs.CodecError):
            codecs.decode_jpeg(b"\x00\x01\x02\x03")

    def test_truncated_after_sof_rejected(self):
        b = codecs.encode_jpeg(self._smooth_rgb(16, 16), 90)
        i = b.find(b"\xff\xda")
        with pytest.raises(codecs.CodecError, match="no SOS"):
            codecs.decode_jpeg(b[:i])

    def test_hand_built_dc_only_stream(self):
        # Hand-assembled minimal stream (the test style of the PNG filter
        # suite): one 8x8 grayscale block, flat quant table of 16, single
        # Huffman DC table {0:'0', 4:'10'}, AC table {EOB:'0'}; DC diff=8
        # dequantizes to 128 -> IDCT of a DC-only block = flat 128+32=...
        # DC coeff 8*16=128 -> pixel value = 128/8 + 128 = 144 everywhere.
        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
        sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        # DC table: bits=[1,1,0,...]: sym 0 -> code '0' (len1), sym 4 -> '10' (len2)
        dht_dc = seg(0xC4, bytes([0x00]) + bytes([1, 1] + [0] * 14) + bytes([0, 4]))
        # AC table: bits=[1,0,...]: sym 0x00 (EOB) -> code '0'
        dht_ac = seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
        sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        # scan bits: DC sym 4 = '10', then 4 magnitude bits '1000' (=8),
        # then AC EOB '0' -> '10 1000 0' + pad 1s = 0b10100001 = 0xA1
        stream = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
                  + bytes([0xA1]) + b"\xff\xd9")
        out = codecs.decode_jpeg(stream)
        # IDCT: f = M.T @ F @ M with only F[0,0]=128 -> 128/8 = 16; +128 = 144
        assert out.shape == (8, 8)
        assert np.array_equal(out, np.full((8, 8), 144, np.uint8))

    def test_image_pixel_features_covers_jpeg(self, spark):
        from duckdb_mongo_spark.ops import multimodal

        img = self._smooth_rgb(24, 24)
        b = codecs.encode_jpeg(img, quality=95)
        df = spark.createDataFrame([(1, b)], "id long, payload binary")
        df = multimodal.attach_media_column(df, "payload", mime="image/jpeg").drop("payload")
        row = multimodal.image_pixel_features(df).collect()[0]
        assert row["mime"] == "image/jpeg"
        assert (row["width"], row["height"], row["channels"]) == (24, 24, 3)
        assert row["mean_r"] == pytest.approx(float(img[..., 0].mean()), abs=2.0)
        assert row["luma_std"] is not None


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) — round trips through the in-repo encoder plus
# hand-assembled streams for the decoder paths the encoder never emits
# (the four transforms and meta-Huffman groups), mirroring the JPEG test
# strategy. All streams follow RFC 9649's lossless bitstream spec.
# ---------------------------------------------------------------------------

from duckdb_mongo_spark.ops import webp as W


def _vp8l_container(bw) -> bytes:
    payload = bytes([0x2F]) + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _argb_flat(rgba: np.ndarray) -> list[int]:
    a = rgba.astype(np.uint32)
    return (
        (a[..., 3] << 24) | (a[..., 0] << 16) | (a[..., 1] << 8) | a[..., 2]
    ).reshape(-1).tolist()


def _header(bw, w, h):
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1, 1)  # alpha hint
    bw.bits(0, 3)  # version


class TestWebpRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1, 3), (3, 7, 4), (5, 5), (16, 16, 4)])
    @pytest.mark.parametrize("rle,cache", [(False, 0), (True, 0), (True, 4), (False, 6)])
    def test_round_trip_exact(self, shape, rle, cache):
        arr = _rng(3).integers(0, 256, size=shape, dtype=np.uint8)
        b = W.encode_webp_lossless(arr, use_rle=rle, cache_bits=cache)
        out = W.decode_webp(b)
        exp = arr if arr.ndim == 3 else np.stack([arr] * 3, axis=-1)
        if exp.shape[2] == 3:
            exp = np.dstack([exp, np.full(exp.shape[:2], 255, np.uint8)])
        np.testing.assert_array_equal(out, exp)

    def test_rle_both_distance_code_forms(self):
        # runs of the previous pixel: once via the 120-entry 2-D map
        # (plane 2 -> dist 1), once via the raw plane code 121
        arr = np.repeat(
            _rng(5).integers(0, 256, size=(4, 3, 4), dtype=np.uint8), 5, axis=1
        )
        a = W.encode_webp_lossless(arr, use_rle=True, rle_plane_codes=True)
        b = W.encode_webp_lossless(arr, use_rle=True, rle_plane_codes=False)
        np.testing.assert_array_equal(W.decode_webp(a), W.decode_webp(b))
        np.testing.assert_array_equal(W.decode_webp(a)[..., :3], arr[..., :3])

    def test_color_cache_hits_shrink_stream(self):
        # a 2-color checkerboard: with an adequate cache every repeat
        # pixel is a cache hit; stream must still decode bit-exactly
        arr = np.zeros((8, 8, 4), np.uint8)
        arr[::2, ::2] = [200, 10, 30, 255]
        arr[1::2, 1::2] = [200, 10, 30, 255]
        arr[arr[..., 3] == 0] = [5, 250, 100, 255]
        plain = W.encode_webp_lossless(arr, use_rle=False, cache_bits=0)
        cached = W.encode_webp_lossless(arr, use_rle=False, cache_bits=8)
        np.testing.assert_array_equal(W.decode_webp(plain), W.decode_webp(cached))

    def test_dispatch_via_decode_image(self):
        arr = _rng(11).integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
        out = codecs.decode_image(W.encode_webp_lossless(arr))
        np.testing.assert_array_equal(out, arr)

    def test_image_pixel_features_covers_vp8l(self, spark):
        from duckdb_mongo_spark.ops import multimodal

        img = _rng(13).integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
        b = W.encode_webp_lossless(img)
        df = spark.createDataFrame([(1, b)], "id long, payload binary")
        df = multimodal.attach_media_column(
            df, "payload", mime="image/webp"
        ).drop("payload")
        row = multimodal.image_pixel_features(df).collect()[0]
        assert row["mime"] == "image/webp"
        assert (row["width"], row["height"], row["channels"]) == (9, 12, 4)
        assert row["mean_r"] == pytest.approx(float(img[..., 0].mean()), abs=1e-6)
        assert row["luma_std"] is not None

    def test_image_pixel_features_covers_lossy_vp8(self, spark):
        # r6: lossy WebP pixels are REAL through the Spark feature path
        # (in-repo ops/vp8.py; native route is pixel-identical when
        # present), not header-metadata-degraded as in rounds <= 5
        import os

        from duckdb_mongo_spark.ops import multimodal

        fix = os.path.join(os.path.dirname(__file__), "fixtures", "webp")
        b = open(os.path.join(fix, "libwebp_lossy_q80.webp"), "rb").read()
        expected = np.load(os.path.join(fix, "libwebp_lossy_q80.npy"))
        df = spark.createDataFrame([(1, b)], "id long, payload binary")
        df = multimodal.attach_media_column(
            df, "payload", mime="image/webp"
        ).drop("payload")
        row = multimodal.image_pixel_features(df).collect()[0]
        assert (row["width"], row["height"], row["channels"]) == (64, 48, 4)
        assert row["mean_r"] == pytest.approx(
            float(expected[..., 0].mean()), abs=1e-6)
        assert row["luma_std"] is not None

    def test_lossy_vp8_garbage_raises_with_and_without_runtime(
            self, monkeypatch):
        # r6: lossy "VP8 " decodes through the pure in-repo RFC 6386
        # decoder (ops/vp8.py) when no libwebp runtime is present; a
        # garbage payload raises CodecError on both routes.
        body = b"\x00" * 10
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
        riff = b"WEBP" + chunk
        blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
        from duckdb_mongo_spark.ops import webp_native

        with pytest.raises(codecs.CodecError):  # native (or pure) route
            W.decode_webp(blob)
        monkeypatch.setattr(webp_native, "available", lambda: False)
        with pytest.raises(codecs.CodecError):  # pure-decoder route
            W.decode_webp(blob)

    def test_bad_container_and_truncation(self):
        with pytest.raises(codecs.CodecError):
            W.decode_webp(b"RIFFxxxxNOPE")
        good = W.encode_webp_lossless(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(codecs.CodecError):
            W.decode_webp(good[:20])


class TestWebpTransforms:
    """Hand-assembled VP8L streams for the four transforms: the encoder
    never emits them, so each test applies the FORWARD transform to known
    pixels, writes the transform header + residuals, and asserts the
    decoder's inverse restores the original."""

    def _decode(self, bw):
        return W.decode_webp(_vp8l_container(bw))

    def test_subtract_green(self):
        rgba = _rng(21).integers(0, 256, size=(2, 4, 4), dtype=np.uint8)
        residual = rgba.copy()
        residual[..., 0] = (rgba[..., 0].astype(int) - rgba[..., 1]) % 256
        residual[..., 2] = (rgba[..., 2].astype(int) - rgba[..., 1]) % 256
        bw = W._BitWriter()
        _header(bw, 4, 2)
        bw.bits(1, 1)
        bw.bits(2, 2)  # SUBTRACT_GREEN
        bw.bits(0, 1)  # no more transforms
        W._emit_pixels(bw, _argb_flat(residual), 4, False, 0, is_main=True)
        np.testing.assert_array_equal(self._decode(bw), rgba)

    @pytest.mark.parametrize("mode", list(range(14)))
    def test_predictor_every_mode(self, mode):
        rgba = _rng(31 + mode).integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
        px = _argb_flat(rgba)
        w = h = 4
        size_bits = 2  # one 4x4 block -> a single mode pixel
        # forward: residual = pixel - predictor (per channel mod 256),
        # with the spec edge rules (this mirrors the decoder's inverse)
        res = [0] * (w * h)
        dec = list(px)  # predictors see DECODED neighbors
        for pos in range(w * h):
            y, x = divmod(pos, w)
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = dec[pos - 1]
            elif x == 0:
                pred = dec[pos - w]
            else:
                L, T, TL = dec[pos - 1], dec[pos - w], dec[pos - w - 1]
                TR = dec[pos - w + 1]
                pred = {
                    0: 0xFF000000, 1: L, 2: T, 3: TR, 4: TL,
                    5: W._avg2(W._avg2(L, TR), T), 6: W._avg2(L, TL),
                    7: W._avg2(L, T), 8: W._avg2(TL, T), 9: W._avg2(T, TR),
                    10: W._avg2(W._avg2(L, TL), W._avg2(T, TR)),
                    11: W._select(L, T, TL),
                    12: W._clamp_add_sub_full(L, T, TL),
                    13: W._clamp_add_sub_half(W._avg2(L, T), TL),
                }[mode]
            r = 0
            for sh in (24, 16, 8, 0):
                r |= ((((px[pos] >> sh) & 0xFF) - ((pred >> sh) & 0xFF)) & 0xFF) << sh
            res[pos] = r
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.bits(1, 1)
        bw.bits(0, 2)  # PREDICTOR
        bw.bits(size_bits - 2, 3)
        W._emit_pixels(bw, [(0xFF << 24) | (mode << 8)], 1, False, 0)
        bw.bits(0, 1)
        W._emit_pixels(bw, res, w, False, 0, is_main=True)
        np.testing.assert_array_equal(self._decode(bw), rgba)

    def test_color_transform(self):
        rgba = _rng(41).integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
        g2r, g2b, r2b = 34, -20, 7  # signed 5.3-ish multipliers
        def d(t, c):
            return (t * W._i8(c & 0xFF)) >> 5
        res = rgba.copy().astype(int)
        for y in range(4):
            for x in range(4):
                red, green, blue = (int(rgba[y, x, 0]), int(rgba[y, x, 1]),
                                    int(rgba[y, x, 2]))
                res[y, x, 0] = (red - d(g2r, green)) % 256
                res[y, x, 2] = (blue - d(g2b, green) - d(r2b, red)) % 256
        elem = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        bw = W._BitWriter()
        _header(bw, 4, 4)
        bw.bits(1, 1)
        bw.bits(1, 2)  # COLOR
        bw.bits(3 - 2, 3)  # size_bits=3: one element covers the image
        W._emit_pixels(bw, [elem], 1, False, 0)
        bw.bits(0, 1)
        W._emit_pixels(bw, _argb_flat(res.astype(np.uint8)), 4, False, 0,
                       is_main=True)
        np.testing.assert_array_equal(self._decode(bw), rgba)

    @pytest.mark.parametrize("n_colors,xbits", [(2, 3), (4, 2), (12, 1), (40, 0)])
    def test_color_indexing(self, n_colors, xbits):
        rng = _rng(51 + n_colors)
        palette = rng.integers(0, 256, size=(n_colors, 4), dtype=np.uint8)
        w, h = 8, 3
        idx = rng.integers(0, n_colors, size=(h, w))
        # palette stream is componentwise delta-coded
        deltas = palette.astype(int)
        deltas[1:] = (palette[1:].astype(int) - palette[:-1]) % 256
        pal_px = _argb_flat(deltas.astype(np.uint8).reshape(1, n_colors, 4))
        # bundle indices into the green channel of the packed image
        packed_w = (w + (1 << xbits) - 1) >> xbits
        idx_bits = 8 >> xbits
        packed = [0] * (packed_w * h)
        for y in range(h):
            for x in range(w):
                sh = (x & ((1 << xbits) - 1)) * idx_bits
                packed[y * packed_w + (x >> xbits)] |= int(idx[y, x]) << (8 + sh)
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.bits(1, 1)
        bw.bits(3, 2)  # COLOR_INDEXING
        bw.bits(n_colors - 1, 8)
        W._emit_pixels(bw, pal_px, n_colors, False, 0)
        bw.bits(0, 1)
        W._emit_pixels(bw, packed, packed_w, False, 0, is_main=True)
        out = self._decode(bw)
        # palette rows are (R,G,B,A); decode returns RGBA
        np.testing.assert_array_equal(out, palette[idx])

    def test_meta_huffman_two_groups(self):
        # left half solid red via group 0, right half solid blue via
        # group 1: meta image 2x1 selects per 4-pixel tile
        w, h, meta_bits = 8, 2, 2
        red = (0xFF << 24) | (0xC8 << 16) | (0x05 << 8) | 0x10
        blue = (0xFF << 24) | (0x11 << 16) | (0x22 << 8) | 0xEE
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.bits(0, 1)  # no transforms
        bw.bits(0, 1)  # no color cache
        bw.bits(1, 1)  # meta-Huffman present
        bw.bits(meta_bits - 2, 3)
        # meta image (2x1): group index = (red << 8) | green
        W._emit_pixels(bw, [0xFF000000, 0xFF000100], 2, False, 0)
        groups = []
        for solid in (red, blue):
            g = W._write_huffman_code(bw, {(solid >> 8) & 0xFF: 1}, 280)
            r = W._write_huffman_code(bw, {(solid >> 16) & 0xFF: 1}, 256)
            b = W._write_huffman_code(bw, {solid & 0xFF: 1}, 256)
            a = W._write_huffman_code(bw, {(solid >> 24) & 0xFF: 1}, 256)
            d_ = W._write_huffman_code(bw, {0: 1}, 40)
            groups.append((g, r, b, a, d_))
        # all five codes are single-symbol (0-bit): the pixel stream
        # itself is empty, the group selection fully determines pixels
        out = self._decode(bw)
        assert out.shape == (2, 8, 4)
        np.testing.assert_array_equal(out[:, :4], np.tile(
            np.array([0xC8, 0x05, 0x10, 0xFF], np.uint8), (2, 4, 1)))
        np.testing.assert_array_equal(out[:, 4:], np.tile(
            np.array([0x11, 0x22, 0xEE, 0xFF], np.uint8), (2, 4, 1)))
