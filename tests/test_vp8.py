"""Pure-Python VP8 (lossy WebP) decoder tests.

Oracle strategy (the lesson of the r6 VP8L code-length-order bug:
self-round-trips cannot catch table-order mistakes — only real foreign
streams can):

1. committed fixture: real-libwebp lossy encode -> OUR pure decoder ==
   committed expected RGBA pixels.  Runs with NO runtime library.
2. generated ladder: libwebp encodes many shapes/qualities/contents;
   our Y/U/V planes must equal ``WebPDecodeYUV`` byte-for-byte and our
   RGBA must equal ``WebPDecodeRGBA`` (fancy upsampling) byte-for-byte.
3. advanced-encoder variants (full ``WebPEncode`` API): simple loop
   filter, sharpness, segment counts, autofilter — headers the simple
   API never emits.
4. hand-assembled stream (RFC 6386 bool *encoder* below) exercising
   ``mb_no_coeff_skip`` and multiple token partitions — paths this
   libwebp build's encoder never produces — cross-decoded by libwebp
   itself as the oracle.
5. constant tables byte-compared against the system libwebp binary.

This found a real bug during development: ``KF_BMODE_PROBS`` is stored
in libwebp's enum order (B_RD=4, B_VR=5, B_LD=6) while the RFC's enum
has B_LD=4, B_RD=5, B_VR=6 — indexing the table with RFC-numbered
contexts desynced the mode stream on any frame with mixed diagonal
submode contexts (see vp8.py ``_RFC_TO_TABLE_BMODE``).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from duckdb_mongo_spark.ops import vp8, vp8_tables, webp_native
from duckdb_mongo_spark.ops.webp import decode_webp

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "webp")

needs_libwebp = pytest.mark.skipif(
    not webp_native.available(), reason="libwebp runtime not present")


def _vp8_body(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if fourcc == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _riff(vp8_payload: bytes) -> bytes:
    chunk = b"VP8 " + struct.pack("<I", len(vp8_payload)) + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _test_images():
    rng = np.random.default_rng(20260815)
    out = {}
    for (h, w) in [(16, 16), (48, 64), (33, 17), (1, 1), (7, 3), (64, 31),
                   (15, 47), (96, 80)]:
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([128 + 90 * np.sin(xx / 5.0),
                         128 + 90 * np.cos(yy / 7.0),
                         (xx * 3 + yy * 5) % 256], axis=-1)
        base = base + rng.normal(0, 12, base.shape)
        img = np.clip(base, 0, 255).astype(np.uint8)
        out[(h, w)] = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=2)
    return out


class TestCommittedFixture:
    """No-runtime-needed: pure decoder vs committed real-libwebp pixels."""

    def test_lossy_fixture_decodes_bit_exact(self):
        data = open(os.path.join(FIX, "libwebp_lossy_q80.webp"), "rb").read()
        expected = np.load(os.path.join(FIX, "libwebp_lossy_q80.npy"))
        got = vp8.decode_rgba(_vp8_body(data))
        assert got.shape == expected.shape
        assert (got == expected).all()

    def test_decode_webp_routes_lossy_without_runtime(self, monkeypatch):
        monkeypatch.setattr(webp_native, "_LIB", None)
        monkeypatch.setattr(webp_native, "_LOAD_TRIED", True)
        data = open(os.path.join(FIX, "libwebp_lossy_q80.webp"), "rb").read()
        expected = np.load(os.path.join(FIX, "libwebp_lossy_q80.npy"))
        assert (decode_webp(data) == expected).all()


class TestErrors:
    def test_truncated(self):
        with pytest.raises(vp8.VP8Error):
            vp8.parse_frame(b"\x00\x01")

    def test_bad_start_code(self):
        with pytest.raises(vp8.VP8Error, match="start code"):
            vp8.parse_frame(b"\x00\x00\x00" + b"\x9d\x01\x2b" + b"\x00" * 8)

    def test_interframe_rejected(self):
        with pytest.raises(vp8.VP8Error, match="key frame"):
            vp8.parse_frame(b"\x01\x00\x00" + b"\x9d\x01\x2a" + b"\x00" * 8)


@needs_libwebp
class TestTablesMatchLibwebp:
    """Every constant table byte-compared against the system binary."""

    @pytest.fixture(scope="class")
    def blob(self):
        import ctypes.util
        for cand in ("/usr/lib/x86_64-linux-gnu/libwebp.so.7",
                     "/usr/lib/libwebp.so.7",
                     ctypes.util.find_library("webp")):
            if cand and os.path.exists(cand):
                return open(cand, "rb").read()
        pytest.skip("cannot locate libwebp shared object file")

    @pytest.mark.parametrize("name,flat", [
        ("COEFF_PROBS", np.array(vp8_tables.COEFF_PROBS, np.uint8).ravel()),
        ("COEFF_UPDATE_PROBS",
         np.array(vp8_tables.COEFF_UPDATE_PROBS, np.uint8).ravel()),
        ("KF_BMODE_PROBS",
         np.array(vp8_tables.KF_BMODE_PROBS, np.uint8).ravel()),
        ("DC_QLOOKUP", np.array(vp8_tables.DC_QLOOKUP, np.uint8)),
    ])
    def test_u8_table(self, blob, name, flat):
        assert blob.find(flat.tobytes()) >= 0, f"{name} not found verbatim"

    def test_ac_qlookup_u16(self, blob):
        assert blob.find(
            np.array(vp8_tables.AC_QLOOKUP, np.uint16).tobytes()) >= 0


@needs_libwebp
class TestGeneratedLadder:
    @pytest.mark.parametrize("quality", [20, 50, 80, 95])
    def test_yuv_and_rgba_parity(self, quality):
        for (h, w), img in _test_images().items():
            payload = webp_native.encode_lossy(img, quality)
            body = _vp8_body(payload)
            y, u, v = vp8.decode_yuv(body)
            ry, ru, rv = webp_native.decode_yuv(payload)
            assert (y == ry).all(), (h, w, quality, "Y")
            assert (u == ru).all(), (h, w, quality, "U")
            assert (v == rv).all(), (h, w, quality, "V")
            assert (vp8.decode_rgba(body)
                    == webp_native.decode_rgba(payload)).all(), (h, w)

    def test_decode_webp_matches_native_route(self):
        img = _test_images()[(48, 64)]
        payload = webp_native.encode_lossy(img, 75)
        assert (decode_webp(payload)
                == webp_native.decode_rgba(payload)).all()


@needs_libwebp
class TestAdvancedEncoderVariants:
    """Header features the simple encode API never sets."""

    @pytest.fixture(scope="class")
    def img(self):
        rng = np.random.default_rng(5)
        h, w = 80, 112
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([128 + 80 * np.sin(xx / 9.0),
                         128 + 80 * np.cos(yy / 11.0),
                         (xx * 2 + yy * 3) % 256], -1)
        a = np.clip(base + rng.normal(0, 10, (h, w, 3)), 0, 255)
        return np.concatenate(
            [a.astype(np.uint8), np.full((h, w, 1), 255, np.uint8)], axis=2)

    @pytest.mark.parametrize("kw,expect", [
        (dict(filter_type=0, quality=75), {"filter_type": 1}),  # simple LF
        (dict(filter_type=1, quality=75), {"filter_type": 0}),  # normal LF
        (dict(filter_sharpness=5, filter_strength=80, quality=75),
         {"sharpness": 5}),
        (dict(segments=1, quality=75), {"seg_enabled": 0}),
        (dict(autofilter=1, quality=75), {}),
        (dict(sns_strength=0, segments=2, quality=35), {}),
        (dict(method=0, quality=75), {}),
        (dict(method=6, quality=92), {}),
    ])
    def test_variant_parity(self, img, kw, expect):
        payload = webp_native.encode_lossy_advanced(img, **kw)
        body = _vp8_body(payload)
        f = vp8.parse_frame(body)
        for field, val in expect.items():
            assert getattr(f, field) == val, (field, kw)
        y, u, v = vp8.decode_yuv(body)
        ry, ru, rv = webp_native.decode_yuv(payload)
        assert (y == ry).all() and (u == ru).all() and (v == rv).all(), kw


# --------------------------------------------------------------------------
# hand-assembled streams: RFC 6386 section 7.2 boolean encoder
# --------------------------------------------------------------------------


class BoolEncoder:
    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):  # carry
                i = len(self.out) - 1
                while self.out[i] == 255:
                    self.out[i] = 0
                    i -= 1
                self.out[i] += 1
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, value: int, bits: int) -> None:
        for k in reversed(range(bits)):
            self.put(128, (value >> k) & 1)

    def tree(self, tree: tuple, probs, value: int) -> None:
        # encode the path that decodes to `value`
        path = []

        def walk(i):
            for b in (0, 1):
                nxt = tree[i + b]
                if nxt <= 0:
                    if -nxt == value:
                        path.append((i >> 1, b))
                        return True
                elif walk(nxt):
                    path.append((i >> 1, b))
                    return True
            return False

        assert walk(0)
        for pidx, b in reversed(path):
            self.put(probs[pidx], b)

    def finish(self) -> bytes:
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.out)


def _assemble_skip_multipart_frame() -> bytes:
    """A 32x32 key frame (2x2 MBs, 2 token partitions) with
    mb_no_coeff_skip on: MB(0,0) carries one Y2 DC coefficient, the
    other three MBs are skipped.  All MBs DC_PRED/DC_PRED."""
    qi = 4
    e = BoolEncoder()
    e.put(128, 0)  # color space
    e.put(128, 0)  # clamping
    e.put(128, 0)  # segmentation off
    e.put(128, 0)  # filter type (normal; level 0 disables anyway)
    e.literal(0, 6)   # filter level 0
    e.literal(0, 3)   # sharpness
    e.put(128, 0)  # lf delta off
    e.literal(1, 2)   # log2(nparts) = 1 -> 2 token partitions
    e.literal(qi, 7)  # y_ac_qi
    for _ in range(5):
        e.put(128, 0)  # no quant deltas
    e.put(128, 0)  # refresh entropy (no-op for still)
    for i in range(4):          # no coefficient prob updates
        for j in range(8):
            for k in range(3):
                for n in range(11):
                    e.put(vp8_tables.COEFF_UPDATE_PROBS[i][j][k][n], 0)
    e.put(128, 1)        # mb_no_coeff_skip on
    e.literal(200, 8)    # prob_skip_false
    # per-MB records, raster: (skip, ymode, uvmode)
    for skip in (0, 1, 1, 1):
        e.put(200, skip)
        e.tree(vp8._KF_YMODE_TREE, vp8._KF_YMODE_PROB, vp8.DC_PRED)
        e.tree(vp8._UV_MODE_TREE, vp8._KF_UV_MODE_PROB, vp8.DC_PRED)
    part0 = e.finish()

    # token partition for MB row 0: MB(0,0) blocks; MB(1,0) skipped
    probs = vp8_tables.COEFF_PROBS
    t1 = BoolEncoder()
    # Y2 block (type 1, first=0, ctx 0): one DC "+3" then EOB
    p = probs[1][vp8_tables.BANDS[0]][0]
    t1.put(p[0], 1)   # not EOB
    t1.put(p[1], 1)   # nonzero
    t1.put(p[2], 1)   # >1
    t1.put(p[3], 0)   # {2,3,4}
    t1.put(p[4], 1)   # {3,4}
    t1.put(p[5], 0)   # 3
    t1.put(128, 0)    # sign +
    p = probs[1][vp8_tables.BANDS[1]][2]  # next ctx: |v|>1 -> 2
    t1.put(p[0], 0)   # EOB
    # 16 luma blocks (type 0, first=1, luma nz contexts all 0): EOB
    for _ in range(16):
        p = probs[0][vp8_tables.BANDS[1]][0]
        t1.put(p[0], 0)
    # 8 chroma blocks (type 2, first=0): immediate EOB
    for _ in range(8):
        p = probs[2][vp8_tables.BANDS[0]][0]
        t1.put(p[0], 0)
    part1 = t1.finish()
    # token partition for MB row 1: both MBs skipped -> empty
    t2 = BoolEncoder()
    part2 = t2.finish()

    first_part_size = len(part0)
    tag = (first_part_size << 5) | (1 << 4)  # show=1, version=0, key frame
    header = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    header += b"\x9d\x01\x2a"
    header += struct.pack("<HH", 32, 32)
    sizes = struct.pack("<I", len(part1))[:3]
    return header + part0 + sizes + part1 + part2


class TestHandAssembled:
    def test_skip_and_multipartition_decode(self):
        body = _assemble_skip_multipart_frame()
        f = vp8.parse_frame(body)
        assert f.use_skip == 1 and len(f.token_bds) == 2
        y, u, v = vp8.decode_yuv(body)
        assert y.shape == (32, 32) and u.shape == (16, 16)
        # MB(0,0): DC_PRED with no above/left -> 128; Y2 DC token of +3
        # dequantizes to 3*step, the inverse WHT spreads (3*step + 3) >> 3
        # to each subblock DC, and the per-subblock inverse DCT turns a
        # lone DC d into (d + 4) >> 3 on every pixel.
        dc_step = f.dequant[0][2]
        expected = 128 + ((((3 * dc_step + 3) >> 3) + 4) >> 3)
        assert (y[:16, :16] == expected).all()
        # skipped MB(0,1): top MB row has no above, so 16x16 DC_PRED is
        # left-only — (sum of MB(0,0)'s right column + 8) >> 4 — with no
        # residual
        pred = (16 * expected + 8) >> 4
        assert (y[:16, 16:] == pred).all()
        # chroma: all-skip/EOB everywhere -> DC prediction chains from
        # the borders: top-left chroma MB is exactly 128
        assert (u[:8, :8] == 128).all() and (v[:8, :8] == 128).all()

    @needs_libwebp
    def test_libwebp_cross_decodes_identically(self):
        body = _assemble_skip_multipart_frame()
        container = _riff(body)
        ry, ru, rv = webp_native.decode_yuv(container)
        y, u, v = vp8.decode_yuv(body)
        assert (y == ry).all() and (u == ru).all() and (v == rv).all()
        assert (vp8.decode_rgba(body)
                == webp_native.decode_rgba(container)).all()


class TestPureEncoder:
    """In-repo lossy encoder (vp8.encode_rgba / webp.encode_webp_lossy):
    conformance is proven by libwebp decoding every produced stream
    bit-identically to our decoder."""

    def _img(self, h, w, seed=9):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([128 + 80 * np.sin(xx / 9.0),
                         128 + 80 * np.cos(yy / 11.0),
                         (xx * 2 + yy * 3) % 256], -1)
        return np.clip(base + rng.normal(0, 8, (h, w, 3)),
                       0, 255).astype(np.uint8)

    def test_round_trip_psnr_and_monotonic_size(self):
        img = self._img(48, 64)
        sizes, errs = [], []
        for qi in (4, 20, 60, 110):
            payload = vp8.encode_rgba(img, qi)
            out = vp8.decode_rgba(payload)
            assert out.shape == (48, 64, 4)
            mse = float(np.mean((out[..., :3].astype(float) - img) ** 2))
            sizes.append(len(payload))
            errs.append(mse)
        assert sizes == sorted(sizes, reverse=True)  # coarser -> smaller
        assert errs[0] < errs[-1]                    # finer -> closer
        # luma specifically must be near-transparent at fine quant
        y, _, _ = vp8.decode_yuv(vp8.encode_rgba(img, 4))
        ys, _, _ = vp8._rgb_to_yuv420(img)
        assert float(np.mean((y.astype(float) - ys) ** 2)) < 2.5  # >= ~44 dB

    def test_flat_image_is_exact_and_tiny(self):
        flat = np.full((32, 32, 3), 128, np.uint8)
        payload = vp8.encode_rgba(flat, 60)
        assert len(payload) < 40  # all macroblocks skip
        assert (vp8.decode_rgba(payload)[..., :3] == 128).all()

    def test_container_round_trip(self):
        from duckdb_mongo_spark.ops.webp import encode_webp_lossy
        img = self._img(33, 17)
        blob = encode_webp_lossy(img, 12)
        out = decode_webp(blob)
        assert out.shape == (33, 17, 4)
        mse = float(np.mean((out[..., :3].astype(float) - img) ** 2))
        assert mse < 150  # lossy but sane at fine quant

    def test_qi_validation(self):
        img = self._img(16, 16)
        with pytest.raises(vp8.VP8Error):
            vp8.encode_rgba(img, -1)
        with pytest.raises(vp8.VP8Error):
            vp8.encode_rgba(img, 128)

    @needs_libwebp
    def test_libwebp_decodes_every_stream_identically(self):
        for (h, w) in [(16, 16), (48, 64), (33, 17), (1, 1), (128, 96)]:
            img = self._img(h, w)
            for qi in (4, 30, 90):
                payload = vp8.encode_rgba(img, qi)
                mine = vp8.decode_rgba(payload)
                ref = webp_native.decode_rgba(_riff(payload))
                assert (mine == ref).all(), (h, w, qi)
                y, u, v = vp8.decode_yuv(payload)
                ry, ru, rv = webp_native.decode_yuv(_riff(payload))
                assert (y == ry).all() and (u == ru).all() and (v == rv).all()
