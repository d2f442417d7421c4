"""Real-libwebp interop for the in-repo WebP codecs (COVERAGE.md carried
item, closed in r6: this container ships libwebp.so.7.1.5).

Three directions, all pixel-exact:

1. committed fixture (REAL libwebp lossless encode) -> OUR pure VP8L
   decoder == committed expected pixels — runs with NO runtime library,
   so the interop evidence survives into library-free environments;
2. OUR VP8L encoder -> real libwebp decode (bit-exact round trip);
3. real libwebp lossy (VP8) encode -> decode_webp routes through the
   ctypes runtime == libwebp's own pixels.

Direction 1 is the test that caught a real spec bug: rounds 1-5 had
VP8L's code-length-code order wrong (symbol 16 last instead of at index
8) — invisible to every self-round-trip, fatal against a real stream.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from duckdb_mongo_spark.ops import webp_native
from duckdb_mongo_spark.ops.webp import decode_webp, encode_webp_lossless

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "webp")


def _fix(name: str) -> str:
    return os.path.join(FIX, name)


class TestCommittedFixtures:
    """No-runtime-needed checks against committed real-libwebp output."""

    def test_pure_decoder_matches_real_libwebp_lossless(self):
        data = open(_fix("libwebp_lossless.webp"), "rb").read()
        expected = np.load(_fix("libwebp_lossless.npy"))
        got = decode_webp(data)
        assert got.shape == expected.shape
        assert (got == expected).all()

    def test_lossless_fixture_equals_source(self):
        # lossless means the committed stream must decode to the exact
        # source image, not merely to what libwebp decodes
        src = np.load(_fix("source.npy"))
        assert (np.load(_fix("libwebp_lossless.npy")) == src).all()


needs_libwebp = pytest.mark.skipif(
    not webp_native.available(), reason="libwebp runtime not present")


class TestLiveInterop:
    @needs_libwebp
    def test_libwebp_decodes_our_encoder_bit_exact(self):
        src = np.load(_fix("source.npy"))
        encoded = encode_webp_lossless(src)
        got = webp_native.decode_rgba(encoded)
        assert (got == src).all()

    @needs_libwebp
    def test_our_decoder_on_fresh_libwebp_streams(self):
        rng = np.random.default_rng(7)
        for shape in ((1, 1, 4), (3, 5, 4), (17, 9, 4), (32, 32, 4)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            img[..., 3] = 255
            stream = webp_native.encode_lossless(img)
            assert (decode_webp(stream) == img).all(), shape

    @needs_libwebp
    def test_lossy_route_matches_libwebp_pixels(self):
        data = open(_fix("libwebp_lossy_q80.webp"), "rb").read()
        expected = np.load(_fix("libwebp_lossy_q80.npy"))
        got = decode_webp(data)  # routed through the ctypes runtime
        assert (got == expected).all()

    @needs_libwebp
    def test_lossy_is_close_to_source(self):
        # sanity: q80 lossy of the smooth regions stays near the source
        src = np.load(_fix("source.npy"))
        dec = decode_webp(open(_fix("libwebp_lossy_q80.webp"), "rb").read())
        smooth = slice(0, 10), slice(0, 10)  # gradient corner, no noise
        err = np.abs(dec[smooth][..., :3].astype(int)
                     - src[smooth][..., :3].astype(int))
        assert err.mean() < 12.0

    @needs_libwebp
    def test_fresh_lossy_encode_roundtrip_shape(self):
        img = np.zeros((24, 40, 4), dtype=np.uint8)
        img[..., 1] = 128
        img[..., 3] = 255
        stream = webp_native.encode_lossy(img, quality=90)
        out = decode_webp(stream)
        assert out.shape == (24, 40, 4)
        assert abs(int(out[..., 1].mean()) - 128) < 8
