"""Optional libwebp runtime via ctypes (no Python bindings needed).

The reference routes image decode through a codec library
(/root/reference/src/mongo_multimodal.cpp); this module is the same
stance for WebP: when the system ships ``libwebp.so`` (any SONAME
version), lossy "VP8 " payloads decode through it. The pure in-repo
VP8L codec (``ops/webp.py``) remains the default for lossless — it has
no runtime dependency — and this module doubles as the INTEROP ORACLE
for it: tests cross-verify our encoder/decoder against the real
libwebp pixel-for-pixel (COVERAGE.md round-4/5 carried item: "first
environment with a real libwebp producer should check in interop
fixtures" — this container has libwebp.so.7.1.5).

Everything is load-gated: ``available()`` is False when no libwebp is
present, and every entry point raises ``CodecError`` cleanly in that
case, so environments without the library keep the documented
boundary behavior.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

from duckdb_mongo_spark.ops.codecs import CodecError

_LIB = None
_LOAD_TRIED = False


def _load():
    """Locate and bind libwebp once; None when unavailable."""
    global _LIB, _LOAD_TRIED
    if _LOAD_TRIED:
        return _LIB
    _LOAD_TRIED = True
    names = ["libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"]
    found = ctypes.util.find_library("webp")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_rgba(data: bytes) -> np.ndarray:
    """Decode any WebP payload (lossy VP8 or lossless VP8L) to an
    (H, W, 4) uint8 RGBA array through libwebp."""
    lib = _load()
    if lib is None:
        raise CodecError("libwebp runtime not available")
    w, h = ctypes.c_int(), ctypes.c_int()
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise CodecError("libwebp could not decode payload")
    try:
        n = w.value * h.value * 4
        arr = np.frombuffer(
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8 * n)).contents,
            dtype=np.uint8,
        ).reshape(h.value, w.value, 4).copy()
    finally:
        lib.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
    return arr


def _as_rgba_bytes(arr: np.ndarray) -> tuple[bytes, int, int]:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[-1] == 3:
        a = np.concatenate(
            [a, np.full(a.shape[:2] + (1,), 255, dtype=np.uint8)], axis=-1)
    if a.ndim != 3 or a.shape[-1] != 4:
        raise CodecError(f"expected (H,W,{{1,3,4}}) image, got {arr.shape}")
    return np.ascontiguousarray(a).tobytes(), a.shape[1], a.shape[0]


def encode_lossless(arr: np.ndarray) -> bytes:
    """Real-libwebp VP8L encode (the interop producer for our decoder)."""
    lib = _load()
    if lib is None:
        raise CodecError("libwebp runtime not available")
    data, w, h = _as_rgba_bytes(arr)
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(data, w, h, w * 4, ctypes.byref(out))
    if size == 0 or not out:
        raise CodecError("libwebp lossless encode failed")
    try:
        payload = bytes(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * size)).contents)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return payload


def encode_lossy(arr: np.ndarray, quality: float = 80.0) -> bytes:
    """Real-libwebp lossy (VP8) encode — the producer that exercises the
    lossy decode path end-to-end."""
    lib = _load()
    if lib is None:
        raise CodecError("libwebp runtime not available")
    data, w, h = _as_rgba_bytes(arr)
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGBA(data, w, h, w * 4, float(quality),
                              ctypes.byref(out))
    if size == 0 or not out:
        raise CodecError("libwebp lossy encode failed")
    try:
        payload = bytes(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * size)).contents)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return payload
