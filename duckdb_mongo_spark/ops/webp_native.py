"""Optional libwebp runtime via ctypes (no Python bindings needed).

NEW surface — the reference has no image handling at all (BSON Binary
maps to an opaque BLOB,
/root/reference/src/schema/mongo_schema_inference_internal.hpp:41-42).
This module adds an optional real-codec path for WebP: when the system ships ``libwebp.so`` (any SONAME
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
            lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeYUV.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
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


def decode_yuv(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a WebP payload to its raw (Y, U, V) planes through libwebp
    (``WebPDecodeYUV``).  This is the plane-level oracle for the pure
    in-repo VP8 decoder (``ops/vp8.py``): comparing Y/U/V directly
    isolates the prediction/transform/loop-filter reconstruction from
    the chroma upsampler and YUV->RGB conversion."""
    lib = _load()
    if lib is None:
        raise CodecError("libwebp runtime not available")
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    buf = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(up), ctypes.byref(vp),
                            ctypes.byref(stride), ctypes.byref(uv_stride))
    if not buf:
        raise CodecError("libwebp could not decode payload to YUV")
    try:
        W, H = w.value, h.value
        cw, ch = (W + 1) // 2, (H + 1) // 2

        def plane(ptr, rows, cols, row_stride):
            n = rows * row_stride
            flat = np.frombuffer(
                ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * n)).contents,
                dtype=np.uint8)
            return flat.reshape(rows, row_stride)[:, :cols].copy()

        y = plane(buf, H, W, stride.value)
        u = plane(up, ch, cw, uv_stride.value)
        v = plane(vp, ch, cw, uv_stride.value)
    finally:
        lib.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
    return y, u, v


# --------------------------------------------------------------------------
# advanced encoder (WebPConfig/WebPPicture/WebPEncode) — used by the VP8
# decoder tests to produce streams the simple API never emits: simple
# (filter_type=1) loop filter, multiple token partitions, sharpness,
# autofilter, segment counts.
# --------------------------------------------------------------------------


class _WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t),
                ("max_size", ctypes.c_size_t),
                ("pad", ctypes.c_uint32 * 1)]


class _WebPPicture(ctypes.Structure):
    # libwebp 1.x encode.h layout
    _fields_ = [
        ("use_argb", ctypes.c_int),
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p),
        ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p),
        ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p),
        ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


class _WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


_ENC_ABI = None


def _enc_abi(lib) -> int | None:
    """The encoder ABI version gate of WebPConfigInitInternal; probed
    once since it varies by libwebp release."""
    global _ENC_ABI
    if _ENC_ABI is not None:
        return _ENC_ABI
    lib.WebPConfigInitInternal.restype = ctypes.c_int
    lib.WebPConfigInitInternal.argtypes = [
        ctypes.POINTER(_WebPConfig), ctypes.c_int, ctypes.c_float,
        ctypes.c_int]
    for ver in range(0x0200, 0x0230):
        cfg = _WebPConfig()
        if lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, 75.0, ver):
            _ENC_ABI = ver
            return ver
    return None


def encode_lossy_advanced(arr: np.ndarray, quality: float = 80.0, *,
                          filter_type: int | None = None,
                          filter_strength: int | None = None,
                          filter_sharpness: int | None = None,
                          autofilter: int | None = None,
                          partitions: int | None = None,
                          segments: int | None = None,
                          method: int | None = None,
                          sns_strength: int | None = None) -> bytes:
    """Lossy encode through the full WebPEncode API so tests can force
    header features (simple filter, token partitions, sharpness, segment
    counts) that ``WebPEncodeRGBA`` never produces."""
    lib = _load()
    if lib is None:
        raise CodecError("libwebp runtime not available")
    abi = _enc_abi(lib)
    if abi is None:
        raise CodecError("could not negotiate libwebp encoder ABI")
    cfg = _WebPConfig()
    if not lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, float(quality),
                                      abi):
        raise CodecError("WebPConfigInit failed")
    for name, val in (("filter_type", filter_type),
                      ("filter_strength", filter_strength),
                      ("filter_sharpness", filter_sharpness),
                      ("autofilter", autofilter),
                      ("partitions", partitions),
                      ("segments", segments),
                      ("method", method),
                      ("sns_strength", sns_strength)):
        if val is not None:
            setattr(cfg, name, int(val))
    lib.WebPValidateConfig.restype = ctypes.c_int
    lib.WebPValidateConfig.argtypes = [ctypes.POINTER(_WebPConfig)]
    if not lib.WebPValidateConfig(ctypes.byref(cfg)):
        raise CodecError("invalid WebPConfig")

    data, w, h = _as_rgba_bytes(arr)
    lib.WebPPictureInitInternal.restype = ctypes.c_int
    lib.WebPPictureInitInternal.argtypes = [ctypes.POINTER(_WebPPicture),
                                            ctypes.c_int]
    pic = _WebPPicture()
    if not lib.WebPPictureInitInternal(ctypes.byref(pic), abi):
        raise CodecError("WebPPictureInit failed")
    pic.width, pic.height = w, h
    pic.use_argb = 0  # encode path converts to YUV as the simple API does
    lib.WebPPictureImportRGBA.restype = ctypes.c_int
    lib.WebPPictureImportRGBA.argtypes = [ctypes.POINTER(_WebPPicture),
                                          ctypes.c_char_p, ctypes.c_int]
    if not lib.WebPPictureImportRGBA(ctypes.byref(pic), data, w * 4):
        raise CodecError("WebPPictureImportRGBA failed")

    wr = _WebPMemoryWriter()
    lib.WebPMemoryWriterInit.restype = None
    lib.WebPMemoryWriterInit.argtypes = [ctypes.POINTER(_WebPMemoryWriter)]
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)

    lib.WebPEncode.restype = ctypes.c_int
    lib.WebPEncode.argtypes = [ctypes.POINTER(_WebPConfig),
                               ctypes.POINTER(_WebPPicture)]
    try:
        if not lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic)):
            raise CodecError(f"WebPEncode failed (error {pic.error_code})")
        payload = bytes(ctypes.cast(
            wr.mem, ctypes.POINTER(ctypes.c_uint8 * wr.size)).contents)
    finally:
        lib.WebPPictureFree(ctypes.byref(pic))
        lib.WebPMemoryWriterClear.restype = None
        lib.WebPMemoryWriterClear.argtypes = [
            ctypes.POINTER(_WebPMemoryWriter)]
        lib.WebPMemoryWriterClear(ctypes.byref(wr))
    return payload
