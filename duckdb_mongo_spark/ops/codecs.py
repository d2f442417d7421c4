"""Pure-stdlib + numpy media codecs: PNG, uncompressed BMP, GIF, PCM
WAV, JPEG (baseline + progressive).

Closes the "pixel decode needs a codec library" gap for the formats
whose decompression is implementable without one: PNG's only compression
is zlib (stdlib ``zlib``), BMP's common on-disk layout is uncompressed,
WAV PCM is raw samples, GIF's LZW is a ~50-line table decoder specified
in full by GIF89a appendix F, and JPEG is Huffman coding + an 8x8 IDCT
(ITU-T T.81, a public spec) — implemented here as one coefficient-store
decoder covering baseline sequential AND progressive (spectral selection,
successive approximation with DC/AC refinement and EOB runs), stream-read
Huffman/quant tables, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers.
Lossless WebP (VP8L: Huffman + LZ77 + color cache + the four transforms,
RFC 9649) decodes for real in ``ops/webp.py``; LOSSY WebP (VP8) routes
through the optional libwebp runtime (``ops/webp_native.py``, ctypes,
the reference's codec-library stance) and stays a documented
CodecError boundary only where no library is installed
(``multimodal.parse_image_header`` always reads its header metadata).

Everything here reads/writes public file-format structure only (PNG
RFC 2083 / ISO 15948, the Windows BMP DIB layout, the RIFF/WAVE spec,
the GIF89a specification).

Decoder scope (documented, validated):

- PNG: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA), non-interlaced. All five scanline filters.
- BMP: BITMAPINFOHEADER, 24/32-bit uncompressed (BI_RGB), bottom-up or
  top-down.
- GIF: first frame, GIF87a/89a, global/local palette, interlace,
  transparency (→ RGBA). LZW decode is a per-code Python loop — fine
  for thumbnail-scale frames inside mapInPandas batches; route bulk
  video/animation decode to a codec-library runtime.
- WAV: integer PCM 8/16/32-bit, any channel count.

The encoder emits filter-0 scanlines, so PNGs produced by
``encode_png`` decode through the vectorized fast path (row-at-a-time
numpy, no per-byte Python loop).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class CodecError(ValueError):
    """Payload is not decodable by the in-repo codec (unsupported
    variant or malformed stream)."""


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array -> PNG bytes. (H,W) -> grayscale, (H,W,2) -> gray+alpha,
    (H,W,3) -> RGB, (H,W,4) -> RGBA. Filter 0 on every scanline."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise CodecError(f"unsupported array shape {arr.shape!r}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to each row
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), compress_level))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_scanlines(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (height, stride) uint8.

    Filter-0/2-only streams (our encoder's output, and common for
    screenshots) take a fully vectorized path; Sub/Average/Paeth rows
    fall back to a per-byte loop (correctness over speed — large-scale
    decode belongs on a real codec; this keeps small/medium payloads
    honest)."""
    if len(raw) < height * (stride + 1):
        raise CodecError("truncated PNG pixel stream")
    mat = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    filters = mat[:, 0]
    data = mat[:, 1:]
    if np.all(filters == 0):
        return data.copy()
    out = np.zeros((height, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(filters[y])
        line = data[y].copy()
        prev = out[y - 1] if y > 0 else zero_row
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up: uint8 addition wraps mod 256 natively
            out[y] = line + prev
        elif ft == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
            out[y] = line
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = line
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
            out[y] = line
        else:
            raise CodecError(f"unknown PNG filter type {ft}")
    return out


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W,C); palette images expand to RGB.
    Raises CodecError outside the supported subset (see module doc)."""
    if len(b) < 8 or b[:8] != _PNG_MAGIC:
        raise CodecError("not a PNG")
    i, n = 8, len(b)
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    trns = None
    while i + 8 <= n:
        (length,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length  # len + tag + body + crc
    if width is None:
        raise CodecError("missing IHDR")
    if bit_depth != 8:
        raise CodecError(f"unsupported bit depth {bit_depth}")
    if interlace != 0:
        raise CodecError("interlaced PNG unsupported")
    if color_type not in _PNG_CHANNELS:
        raise CodecError(f"unsupported color type {color_type}")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # noqa: F841
        raise CodecError("corrupt IDAT stream") from None
    mat = _unfilter_scanlines(raw, height, stride, channels)
    arr = mat.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise CodecError("palette image without PLTE")
        idx = arr[:, :, 0]
        if idx.max(initial=0) >= len(palette):
            raise CodecError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(idx.shape, 255, dtype=np.uint8)
            lim = min(len(trns), len(palette))
            mask = idx < lim
            alpha[mask] = trns[idx[mask]]
            return np.dstack([rgb, alpha])
        return rgb
    return arr


# --------------------------------------------------------------------------
# BMP (uncompressed BI_RGB, BITMAPINFOHEADER)
# --------------------------------------------------------------------------


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP bytes -> uint8 RGB/RGBA array (H,W,3|4). 24/32-bit
    uncompressed only."""
    if len(b) < 54 or b[:2] != b"BM":
        raise CodecError("not a BMP")
    (data_offset,) = struct.unpack("<I", b[10:14])
    (dib,) = struct.unpack("<I", b[14:18])
    if dib < 40:
        raise CodecError("BITMAPCOREHEADER unsupported for pixel decode")
    width, height_raw = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise CodecError(f"unsupported BMP: bpp={bpp} compression={compression}")
    height = abs(height_raw)
    bottom_up = height_raw > 0
    nbytes = bpp // 8
    row_stride = (width * nbytes + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + row_stride * height
    if len(b) < need:
        raise CodecError("truncated BMP pixel data")
    rows = np.frombuffer(b, dtype=np.uint8, count=row_stride * height, offset=data_offset)
    rows = rows.reshape(height, row_stride)[:, : width * nbytes].reshape(
        height, width, nbytes
    )
    if bottom_up:
        rows = rows[::-1]
    if nbytes == 3:  # BGR -> RGB
        return rows[:, :, ::-1].copy()
    # BGRA -> RGBA
    return rows[:, :, [2, 1, 0, 3]].copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H,W,3) RGB array -> 24-bit bottom-up BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise CodecError(f"encode_bmp wants (H,W,3), got {arr.shape!r}")
    h, w, _ = a.shape
    row_stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    pixel_bytes = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40)
    return header + dib + pixel_bytes


# --------------------------------------------------------------------------
# WAV (integer PCM)
# --------------------------------------------------------------------------

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples (n, channels) in [-1, 1], rate).
    Integer PCM 8/16/32-bit; 8-bit WAV is unsigned per spec."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise CodecError("not a WAV")
    channels = rate = bits = audio_fmt = None
    data = None
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if data is None or not channels or not rate:
        raise CodecError("missing fmt/data chunk")
    if audio_fmt != 1 or bits not in _PCM_DTYPES:
        raise CodecError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
    dt = _PCM_DTYPES[bits]
    samples = np.frombuffer(data, dtype=dt)
    samples = samples[: (len(samples) // channels) * channels].reshape(-1, channels)
    if bits == 8:
        out = (samples.astype(np.float32) - 128.0) / 128.0
    else:
        out = samples.astype(np.float32) / float(2 ** (bits - 1))
    return out, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float array in [-1,1] (n,) or (n, channels) -> 16-bit PCM WAV."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    channels = a.shape[1]
    body = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# --------------------------------------------------------------------------
# Array transforms (shared by resize / feature ops)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# JPEG (baseline DCT, ITU-T T.81 / ISO 10918-1)
# --------------------------------------------------------------------------
#
# Decoder: baseline sequential (SOF0; SOF1 accepted — same scan layout),
# 8-bit precision, grayscale or 3-component YCbCr, arbitrary 1-2 sampling
# factors (4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn), Huffman
# tables read from the stream's own DHT segments (so ANY spec-conformant
# baseline file decodes — the decoder carries no table assumptions).
# Progressive (SOF2) and arithmetic coding raise CodecError. Encoder:
# 4:4:4 or grayscale, Annex-K-style quant tables scaled by quality, the
# standard Huffman tables. T.81 is a public ITU/ISO specification.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32, dtype=np.int64)

# Standard Huffman table specs (T.81 Annex K): (bits[1..16], huffval)
_DC_LUM_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """M[u, x] = alpha(u)/2 * cos((2x+1) u pi / 16): forward DCT is
    M @ f @ M.T, inverse is M.T @ F @ M (T.81 A.3.3)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _huff_canonical_codes(bits: list[int], vals: list[int]):
    """Canonical Huffman code assignment (T.81 C.2): yields
    (symbol, code, length) in spec order."""
    if len(bits) != 16 or sum(bits) != len(vals):
        raise CodecError("malformed Huffman table spec")
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            yield vals[k], code, length
            code += 1
            k += 1
        code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any non-RST marker. RSTn markers reset the
    bit buffer (the caller resets DC predictors)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None  # set when a non-RST marker terminates the scan

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8  # pad past EOF with zeros (conformant streams
                self.marker = self.marker or 0xD9  # end before this matters)
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn: handled by expect_rst
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFF
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v

    def restart(self):
        """Skip to just past the next RSTn marker, discarding pad bits."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise CodecError("missing restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1: map the s received magnitude bits to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise CodecError("invalid Huffman code in scan")


def decode_jpeg(b: bytes) -> np.ndarray:
    """JPEG -> uint8 (H,W) grayscale or (H,W,3) RGB array.

    Baseline sequential (SOF0/SOF1) and progressive (SOF2, spectral
    selection + successive approximation, DC and AC first/refinement
    scans with EOB runs). Both run through one coefficient-store model:
    every SOS scan deposits (partial) quantized coefficients per block;
    reconstruction dequantizes + IDCTs once at the end (baseline is the
    special case of a single full-spectrum interleaved scan)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    saw_scan = False
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise CodecError("bad marker alignment")
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker are legal padding
        if pos + 2 > len(b):
            break
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # no-length markers
        if pos + 2 > len(b):
            raise CodecError("truncated segment header")
        seglen = struct.unpack(">H", b[pos:pos + 2])[0]
        seg = b[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                huff[(tc, th)] = {
                    (length, code): sym
                    for sym, code, length in _huff_canonical_codes(bits, vals)
                }
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise CodecError("multiple SOF segments")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise CodecError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise CodecError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = _init_frame(h, w, comps, progressive=(marker == 0xC2))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise CodecError(
                "only baseline sequential and Huffman progressive JPEG "
                "are supported (lossless/arithmetic variants are not)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise CodecError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs), None)
                if comp is None:
                    raise CodecError("SOS names an unknown component")
                scan_comps.append((comp, tt >> 4, tt & 0x0F))
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_scan(
                b, pos + seglen, frame, huff, scan_comps, ss, se, ah, al,
                restart_interval,
            )
            saw_scan = True
            continue
        pos += seglen
    if not saw_scan:
        raise CodecError("no SOS segment found")
    return _reconstruct(frame, qt)


def _init_frame(h, w, comps, progressive):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise CodecError("unsupported sampling factors")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]   # MCU-grid block dims
        c["bh"] = mcus_y * c["v"]
        # non-interleaved scans cover only the component's OWN block grid
        # (ceil(sample dims / 8)), not the MCU-padded grid
        c["bw_scan"] = (-(-w * c["h"] // hmax) + 7) // 8
        c["bh_scan"] = (-(-h * c["v"] // vmax) + 7) // 8
        # coefficients stored in ZIGZAG index space (spectral bands are
        # contiguous), one int32 row per block of the MCU grid
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
    return {"h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
            "mcus_x": mcus_x, "mcus_y": mcus_y, "progressive": progressive}


def _next_marker(b: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips entropy
    pad bytes and stuffed FF00s)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF and b[pos + 1] not in (0x00,):
            return pos
        pos += 1
    return n


def _decode_scan(b, pos, frame, huff, scan_comps, ss, se, ah, al, ri):
    interleaved = len(scan_comps) > 1
    if ss > se or se > 63:
        raise CodecError("invalid spectral range in SOS")
    if frame["progressive"]:
        # T.81: progressive scans are DC-only (Ss=Se=0) or an AC band
        # (Ss >= 1); AC scans are single-component
        if ss == 0 and se != 0:
            raise CodecError("invalid progressive scan: Ss=0 requires Se=0")
        if interleaved and ss != 0:
            raise CodecError("progressive AC scans must be single-component")
    for comp, td, ta in scan_comps:
        comp["pred"] = 0
        needs_dc = ss == 0
        needs_ac = se > 0
        if needs_dc and ah == 0 and (0, td) not in huff:
            raise CodecError("missing DC Huffman table")
        if needs_ac and (1, ta) not in huff:
            raise CodecError("missing AC Huffman table")
        comp["dc"] = huff.get((0, td))
        comp["ac"] = huff.get((1, ta))
    r = _BitReader(b, pos)
    eobrun = [0]
    unit_i = 0  # restart-interval unit counter (MCUs, or blocks when
    # non-interleaved)

    def _maybe_restart():
        nonlocal unit_i
        if ri and unit_i and unit_i % ri == 0:
            r.restart()
            eobrun[0] = 0
            for comp, _, _ in scan_comps:
                comp["pred"] = 0
        unit_i += 1

    if interleaved:
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                _maybe_restart()
                for comp, _, _ in scan_comps:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            bi = (my * comp["v"] + by) * comp["bw"] \
                                + mx * comp["h"] + bx
                            _block_scan(r, comp, comp["coef"][bi],
                                        ss, se, ah, al, eobrun)
    else:
        comp, _, _ = scan_comps[0]
        for by in range(comp["bh_scan"]):
            for bx in range(comp["bw_scan"]):
                _maybe_restart()
                bi = by * comp["bw"] + bx
                _block_scan(r, comp, comp["coef"][bi], ss, se, ah, al, eobrun)
    # resume segment parsing at the next marker after the entropy data
    return _next_marker(b, r.pos)


def _block_scan(r, comp, cz, ss, se, ah, al, eobrun):
    """Decode one block's contribution for the current scan into its
    zigzag-order coefficient row ``cz``."""
    if ss == 0:
        if ah == 0:
            s = _decode_huff_symbol(r, comp["dc"])
            diff = _extend(r.receive(s), s) if s else 0
            comp["pred"] += diff
            cz[0] = comp["pred"] << al
        else:
            # DC refinement: one bit, appended below the approximation
            if r.bit():
                cz[0] = int(cz[0]) | (1 << al)
        if se == 0:
            return
    k = max(ss, 1)
    if ah == 0:
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        while k <= se:
            rs = _decode_huff_symbol(r, comp["ac"])
            run, s = rs >> 4, rs & 0x0F
            if s == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                # EOBn: run of (1<<run)+receive(run) blocks ends here,
                # THIS block included
                eobrun[0] = (1 << run) - 1 + r.receive(run)
                break
            k += run
            if k > se:
                raise CodecError("AC coefficient index out of range")
            cz[k] = _extend(r.receive(s), s) << al
            k += 1
    else:
        _ac_refine_block(r, comp["ac"], cz, k, se, al, eobrun)


def _ac_refine_block(r, ac_table, cz, ss, se, al, eobrun):
    """AC successive-approximation refinement (T.81 G.1.2.3 via the
    well-known libjpeg control flow): newly-nonzero coefficients arrive
    as run/1 symbols, already-nonzero ones receive correction bits."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _decode_huff_symbol(r, ac_table)
            run, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise CodecError("AC refinement size must be 1")
                val = p1 if r.bit() else m1
            else:
                if run < 15:
                    eobrun[0] = (1 << run) + (r.receive(run) if run else 0)
                    break
                # run == 15: skip 16 zero-history coefficients
            while k <= se:
                c = int(cz[k])
                if c != 0:
                    if r.bit() and (c & p1) == 0:
                        cz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                cz[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            c = int(cz[k])
            if c != 0:
                if r.bit() and (c & p1) == 0:
                    cz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def _reconstruct(frame, qt):
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise CodecError("missing quantization table")
        qz = qt[c["tq"]].astype(np.int64)  # zigzag order, as stored in DQT
        nat = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        nat[:, _ZIGZAG] = c["coef"].astype(np.int64) * qz[None, :]
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("xu,nuv,vy->nxy", _DCT_M.T, blocks, _DCT_M) + 128.0
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = planes[0]
    else:
        y, cb, cr = planes
        out = np.stack([
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scale mapping (also in the IJG docs)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 (H,W) grayscale or (H,W,3) RGB -> JPEG (standard tables
    scaled by ``quality``). ``subsampling``: "444" or "420" (chroma
    box-averaged 2x2; grayscale ignores it). ``restart_interval`` > 0
    emits DRI + RSTn every N MCUs (baseline only). ``progressive``
    emits SOF2 with spectral selection (DC scan, then per-component AC
    bands 1-5 and 6-63) plus DC successive approximation (Al=1 first
    scan + refinement) — the same quantized coefficients as baseline, so
    both modes decode to IDENTICAL pixels."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3) or (
        a.ndim == 3 and a.shape[2] != 3
    ):
        raise CodecError("encode_jpeg expects uint8 (H,W) or (H,W,3)")
    if subsampling not in ("444", "420"):
        raise CodecError("subsampling must be '444' or '420'")
    if progressive and restart_interval:
        raise CodecError("restart_interval is supported for baseline only")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise CodecError("empty image")
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
        qids = [0]
    else:
        f = a.astype(np.float64)
        r_, g_, b_ = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0,
            0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0,
        ]
        qids = [0, 1, 1]
    qtabs = {0: _quality_scale(_Q_LUM, quality)}
    if len(planes) == 3:
        qtabs[1] = _quality_scale(_Q_CHROMA, quality)
    enc_dc = [dict() for _ in range(2)]
    enc_ac = [dict() for _ in range(2)]
    for tid, spec in ((0, _DC_LUM_SPEC), (1, _DC_CHROMA_SPEC)):
        for sym, code, length in _huff_canonical_codes(*spec):
            enc_dc[tid][sym] = (code, length)
    for tid, spec in ((0, _AC_LUM_SPEC), (1, _AC_CHROMA_SPEC)):
        for sym, code, length in _huff_canonical_codes(*spec):
            enc_ac[tid][sym] = (code, length)

    nc = len(planes)
    if nc == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # header segments
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, tbl in qtabs.items():
        # qtabs are NATURAL order; DQT stream order is zigzag
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + \
            bytes(int(tbl[z]) for z in _ZIGZAG)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    for tc, specs in ((0, (_DC_LUM_SPEC, _DC_CHROMA_SPEC)),
                      (1, (_AC_LUM_SPEC, _AC_CHROMA_SPEC))):
        for th in range(2 if nc == 3 else 1):
            bits, vals = specs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + \
                bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if not progressive:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
        for ci in range(nc):
            out += bytes([ci + 1, 0x00 if qids[ci] == 0 else 0x11])
        out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    # component planes: box-average subsampled chroma, pad to MCU grid
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for ci, p in enumerate(planes):
        hc, vc = samp[ci]
        fh, fv = hmax // hc, vmax // vc
        if fh > 1 or fv > 1:
            eh, ew = -(-h // fv) * fv, -(-w // fh) * fh
            pp = np.pad(p, ((0, eh - h), (0, ew - w)), mode="edge")
            p = pp.reshape(eh // fv, fv, ew // fh, fh).mean(axis=(1, 3))
        th_, tw_ = mcus_y * vc * 8, mcus_x * hc * 8
        padded.append(np.pad(
            p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])), mode="edge"
        ))

    # vectorized forward DCT + quantization: per component, one
    # (nblocks, 64) array of zigzag-ordered quantized coefficients in
    # MCU-grid raster order (bi = by * bw + bx — the decoder's indexing)
    coefs = []
    bdims = []
    for ci in range(nc):
        pp = padded[ci]
        bh, bw = pp.shape[0] // 8, pp.shape[1] // 8
        blocks = (
            pp.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
        q = qtabs[qids[ci]].reshape(8, 8).astype(np.float64)
        qc = np.round(coef / q[None]).astype(np.int64)
        coefs.append(qc.reshape(-1, 64)[:, _ZIGZAG])
        bdims.append((bh, bw))

    def bi_of(ci, my, mx, by, bx):
        hc, vc = samp[ci]
        return (my * vc + by) * bdims[ci][1] + mx * hc + bx

    if not progressive:
        wtr = _BitWriter()
        preds = [0] * nc
        mcu_i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    wtr.flush()
                    out_rst = 0xD0 + ((mcu_i // restart_interval - 1) % 8)
                    wtr.out += bytes([0xFF, out_rst])
                    preds = [0] * nc
                mcu_i += 1
                for ci in range(nc):
                    hc, vc = samp[ci]
                    tsel = 0 if qids[ci] == 0 else 1
                    for by in range(vc):
                        for bx in range(hc):
                            zz = coefs[ci][bi_of(ci, my, mx, by, bx)]
                            _encode_block(
                                wtr, zz, preds, ci, enc_dc[tsel], enc_ac[tsel]
                            )
        wtr.flush()
        out += wtr.out
        out += b"\xff\xd9"
        return bytes(out)

    # ---- progressive emission ----
    def sos_header(entries, ss, se, ah, al):
        seg = bytes([len(entries)])
        for cid, tt in entries:
            seg += bytes([cid, tt])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    def mcu_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(nc):
                    hc, vc = samp[ci]
                    for by in range(vc):
                        for bx in range(hc):
                            yield ci, bi_of(ci, my, mx, by, bx)

    dc_al = 1
    # scan 1: DC first (interleaved), point-transformed by dc_al
    out += sos_header(
        [(ci + 1, (0 if qids[ci] == 0 else 1) << 4) for ci in range(nc)],
        0, 0, 0, dc_al,
    )
    wtr = _BitWriter()
    preds = [0] * nc
    for ci, bi in mcu_blocks():
        tsel = 0 if qids[ci] == 0 else 1
        v = int(coefs[ci][bi][0]) >> dc_al  # arithmetic shift per T.81
        diff = v - preds[ci]
        preds[ci] = v
        s = _bit_size(diff)
        code, length = enc_dc[tsel][s]
        wtr.write(code, length)
        if s:
            wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out
    # scan 2: DC refinement — the next lower bit, no Huffman coding
    out += sos_header([(ci + 1, 0x00) for ci in range(nc)], 0, 0, dc_al, 0)
    wtr = _BitWriter()
    for ci, bi in mcu_blocks():
        wtr.write(int(coefs[ci][bi][0]) & 1, 1)
    wtr.flush()
    out += wtr.out
    # scans 3+: per-component AC spectral bands (Al=0, per-block EOB —
    # the standard tables carry no EOBn>0 codes)
    for ci in range(nc):
        hc, vc = samp[ci]
        bw_scan = (-(-w * hc // hmax) + 7) // 8
        bh_scan = (-(-h * vc // vmax) + 7) // 8
        tsel = 0 if qids[ci] == 0 else 1
        for ss_b, se_b in ((1, 5), (6, 63)):
            out += sos_header([(ci + 1, tsel)], ss_b, se_b, 0, 0)
            wtr = _BitWriter()
            for by in range(bh_scan):
                for bx in range(bw_scan):
                    zz = coefs[ci][by * bdims[ci][1] + bx]
                    _encode_ac_band(wtr, zz, ss_b, se_b, enc_ac[tsel])
            wtr.flush()
            out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_ac_band(wtr, zz, ss, se, ac_tab):
    """One block's AC coefficients for the band [ss, se]: run/size
    symbols with ZRL, trailing EOB when the band tail is zero."""
    last = ss - 1
    for k in range(se, ss - 1, -1):
        if zz[k]:
            last = k
            break
    run = 0
    for k in range(ss, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]
            wtr.write(code, length)
            run -= 16
        s = _bit_size(v)
        code, length = ac_tab[(run << 4) | s]
        wtr.write(code, length)
        wtr.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < se:
        code, length = ac_tab[0x00]
        wtr.write(code, length)


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(wtr, zz, preds, ci, dc_tab, ac_tab):
    diff = int(zz[0]) - preds[ci]
    preds[ci] = int(zz[0])
    s = _bit_size(diff)
    code, length = dc_tab[s]
    wtr.write(code, length)
    if s:
        wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        s = _bit_size(v)
        code, length = ac_tab[(run << 4) | s]
        wtr.write(code, length)
        wtr.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        wtr.write(code, length)


# --------------------------------------------------------------------------
# GIF (GIF87a/GIF89a, first frame)
# --------------------------------------------------------------------------

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Variable-width LZW per the GIF89a spec appendix: codes grow from
    min_code_size+1 up to 12 bits; CLEAR resets the table, END stops.
    Output is the palette-index stream."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # table entries as bytes; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise CodecError("corrupt GIF LZW stream (code out of range)")
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif(b: bytes) -> np.ndarray:
    """Decode the FIRST image frame of a GIF87a/GIF89a payload to an
    (H,W,3) uint8 RGB array — or (H,W,4) RGBA when the frame's graphic
    control extension declares a transparency index. Supports global and
    local color tables and interlaced frames. Animation (later frames),
    disposal composition, and plain-text blocks are out of scope: the
    feature-extraction operators consume one representative frame
    (ops/multimodal.frame-sample semantics)."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        raise CodecError("not a GIF payload")
    try:
        return _decode_gif_body(b)
    except CodecError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        raise CodecError(f"truncated or malformed GIF: {exc}") from exc


def _decode_gif_body(b: bytes) -> np.ndarray:
    _screen_w, _screen_h, flags, _bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    transparent = None
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                size = b[pos]
                gflags = b[pos + 1]
                if gflags & 0x01:
                    transparent = b[pos + 4]
                pos += size + 1
            while b[pos] != 0:  # remaining sub-blocks
                pos += b[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise CodecError(f"unexpected GIF block 0x{block:02x}")
        _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise CodecError("GIF frame has no color table")
        min_code = b[pos]
        pos += 1
        chunks = []
        while b[pos] != 0:
            ln = b[pos]
            chunks.append(b[pos + 1: pos + 1 + ln])
            pos += ln + 1
        pos += 1
        idx = _gif_lzw_decode(b"".join(chunks), min_code, w * h)
        if len(idx) < w * h:
            raise CodecError("GIF pixel data truncated")
        grid = np.frombuffer(bytes(idx[: w * h]), np.uint8).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows stored in 4-pass order
            order = [r for start, step in _GIF_INTERLACE_PASSES
                     for r in range(start, h, step)]
            logical = np.empty_like(grid)
            logical[order] = grid
            grid = logical
        if np.any(grid >= len(table)):
            raise CodecError("GIF palette index out of range")
        rgb = table[grid]
        if transparent is not None and transparent < len(table):
            alpha = np.where(grid == transparent, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    raise CodecError("GIF contains no image frame")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H,W[,C]) array — pure indexing,
    deterministic (pixel centers at (i + 0.5) * src/dst)."""
    a = np.asarray(arr)
    src_h, src_w = a.shape[:2]
    if src_h == 0 or src_w == 0 or width <= 0 or height <= 0:
        raise CodecError("empty image or non-positive target size")
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
    return a[ys][:, xs]


def decode_image(b: bytes) -> np.ndarray:
    """Dispatch on magic bytes -> uint8 pixel array. PNG, uncompressed
    BMP, GIF (first frame, in-repo LZW), JPEG (baseline + progressive),
    lossless WebP (VP8L) and lossy WebP (RFC 6386 VP8 key frames,
    ``ops/vp8.py``) all decode for real — no codec-library decode
    boundary remains."""
    if len(b) >= 8 and b[:8] == _PNG_MAGIC:
        return decode_png(b)
    if len(b) >= 2 and b[:2] == b"BM":
        return decode_bmp(b)
    if len(b) >= 6 and b[:4] == b"GIF8":
        return decode_gif(b)
    if len(b) >= 3 and b[:2] == b"\xff\xd8":
        return decode_jpeg(b)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from duckdb_mongo_spark.ops.webp import decode_webp

        return decode_webp(b)
    raise CodecError("no in-repo pixel codec for this payload")
