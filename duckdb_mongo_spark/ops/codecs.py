"""Pure-stdlib + numpy media codecs: PNG, uncompressed BMP, GIF, PCM WAV.

Closes the "pixel decode needs a codec library" gap for the formats
whose decompression is implementable without one: PNG's only compression
is zlib (stdlib ``zlib``), BMP's common on-disk layout is uncompressed,
WAV PCM is raw samples, and GIF's LZW is a ~50-line table decoder
specified in full by GIF89a appendix F. JPEG/WebP entropy coding
genuinely needs a codec library and stays behind the documented stub
boundary (``multimodal.parse_image_header`` still reads their header
metadata).

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
    BMP, and GIF (first frame, in-repo LZW) decode for real; anything
    else raises CodecError (JPEG/WebP entropy coding needs a codec
    library)."""
    if len(b) >= 8 and b[:8] == _PNG_MAGIC:
        return decode_png(b)
    if len(b) >= 2 and b[:2] == b"BM":
        return decode_bmp(b)
    if len(b) >= 6 and b[:4] == b"GIF8":
        return decode_gif(b)
    raise CodecError("no in-repo pixel codec for this payload")
