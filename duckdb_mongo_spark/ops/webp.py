"""WebP lossless (VP8L) codec — pure stdlib + numpy.

Closes the last in-repo codec boundary. Reference parity: NEW surface —
the reference has no image decode anywhere; BSON Binary maps to an
opaque BLOB (src/schema/mongo_schema_inference_internal.hpp:41-42).
This repo implements the public bitstream specs directly. VP8L is
specified in RFC 9649 ("WebP Image Format"), section "Specification for
WebP Lossless Bitstream"; everything here derives from that public spec.

Decoder scope (validated in tests/test_codecs.py):

- VP8L simple + normal (code-length-coded) Huffman codes, including
  0-bit single-symbol codes;
- color cache (any 1-11 bit size), LZ77 backward references with both
  the 120-entry 2-D distance map and plane codes (> 120);
- meta-Huffman (multiple Huffman groups selected by an entropy image);
- all four transforms, applied in reverse order: PREDICTOR (all 14
  modes, with the spec's edge rules), COLOR (cross-color multipliers),
  SUBTRACT_GREEN, COLOR_INDEXING (palette, incl. sub-byte pixel
  bundling for <= 16 colors);
- RIFF container walk: bare "VP8L" chunk or "VP8X"-extended layout.
  Lossy "VP8 " payloads decode through the pure in-repo RFC 6386 VP8
  key-frame decoder (``ops/vp8.py``, bit-exact with libwebp) with the
  optional libwebp runtime (``ops/webp_native.py``) preferred for
  throughput when installed — no codec-library boundary remains for
  decode.

The encoder emits a spec-conformant literal VP8L stream (no transforms;
optional run-length LZ77 and color cache) with package-merge
length-limited Huffman codes — enough to round-trip arbitrary images
bit-exactly and to let tests exercise every decoder branch without a
third-party encoder. Since r6 the container's real libwebp also
cross-verifies both directions (tests/test_webp_interop.py, committed
fixtures under tests/fixtures/webp/): real-libwebp streams decode
pixel-exactly here, and our streams decode pixel-exactly in libwebp.

Per-pixel stages run as Python loops over small thumbnails inside Arrow
batches (same stance as the GIF LZW decoder); route bulk image decode
to a codec-library runtime.
"""

from __future__ import annotations

import struct

import numpy as np

from duckdb_mongo_spark.ops.codecs import CodecError

# order in which code-length-code lengths are stored (RFC 9649,
# kCodeLengthCodeOrder). NOTE: symbol 16 (repeat-previous) sits at INDEX
# 8, between 5 and 6 — NOT at the end like DEFLATE's order. Rounds 1-5
# had 16 last; the bug was invisible to every round-trip test (the
# encoder wrote the same wrong order) and surfaced only against a REAL
# libwebp stream (tests/fixtures/webp/libwebp_lossless.webp), where a
# 9-entry code-length code made '1110' decode as literal-6 instead of
# repeat-previous and derailed the whole table.
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 120-entry (dx, dy) neighborhood map for short LZ77 distances
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _subsampled(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


class _BitReader:
    """LSB-first bit reader (VP8L convention: values fill from the least
    significant bit of each successive byte)."""

    __slots__ = ("data", "pos", "limit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.limit = len(data) * 8

    def bits(self, n: int) -> int:
        p = self.pos
        if p + n > self.limit:
            raise CodecError("VP8L bitstream truncated")
        self.pos = p + n
        i = p >> 3
        chunk = int.from_bytes(self.data[i:i + 8], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)


class _BitWriter:
    """LSB-first writer matching ``_BitReader``."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def bits(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def huff(self, code: int, length: int) -> None:
        # canonical Huffman codes are written/read MSB-first
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def tobytes(self) -> bytes:
        out = bytes(self.out)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


# --------------------------------------------------------------------------
# Huffman codes (canonical, DEFLATE-style assignment; MSB-first reading)
# --------------------------------------------------------------------------


def _canonical_table(lengths: list[int]):
    """lengths[sym] -> decode table {(length, code): sym}, or the 0-bit
    ("single", sym) form when exactly one symbol is used.

    Rejects incomplete/oversubscribed codes, like libwebp's
    BuildHuffmanTable (a strictness that also catches table-read
    misalignment early — it is how the _CLC_ORDER bug above was
    found)."""
    used = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise CodecError("VP8L: empty Huffman code")
    if len(used) == 1:
        return ("single", used[0][1])
    max_len = max(ln for ln, _ in used)
    bl_count = [0] * (max_len + 1)
    for ln, _ in used:
        bl_count[ln] += 1
    kraft = sum(bl_count[ln] << (max_len - ln) for ln in range(1, max_len + 1))
    if kraft != (1 << max_len):
        raise CodecError("VP8L: invalid (incomplete) Huffman code")
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table: dict = {}
    for s, ln in enumerate(lengths):
        if ln > 0:
            table[(ln, next_code[ln])] = s
            next_code[ln] += 1
    return table


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Encoder side of ``_canonical_table``: {sym: (code, length)}."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for s in sorted(lengths):
        ln = lengths[s]
        out[s] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _read_symbol(br: _BitReader, table) -> int:
    if isinstance(table, tuple):  # ("single", sym): 0-bit code
        return table[1]
    code = 0
    for length in range(1, 16):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise CodecError("VP8L: invalid Huffman code in stream")


def _read_huffman_code(br: _BitReader, alphabet_size: int):
    if br.bits(1):  # simple code
        num_symbols = br.bits(1) + 1
        first = br.bits(8) if br.bits(1) else br.bits(1)
        if num_symbols == 1:
            return ("single", first)
        second = br.bits(8)
        return {(1, 0): first, (1, 1): second}
    num_code_lengths = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_code_lengths):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _canonical_table(clc_lengths)
    if br.bits(1):  # explicit max_symbol budget
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # spec default for repeat-previous before any literal
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = _read_symbol(br, clc)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + br.bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + br.bits(3)
        else:
            i += 11 + br.bits(7)
    return _canonical_table(lengths)


def _pm_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Package-merge length-limited Huffman lengths (complete code)."""
    if len(freqs) < 2:
        raise CodecError("package-merge needs >= 2 symbols")
    if len(freqs) > (1 << max_len):
        raise CodecError("alphabet too large for the length limit")
    orig = sorted((f, (s,)) for s, f in freqs.items())
    level = list(orig)
    for _ in range(max_len - 1):
        merged = [
            (level[i][0] + level[i + 1][0], level[i][1] + level[i + 1][1])
            for i in range(0, len(level) - 1, 2)
        ]
        level = sorted(orig + merged)
    lengths = dict.fromkeys(freqs, 0)
    for _, syms in level[: 2 * len(freqs) - 2]:
        for s in syms:
            lengths[s] += 1
    return lengths


def _write_huffman_code(bw: _BitWriter, freqs: dict[int, int], alphabet_size: int):
    """Emit a Huffman code for ``freqs`` and return {sym: (code, len)}
    (empty dict for a 0-bit single-symbol code)."""
    syms = sorted(freqs)
    # simple codes store symbols in at most 8 bits — run/cache symbols
    # (>= 256) must go through the normal (code-length-coded) path
    simple_ok = syms[-1] <= 255
    if len(syms) == 1 and simple_ok:
        s = syms[0]
        bw.bits(1, 1)  # simple
        bw.bits(0, 1)  # one symbol
        if s <= 1:
            bw.bits(0, 1)
            bw.bits(s, 1)
        else:
            bw.bits(1, 1)
            bw.bits(s, 8)
        return {}
    if len(syms) == 2 and simple_ok:
        bw.bits(1, 1)
        bw.bits(1, 1)  # two symbols
        s0, s1 = syms
        if s0 <= 1:
            bw.bits(0, 1)
            bw.bits(s0, 1)
        else:
            bw.bits(1, 1)
            bw.bits(s0, 8)
        bw.bits(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    if len(syms) == 1:
        lengths = {syms[0]: 1}  # decodes as a 0-bit single-symbol code
    elif len(syms) == 2:
        lengths = {syms[0]: 1, syms[1]: 1}
    else:
        lengths = _pm_lengths(freqs, 15)
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    clc_freqs: dict[int, int] = {}
    for ln in seq:
        clc_freqs[ln] = clc_freqs.get(ln, 0) + 1
    if len(clc_freqs) == 1:
        clc_lengths = {next(iter(clc_freqs)): 0}  # 0-bit code-length code
    elif len(clc_freqs) == 2:
        a, b = sorted(clc_freqs)
        clc_lengths = {a: 1, b: 1}
    else:
        clc_lengths = _pm_lengths(clc_freqs, 7)
    bw.bits(0, 1)  # normal code
    bw.bits(19 - 4, 4)  # store all 19 code-length-code slots
    for sym in _CLC_ORDER:
        bw.bits(clc_lengths.get(sym, 0), 3)
    bw.bits(0, 1)  # no explicit max_symbol: read alphabet_size lengths
    if len(clc_freqs) == 1:
        clc_codes: dict[int, tuple[int, int]] = {}
    else:
        clc_codes = _canonical_codes(clc_lengths)
    for ln in seq:
        if ln in clc_codes:
            bw.huff(*clc_codes[ln])
    if len(syms) == 1:
        return {}  # 0-bit code: decoder consumes no bits per symbol
    return _canonical_codes(lengths)


# --------------------------------------------------------------------------
# LZ77 prefix values and distances
# --------------------------------------------------------------------------


def _read_prefix_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    rem = v - (2 << extra)
    code = 2 * extra + 2 + (rem >> extra)
    return code, rem & ((1 << extra) - 1), extra


def _plane_to_distance(plane: int, width: int) -> int:
    if plane > 120:
        return plane - 120
    dx, dy = _DIST_MAP[plane - 1]
    return max(1, dy * width + dx)


# --------------------------------------------------------------------------
# entropy-coded image decode (shared by main image, transforms, palette)
# --------------------------------------------------------------------------


def _decode_image_data(br: _BitReader, w: int, h: int, is_main: bool) -> list[int]:
    """Decode a VP8L entropy-coded image into a flat ARGB uint32 list."""
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise CodecError("VP8L: invalid color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if is_main and br.bits(1):
        meta_bits = br.bits(3) + 2
        meta_w = _subsampled(w, meta_bits)
        meta_img = _decode_image_data(br, meta_w, _subsampled(h, meta_bits), False)
        meta = [(p >> 8) & 0xFFFF for p in meta_img]  # (red << 8) | green
        n_groups = max(meta) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_huffman_code(br, green_alpha),
            _read_huffman_code(br, 256),  # red
            _read_huffman_code(br, 256),  # blue
            _read_huffman_code(br, 256),  # alpha
            _read_huffman_code(br, 40),   # distance
        ))

    n = w * h
    px = [0] * n
    pos = 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            group = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        g_t, r_t, b_t, a_t, d_t = group
        s = _read_symbol(br, g_t)
        if s < 256:
            red = _read_symbol(br, r_t)
            blue = _read_symbol(br, b_t)
            alpha = _read_symbol(br, a_t)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[pos] = p
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> cache_shift] = p
        elif s < 280:
            length = _read_prefix_value(br, s - 256)
            plane = _read_prefix_value(br, _read_symbol(br, d_t))
            dist = _plane_to_distance(plane, w)
            if dist > pos or pos + length > n:
                raise CodecError("VP8L: back-reference out of range")
            for _ in range(length):
                p = px[pos - dist]
                px[pos] = p
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> cache_shift] = p
        else:
            if cache is None:
                raise CodecError("VP8L: cache symbol without color cache")
            px[pos] = cache[s - 280]
            pos += 1
    return px


# --------------------------------------------------------------------------
# inverse transforms
# --------------------------------------------------------------------------


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _avg2(a: int, b: int) -> int:
    # per-channel average of two ARGB pixels
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((((a & 0xFF) + (b & 0xFF)) // 2))
    )


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | ((((a & 0xFF) + (b & 0xFF)) & 0xFF))
    )


def _select(left: int, top: int, top_left: int) -> int:
    pa = pb = 0
    for sh in (24, 16, 8, 0):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (top_left >> sh) & 0xFF
        pred = lc + tc - tlc
        pa += abs(pred - lc)
        pb += abs(pred - tc)
    return left if pa <= pb else top


def _clamp_add_sub_full(left: int, top: int, top_left: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((top_left >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(ave: int, top_left: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        c = (top_left >> sh) & 0xFF
        v = a + int((a - c) / 2)  # C truncation toward zero
        out |= max(0, min(255, v)) << sh
    return out


def _apply_predictor_inverse(px: list[int], w: int, h: int, size_bits: int,
                             modes: list[int]) -> None:
    tw = _subsampled(w, size_bits)
    for pos in range(w * h):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[pos - 1]
        elif x == 0:
            pred = px[pos - w]
        else:
            mode = (modes[(y >> size_bits) * tw + (x >> size_bits)] >> 8) & 0xFF
            left = px[pos - 1]
            top = px[pos - w]
            top_left = px[pos - w - 1]
            # raster layout makes TR of the last column the current row's
            # first pixel — the spec/libwebp-defined behavior
            top_right = px[pos - w + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = top_right
            elif mode == 4:
                pred = top_left
            elif mode == 5:
                pred = _avg2(_avg2(left, top_right), top)
            elif mode == 6:
                pred = _avg2(left, top_left)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(top_left, top)
            elif mode == 9:
                pred = _avg2(top, top_right)
            elif mode == 10:
                pred = _avg2(_avg2(left, top_left), _avg2(top, top_right))
            elif mode == 11:
                pred = _select(left, top, top_left)
            elif mode == 12:
                pred = _clamp_add_sub_full(left, top, top_left)
            elif mode == 13:
                pred = _clamp_add_sub_half(_avg2(left, top), top_left)
            else:
                raise CodecError("VP8L: invalid predictor mode")
        px[pos] = _add_px(px[pos], pred)


def _apply_color_inverse(px: list[int], w: int, h: int, size_bits: int,
                         elems: list[int]) -> None:
    tw = _subsampled(w, size_bits)
    for pos in range(w * h):
        y, x = divmod(pos, w)
        m = elems[(y >> size_bits) * tw + (x >> size_bits)]
        g2r = _i8(m & 0xFF)          # blue channel of the element
        g2b = _i8((m >> 8) & 0xFF)   # green channel
        r2b = _i8((m >> 16) & 0xFF)  # red channel
        p = px[pos]
        green = _i8((p >> 8) & 0xFF)
        red = ((p >> 16) & 0xFF) + ((g2r * green) >> 5)
        blue = (p & 0xFF) + ((g2b * green) >> 5)
        blue += (r2b * _i8(red & 0xFF)) >> 5
        px[pos] = (p & 0xFF00FF00) | ((red & 0xFF) << 16) | (blue & 0xFF)


def _apply_subtract_green_inverse(px: list[int]) -> None:
    for pos, p in enumerate(px):
        g = (p >> 8) & 0xFF
        red = (((p >> 16) & 0xFF) + g) & 0xFF
        blue = ((p & 0xFF) + g) & 0xFF
        px[pos] = (p & 0xFF00FF00) | (red << 16) | blue


def _apply_color_index_inverse(px: list[int], w: int, h: int, xbits: int,
                               palette: list[int]) -> list[int]:
    n_colors = len(palette)
    if xbits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < n_colors else 0
            for p in px
        ]
    packed_w = _subsampled(w, xbits)
    idx_bits = 8 >> xbits
    idx_mask = (1 << idx_bits) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = px[y * packed_w + (x >> xbits)]
            shift = (x & ((1 << xbits) - 1)) * idx_bits
            idx = ((packed >> 8) & 0xFF) >> shift & idx_mask
            out[y * w + x] = palette[idx] if idx < n_colors else 0
    return out


# --------------------------------------------------------------------------
# top-level decode
# --------------------------------------------------------------------------


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload -> (H, W, 4) RGBA uint8 array."""
    if not payload or payload[0] != 0x2F:
        raise CodecError("not a VP8L stream (bad signature)")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha-is-used hint
    if br.bits(3) != 0:
        raise CodecError("unsupported VP8L version")
    return _decode_vp8l_body(br, w, h)


def _decode_vp8l_body(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Transforms + entropy-coded image of known dimensions -> RGBA.

    Split out of ``decode_vp8l`` because ALPH chunks carry exactly this
    headerless stream (RFC 9649 "Alpha" — implicit dimensions, no
    signature / size / version bits)."""
    full_w = w
    transforms = []  # applied inverse in reverse read order
    seen = set()
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in seen:
            raise CodecError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color
            size_bits = br.bits(3) + 2
            data = _decode_image_data(
                br, _subsampled(w, size_bits), _subsampled(h, size_bits), False
            )
            transforms.append((ttype, size_bits, data))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            n_colors = br.bits(8) + 1
            pal = _decode_image_data(br, n_colors, 1, False)
            for i in range(1, n_colors):
                pal[i] = _add_px(pal[i], pal[i - 1])
            xbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 \
                else 1 if n_colors <= 16 else 0
            transforms.append((3, xbits, pal))
            w = _subsampled(w, xbits)  # bundled width for everything after

    px = _decode_image_data(br, w, h, True)

    for ttype, arg, data in reversed(transforms):
        if ttype == 3:
            px = _apply_color_index_inverse(px, full_w, h, arg, data)
            w = full_w
        elif ttype == 2:
            _apply_subtract_green_inverse(px)
        elif ttype == 1:
            _apply_color_inverse(px, w, h, arg, data)
        else:
            _apply_predictor_inverse(px, w, h, arg, data)

    arr = np.asarray(px, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    return rgba


def _decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk -> (H, W) uint8 alpha plane (RFC 9649).

    Header byte: 2 reserved bits, 2 pre-processing bits (informational),
    2 filtering bits F, 2 compression bits C.  C=0 is a raw row-major
    plane; C=1 is a headerless VP8L stream of implicit dimensions whose
    green channel carries the alpha values.  F in {1,2,3} applies the
    horizontal / vertical / gradient per-pixel predictor, inverted here
    exactly as libwebp's {Horizontal,Vertical,Gradient}Unfilter do."""
    if not body:
        raise CodecError("empty ALPH chunk")
    head = body[0]
    compression = head & 3
    filt = (head >> 2) & 3
    if compression == 0:
        if len(body) - 1 < w * h:
            raise CodecError("ALPH raw plane truncated")
        alpha = np.frombuffer(body[1:1 + w * h], np.uint8).reshape(h, w).copy()
    elif compression == 1:
        rgba = _decode_vp8l_body(_BitReader(body[1:]), w, h)
        alpha = rgba[..., 1].copy()  # alpha rides the green channel
    else:
        raise CodecError(f"ALPH: unknown compression method {compression}")
    if filt == 0:
        return alpha
    plane = alpha.astype(np.int32)
    if filt == 1:  # horizontal: pred = left; row>0 col0 preds from above
        np.cumsum(plane[0], out=plane[0])
        plane[0] &= 0xFF
        for y in range(1, h):
            row = plane[y]
            row[0] = (row[0] + plane[y - 1][0]) & 0xFF
            np.cumsum(row, out=row)
            row &= 0xFF
    elif filt == 2:  # vertical: pred = above; row 0 unfilters horizontally
        np.cumsum(plane[0], out=plane[0])
        np.cumsum(plane, axis=0, out=plane)
        plane &= 0xFF
    elif filt == 3:  # gradient: clip(left + above - above_left)
        np.cumsum(plane[0], out=plane[0])
        plane[0] &= 0xFF
        for y in range(1, h):
            prev, row = plane[y - 1], plane[y]
            left = int(prev[0])
            top_left = left
            for x in range(w):
                top = int(prev[x])
                grad = min(255, max(0, left + top - top_left))
                left = (int(row[x]) + grad) & 0xFF
                row[x] = left
                top_left = top
    return plane.astype(np.uint8)


def decode_webp(b: bytes) -> np.ndarray:
    """RIFF container walk -> pure in-repo decode. "VP8L" chunks use the
    VP8L codec below; lossy "VP8 " chunks use the RFC 6386 key-frame
    decoder (``ops/vp8.py``), which is pixel-identical to libwebp
    (tests/test_vp8.py); the libwebp runtime is used instead when
    installed, purely for throughput. (NEW surface — the reference has
    no codec layer; Binary maps to BLOB,
    src/schema/mongo_schema_inference_internal.hpp:41-42.)"""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise CodecError("not a WebP file")
    pos = 12
    alph_body = None
    while pos + 8 <= len(b):
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"ALPH":
            alph_body = body  # precedes the VP8 chunk in VP8X containers
        if fourcc == b"VP8 ":
            from duckdb_mongo_spark.ops import vp8, webp_native

            # Native and pure decoders are pixel-identical (pinned by
            # tests/test_vp8.py); libwebp is preferred purely for
            # throughput on large corpora, the in-repo RFC 6386 decoder
            # keeps lossy WebP working in library-free environments.
            if webp_native.available():
                return webp_native.decode_rgba(b)
            rgba = vp8.decode_rgba(body)
            if alph_body is not None:
                rgba[..., 3] = _decode_alph(
                    alph_body, rgba.shape[1], rgba.shape[0]
                )
            return rgba
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise CodecError("WebP container has no VP8L chunk")


# --------------------------------------------------------------------------
# encoder (literal VP8L; optional RLE LZ77 + color cache)
# --------------------------------------------------------------------------


def _to_argb(arr: np.ndarray) -> tuple[np.ndarray, int, int, bool]:
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise CodecError("encode_webp_lossless expects uint8 pixels")
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise CodecError("expected (H,W), (H,W,3) or (H,W,4)")
    h, w = a.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise CodecError("image size out of VP8L range")
    has_alpha = a.shape[2] == 4
    alpha = a[..., 3].astype(np.uint32) if has_alpha else np.full((h, w), 255, np.uint32)
    argb = (
        (alpha << 24)
        | (a[..., 0].astype(np.uint32) << 16)
        | (a[..., 1].astype(np.uint32) << 8)
        | a[..., 2].astype(np.uint32)
    )
    return argb.reshape(-1), w, h, has_alpha


def _emit_pixels(bw: _BitWriter, px, w: int, use_rle: bool, cache_bits: int,
                 rle_plane_codes: bool = False, is_main: bool = False) -> None:
    """Write one entropy-coded image (no transforms; single Huffman
    group — the main image writes meta-Huffman bit 0).

    ``use_rle`` emits runs of the previous pixel as LZ77 dist-1 copies;
    ``cache_bits`` > 0 maintains a color cache and emits cache hits;
    ``rle_plane_codes`` picks the short 2-D map code for distance 1
    (plane 2) instead of the raw plane ``121`` — both decode the same.
    """
    n = len(px)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    # plan the token stream first to build exact histograms
    tokens = []  # ("lit", p) | ("run", length) | ("hit", idx)
    green_f: dict[int, int] = {}
    red_f: dict[int, int] = {}
    blue_f: dict[int, int] = {}
    alpha_f: dict[int, int] = {}
    dist_f: dict[int, int] = {}
    dist_plane = 2 if rle_plane_codes else 121
    dist_code, dist_eb, dist_ebn = _prefix_encode(dist_plane)
    i = 0
    while i < n:
        p = int(px[i])
        if use_rle and i > 0 and p == int(px[i - 1]):
            run = 1
            while i + run < n and int(px[i + run]) == p:
                run += 1
            code, _, _ = _prefix_encode(run)
            green_f[256 + code] = green_f.get(256 + code, 0) + 1
            dist_f[dist_code] = dist_f.get(dist_code, 0) + 1
            tokens.append(("run", run))
            if cache is not None:
                cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> cache_shift] = p
            i += run
            continue
        if cache is not None:
            idx = ((0x1E35A7BD * p) & 0xFFFFFFFF) >> cache_shift
            if cache[idx] == p:
                green_f[280 + idx] = green_f.get(280 + idx, 0) + 1
                tokens.append(("hit", idx))
                i += 1
                continue
            cache[idx] = p
        g = (p >> 8) & 0xFF
        green_f[g] = green_f.get(g, 0) + 1
        red_f[(p >> 16) & 0xFF] = red_f.get((p >> 16) & 0xFF, 0) + 1
        blue_f[p & 0xFF] = blue_f.get(p & 0xFF, 0) + 1
        alpha_f[(p >> 24) & 0xFF] = alpha_f.get((p >> 24) & 0xFF, 0) + 1
        tokens.append(("lit", p))
        i += 1

    bw.bits(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.bits(cache_bits, 4)
    if is_main:
        bw.bits(0, 1)  # no meta-Huffman
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    if not dist_f:
        dist_f = {0: 1}  # unused but mandatory distance code
    g_codes = _write_huffman_code(bw, green_f, green_alpha)
    r_codes = _write_huffman_code(bw, red_f or {0: 1}, 256)
    b_codes = _write_huffman_code(bw, blue_f or {0: 1}, 256)
    a_codes = _write_huffman_code(bw, alpha_f or {0: 1}, 256)
    d_codes = _write_huffman_code(bw, dist_f, 40)

    def put(codes, sym):
        if codes:  # empty dict == 0-bit single-symbol code
            bw.huff(*codes[sym])

    for kind, v in tokens:
        if kind == "lit":
            put(g_codes, (v >> 8) & 0xFF)
            put(r_codes, (v >> 16) & 0xFF)
            put(b_codes, v & 0xFF)
            put(a_codes, (v >> 24) & 0xFF)
        elif kind == "run":
            code, eb, ebn = _prefix_encode(v)
            put(g_codes, 256 + code)
            if ebn:
                bw.bits(eb, ebn)
            put(d_codes, dist_code)
            if dist_ebn:
                bw.bits(dist_eb, dist_ebn)
        else:
            put(g_codes, 280 + v)


def encode_webp_lossless(arr: np.ndarray, use_rle: bool = True,
                         cache_bits: int = 0,
                         rle_plane_codes: bool = False) -> bytes:
    """Encode an image as lossless WebP (VP8L, no transforms) —
    bit-exact round trip through ``decode_webp``."""
    px, w, h, has_alpha = _to_argb(arr)
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if has_alpha else 0, 1)
    bw.bits(0, 3)  # version
    bw.bits(0, 1)  # no transforms
    _emit_pixels(bw, px, w, use_rle, cache_bits, rle_plane_codes, is_main=True)
    payload = bytes([0x2F]) + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_webp_lossy(arr: np.ndarray, qi: int = 20) -> bytes:
    """Encode an image as lossy WebP (a VP8 key frame, ``ops/vp8.py``)
    with no codec library: DC-predicted, default probabilities, loop
    filter off — conformance-first (any VP8 decoder reconstructs it
    identically; ~2-3x libwebp's bytes at equal PSNR).  ``qi`` is the
    raw VP8 quantizer index, 0 = finest .. 127 = coarsest.  Use
    ``webp_native.encode_lossy`` when libwebp is installed and
    compression density matters."""
    from duckdb_mongo_spark.ops.vp8 import encode_rgba as _vp8_encode

    payload = _vp8_encode(arr, qi)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
