"""Video containers as opaque binary + REAL structural metadata.

Closes the "video is md5-faked" gap in the multimodal layer
(``ops/multimodal.py``): WebM/Matroska (EBML) and MP4 (ISO base media
file format) payloads now parse for real — codec id, dimensions,
duration, frame count, keyframe positions — and frames can be EXTRACTED
by walking the container's sample tables, all with pure struct parsing
(no codec library, same stance as ``ops/codecs.py``).

For VP8-coded WebM tracks the extracted key frames decode to REAL
pixels through the in-repo RFC 6386 decoder (``ops/vp8.py``), so video
frame-sampling + pixel feature extraction runs end to end with no
external dependency.  Other codecs (H.264/H.265/AV1/VP9 payloads)
extract as opaque bytes — entropy decoding those is out of scope, the
same documented boundary as compressed audio.

Reference parity: NEW surface — the reference has no media layer; BSON
Binary maps to an opaque BLOB column and nothing more
(/root/reference/src/schema/mongo_schema_inference_internal.hpp:41-42).
This module keeps that opaque-binary-plus-metadata data model but makes
the metadata real.

Spark surface (Arrow-batched ``mapInPandas``, schema-stable, null on
unparsable payloads — never crashes the pipeline):

- ``video_meta``        binary -> container/codec/dims/duration/counts
- ``video_frame_sample`` binary -> one row per sampled frame (pts,
                         keyframe flag, payload), every-Nth or
                         keyframes-only; bounded by ``max_frames``
- ``video_frame_features`` sampled VP8 frames -> real pixel statistics

Everything derives from the public Matroska/EBML and ISO/IEC 14496-12
format documentation.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

try:  # Spark is optional at import time (pure parsing works without it)
    from pyspark.sql import DataFrame
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    DataFrame = None
    T = None


class VideoError(ValueError):
    pass


@dataclass
class VideoInfo:
    container: str                 # "webm" | "mp4"
    codec: str | None              # e.g. "V_VP8", "avc1", "vp09"
    width: int | None
    height: int | None
    duration_s: float | None
    frames: list = field(default_factory=list)  # (pts_s, keyframe, payload_or_(off,size))

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def n_keyframes(self) -> int:
        return sum(1 for _, k, _ in self.frames if k)


# --------------------------------------------------------------------------
# WebM / Matroska (EBML)
# --------------------------------------------------------------------------

_EBML_MAGIC = b"\x1aE\xdf\xa3"

# element ids (with their length-marker bits, as they appear in the file)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TIMECODE = 0xE7
_SIMPLE_BLOCK = 0xA3


def _read_vint(b: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` -> (value, new_pos)."""
    if pos >= len(b):
        raise VideoError("EBML truncated")
    first = b[pos]
    if first == 0:
        raise VideoError("invalid EBML vint")
    length = 9 - first.bit_length()  # leading zeros + 1
    if pos + length > len(b):
        raise VideoError("EBML truncated")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | b[pos + i]
    return v, pos + length


def _walk_ebml(b: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) at one level."""
    while pos < end:
        eid, pos = _read_vint(b, pos, keep_marker=True)
        size, pos = _read_vint(b, pos, keep_marker=False)
        yield eid, pos, min(pos + size, end)
        pos += size


def _ebml_uint(b: bytes, start: int, end: int) -> int:
    v = 0
    for i in range(start, end):
        v = (v << 8) | b[i]
    return v


def _ebml_float(b: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", b[start:end])[0]
    if n == 8:
        return struct.unpack(">d", b[start:end])[0]
    raise VideoError("bad EBML float size")


def parse_webm(b: bytes, want_frames: bool = True) -> VideoInfo:
    """Parse a WebM/Matroska byte payload: first video track's codec and
    dimensions, segment duration, and (optionally) every SimpleBlock of
    that track as (pts_seconds, is_keyframe, frame_bytes)."""
    if len(b) < 4 or b[:4] != _EBML_MAGIC:
        raise VideoError("not an EBML/WebM payload")
    # skip the EBML header element
    pos = 4
    size, pos = _read_vint(b, pos, keep_marker=False)
    pos += size
    info = VideoInfo("webm", None, None, None, None)
    timecode_scale = 1_000_000  # ns per tick (Matroska default)
    duration_ticks = None
    video_track = None
    for eid, s, e in _walk_ebml(b, pos, len(b)):
        if eid != _SEGMENT:
            continue
        # two passes: resolve Info + Tracks before touching any Cluster,
        # so SimpleBlocks are never attributed to the video stream while
        # the track map is still unknown (clusters may precede Tracks;
        # audio-only files must yield no video frames)
        segment_children = list(_walk_ebml(b, s, e))
        for eid2, s2, e2 in segment_children:
            if eid2 == _INFO:
                for eid3, s3, e3 in _walk_ebml(b, s2, e2):
                    if eid3 == _TIMECODE_SCALE:
                        timecode_scale = _ebml_uint(b, s3, e3)
                    elif eid3 == _DURATION:
                        duration_ticks = _ebml_float(b, s3, e3)
            elif eid2 == _TRACKS:
                for eid3, s3, e3 in _walk_ebml(b, s2, e2):
                    if eid3 != _TRACK_ENTRY:
                        continue
                    tnum = ttype = None
                    codec = w = h = None
                    for eid4, s4, e4 in _walk_ebml(b, s3, e3):
                        if eid4 == 0xD7:
                            tnum = _ebml_uint(b, s4, e4)
                        elif eid4 == _TRACK_TYPE:
                            ttype = _ebml_uint(b, s4, e4)
                        elif eid4 == _CODEC_ID:
                            codec = b[s4:e4].decode("ascii", "replace")
                        elif eid4 == _VIDEO:
                            for eid5, s5, e5 in _walk_ebml(b, s4, e4):
                                if eid5 == _PIXEL_W:
                                    w = _ebml_uint(b, s5, e5)
                                elif eid5 == _PIXEL_H:
                                    h = _ebml_uint(b, s5, e5)
                    if ttype == 1 and video_track is None:  # video
                        video_track = tnum
                        info.codec, info.width, info.height = codec, w, h
        if want_frames and video_track is not None:
            for eid2, s2, e2 in segment_children:
                if eid2 != _CLUSTER:
                    continue
                cluster_tc = 0
                for eid3, s3, e3 in _walk_ebml(b, s2, e2):
                    if eid3 == _CLUSTER_TIMECODE:
                        cluster_tc = _ebml_uint(b, s3, e3)
                    elif eid3 == _SIMPLE_BLOCK:
                        tnum, p = _read_vint(b, s3, keep_marker=False)
                        if tnum != video_track:
                            continue
                        rel_tc = struct.unpack(">h", b[p:p + 2])[0]
                        flags = b[p + 2]
                        if flags & 0x06:  # lacing unsupported -> skip
                            continue
                        pts = (cluster_tc + rel_tc) * timecode_scale / 1e9
                        info.frames.append(
                            (pts, bool(flags & 0x80), b[p + 3:e3]))
    if duration_ticks is not None:
        info.duration_s = duration_ticks * timecode_scale / 1e9
    elif info.frames:
        info.duration_s = max(f[0] for f in info.frames)
    return info


def _ebml_encode_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _ebml_encode_size(size: int) -> bytes:
    for length in range(1, 9):
        if size < (1 << (7 * length)) - 1:
            v = size | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise VideoError("EBML size too large")


def _el(eid: int, payload: bytes) -> bytes:
    return _ebml_encode_id(eid) + _ebml_encode_size(len(payload)) + payload


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def mux_webm_vp8(frames, width: int, height: int,
                 frame_duration_ms: int = 40) -> bytes:
    """Minimal WebM muxer for VP8 key-frame payloads (e.g. from
    ``vp8.encode_rgba``): one video track, one cluster, SimpleBlocks at
    ``frame_duration_ms`` spacing, all flagged keyframes.  Produces
    files this module's parser — and any Matroska reader — can walk."""
    ebml_header = _el(0x1A45DFA3, b"".join([
        _el_uint(0x4286, 1),        # EBMLVersion
        _el_uint(0x42F7, 1),        # EBMLReadVersion
        _el_uint(0x42F2, 4),        # EBMLMaxIDLength
        _el_uint(0x42F3, 8),        # EBMLMaxSizeLength
        _el(0x4282, b"webm"),       # DocType
        _el_uint(0x4287, 2),        # DocTypeVersion
        _el_uint(0x4285, 2),        # DocTypeReadVersion
    ]))
    dur = float(len(frames) * frame_duration_ms)
    seg_info = _el(_INFO, b"".join([
        _el_uint(_TIMECODE_SCALE, 1_000_000),  # 1 ms ticks
        _el(_DURATION, struct.pack(">d", dur)),
        _el(0x4D80, b"duckdb_mongo_spark"),    # MuxingApp
        _el(0x5741, b"duckdb_mongo_spark"),    # WritingApp
    ]))
    track = _el(_TRACKS, _el(_TRACK_ENTRY, b"".join([
        _el_uint(0xD7, 1),          # TrackNumber
        _el_uint(0x73C5, 1),        # TrackUID
        _el_uint(_TRACK_TYPE, 1),   # video
        _el(_CODEC_ID, b"V_VP8"),
        _el(_VIDEO, _el_uint(_PIXEL_W, width) + _el_uint(_PIXEL_H, height)),
    ])))
    blocks = [_el_uint(_CLUSTER_TIMECODE, 0)]
    for i, payload in enumerate(frames):
        head = b"\x81" + struct.pack(">h", i * frame_duration_ms) + b"\x80"
        blocks.append(_el(_SIMPLE_BLOCK, head + bytes(payload)))
    cluster = _el(_CLUSTER, b"".join(blocks))
    segment = _el(_SEGMENT, seg_info + track + cluster)
    return ebml_header + segment


# --------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12)
# --------------------------------------------------------------------------


def _walk_boxes(b: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        fourcc = b[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise VideoError("bad MP4 box size")
        yield fourcc, body, pos + size
        pos += size


def _find_box(b: bytes, pos: int, end: int, path: list[bytes]):
    for fourcc, s, e in _walk_boxes(b, pos, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return s, e
            return _find_box(b, s, e, path[1:])
    return None


def parse_mp4(b: bytes, want_frames: bool = True) -> VideoInfo:
    """Parse an MP4/ISO-BMFF payload: first video track's codec fourcc
    and dimensions, movie duration, and (optionally) the per-sample
    table as (pts_seconds, is_keyframe, payload_bytes) resolved through
    stts/stss/stsz/stsc/stco against mdat."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise VideoError("not an MP4 payload")
    info = VideoInfo("mp4", None, None, None, None)
    moov = _find_box(b, 0, len(b), [b"moov"])
    if moov is None:
        raise VideoError("MP4 has no moov box")
    ms, me = moov
    mvhd = _find_box(b, ms, me, [b"mvhd"])
    if mvhd is not None:
        ver = b[mvhd[0]]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", b, mvhd[0] + 20)
        else:
            ts, dur = struct.unpack_from(">II", b, mvhd[0] + 12)
        if ts:
            info.duration_s = dur / ts
    # first video trak
    for fourcc, s, e in _walk_boxes(b, ms, me):
        if fourcc != b"trak":
            continue
        hdlr = _find_box(b, s, e, [b"mdia", b"hdlr"])
        if hdlr is None or b[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find_box(b, s, e, [b"mdia", b"mdhd"])
        media_ts = 1
        if mdhd is not None:
            ver = b[mdhd[0]]
            media_ts = struct.unpack_from(
                ">I", b, mdhd[0] + (20 if ver == 1 else 12))[0] or 1
        stbl = _find_box(b, s, e, [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            continue
        ss, se = stbl
        stsd = _find_box(b, ss, se, [b"stsd"])
        if stsd is not None:
            # stsd: ver/flags + entry_count, then sample entries
            for fc, es, _ee in _walk_boxes(b, stsd[0] + 8, stsd[1]):
                info.codec = fc.decode("ascii", "replace")
                # visual sample entry: width/height at offset 24/26
                info.width, info.height = struct.unpack_from(">HH", b, es + 24)
                break
        if not want_frames:
            info.frames = [(None, None, None)] * _stsz_count(b, ss, se)
            return info
        # sample tables
        stts = _find_box(b, ss, se, [b"stts"])
        stsz = _find_box(b, ss, se, [b"stsz"])
        stsc = _find_box(b, ss, se, [b"stsc"])
        stco = _find_box(b, ss, se, [b"stco"]) or _find_box(
            b, ss, se, [b"co64"])
        stss = _find_box(b, ss, se, [b"stss"])
        if None in (stts, stsz, stsc, stco):
            return info
        # sizes
        sz_fixed, n_samples = struct.unpack_from(">II", b, stsz[0] + 4)
        sizes = ([sz_fixed] * n_samples if sz_fixed else
                 list(struct.unpack_from(f">{n_samples}I", b, stsz[0] + 12)))
        # decode times
        (n_stts,) = struct.unpack_from(">I", b, stts[0] + 4)
        times, t = [], 0
        for i in range(n_stts):
            cnt, delta = struct.unpack_from(">II", b, stts[0] + 8 + 8 * i)
            for _ in range(cnt):
                times.append(t / media_ts)
                t += delta
        # keyframes
        if stss is not None:
            (n_ss,) = struct.unpack_from(">I", b, stss[0] + 4)
            keys = set(struct.unpack_from(f">{n_ss}I", b, stss[0] + 8))
        else:
            keys = None  # absent stss = every sample is a sync sample
        # chunk offsets (stco: 32-bit, co64: 64-bit)
        co_body = stco[0]
        (n_chunks,) = struct.unpack_from(">I", b, co_body + 4)
        fourcc_co = b[co_body - 4:co_body]
        if fourcc_co == b"co64":
            offsets = struct.unpack_from(f">{n_chunks}Q", b, co_body + 8)
        else:
            offsets = struct.unpack_from(f">{n_chunks}I", b, co_body + 8)
        # sample->chunk map
        (n_stsc,) = struct.unpack_from(">I", b, stsc[0] + 4)
        runs = [struct.unpack_from(">III", b, stsc[0] + 8 + 12 * i)
                for i in range(n_stsc)]
        sample = 0
        for ri, (first_chunk, per_chunk, _desc) in enumerate(runs):
            last_chunk = (runs[ri + 1][0] - 1 if ri + 1 < len(runs)
                          else n_chunks)
            for chunk in range(first_chunk, last_chunk + 1):
                off = offsets[chunk - 1]
                for _ in range(per_chunk):
                    if sample >= n_samples:
                        break
                    size = sizes[sample]
                    payload = b[off:off + size]
                    kf = keys is None or (sample + 1) in keys
                    pts = times[sample] if sample < len(times) else None
                    info.frames.append((pts, kf, payload))
                    off += size
                    sample += 1
        return info
    return info


def _stsz_count(b: bytes, ss: int, se: int) -> int:
    stsz = _find_box(b, ss, se, [b"stsz"])
    if stsz is None:
        return 0
    return struct.unpack_from(">I", b, stsz[0] + 8)[0]


def parse_video(b: bytes, want_frames: bool = True) -> VideoInfo:
    """Magic-byte dispatch: EBML -> WebM/Matroska, ftyp -> MP4."""
    if len(b) >= 4 and b[:4] == _EBML_MAGIC:
        return parse_webm(b, want_frames)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return parse_mp4(b, want_frames)
    raise VideoError("unrecognized video container")


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

if T is not None:
    VIDEO_META_SCHEMA = T.StructType([
        T.StructField("container", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_keyframes", T.LongType()),
    ])
    FRAME_SCHEMA = T.StructType([
        T.StructField("frame_index", T.LongType()),
        T.StructField("pts_s", T.DoubleType()),
        T.StructField("is_keyframe", T.BooleanType()),
        T.StructField("frame_payload", T.BinaryType()),
    ])
    FRAME_FEATURES_SCHEMA = T.StructType([
        T.StructField("frame_width", T.IntegerType()),
        T.StructField("frame_height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("std_luma", T.DoubleType()),
    ])


def _schema_minus(df, plus, minus_col):
    fields = [f for f in df.schema.fields if f.name != minus_col]
    return T.StructType(fields + list(plus.fields))


def video_meta(df: "DataFrame", payload_col: str = "payload") -> "DataFrame":
    """binary video column -> container/codec/dims/duration/frame counts
    (null row extension for unparsable payloads)."""
    import pandas as _pd

    out_schema = _schema_minus(df, VIDEO_META_SCHEMA, payload_col)
    names = [f.name for f in out_schema.fields]

    def gen(batches):
        for pdf in batches:
            rows = {n: [] for n in names}
            for _, r in pdf.iterrows():
                for n in names:
                    if n not in VIDEO_META_SCHEMA.fieldNames():
                        rows[n].append(r[n])
                try:
                    v = parse_video(bytes(r[payload_col]), want_frames=True)
                    vals = (v.container, v.codec, v.width, v.height,
                            v.duration_s, v.n_frames, v.n_keyframes)
                except (VideoError, Exception):
                    vals = (None,) * 7
                for n, x in zip(VIDEO_META_SCHEMA.fieldNames(), vals):
                    rows[n].append(x)
            yield _pd.DataFrame(rows, columns=names)

    return df.mapInPandas(gen, schema=out_schema)


def video_frame_sample(df: "DataFrame", payload_col: str = "payload",
                       every_n: int = 1, keyframes_only: bool = True,
                       max_frames: int = 32) -> "DataFrame":
    """Explode each video payload into sampled frame rows.  Sampling is
    bounded per video by ``max_frames`` (silent unbounded explosion is
    the 100 TB failure mode; the cap is explicit and in the plan)."""
    import pandas as _pd

    out_schema = _schema_minus(df, FRAME_SCHEMA, payload_col)
    names = [f.name for f in out_schema.fields]
    passthrough = [n for n in names if n not in FRAME_SCHEMA.fieldNames()]

    def gen(batches):
        for pdf in batches:
            rows = {n: [] for n in names}
            for _, r in pdf.iterrows():
                try:
                    v = parse_video(bytes(r[payload_col]), want_frames=True)
                    frames = [(i, f) for i, f in enumerate(v.frames)
                              if f[2] is not None]
                except (VideoError, Exception):
                    continue
                if keyframes_only:
                    frames = [(i, f) for i, f in frames if f[1]]
                frames = frames[::max(1, every_n)][:max_frames]
                for i, (pts, kf, payload) in frames:
                    for n in passthrough:
                        rows[n].append(r[n])
                    rows["frame_index"].append(i)
                    rows["pts_s"].append(pts)
                    rows["is_keyframe"].append(bool(kf))
                    rows["frame_payload"].append(bytes(payload))
            yield _pd.DataFrame(rows, columns=names)

    return df.mapInPandas(gen, schema=out_schema)


def video_frame_features(df: "DataFrame",
                         frame_col: str = "frame_payload") -> "DataFrame":
    """REAL pixel statistics for decodable frame payloads — VP8 key
    frames (``ops/vp8.py``, luma plane stats) and JPEG frames as carried
    by MJPEG-in-MP4 tracks (``ops/codecs.decode_jpeg``, BT.601 luma) —
    with no codec library anywhere in the chain; payloads of other
    codecs yield nulls, never errors."""
    import pandas as _pd

    out_schema = _schema_minus(df, FRAME_FEATURES_SCHEMA, frame_col)
    names = [f.name for f in out_schema.fields]

    def gen(batches):
        import numpy as _np

        from duckdb_mongo_spark.ops import vp8 as _vp8
        from duckdb_mongo_spark.ops.codecs import decode_jpeg as _djpeg

        for pdf in batches:
            rows = {n: [] for n in names}
            for _, r in pdf.iterrows():
                for n in names:
                    if n not in FRAME_FEATURES_SCHEMA.fieldNames():
                        rows[n].append(r[n])
                try:
                    # bytes() stays inside the try: a null payload is a
                    # "not decodable" row under the contract, not a task
                    # failure (None -> TypeError is caught here).
                    payload = bytes(r[frame_col])
                    if payload[:2] == b"\xff\xd8":  # JPEG SOI (MJPEG-in-MP4)
                        arr = _djpeg(payload)
                        if arr.ndim == 2:
                            y = arr.astype(_np.float64)
                        else:
                            y = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                                 + 0.114 * arr[..., 2])
                        vals = (int(y.shape[1]), int(y.shape[0]),
                                float(y.mean()), float(y.std()))
                    else:
                        y, _u, _v = _vp8.decode_yuv(payload)
                        vals = (int(y.shape[1]), int(y.shape[0]),
                                float(y.mean()), float(y.std()))
                except Exception:
                    vals = (None, None, None, None)
                for n, x in zip(FRAME_FEATURES_SCHEMA.fieldNames(), vals):
                    rows[n].append(x)
            yield _pd.DataFrame(rows, columns=names)

    return df.mapInPandas(gen, schema=out_schema)
