"""ISO BMFF (MP4/MOV) box-structure metadata parser — pure stdlib.

Video DECODE (H.264/HEVC/AV1 bitstreams) needs codec libraries and stays
behind the NotImplementedError gate in ``binary_ops``; what a
training-data pipeline filters and samples on — duration, track count,
codec identity, resolution, integrity — lives in the container's box
tree, whose layout is the public ISO/IEC 14496-12 spec.  This module
walks the tree and reports:

    duration_ms (mvhd), n_tracks (trak count), width/height (first video
    tkhd), video_codec (first video stsd entry fourcc), has_video /
    has_audio (hdlr handler types), clean_eof

``make_mp4`` synthesizes a minimal structurally-valid box tree (ftyp +
moov with mvhd/trak/tkhd/mdia/hdlr/stsd, empty mdat) so tests and
oracle queries can round-trip the parser deterministically without
shipping video.

Box walk notes (14496-12): every box is [size u32][type 4cc][payload];
size==1 switches to a u64 largesize, size==0 means to-end-of-file.
Version-1 mvhd/tkhd carry u64 times.  Container boxes (moov, trak,
mdia, minf, stbl) nest; everything else is skipped by size.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

# plausible first top-level boxes: ftyp is recommended-not-required by
# 14496-12 — DASH segments start with styp, legacy MOV can lead with
# free/skip/wide or moov itself
_TOP_LEVEL = {
    b"ftyp", b"styp", b"free", b"skip", b"wide", b"moov", b"mdat",
    b"pdin", b"sidx", b"moof", b"meta", b"uuid",
}


def _walk(data: bytes, start: int, end: int, depth: int = 0):
    """Yield (type, payload_start, payload_end, depth) for every box."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack(">I4s", data[pos : pos + 8])
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"box '{btype.decode(errors='replace')}' "
                             "overruns its container")
        yield btype, pos + header, pos + size, depth
        if btype in _CONTAINERS:
            yield from _walk(data, pos + header, pos + size, depth + 1)
        pos += size


def mp4_metadata(data: bytes) -> dict:
    """Parse the box tree; corrupt input flags clean_eof='F' instead of
    raising (a crawl keeps flowing past truncated files)."""
    out = {
        "duration_ms": 0,
        "n_tracks": 0,
        "width": 0,
        "height": 0,
        "video_codec": "",
        "has_video": "F",
        "has_audio": "F",
        "clean_eof": "T",
    }
    if len(data) < 8 or data[4:8] not in _TOP_LEVEL:
        out["clean_eof"] = "F"
        return out
    in_video_trak = False
    saw_moov = False
    pending_tkhd: tuple[int, int] | None = None
    try:
        for btype, p, q, depth in _walk(data, 0, len(data)):
            box = data[p:q]
            if btype == b"moov":
                saw_moov = True
            if btype == b"mvhd" and len(box) >= 20:
                version = box[0]
                if version == 1:
                    timescale, duration = struct.unpack(">IQ", box[20:32])
                else:
                    timescale, duration = struct.unpack(">II", box[12:20])
                if timescale:
                    out["duration_ms"] = int(duration * 1000 // timescale)
            elif btype == b"trak":
                out["n_tracks"] += 1
                in_video_trak = False
                pending_tkhd = None
            elif btype == b"tkhd" and len(box) >= 84:
                version = box[0]
                off = 96 if version == 1 else 84
                if len(box) >= off:
                    w, h = struct.unpack(">II", box[off - 8 : off])
                    pending_tkhd = (w >> 16, h >> 16)  # 16.16 fixed point
            elif btype == b"hdlr" and len(box) >= 12:
                handler = box[8:12]
                if handler == b"vide":
                    out["has_video"] = "T"
                    in_video_trak = True
                    if pending_tkhd and out["width"] == 0:
                        out["width"], out["height"] = pending_tkhd
                elif handler == b"soun":
                    out["has_audio"] = "T"
            elif btype == b"stsd" and len(box) >= 16 and in_video_trak:
                if not out["video_codec"]:
                    out["video_codec"] = box[12:16].decode(
                        "ascii", errors="replace"
                    )
    except (ValueError, struct.error):
        out["clean_eof"] = "F"
    if not saw_moov:
        # a random-bytes payload can parse as one plausible box; without a
        # movie header there is no stream here
        out["clean_eof"] = "F"
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def make_mp4(
    duration_ms: int,
    timescale: int = 1000,
    video: bool = True,
    audio: bool = False,
    width: int = 640,
    height: int = 360,
    codec: bytes = b"avc1",
) -> bytes:
    """Minimal valid box tree for tests/oracles (no media samples)."""
    duration = duration_ms * timescale // 1000
    mvhd = (
        b"\x00" + b"\x00" * 3
        + struct.pack(">III", 0, 0, timescale)
        + struct.pack(">I", duration)
        + b"\x00" * 80
    )

    def trak(handler: bytes, w: int = 0, h: int = 0, fourcc: bytes = b"") -> bytes:
        tkhd = (
            b"\x00" + b"\x00" * 3
            + b"\x00" * 72
            + struct.pack(">II", w << 16, h << 16)
        )
        hdlr = b"\x00" * 8 + handler + b"\x00" * 12
        stsd_entry = _box(fourcc, b"\x00" * 70) if fourcc else b""
        stsd = b"\x00" * 4 + struct.pack(">I", 1 if fourcc else 0) + stsd_entry
        stbl = _box(b"stsd", stsd)
        minf = _box(b"stbl", stbl)
        mdia = _box(b"hdlr", hdlr) + _box(b"minf", minf)
        return _box(
            b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia)
        )

    traks = b""
    if video:
        traks += trak(b"vide", width, height, codec)
    if audio:
        traks += trak(b"soun")
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + _box(b"mdat", b"")
