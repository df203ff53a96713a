"""MPEG audio (MP3/MP2/MP1) frame-header metadata parser — pure stdlib.

Full audio DECODE needs a polyphase filterbank + (Layer III) MDCT and
stays behind the NotImplementedError gate in ``binary_ops``; what a
training-data pipeline actually filters on — duration, bitrate, sample
rate, channel count, frame integrity — only needs the 4-byte frame
headers, whose layout and rate tables are public ISO/IEC 11172-3 /
13818-3 constants.  This module walks the frame sequence (skipping an
ID3v2 tag if present), validates sync + index fields, and reports:

    n_frames, sample_rate, n_channels, duration_ms,
    bitrate_kbps (average over frames), layer, version, clean_eof

``clean_eof`` is 'F' when the walk hit bytes that are neither a valid
frame header nor an ID3v1 trailer — truncated/corrupt files surface as a
flag, not a crash, so a 100 TB crawl keeps flowing.

``make_frames`` synthesizes structurally-valid frame sequences (real
headers, zeroed payloads) so tests and oracle queries can round-trip the
parser deterministically without shipping audio.
"""

from __future__ import annotations

# bitrate tables in kbps, indexed [version_group][layer][bitrate_index];
# version_group 0 = MPEG1, 1 = MPEG2/2.5 (ISO 11172-3 Table B.2 and the
# 13818-3 extension); index 0 is "free", 15 invalid.
_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

# sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1), index 3
# invalid
_SAMPLE_RATES = {
    3: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    0: [11025, 12000, 8000],  # MPEG2.5
}

_VERSION_NAME = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}


def _frame_info(b0: int, b1: int, b2: int, b3: int) -> dict | None:
    """Decode one 4-byte header; None if not a valid frame header."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 0x3
    layer_bits = (b1 >> 1) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 11->1, 10->2, 01->3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format unsupported / invalid
    vgroup = 1 if version_bits == 3 else 2
    bitrate = _BITRATES[(vgroup, layer)][br_idx]
    sample_rate = _SAMPLE_RATES[version_bits][sr_idx]
    padding = (b2 >> 1) & 0x1
    channel_mode = (b3 >> 6) & 0x3
    if layer == 1:
        frame_len = (12000 * bitrate // sample_rate + padding) * 4
        samples = 384
    else:
        # Layer II always 144; Layer III is 144 for MPEG1, 72 for MPEG2/2.5
        coeff = 144 if (layer == 2 or version_bits == 3) else 72
        frame_len = coeff * 1000 * bitrate // sample_rate + padding
        samples = 1152 if (layer == 2 or version_bits == 3) else 576
    return {
        "version_bits": version_bits,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sample_rate,
        "n_channels": 1 if channel_mode == 3 else 2,
        "frame_len": frame_len,
        "samples": samples,
    }


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (synchsafe 28-bit size)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    sz = (
        ((data[6] & 0x7F) << 21)
        | ((data[7] & 0x7F) << 14)
        | ((data[8] & 0x7F) << 7)
        | (data[9] & 0x7F)
    )
    return 10 + sz


def mp3_metadata(data: bytes) -> dict:
    """Walk the frame sequence and aggregate stream metadata."""
    pos = _id3v2_size(data)
    n_frames = 0
    total_samples = 0
    bitrate_sum = 0
    sample_rate = 0
    n_channels = 0
    layer = 0
    version = ""
    clean = "T"
    n = len(data)
    while pos + 4 <= n:
        info = _frame_info(data[pos], data[pos + 1], data[pos + 2], data[pos + 3])
        if info is None:
            if data[pos : pos + 3] == b"TAG" and n - pos == 128:
                break  # ID3v1 trailer
            clean = "F"
            break
        if pos + info["frame_len"] > n:
            clean = "F"  # final frame truncated: header valid, payload cut
            break
        if n_frames == 0:
            sample_rate = info["sample_rate"]
            n_channels = info["n_channels"]
            layer = info["layer"]
            version = _VERSION_NAME[info["version_bits"]]
        n_frames += 1
        total_samples += info["samples"]
        bitrate_sum += info["bitrate_kbps"]
        pos += info["frame_len"]
    if pos < n and clean == "T" and not (
        data[pos : pos + 3] == b"TAG" and n - pos == 128
    ):
        clean = "F"  # trailing garbage / truncated final frame
    if n_frames == 0:
        # empty payload, ID3-tag-only file, or an ID3v2 size past EOF:
        # zero decodable frames is never a clean audio stream
        clean = "F"
    duration_ms = (
        total_samples * 1000 // sample_rate if sample_rate else 0
    )
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "duration_ms": int(duration_ms),
        "bitrate_kbps": (bitrate_sum // n_frames) if n_frames else 0,
        "layer": layer,
        "version": version,
        "clean_eof": clean,
    }


def make_frames(
    n_frames: int,
    bitrate_index: int = 9,
    sample_rate_index: int = 0,
    version_bits: int = 3,
    layer: int = 3,
    mono: bool = False,
    id3v2_bytes: int = 0,
) -> bytes:
    """Synthesize a structurally-valid frame sequence (headers real,
    payloads zero) for tests/oracles.  No padding bit, so frame length is
    constant and closed-form replayable in SQL."""
    layer_bits = 4 - layer
    b1 = 0xE0 | (version_bits << 3) | (layer_bits << 1) | 1  # no CRC
    b2 = (bitrate_index << 4) | (sample_rate_index << 2)
    b3 = (0xC0 if mono else 0x00) | 0x04
    info = _frame_info(0xFF, b1, b2, b3)
    if info is None:
        raise ValueError("invalid synthetic header parameters")
    header = bytes([0xFF, b1, b2, b3])
    frame = header + b"\x00" * (info["frame_len"] - 4)
    out = bytearray()
    if id3v2_bytes:
        body = id3v2_bytes - 10
        out += b"ID3\x04\x00\x00" + bytes(
            [
                (body >> 21) & 0x7F,
                (body >> 14) & 0x7F,
                (body >> 7) & 0x7F,
                body & 0x7F,
            ]
        )
        out += b"\x00" * body
    out += frame * n_frames
    return bytes(out)
