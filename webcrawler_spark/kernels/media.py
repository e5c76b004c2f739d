"""Pure-Python image-container kernels for the multimodal surface.

No image libraries exist in this container, so the decode path works at
the binary-container level: real PNG signatures/IHDR chunks (with CRC)
and real JPEG marker segments (SOI/APP0/SOFn) are built and parsed with
struct-level code. A production deployment swaps ``parse_image`` for
PIL/ffmpeg behind the same (bytes) -> metadata contract; everything
Spark-side (Arrow batching, schema, partitioning) is identical.
"""

from __future__ import annotations

import struct
import zlib


def make_png(width: int, height: int) -> bytes:
    """A minimal REAL PNG header: signature + IHDR chunk (CRC included).
    33 bytes; no IDAT (decoders that only read headers — like ours — are
    exercised on authentic structure)."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def make_jpeg(width: int, height: int) -> bytes:
    """A minimal REAL JPEG header: SOI, APP0/JFIF, SOF0 with 3 components.
    39 bytes."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0


def parse_image(blob: bytes) -> tuple[str, int, int] | None:
    """Container sniff + dimension extraction.

    PNG: verify the 8-byte signature, require the first chunk to be IHDR,
    read width/height (big-endian u32). JPEG: walk marker segments from
    SOI until a SOFn (C0-C3, C5-C7, C9-CB, CD-CF) frame header, read
    height/width (big-endian u16). Returns (format, width, height) or
    None for unrecognized/truncated input.
    """
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        if len(blob) < 24 or blob[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", blob[16:24])
        return ("png", w, h)
    if blob[:2] == b"\xff\xd8":
        i = 2
        sof = {
            0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        }
        while i + 4 <= len(blob):
            if blob[i] != 0xFF:
                return None
            marker = blob[i + 1]
            if marker in sof:
                if i + 9 > len(blob):
                    return None
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return ("jpeg", w, h)
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def make_wav(
    sample_rate: int, n_samples: int, channels: int = 1, bits: int = 16
) -> bytes:
    """A REAL RIFF/WAVE container: RIFF header, complete fmt chunk
    (PCM, byte-rate and block-align derived fields included), and a data
    chunk header sized for ``n_samples`` frames (no payload bytes — header
    parsers like ours are exercised on authentic structure). 44 bytes."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
    )


def parse_wav(blob: bytes) -> tuple[int, int, int, int] | None:
    """RIFF/WAVE structural parse: verify RIFF/WAVE magic, then walk the
    chunk list (not fixed offsets — fmt may be preceded by LIST etc.),
    reading PCM params from ``fmt `` and the frame count from ``data``.
    Returns (sample_rate, channels, bits, n_samples) or None."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    i = 12
    rate = ch = bits = block_align = None
    n_samples = None
    while i + 8 <= len(blob):
        cid = blob[i : i + 4]
        size = struct.unpack("<I", blob[i + 4 : i + 8])[0]
        if cid == b"fmt " and size >= 16 and i + 8 + 16 <= len(blob):
            _, ch, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", blob[i + 8 : i + 24]
            )
        elif cid == b"data" and block_align:
            n_samples = size // block_align
        # chunks are word-aligned in RIFF
        i += 8 + size + (size & 1)
    if rate is None or n_samples is None:
        return None
    return (rate, ch, bits, n_samples)


def make_avi(
    width: int, height: int, total_frames: int, us_per_frame: int = 33333
) -> bytes:
    """A REAL AVI container skeleton: RIFF/'AVI ' header, LIST/'hdrl'
    with a complete 56-byte 'avih' main header (frame period, frame
    count, dimensions). No movi payload — header parsers are exercised
    on authentic RIFF structure, like make_png/make_wav."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (AVIF_HASINDEX)
        total_frames,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def parse_avi(blob: bytes) -> tuple[int, int, int, int] | None:
    """AVI structural parse: verify RIFF/'AVI ' magic, walk top-level
    chunks for LIST/'hdrl', then walk the list body for 'avih' and read
    (us_per_frame, total_frames, width, height). Returns None for
    unrecognized/truncated input."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    i = 12
    while i + 8 <= len(blob):
        cid = blob[i : i + 4]
        size = struct.unpack("<I", blob[i + 4 : i + 8])[0]
        if cid == b"LIST" and blob[i + 8 : i + 12] == b"hdrl":
            j = i + 12
            end = min(i + 8 + size, len(blob))
            while j + 8 <= end:
                sub = blob[j : j + 4]
                ssz = struct.unpack("<I", blob[j + 4 : j + 8])[0]
                if sub == b"avih" and j + 8 + 40 <= len(blob):
                    vals = struct.unpack("<10I", blob[j + 8 : j + 48])
                    return (vals[0], vals[4], vals[8], vals[9])
                j += 8 + ssz + (ssz & 1)
            return None
        i += 8 + size + (size & 1)
    return None
