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
