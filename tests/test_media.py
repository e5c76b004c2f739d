"""Binary image-container kernels (multimodal decode surface)."""

from __future__ import annotations

import struct

from webcrawler_spark.kernels.media import make_jpeg, make_png, parse_image


def test_png_roundtrip():
    blob = make_png(641, 13)
    assert len(blob) == 33
    assert parse_image(blob) == ("png", 641, 13)
    # CRC is real: flip a bit in IHDR and the crc no longer matches
    import zlib

    chunk = blob[12:29]
    assert struct.unpack(">I", blob[29:33])[0] == zlib.crc32(chunk) & 0xFFFFFFFF


def test_jpeg_roundtrip_walks_segments():
    blob = make_jpeg(65535, 1)
    assert len(blob) == 39
    assert parse_image(blob) == ("jpeg", 65535, 1)
    # the parser must WALK segments (APP0 first), not read fixed offsets:
    # inject an extra COM segment before SOF0
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    padded = blob[:20] + com + blob[20:]
    assert parse_image(padded) == ("jpeg", 65535, 1)


def test_garbage_and_truncation():
    assert parse_image(b"notanimage") is None
    assert parse_image(make_png(4, 4)[:15]) is None
    assert parse_image(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") is None
