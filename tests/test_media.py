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


def test_wav_roundtrip_and_chunk_walk():
    from webcrawler_spark.kernels.media import make_wav, parse_wav

    b = make_wav(16000, 48000, channels=2, bits=16)
    assert len(b) == 44
    assert parse_wav(b) == (16000, 2, 16, 48000)
    # the parser walks chunks — a LIST chunk before fmt must be skipped
    import struct

    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx"  # odd size: word-align pad
    spliced = b[:12] + lst + b"\x00" + b[12:]
    assert parse_wav(spliced) == (16000, 2, 16, 48000)


def test_wav_garbage_and_truncation():
    from webcrawler_spark.kernels.media import make_wav, parse_wav

    assert parse_wav(b"RIFFxxxxJUNK") is None
    assert parse_wav(b"") is None
    assert parse_wav(make_wav(8000, 10)[:16]) is None


def test_avi_roundtrip_and_garbage():
    from webcrawler_spark.kernels.media import make_avi, parse_avi

    b = make_avi(640, 360, 250, us_per_frame=40000)
    assert parse_avi(b) == (40000, 250, 640, 360)
    assert parse_avi(b"RIFF\x00\x00\x00\x00WAVE") is None  # wrong RIFF form
    assert parse_avi(b[:30]) is None
    assert parse_avi(b"") is None


def test_media_roundtrip_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from webcrawler_spark.kernels.media import (
        make_avi,
        make_jpeg,
        make_png,
        make_wav,
        parse_avi,
        parse_image,
        parse_wav,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(1, 65535),
        h=st.integers(1, 65535),
        rate=st.integers(1, 192000),
        n=st.integers(0, 10**6),
        ch=st.integers(1, 8),
        bits=st.sampled_from([8, 16, 24, 32]),
        frames=st.integers(0, 10**6),
        upf=st.integers(1, 10**6),
    )
    def prop(w, h, rate, n, ch, bits, frames, upf):
        assert parse_image(make_png(w, h)) == ("png", w, h)
        assert parse_image(make_jpeg(w, h)) == ("jpeg", w, h)
        assert parse_wav(make_wav(rate, n, channels=ch, bits=bits)) == (
            rate,
            ch,
            bits,
            n,
        )
        assert parse_avi(make_avi(w, h, frames, us_per_frame=upf)) == (
            upf,
            frames,
            w,
            h,
        )

    prop()
