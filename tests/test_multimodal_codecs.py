"""Codec-level tests for the REAL multimodal decoders: PNG pixel decode
(stdlib zlib inflate + per-filter unfilter) and WAV PCM sample decode.
These complement q181/q182's arithmetic oracles with content-exact
round-trips, palette expansion and corrupt-payload tolerance."""

import numpy as np
import pytest

from riptable_spark.operators.multimodal import (
    decode_png_pixels,
    decode_wav_samples,
    encode_png,
    encode_wav,
)


@pytest.mark.parametrize("dims", [(1, 1, 1), (3, 2, 3), (8, 6, 3), (16, 9, 4), (5, 7, 1), (2, 2, 2)])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4, "mixed"])
def test_png_roundtrip_all_filters(dims, filt):
    w, h, c = dims
    rng = np.random.default_rng(w * 1000 + h * 10 + c)
    px = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
    dec = decode_png_pixels(encode_png(px, w, h, c, filters=filt))
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, c)
    assert dec["pixels"] == px


def test_png_palette_expands_to_rgb():
    import struct
    import zlib

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    w, h = 4, 3
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], dtype=np.uint8)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    lines = bytearray()
    for y in range(h):
        lines.append(0)
        lines += idx[y].tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">II", w, h) + bytes([8, 3, 0, 0, 0]))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    dec = decode_png_pixels(png)
    assert dec["channels"] == 3
    assert dec["pixels"] == np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx].tobytes()


def test_png_corrupt_tolerance():
    px = bytes(range(12))
    good = encode_png(px, 2, 2, 3)
    assert decode_png_pixels(b"") is None
    assert decode_png_pixels(b"junk") is None
    assert decode_png_pixels(good[:30]) is None  # truncated mid-chunk
    # corrupted deflate stream must return None or a decode, never raise
    bad = bytearray(good)
    bad[45] ^= 0xFF
    decode_png_pixels(bytes(bad))
    # 16-bit depth unsupported -> None, not garbage
    deep = bytearray(good)
    deep[24] = 16
    assert decode_png_pixels(bytes(deep)) is None


def test_wav_roundtrip_s16():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=101).astype("<i2")
    dec = decode_wav_samples(encode_wav(s, channels=2, sample_rate=8000))
    assert dec["channels"] == 2 and dec["sample_rate"] == 8000
    np.testing.assert_allclose(dec["samples"], s.astype(np.float64) / 32768.0)
    assert decode_wav_samples(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_wav_samples(b"") is None
