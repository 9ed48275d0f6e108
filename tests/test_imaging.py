"""Unit tests for the dependency-free BMP/PPM codecs
(risinglight_spark/functions/imaging.py) — the format corners a naive
implementation gets wrong: BMP row padding, bottom-up order, BGR swap,
top-down (negative height) files, PPM comment/whitespace headers."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from risinglight_spark.functions.imaging import (
    decode_bmp24,
    decode_image,
    decode_ppm,
    encode_bmp24,
    encode_ppm,
)


def _gradient(w: int, h: int) -> np.ndarray:
    return (np.arange(w * h * 3, dtype=np.int64) * 7 % 256).astype(np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (5, 4), (8, 8)])
def test_bmp_round_trip(w, h):
    # widths 1/2/3 exercise 1-3 byte row padding; 8 exercises none
    px = _gradient(w, h)
    data = encode_bmp24(w, h, px)
    rw, rh, c, out = decode_bmp24(data)
    assert (rw, rh, c) == (w, h, 3)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (7, 5)])
def test_ppm_round_trip(w, h):
    px = _gradient(w, h)
    rw, rh, c, out = decode_ppm(encode_ppm(w, h, px))
    assert (rw, rh, c) == (w, h, 3)
    assert np.array_equal(out, px)


def test_bmp_row_order_and_channel_swap_are_inverted():
    # 1x2 image: top pixel pure red, bottom pure blue.  In the file the
    # BOTTOM row comes first and channels are BGR — a decoder that
    # skips either inversion returns the wrong pixel first.
    px = np.array([255, 0, 0, 0, 0, 255], dtype=np.uint8)  # R then B
    data = encode_bmp24(1, 2, px)
    data_offset = struct.unpack_from("<I", data, 10)[0]
    first_stored = data[data_offset : data_offset + 3]
    assert first_stored == b"\xff\x00\x00"  # blue pixel, BGR order
    _, _, _, out = decode_bmp24(data)
    assert np.array_equal(out, px)


def test_bmp_top_down_negative_height():
    px = _gradient(2, 2)
    data = bytearray(encode_bmp24(2, 2, px))
    # flip to top-down: negate height, reorder rows to match
    struct.pack_into("<i", data, 22, -2)
    data_offset = struct.unpack_from("<I", data, 10)[0]
    stride = 8  # 2px * 3B = 6, padded to 8
    r0 = bytes(data[data_offset : data_offset + stride])
    r1 = bytes(data[data_offset + stride : data_offset + 2 * stride])
    data[data_offset : data_offset + stride] = r1
    data[data_offset + stride : data_offset + 2 * stride] = r0
    _, h, _, out = decode_bmp24(bytes(data))
    assert h == 2
    assert np.array_equal(out, px)


def test_ppm_header_with_comments():
    px = _gradient(2, 2)
    body = px.tobytes()
    data = b"P6\n# a comment\n2 2\n# another\n255\n" + body
    w, h, c, out = decode_ppm(data)
    assert (w, h, c) == (2, 2, 3)
    assert np.array_equal(out, px)


def test_decode_image_dispatch_and_unknown():
    px = _gradient(1, 1)
    assert decode_image(encode_bmp24(1, 1, px))[0] == "bmp"
    assert decode_image(encode_ppm(1, 1, px))[0] == "ppm"
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG....")


# -- WAV codec (functions/audio.py) -----------------------------------------


def test_wav_round_trip():
    import numpy as np

    from risinglight_spark.functions.audio import decode_wav, encode_wav_pcm16

    s = np.array([-2048, -1, 0, 1, 2047, 32767, -32768], dtype=np.int16)
    rate, ch, got = decode_wav(encode_wav_pcm16(8000, s))
    assert (rate, ch) == (8000, 1)
    assert got.dtype == np.dtype("<i2") and list(got) == list(s)


def test_wav_decoder_walks_unknown_chunks():
    # a LIST/INFO chunk between fmt and data must be skipped by
    # declared size, including the odd-size word-alignment pad
    import struct

    import numpy as np

    from risinglight_spark.functions.audio import decode_wav, encode_wav_pcm16

    s = np.array([5, -7, 11], dtype=np.int16)
    base = encode_wav_pcm16(4000, s)
    fmt_chunk = base[12:36]
    data_chunk = base[36:]
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad
    body = fmt_chunk + extra + data_chunk
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    rate, ch, got = decode_wav(wav)
    assert rate == 4000 and list(got) == [5, -7, 11]


def test_wav_rejects_non_pcm():
    import struct

    import numpy as np
    import pytest

    from risinglight_spark.functions.audio import decode_wav, encode_wav_pcm16

    s = np.array([1, 2], dtype=np.int16)
    wav = bytearray(encode_wav_pcm16(8000, s))
    struct.pack_into("<H", wav, 20, 3)  # fmt tag 3 = IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(wav))
    with pytest.raises(ValueError):
        decode_wav(b"RIFXjunkWAVE")


def test_wav_stereo_round_trip():
    import numpy as np

    from risinglight_spark.functions.audio import decode_wav, encode_wav_pcm16

    interleaved = np.array([1, -1, 2, -2, 3, -3], dtype=np.int16)  # 3 frames
    rate, ch, got = decode_wav(encode_wav_pcm16(8000, interleaved, channels=2))
    assert (rate, ch) == (8000, 2)
    assert list(got) == list(interleaved)
