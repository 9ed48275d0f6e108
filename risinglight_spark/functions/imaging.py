"""Dependency-free raster codecs: 24-bit BMP and binary PPM (P6).

The multimodal decode stage (operators/multimodal.py) previously
declared its pixel decoder as a stub because the container ships no
image libraries.  These two formats need none: both are plain headers
over raw RGB bytes, so encode/decode is pure bytes/numpy work — real
format logic (BMP's little-endian header fields, bottom-up row order,
BGR channel order, 4-byte row padding; PPM's ASCII header with
whitespace/comment tokenization), honest end-to-end.

Reference parity note: the reference engine has no image columns at
all — this module serves the training-data-pipeline surface (payload
columns + decode stages) the project brief adds on top.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp, uncompressed) --------


def encode_bmp24(width: int, height: int, rgb: np.ndarray) -> bytes:
    """Encode a flat row-major RGB uint8 array (len == w*h*3) as a
    24-bit uncompressed BMP (bottom-up rows, BGR, 4-byte row pad)."""
    rgb = np.asarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * height
    data_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray(img_size)
    bgr = rgb[:, :, ::-1]  # RGB -> BGR
    for y in range(height):
        # bottom-up: image row y lands at block (height-1-y)
        start = (height - 1 - y) * stride
        body[start : start + row_bytes] = bgr[y].tobytes()
    return header + bytes(body)


def decode_bmp24(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a 24bpp uncompressed BMP into (w, h, channels, flat RGB
    row-major uint8 array), inverting bottom-up order, BGR, and pad."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    if header_size < 40:
        raise ValueError(f"unsupported DIB header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((height, width, 3), dtype=np.uint8)
    for y in range(height):
        src_row = (height - 1 - y) if bottom_up else y
        start = data_offset + src_row * stride
        row = np.frombuffer(data, dtype=np.uint8, count=row_bytes, offset=start)
        out[y] = row.reshape(width, 3)[:, ::-1]  # BGR -> RGB
    return width, height, 3, out.reshape(-1)


# --- PPM (P6 binary) -------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: np.ndarray) -> bytes:
    rgb = np.asarray(rgb, dtype=np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + rgb.tobytes()


def _ppm_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens after the magic,
    skipping '#' comments, returning (values, offset past the single
    whitespace byte that terminates the last token)."""
    vals: list[int] = []
    pos = 2  # past "P6"
    while len(vals) < n:
        while data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    return vals, pos + 1  # exactly one whitespace after maxval


def decode_ppm(data: bytes) -> tuple[int, int, int, np.ndarray]:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (width, height, maxval), offset = _ppm_tokens(data, 3)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = width * height * 3
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=offset)
    return width, height, 3, px.copy()


def decode_image(data: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Dispatch on magic bytes; returns (fmt, w, h, channels, pixels)."""
    if data[:2] == b"BM":
        return ("bmp", *decode_bmp24(data))
    if data[:2] == b"P6":
        return ("ppm", *decode_ppm(data))
    raise ValueError(f"unknown image payload magic {data[:2]!r}")
