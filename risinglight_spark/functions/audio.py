"""Dependency-free WAV (RIFF PCM16) encode/decode.

The audio sibling of functions/imaging.py: the container holds no
audio libraries, but canonical PCM WAV is a fixed 44-byte RIFF header
plus little-endian int16 samples — fully decodable with struct +
numpy.  Used by the multimodal audio entry to round-trip genuine WAV
payloads so the decode stage is REAL (header parse, chunk walk,
sample extraction), value-verified by a closed-form oracle.

Format notes (public RIFF/WAVE spec): "RIFF" <size> "WAVE", a "fmt "
chunk (PCM: tag 1, channels, sample rate, byte rate, block align,
bits) and a "data" chunk with raw samples.  Decode walks chunks by
declared size, so extra chunks (LIST/INFO) are skipped correctly.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_pcm16(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    """Canonical 44-byte-header PCM16 WAV."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    block_align = 2 * channels
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ", 16, 1, channels, rate, rate * block_align, block_align, 16,
    )
    chunks = fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a PCM16 WAV; returns (rate, channels, samples int16).
    Walks the chunk list by declared sizes (skipping unknown chunks)
    rather than assuming a fixed layout."""
    riff, _size, wave = struct.unpack_from("<4sI4s", data, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {riff!r}/{wave!r}")
    pos = 12
    rate = channels = bits = None
    samples = None
    while pos + 8 <= len(data):
        cid, csize = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding tag={tag} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=csize // 2, offset=body)
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return int(rate), int(channels), samples
