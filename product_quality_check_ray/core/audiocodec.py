"""Pure-stdlib WAV (RIFF) PCM16 codec.

The container ships no audio libraries, so the multimodal audio stage
(reference analog: the second-media-modality ingestion path,
``prompts/artwork_processing_common.py:139-156`` — images there, audio here)
implements the one losslessly-codable audio container natively: WAV is a
RIFF chunk walk plus little-endian int16 frames. Both directions are
implemented so fixtures carry REAL payloads and the decoder is exercised
end-to-end (encode→decode round-trips are identity; verified in tests).

Decoding is numpy-vectorized (one ``frombuffer`` over the data chunk).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """int16 samples (frames,) or (frames, channels) → WAV bytes
    (PCM format 1, 16-bit, little-endian)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] != n_channels:
        raise ValueError("samples shape does not match n_channels")
    data = np.ascontiguousarray(s).tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples (frames, channels), sample_rate).

    Walks RIFF chunks (unknown chunks skipped, word-aligned), requires PCM
    format 1 at 16 bits.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(payload)
    sample_rate = n_channels = None
    data: bytes | None = None
    while i + 8 <= n:
        tag = payload[i : i + 4]
        (length,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + length]
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("truncated fmt chunk")
            audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM16)")
        elif tag == b"data":
            data = body
        i += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("truncated WAV (missing fmt or data chunk)")
    frames = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        frames = frames.reshape(-1, n_channels)
    else:
        frames = frames[:, None]
    return frames.astype(np.int16), int(sample_rate)
