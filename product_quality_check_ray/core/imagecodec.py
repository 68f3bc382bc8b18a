"""Pure-stdlib image codecs: PNG (zlib DEFLATE, filters 0-4) and BMP
(24-bit uncompressed, BI_RGB).

The container ships no image libraries, so the multimodal decode stage
(reference analog: PDF→PIL page ingestion,
``prompts/artwork_processing_common.py:139-156``) implements the two
losslessly-codable containers natively: PNG needs only ``zlib`` (stdlib) for
the DEFLATE stream plus the five per-row prediction filters; BMP is plain
padded rows. Both directions are implemented so fixtures carry REAL payloads
and the decoder is exercised end-to-end (encode→decode round-trips are
identity; verified per filter type in tests).

Decoding is numpy-vectorized per row; PNG Sub/Paeth filters are inherently
sequential along x, so those rows fall back to a per-pixel loop — fine for
the bounded thumbnail sizes a feature-extraction stage handles per batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filters: np.ndarray | None = None) -> bytes:
    """RGB uint8 (h, w, 3) → PNG bytes. ``filters`` optionally sets the
    per-row filter type (0-4); default None (all rows filter 0)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_png expects RGB (h, w, 3)")
    if filters is None:
        filters = np.zeros(h, dtype=np.int64)
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int64)
    for y in range(h):
        row = px[y].astype(np.int64)
        f = int(filters[y])
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            left = np.vstack([np.zeros((1, 3), np.int64), row[:-1]])
            enc = row - left
        elif f == 2:  # Up
            enc = row - prev
        elif f == 3:  # Average
            left = np.vstack([np.zeros((1, 3), np.int64), row[:-1]])
            enc = row - (left + prev) // 2
        elif f == 4:  # Paeth
            left = np.vstack([np.zeros((1, 3), np.int64), row[:-1]])
            ul = np.vstack([np.zeros((1, 3), np.int64), prev[:-1]])
            enc = row - _paeth(left, prev, ul)
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (h, w, 3). Supports bit depth 8, color types
    0 (gray, replicated to RGB), 2 (RGB), 6 (RGBA, alpha dropped),
    non-interlaced, all five row filters."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, n = 8, len(payload)
    w = h = None
    ctype = None
    idat = bytearray()
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            if ctype not in (0, 2, 6):
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        i += 12 + length
    if w is None or not idat:
        raise ValueError("truncated PNG")
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = 1 + w * nch
    if len(raw) != h * stride:
        raise ValueError("PNG payload size mismatch")
    out = np.zeros((h, w, nch), dtype=np.int64)
    prev = np.zeros((w, nch), dtype=np.int64)
    for y in range(h):
        f = raw[y * stride]
        row = np.frombuffer(raw, np.uint8, w * nch, y * stride + 1).astype(np.int64)
        row = row.reshape(w, nch)
        if f == 0:
            cur = row
        elif f == 2:  # Up — vectorized
            cur = (row + prev) % 256
        else:  # Sub / Average / Paeth — sequential along x
            cur = np.zeros_like(row)
            left = np.zeros(nch, dtype=np.int64)
            ul = np.zeros(nch, dtype=np.int64)
            for x in range(w):
                up = prev[x]
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                elif f == 4:
                    pred = _paeth(left, up, ul)
                else:
                    raise ValueError(f"bad PNG filter {f}")
                cur[x] = (row[x] + pred) % 256
                left = cur[x]
                ul = up
        out[y] = cur
        prev = cur
    px = out.astype(np.uint8)
    if ctype == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype == 6:
        px = px[:, :, :3]
    return px


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects RGB (h, w, 3)")
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    body = bytearray()
    bgr = px[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        body.extend(bgr[y].tobytes())
        body.extend(b"\x00" * pad)
    size = 14 + 40 + len(body)
    header = (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → RGB uint8 (h, w, 3); handles bottom-up and
    top-down (negative height) DIBs."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant (need 24-bit BI_RGB)")
    top_down = h < 0
    h = abs(h)
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    if len(payload) < offset + stride * h:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(payload, np.uint8, stride * h, offset).reshape(h, stride)
    bgr = rows[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


def decode_image(payload: bytes) -> np.ndarray:
    """Container dispatch: PNG or BMP → RGB uint8 (h, w, 3)."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError("unrecognized image container")
