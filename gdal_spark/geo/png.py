"""From-scratch PNG codec (stdlib zlib only) — the tile ARTIFACT
writer gdal2tiles.py gets from its PNG driver (swne/gdal2tiles.py
writes every base/overview tile as a PNG file).

No image libraries exist in this environment, so the container format
is implemented directly from the PNG specification (RFC 2083 / ISO
15948): signature, big-endian chunk layout with CRC-32, IHDR,
zlib-compressed IDAT scanlines with per-row filter bytes, IEND.

Encoder: 8-bit greyscale (``color_type`` 0), RGB (2) or RGBA (6) from
an (h, w[, c]) uint8 array; every scanline uses filter 0 (None) — a
valid, universally readable choice (compression ratio is zlib's job;
tile payloads here are small).

Decoder: full filter support (None/Sub/Up/Average/Paeth, the spec's
reconstruction functions) for the same color types + bit depth 8, so
round-trips of third-party-filtered PNGs also work, not just our own
output. Everything is numpy row arithmetic; no per-pixel Python except
the inherently sequential Paeth/Average carry along a scanline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # 3 = palette indices


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) → greyscale, (h, w, 3) → RGB, (h, w, 4) → RGBA; uint8."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_png wants uint8 (quantize first)")
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        color_type = {3: 2, 4: 6}[a.shape[2]]
        channels = a.shape[2]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended per scanline
    raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), 6)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """→ (h, w) for greyscale, (h, w, c) for RGB/RGBA; validates the
    signature and every chunk CRC."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    off = 8
    ihdr = None
    idat = bytearray()
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4:off + 8]
        payload = data[off + 8:off + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, off + 8 + ln)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        off += 12 + ln
    return _decode_scanlines(ihdr, idat)


def png_palette(data: bytes) -> list:
    """PLTE entries of a color-type-3 PNG as (idx, r, g, b) rows —
    the color table gdal's PNG driver exposes (enumeration metadata,
    ≤256 rows, broadcast by consumers)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    while off + 8 <= len(data):
        ln, tag = struct.unpack(">I4s", data[off:off + 8])
        if tag == b"PLTE":
            p = data[off + 8:off + 8 + ln]
            return [(i, p[3 * i], p[3 * i + 1], p[3 * i + 2])
                    for i in range(ln // 3)]
        if tag == b"IEND":
            break
        off += 12 + ln
    raise ValueError("PNG has no PLTE chunk")


def _decode_scanlines(ihdr, idat):
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError("scanline payload size mismatch")
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ftype, line = raw[y, 0], raw[y, 1:].copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: carry left
            cur = np.zeros_like(line)
            left = np.zeros(ch, dtype=np.uint8)
            ul = np.zeros(ch, dtype=np.uint8)
            for x in range(0, w * ch, ch):
                up = prev[x:x + ch]
                if ftype == 1:
                    rec = line[x:x + ch] + left
                elif ftype == 3:
                    rec = line[x:x + ch] + (
                        (left.astype(np.int32) + up.astype(np.int32))
                        // 2).astype(np.uint8)
                else:
                    rec = line[x:x + ch] + _paeth(left, up, ul)
                cur[x:x + ch] = rec
                left = rec
                ul = up
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
