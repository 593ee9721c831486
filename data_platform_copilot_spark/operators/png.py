"""Minimal pure-stdlib PNG codec (zlib + struct, no Pillow).

Exists so the multimodal operators have a REAL decode path in
environments without image libraries: PNG is the one raster format
whose container (RFC 2083) is fully decodable with the standard
library — zlib inflate + per-row unfiltering. Scope is deliberately
narrow: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlacing — i.e. what `PIL.Image.save(format="PNG")`
emits by default for the common modes. Anything else raises
``UnsupportedPNG`` so callers can fall through to Pillow or fail
loudly.

Everything here is driver-free pure bytes->lists computation: it runs
inside Arrow ``mapInPandas`` workers (operators/multimodal.py), one
image per call, no Spark imports.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedPNG(ValueError):
    """Valid-looking PNG outside this codec's scope (non-8-bit,
    palette, interlaced) — callers fall through to Pillow."""


def is_png(payload: bytes | None) -> bool:
    return payload is not None and payload[:8] == SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(payload: bytes):
    """payload -> (width, height, channels, rows) where rows is a
    list of ``height`` bytearrays of ``width * channels`` samples."""
    if not is_png(payload):
        raise UnsupportedPNG("missing PNG signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = (struct.unpack(">I", payload[pos:pos + 4]),
                            payload[pos + 4:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise UnsupportedPNG("truncated PNG (no IHDR/IDAT)")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0 \
            or interlace != 0:
        raise UnsupportedPNG(
            f"unsupported PNG shape: depth={depth} color={color} "
            f"interlace={interlace}")
    ch = _CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise UnsupportedPNG("inflated size mismatch")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                upleft = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise UnsupportedPNG(f"unknown filter {ftype}")
        rows.append(line)
        prev = line
    return width, height, ch, rows


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode(width: int, height: int, channels: int,
           rows: list[bytearray] | list[bytes],
           level: int = 6) -> bytes:
    """(width, height, channels, rows) -> PNG bytes (filter 0 rows,
    single IDAT). channels: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA.
    ``level`` is the zlib compression level: different levels yield
    byte-distinct files for IDENTICAL pixels (the case perceptual
    dedup exists for and byte-hash dedup misses)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, level))
            + _chunk(b"IEND", b""))


def resize_nearest(width: int, height: int, channels: int,
                   rows, target_w: int, target_h: int):
    """Nearest-neighbor resample — the deterministic resize every
    engine reproduces bit-for-bit (src index = floor(i * src/dst))."""
    out: list[bytearray] = []
    for ty in range(target_h):
        sy = ty * height // target_h
        src = rows[sy]
        line = bytearray(target_w * channels)
        for tx in range(target_w):
            sx = tx * width // target_w
            line[tx * channels:(tx + 1) * channels] = \
                src[sx * channels:(sx + 1) * channels]
        out.append(line)
    return out


def luminance_bands(width: int, height: int, channels: int,
                    rows, n_bands: int = 8) -> list[float]:
    """n_bands-dim feature: mean luminance of horizontal bands,
    scaled to [-1, 1]. Luminance = integer mean of the color
    channels (alpha excluded) — exact integer arithmetic until the
    final division, so every runtime agrees."""
    color_ch = 1 if channels in (1, 2) else 3
    sums = [0] * n_bands
    counts = [0] * n_bands
    for y in range(height):
        band = min(y * n_bands // height, n_bands - 1)
        row = rows[y]
        for x in range(width):
            base = x * channels
            lum = sum(row[base:base + color_ch]) // color_ch
            sums[band] += lum
            counts[band] += 1
    return [(sums[i] / counts[i]) / 127.5 - 1.0 if counts[i] else 0.0
            for i in range(n_bands)]
