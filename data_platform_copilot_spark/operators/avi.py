"""Pure-stdlib AVI (RIFF, uncompressed DIB frames) codec — the video
twin of png.py / wav.py, completing the real-decode trifecta.

An AVI with BI_RGB (uncompressed) 24-bit frames is just a RIFF walk:
`avih` gives dimensions / frame count / frame duration, the `movi`
LIST holds one `00db` chunk per frame of bottom-up BGR rows padded
to 4-byte stride — standard DIB layout, so the encoder's output is a
spec-conforming AVI any player opens. Compressed streams (`00dc`
with a codec) raise UnsupportedAVI and the caller's decode ladder
(operators/multimodal.DECODERS) falls back, mirroring the PNG and
WAV paths. No video library exists in this container; none is
needed for this class of payload.
"""

from __future__ import annotations

import struct


class UnsupportedAVI(ValueError):
    """Payload is not an uncompressed-DIB AVI this codec handles."""


def is_avi(payload: bytes | None) -> bool:
    return (payload is not None and len(payload) >= 12
            and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ")


def _walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size, list_type|None)."""
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc in (b"RIFF", b"LIST"):
            ltype = payload[pos + 8:pos + 12]
            yield fourcc, pos + 12, size - 4, ltype
        else:
            yield fourcc, pos + 8, size, None
        pos += 8 + size + (size & 1)


def decode(payload: bytes):
    """-> (width, height, fps, frames): frames are lists of top-down
    RGB rows (bytearray of 3*width per row)."""
    if not is_avi(payload):
        raise UnsupportedAVI("not a RIFF/AVI payload")
    width = height = None
    usec_per_frame = None
    raw_frames: list[bytes] = []

    def visit(pos: int, end: int) -> None:
        nonlocal width, height, usec_per_frame
        for fourcc, body, size, ltype in _walk(payload, pos, end):
            if fourcc == b"LIST":
                visit(body, body + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", payload, body)
                usec_per_frame = vals[0]
                width, height = vals[8], vals[9]
            elif fourcc == b"00dc":
                raise UnsupportedAVI("compressed video stream")
            elif fourcc == b"00db":
                raw_frames.append(payload[body:body + size])

    visit(12, len(payload))
    if width is None or usec_per_frame in (None, 0):
        raise UnsupportedAVI("missing avih header")
    if not raw_frames:
        raise UnsupportedAVI("no uncompressed frames")
    stride = ((width * 3 + 3) // 4) * 4
    frames = []
    for raw in raw_frames:
        if len(raw) < stride * height:
            raise UnsupportedAVI("truncated frame")
        rows = []
        for y in range(height):
            # DIB rows are bottom-up BGR; emit top-down RGB
            off = (height - 1 - y) * stride
            row = bytearray(width * 3)
            for x in range(width):
                b, g, r = raw[off + 3 * x:off + 3 * x + 3]
                row[3 * x:3 * x + 3] = bytes((r, g, b))
            rows.append(row)
        frames.append(rows)
    fps = 1_000_000 / usec_per_frame
    return width, height, fps, frames


def encode(width: int, height: int, fps: int, frames) -> bytes:
    """Minimal spec-conforming AVI: hdrl(avih + strl(strh+strf)) +
    movi with one 00db DIB chunk per frame. ``frames`` are top-down
    RGB rows as produced by decode()."""
    stride = ((width * 3 + 3) // 4) * 4
    chunks = []
    for rows in frames:
        raw = bytearray(stride * height)
        for y, row in enumerate(rows):
            off = (height - 1 - y) * stride
            for x in range(width):
                r, g, b = row[3 * x:3 * x + 3]
                raw[off + 3 * x:off + 3 * x + 3] = bytes((b, g, r))
        chunks.append(_chunk(b"00db", bytes(raw)))
    movi = _list(b"movi", b"".join(chunks))
    frame_bytes = stride * height
    avih = _chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,
        len(frames), 0, 1, frame_bytes, width, height, 0, 0, 0, 0))
    strh = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps,
        0, len(frames), frame_bytes, 0xFFFFFFFF, 0,
        0, 0, width, height))
    strf = _chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_bytes,
        0, 0, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    return (fourcc + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))


def _list(ltype: bytes, data: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(data)) + ltype + data


def temporal_luma_bands(width: int, height: int, frames,
                        n_bands: int = 8) -> list[float]:
    """Mean luminance ((r+g+b) DIV 3, the png.py convention) of
    ``n_bands`` equal TIME slices of the frame sequence, normalized
    to [-1, 1] — the video feature: integer sums, exact rational
    mean, replayable in SQL."""
    n = len(frames)
    if n == 0:
        return [0.0] * n_bands
    sums = [0] * n_bands
    counts = [0] * n_bands
    for t, rows in enumerate(frames):
        band = min(t * n_bands // n, n_bands - 1)
        for row in rows:
            for x in range(width):
                r, g, b = row[3 * x:3 * x + 3]
                sums[band] += (r + g + b) // 3
        counts[band] += width * height
    return [s / c / 127.5 - 1.0 if c else 0.0
            for s, c in zip(sums, counts)]
