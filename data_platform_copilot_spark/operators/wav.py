"""Pure-stdlib WAV (RIFF PCM) codec — the audio twin of png.py.

No audio libraries ship in this container, but RIFF/WAVE PCM is a
40-line struct parse, so REAL audio decode needs no dependency at
all: header fields (sample rate / channels / bit depth) and the raw
PCM frames come straight from the bytes. Supports the formats a
pretraining-ingest gate actually sees from synthetic/probe fixtures:
uncompressed PCM (format tag 1), 8- or 16-bit, any channel count.
Everything else raises UnsupportedWAV — the caller's decode ladder
(operators/multimodal.DECODERS) falls back, mirroring the PNG path.

Reference has no audio handling at all; this implements the
north-star brief's multimodal ask with verifiable arithmetic
(integer samples, rational features) instead of an opaque codec.
"""

from __future__ import annotations

import struct

_RIFF = b"RIFF"
_WAVE = b"WAVE"


class UnsupportedWAV(ValueError):
    """Payload is not a PCM WAV this codec handles."""


def is_wav(payload: bytes | None) -> bool:
    return (payload is not None and len(payload) >= 12
            and payload[:4] == _RIFF and payload[8:12] == _WAVE)


def decode(payload: bytes):
    """-> (sample_rate, n_channels, bits, frames) where frames is a
    list of per-frame tuples of signed ints (one per channel)."""
    if not is_wav(payload):
        raise UnsupportedWAV("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        ctype = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if ctype == b"fmt ":
            if size < 16:
                raise UnsupportedWAV("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif ctype == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedWAV("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1:
        raise UnsupportedWAV(f"non-PCM format tag {audio_format}")
    if bits not in (8, 16):
        raise UnsupportedWAV(f"unsupported bit depth {bits}")
    if n_channels < 1:
        raise UnsupportedWAV("zero channels")
    if bits == 16:
        n = len(data) // 2
        flat = struct.unpack(f"<{n}h", data[:n * 2])
    else:
        # 8-bit WAV is unsigned; center to signed
        flat = tuple(b - 128 for b in data)
    frames = [tuple(flat[i:i + n_channels])
              for i in range(0, len(flat) - n_channels + 1, n_channels)]
    return sample_rate, n_channels, bits, frames


def encode(sample_rate: int, n_channels: int, bits: int,
           frames) -> bytes:
    """Minimal-chunk PCM WAV writer (fmt + data)."""
    if bits not in (8, 16):
        raise UnsupportedWAV(f"unsupported bit depth {bits}")
    flat = [s for fr in frames for s in fr]
    if bits == 16:
        data = struct.pack(f"<{len(flat)}h", *flat)
    else:
        data = bytes((s + 128) & 0xFF for s in flat)
    block_align = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\x00" if len(data) & 1 else b""))
    return _RIFF + struct.pack("<I", 4 + len(chunks)) + _WAVE + chunks


def mean_abs_bands(frames, n_bands: int = 8,
                   channel: int = 0) -> list[float]:
    """Mean absolute amplitude of ``n_bands`` equal time slices of
    one channel, normalized to [0, 1] against int16 full scale — the
    8-dim audio feature (deliberately mean-abs, not RMS: integer
    sums over integer samples divide to an exact rational both a SQL
    replay and numpy reproduce bit-for-bit)."""
    n = len(frames)
    if n == 0:
        return [0.0] * n_bands
    sums = [0] * n_bands
    counts = [0] * n_bands
    for t, fr in enumerate(frames):
        b = min(t * n_bands // n, n_bands - 1)
        sums[b] += abs(fr[channel])
        counts[b] += 1
    return [(s / c) / 32768.0 if c else 0.0
            for s, c in zip(sums, counts)]
