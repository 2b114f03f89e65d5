"""Pure-python WAV (RIFF PCM16) codec — the audio leg of the multimodal
decode surface.

Like `functions/png.py` (images) and `functions/mjpeg.py` (video), this is
a from-scratch spec implementation so the engine's audio path decodes REAL
bytes instead of stubbing: a minimal RIFF writer/reader for mono/stereo
16-bit PCM, the format every capture pipeline can emit.  The reference has
no audio layer (osm-merge is vector-only); audio enters through the
interleaved spans model (SURVEY.md §1.2 — media spans are opaque binaries
with typed metadata), where a 100 TB corpus mixes text, imagery, and audio
in one table.

Decode is numpy-vectorized (`np.frombuffer` over the data chunk) and runs
inside Arrow-batched `mapInPandas` workers — per-row cost is a header walk
plus one buffer view, no per-sample Python.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_pcm16(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """Serialize int16 samples to a canonical RIFF/WAVE PCM file.

    ``samples`` is interleaved when ``channels > 1``; little-endian
    throughout (the spec's only byte order for PCM WAVE).
    """
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, rate, byte_rate, block_align, 16
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff_len = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data


def decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM16 file → (sample_rate, channels, int16 array).

    Walks the chunk list (tolerating extra chunks like LIST/fact before
    data, and fmt extensions); raises ValueError on non-RIFF input or a
    non-PCM16 format — honest failure, never fabricated samples.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    pcm: bytes | None = None
    while pos + 8 <= len(blob):
        cid, clen = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAVE format ({audio_fmt}, {bits}-bit)")
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    samples = np.frombuffer(pcm[: len(pcm) - (len(pcm) % 2)], dtype="<i2")
    return int(rate), int(channels), samples
