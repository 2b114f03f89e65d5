"""Pure-python PNG codec (stdlib ``zlib`` + numpy scanline unfiltering).

No image libraries ship in this container, but PNG itself is just chunked
zlib (public spec, RFC 2083 / W3C PNG): this module gives the media
operators a REAL decode path — IHDR parse, IDAT inflate, and the five
scanline filters (None/Sub/Up/Average/Paeth) — for 8-bit greyscale, RGB,
and RGBA images, plus a matching encoder used to synthesize valid test
tiles.  The per-image work is tiny and bounded (basemap tiles); batches of
images are handled by the Arrow-batched media kernels that call this.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(blob: bytes | None) -> bool:
    return blob is not None and bytes(blob[:8]) == _MAGIC


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec §6.6), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(np.uint8)


def encode_png(img: np.ndarray, filters: np.ndarray | int | None = None) -> bytes:
    """(h, w) or (h, w, {2,3,4}) uint8 → PNG bytes.

    ``filters`` picks the per-scanline filter type (0-4); an int applies one
    type to every row, None defaults to 0.  Synthesizing tiles with
    ``filters = row % 5`` drives every unfilter branch of the decoder."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if filters is None:
        filt = np.zeros(h, dtype=np.int64)
    elif np.isscalar(filters):
        filt = np.full(h, int(filters), dtype=np.int64)
    else:
        filt = np.asarray(filters, dtype=np.int64)

    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for r in range(h):
        row = img[r]
        f = int(filt[r])
        left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
        upleft = np.vstack([np.zeros((1, ch), np.uint8), prev[:-1]])
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            enc = (row.astype(np.int16) - left.astype(np.int16)) % 256
        elif f == 2:  # Up
            enc = (row.astype(np.int16) - prev.astype(np.int16)) % 256
        elif f == 3:  # Average
            enc = (row.astype(np.int16) - (left.astype(np.int16) + prev.astype(np.int16)) // 2) % 256
        elif f == 4:  # Paeth
            enc = (row.astype(np.int16) - _paeth(left, prev, upleft).astype(np.int16)) % 256
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 (greyscale) or (h, w, ch) uint8.

    Supports 8-bit depth, color types 0/2/4/6, no interlace — the full
    filter set (0-4) is unfiltered scanline by scanline with vectorized
    per-row numpy (the sequential dependency is across rows; within a row
    Sub/Paeth run a tight loop over pixels in int16)."""
    blob = bytes(blob)
    if not is_png(blob):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(f"unsupported PNG: depth={bit_depth} color={color_type} interlace={interlace}")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1)
        line = line.reshape(w, ch).astype(np.int16)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev.astype(np.int16)) % 256
        elif f == 1:  # Sub: sequential in-row
            rec = line.copy()
            for i in range(1, w):
                rec[i] = (rec[i] + rec[i - 1]) % 256
        elif f == 3:  # Average
            rec = line.copy()
            p16 = prev.astype(np.int16)
            rec[0] = (rec[0] + p16[0] // 2) % 256
            for i in range(1, w):
                rec[i] = (rec[i] + (rec[i - 1] + p16[i]) // 2) % 256
        elif f == 4:  # Paeth
            rec = line.copy()
            p16 = prev.astype(np.int16)
            rec[0] = (rec[0] + p16[0]) % 256  # left=upleft=0 → predictor = up
            for i in range(1, w):
                pred = _paeth(
                    rec[i - 1].astype(np.uint8),
                    prev[i],
                    prev[i - 1],
                )
                rec[i] = (rec[i] + pred.astype(np.int16)) % 256
        else:
            raise ValueError(f"bad filter byte {f}")
        out[r] = rec.astype(np.uint8)
        prev = out[r]
    return out[:, :, 0] if ch == 1 else out
