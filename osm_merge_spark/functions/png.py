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


def _norm_filters(filters, h: int) -> np.ndarray:
    if filters is None:
        return np.zeros(h, dtype=np.int64)
    if np.isscalar(filters):
        return np.full(h, int(filters), dtype=np.int64)
    return np.asarray(filters, dtype=np.int64)


def _filter_rows(img: np.ndarray, filt: np.ndarray) -> bytes:
    """(h, w, ch) uint8 + per-row filter types → raw filtered scanlines
    (the pre-deflate byte stream, shared by PNG IDAT and APNG fdAT)."""
    h, w, ch = img.shape
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
    return bytes(raw)


def _as_3d(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.uint8)
    return img[:, :, None] if img.ndim == 2 else img


def encode_png(img: np.ndarray, filters: np.ndarray | int | None = None) -> bytes:
    """(h, w) or (h, w, {2,3,4}) uint8 → PNG bytes.

    ``filters`` picks the per-scanline filter type (0-4); an int applies one
    type to every row, None defaults to 0.  Synthesizing tiles with
    ``filters = row % 5`` drives every unfilter branch of the decoder."""
    img = _as_3d(img)
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = _filter_rows(img, _norm_filters(filters, h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


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
    out = _defilter(raw, w, h, ch)
    return out[:, :, 0] if ch == 1 else out


def _defilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Raw inflated scanlines → (h, w, ch) uint8 (shared by PNG IDAT and
    APNG fdAT streams)."""
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
    return out


# ---------------------------------------------------------------------------
# APNG (animated PNG): acTL / fcTL / fdAT chunks over the same inflate +
# unfilter path — gives the frame-sampling operator a REAL demuxer for one
# genuine animation container (public spec: wiki.mozilla.org/APNG).
# ---------------------------------------------------------------------------


def is_apng(blob: bytes | None) -> bool:
    """True when the PNG carries an acTL chunk before IDAT."""
    if not is_png(blob):
        return False
    blob = bytes(blob)
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        if tag == b"acTL":
            return True
        if tag in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def encode_apng(
    frames: list[np.ndarray],
    delays: list[tuple[int, int]] | None = None,
    filters: np.ndarray | int | None = None,
    offsets: list[tuple[int, int]] | None = None,
) -> bytes:
    """Frame list → APNG bytes.

    The first frame is the full canvas (IDAT, preceded by its fcTL); later
    frames may be sub-regions placed at ``offsets[i]`` (fdAT).  ``delays``
    are (numerator, denominator) pairs, default (1, 10); blend op is
    SOURCE, dispose op NONE — the pair the decoder composites."""
    if not frames:
        raise ValueError("need at least one frame")
    f0 = _as_3d(frames[0])
    h, w, ch = f0.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    delays = delays or [(1, 10)] * len(frames)
    offsets = offsets or [(0, 0)] * len(frames)

    def fctl(seq: int, fw: int, fh: int, x: int, y: int, d: tuple[int, int]) -> bytes:
        return _chunk(
            b"fcTL", struct.pack(">IIIIIHHBB", seq, fw, fh, x, y, d[0], d[1], 0, 0)
        )

    out = bytearray(_MAGIC)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    out += fctl(seq, w, h, 0, 0, delays[0])
    seq += 1
    out += _chunk(b"IDAT", zlib.compress(_filter_rows(f0, _norm_filters(filters, h))))
    for i, frame in enumerate(frames[1:], start=1):
        fi = _as_3d(frame)
        fh, fw, fch = fi.shape
        if fch != ch:
            raise ValueError("all frames must share the channel count")
        x, y = offsets[i]
        if x + fw > w or y + fh > h:
            raise ValueError("frame region exceeds the canvas")
        out += fctl(seq, fw, fh, x, y, delays[i])
        seq += 1
        raw = zlib.compress(_filter_rows(fi, _norm_filters(filters, fh)))
        out += _chunk(b"fdAT", struct.pack(">I", seq) + raw)
        seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(blob: bytes) -> tuple[list[np.ndarray], list[tuple[int, int]]]:
    """APNG bytes → (full-canvas frames, (delay_num, delay_den) pairs).

    Supports 8-bit depth, color types 0/2/4/6, no interlace; dispose ops
    NONE(0) and BACKGROUND(1), blend ops SOURCE(0) and, for alpha images,
    OVER(1).  Each frame is composited to the full canvas, so the caller
    sees what a viewer would render.  A default-image-only PNG (no acTL)
    raises — use :func:`decode_png`."""
    blob = bytes(blob)
    if not is_png(blob):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    n_frames = None
    # collected per-frame state: (fw, fh, x, y, delay, dispose, blend, zdata)
    fctls: list[dict] = []
    default_idat_is_frame0 = False
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _c, _f, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"acTL":
            n_frames, _plays = struct.unpack(">II", body)
        elif tag == b"fcTL":
            _seq, fw, fh, x, y, dn, dd, dispose, blend = struct.unpack(">IIIIIHHBB", body)
            fctls.append(
                {"fw": fw, "fh": fh, "x": x, "y": y, "delay": (dn, dd),
                 "dispose": dispose, "blend": blend, "z": bytearray()}
            )
            if not idat:
                default_idat_is_frame0 = True
        elif tag == b"IDAT":
            idat += body
            if default_idat_is_frame0 and fctls:
                fctls[0]["z"] += body
        elif tag == b"fdAT":
            if not fctls:
                raise ValueError("fdAT before any fcTL")
            fctls[-1]["z"] += body[4:]  # skip the sequence number
        elif tag == b"IEND":
            break
    if n_frames is None:
        raise ValueError("not an APNG (no acTL)")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(f"unsupported APNG: depth={bit_depth} color={color_type} interlace={interlace}")
    ch = _CHANNELS[color_type]
    canvas = np.zeros((h, w, ch), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[tuple[int, int]] = []
    for fc in fctls[: n_frames if n_frames else None]:
        region = _defilter(zlib.decompress(bytes(fc["z"])), fc["fw"], fc["fh"], ch)
        x, y, fw, fh = fc["x"], fc["y"], fc["fw"], fc["fh"]
        if fc["blend"] == 0 or ch not in (2, 4):  # SOURCE (or no alpha band)
            composed = canvas.copy()
            composed[y : y + fh, x : x + fw] = region
        elif fc["blend"] == 1:  # OVER, straight-alpha (spec formula)
            composed = canvas.copy()
            dst = composed[y : y + fh, x : x + fw].astype(np.float64)
            src = region.astype(np.float64)
            sa = (src[:, :, -1:] / 255.0)
            da = (dst[:, :, -1:] / 255.0)
            oa = sa + da * (1 - sa)
            safe = np.where(oa == 0, 1.0, oa)
            rgb = (src[:, :, :-1] * sa + dst[:, :, :-1] * da * (1 - sa)) / safe
            composed[y : y + fh, x : x + fw, :-1] = np.round(rgb).astype(np.uint8)
            composed[y : y + fh, x : x + fw, -1:] = np.round(oa * 255).astype(np.uint8)
        else:
            raise ValueError(f"unsupported blend op {fc['blend']}")
        frames.append(composed[:, :, 0] if ch == 1 else composed)
        delays.append(fc["delay"])
        if fc["dispose"] == 0:  # NONE
            canvas = composed
        elif fc["dispose"] == 1:  # BACKGROUND: clear the frame region
            canvas = composed.copy()
            canvas[y : y + fh, x : x + fw] = 0
        else:
            raise ValueError(f"unsupported dispose op {fc['dispose']}")
    return frames, delays
