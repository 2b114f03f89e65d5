"""Multimodal (media span) plumbing: raster tile refs, binary payloads, and
feature-extraction UDF scaffolding.

Reference: the raster leg of osm-merge — TMS tile enumeration / quadkey math
(`osm_merge/fieldwork/basemapper.py:167-239`) and the MBTiles blob store
(`osm_merge/fieldwork/sqlite.py:32-230`).

PNG payloads are decoded and resized FOR REAL via the pure-python codec in
`functions/png.py` (stdlib zlib + numpy unfiltering) — dims, features, and
thumbnails come from actual pixels.  Other codecs (JPEG, video) genuinely
have no decoder in this container, so they keep a clearly-marked
deterministic fake; the Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partitioning — is identical for both and is what
a libjpeg/ffmpeg kernel would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import mjpeg, png, wav

# ---------------------------------------------------------------------------
# Tile-ref math (z/y/x strings ↔ columns; Bing quadkey)
# ---------------------------------------------------------------------------


def parse_media_ref(ref: Column | str) -> Column:
    """'z/y/x.jpg' → struct(z int, y int, x int) (`basemapper.py:186-199`
    URL form).  Malformed refs → nulls (try_cast)."""
    r = F.col(ref) if isinstance(ref, str) else ref
    parts = F.split(F.regexp_replace(r, r"\.[a-zA-Z]+$", ""), "/")
    return F.struct(
        F.element_at(parts, 1).try_cast("int").alias("z"),
        F.element_at(parts, 2).try_cast("int").alias("y"),
        F.element_at(parts, 3).try_cast("int").alias("x"),
    )


def quadkey(z: Column, x: Column, y: Column, max_zoom: int = 24) -> Column:
    """Bing quadkey string from z/x/y (`basemapper.py:186-190` provider
    form).  Linear expression construction: one per-level digit guarded by
    zoom (concat of empties for levels beyond z)."""
    digits = []
    for i in range(max_zoom, 0, -1):
        digit = (
            F.when((F.shiftright(x, i - 1) % 2 == 1) & (F.shiftright(y, i - 1) % 2 == 1), F.lit("3"))
            .when(F.shiftright(y, i - 1) % 2 == 1, F.lit("2"))
            .when(F.shiftright(x, i - 1) % 2 == 1, F.lit("1"))
            .otherwise(F.lit("0"))
        )
        digits.append(F.when(z >= i, digit).otherwise(F.lit("")))
    return F.concat(*digits)


def tile_lonlat(z: Column, x: Column, y: Column) -> tuple[Column, Column]:
    """NW corner of a slippy tile (inverse of the cell math) — lets media
    tiles join the vector cell index (raster↔vector overlay leg)."""
    n = F.pow(F.lit(2.0), z.cast("double"))
    lon = x.cast("double") / n * 360.0 - 180.0
    lat = F.degrees(F.atan(F.sinh(F.lit(float(np.pi)) * (1.0 - 2.0 * y.cast("double") / n))))
    return lon, lat


MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _gray_plane(img: np.ndarray) -> np.ndarray:
    """Decoded image → 2-D luminance plane (first channel for multi-band)."""
    return img if img.ndim == 2 else img[:, :, 0]


def decode_media_batch(payload: pd.Series) -> pd.DataFrame:
    """Media decode: PNG, baseline-greyscale JPEG, and MJPEG/AVI (first
    frame) payloads are decoded FOR REAL (pure-python codecs,
    `functions/png.py` + `functions/mjpeg.py`); the 8-dim feature is the
    first 8 pixels of the luminance plane (wrapped, /255) — the
    verification contract where a learned embedder would drop in.

    Everything else (mp4/webm, whose codecs genuinely aren't in this
    container) keeps the deterministic fake, and a payload that *sniffs* as
    JPEG/AVI but fails to parse degrades to the same deterministic stub
    (corrupt-file tolerance: a real pipeline quarantines the row, this one
    stays schema-stable and deterministic)."""

    def _real(blob) -> tuple[int, int, list] | None:
        try:
            if png.is_png(blob):
                plane = _gray_plane(png.decode_png(bytes(blob)))
            elif mjpeg.is_jpeg(blob):
                plane = mjpeg.decode_jpeg_gray(bytes(blob))
            elif mjpeg.is_avi(blob):
                frames, _fps = mjpeg.decode_mjpeg_avi(bytes(blob))
                if not frames:
                    return None
                plane = mjpeg.decode_jpeg_gray(frames[0])
            else:
                return None
        except Exception:
            return None
        h, w = plane.shape
        flat = plane.reshape(-1)
        idx = np.arange(8) % flat.size
        return (w, h, (flat[idx].astype(np.float32) / 255.0).tolist())

    feats = []
    for blob in payload:
        got = _real(blob)
        if got is not None:
            feats.append(got)
            continue
        b = np.frombuffer(blob if blob is not None else b"\x00", dtype=np.uint8)
        hs = int(b[: min(64, len(b))].sum())
        feats.append((256 + hs % 256, 256 + (hs * 7) % 256, (b[:8].astype(np.float32) / 255.0).tolist()))
    return pd.DataFrame(feats, columns=["width", "height", "feature"])


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_ref, payload binary):
    Arrow-batched, schema-stable — the real-decoder drop-in point."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = decode_media_batch(pdf["payload"])
            out.insert(0, "media_ref", pdf["media_ref"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "media_ref", "width", "height", "feature"]]

    return media.mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def synth_payload(ref: Column | str) -> Column:
    """Deterministic fake tile payload (binary) from the media ref string —
    stands in for the TMS download (`basemapper.py:241-270`)."""
    r = F.col(ref) if isinstance(ref, str) else ref
    return F.to_binary(F.md5(r), F.lit("hex"))


def synth_png_batch(refs: pd.Series) -> pd.Series:
    """Deterministic VALID PNG tile per ref: md5(ref) seeds the dims
    (w = 1+b0%13, h = 1+b1%11) and base shade; px[r][c] = (base+7r+3c)%256;
    the scanline filter cycles r%5 so decoding exercises every unfilter
    branch.  The same md5 arithmetic is reproducible in the DuckDB oracle."""
    import hashlib

    out = []
    for ref in refs:
        d = hashlib.md5(str(ref).encode()).hexdigest()
        b0, b1, b2 = int(d[0:2], 16), int(d[2:4], 16), int(d[4:6], 16)
        w, h = 1 + b0 % 13, 1 + b1 % 11
        r = np.arange(h)[:, None]
        c = np.arange(w)[None, :]
        img = ((b2 + 7 * r + 3 * c) % 256).astype(np.uint8)
        out.append(png.encode_png(img, np.arange(h) % 5))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def synth_png_payload(ref: pd.Series) -> pd.Series:
    return synth_png_batch(ref)


def synth_apng_batch(refs: pd.Series) -> pd.Series:
    """Deterministic VALID animated PNG per ref: md5(ref) seeds dims
    (w = 1+b0%13, h = 1+b1%11), base shade b2 and frame count 2+b3%5;
    frame k's pixels are (base + 11k + 7r + 3c) % 256 with per-frame delay
    (1 + k%3)/10 s.  The same arithmetic is reproducible in the DuckDB
    oracle (q_apng_frames), so the decoded frames are value-checked."""
    import hashlib

    out = []
    for ref in refs:
        d = hashlib.md5(str(ref).encode()).hexdigest()
        b0, b1, b2, b3 = (int(d[2 * i : 2 * i + 2], 16) for i in range(4))
        w, h = 1 + b0 % 13, 1 + b1 % 11
        r = np.arange(h)[:, None]
        c = np.arange(w)[None, :]
        frames = [
            ((b2 + 11 * k + 7 * r + 3 * c) % 256).astype(np.uint8)
            for k in range(2 + b3 % 5)
        ]
        delays = [(1 + k % 3, 10) for k in range(len(frames))]
        out.append(png.encode_apng(frames, delays=delays, filters=np.arange(h) % 5))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def synth_apng_payload(ref: pd.Series) -> pd.Series:
    return synth_apng_batch(ref)


def synth_mjpeg_batch(refs: pd.Series) -> pd.Series:
    """Deterministic VALID MJPEG AVI per ref: md5(ref) seeds the block-grid
    dims (wb = 1+b0%3, hb = 1+b1%2 → w = 8·wb, h = 8·hb), base shade b2,
    frame count 2+b3%4, fps 5+b4%10; frame k's 8×8 block (i, j) is the
    constant (b2 + 17k + 5i + 3j) % 256.  Block-constant frames round-trip
    the baseline JPEG bit-exactly (flat-8 quant table — see
    functions/mjpeg.py), so the DuckDB oracle (q_mjpeg_frames) recomputes
    the DECODED pixel hash from this arithmetic in closed form."""
    import hashlib

    out = []
    for ref in refs:
        d = hashlib.md5(str(ref).encode()).hexdigest()
        b0, b1, b2, b3, b4 = (int(d[2 * i : 2 * i + 2], 16) for i in range(5))
        wb, hb = 1 + b0 % 3, 1 + b1 % 2
        nf, fps = 2 + b3 % 4, 5 + b4 % 10
        i = np.arange(hb)[:, None]
        j = np.arange(wb)[None, :]
        frames = [
            mjpeg.encode_jpeg_gray(
                np.kron(
                    ((b2 + 17 * k + 5 * i + 3 * j) % 256).astype(np.uint8),
                    np.ones((8, 8), dtype=np.uint8),
                )
            )
            for k in range(nf)
        ]
        out.append(mjpeg.encode_mjpeg_avi(frames, fps=fps, w=8 * wb, h=8 * hb))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def synth_mjpeg_payload(ref: pd.Series) -> pd.Series:
    return synth_mjpeg_batch(ref)


# ---------------------------------------------------------------------------
# Resize + frame-sample plumbing (decode stubs, real distributed shape)
# ---------------------------------------------------------------------------

MEDIA_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("thumb_sig", T.StringType()),
    ]
)


_SIG_MOD = 1_000_000_007


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Thumbnail/resize stage over (doc_id, media_ref, payload binary) via
    ``mapInPandas``.  PNG, baseline JPEG, and MJPEG/AVI (first frame)
    payloads are REALLY resized: decode, aspect-preserving integer dims,
    nearest-neighbor downsample over the luminance plane, and ``thumb_sig``
    is a position-weighted polynomial hash of the RESIZED PIXELS
    (``Σ px·(pos+1) mod 1e9+7`` — SQL-reproducible, so the oracle checks
    the actual resampled values).  Other payloads (and parse failures) keep
    the stub dims + md5-of-dims signature."""
    import hashlib

    def _plane(blob) -> np.ndarray | None:
        """Real luminance plane for PNG / baseline JPEG / AVI first frame;
        None (→ stub path) otherwise or on parse failure."""
        try:
            if png.is_png(blob):
                return _gray_plane(png.decode_png(bytes(blob)))
            if mjpeg.is_jpeg(blob):
                return mjpeg.decode_jpeg_gray(bytes(blob))
            if mjpeg.is_avi(blob):
                frames, _fps = mjpeg.decode_mjpeg_avi(bytes(blob))
                return mjpeg.decode_jpeg_gray(frames[0]) if frames else None
        except Exception:
            return None
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, blob in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                plane = _plane(blob)
                if plane is not None:
                    h, w = plane.shape
                    out_w = min(w, max_dim)
                    out_h = max((h * out_w) // w, 1)
                    rs = plane[(np.arange(out_h) * h) // out_h][:, (np.arange(out_w) * w) // out_w]
                    flat = rs.astype(np.int64).reshape(-1)
                    sig = int((flat * (np.arange(flat.size) + 1)).sum() % _SIG_MOD)
                    rows.append((doc_id, ref, out_w, out_h, str(sig)))
                    continue
                dims = decode_media_batch(pd.Series([blob]))
                w, h = int(dims["width"][0]), int(dims["height"][0])
                out_w = min(w, max_dim)
                out_h = max((h * out_w) // w, 1)
                sig = hashlib.md5(f"{ref}|{out_w}x{out_h}".encode()).hexdigest()
                rows.append((doc_id, ref, out_w, out_h, sig))
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "out_w", "out_h", "thumb_sig"]).astype(
                {"out_w": np.int32, "out_h": np.int32}
            )

    return media.mapInPandas(run, MEDIA_RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_offset", T.DoubleType()),
        T.StructField("frame_sig", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 4, fps: float = 30.0) -> DataFrame:
    """Frame sampling as a row-generating ``mapInPandas`` (the UDTF flavor:
    one output row per sampled frame).

    Animated-PNG payloads go through a REAL demuxer+decoder
    (`functions/png.py` acTL/fcTL/fdAT over the shared inflate+unfilter
    path): every sampled frame is composited to the full canvas,
    ``t_offset`` is the true cumulative delay from the container's fcTL
    timing, and ``frame_sig`` is the position-weighted polynomial hash of
    the decoded pixels — value-checked by the q_apng_frames oracle.

    MJPEG/AVI payloads (round 5) also go through a REAL path: RIFF demux
    (``functions/mjpeg.py``), per-frame baseline-JPEG decode, ``t_offset``
    from the stream header's actual rate/scale pair, and the same
    decoded-pixel hash — value-checked by the q_mjpeg_frames oracle.

    Other video containers (mp4/webm, whose codecs — H.264/VP9 — genuinely
    aren't bounded spec jobs and aren't in this environment) keep the
    deterministic STUB: frame count derived from the payload bytes, md5
    stand-in signature, ``idx/fps`` timing — the fan-out shape (explode
    inside Arrow batches, no driver involvement, schema-stable) is exactly
    what an ffmpeg-backed sampler drops into."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, blob in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                if png.is_apng(blob):
                    frames, delays = png.decode_apng(bytes(blob))
                    t = 0.0
                    offsets = []
                    for dn, dd in delays:
                        offsets.append(t)
                        t += dn / (dd or 100.0)  # spec: den 0 reads as 100
                    for idx in range(0, len(frames), every_n):
                        plane = _gray_plane(frames[idx])
                        flat = plane.astype(np.int64).reshape(-1)
                        sig = int((flat * (np.arange(flat.size) + 1)).sum() % _SIG_MOD)
                        rows.append((doc_id, ref, idx, round(offsets[idx], 4), str(sig)))
                    continue
                if mjpeg.is_avi(blob):
                    jframes, vfps = mjpeg.decode_mjpeg_avi(bytes(blob))
                    for idx in range(0, len(jframes), every_n):
                        plane = mjpeg.decode_jpeg_gray(jframes[idx])
                        flat = plane.astype(np.int64).reshape(-1)
                        sig = int((flat * (np.arange(flat.size) + 1)).sum() % _SIG_MOD)
                        rows.append(
                            (doc_id, ref, idx, round(idx / vfps, 4), str(sig))
                        )
                    continue
                b = np.frombuffer(blob if blob is not None else b"\x00", dtype=np.uint8)
                hs = int(b[: min(64, len(b))].sum())
                n_frames = 1 + hs % 16
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        (
                            doc_id,
                            ref,
                            idx,
                            round(idx / fps, 4),
                            hashlib.md5(f"{ref}#frame{idx}".encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "frame_idx", "t_offset", "frame_sig"])

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio (WAV) leg — real RIFF/PCM16 decode via functions/wav.py
# ---------------------------------------------------------------------------


def synth_wav_batch(refs: pd.Series) -> pd.Series:
    """Deterministic VALID mono WAV per ref: md5(ref) seeds the length
    (n = 64 + (b0·256 + b1) % 449) and a base phase b2; sample[i] =
    ((b2·257 + i·73) % 65536) − 32768 (int16).  Same arithmetic class as
    synth_png_batch — every decoded sample is reproducible in the DuckDB
    oracle from the ref string alone."""
    import hashlib

    out = []
    for ref in refs:
        d = hashlib.md5(str(ref).encode()).hexdigest()
        b0, b1, b2 = int(d[0:2], 16), int(d[2:4], 16), int(d[4:6], 16)
        n = 64 + (b0 * 256 + b1) % 449
        i = np.arange(n, dtype=np.int64)
        samples = ((b2 * 257 + i * 73) % 65536 - 32768).astype(np.int16)
        out.append(wav.encode_wav_pcm16(samples, rate=8000))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def synth_wav_payload(ref: pd.Series) -> pd.Series:
    return synth_wav_batch(ref)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("head_sig", T.StringType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas audio features over (doc_id, media_ref, payload binary):
    real RIFF/PCM16 decode (`functions/wav.py`), numpy-reduced per blob —
    sample_rate/n_samples/duration from the parsed header+data, rms over
    the full waveform, head_sig = first 8 samples (wrapped) as a
    comma-joined signature (the hash-exact oracle surface; rms is pinned
    against numpy in pytest).  Undecodable payloads yield a schema-stable
    null-feature row (quarantine semantics, like decode_media_batch)."""

    def _one(blob) -> tuple:
        try:
            rate, _ch, s = wav.decode_wav(bytes(blob))
        except Exception:
            return (None, None, None, None, None)
        n = int(s.size)
        idx = np.arange(8) % max(n, 1)
        sig = ",".join(str(int(v)) for v in s[idx]) if n else ""
        rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2))) if n else 0.0
        return (rate, n, n * 1000 // rate, rms, sig)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame(
                [_one(b) for b in pdf["payload"]],
                columns=["sample_rate", "n_samples", "duration_ms", "rms", "head_sig"],
            )
            feats.insert(0, "media_ref", pdf["media_ref"].values)
            feats.insert(0, "doc_id", pdf["doc_id"].values)
            yield feats

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("t_offset_ms", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("sum_abs", T.LongType()),
    ]
)


def audio_windows(media: DataFrame, win: int = 32) -> DataFrame:
    """Windowed audio energy — the audio analog of video frame sampling
    (`sample_frames`): decode, split the waveform into fixed ``win``-sample
    windows, emit per-window t_offset and integer |x| energy (exact int64
    math so the oracle re-derives it bit-for-bit).  One input row fans out
    to ceil(n/win) rows inside the same Arrow batch — bounded per-row work,
    no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, blob in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                try:
                    rate, _ch, s = wav.decode_wav(bytes(blob))
                except Exception:
                    continue
                a = np.abs(s.astype(np.int64))
                for w_i in range(0, s.size, win):
                    chunk = a[w_i : w_i + win]
                    rows.append(
                        (
                            doc_id,
                            ref,
                            w_i // win,
                            w_i * 1000 // rate,
                            int(chunk.size),
                            int(chunk.sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "win_idx", "t_offset_ms", "n", "sum_abs"],
            )

    return media.mapInPandas(run, AUDIO_WINDOW_SCHEMA)
