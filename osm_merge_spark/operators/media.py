"""Multimodal (media span) plumbing: raster tile refs, binary payloads, and
feature-extraction UDF scaffolding.

Reference: the raster leg of osm-merge — TMS tile enumeration / quadkey math
(`osm_merge/fieldwork/basemapper.py:167-239`) and the MBTiles blob store
(`osm_merge/fieldwork/sqlite.py:32-230`).

Image/audio decode libraries don't ship in this container, so the decode
kernel is a clearly-marked stub (deterministic fake features) — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, and partitioning are exactly what a real decoder
would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_media_batch(payload: pd.Series) -> pd.DataFrame:
    """STUB — real image decode (PIL/ffmpeg) is unavailable in this
    container.  Produces deterministic fake (width, height, 8-dim feature)
    from the payload bytes so the distributed plumbing is fully testable.
    Swap this function for a real decoder; the engine around it is final."""
    feats = []
    for blob in payload:
        b = np.frombuffer(blob if blob is not None else b"\x00", dtype=np.uint8)
        h = int(b[: min(64, len(b))].sum())
        feats.append((256 + h % 256, 256 + (h * 7) % 256, (b[:8].astype(np.float32) / 255.0).tolist()))
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


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Thumbnail/resize stage over (doc_id, media_ref, payload binary) via
    ``mapInPandas``.  The resample kernel is a STUB (no image libs in this
    container): output dims follow the aspect-preserving integer math a real
    resizer would use, and ``thumb_sig`` deterministically stands in for the
    resized bytes (md5 of ref|dims) — swap the inner lambda for PIL/opencv
    and the distributed shape (schema, Arrow batches, partitioning) is
    already final."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = decode_media_batch(pdf["payload"])
            w = dims["width"].to_numpy()
            h = dims["height"].to_numpy()
            out_w = np.minimum(w, max_dim)
            # floor division — integer aspect scaling, reproducible in SQL
            out_h = np.maximum((h * out_w) // w, 1).astype(np.int64)
            sig = [
                hashlib.md5(f"{r}|{ww}x{hh}".encode()).hexdigest()
                for r, ww, hh in zip(pdf["media_ref"], out_w, out_h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_ref": pdf["media_ref"].values,
                    "out_w": out_w.astype(np.int32),
                    "out_h": out_h.astype(np.int32),
                    "thumb_sig": sig,
                }
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
    """Video frame sampling as a row-generating ``mapInPandas`` (the UDTF
    flavor: one output row per sampled frame).  The demuxer is a STUB —
    frame count is derived deterministically from the payload bytes and
    ``frame_sig`` stands in for the frame blob — but the fan-out shape
    (explode inside Arrow batches, no driver involvement, schema-stable)
    is exactly what a real ffmpeg-backed sampler drops into."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, blob in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
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
