"""Pure-python PNG codec (`functions/png.py`) and the real media decode
path it powers."""

import numpy as np
import pandas as pd
import pytest

from osm_merge_spark.functions import png
from osm_merge_spark.operators import media as M


def test_round_trip_all_filters_and_colortypes():
    rng = np.random.RandomState(11)
    for shape in [(1, 1), (3, 5), (11, 13), (8, 8, 3), (5, 9, 4), (6, 2, 2)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for f in [0, 1, 2, 3, 4, None]:
            assert (png.decode_png(png.encode_png(img, f)) == img).all()
        # per-row filter cycle drives every unfilter branch in one image
        assert (png.decode_png(png.encode_png(img, np.arange(shape[0]) % 5)) == img).all()


def test_decode_known_bytes():
    # hand-checkable: 2x1 grey [7, 9] with Sub filter → scanline 01 07 02
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(bytes([1, 7, 2]))

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    assert (png.decode_png(blob) == np.array([[7, 9]])).all()


def test_unsupported_rejected():
    img = np.zeros((2, 2), np.uint8)
    blob = bytearray(png.encode_png(img))
    with pytest.raises(ValueError):
        png.decode_png(b"JFIF not a png")
    blob[24] = 16  # bit depth 16
    with pytest.raises(ValueError):
        png.decode_png(bytes(blob))


def test_synth_png_is_valid_and_deterministic():
    refs = pd.Series(["18/1/2.jpg", "18/3/4.jpg", "18/1/2.jpg"])
    blobs = M.synth_png_batch(refs)
    assert blobs[0] == blobs[2] and blobs[0] != blobs[1]
    img = png.decode_png(blobs[0])
    assert 1 <= img.shape[1] <= 13 and 1 <= img.shape[0] <= 11
    # pixel law px[r][c] = (base + 7r + 3c) % 256
    base = int(img[0, 0])
    r = np.arange(img.shape[0])[:, None]
    c = np.arange(img.shape[1])[None, :]
    assert (img == (base + 7 * r + 3 * c) % 256).all()


def test_decode_media_batch_real_for_png_fake_for_rest():
    refs = pd.Series(["a", "b"])
    blobs = M.synth_png_batch(refs)
    out = M.decode_media_batch(pd.Series([blobs[0], b"\xff\xd8JPEGISH"]))
    real = png.decode_png(blobs[0])
    assert (out["width"][0], out["height"][0]) == (real.shape[1], real.shape[0])
    flat = real.reshape(-1)
    want = [flat[i % flat.size] / 255.0 for i in range(8)]
    assert np.allclose(out["feature"][0], want, atol=1e-6)
    # non-PNG payload keeps the deterministic fake (stub dims >= 256)
    assert out["width"][1] >= 256


def test_resize_real_nearest_neighbor(spark):
    df = spark.createDataFrame([("d1", "18/1/2.jpg")], "doc_id string, media_ref string").withColumn(
        "payload", M.synth_png_payload("media_ref")
    )
    row = M.resize_media(df, max_dim=4).first()
    img = png.decode_png(M.synth_png_batch(pd.Series(["18/1/2.jpg"]))[0])
    h, w = img.shape
    out_w = min(w, 4)
    out_h = max((h * out_w) // w, 1)
    rs = img[(np.arange(out_h) * h) // out_h][:, (np.arange(out_w) * w) // out_w]
    flat = rs.astype(np.int64).reshape(-1)
    sig = int((flat * (np.arange(flat.size) + 1)).sum() % 1_000_000_007)
    assert (row.out_w, row.out_h, row.thumb_sig) == (out_w, out_h, str(sig))


# ---------------------------------------------------------------------------
# APNG (acTL/fcTL/fdAT over the shared inflate+unfilter path)
# ---------------------------------------------------------------------------


class TestApng:
    def _img(self, shift=0):
        r = np.arange(7)[:, None]
        c = np.arange(5)[None, :]
        return ((shift + 7 * r + 3 * c) % 256).astype(np.uint8)

    def test_round_trip_full_frames(self):
        frames = [self._img(k * 11) for k in range(4)]
        delays = [(1 + k % 3, 10) for k in range(4)]
        blob = png.encode_apng(frames, delays=delays, filters=np.arange(7) % 5)
        assert png.is_apng(blob) and png.is_png(blob)
        got, gd = png.decode_apng(blob)
        assert gd == delays
        for a, b in zip(got, frames):
            assert (a == b).all()

    def test_plain_png_is_not_apng(self):
        blob = png.encode_png(self._img())
        assert not png.is_apng(blob)
        with pytest.raises(ValueError, match="acTL"):
            png.decode_apng(blob)

    def test_subregion_composites_onto_canvas(self):
        f0 = self._img()
        region = np.full((2, 3), 200, np.uint8)
        blob = png.encode_apng([f0, region], offsets=[(0, 0), (1, 2)])
        got, _ = png.decode_apng(blob)
        want = f0.copy()
        want[2:4, 1:4] = 200
        assert (got[0] == f0).all()
        assert (got[1] == want).all()

    def test_region_bounds_checked(self):
        with pytest.raises(ValueError, match="canvas"):
            png.encode_apng([self._img(), np.zeros((9, 9), np.uint8)], offsets=[(0, 0), (3, 3)])

    def test_rgb_frames(self):
        rgb = np.stack([self._img(), self._img(5), self._img(9)], axis=-1)
        got, _ = png.decode_apng(png.encode_apng([rgb, rgb]))
        assert got[0].shape == (7, 5, 3)
        assert (got[1] == rgb).all()

    def test_dispose_background_clears_region(self):
        import struct
        import zlib

        f0 = self._img()
        region = np.full((2, 3), 200, np.uint8)

        def fctl(seq, fw, fh, x, y, dispose, blend):
            return png._chunk(
                b"fcTL", struct.pack(">IIIIIHHBB", seq, fw, fh, x, y, 1, 10, dispose, blend)
            )

        out = bytearray(png._MAGIC)
        out += png._chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 7, 8, 0, 0, 0, 0))
        out += png._chunk(b"acTL", struct.pack(">II", 3, 0))
        out += fctl(0, 5, 7, 0, 0, 0, 0)
        out += png._chunk(b"IDAT", zlib.compress(png._filter_rows(f0[:, :, None], png._norm_filters(0, 7))))
        # frame 1: region with dispose=BACKGROUND — must clear for frame 2
        out += fctl(1, 3, 2, 1, 2, 1, 0)
        out += png._chunk(b"fdAT", struct.pack(">I", 2) + zlib.compress(
            png._filter_rows(region[:, :, None], png._norm_filters(0, 2))))
        # frame 2: 1x1 dot elsewhere — canvas shows the CLEARED region
        dot = np.full((1, 1), 9, np.uint8)
        out += fctl(3, 1, 1, 0, 0, 0, 0)
        out += png._chunk(b"fdAT", struct.pack(">I", 4) + zlib.compress(
            png._filter_rows(dot[:, :, None], png._norm_filters(0, 1))))
        out += png._chunk(b"IEND", b"")
        got, _ = png.decode_apng(bytes(out))
        assert (got[1][2:4, 1:4] == 200).all()
        assert (got[2][2:4, 1:4] == 0).all()  # background-disposed
        assert got[2][0, 0] == 9
