"""MJPEG/AVI codec (functions/mjpeg.py): baseline-JPEG roundtrips, the
bit-exact block-constant property the q_mjpeg_frames oracle relies on, the
honest-subset rejections, and RIFF container semantics.  Pure numpy — no
Spark session."""

import hashlib
import struct

import numpy as np
import pytest

from osm_merge_spark.functions import mjpeg as MJ

MOD = 1_000_000_007


def _block_img(bvals):
    return np.kron(np.asarray(bvals, dtype=np.uint8), np.ones((8, 8), dtype=np.uint8))


def test_block_constant_roundtrip_is_bit_exact():
    rng = np.random.default_rng(11)
    for _ in range(5):
        img = _block_img(rng.integers(0, 256, (3, 4)))
        assert np.array_equal(MJ.decode_jpeg_gray(MJ.encode_jpeg_gray(img)), img)


def test_every_grey_level_survives_exactly():
    # DC categories 0..8 in one image: all 256 levels as 8×8 blocks
    img = _block_img(np.arange(256, dtype=np.uint8).reshape(16, 16))
    assert np.array_equal(MJ.decode_jpeg_gray(MJ.encode_jpeg_gray(img)), img)


def test_arbitrary_image_lossy_but_close_and_shape_preserved():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 29), dtype=np.uint8)  # pad path
    dec = MJ.decode_jpeg_gray(MJ.encode_jpeg_gray(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


def test_smooth_image_nearly_exact():
    # flat-8 quant: a smooth ramp must come back within the quant step
    r = np.arange(32)[:, None]
    c = np.arange(48)[None, :]
    img = ((r * 3 + c * 2) % 256).astype(np.uint8)
    dec = MJ.decode_jpeg_gray(MJ.encode_jpeg_gray(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_byte_stuffing_roundtrip():
    # white image: large positive DC → scan bytes hit 0xFF and must be
    # stuffed/unstuffed symmetrically
    img = np.full((8, 8), 255, dtype=np.uint8)
    blob = MJ.encode_jpeg_gray(img)
    assert np.array_equal(MJ.decode_jpeg_gray(blob), img)


def test_decoder_rejects_progressive_and_color():
    blob = bytearray(MJ.encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(blob).find(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2 :]
    with pytest.raises(NotImplementedError):
        MJ.decode_jpeg_gray(bytes(prog))
    with pytest.raises(ValueError):
        MJ.decode_jpeg_gray(b"not a jpeg")


def test_avi_roundtrip_frames_and_fps():
    rng = np.random.default_rng(5)
    frames = [MJ.encode_jpeg_gray(_block_img(rng.integers(0, 256, (2, 3)))) for _ in range(7)]
    avi = MJ.encode_mjpeg_avi(frames, fps=12, w=24, h=16)
    assert MJ.is_avi(avi)
    got, fps = MJ.decode_mjpeg_avi(avi)
    assert fps == 12.0
    assert [bytes(g) for g in got] == [bytes(f) for f in frames]


def test_avi_word_alignment_odd_sized_frames():
    # odd-length payloads force the RIFF pad byte; the walk must skip it
    frames = [b"\xff\xd8odd", b"\xff\xd8even!", b"\xff\xd8x"]
    avi = MJ.encode_mjpeg_avi(frames, fps=10, w=8, h=8)
    got, _ = MJ.decode_mjpeg_avi(avi)
    assert [bytes(g) for g in got] == frames


def test_avi_rec_list_nesting():
    # some muxers group frames in LIST 'rec ' blocks inside movi — build one
    # by hand and check the walker descends
    f1, f2 = b"\xff\xd8one", b"\xff\xd8two2"
    rec = MJ._rlist(b"rec ", MJ._rchunk(b"00dc", f1) + MJ._rchunk(b"00dc", f2))
    base = MJ.encode_mjpeg_avi([b"\xff\xd8zero"], fps=10, w=8, h=8)
    # rebuild: keep hdrl from the encoder, replace movi with the rec-nested one
    hdrl_part = base[12 : base.index(b"movi") - 8]
    body = hdrl_part + MJ._rlist(b"movi", rec)
    avi = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    got, fps = MJ.decode_mjpeg_avi(avi)
    assert [bytes(g) for g in got] == [f1, f2]
    assert fps == 10.0


def test_is_avi_negatives():
    assert not MJ.is_avi(None)
    assert not MJ.is_avi(b"RIFF\x00\x00\x00\x00WAVE")
    assert not MJ.is_avi(b"\x89PNG")


def test_synth_arithmetic_matches_decoded_pixel_hash():
    """End-to-end twin of the q_mjpeg_frames oracle: decoded pixels of the
    synthesized AVIs hash identically to the closed-form block arithmetic
    (the SQL side), for a spread of refs."""
    from osm_merge_spark.operators.media import synth_mjpeg_batch
    import pandas as pd

    refs = [f"18/{(n * 53) % 262144}/{(n * 37) % 262144}.jpg" for n in range(30)]
    payloads = synth_mjpeg_batch(pd.Series(refs))
    for ref, avi in zip(refs, payloads):
        d = hashlib.md5(ref.encode()).hexdigest()
        b0, b1, b2, b3, b4 = (int(d[2 * i : 2 * i + 2], 16) for i in range(5))
        wb, hb, nf, fps = 1 + b0 % 3, 1 + b1 % 2, 2 + b3 % 4, 5 + b4 % 10
        w = 8 * wb
        jf, vfps = MJ.decode_mjpeg_avi(avi)
        assert len(jf) == nf and vfps == fps
        for idx in range(0, nf, 2):
            plane = MJ.decode_jpeg_gray(jf[idx]).astype(np.int64).reshape(-1)
            got = int((plane * (np.arange(plane.size) + 1)).sum() % MOD)
            want = sum(
                ((b2 + 17 * idx + 5 * i + 3 * j) % 256)
                * (64 * (8 * i * w + 8 * j + 1) + 224 * (w + 1))
                for i in range(hb)
                for j in range(wb)
            ) % MOD
            assert got == want, (ref, idx)


# ---------------------------------------------------------------------------
# media kernels dispatch (decode_media_batch — pure pandas, no session)
# ---------------------------------------------------------------------------


def test_decode_media_batch_real_jpeg_and_avi_dims():
    import pandas as pd
    from osm_merge_spark.operators.media import decode_media_batch

    img = _block_img([[10, 20, 30], [40, 50, 60]])  # 16×24
    jpg = MJ.encode_jpeg_gray(img)
    avi = MJ.encode_mjpeg_avi([jpg], fps=10, w=24, h=16)
    out = decode_media_batch(pd.Series([jpg, avi]))
    assert list(out["width"]) == [24, 24] and list(out["height"]) == [16, 16]
    # feature = first 8 luminance pixels / 255 → first block value 10
    assert out["feature"][0][0] == pytest.approx(10 / 255.0)
    assert out["feature"][1][0] == pytest.approx(10 / 255.0)


def test_decode_media_batch_corrupt_sniff_degrades_to_stub():
    import pandas as pd
    from osm_merge_spark.operators.media import decode_media_batch

    fake_jpeg = b"\xff\xd8\xffgarbage-that-is-not-a-jpeg"
    stub = bytes(range(16))
    out = decode_media_batch(pd.Series([fake_jpeg, stub]))
    # both land on the deterministic stub arithmetic (hs byte-sum dims)
    for i, blob in enumerate([fake_jpeg, stub]):
        hs = sum(blob[:64])
        assert out["width"][i] == 256 + hs % 256
        assert out["height"][i] == 256 + (hs * 7) % 256
