"""WAV codec + audio operators (round-5 audio leg)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_merge_spark.functions import wav
from osm_merge_spark.operators import media as M


def test_wav_roundtrip():
    s = (np.arange(1000) * 37 % 65536 - 32768).astype(np.int16)
    blob = wav.encode_wav_pcm16(s, rate=16000)
    rate, ch, got = wav.decode_wav(blob)
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(got, s)


def test_wav_roundtrip_stereo_and_chunk_tolerance():
    s = (np.arange(600) % 256 - 128).astype(np.int16)
    blob = wav.encode_wav_pcm16(s, rate=8000, channels=2)
    # splice an extra LIST chunk before data — the reader must skip it
    fmt_end = 12 + 8 + 16
    extra = b"LIST\x05\x00\x00\x00INFOx\x00"  # odd length → word-align padding
    patched = blob[:fmt_end] + extra + blob[fmt_end:]
    rate, ch, got = wav.decode_wav(patched)
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(got, s)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wav.decode_wav(b"not a riff file at all..")
    with pytest.raises(ValueError):
        # RIFF/WAVE but 8-bit format
        import struct
        fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
        data = b"data\x04\x00\x00\x00abcd"
        blob = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data
        wav.decode_wav(blob)


def _media_df(spark, n=40):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
            F.concat(F.lit("audio/"), F.col("id").cast("string"), F.lit(".wav")).alias("media_ref"),
        )
        .withColumn("payload", M.synth_wav_payload("media_ref"))
    )


def test_audio_features_match_numpy(spark):
    import hashlib

    rows = M.extract_audio_features(_media_df(spark)).collect()
    assert len(rows) == 40
    for r in rows:
        d = hashlib.md5(r["media_ref"].encode()).hexdigest()
        b0, b1, b2 = int(d[0:2], 16), int(d[2:4], 16), int(d[4:6], 16)
        n = 64 + (b0 * 256 + b1) % 449
        i = np.arange(n, dtype=np.int64)
        s = (b2 * 257 + i * 73) % 65536 - 32768
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // 8000
        assert r["head_sig"] == ",".join(str(int(v)) for v in s[:8])
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(s.astype(np.float64) ** 2))))


def test_audio_windows_sum_to_waveform_energy(spark):
    feats = {r["media_ref"]: r for r in M.extract_audio_features(_media_df(spark, 10)).collect()}
    wins = M.audio_windows(_media_df(spark, 10), win=32).collect()
    by_ref: dict = {}
    for w in wins:
        by_ref.setdefault(w["media_ref"], []).append(w)
    import hashlib

    for ref, ws in by_ref.items():
        n = feats[ref]["n_samples"]
        assert sum(w["n"] for w in ws) == n
        assert [w["win_idx"] for w in sorted(ws, key=lambda x: x["win_idx"])] == list(range(len(ws)))
        d = hashlib.md5(ref.encode()).hexdigest()
        b2 = int(d[4:6], 16)
        i = np.arange(n, dtype=np.int64)
        s = (b2 * 257 + i * 73) % 65536 - 32768
        assert sum(w["sum_abs"] for w in ws) == int(np.abs(s).sum())
