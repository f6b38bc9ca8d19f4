"""Structured Streaming pipeline + multimodal payload operators."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from p3_osm_transformer_spark.operators import multimodal as mm
from p3_osm_transformer_spark.sources.catalog import Catalog


def test_streaming_windowed_tile_counts(spark, tmp_path):
    from p3_osm_transformer_spark.streaming.stream_pipeline import run_file_stream

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ])
    rows = [(f"img-{i}",
             f"snap @ geo:{42.0 + i % 5 / 10.0},{10.0 + i % 3 / 10.0}",
             f"2024-01-01 10:{i % 50:02d}:00") for i in range(100)]
    src = tmp_path / "in"
    spark.createDataFrame(rows, "image_id string, caption string, event_time string") \
        .withColumn("event_time", F.to_timestamp("event_time")) \
        .write.parquet(str(src))

    cat = Catalog(str(tmp_path / "cat"))
    run_file_stream(spark, str(src), schema, cat, "tile_counts",
                    str(tmp_path / "ckpt"), watermark="0 seconds")
    out = cat.read(spark, "tile_counts")
    rows_out = out.collect()
    assert rows_out, "no windowed counts produced"
    assert out.columns == ["window_start", "tile_z12", "n_images"]
    # minutes 0..49, 2 events/minute → 20 per 10-min window; append mode
    # finalizes the 4 windows the watermark (max event time 10:49) passed;
    # the open [10:40,10:50) window correctly stays in state
    assert sum(r["n_images"] for r in rows_out) == 80


def test_video_frame_sampling(spark):
    vids = spark.createDataFrame(
        [(f"v-{i}",) for i in range(6)], "video_id string") \
        .withColumn("bytes", mm.synth_video_udf(
            F.monotonically_increasing_id(), F.lit(32), F.lit(32), F.lit(8)))
    frames = mm.sample_frames(vids, every_k=2).collect()
    assert len(frames) == 6 * 4                     # every 2nd of 8 frames
    assert all(f["frame_idx"] % 2 == 0 for f in frames)
    assert all(0 <= f["mean_px"] <= 255 for f in frames)


def test_video_codec_roundtrip():
    frames = [mm.synth_pixels(i, 16, 16) for i in range(3)]
    out = mm.decode_video(mm.encode_video(frames))
    assert len(out) == 3
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_image_resize(spark):
    from p3_osm_transformer_spark.sources.fixtures import images_table
    imgs = images_table(spark, 5)
    small = mm.resize_images(imgs, 16, 16).collect()
    assert len(small) == 5
    for r in small:
        px = mm.decode_bytes(bytes(r["bytes"]))
        assert px.shape[:2] == (16, 16)


def test_audio_features(spark):
    auds = spark.createDataFrame([(f"a-{i}", i) for i in range(4)],
                                 "audio_id string, seed long") \
        .withColumn("bytes", mm.synth_audio_udf(F.col("seed")))
    feats = {r["audio_id"]: r for r in mm.audio_features(auds).collect()}
    assert len(feats) == 4
    for r in feats.values():
        assert r["n_samples"] == 8000
        assert 1000 < r["rms"] < 4000               # sine at amp 3000
        assert 0 < r["zero_cross_rate"] < 1


def test_unknown_containers_raise():
    import pytest
    with pytest.raises(NotImplementedError):
        mm.decode_video(b"RIFFxxxxxxxxxxxx")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3xxxxxxxxxxxxx")
