"""Multimodal plumbing tests: schema, determinism, batch shape, and
the NotImplementedError gate for real formats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capgemini_himss24_fhirbulkdata_demo_spark.multimodal import (
    decode_images,
    extract_patch_features,
    sample_frames,
    synthesize_media,
)
from capgemini_himss24_fhirbulkdata_demo_spark.multimodal.binary import encode_fake


def test_decode_images_deterministic(spark):
    media = synthesize_media(spark, 12).repartition(4)
    decoded = decode_images(media)
    rows = {r.media_id: r for r in decoded.collect()}
    assert len(rows) == 12
    r0 = rows[0]
    assert (r0.width, r0.height, r0.n_frames) == (16, 16, 1)
    assert 0 <= r0.mean_pixel <= 255
    assert len(r0.histogram) == 8
    assert abs(sum(r0.histogram) - 1.0) < 1e-9
    # deterministic across runs
    rows2 = {r.media_id: r for r in decode_images(media).collect()}
    assert rows2[5].mean_pixel == rows[5].mean_pixel
    assert rows2[5].histogram == rows[5].histogram


def test_meta_filter_prunes_payload(spark):
    """Filtering on meta only must not deserialize payloads: the plan's
    ReadSchema/production should carry just the pruned columns."""
    media = synthesize_media(spark, 8)
    small = media.filter(F.col("meta.width") == 16).select("media_id", "meta.width")
    assert small.count() > 0
    assert "payload" not in small.columns


def test_patch_features_fanout(spark):
    media = synthesize_media(spark, 4)
    feats = extract_patch_features(media, patch=8)
    got = feats.groupBy("media_id").count().orderBy("media_id").collect()
    # media 0: 16x16 -> 4 patches; media 1: 24x24 -> 9; media 2: 32x32 -> 16
    assert [r["count"] for r in got][:3] == [4, 9, 16]
    f = feats.filter((F.col("media_id") == 0) & (F.col("patch_id") == 0)).first()
    assert len(f.feature) == 3
    assert 0.0 <= f.feature[1] <= f.feature[0] <= f.feature[2] <= 255.0


def test_sample_frames_video(spark):
    media = synthesize_media(spark, 6, kind="video")
    frames = sample_frames(media, every=2)
    per = {r.media_id: r["cnt"] for r in frames.groupBy("media_id").agg(
        F.count("*").alias("cnt")).collect()}
    # n_frames = 2 + (i % 3); sampled every 2 -> ceil(n/2)
    for i in range(6):
        nf = 2 + (i % 3)
        assert per[i] == (nf + 1) // 2


def test_real_format_gated(spark):
    df = spark.createDataFrame(
        [(99, "image", bytearray(b"\x89PNG\r\n" + b"\x00" * 64),
          {"format": "png", "width": 1, "height": 1, "n_frames": 1})],
        "media_id BIGINT, kind STRING, payload BINARY, "
        "meta STRUCT<format: STRING, width: INT, height: INT, n_frames: INT>",
    )
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        decode_images(df).collect()


def test_fake_container_layout():
    b = encode_fake(7, "image", 16, 16, 1)
    assert b[:4] == b"FAKE" and b[4:5] == b"I"
    assert len(b) == 11 + 16 * 16
    assert encode_fake(7, "image", 16, 16, 1) == b  # deterministic


def test_binaryfile_ingestion_roundtrip(spark, tmp_path):
    """binaryFile source ingestion: files written to a landing dir
    come back with payload bytes intact and the meta struct parsed
    JVM-side, matching the in-memory synthesized table exactly."""
    from capgemini_himss24_fhirbulkdata_demo_spark.multimodal.binary import (
        read_media_dir,
        write_fake_files,
    )

    d = str(tmp_path / "media")
    write_fake_files(d, 7, kind="video")
    got = read_media_dir(spark, d)
    ref = synthesize_media(spark, 7, kind="video")

    g = {r.media_id: r for r in got.collect()}
    r = {r.media_id: r for r in ref.collect()}
    assert set(g) == set(r) == set(range(7))
    for i in range(7):
        assert bytes(g[i].payload) == bytes(r[i].payload)
        assert g[i].kind == r[i].kind == "video"
        assert g[i].meta.asDict() == r[i].meta.asDict()

    # the parsed meta feeds the same downstream decoders
    decoded = {row.media_id: row for row in decode_images(got).collect()}
    assert decoded[0].width == g[0].meta.width
    assert decoded[0].n_frames == g[0].meta.n_frames
