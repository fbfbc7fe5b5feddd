"""Multimodal plumbing tests: schema, Arrow batch shape, stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.multimodal import (
    DECODED_SCHEMA,
    as_media_table,
    decode_media,
    _fake_decode,
)


def test_media_schema_binary_payload(spark, sf_dir):
    from etl_generator_demo_spark.operators.relational import t

    media = as_media_table(t(spark, sf_dir, "documents"))
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_type"] == "string"
    assert dtypes["meta"].startswith("struct<")
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_decode_media_deterministic_and_complete(spark, sf_dir):
    from etl_generator_demo_spark.operators.relational import t

    media = as_media_table(t(spark, sf_dir, "documents")).limit(50)
    out1 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
            for r in decode_media(media).collect()}
    out2 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
            for r in decode_media(media).collect()}
    assert out1 == out2 and len(out1) == 50
    assert decode_media(media).schema == DECODED_SCHEMA


def test_images_single_frame(spark, sf_dir):
    from etl_generator_demo_spark.operators.relational import t

    media = as_media_table(t(spark, sf_dir, "documents"))
    frames = (
        decode_media(media)
        .groupBy("media_type")
        .agg(F.max("n_frames").alias("mx"), F.min("n_frames").alias("mn"))
        .collect()
    )
    by_type = {r["media_type"]: (r["mn"], r["mx"]) for r in frames}
    assert by_type["image"] == (1, 1)       # images are one frame
    assert by_type["video"][1] > 1          # videos sample many


def test_fake_decode_contract():
    assert _fake_decode(b"abc", "image")[2] == 1
    with pytest.raises(NotImplementedError):
        _fake_decode(b"abc", "hologram")


def test_frame_sampling_policy_caps_and_covers(spark, sf_dir):
    """Every video yields 1..8 sampled frames, stride-uniform from 0,
    never exceeding n_frames-1."""
    from etl_generator_demo_spark.operators.multimodal import x5_frame_samples

    rows = x5_frame_samples(spark, sf_dir).collect()
    per_media: dict[int, list] = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r)
    assert per_media
    for mid, frames in per_media.items():
        assert mid % 3 == 2  # videos only
        idxs = [f["frame_idx"] for f in frames]
        assert 1 <= len(idxs) <= 8
        assert idxs[0] == 0
        strides = {b - a for a, b in zip(idxs, idxs[1:])}
        assert len(strides) <= 1  # uniform
        for f in frames:
            assert f["frame_ts_ms"] == f["frame_idx"] * 33


def test_image_tiling_invariants(spark, sf_dir):
    """Tile accounting must be exact: the padded grid area equals the
    image area plus reported padding, partial tiles only on the
    right/bottom edge bands, and dims must match the stub decoder."""
    from etl_generator_demo_spark.operators.multimodal import x5_image_tiling_plan
    from etl_generator_demo_spark.operators.relational import t

    rows = x5_image_tiling_plan(spark, sf_dir).collect()
    assert rows, "no image rows"
    T = 224
    for r in rows:
        nx = -(-r["width"] // T)
        ny = -(-r["height"] // T)
        assert r["n_tiles"] == nx * ny
        assert r["n_tiles"] * T * T == r["width"] * r["height"] + r["pad_px"]
        # partial tiles = right column band + bottom row band (minus
        # double-counted corner) when the edge is ragged
        px = nx * (1 if r["height"] % T else 0) + ny * (1 if r["width"] % T else 0)
        if r["width"] % T and r["height"] % T:
            px -= 1
        assert r["n_partial"] == px
    # dims agree with the stub decoder output for the same media
    media = as_media_table(t(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "image"
    ).limit(20)
    dec = {r["media_id"]: (r["width"], r["height"]) for r in decode_media(media).collect()}
    got = {r["media_id"]: (r["width"], r["height"]) for r in rows if r["media_id"] in dec}
    assert got == dec
