"""Multimodal plumbing: Arrow-batched decode/feature/resize over binary
columns; malformed payloads become error rows, not task failures."""

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    FakeCodec,
    decode_and_featurize,
    frame_sample,
    resize,
    synth_media_df,
)


def test_decode_and_featurize(spark):
    df = synth_media_df(spark, 20, seed=1)
    out = decode_and_featurize(df).cache()
    assert out.count() == 20
    assert out.where(~F.col("ok")).count() == 0
    row = out.where(F.col("media_id") == 3).collect()[0]
    w, h, body = FakeCodec.decode(FakeCodec.encode(row["width"], row["height"], 1 + 3))
    assert row["n_bytes"] == w * h
    assert abs(row["mean_value"] - sum(body) / len(body)) < 1e-3
    out.unpersist()


def test_malformed_payload_becomes_error_row(spark):
    bad = spark.createDataFrame(
        [(99, "image", b"\xff\xd8\xff\xe0 not fake", None, None, "jpeg")], MEDIA_SCHEMA
    )
    out = decode_and_featurize(bad).collect()
    assert len(out) == 1
    assert out[0]["ok"] is False
    assert "unknown media container" in out[0]["error"]


def test_resize_roundtrip(spark):
    df = synth_media_df(spark, 6, seed=2)
    out = resize(df, 4, 4).collect()
    assert len(out) == 6
    for r in out:
        w, h, body = FakeCodec.decode(bytes(r["payload"]))
        assert (w, h) == (4, 4)
        assert len(body) == 16


def test_frame_sample_is_jvm_side(spark):
    df = synth_media_df(spark, 10, seed=3)
    sampled = frame_sample(df, every_k=2)
    assert sampled.count() == 5
    # no Python stage in the plan: BatchEvalPython/ArrowEvalPython absent
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
