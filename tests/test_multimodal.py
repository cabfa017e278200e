"""Multimodal kernel plumbing (SURVEY.md §2.10): schema, batch shape,
fan-out, and stub gating for the mapInPandas media kernels."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators import multimodal
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table
from demo_apache_flink_streaming_mode_spark.streaming import generators, sinks


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return multimodal.to_media(load_table(spark, sf_dir, "documents").limit(50))


def test_resize_bounds_and_schema(spark, media):
    out = multimodal.resize_media(media, target_bytes=128).collect()
    assert len(out) == 50
    for r in out:
        assert r["n_bytes"] == len(r["media"]) <= 128
        assert r["media_type"].startswith("resized/")


def test_resize_deterministic(spark, media):
    a = {r["doc_id"]: bytes(r["media"])
         for r in multimodal.resize_media(media, target_bytes=64).collect()}
    b = {r["doc_id"]: bytes(r["media"])
         for r in multimodal.resize_media(media, target_bytes=64).collect()}
    assert a == b


def test_frame_sampling_fanout(spark, media):
    frames = multimodal.sample_frames(media, frame_bytes=64, every_n=2)
    rows = frames.collect()
    assert len(rows) > 50  # fan-out: more frames than docs
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    sizes = {r["doc_id"]: r["n_bytes"]
             for r in multimodal.media_manifest(media).collect()}
    for doc_id, fr in by_doc.items():
        n = max(1, (sizes[doc_id] + 63) // 64)
        assert all(f["n_frames"] == n for f in fr)
        assert sorted(f["frame_idx"] for f in fr) == list(range(0, n, 2))


def test_real_codec_raises(spark, media):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        multimodal.resize_media(media, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_rate_generators_shape(spark):
    """S3 — rate-source generators produce the reference value domains."""
    df = generators.audit_trail_generator(spark, rows_per_second=100)
    q = (df.writeStream.format("memory").queryName("t_gen")
         .outputMode("append")
         .trigger(processingTime="500 milliseconds").start())
    import time
    deadline = time.time() + 30
    while time.time() < deadline and spark.table("t_gen").count() < 5:
        time.sleep(0.5)
    q.stop()
    rows = spark.table("t_gen").collect()
    assert len(rows) >= 5
    for r in rows:
        assert r["user"] in generators.USERS
        assert r["operation"] in generators.OPERATIONS
        assert r["entity"] in generators.ENTITIES
        assert 1 <= r["duration"] <= 10 and 1 <= r["change_count"] <= 4
