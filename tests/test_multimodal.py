"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic stubs."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.tables import load_table
from pyanomalydetector_spark.operators.multimodal import (
    synthesize_media, decode_features, frame_sample, resize_stub,
    FEATURE_SCHEMA, FRAME_SCHEMA,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media(load_table(spark, sf_dir, "documents")).persist()


def test_media_schema_and_determinism(media, spark, sf_dir):
    assert media.schema["payload"].dataType.simpleString() == "binary"
    again = synthesize_media(load_table(spark, sf_dir, "documents"))
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b


def test_decode_features_contract(media):
    out = decode_features(media, dim=16)
    assert out.schema == FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert len(r["features"]) == 16
        assert all(0.0 <= x < 1.0 for x in r["features"])
    # digest matches a driver-side recompute (stub is deterministic)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows[:10]:
        assert r["digest"] == hashlib.sha256(
            payloads[r["media_id"]]).hexdigest()[:16]
        assert r["n_bytes"] == len(payloads[r["media_id"]])


def test_frame_sample_covers_payload(media):
    out = frame_sample(media, n_frames=4)
    assert out.schema == FRAME_SCHEMA
    frames = {}
    for r in out.collect():
        frames.setdefault(r["media_id"], {})[r["frame_idx"]] = bytes(r["frame_bytes"])
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, fs in list(frames.items())[:10]:
        assert set(fs) == set(range(len(fs)))
        joined = b"".join(fs[i] for i in sorted(fs))
        assert payloads[mid].startswith(joined[: len(payloads[mid])])
        assert len(fs) <= 4


def test_resize_is_a_loud_stub(media):
    with pytest.raises(NotImplementedError):
        resize_stub(media, 224, 224)
