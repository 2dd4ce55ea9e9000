"""Multimodal plumbing tests: stub decode boundary, Arrow batch
shape, deterministic features, frame-sampling explosion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_wrangler_spark.operators import multimodal


def _payloads(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows],
        "doc_id bigint, payload binary",
    )


def test_stub_decode_rejects_unknown_codec():
    with pytest.raises(NotImplementedError):
        multimodal.stub_decode(b"\x89PNG real image bytes")


def test_image_features_deterministic(spark):
    df = _payloads(spark, [(1, b"FAKEIM hello"), (2, b"FAKEIM other")])
    a = {r["doc_id"]: tuple(r) for r in
         multimodal.image_features(df).collect()}
    b = {r["doc_id"]: tuple(r) for r in
         multimodal.image_features(df).collect()}
    assert a == b
    assert a[1][1:3] == (8, 6)               # width, height
    assert 0 <= a[1][3] <= 255               # mean luma in byte range
    assert a[1] != a[2]                      # payload-sensitive


def test_image_features_same_payload_same_features(spark):
    df = _payloads(spark, [(1, b"FAKEIM same"), (2, b"FAKEIM same")])
    got = {r["doc_id"]: (r["mean_luma"], r["thumb_8x6_md5"])
           for r in multimodal.image_features(df).collect()}
    assert got[1] == got[2]


def test_frame_sample_explosion_and_policy(spark):
    df = _payloads(spark, [(7, b"FAKEVID clip")])
    out = multimodal.sample_frames(df, every_nth=10, n_frames=30)
    rows = sorted((r["frame_no"], r["frame_md5"]) for r in out.collect())
    assert [f for f, _ in rows] == [0, 10, 20]
    assert len({h for _, h in rows}) == 3    # frames differ
