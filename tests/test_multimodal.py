"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
byte-feature determinism (decode kernels are stubs — no codecs in the
container)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_byte_features_match_numpy(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    media = mm.attach_fake_media(docs)
    rows = {r["doc_id"]: r for r in mm.byte_features(media).collect()}
    for r in docs.select("doc_id", "text").collect():
        b = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8)
        got = rows[r["doc_id"]]
        assert got["n_bytes"] == b.size
        assert abs(got["byte_mean"] - float(b.mean())) < 1e-12
        assert abs(got["byte_std"] - float(b.std())) < 1e-12
        h = 1469598103934665603
        for v in b[:16]:
            h = ((h ^ int(v)) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        assert got["head_hash"] == h - (1 << 63)


def test_media_schema_and_resize(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    media = mm.attach_fake_media(docs)
    assert dict(media.dtypes)["media"] == "binary"
    resized = mm.resize_stub(media, 32, 32)
    row = resized.first()
    assert row["media_meta"]["width"] == 32
    assert row["media_meta"]["kind"] == "image/fake"
    # payload untouched by resize metadata stage
    assert bytes(row["media"]) == bytes(media.first()["media"])


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_frame_sample_slices(spark):
    from gdal_spark.functions.multimodal import attach_fake_media, frame_sample
    import hashlib
    text = "".join(chr(65 + i % 26) for i in range(70))  # 70 bytes
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {r["frame_idx"]: r["frame_md5"]
            for r in frame_sample(attach_fake_media(df)).collect()}
    # 70 // 16 = 4 frames, every 4th -> frame 0 only
    assert set(rows) == {0}
    assert rows[0] == hashlib.md5(text[:16].encode()).hexdigest()
    # finer sampling: every frame
    rows = {r["frame_idx"]: r["frame_md5"]
            for r in frame_sample(attach_fake_media(df),
                                  every_k=1).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for i in range(4):
        assert rows[i] == hashlib.md5(
            text[16 * i:16 * (i + 1)].encode()).hexdigest()


def test_resize_meta(spark):
    from gdal_spark.functions.multimodal import attach_fake_media, resize_meta
    df = spark.createDataFrame([(1, "x" * 40)], "doc_id long, text string")
    r = resize_meta(attach_fake_media(df), 32, 16).collect()[0]
    assert r["media_meta"]["width"] == 32 and r["media_meta"]["height"] == 16
    assert r["scale_x"] == 0.5 and r["scale_y"] == 0.25
