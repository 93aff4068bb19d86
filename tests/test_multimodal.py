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
