"""Multimodal plumbing tests: metadata is exact, the decode stub is
deterministic and batch-shape invariant, magic-byte sniffing works on
real magic bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_with_mapreduce_cuda_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_and_featurize,
    documents_as_binary,
    payload_metadata,
    sniff_media_type,
)
from kmeans_with_mapreduce_cuda_spark.sources.readers import load_table

from conftest import SF_DIR


def test_payload_metadata_matches_text(spark):
    d = documents_as_binary(load_table(spark, SF_DIR, "documents")).limit(50)
    rows = d.select("doc_id", payload_metadata("payload").alias("m")).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").limit(50).collect()
    }
    for r in rows:
        t = docs[r["doc_id"]]
        assert r["m"]["n_bytes"] == len(t.encode())
        assert r["m"]["media_type"] == "application/octet-stream"


def test_magic_byte_sniffing(spark):
    samples = [
        (bytearray(b"\x89PNG\r\n\x1a\n") + b"xxxx", "image/png"),
        (bytearray(b"\xff\xd8\xff\xe0") + b"JFIF", "image/jpeg"),
        (bytearray(b"GIF89a") + b"xx", "image/gif"),
        (bytearray(b"RIFF") + b"1234WAVE", "audio/wav"),
        (bytearray(b"%PDF-1.7") + b"x", "application/pdf"),
        (bytearray(b"plain text"), "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, bytes(b)) for i, (b, _) in enumerate(samples)], ["i", "payload"]
    )
    got = {
        r["i"]: r["mt"]
        for r in df.select("i", sniff_media_type("payload").alias("mt")).collect()
    }
    for i, (_, want) in enumerate(samples):
        assert got[i] == want, (i, got[i], want)


def test_decode_stub_deterministic_and_batch_invariant(spark):
    d = documents_as_binary(load_table(spark, SF_DIR, "documents")).limit(100)
    a = decode_and_featurize(d.repartition(1)).collect()
    b = decode_and_featurize(d.repartition(7)).collect()

    def keyed(rows):
        return {
            r["doc_id"]: (r["width"], r["height"], tuple(r["features"]))
            for r in rows
        }

    ka, kb = keyed(a), keyed(b)
    assert ka == kb, "features must not depend on partitioning/batch shape"
    for w, h, feats in ka.values():
        assert len(feats) == FEATURE_DIM
        assert abs(sum(feats) - 1.0) < 1e-5  # normalized histogram
        assert 1 <= w <= 640 and 1 <= h <= 480


def test_decode_status_marks_stub(spark):
    d = documents_as_binary(load_table(spark, SF_DIR, "documents")).limit(5)
    st = decode_and_featurize(d).select("decode_status").distinct().collect()
    assert [r["decode_status"] for r in st] == ["stub"]
