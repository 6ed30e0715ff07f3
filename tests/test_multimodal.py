"""Multimodal plumbing tests: the codec stubs are deterministic and the
Spark-side shapes (schemas, Arrow batches, cardinality changes) are real —
what the engine promises until actual media libs are installed."""

from __future__ import annotations

import pytest

from minimised_impala_spark.extensions import multimodal as M
from minimised_impala_spark.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter("doc_id < 50")


def _pil_available() -> bool:
    try:
        import PIL  # type: ignore[import-not-found]  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="PIL installed: real codec active")
def test_real_codec_hooks_raise_without_pil():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        M.resize_image_real(b"\x89PNG", 224, 224)


def test_real_codec_roundtrip_with_pil():
    """Environment-gated real-codec test: skipped while PIL is absent,
    upgrades itself automatically when codec libs are installed."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16)).save(buf, format="PNG")
    payload = buf.getvalue()
    assert M.decode_image_real(payload) == (32, 16, 3)
    resized = M.resize_image_real(payload, 8, 8)
    assert M.decode_image_real(resized) == (8, 8, 3)


def test_decode_stub_deterministic(spark, sf_dir):
    a = M.multimodal_decode_stub(spark, sf_dir).collect()
    b = M.multimodal_decode_stub(spark, sf_dir).collect()
    assert a == b and len(a) > 0


def test_resize_shape_and_dims(spark, sf_dir):
    out = M.resized(_docs(spark, sf_dir), 224, 224)
    assert [f.name for f in out.schema.fields] == ["doc_id", "payload", "width", "height"]
    rows = out.collect()
    assert rows and all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)


def test_frame_sample_cardinality(spark, sf_dir):
    """Every 4th 64-byte chunk: n_frames == ceil(ceil(len/64)/4) per doc."""
    import math

    docs = _docs(spark, sf_dir)
    expected = {
        r["doc_id"]: math.ceil(math.ceil(r["blen"] / 64) / 4)
        for r in docs.selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) blen").collect()
    }
    got = {
        r["doc_id"]: r["n_frames"]
        for r in M.multimodal_frame_sample(spark, sf_dir).filter("doc_id < 50").collect()
    }
    assert got == expected


def test_feature_extraction_feeds_similarity(spark, sf_dir):
    from pyspark.sql import functions as F

    feats = M.extract_features(_docs(spark, sf_dir), dim=8)
    assert dict(feats.dtypes)["embedding"] == "array<double>"
    rows = feats.collect()
    assert all(len(r["embedding"]) == 8 for r in rows)
    # deterministic across runs
    again = M.extract_features(_docs(spark, sf_dir), dim=8).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    # usable by the similarity family's dot-product kernel
    from minimised_impala_spark.extensions import vector_kernels as VK

    d = feats.select(VK.dot_pair("embedding", "embedding").alias("d")).collect()
    assert all(r["d"] >= 0 for r in d)


def test_audio_chunks_content_and_geometry(spark, sf_dir):
    """Chunk byte content (md5) matches a driver-side model; geometry
    follows the CHUNK/HOP framing exactly."""
    import hashlib

    from minimised_impala_spark.extensions import multimodal as M
    from minimised_impala_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 20")
    got = M.audio_chunks(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        payload = texts[doc_id].encode("utf-8")
        rows.sort(key=lambda r: r["chunk_idx"])
        expect_n = (len(payload) - 1) // M.HOP + 1
        assert len(rows) == expect_n
        for r in rows:
            piece = payload[r["offset"] : r["offset"] + M.CHUNK]
            assert r["n_samples"] == len(piece)
            assert r["chunk_md5"] == hashlib.md5(piece).hexdigest()
