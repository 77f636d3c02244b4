"""Multimodal plumbing: schema, determinism, dup detection, frame sampling.

Decode is stubbed (no image libs in-sandbox) — these tests pin the
Spark-side contract: Arrow batch shapes, output schemas, determinism of
the byte-level stand-ins, and the dedup semantics over binary payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from hsearch_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    _fake_decode_features,
    decode_image,
    exact_media_dup_groups,
    extract_media_features,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes " * 50, {"w": "640", "h": "480"}),
        (2, "image", b"\x89PNG fake bytes " * 50, {"w": "640", "h": "480"}),  # dup of 1
        (3, "image", b"\xff\xd8JPEG other " * 80, {"w": "100", "h": "100"}),
        (4, "audio", b"RIFF wav-ish payload " * 200, {"sr": "16000"}),
        (5, "video", bytes(range(256)) * 300, {"fps": "30"}),
        (6, "image", None, {}),
        (7, "image", b"", {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_schema_and_determinism(spark):
    m = _media(spark)
    f1 = {r["doc_id"]: r for r in extract_media_features(m).collect()}
    f2 = {
        r["doc_id"]: r
        for r in extract_media_features(m.repartition(5)).collect()
    }
    assert len(f1) == 7
    for k in f1:
        assert f1[k]["content_sha1"] == f2[k]["content_sha1"]
        assert f1[k]["feature"] == f2[k]["feature"]
    # feature = L1-normalized 16-bucket histogram
    feat = np.array(f1[4]["feature"])
    assert feat.shape == (16,)
    assert abs(feat.sum() - 1.0) < 1e-5
    # python-side oracle
    payload = b"RIFF wav-ish payload " * 200
    assert f1[4]["content_sha1"] == hashlib.sha1(payload).hexdigest()
    assert np.allclose(feat, _fake_decode_features(payload), atol=1e-7)
    # null/empty payloads -> zero features, sha of empty bytes
    assert f1[6]["n_bytes"] == 0
    assert f1[6]["content_sha1"] == hashlib.sha1(b"").hexdigest()
    assert f1[6]["feature"] == f1[7]["feature"]


def test_exact_media_dup_groups(spark):
    feats = extract_media_features(_media(spark))
    groups = exact_media_dup_groups(feats).collect()
    # docs 1,2 share payload; docs 6,7 share empty payload
    got = {(r["n_media"], r["keep_doc_id"]) for r in groups}
    assert got == {(2, 1), (2, 6)}


def test_sample_frames_shape(spark):
    m = _media(spark)
    frames = sample_frames(m, n_frames=4, chunk=1000).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every non-empty payload gets exactly 4 frames, indexed 0..3
    assert sorted(by_doc) == [1, 2, 3, 4, 5]
    for rows in by_doc.values():
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
    # identical payloads -> identical frame fingerprints
    fp1 = [r["frame_sha1"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])]
    fp2 = [r["frame_sha1"] for r in sorted(by_doc[2], key=lambda r: r["frame_idx"])]
    assert fp1 == fp2


def test_decode_image_gated(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; decode path live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_resize_media_bounded_and_deterministic(spark):
    from hsearch_spark.functions.multimodal import resize_media

    rows = [
        (1, bytes(range(256)) * 32),   # 8192 bytes → subsampled
        (2, b"tiny"),                  # under target → passthrough
        (3, None),                     # null payload → empty
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in resize_media(media, target_bytes=512).collect()}
    assert got[1]["n_bytes_in"] == 8192
    assert got[1]["n_bytes_out"] <= 512
    assert got[2]["resized"] == b"tiny"
    assert got[3]["n_bytes_out"] == 0
    # deterministic: same payload → same resized bytes across runs
    again = {r["doc_id"]: r for r in resize_media(media, target_bytes=512).collect()}
    assert bytes(got[1]["resized"]) == bytes(again[1]["resized"])
