"""Multimodal plumbing (M5): schemas, batch shapes, determinism.

The codecs are deterministic fakes (raw bytes = samples); what's under
test is the Spark-side contract — mapInPandas schemas, 1→N fan-out,
null/empty payloads, payload-aware partitioning.
"""

from __future__ import annotations

import numpy as np

from github_etl_spark.multimodal.media import (
    decode_stats,
    extract_features,
    repartition_by_payload,
    resize_images,
    sample_frames,
    synthesize_media,
)
from github_etl_spark.tables import load_tables


def _media(spark, sf_dir):
    docs = load_tables(spark, sf_dir, register=False)["documents"]
    return synthesize_media(docs.limit(60))


def test_synthesize_schema_and_determinism(spark, sf_dir):
    m = _media(spark, sf_dir)
    assert [f.name for f in m.schema] == ["media_id", "meta", "content"]
    assert m.schema["content"].dataType.typeName() == "binary"
    a = m.orderBy("media_id").limit(5).collect()
    b = m.orderBy("media_id").limit(5).collect()
    assert a == b  # same input → same payloads
    types = {r.meta.media_type for r in a}
    assert types <= {"image", "audio", "video"}


def test_decode_stats_matches_payload(spark, sf_dir):
    m = _media(spark, sf_dir)
    stats = {r.media_id: r for r in decode_stats(m).collect()}
    for row in m.collect():
        s = stats[row.media_id]
        arr = np.frombuffer(row.content, dtype=np.uint8) if row.content else None
        if arr is not None and len(arr):
            assert s.n_bytes == len(arr)
            assert abs(s.mean_value - float(arr.mean())) < 1e-9
            assert s.min_value == int(arr.min()) and s.max_value == int(arr.max())


def test_resize_fixed_output_size(spark, sf_dir):
    out = resize_images(_media(spark, sf_dir), 4, 3).collect()
    assert all(len(r.content) == 12 for r in out)
    assert all((r.width, r.height) == (4, 3) for r in out)


def test_sample_frames_video_only_fanout(spark, sf_dir):
    m = _media(spark, sf_dir)
    videos = {r.media_id: r.meta.n_frames for r in m.collect() if r.meta.media_type == "video"}
    frames = sample_frames(m, every_n=2).collect()
    assert {r.media_id for r in frames} == set(videos)
    by_id: dict[int, list[int]] = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_index)
    for mid, idxs in by_id.items():
        expected = list(range(0, videos[mid], 2))
        assert sorted(idxs) == expected  # every 2nd frame, 0-based


def test_extract_features_shape_and_norm(spark, sf_dir):
    feats = extract_features(_media(spark, sf_dir), dim=16).collect()
    assert all(len(r.features) == 16 for r in feats)
    for r in feats:
        n = float(np.linalg.norm(r.features))
        assert n == 0.0 or abs(n - 1.0) < 1e-5  # L2-normalized


def test_empty_and_null_payloads(spark):
    rows = [
        (1, ("image", 1, 1, None, 1, "raw-u8"), b""),
        (2, ("image", 1, 1, None, 1, "raw-u8"), None),
    ]
    m = spark.createDataFrame(
        rows,
        "media_id long, meta struct<media_type:string,width:int,height:int,"
        "sample_rate:int,n_frames:int,codec:string>, content binary",
    )
    stats = decode_stats(m).collect()
    # Honest integrity reporting: empty/NULL payloads are 0 bytes with
    # NULL stats, distinguishable from a real 1-byte 0x00 payload.
    assert all(s.n_bytes == 0 and s.mean_value is None for s in stats)


def test_repartition_by_payload_preserves_rows(spark, sf_dir):
    m = _media(spark, sf_dir)
    before = sorted(r.media_id for r in m.collect())
    re = repartition_by_payload(m, target_bytes=1 << 12)
    assert sorted(r.media_id for r in re.collect()) == before
    assert [f.name for f in re.schema] == ["media_id", "meta", "content"]
