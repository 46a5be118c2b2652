"""Multimodal pipeline: the decode step is a documented stub, so the
tests pin the REAL parts — schema contract, metadata propagation,
mime sniffing, batch mechanics, determinism, and error-as-column."""

from __future__ import annotations

from pyspark.sql import functions as F

from mldb_spark.multimodal import (
    attach_metadata,
    decode_images,
    image_features,
    sample_frames,
    sniff_mime,
)


def _media(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"jpegdata" * 50),
        (2, b"\x89PNG\r\n" + b"pngdata" * 80),
        (3, b"plain bytes payload"),
        (4, b""),  # corrupt/empty member
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_attach_metadata_and_mime(spark):
    media = attach_metadata(_media(spark))
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    assert meta[1]["mime_type"] == "image/jpeg"
    assert meta[2]["mime_type"] == "image/png"
    assert meta[3]["mime_type"] == "application/octet-stream"
    assert meta[2]["n_bytes"] == len(b"\x89PNG\r\n" + b"pngdata" * 80)
    assert len(meta[1]["content_md5"]) == 32


def test_metadata_projection_skips_payload(spark):
    # metadata-only query must not read the content column (column
    # pruning): assert the optimized plan's schema excludes it
    media = attach_metadata(_media(spark))
    plan = media.select("media_id", "meta.mime_type")._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan.split("Project")[0] or "content#" not in plan


def test_decode_contract(spark):
    media = attach_metadata(_media(spark))
    decoded = decode_images(media, out_w=4, out_h=3)
    rows = {r["media_id"]: r for r in decoded.collect()}
    ok = rows[1]
    assert ok["error"] is None and ok["width"] == 4 and ok["height"] == 3
    assert len(ok["pixels"]) == 12
    assert all(0 <= p <= 255 for p in ok["pixels"])
    # determinism: same bytes -> same pseudo-pixels
    again = {r["media_id"]: r for r in decode_images(media, out_w=4, out_h=3).collect()}
    assert again[1]["pixels"] == ok["pixels"]
    # corrupt member -> error column, row preserved, job not failed
    assert rows[4]["error"] is not None and rows[4]["pixels"] is None


def test_image_features(spark):
    media = attach_metadata(_media(spark))
    feats = image_features(decode_images(media))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert 4 not in rows  # errored member filtered
    assert 0 <= rows[1]["px_mean"] <= 255
    assert rows[1]["px_std"] > 0
    assert rows[1]["px_range"] > 0


def test_sample_frames(spark):
    media = attach_metadata(_media(spark))
    frames = sample_frames(media, n_frames=3)
    good = frames.filter(F.col("error").isNull())
    assert good.count() == 3 * 3  # three decodable members
    per = good.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per)
    # frames differ across idx but are deterministic across runs
    one = sorted(
        (r["frame_idx"], r["frame_md5"])
        for r in good.filter(F.col("media_id") == 1).collect()
    )
    assert len({h for _, h in one}) == 3
