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


def test_read_pixel_and_proximate(spark):
    # ReadPixels/ProximateVoxels addressing over decoded row-major
    # pixels: pure Column lookups, NULL outside the image bounds
    from mldb_spark.multimodal import proximate_pixels, read_pixel

    decoded = spark.createDataFrame(
        [(1, 3, 2, [10, 11, 12, 20, 21, 22])],
        "media_id long, width int, height int, pixels array<int>",
    )
    row = decoded.select(
        read_pixel(0, 0).alias("tl"),
        read_pixel(2, 1).alias("br"),
        read_pixel(3, 0).alias("oob_x"),
        read_pixel(0, 2).alias("oob_y"),
        proximate_pixels(1, 0, radius=1).alias("hood"),
    ).collect()[0]
    assert row["tl"] == 10 and row["br"] == 22
    assert row["oob_x"] is None and row["oob_y"] is None
    # 3x3 window centered at (1,0): top row out of bounds
    assert row["hood"] == [None, None, None, 10, 11, 12, 20, 21, 22]


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


def _synthetic_exif_jpeg() -> bytes:
    """Minimal JPEG wrapping a little-endian TIFF/EXIF block: IFD0
    with Make/Model/Orientation/DateTime + an Exif sub-IFD with
    FNumber (rational) and ISO."""
    import struct

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI4s", tag, typ, cnt, val)

    # strings stored past the IFDs
    make, model, dt = b"ACME\x00", b"Cam9000\x00", b"2024:01:02 03:04:05\x00"
    # layout: header(8) + ifd0(2+5*12+4) + exif_ifd(2+2*12+4) + data
    ifd0_off = 8
    ifd0_size = 2 + 5 * 12 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = 2 + 2 * 12 + 4
    data_off = exif_off + exif_size
    make_off, model_off = data_off, data_off + len(make)
    dt_off = model_off + len(model)
    fnum_off = dt_off + len(dt)

    tiff = struct.pack("<2sHI", b"II", 42, ifd0_off)
    tiff += struct.pack("<H", 5)
    tiff += entry(0x010F, 2, len(make), struct.pack("<I", make_off))
    tiff += entry(0x0110, 2, len(model), struct.pack("<I", model_off))
    tiff += entry(0x0112, 3, 1, struct.pack("<HH", 6, 0))
    tiff += entry(0x0132, 2, len(dt), struct.pack("<I", dt_off))
    tiff += entry(0x8769, 4, 1, struct.pack("<I", exif_off))
    tiff += struct.pack("<I", 0)  # next IFD
    tiff += struct.pack("<H", 2)
    tiff += entry(0x829D, 5, 1, struct.pack("<I", fnum_off))
    tiff += entry(0x8827, 3, 1, struct.pack("<HH", 400, 0))
    tiff += struct.pack("<I", 0)
    tiff += make + model + dt + struct.pack("<II", 28, 10)  # f/2.8

    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
    return b"\xff\xd8" + seg + b"\xff\xd9"


def test_parse_exif(spark):
    from mldb_spark.multimodal import parse_exif

    good = _synthetic_exif_jpeg()
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\x00\x01not an image"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in parse_exif(df).collect()}
    r1 = rows[1]
    assert r1["cameraMake"] == "ACME" and r1["cameraModel"] == "Cam9000"
    assert r1["imageOrientation"] == 6
    assert r1["imageDateTime"] == "2024:01:02 03:04:05"
    assert abs(r1["fStop"] - 2.8) < 1e-9 and r1["isoSpeed"] == 400
    assert r1["error"] is None
    assert rows[2]["error"] is not None and rows[2]["cameraMake"] is None


def _tiny_png() -> bytes:
    """A valid 2x2 grayscale PNG (pixels 10,20 / 30,40), stdlib-only."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = b"\x00\x0a\x14" + b"\x00\x1e\x28"
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_images_codec_gate(spark):
    """decode_images routes through the REAL Pillow codec when
    importable and the md5-derived stub otherwise — both paths pinned
    by the content-hash contract (same bytes -> same pixels)."""
    import hashlib

    import numpy as np

    from mldb_spark.multimodal import (
        _fake_decode,
        decode_images,
        pil_available,
    )

    png = _tiny_png()
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, content binary")
    rows = decode_images(df, out_w=2, out_h=2).collect()
    assert len(rows) == 1 and rows[0]["error"] is None
    got = list(rows[0]["pixels"])

    if pil_available():
        # real codec: decode must reproduce the actual encoded pixels
        assert got == [10, 20, 30, 40]
    else:
        # stub: deterministic pseudo-pixels seeded by the content md5
        expected = _fake_decode(png, 2, 2).ravel().tolist()
        assert got == expected
        seed = int.from_bytes(hashlib.md5(png).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        assert got == rng.integers(0, 256, size=(2, 2), dtype=np.uint8).ravel().tolist()

    # forcing the absent codec must fail loudly, never silently stub
    if not pil_available():
        import pytest as _pytest

        with _pytest.raises(ValueError, match="pil"):
            decode_images(df, decoder="pil")
