"""The REAL image kernels (operators/multimodal.py, kernel="pil"),
golden-tested against a hand-built PNG — the fixture is constructed in
pure Python (struct+zlib), so its bytes are verifiable without any
image library, and the PIL-backed assertions skip cleanly where Pillow
is not installed (this sandbox) while running everywhere it is."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from dlx_spark.operators import multimodal


def _png(width: int, height: int) -> bytes:
    """A minimal valid 8-bit RGB PNG (deterministic pixel gradient)."""
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(b for x in range(width)
                        for b in ((x * 37) % 256, (y * 59) % 256, 128))
        for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _media(spark, rows):
    """(doc_id, payload) rows in the MEDIA column shape."""
    return spark.createDataFrame(
        [(i, "image", p, "image/png", None, None, 0)
         for i, p in rows],
        "doc_id long, kind string, payload binary, mimetype string, "
        "width int, height int, duration_ms long")


def test_png_fixture_is_wellformed():
    """The fixture itself, byte-checked without any image library:
    signature, IHDR geometry, CRC-valid chunks, IEND terminator."""
    png = _png(2, 2)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    length, tag = struct.unpack(">I4s", png[8:16])
    assert tag == b"IHDR" and length == 13
    w, h, depth, color = struct.unpack(">IIBB", png[16:26])
    assert (w, h, depth, color) == (2, 2, 8, 2)
    crc = struct.unpack(">I", png[16 + 13:16 + 17])[0]
    assert crc == zlib.crc32(png[12:16 + 13]) & 0xFFFFFFFF
    assert png.endswith(struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF))
    assert png[-12:-4] == struct.pack(">I", 0) + b"IEND"


def test_pil_decode_golden_2x2(spark):
    pytest.importorskip("PIL")
    png = _png(2, 2)
    garbage = b"\x00\x01not an image"
    got = {r["doc_id"]: r for r in multimodal.decode_metadata(
        _media(spark, [(1, png), (2, garbage)]), kernel="pil").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["mode"]) \
        == (2, 2, "RGB")
    assert got[1]["n_bytes"] == len(png)
    assert got[1]["digest"] == hashlib.md5(png).hexdigest()
    # garbage decodes to nulls, never fails the batch
    assert (got[2]["width"], got[2]["height"], got[2]["mode"]) \
        == (None, None, None)
    assert got[2]["digest"] == hashlib.md5(garbage).hexdigest()


def test_pil_resize_golden_aspect_preserved(spark):
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    got = {r["doc_id"]: r for r in multimodal.resize_images(
        _media(spark, [(1, _png(8, 4)), (2, b"junk")]),
        max_side=2, kernel="pil").collect()}
    # 8x4 capped at longest-side 2 -> 2x1, aspect preserved
    assert (got[1]["width"], got[1]["height"]) == (2, 1)
    with Image.open(io.BytesIO(bytes(got[1]["payload"]))) as im:
        assert (im.width, im.height, im.mode) == (2, 1, "RGB")
    # junk passes through untouched with null dims
    assert bytes(got[2]["payload"]) == b"junk"
    assert (got[2]["width"], got[2]["height"]) == (None, None)


def test_pil_kernel_absent_fails_fast_at_plan_time(spark):
    """Where Pillow is NOT installed, requesting the real kernel must
    raise the documented NotImplementedError at plan construction —
    not a worker-side ImportError after a job launch."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed here — the absent-path is moot")
    except ImportError:
        pass
    media = _media(spark, [(1, b"x")])
    with pytest.raises(NotImplementedError, match="pillow"):
        multimodal.decode_metadata(media, kernel="pil")
    with pytest.raises(NotImplementedError, match="pillow"):
        multimodal.resize_images(media, kernel="pil")


def test_unknown_kernel_rejected(spark):
    media = _media(spark, [(1, b"x")])
    with pytest.raises(ValueError, match="kernel"):
        multimodal.decode_metadata(media, kernel="ffmpeg")
    with pytest.raises(ValueError, match="kernel"):
        multimodal.resize_images(media, kernel="ffmpeg")
