"""Real-format image metadata decode (VERDICT r2 item 7): the synthetic
SYNM header is no longer the only path — PNG/JPEG/GIF dimensions parse
straight from container headers, Pillow is probed as the catch-all, and
the same Arrow-batched mapInPandas stage handles mixed-format batches.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from swmaestro_crawler_spark.operators.multimodal import (
    MEDIA,
    decode_image_meta,
    extract_media_meta,
    synth_blob,
)


def golden_png(w: int, h: int) -> bytes:
    """A complete, spec-valid 8-bit RGB PNG built with stdlib only."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))  # filter-0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def golden_jpeg(w: int, h: int) -> bytes:
    """SOI + APP0 + SOF0 frame header + EOI — enough of a JPEG for any
    header-walking dimension parser."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof = (
        b"\xff\xc0"
        + struct.pack(">HB", 17, 8)
        + struct.pack(">HH", h, w)
        + b"\x03"
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def golden_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def test_decode_real_formats():
    assert decode_image_meta(golden_png(640, 480)) == (640, 480)
    assert decode_image_meta(golden_jpeg(1024, 7)) == (1024, 7)
    assert decode_image_meta(golden_gif(33, 44)) == (33, 44)


def test_decode_synth_still_works():
    blob = synth_blob(42, "image")
    w, h = decode_image_meta(blob)
    assert (w, h) == (16 + (42 * 7919) % 1024, 16 + (42 * 104729) % 768)


def test_decode_unknown_raises_without_pillow():
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_image_meta(b"\x00unknown-format-blob")


def test_decode_pillow_crosscheck():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(golden_png(640, 480))) as im:
        assert (im.width, im.height) == (640, 480)
    assert decode_image_meta(golden_png(640, 480)) == (640, 480)


def test_mixed_format_batch_through_spark(spark):
    """One mapInPandas stage, one Arrow batch, three container formats +
    a synthetic blob — the production decode shape end-to-end."""
    rows = [
        (1, "image", bytearray(golden_png(12, 34))),
        (2, "image", bytearray(golden_jpeg(56, 78))),
        (3, "image", bytearray(golden_gif(9, 10))),
        (4, "image", bytearray(synth_blob(4, "image"))),
    ]
    media = spark.createDataFrame(rows, MEDIA)
    got = {r.media_id: (r.width, r.height) for r in extract_media_meta(media).collect()}
    assert got == {
        1: (12, 34),
        2: (56, 78),
        3: (9, 10),
        4: (16 + (4 * 7919) % 1024, 16 + (4 * 104729) % 768),
    }
