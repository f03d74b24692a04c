"""Multimodal column plumbing: opaque binary media + typed metadata.

The reference stores media as URL strings only (thumbnail_url,
New_YouTube_Crawler.py:175; writer_img_url,
New_YouTube_Crawler_Comment.py:182). A training-data pipeline needs the
bytes: this module treats image/audio/video as opaque ``binary`` columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``
stages.

The sandbox has no image/audio libraries, so the DECODE step is stubbed:
``decode_image_meta`` parses a deterministic fake header (our synthetic
blobs) and raises ``NotImplementedError`` for real formats — the
Spark-side plumbing (schema, batch shape, partitioning, UDF signature) is
real and tested; swapping in Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.testdata import load

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("blob", BinaryType(), False),
    ]
)

MEDIA_META = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", LongType(), False),
    ]
)

_MAGIC = b"SYNM"  # synthetic media header: SYNM | kind(1B) | w(u16) | h(u16)


def synth_blob(media_id: int, kind: str) -> bytes:
    """Deterministic fake media blob with a parseable header."""
    w = 16 + (media_id * 7919) % 1024
    h = 16 + (media_id * 104729) % 768
    body = bytes((media_id * 31 + i) % 256 for i in range(64))
    return _MAGIC + bytes([ord(kind[0])]) + struct.pack("<HH", w, h) + body


def decode_image_meta(blob: bytes) -> tuple[int | None, int | None]:
    """STUB decode: parses the synthetic header; real formats are not
    implemented in this container (no Pillow/ffmpeg)."""
    if blob[:4] == _MAGIC:
        w, h = struct.unpack("<HH", blob[5:9])
        return int(w), int(h)
    raise NotImplementedError("real image decoding requires Pillow; synthetic header expected")


def media_table(spark: SparkSession, sf_dir: str, n: int = 200) -> DataFrame:
    """Synthetic media table derived from the documents ids (stand-in for
    the crawl's media_ref spans)."""
    kinds = ["image", "audio", "video"]
    docs = load(spark, sf_dir, "documents").select("doc_id").limit(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [kinds[i % 3] for i in ids],
                    "blob": [synth_blob(int(i), kinds[int(i) % 3]) for i in ids],
                }
            )

    return docs.mapInPandas(gen, MEDIA)


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary blobs — the decode
    UDF shape a real pipeline uses (mapInPandas; one batch = many blobs,
    never per-row Python UDF dispatch)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            dims = [decode_image_meta(blob) for blob in b["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(x) for x in b["blob"]],
                    "checksum": [sum(x) for x in b["blob"]],
                }
            )

    return media.mapInPandas(extract, MEDIA_META)


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub pipeline: synth blobs -> metadata -> per-kind stats.
    Non-SQL-expressible (binary UDF stage) -> driver rows-only check."""
    meta = extract_media_meta(media_table(spark, sf_dir))
    return meta.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("width").alias("max_w"),
        F.max("height").alias("max_h"),
        F.sum("n_bytes").alias("total_bytes"),
    )


QUERIES = {
    "multimodal_media_meta": (q_media_meta, None),
}
