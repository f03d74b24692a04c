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
    the crawl's media_ref spans). Selection is ``doc_id < n`` — a
    DETERMINISTIC predicate (an unordered ``limit`` picks
    partition-arrival-order rows, which would make the oracle comparison
    flaky)."""
    kinds = ["image", "audio", "video"]
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < n)

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
    """Decode pipeline: synth blobs -> Arrow-batched binary decode ->
    per-kind integer stats.

    EXACT DuckDB oracle (SQL_MEDIA_META): every output is an integer and
    the blob is a pure function of doc_id, so the oracle recomputes the
    expected width/height/byte-count/checksum ANALYTICALLY in SQL — the
    comparison verifies the whole binary round-trip (synth header pack ->
    mapInPandas decode -> aggregation) to the last bit."""
    meta = extract_media_meta(media_table(spark, sf_dir))
    return meta.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("width").alias("max_w"),
        F.max("height").alias("max_h"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("checksum").alias("sum_checksum"),
    )


# Analytic mirror of synth_blob/decode_image_meta: blob = 4B magic "SYNM"
# (byte sum 327) + kind[0] + '<HH' w,h (little-endian byte sums) + 64-byte
# body (doc_id*31+i mod 256). All integers -> bit-exact across engines.
SQL_MEDIA_META = """
WITH m AS (
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         16 + (doc_id * 7919) % 1024 AS w,
         16 + (doc_id * 104729) % 768 AS h,
         list_sum(list_transform(generate_series(0, 63),
                                 i -> (doc_id * 31 + i) % 256)) AS body_sum
  FROM documents WHERE doc_id < 200),
c AS (
  SELECT kind, w, h,
         327
         + CASE kind WHEN 'image' THEN 105 WHEN 'audio' THEN 97 ELSE 118 END
         + (w % 256) + (w // 256) + (h % 256) + (h // 256)
         + body_sum AS checksum
  FROM m)
SELECT kind, CAST(count(*) AS BIGINT) AS n,
       CAST(max(w) AS INT) AS max_w, CAST(max(h) AS INT) AS max_h,
       CAST(count(*) * 73 AS BIGINT) AS total_bytes,
       CAST(sum(checksum) AS BIGINT) AS sum_checksum
FROM c GROUP BY kind
"""

QUERIES = {
    "multimodal_media_meta": (q_media_meta, SQL_MEDIA_META),
}
