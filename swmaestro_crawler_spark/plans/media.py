"""Media-asset pipeline: fetch the bytes behind the spans table's
``media_ref`` entries into a content-addressed blob store.

The north-star table is "interleaved text + media documents"; the crawl
rounds emit the media REFERENCES (the reference crawler likewise stores
thumbnail/avatar URLs only — New_YouTube_Crawler.py:175). This module
is the stage a real media corpus needs next: resolve each new reference
once, store each distinct CONTENT once, and keep the mapping —

- ``MEDIA_REFS``  (media_ref, content_key, round): which asset each
  reference resolved to, appended once per newly-seen reference;
- ``MEDIA_BLOBS`` (content_key, kind, n_bytes, blob): one row per
  distinct content hash — the content-addressed store (the web reuses
  the same thumbnail under many URLs; storing per-ref would duplicate).

Incremental by construction: a sweep reads the spans table (or ONE
round's appends via ``read_delta`` — only the delta files are scanned),
anti-joins the standing ``MEDIA_REFS`` so previously-resolved
references cost nothing, fetches only the remainder, and anti-joins
``MEDIA_BLOBS`` on content_key so previously-stored bytes are never
rewritten. A second sweep over the same warehouse is a no-op (0 new
refs, 0 new blobs) — pinned by tests.

Crash safety: blobs commit BEFORE refs. A crash between the commits
leaves orphan blobs (harmless; the re-run's ref sweep re-resolves and
the blob anti-join skips them) — never a ref without its bytes.

Scale shape: references shuffle once as strings (distinct + anti-join,
both hash-partitioned on the ref); fetched bytes cross exactly one
exchange — the content_key hash partition that collapses duplicate
content (inherent: the hash is only known after the download); the
store-side anti-join is key-only. Fetch is an Arrow-batched
``mapInPandas`` (one batch = many blobs; no per-row Python dispatch),
same transport-seam pattern as operators/fetch.py — the synthetic
transport derives bytes deterministically from the reference so the
engine is testable hermetically, and content collisions are real
(CONTENT_SPACE < #refs), so the dedup path is genuinely exercised.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

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

from ..catalog import Catalog
from ..schema import SPANS_DOC

MEDIA_REFS = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("content_key", LongType(), False),
        StructField("round", IntegerType(), False),
    ]
)

MEDIA_BLOBS = StructType(
    [
        StructField("content_key", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("blob", BinaryType(), False),
    ]
)

# content space deliberately smaller than the reference space so
# distinct refs share bytes and the content-addressed dedup is exercised
CONTENT_SPACE = 1 << 12


def synth_media_transport(refs: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for the asset download: bytes are a pure
    function of the reference's basename hash, so two refs whose hashes
    collide in CONTENT_SPACE carry byte-identical blobs (as reused
    thumbnails do on the real web). Returns (content_key, kind,
    n_bytes, blob) aligned with ``refs``."""
    import hashlib

    from ..operators.multimodal import synth_blob

    keys, kinds, sizes, blobs = [], [], [], []
    for ref in refs:
        base = ref.rsplit("/", 1)[-1]
        key = int(hashlib.md5(base.encode()).hexdigest()[:12], 16) % CONTENT_SPACE
        kind = "image" if ref.endswith((".jpg", ".png", ".gif")) else "binary"
        blob = synth_blob(key, kind)
        keys.append(key)
        kinds.append(kind)
        sizes.append(len(blob))
        blobs.append(blob)
    return pd.DataFrame(
        {"content_key": keys, "kind": kinds, "n_bytes": sizes, "blob": blobs}
    )


@dataclass
class MediaSweepResult:
    refs_seen: int       # distinct media refs in the scanned spans
    refs_new: int        # refs resolved (fetched) this sweep
    blobs_new: int       # distinct new contents stored
    blobs_bytes: int     # bytes written to the blob store


def _span_refs(spans: DataFrame) -> DataFrame:
    return (
        spans.select(F.explode("spans").alias("s"), "round")
        .filter(F.col("s.kind") == "media")
        .filter(F.col("s.media_ref") != "")
        .select(F.col("s.media_ref").alias("media_ref"), "round")
        .groupBy("media_ref")
        .agg(F.min("round").cast("int").alias("round"))
    )


def media_sweep(
    spark: SparkSession,
    cat: Catalog,
    since_snapshot: int | None = None,
    transport: Callable[[pd.Series], pd.DataFrame] = synth_media_transport,
    ref_partitions: int = 16,
) -> MediaSweepResult:
    """Resolve every not-yet-seen media reference in the spans table
    (or, with ``since_snapshot``, only in that snapshot's appended
    files) into the content-addressed store. Idempotent; commits blobs
    before refs (see module docstring)."""
    spans = (
        cat.read("spans", SPANS_DOC)
        if since_snapshot is None
        else cat.read_delta("spans", SPANS_DOC, since_snapshot)
    )
    refs = _span_refs(spans).repartition(ref_partitions, "media_ref")
    seen = cat.read("media_refs", MEDIA_REFS).select("media_ref")
    new_refs = refs.join(seen, "media_ref", "left_anti")

    out_schema = StructType(
        [StructField("media_ref", StringType(), False), StructField("round", IntegerType(), False)]
        + list(MEDIA_BLOBS.fields)
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            got = transport(b["media_ref"])
            got.insert(0, "round", b["round"].to_numpy())
            got.insert(0, "media_ref", b["media_ref"].to_numpy())
            yield got

    fetched = new_refs.mapInPandas(fetch, out_schema)
    fetched.persist()
    try:
        n_seen = refs.count()
        n_new = fetched.count()
        if n_new == 0:
            return MediaSweepResult(n_seen, 0, 0, 0)
        # one blob row per distinct NEW content key: smallest ref is the
        # representative (deterministic), standing store anti-joined out
        from pyspark.sql import Window

        w = Window.partitionBy("content_key").orderBy("media_ref")
        new_blobs = (
            fetched.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .join(
                cat.read("media_blobs", MEDIA_BLOBS).select("content_key"),
                "content_key",
                "left_anti",
            )
            .select("content_key", "kind", "n_bytes", "blob")
        )
        new_blobs.persist()
        n_blobs = new_blobs.count()
        total = (
            new_blobs.agg(F.sum("n_bytes")).collect()[0][0] or 0
            if n_blobs
            else 0
        )
        if n_blobs:
            cat.append(
                "media_blobs",
                new_blobs.repartition(ref_partitions, "content_key"),
                meta={"op": "media_blobs"},
                stat_cols=["content_key"],
                bloom_cols=["content_key"],
            )
        new_blobs.unpersist()
        cat.append(
            "media_refs",
            fetched.select("media_ref", "content_key", "round").repartition(
                ref_partitions, "media_ref"
            ),
            meta={"op": "media_refs"},
        )
        return MediaSweepResult(n_seen, n_new, n_blobs, int(total))
    finally:
        fetched.unpersist()


def media_lookup(cat: Catalog, refs: DataFrame) -> DataFrame:
    """(media_ref) -> (media_ref, content_key, kind, n_bytes, blob):
    serve asset bytes for a reference list through the mapping — the
    read path a training-data exporter uses."""
    m = cat.read("media_refs", MEDIA_REFS).select("media_ref", "content_key")
    b = cat.read("media_blobs", MEDIA_BLOBS)
    return refs.join(m, "media_ref").join(b, "content_key").select(
        "media_ref", "content_key", "kind", "n_bytes", "blob"
    )
