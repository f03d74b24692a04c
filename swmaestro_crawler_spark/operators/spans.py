"""Span extraction — pure Spark codegen, zero Python.

The fetch stage returns one flat ``payload`` string per page (segments
``kind\\x01text\\x01media_ref`` joined by ``\\x02`` — sources/synth_web.py;
a production HTML fetcher would emit the same shape from a vectorized
parser). Turning that into the interleaved span document
(``array<struct<kind,text,media_ref,offset>>``, BASELINE.json input_hint)
is ``split`` + ``transform`` + ``struct`` — whole-stage-codegen'd JVM
expressions, so the payload-defining operators (SURVEY.md §2.9 X1-X6)
never touch Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..sources.synth_web import FIELD, SPANSEP


def spans_of(payload: Column) -> Column:
    """payload string -> array<struct<kind,text,media_ref,offset>> with
    dense offsets = segment position (the reference's document order:
    stats first, then interleaved text/media, New_YouTube_Crawler_Comment.py:121,175)."""
    return F.transform(
        F.split(payload, SPANSEP),
        lambda s, i: F.struct(
            F.split_part(s, F.lit(FIELD), F.lit(1)).alias("kind"),
            F.split_part(s, F.lit(FIELD), F.lit(2)).alias("text"),
            F.split_part(s, F.lit(FIELD), F.lit(3)).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def outlinks_of(spans: Column) -> Column:
    """link-kind spans -> array<string> of targets, preserving span order
    (the discovery order that seeds next-round ``seq``)."""
    return F.transform(
        F.filter(spans, lambda s: s["kind"] == F.lit("link")),
        lambda s: s["media_ref"],
    )
