"""F2/F1 sanitize kernel goldens: NUL strip + quote doubling must match
the reference's pre_process_comment / pre_process_sql semantics
(New_YouTube_Crawler_Comment.py:350-355)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from swmaestro_crawler_spark.functions.text import sanitize_text


def reference_pre_process(text: str) -> str:
    temp = bytearray(text.encode("UTF-8"))
    temp = temp.replace(b"\x00", b"")  # (the reference drops the return
    # value — a real bug; the INTENT, used by pre_process_sql and the
    # DB write path, is strip-then-escape, which the kernel implements)
    text = temp.decode("utf-8", "ignore")
    return re.sub("'", "''", text)


def test_sanitize_matches_reference_intent(spark):
    cases = [
        "plain text",
        "it's got 'quotes'",
        "nul\x00embedded",
        "\x00leading and trailing\x00",
        "both'\x00kinds'",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r.v for r in df.select(sanitize_text(F.col("t")).alias("v")).collect()]
    assert got == [reference_pre_process(c) for c in cases]


def test_sanitize_sql_twin_agrees(spark):
    import duckdb

    from swmaestro_crawler_spark.functions.text import SQL_SANITIZE_TEXT

    cases = ["it's", "a\x00b", "''", "x"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r.v for r in df.select(sanitize_text(F.col("t")).alias("v")).collect()]
    con = duckdb.connect()
    want = [
        con.execute("SELECT " + SQL_SANITIZE_TEXT.format(c="?"), [c]).fetchone()[0]
        for c in cases
    ]
    assert got == want
