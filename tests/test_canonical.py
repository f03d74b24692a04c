from __future__ import annotations

import pandas as pd

from swmaestro_crawler_spark.functions.canonical import canonicalize_one, canonicalize_series


def test_canonicalize_cases():
    cases = {
        "HTTP://Host.Example.com:80/A/b/#frag": "http://host.example.com/A/b",
        "https://h.example.com:443/": "https://h.example.com/",
        "http://h.example.com": "http://h.example.com/",
        "  http://h.example.com/x/ ": "http://h.example.com/x",
        "h.example.com/x?q=1#f": "http://h.example.com/x?q=1",
        "http://h.example.com/x?q=1": "http://h.example.com/x?q=1",
        "http://h.example.com:8080/x": "http://h.example.com:8080/x",
    }
    got = canonicalize_series(pd.Series(list(cases)))
    for raw, want in cases.items():
        assert canonicalize_one(raw) == want, raw
    assert list(got) == list(cases.values())


def test_canonicalize_udf_matches_kernel(spark):
    from pyspark.sql import functions as F

    from swmaestro_crawler_spark.functions.canonical import with_canonical

    raw = ["HTTP://A.example.com/X/", "http://b.example.com:80/y#z"]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    rows = with_canonical(df).orderBy("url").collect()
    from swmaestro_crawler_spark.functions.hashing import murmur3_32_str, xxhash64_str

    for r in rows:
        assert r.url_hash == xxhash64_str(r.url)
        assert r.fingerprint == murmur3_32_str(r.url)
        assert r.host == r.url.split("://")[1].split("/")[0]
