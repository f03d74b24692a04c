"""Property-based canonicalization tests (hypothesis): idempotence,
scheme/host normalization invariants, and scalar/vector agreement —
canonical URLs are the dedup identity, so any instability here corrupts
the URL-seen set."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from swmaestro_crawler_spark.functions.canonical import (
    canonicalize_one,
    canonicalize_series,
)

host_st = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True)
path_st = st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,4}", fullmatch=True)
query_st = st.one_of(st.just(""), st.from_regex(r"\?[A-Za-z0-9=&]{0,12}", fullmatch=True))
frag_st = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9]{0,8}", fullmatch=True))
scheme_st = st.sampled_from(["http", "HTTP", "https", "Https", ""])
port_st = st.sampled_from(["", ":80", ":443", ":8080"])


@st.composite
def urls(draw):
    scheme = draw(scheme_st)
    prefix = f"{scheme}://" if scheme else ""
    return (
        prefix + draw(host_st) + draw(port_st) + draw(path_st) + draw(query_st) + draw(frag_st)
    )


@given(urls())
@settings(max_examples=300, deadline=None)
def test_idempotent(u):
    c = canonicalize_one(u)
    assert canonicalize_one(c) == c


@given(urls())
@settings(max_examples=300, deadline=None)
def test_invariants(u):
    c = canonicalize_one(u)
    scheme, rest = c.split("://", 1)
    assert scheme in ("http", "https")
    host = rest.split("/", 1)[0]
    assert host == host.lower()
    assert not (scheme == "http" and host.endswith(":80"))
    assert not (scheme == "https" and host.endswith(":443"))
    assert "#" not in c
    assert "/" in rest  # path always present


@given(st.lists(urls(), min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_vector_matches_scalar(us):
    vec = list(canonicalize_series(pd.Series(us, dtype=object)))
    assert vec == [canonicalize_one(u) for u in us]
