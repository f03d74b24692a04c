"""Stateful sessionization: fold correctness (including state carried
across micro-batch chunks) and end-to-end streaming-vs-DuckDB equality
(covered again by the driver contract test)."""

from __future__ import annotations

import numpy as np

from swmaestro_crawler_spark.streaming.sessionize import (
    SESSION_GAP_US,
    fold_sessions,
)

G = SESSION_GAP_US


def reference_fold(ts, carried):
    """Obviously-correct per-event fold with the same contract."""
    closed, state = [], carried
    for t in ts:
        if state is None:
            state = (t, t, 1, 1)
        elif t - state[0] > G:
            closed.append((state[3], state[2], state[1], state[0]))
            state = (t, t, 1, state[3] + 1)
        else:
            state = (t, state[1], state[2] + 1, state[3])
    return closed, state


def test_fold_matches_reference_fold():
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(0, 40))
        gaps = rng.choice([1000, G // 2, G, G + 1, 3 * G], size=n)
        ts = np.cumsum(gaps).astype(np.int64)
        got = fold_sessions(ts, None)
        want = reference_fold(ts.tolist(), None)
        assert got == want


def test_fold_state_crosses_chunks():
    """Splitting one user's events into arbitrary chunks (micro-batches)
    must yield the same sessions as one pass — the GroupState contract."""
    rng = np.random.default_rng(11)
    for _ in range(100):
        n = int(rng.integers(1, 60))
        gaps = rng.choice([1000, G // 3, G + 1, 2 * G], size=n)
        ts = np.cumsum(gaps).astype(np.int64)
        one_pass = fold_sessions(ts, None)

        cuts = sorted(rng.choice(n, size=min(3, n), replace=False).tolist())
        chunks = np.split(ts, cuts)
        closed, state = [], None
        for c in chunks:
            got, state = fold_sessions(c, state)
            closed.extend(got)
        assert (closed, state) == one_pass


def test_fold_empty_and_single():
    assert fold_sessions(np.array([], dtype=np.int64), None) == ([], None)
    assert fold_sessions(np.array([5], dtype=np.int64), None) == ([], (5, 5, 1, 1))
    closed, st = fold_sessions(np.array([5, 5 + G + 1], dtype=np.int64), None)
    assert closed == [(1, 1, 5, 5)] and st == (5 + G + 1, 5 + G + 1, 1, 2)
