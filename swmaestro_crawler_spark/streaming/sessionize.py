"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The reference keeps crawl-session state implicitly in each worker process
(one requests.Session + in-memory cursors per consumer,
New_YouTube_Crawler_Comment.py:32-33, 275-313). The engine's streaming
face generalizes that to an explicit, fault-tolerant per-key state
machine: events stream in, per-user state carries the open session
(start, last-seen, count, ordinal) across micro-batches, and a session is
EMITTED when a gap > SESSION_GAP_US closes it — so the user's final,
still-open session is never emitted, which is exactly the batch-SQL
definition the DuckDB oracle checks (all sessions but each user's last).

The fold itself is vectorized (numpy gap/boundary segmentation — no
per-event Python); state crosses micro-batch boundaries through the
GroupState object, proven directly by the two-chunk test in
tests/test_sessionize.py.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream_metrics import EVENTS_SCHEMA, drain_confs

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min

SESSION_SCHEMA = (
    "user_id long, session_idx int, n_events long, start_us long, end_us long"
)
STATE_SCHEMA = "last_us long, start_us long, n_events long, ord int"


def fold_sessions(
    ts_us: np.ndarray, carried: tuple | None
) -> tuple[list[tuple], tuple | None]:
    """Fold sorted event times (one user) into sessions.

    carried = (last_us, start_us, n_events, ord) of the open session, or
    None. Returns (closed sessions as (ord, n, start_us, end_us), new
    carried). Segment boundaries come from ONE vectorized diff; the loop
    below iterates SESSIONS (a handful per user), not events.

    In-order contract: a batch's timestamps must be >= the carried
    session's last_us (true for the availableNow single-source reads used
    here; a production multi-source stream needs a watermark upstream).
    Late events BEFORE the carried session would otherwise silently merge
    — guarded below by folding them into the open session with min/max
    rather than assuming sorted arrival."""
    if len(ts_us) == 0:
        return [], carried
    if carried is not None and int(ts_us[0]) < carried[1]:
        # out-of-order batch reaching before the open session's START:
        # fold conservatively (extend start back) instead of corrupting
        # the segmentation; end_us can never move backwards.
        carried = (carried[0], int(ts_us[0]), carried[2], carried[3])
    closed: list[tuple] = []
    brk = np.diff(ts_us) > SESSION_GAP_US
    bounds = np.concatenate([[0], np.flatnonzero(brk) + 1, [len(ts_us)]])
    cur = carried
    for a, b in zip(bounds[:-1], bounds[1:]):
        if cur is not None and int(ts_us[a]) - cur[0] <= SESSION_GAP_US:
            # max(): an out-of-order batch must never move end_us backwards
            cur = (max(int(ts_us[b - 1]), cur[0]), cur[1], cur[2] + int(b - a), cur[3])
        else:
            if cur is not None:
                closed.append((cur[3], cur[2], cur[1], cur[0]))
            cur = (
                int(ts_us[b - 1]),
                int(ts_us[a]),
                int(b - a),
                (cur[3] + 1) if cur is not None else 1,
            )
    return closed, cur


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events stream -> closed sessions per user (exactly the batch
    definition: every session except each user's last)."""
    stage = tempfile.mkdtemp(prefix="sess_src_")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(stage, "events.parquet"),
    )
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)

    def update(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        carried = tuple(state.get) if state.exists else None
        ts = np.sort(
            np.concatenate(
                [p["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") for p in pdfs]
            )
        ) // 1000
        closed, new_state = fold_sessions(ts, carried)
        state.update(new_state)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.int64(user_id),
                    "session_idx": np.array([c[0] for c in closed], dtype=np.int32),
                    "n_events": np.array([c[1] for c in closed], dtype=np.int64),
                    "start_us": np.array([c[2] for c in closed], dtype=np.int64),
                    "end_us": np.array([c[3] for c in closed], dtype=np.int64),
                }
            )

    sessions = src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    # NoTimeout state machine: the trailing no-data batch would invoke
    # nothing, so the drain confs (small state-partition count, no empty
    # final batch) change no output row — see stream_metrics.drain_confs
    with drain_confs(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="sess_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


SQL_SESSIONIZE = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events),
g AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
s AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
agg AS (
  SELECT user_id, CAST(sid AS INT) AS session_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         min(t) AS start_us, max(t) AS end_us
  FROM s GROUP BY 1, 2)
SELECT user_id, session_idx, n_events, start_us, end_us FROM agg
WHERE session_idx < (SELECT max(a2.session_idx) FROM agg a2
                     WHERE a2.user_id = agg.user_id)
"""

QUERIES = {
    "streaming_sessionize_stateful": (
        lambda spark, sf_dir: sessionize_stream(spark, sf_dir),
        SQL_SESSIONIZE,
    ),
}
