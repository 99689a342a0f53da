"""Windowed / sessionized aggregates over the ``events`` stream table.

The reference is a finite batch with no windowing (SURVEY.md §2.9); these
are the streaming-shaped operators a transcript/event pipeline needs,
expressed Ray-Data-first:

- **tumbling window**: the window key is a pure row function (truncate the
  timestamp), so windowing is just partial aggregation on a derived key —
  no ordering assumption, no watermark needed for a complete batch.
- **sessionization**: the classic "order within key, split on gaps" —
  per-user event streams are hash-partitioned (only (user_id, ts) columns
  move), each partition sorts its own users' events in-process, and gap >
  ``SESSION_GAP_SEC`` starts a new session. At 10^12 events the shape is
  identical; a user's history must just fit one partition's memory (salt
  by time range if a single user exceeds it).

Both have exact DuckDB oracles (date_trunc / lag-sum windows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from .dedup import _hash_partitioned, _rename
from .queryset import register, table_path

SESSION_GAP_SEC = 1800  # 30-minute inactivity ends a session


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window: (window_start, event_type, n_events).

    Window assignment happens inside ``map_batches`` (vectorized timestamp
    truncate) and the per-block partial counts make the exchange carry
    #windows × #types rows per block.
    """

    def partial(batch: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {
                "window_start": hours,
                "event_type": batch["event_type"],
                "event_id": batch["event_id"],
            }
        )
        g = t.group_by(["window_start", "event_type"]).aggregate([("event_id", "count")])
        return g.rename_columns(["window_start", "event_type", "n_events"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "ts", "event_type"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby(["window_start", "event_type"]).aggregate(Sum("n_events"))
    scol = [c for c in out.schema().names if c.startswith("sum(")][0]
    return _rename(out, {scol: "n_events"})


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(event_id) AS n_events
FROM events GROUP BY 1, 2
"""


def _sessionize_partition(df: pd.DataFrame) -> pd.DataFrame:
    out_user, out_sessions, out_events, out_longest = [], [], [], []
    for user_id, g in df.groupby("user_id", sort=True):
        ts = np.sort(g["ts"].values.astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts) > SESSION_GAP_SEC * 1_000_000
        n_sessions = 1 + int(gaps.sum())
        # longest session by event count
        boundaries = np.flatnonzero(gaps)
        sizes = np.diff(np.concatenate([[0], boundaries + 1, [len(ts)]]))
        out_user.append(int(user_id))
        out_sessions.append(n_sessions)
        out_events.append(len(ts))
        out_longest.append(int(sizes.max()))
    return pd.DataFrame(
        {
            "user_id": pd.Series(out_user, dtype="int64"),
            "n_sessions": pd.Series(out_sessions, dtype="int64"),
            "n_events": pd.Series(out_events, dtype="int64"),
            "longest_session_events": pd.Series(out_longest, dtype="int64"),
        }
    )


def user_sessions(sf_dir: str) -> "ray.data.Dataset":
    """Per-user sessionization: (user_id, n_sessions, n_events,
    longest_session_events) with a 30-min gap rule."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id", "ts"]
    )
    return _hash_partitioned(ds, "user_id", _sessionize_partition)


USER_SESSIONS_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_SEC} SECOND
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
tagged AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n FROM tagged GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS longest_session_events
FROM per_session GROUP BY user_id
"""


SLIDE_LEN_SEC = 3600  # sliding window length
SLIDE_STEP_SEC = 900  # slide step → each event lands in LEN/STEP windows


def events_sliding(sf_dir: str) -> "ray.data.Dataset":
    """Sliding 1h/15min window counts: (window_start, event_type, n_events).

    An event at epoch ``e`` belongs to the ``LEN/STEP`` windows starting at
    ``floor(e/STEP)*STEP - j*STEP`` — assignment is a vectorized shift per
    replica ``j`` inside ``map_batches`` (the standard streaming window
    replication), and per-block partial counts keep the exchange at
    #windows × #types rows per block, never #events × replicas.
    ``window_start`` is emitted as epoch SECONDS (int64) on both engines —
    integer-exact, no timezone semantics to match.
    """
    n_rep = SLIDE_LEN_SEC // SLIDE_STEP_SEC

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())  # timestamp[us] → microseconds
        base = pc.multiply(
            pc.divide(us, SLIDE_STEP_SEC * 1_000_000), SLIDE_STEP_SEC
        )
        reps = []
        for j in range(n_rep):
            reps.append(
                pa.table(
                    {
                        "window_start": pc.subtract(base, j * SLIDE_STEP_SEC),
                        "event_type": batch["event_type"],
                    }
                )
            )
        t = pa.concat_tables(reps)
        g = t.group_by(["window_start", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["window_start", "event_type", "n_events"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["ts", "event_type"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby(["window_start", "event_type"]).aggregate(Sum("n_events"))
    scol = [c for c in out.schema().names if c.startswith("sum(")][0]
    return _rename(out, {scol: "n_events"})


EVENTS_SLIDING_SQL = f"""
SELECT (epoch_us(ts) // {SLIDE_STEP_SEC * 1_000_000}) * {SLIDE_STEP_SEC}
         - {SLIDE_STEP_SEC} * CAST(j AS BIGINT) AS window_start,
       event_type, count(*) AS n_events
FROM events, LATERAL UNNEST(generate_series(0, {SLIDE_LEN_SEC // SLIDE_STEP_SEC - 1})) u(j)
GROUP BY 1, 2
"""


register("events_hourly", events_hourly, sql=EVENTS_HOURLY_SQL)
register("events_sliding", events_sliding, sql=EVENTS_SLIDING_SQL)
register("user_sessions", user_sessions, sql=USER_SESSIONS_SQL)
