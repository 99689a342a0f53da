"""Ordered-sequence operators: per-key successor pairs over a total order.

The reference processes files independently and has no notion of ordered
streams (SURVEY.md §2); these are the sequence-model shapes a behavioral /
training-data pipeline needs. Both reuse the engine's one ordered-window
idiom (windows.py): hash-partition on the key so each key's full history
is co-located, sort INSIDE the partition (never a global sort), take
vectorized successors, and emit bounded count partials — the exchange
carries only the key + order + value columns, and the driver folds an
enum-bounded frame.

- ``user_event_transitions``: first-order Markov edges (prev_type →
  next_type) over each user's (ts, event_id)-ordered event stream. The
  fold frame is ≤ #types² rows.
- ``order_gap_histogram``: distribution of consecutive-order gaps per
  customer, bucketed to weeks. The fold frame is ≤ #distinct-gap-weeks
  rows (time-range-bounded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .exchange import enum_group_sum, hash_partitioned
from .queryset import register, table_path


def _transition_partition(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return pd.DataFrame(
            {
                "prev_type": pd.Series([], dtype="object"),
                "next_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            }
        )
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    nxt = df["event_type"].shift(-1)
    same_user = df["user_id"].shift(-1) == df["user_id"]
    pairs = pd.DataFrame(
        {"prev_type": df["event_type"], "next_type": nxt}
    )[same_user.to_numpy(dtype=bool)]
    out = pairs.groupby(["prev_type", "next_type"], sort=False).size().rename("n")
    out = out.reset_index()
    out["n"] = out["n"].astype("int64")
    return out


def user_event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """(prev_type, next_type, n): first-order event-type transition counts
    over each user's time-ordered stream (ties broken by event_id — the
    same total order every ordered-window operator here uses)."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    partials = hash_partitioned(ds, "user_id", _transition_partition)
    return ray.data.from_pandas(
        enum_group_sum(partials, ["prev_type", "next_type"], ["n"])
    )


USER_EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type AS prev_type, next_type, count(*) AS n
FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
"""

register("user_event_transitions", user_event_transitions, sql=USER_EVENT_TRANSITIONS_SQL)


def _gap_partition(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return pd.DataFrame(
            {
                "gap_weeks": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
    df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
    same = (df["o_custkey"].shift(-1) == df["o_custkey"]).to_numpy(dtype=bool)
    dates = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    gaps_days = (np.roll(dates, -1) - dates)[same]
    weeks = gaps_days // 7  # gaps are >= 0 within the sorted key: floor == trunc
    out = pd.DataFrame({"gap_weeks": weeks}).groupby("gap_weeks", sort=False)
    out = out.size().rename("n").reset_index()
    out["n"] = out["n"].astype("int64")
    out["gap_weeks"] = out["gap_weeks"].astype("int64")
    return out


def order_gap_histogram(sf_dir: str) -> "ray.data.Dataset":
    """(gap_weeks, n): histogram of gaps between a customer's consecutive
    orders, bucketed to whole weeks."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    partials = hash_partitioned(ds, "o_custkey", _gap_partition)
    return ray.data.from_pandas(enum_group_sum(partials, ["gap_weeks"], ["n"]))


ORDER_GAP_HISTOGRAM_SQL = """
WITH s AS (
  SELECT date_diff('day', o_orderdate,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey)) AS gap
  FROM orders
)
SELECT CAST(gap // 7 AS BIGINT) AS gap_weeks, count(*) AS n
FROM s WHERE gap IS NOT NULL GROUP BY 1
"""

register("order_gap_histogram", order_gap_histogram, sql=ORDER_GAP_HISTOGRAM_SQL)
