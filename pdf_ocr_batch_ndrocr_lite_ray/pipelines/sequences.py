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
    # typed-event contract (both sides): NULL event_type rows are excluded
    # BEFORE pairing — pandas groupby would otherwise silently drop
    # NaN-keyed rows the SQL oracle keeps
    df = df.dropna(subset=["event_type"])
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    nxt = df["event_type"].shift(-1)
    a, b = df["user_id"], df["user_id"].shift(-1)
    # NULL users form ONE window partition in SQL; NaN != NaN would drop
    # their transitions, so compare null-aware
    same_user = (a == b) | (a.isna() & b.isna())
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
  FROM events WHERE event_type IS NOT NULL
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


def user_conversion_lag(sf_dir: str) -> "ray.data.Dataset":
    """(lag_hours, n_users): first-view → first-purchase latency histogram
    over users whose first purchase is at-or-after their first view.

    Scale shape: per-block (user, kind, min_ts) partials shrink the
    exchange to ≤ 2 rows per user per block; one user_id hash exchange
    completes the per-user minima; the elapsed-hour bucket (floor of the
    microsecond delta — non-negative by the filter, so floor == trunc ==
    DuckDB ``//``) folds into a time-range-bounded frame.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .exchange import enum_group_sum

    def min_partial(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"], value_set=pa.array(["view", "purchase"]))
        t = batch.filter(mask)
        g = pa.table(
            {"user_id": t["user_id"], "kind": t["event_type"], "ts": t["ts"]}
        ).group_by(["user_id", "kind"]).aggregate([("ts", "min")])
        return g.rename_columns(["user_id", "kind", "min_ts"])

    def lag_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "lag_hours": pd.Series([], dtype="int64"),
                    "n_users": pd.Series([], dtype="int64"),
                }
            )
        # dropna=False: SQL GROUP BY keeps NULL user_id as one group
        g = (
            df.groupby(["user_id", "kind"], sort=False, dropna=False)["min_ts"]
            .min()
            .unstack()
        )
        if "view" not in g.columns or "purchase" not in g.columns:
            return pd.DataFrame(
                {
                    "lag_hours": pd.Series([], dtype="int64"),
                    "n_users": pd.Series([], dtype="int64"),
                }
            )
        both = g.dropna(subset=["view", "purchase"])
        v = both["view"].to_numpy().astype("datetime64[us]").astype(np.int64)
        p = both["purchase"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lag = (p - v)[p >= v] // 3_600_000_000
        out = (
            pd.DataFrame({"lag_hours": lag})
            .groupby("lag_hours", sort=False)
            .size()
            .rename("n_users")
            .reset_index()
        )
        out["lag_hours"] = out["lag_hours"].astype("int64")
        out["n_users"] = out["n_users"].astype("int64")
        return out

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id", "event_type", "ts"]
    ).map_batches(min_partial, batch_format="pyarrow", zero_copy_batch=True)
    partials = hash_partitioned(ds, "user_id", lag_partition)
    return ray.data.from_pandas(enum_group_sum(partials, ["lag_hours"], ["n_users"]))


USER_CONVERSION_LAG_SQL = """
WITH m AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS v,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
  FROM events GROUP BY 1
)
SELECT CAST((epoch_us(p) - epoch_us(v)) // 3600000000 AS BIGINT) AS lag_hours,
       count(*) AS n_users
FROM m WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
GROUP BY 1
"""

register("user_conversion_lag", user_conversion_lag, sql=USER_CONVERSION_LAG_SQL)


def user_event_trigrams(sf_dir: str) -> "ray.data.Dataset":
    """(t1, t2, t3, n): length-3 event-type sequence counts over each
    user's time-ordered stream — the sequence-mining extension of the
    first-order transitions (same partition-sort idiom, #types³ fold)."""
    from .exchange import enum_group_sum

    def tri_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "t1": pd.Series([], dtype="object"),
                    "t2": pd.Series([], dtype="object"),
                    "t3": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        df = df.dropna(subset=["event_type"])  # typed-event contract
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"]
        u1, u2 = u.shift(-1), u.shift(-2)
        same = ((u == u1) | (u.isna() & u1.isna())) & (
            (u == u2) | (u.isna() & u2.isna())
        )
        tri = pd.DataFrame(
            {
                "t1": df["event_type"],
                "t2": df["event_type"].shift(-1),
                "t3": df["event_type"].shift(-2),
            }
        )[same.to_numpy(dtype=bool)]
        out = tri.groupby(["t1", "t2", "t3"], sort=False).size().rename("n")
        out = out.reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    partials = hash_partitioned(ds, "user_id", tri_partition)
    return ray.data.from_pandas(enum_group_sum(partials, ["t1", "t2", "t3"], ["n"]))


USER_EVENT_TRIGRAMS_SQL = """
WITH s AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events WHERE event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, count(*) AS n
FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3
"""

register("user_event_trigrams", user_event_trigrams, sql=USER_EVENT_TRIGRAMS_SQL)
