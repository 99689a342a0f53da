"""As-of join over the ``events`` stream: latest prior event of another type.

Ray Data has no as-of join primitive; the composition here is the standard
one (task-prompt pattern (a)): hash-partition by the equality key
(``user_id``) so each user's history is co-located, sort within the
partition by ``(ts, event_id)``, and take the running last-seen left-side
row via a vectorized forward-fill — no per-row Python in the inner loop,
no global sort, and the exchange moves only the four needed columns.

Semantics: for every ``click`` event, the most recent ``view`` event by the
same user with ``view.ts <= click.ts`` (self excluded by row position, ties
broken by ``event_id`` — identical to the SQL window frame
``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``). Clicks with no prior
view are dropped (inner as-of). ``gap_us`` is the exact microsecond delta,
kept integral so both engines stringify identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .exchange import hash_partitioned
from .queryset import register, table_path

LEFT_TYPE = "view"  # the "quote" side
RIGHT_TYPE = "click"  # the "trade" side


def _asof_partition(df: pd.DataFrame) -> pd.DataFrame:
    out_event, out_prior, out_gap = [], [], []
    for _, g in df.groupby("user_id", sort=True):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        is_left = (g["event_type"] == LEFT_TYPE).to_numpy()
        left_ids = np.where(is_left, g["event_id"].to_numpy(), -1)
        left_ts = np.where(is_left, ts_us, -1)
        # running last-seen left row, excluding the current row (shift by 1)
        prior_id = pd.Series(np.where(left_ids >= 0, left_ids, np.nan)).shift(1).ffill()
        prior_ts = pd.Series(np.where(left_ts >= 0, left_ts, np.nan)).shift(1).ffill()
        is_right = (g["event_type"] == RIGHT_TYPE).to_numpy()
        take = is_right & prior_id.notna().to_numpy()
        out_event.extend(g.loc[take, "event_id"].tolist())
        out_prior.extend(prior_id[take].astype(np.int64).tolist())
        out_gap.extend((ts_us[take] - prior_ts[take].astype(np.int64)).tolist())
    return pd.DataFrame(
        {
            "event_id": pd.Series(out_event, dtype="int64"),
            "prior_view_id": pd.Series(out_prior, dtype="int64"),
            "gap_us": pd.Series(out_gap, dtype="int64"),
        }
    )


def events_asof_view_before_click(sf_dir: str) -> "ray.data.Dataset":
    """(event_id, prior_view_id, gap_us) for every click with a prior view."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return hash_partitioned(ds, "user_id", _asof_partition)


EVENTS_ASOF_SQL = f"""
WITH ordered AS (
  SELECT event_id, event_type, ts,
         last_value(CASE WHEN event_type = '{LEFT_TYPE}' THEN event_id END IGNORE NULLS)
           OVER w AS prior_view_id,
         last_value(CASE WHEN event_type = '{LEFT_TYPE}' THEN ts END IGNORE NULLS)
           OVER w AS prior_view_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, prior_view_id,
       epoch_us(ts) - epoch_us(prior_view_ts) AS gap_us
FROM ordered
WHERE event_type = '{RIGHT_TYPE}' AND prior_view_id IS NOT NULL
"""


register("events_asof_view_click", events_asof_view_before_click, sql=EVENTS_ASOF_SQL)
