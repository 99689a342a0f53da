"""Point-in-interval (range) joins over the ``events`` stream table.

The reference batch loop has no temporal joins (its unit of work is one
file, SURVEY.md §2); at corpus scale the natural missing relational shape
is the NON-equi range join — "which events fall inside these windows" —
which Ray Data has no operator for. Expressed Ray-Data-first:

- the interval side is DERIVED and SMALL by construction here ("hot"
  activity windows: maximal runs of hours whose exact fixed-point value
  total exceeds the global hourly mean), so the join is a broadcast:
  sorted interval bounds ship once via ``ray.put`` and every batch probes
  them with one vectorized ``np.searchsorted`` — no shuffle of the fact
  table at all. Intervals here are DISJOINT (merged runs), so each event
  matches at most one window and a single searchsorted resolves the join.
- past the broadcast ceiling (an interval side too big for worker heaps)
  the documented reroute is a time-bucket co-partition: assign both sides
  ``floor(ts / bucket)`` keys, replicate intervals into every bucket they
  overlap, and run the same searchsorted per partition — same kernel, one
  exchange, no driver state.

The hot-hour threshold compares exact integers (per-row half-away e6
quantization of ``value``, int64 sums, cross-multiplied totals) so the
engine and the DuckDB oracle pick bit-identical window sets — no float
sum ordering can flip a boundary hour.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .exchange import enum_group_sum
from .queryset import register, table_path

#: broadcast ceiling for the interval side — far above any real derived
#: window set (hot hours are time-range-bounded), mirroring the
#: MAX_BROADCAST_KEYS discipline: a caller with an unbounded interval side
#: fails loud with the time-bucket co-partition reroute named.
MAX_BROADCAST_INTERVALS = 5_000_000


def _value_e6(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Per-row half-away-from-zero e6 fixed-point of a float column —
    matches DuckDB ``floor(value*1e6 + 0.5)`` with the sign split."""
    v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False).astype(np.float64)
    return (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)


def _hot_intervals(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(starts_us, ends_us) of maximal runs of above-mean hours, sorted.

    One streaming pass emits ≤ #hours partial rows per block (hour key is
    time-range-bounded → driver enum fold is scale-safe); the run merge is
    pure driver arithmetic on that bounded frame.
    """

    def partial(batch: pa.Table) -> pa.Table:
        # Timestamped-event contract (mirrored in the SQL WHERE): an hour
        # bucket needs a ts — otherwise the NaT hour becomes an int64-min
        # keyed "hot hour" here while SQL keeps a NULL-h group that can
        # never join, and both sides' n_hours/grand-total drift apart.
        batch = batch.filter(pc.is_valid(batch["ts"]))
        hours = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {"h": hours, "tot": pa.array(_value_e6(batch["value"]), type=pa.int64())}
        )
        g = t.group_by(["h"]).aggregate([("tot", "sum")])
        return g.rename_columns(["h", "tot"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["ts", "value"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    frame = enum_group_sum(ds, ["h"], ["tot"]).sort_values("h").reset_index(drop=True)
    if len(frame) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # exact integer threshold: hour is hot iff tot * n_hours > grand_total
    # (Python ints — no division, no float, no overflow)
    tots = [int(x) for x in frame["tot"]]
    grand, n_hours = sum(tots), len(tots)
    hours_us = frame["h"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hot = hours_us[[i for i, t in enumerate(tots) if t * n_hours > grand]]
    if len(hot) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    hour_us = 3_600_000_000
    # merge consecutive hot hours into maximal [start, end) runs
    breaks = np.flatnonzero(np.diff(hot) != hour_us)
    starts = hot[np.concatenate(([0], breaks + 1))]
    ends = hot[np.concatenate((breaks, [len(hot) - 1]))] + hour_us
    return starts, ends


def events_hot_window_join(sf_dir: str) -> "ray.data.Dataset":
    """Range join: every event inside a hot activity window →
    (event_id, window_start, window_end).

    Two streaming passes over ``(ts, value)`` / ``(event_id, ts)`` — the
    interval side derives from pass 1's bounded hour fold, broadcasts once,
    and pass 2 probes it per batch with one searchsorted. The fact table is
    never shuffled.
    """
    starts, ends = _hot_intervals(sf_dir)
    if len(starts) > MAX_BROADCAST_INTERVALS:
        raise ValueError(
            f"events_hot_window_join: {len(starts):,} intervals exceeds the "
            f"broadcast ceiling ({MAX_BROADCAST_INTERVALS:,}) — co-partition "
            "both sides on a time bucket and searchsorted per partition "
            "instead of broadcasting"
        )
    ref = ray.put((starts, ends))

    def probe(batch: pa.Table) -> pa.Table:
        s, e = ray.get(ref)
        ts = (
            batch["ts"]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        if len(s) == 0:
            idx = np.empty(0, dtype=np.int64)
            keep = np.zeros(len(ts), dtype=bool)
        else:
            idx = np.searchsorted(s, ts, side="right") - 1
            keep = (idx >= 0) & (ts < e[np.maximum(idx, 0)])
            idx = idx[keep]
        return pa.table(
            {
                "event_id": batch["event_id"].filter(pa.array(keep)),
                "window_start": pa.array(
                    s[idx].astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "window_end": pa.array(
                    e[idx].astype("datetime64[us]"), type=pa.timestamp("us")
                ),
            }
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "ts"]
    ).map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


EVENTS_HOT_WINDOW_JOIN_SQL = """
WITH ht AS (
  SELECT date_trunc('hour', ts) AS h,
         SUM(CAST(CASE WHEN value IS NULL THEN 0
                       WHEN value >= 0 THEN floor(value*1e6 + 0.5)
                       ELSE -floor(-value*1e6 + 0.5) END AS BIGINT)) AS tot
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
g AS (SELECT SUM(CAST(tot AS HUGEINT)) AS gt, count(*) AS nh FROM ht),
hot AS (SELECT h FROM ht, g WHERE CAST(tot AS HUGEINT) * nh > gt),
runs AS (
  SELECT h,
         h - to_hours(CAST(row_number() OVER (ORDER BY h) AS BIGINT)) AS grp
  FROM hot
),
iv AS (
  SELECT min(h) AS window_start, max(h) + INTERVAL 1 HOUR AS window_end
  FROM runs GROUP BY grp
)
SELECT e.event_id, iv.window_start, iv.window_end
FROM events e JOIN iv
  ON e.ts >= iv.window_start AND e.ts < iv.window_end
"""

register("events_hot_window_join", events_hot_window_join, sql=EVENTS_HOT_WINDOW_JOIN_SQL)
