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
from .windows import SESSION_GAP_SEC as _SESSION_GAP_SEC

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


#: shared hot-window derivation CTE chain (ht → g → hot → runs → iv) —
#: ONE copy of the hot-hour rule for every oracle that joins against the
#: derived windows (point-in-interval join, session-overlap join)
_HOT_WINDOW_CTES = """
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
)"""

EVENTS_HOT_WINDOW_JOIN_SQL = _HOT_WINDOW_CTES + """
SELECT e.event_id, iv.window_start, iv.window_end
FROM events e JOIN iv
  ON e.ts >= iv.window_start AND e.ts < iv.window_end
"""

register("events_hot_window_join", events_hot_window_join, sql=EVENTS_HOT_WINDOW_JOIN_SQL)


#: band half-width for the temporal self-join, in microseconds (10 minutes)
BAND_DELTA_US = 600_000_000


def events_band_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Temporal band self-join: ordered pairs of same-type events at most
    ``BAND_DELTA_US`` apart, counted per event_type — the coordinated-burst
    / near-simultaneous-activity signal, the classic |a.ts − b.ts| ≤ Δ
    band join that equi-join engines can't express directly.

    Scale shape (bucket + ghost fan-out, never an all-pairs shuffle):
    rows bucket by ``floor(ts / Δ)``; a qualifying partner of row *a* in
    bucket k lives in bucket k or k+1 only (Δ = bucket width), so each row
    additionally ships ONE ghost copy keyed to the previous bucket and a
    single ``(event_type, bucket)`` hash exchange co-locates every pair at
    the earlier row's bucket. In-partition the count is O(n log n)
    searchsorted over the (ts, event_id) lex order — pair COUNTS are exact
    even when the pair set itself is quadratic, because no pair row is ever
    materialized. Ghosts never act as the earlier row, so nothing double
    counts; partials fold over the bounded type enum.

    Timestamped-event contract (mirrored in the SQL): rows missing ts or
    event_type are excluded on both sides. A hot (type, Δ-bucket) group is
    bounded by the type's event rate × Δ — the documented partitioning
    assumption; shrink Δ (or sub-salt the bucket and correct the boundary
    terms) if a single bucket outgrows a worker.
    """
    import pandas as pd

    from .exchange import enum_group_sum, hash_partitioned

    def fan_out(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch["ts"]), pc.is_valid(batch["event_type"]))
        )
        ts = (
            batch["ts"]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        bucket = ts // BAND_DELTA_US
        etype = batch["event_type"].combine_chunks()
        eid = batch["event_id"].combine_chunks()

        def keyed(bk: np.ndarray, ghost: bool) -> pa.Table:
            bkey = pc.binary_join_element_wise(
                etype.cast(pa.string()),
                pa.array(bk.astype("U"), type=pa.string()),
                "|",
            )
            return pa.table(
                {
                    "bkey": bkey,
                    "event_type": etype,
                    "bucket": pa.array(bk, type=pa.int64()),
                    "ts_us": pa.array(ts, type=pa.int64()),
                    "event_id": eid,
                    "ghost": pa.array(
                        np.full(len(bk), ghost, dtype=bool), type=pa.bool_()
                    ),
                }
            )

        return pa.concat_tables([keyed(bucket, False), keyed(bucket - 1, True)])

    def count_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "n_pairs": pd.Series([], dtype="int64"),
                }
            )
        out: dict[str, int] = {}
        for (et, _bk), g in df.groupby(["event_type", "bucket"], sort=False):
            ts = g["ts_us"].to_numpy()
            eid = g["event_id"].to_numpy()
            ghost = g["ghost"].to_numpy()
            order = np.lexsort((eid, ts))
            ts, ghost = ts[order], ghost[order]
            native_idx = np.flatnonzero(~ghost)
            if native_idx.size == 0:
                continue
            hi = np.searchsorted(ts, ts[native_idx] + BAND_DELTA_US, side="right")
            n = int(np.sum(hi - native_idx - 1))
            if n:
                out[et] = out.get(et, 0) + n
        return pd.DataFrame(
            {
                "event_type": pd.Series(list(out.keys()), dtype="object"),
                "n_pairs": pd.Series(list(out.values()), dtype="int64"),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "ts", "event_type"]
    ).map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
    partials = hash_partitioned(ds, "bkey", count_partition)
    return ray.data.from_pandas(
        enum_group_sum(partials, ["event_type"], ["n_pairs"])
    )


EVENTS_BAND_PAIRS_SQL = f"""
WITH e AS (
  SELECT event_id, event_type, ts FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT a.event_type, count(*) AS n_pairs
FROM e a JOIN e b ON a.event_type = b.event_type
 AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {BAND_DELTA_US}
GROUP BY 1
"""

register("events_band_pairs", events_band_pairs, sql=EVENTS_BAND_PAIRS_SQL)


def session_window_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Interval-OVERLAP join: per-user activity sessions (30-min gap rule,
    closed [first_ts, last_ts]) × derived hot windows (half-open
    [start, end)) → (window_start, n_sessions) distinct sessions touching
    each window. Complements ``events_hot_window_join``: that op places
    POINTS in intervals; this one joins two interval sets on overlap.

    Scale shape: the window side is small and broadcast (sorted disjoint
    bounds, same ceiling discipline); the session side derives in-partition
    after ONE user_id hash exchange — each session's overlapping windows
    are a contiguous [lo, hi) slice of the sorted window list found by two
    searchsorteds, accumulated with ``np.add.at`` into a bounded per-window
    count array. Partials fold over the bounded window enum; no session
    row ever leaves its partition.

    Timestamped contract (mirrored in SQL): sessions need ts AND user_id;
    rows missing either are excluded on both sides.
    """
    import pandas as pd

    from .exchange import hash_partitioned

    starts, ends = _hot_intervals(sf_dir)
    if len(starts) > MAX_BROADCAST_INTERVALS:
        raise ValueError(
            f"session_window_overlap: {len(starts):,} intervals exceeds the "
            f"broadcast ceiling ({MAX_BROADCAST_INTERVALS:,}) — co-partition "
            "sessions and windows on a time bucket (replicating windows "
            "into every bucket they overlap) instead of broadcasting"
        )
    empty = pd.DataFrame(
        {
            "window_start": pd.Series([], dtype="datetime64[us]"),
            "n_sessions": pd.Series([], dtype="int64"),
        }
    )
    if len(starts) == 0:
        return ray.data.from_pandas(empty)
    ref = ray.put((starts, ends))
    gap_us = _SESSION_GAP_SEC * 1_000_000  # THE session rule, shared with user_sessions

    def overlap_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        # a session's overlapping windows are the contiguous sorted slice
        # [lo, hi); a difference array + prefix sum turns each session into
        # two O(1) writes instead of an O(hi-lo) scatter
        s, e = ray.get(ref)
        df = df.dropna(subset=["ts", "user_id"])
        if len(df) == 0:
            return empty
        delta = np.zeros(len(s) + 1, dtype=np.int64)
        for _uid, g in df.groupby("user_id", sort=False):
            ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
            b = np.flatnonzero(np.diff(ts) > gap_us)
            s0 = ts[np.concatenate(([0], b + 1))]
            s1 = ts[np.concatenate((b, [len(ts) - 1]))]
            lo = np.searchsorted(e, s0, side="right")
            hi = np.searchsorted(s, s1, side="right")
            valid = hi > lo
            np.add.at(delta, lo[valid], 1)
            np.add.at(delta, hi[valid], -1)
        counts = np.cumsum(delta[:-1])
        nz = np.flatnonzero(counts)
        if nz.size == 0:
            return empty
        return pd.DataFrame(
            {
                "window_start": pd.Series(
                    s[nz].astype("datetime64[us]"), dtype="datetime64[us]"
                ),
                "n_sessions": pd.Series(counts[nz], dtype="int64"),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id", "ts"]
    )
    partials = hash_partitioned(ds, "user_id", overlap_partition)
    return ray.data.from_pandas(
        enum_group_sum(partials, ["window_start"], ["n_sessions"])
    )


SESSION_WINDOW_OVERLAP_SQL = _HOT_WINDOW_CTES + f""",
se AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {_SESSION_GAP_SEC} SECOND
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
tagged AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM se
),
sess AS (
  SELECT user_id, sid, min(ts) AS s0, max(ts) AS s1 FROM tagged GROUP BY 1, 2
)
SELECT iv.window_start, count(*) AS n_sessions
FROM iv JOIN sess ON sess.s0 < iv.window_end AND sess.s1 >= iv.window_start
GROUP BY 1
"""

register("session_window_overlap", session_window_overlap, sql=SESSION_WINDOW_OVERLAP_SQL)


# --- per-user interval-union coverage (X124) ---------------------------------

#: each event claims a fixed activity window [ts, ts + this) — the union of
#: those windows per user is the classic interval-coverage measure.
COVERAGE_WINDOW_SEC = 300


def user_interval_coverage(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, n_islands, covered_us, n_events): total UNION length of
    each user's event windows [ts, ts+300s) plus the merged-island count —
    the interval-union aggregate (ad attribution, uptime, billable-time
    shapes). ONE user-key exchange; inside a partition the island
    detection is fully vectorized (sort by ts, running max of window ends,
    a window is a new island iff its start exceeds every previous end —
    touching windows merge). All arithmetic is integer microseconds, so
    the SQL window twin is bit-equal. NULL user/ts rows are excluded
    (the SQL inner WHERE)."""
    from .exchange import hash_partitioned

    win_us = COVERAGE_WINDOW_SEC * 1_000_000

    def stub(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(batch["user_id"]), pc.is_valid(batch["ts"])
        )
        t = batch.filter(m)
        ts = pc.cast(t["ts"], pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": ts})

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id", "ts"]
    ).map_batches(stub, batch_format="pyarrow", zero_copy_batch=True)

    def coverage(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(["user_id", "ts_us"], kind="mergesort")
        users = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        te = ts + win_us
        # running max of interval ends WITHIN each user, shifted by one —
        # grouped cummax/shift are vectorized C paths, no per-user loop
        g = df.assign(te=te).groupby("user_id", sort=False)
        prev_end = g["te"].cummax().groupby(df["user_id"], sort=False).shift(1)
        new_island = prev_end.isna().to_numpy() | (
            ts > prev_end.fillna(np.iinfo(np.int64).min).to_numpy(dtype=np.int64)
        )
        island_id = np.cumsum(new_island) - 1
        out = pd.DataFrame(
            {"user_id": users, "island": island_id, "ts": ts, "te": te}
        )
        g = out.groupby(["user_id", "island"], sort=False).agg(
            start=("ts", "min"), end=("te", "max"), n_events=("ts", "size")
        )
        cov = (g["end"] - g["start"]).groupby(level=0).sum()
        isl = g.groupby(level=0).size()
        nev = g["n_events"].groupby(level=0).sum()
        return pd.DataFrame(
            {
                "user_id": cov.index,
                "n_islands": isl.to_numpy(dtype=np.int64),
                "covered_us": cov.to_numpy(dtype=np.int64),
                "n_events": nev.to_numpy(dtype=np.int64),
            }
        )

    return hash_partitioned(ds, "user_id", coverage)


USER_INTERVAL_COVERAGE_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) + {COVERAGE_WINDOW_SEC * 1_000_000} AS te_us
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
m AS (
  SELECT user_id, ts_us, te_us,
         max(te_us) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_end
  FROM e
),
g AS (
  SELECT user_id, ts_us, te_us,
         sum(CASE WHEN prev_end IS NULL OR ts_us > prev_end THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM m
),
s AS (
  SELECT user_id, island, max(te_us) - min(ts_us) AS cov_us,
         count(*) AS n_ev
  FROM g GROUP BY user_id, island
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(cov_us) AS BIGINT) AS covered_us,
       CAST(sum(n_ev) AS BIGINT) AS n_events
FROM s GROUP BY user_id
"""

register("user_interval_coverage", user_interval_coverage, sql=USER_INTERVAL_COVERAGE_SQL)
