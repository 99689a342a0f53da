"""Session-final diagnostics family: change-point localization, data
skew audits, and concentration statistics over the standard tables.

Every operator here follows the repo's exactness discipline: integer
(or fixed-point-integer) folds end-to-end, with at most ONE shared
IEEE double divide/sqrt chain before an e6/e9 floor — so the DuckDB
oracle reproduces each output bit-for-bit. Scale shapes are stated per
operator; the common pattern is a bounded enum fold (type × day,
count-of-counts, digit buckets) after an in-block Arrow partial, with
``hash_partitioned`` reserved for genuinely unbounded keys.

No reference analog (the reference extracts text; it audits nothing) —
these are §2.11 extension operators in the X134+ data-forensics line.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import enum_group_sum
from .queryset import register, table_path

DAY_US = 86_400_000_000


def _empty(cols: dict[str, str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def _events_daily_counts(sf_dir: str) -> pd.DataFrame:
    """Bounded (t, day, n) fold of per-type daily event counts — the
    shared front end of the daily-series diagnostics (same shape as the
    ACF/cross-correlation fold: types × corpus day span, zero shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["ts"]), pc.is_valid(batch["event_type"]))
        t = batch.filter(keep)
        days = pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US)
        g = (
            pa.table({"t": t["event_type"], "day": days})
            .group_by(["t", "day"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["t", "day", "n"])

    return enum_group_sum(
        ray.data.read_parquet(
            table_path(sf_dir, "events"), columns=["ts", "event_type"]
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["t", "day"],
        ["n"],
    )


def events_changepoint_cusum(sf_dir: str) -> pd.DataFrame:
    """(event_type, cp_day, n_days, cusum_abs, mean_before_e6,
    mean_after_e6): the CUSUM change-point of every event type's DAILY
    count series on the shared zero-filled day grid — "which day did
    this type's volume level shift, and from what mean to what mean?"
    — the launch/regression localizer complementing the max-excess
    window (X146) and the MAD outlier flags.

    Exactness contract: with N grid days, total S and prefix sums
    pre_k, the centered cumulative deviation P_k = N·pre_k − (k+1)·S is
    an exact integer (Python int / HUGEINT); the change point is the
    FIRST k in 0..N−2 maximizing |P_k| (both sides of the split stay
    non-empty), and the two segment means go through one shared IEEE
    divide each before the e6 floor. Constant (including all-zero)
    series yield P≡0 → cp at the first grid day with equal means —
    reported, not excluded (the honest "no shift" row).

    Scale shape: the bounded (type, day, n) enum fold, then a driver
    pass over types × days; zero shuffle. |P_k| ≤ N·S fits int64 up to
    ~10 years × 10^12 daily events.
    """
    cols = {
        "event_type": "object", "cp_day": "int64", "n_days": "int64",
        "cusum_abs": "int64", "mean_before_e6": "int64", "mean_after_e6": "int64",
    }
    fold = _events_daily_counts(sf_dir)
    if len(fold) == 0:
        return _empty(cols)
    mn = int(fold["day"].min())
    mx = int(fold["day"].max())
    n_days = mx - mn + 1
    if n_days < 2:
        return _empty(cols)
    rows = []
    for ty, g in fold.groupby("t", sort=True):
        dense = np.zeros(n_days, dtype=np.int64)
        dense[g["day"].to_numpy(dtype=np.int64) - mn] = g["n"].to_numpy(
            dtype=np.int64
        )
        xs = [int(v) for v in dense]
        s = sum(xs)
        best_k = 0
        best_dev = -1
        pre = 0
        pre_at_best = 0
        for k in range(n_days - 1):
            pre += xs[k]
            dev = abs(n_days * pre - (k + 1) * s)
            if dev > best_dev:
                best_dev = dev
                best_k = k
                pre_at_best = pre
        before = float(pre_at_best) / float(best_k + 1)
        after = float(s - pre_at_best) / float(n_days - 1 - best_k)
        rows.append(
            {
                "event_type": str(ty),
                "cp_day": mn + best_k,
                "n_days": n_days,
                "cusum_abs": best_dev,
                "mean_before_e6": int(math.floor(before * 1e6 + 0.5)),
                "mean_after_e6": int(math.floor(after * 1e6 + 0.5)),
            }
        )
    return pd.DataFrame(rows).astype(cols)


EVENTS_CUSUM_SQL = """
WITH f AS (
  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
g AS (SELECT t, day, count(*) AS n FROM f GROUP BY 1, 2),
b AS (SELECT min(day) AS mn, max(day) - min(day) + 1 AS nn FROM g),
types AS (SELECT DISTINCT t FROM g),
grid AS (
  SELECT ty.t, b.mn + u.i AS day, u.i AS idx
  FROM types ty, b, UNNEST(generate_series(0, CAST(b.nn - 1 AS BIGINT))) u(i)
),
dense AS (
  SELECT grid.t, grid.idx, CAST(coalesce(g.n, 0) AS HUGEINT) AS x
  FROM grid LEFT JOIN g ON g.t = grid.t AND g.day = grid.day
),
p AS (
  SELECT t, idx,
         sum(x) OVER (PARTITION BY t ORDER BY idx
                      ROWS UNBOUNDED PRECEDING) AS pre
  FROM dense
),
st AS (SELECT t, sum(x) AS s FROM dense GROUP BY t),
dev AS (
  SELECT p.t, p.idx, p.pre, st.s,
         abs(CAST(b.nn AS HUGEINT) * p.pre - (p.idx + 1) * st.s) AS dv
  FROM p JOIN st ON st.t = p.t CROSS JOIN b
  WHERE p.idx < b.nn - 1
),
cp AS (
  SELECT t, idx, pre, s, dv,
         row_number() OVER (PARTITION BY t ORDER BY dv DESC, idx ASC) AS rn
  FROM dev
)
SELECT cp.t AS event_type,
       CAST(b.mn + cp.idx AS BIGINT) AS cp_day,
       CAST(b.nn AS BIGINT) AS n_days,
       CAST(cp.dv AS BIGINT) AS cusum_abs,
       CAST(floor(CAST(cp.pre AS DOUBLE) / CAST(cp.idx + 1 AS DOUBLE)
            * 1e6 + 0.5) AS BIGINT) AS mean_before_e6,
       CAST(floor(CAST(cp.s - cp.pre AS DOUBLE)
            / CAST(b.nn - 1 - cp.idx AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
         AS mean_after_e6
FROM cp CROSS JOIN b
WHERE cp.rn = 1 AND b.nn >= 2
"""

register("events_changepoint_cusum", events_changepoint_cusum, sql=EVENTS_CUSUM_SQL)
