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


#: (table, key column) pairs every standard pipeline joins or partitions on
SKEW_AUDIT_KEYS: list[tuple[str, str]] = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]


def join_skew_audit(sf_dir: str) -> pd.DataFrame:
    """(table_name, key_col, n_rows, n_keys, top_key, top_n, top_share_e6,
    p50_mult, p99_mult): the exact key-multiplicity profile of every
    declared join/partition key — the shuffle-planning readout behind
    the engine's explicit skew handling (which keys need salting, how
    hot is the hottest key, how heavy is the multiplicity tail).

    Exactness contract: multiplicities are exact integer counts; the
    top key is (multiplicity DESC, key ASC); quantiles use the inverse
    CDF over the count-of-counts fold — p_q = min{m : #keys with
    multiplicity ≤ m reaches ceil(q·n_keys)} with integer thresholds
    (n_keys+1)//2 and (99·n_keys+99)//100; top_share_e6 is one IEEE
    divide then the e6 floor.

    Scale shape: per key column, one hash co-partition exchange of
    in-block (key, n) pre-aggregates → exact per-key counts stay
    distributed; the driver folds only (a) one scalar agg row, (b) the
    global top-1 via per-block top-k candidates, (c) the bounded
    count-of-counts frame (≤ #distinct multiplicities rows — the same
    bound as the token frequency spectrum). No global sort.
    """
    from ray.data.aggregate import Count, Max, Sum

    from .exchange import driver_topk_fold, hash_partitioned

    cols = {
        "table_name": "object", "key_col": "object", "n_rows": "int64",
        "n_keys": "int64", "top_key": "int64", "top_n": "int64",
        "top_share_e6": "int64", "p50_mult": "int64", "p99_mult": "int64",
    }
    rows = []
    for table, key in SKEW_AUDIT_KEYS:

        def partial(batch: pa.Table, key=key) -> pa.Table:
            col = batch[key]
            t = pa.table({"k": col}).filter(pc.is_valid(col))
            g = t.group_by(["k"]).aggregate([([], "count_all")])
            return g.rename_columns(["k", "n"])

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {"k": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
                )
            return (
                df.groupby("k", sort=False)["n"].sum().reset_index().astype("int64")
            )

        per_key = hash_partitioned(
            ray.data.read_parquet(
                table_path(sf_dir, table), columns=[key]
            ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            "k",
            fold,
        ).materialize()  # one exact (key, n) row per distinct key, distributed

        agg = per_key.aggregate(Count(), Sum("n"), Max("n"))
        if agg is None or not agg.get("count()"):
            continue
        n_keys = int(agg["count()"])
        n_rows = int(agg["sum(n)"])
        top = driver_topk_fold(per_key, by=["n", "k"], ascending=[False, True], k=1)
        top_key = int(top["k"].iloc[0])
        top_n = int(top["n"].iloc[0])

        def cc_partial(batch: pa.Table) -> pa.Table:
            g = (
                pa.table({"m": batch["n"]})
                .group_by(["m"])
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["m", "c"])

        cc = enum_group_sum(
            per_key.map_batches(cc_partial, batch_format="pyarrow"),
            ["m"],
            ["c"],
        ).sort_values("m")
        cum = cc["c"].cumsum().to_numpy()
        ms = cc["m"].to_numpy(dtype=np.int64)
        t50 = (n_keys + 1) // 2
        t99 = (99 * n_keys + 99) // 100
        p50 = int(ms[np.searchsorted(cum, t50)])
        p99 = int(ms[np.searchsorted(cum, t99)])
        rows.append(
            {
                "table_name": table, "key_col": key, "n_rows": n_rows,
                "n_keys": n_keys, "top_key": top_key, "top_n": top_n,
                "top_share_e6": int(
                    math.floor(float(top_n) / float(n_rows) * 1e6 + 0.5)
                ),
                "p50_mult": p50, "p99_mult": p99,
            }
        )
    if not rows:
        return _empty(cols)
    return pd.DataFrame(rows).astype(cols)


def _skew_audit_sql() -> str:
    parts = []
    for table, key in SKEW_AUDIT_KEYS:
        parts.append(f"""
SELECT '{table}' AS table_name, '{key}' AS key_col, * FROM (
  WITH cnt AS (
    SELECT {key} AS k, count(*) AS m FROM {table}
    WHERE {key} IS NOT NULL GROUP BY 1
  ),
  tot AS (SELECT count(*) AS kk, sum(m) AS nr FROM cnt),
  cc AS (SELECT m, count(*) AS c FROM cnt GROUP BY m),
  cum AS (SELECT m, sum(c) OVER (ORDER BY m) AS cm FROM cc),
  top AS (SELECT k, m FROM cnt ORDER BY m DESC, k ASC LIMIT 1)
  SELECT CAST(tot.nr AS BIGINT) AS n_rows,
         CAST(tot.kk AS BIGINT) AS n_keys,
         CAST(top.k AS BIGINT) AS top_key,
         CAST(top.m AS BIGINT) AS top_n,
         CAST(floor(CAST(top.m AS DOUBLE) / CAST(tot.nr AS DOUBLE)
              * 1e6 + 0.5) AS BIGINT) AS top_share_e6,
         (SELECT CAST(min(m) AS BIGINT) FROM cum, tot
          WHERE cm >= (tot.kk + 1) // 2) AS p50_mult,
         (SELECT CAST(min(m) AS BIGINT) FROM cum, tot
          WHERE cm >= (99 * tot.kk + 99) // 100) AS p99_mult
  FROM tot, top
  WHERE tot.kk > 0
)""")
    return "\nUNION ALL\n".join(parts)


register("join_skew_audit", join_skew_audit, sql=_skew_audit_sql())
