"""Multi-level (ROLLUP) and pivoted aggregates.

The reference aggregates only flat run counters (SURVEY.md §2.7, A1-A4);
a reporting layer over a 10^12-row corpus needs hierarchy totals and
wide per-entity feature vectors too. Both operators here are built as
**bounded partial aggregation** — the exchange carries per-block partial
rows keyed by a bounded enum (or one hash partition for the unbounded
key), never the fact rows:

- ``orders_rollup``: GROUP BY ROLLUP(priority, status) — counts and
  fixed-point revenue at every hierarchy level. The finest grain is
  bounded (5 priorities × 3 statuses), so per-block partials fold on the
  driver and the super-aggregate levels are DERIVED from the finest
  integer partials (exact, order-free) instead of re-scanning the fact
  table once per level the way a naive UNION-of-GROUP-BYs would.
- ``user_event_pivot``: one row per user with one count column per event
  type (the conditional-aggregation pivot that turns an event log into a
  per-entity feature vector). Per-block pivoted partials (≤ users-in-
  block rows, fixed columns) fold in ONE hash partition by ``user_id``.

Money values are summed as integer cents (``round(price*100)`` per row,
then integer sums) so totals are independent of float summation order —
the fixed-point contract used across this repo (see sketches/dsir).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .exchange import enum_group_sum
from .queryset import register, table_path

ROLLUP_ALL = "(all)"  # sentinel for super-aggregate rows (never NULL — both
# engines hash a real string, mirroring the zorder NULL-sentinel rule)

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --- GROUP BY ROLLUP(priority, status) --------------------------------------


def orders_rollup(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderpriority, o_orderstatus, n_orders, revenue_e2) at three
    hierarchy levels: (priority, status), (priority, *), (*, *).

    One pass over the fact table: each block emits ≤ 15 finest-grain
    integer partials; the driver folds them (bounded enum keys) and
    derives the two super-aggregate levels by summing the finest level —
    no second scan, no shuffle.
    """

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        v = price * 100.0
        cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "o_orderstatus": batch["o_orderstatus"],
                "n_orders": pa.array(np.ones(len(batch), dtype=np.int64)),
                "revenue_e2": pa.array(cents),
            }
        )
        return t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("n_orders", "sum"), ("revenue_e2", "sum")]
        ).rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "revenue_e2"]
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    finest = enum_group_sum(
        ds, ["o_orderpriority", "o_orderstatus"], ["n_orders", "revenue_e2"]
    )
    by_priority = (
        finest.groupby("o_orderpriority", sort=True)[["n_orders", "revenue_e2"]]
        .sum()
        .reset_index()
        .assign(o_orderstatus=ROLLUP_ALL)
    )
    grand = pd.DataFrame(
        {
            "o_orderpriority": [ROLLUP_ALL],
            "o_orderstatus": [ROLLUP_ALL],
            "n_orders": [finest["n_orders"].sum()],
            "revenue_e2": [finest["revenue_e2"].sum()],
        }
    )
    out = pd.concat([finest, by_priority, grand], ignore_index=True)[
        ["o_orderpriority", "o_orderstatus", "n_orders", "revenue_e2"]
    ]
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_e2"] = out["revenue_e2"].astype("int64")
    return ray.data.from_pandas(
        out.sort_values(["o_orderpriority", "o_orderstatus"]).reset_index(drop=True)
    )


ORDERS_ROLLUP_SQL = f"""
SELECT coalesce(o_orderpriority, '{ROLLUP_ALL}') AS o_orderpriority,
       coalesce(o_orderstatus, '{ROLLUP_ALL}') AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)), 0)
            AS BIGINT) AS revenue_e2
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


# --- pivot: per-user event-type count vector ---------------------------------


def user_event_pivot(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view): the
    event log pivoted to one fixed-width count vector per user.

    Each block pivots locally (vectorized ``np.bincount`` over
    (user-slot × type-slot) codes — ≤ distinct-users-in-block rows out),
    then ONE hash partition by ``user_id`` makes the per-user sums global.
    The pivoted column set is fixed by ``EVENT_TYPES``; an unknown type in
    the input raises rather than silently dropping counts.
    """
    from .dedup import _hash_partitioned

    type_to_slot = {t: i for i, t in enumerate(EVENT_TYPES)}
    n_types = len(EVENT_TYPES)
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        kinds = batch["event_type"].to_pylist()
        uniq, inv = np.unique(users, return_inverse=True)
        slots = np.empty(len(kinds), dtype=np.int64)
        for i, k in enumerate(kinds):  # bounded dict probe; types are an enum
            s = type_to_slot.get(k)
            if s is None:
                raise ValueError(f"unknown event_type {k!r} (extend EVENT_TYPES)")
            slots[i] = s
        counts = np.bincount(
            inv * n_types + slots, minlength=len(uniq) * n_types
        ).reshape(len(uniq), n_types)
        data = {"user_id": pa.array(uniq, type=pa.int64())}
        for j, c in enumerate(cols):
            data[c] = pa.array(counts[:, j].astype(np.int64))
        return pa.table(data)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=True)[cols].sum().reset_index()
        for c in cols:
            g[c] = g[c].astype("int64")
        return g

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id", "event_type"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _hash_partitioned(ds, "user_id", fold)


USER_EVENT_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(
           f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY user_id
"""

register("orders_rollup", orders_rollup, sql=ORDERS_ROLLUP_SQL)
register("user_event_pivot", user_event_pivot, sql=USER_EVENT_PIVOT_SQL)


# --- pricing summary (TPC-H Q1 shape: multi-aggregate scan) -------------------

Q1_SHIP_CUTOFF = "1998-09-02"


def tpch_q1_pricing(sf_dir: str) -> "ray.data.Dataset":
    """(l_returnflag, l_linestatus, sum_qty_e2, sum_base_e2, sum_disc_e2,
    sum_charge_e4, avg_qty, avg_price, n_lines): the classic pricing
    summary — the multi-aggregate single-pass scan every columnar engine
    demos. One ``map_batches`` partial per block over the date-pruned
    read (bounded 3×2 key grid), driver fold, averages derived from the
    exact integer sums (one division both engines round identically, then
    round6).

    Money contract: every product is rounded to fixed point PER ROW
    before the integer sum (qty and base at cents, the two-factor
    discounted charge at 1e-4) so group totals are independent of float
    summation order — the ``lineitem_top_parts`` rule extended to a
    three-factor product.
    """
    import datetime as _dt

    import pyarrow.compute as pc

    from .exchange import round6

    cutoff = _dt.datetime.fromisoformat(Q1_SHIP_CUTOFF)

    def _fixed(col, scale: float):
        return pc.cast(
            pc.round(
                pc.multiply(col, pa.scalar(scale)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff))
        )
        disc_price = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        charge = pc.multiply(
            disc_price, pc.add(pa.scalar(1.0), batch["l_tax"])
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty_e2": _fixed(batch["l_quantity"], 100.0),
                "sum_base_e2": _fixed(batch["l_extendedprice"], 100.0),
                "sum_disc_e2": _fixed(disc_price, 100.0),
                "sum_charge_e4": _fixed(charge, 10_000.0),
                "n_lines": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("sum_qty_e2", "sum"),
                ("sum_base_e2", "sum"),
                ("sum_disc_e2", "sum"),
                ("sum_charge_e4", "sum"),
                ("n_lines", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty_e2",
                "sum_base_e2",
                "sum_disc_e2",
                "sum_charge_e4",
                "n_lines",
            ]
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = enum_group_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty_e2", "sum_base_e2", "sum_disc_e2", "sum_charge_e4", "n_lines"],
    )
    out["avg_qty"] = round6(
        out["sum_qty_e2"].to_numpy(dtype=np.float64)
        / out["n_lines"].to_numpy(dtype=np.float64)
        / 100.0
    )
    out["avg_price"] = round6(
        out["sum_base_e2"].to_numpy(dtype=np.float64)
        / out["n_lines"].to_numpy(dtype=np.float64)
        / 100.0
    )
    return ray.data.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    )


TPCH_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_qty_e2,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_base_e2,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS sum_disc_e2,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_charge_e4,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100, 6) AS avg_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100, 6) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_SHIP_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""

register("tpch_q1_pricing", tpch_q1_pricing, sql=TPCH_Q1_SQL)


#: per-block row cap for the correlation moment fold: the largest per-row
#: product (p2² ≤ (1e7)² = 1e14) times this many rows stays under 2^63,
#: so int64 block partials cannot overflow; the DRIVER fold then runs in
#: arbitrary-precision Python ints, exact at any corpus size (same
#: discipline as the Gram fold's overflow pre-check).
_CORR_BLOCK_ROWS = 50_000


def lineitem_corr_by_flag(sf_dir: str) -> "pd.DataFrame":
    """(l_returnflag, n, corr_e6): exact-moment Pearson correlation of
    quantity vs extended price per return flag — the distributed
    five-moment fold (n, Σx, Σy, Σx², Σy², Σxy) every profiler/drift
    monitor needs, with the correlation itself reproduced bit-for-bit by
    the SQL oracle.

    Exactness: inputs quantize to e2 fixed point per row (prices carry two
    decimals); block partials are int64 under the pre-checked row cap; the
    driver folds Python ints (no overflow at any scale) and the final r is
    ONE shared IEEE chain — int→double conversions, two correctly-rounded
    sqrts, one divide — identical in numpy and DuckDB, e6-quantized
    half-up. Zero-variance groups are excluded on both sides (their r is
    undefined); the group enum is bounded so partials drive a driver fold,
    never a shuffle.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) > _CORR_BLOCK_ROWS:
            raise ValueError(
                f"corr partial got a {len(batch):,}-row block; int64 moment "
                f"partials are overflow-safe only under {_CORR_BLOCK_ROWS:,} "
                "rows — lower batch_size on this map_batches"
            )
        q2 = (
            pc.cast(
                pc.round(
                    pc.multiply(batch["l_quantity"], pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        p2 = (
            pc.cast(
                pc.round(
                    pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "sq": pa.array(q2),
                "sp": pa.array(p2),
                "sqq": pa.array(q2 * q2),
                "spp": pa.array(p2 * p2),
                "sqp": pa.array(q2 * p2),
            }
        )
        g = t.group_by(["l_returnflag"]).aggregate(
            [("n", "sum"), ("sq", "sum"), ("sp", "sum"),
             ("sqq", "sum"), ("spp", "sum"), ("sqp", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "n", "sq", "sp", "sqq", "spp", "sqp"]
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=_CORR_BLOCK_ROWS,
    )

    import math

    acc: dict[str, list[int]] = {}
    for b in ds.iter_batches(batch_size=65_536, batch_format="pandas"):
        for row in b.itertuples(index=False):
            a = acc.setdefault(row.l_returnflag, [0, 0, 0, 0, 0, 0])
            a[0] += int(row.n)
            a[1] += int(row.sq)
            a[2] += int(row.sp)
            a[3] += int(row.sqq)
            a[4] += int(row.spp)
            a[5] += int(row.sqp)

    flags, ns, corrs = [], [], []
    for flag in sorted(acc):
        n, sq, sp, sqq, spp, sqp = acc[flag]
        va = n * sqq - sq * sq
        vb = n * spp - sp * sp
        if va <= 0 or vb <= 0:
            continue  # zero variance: r undefined, excluded both sides
        num = n * sqp - sq * sp
        r = float(num) / (math.sqrt(float(va)) * math.sqrt(float(vb)))
        flags.append(flag)
        ns.append(n)
        corrs.append(int(np.floor(r * 1e6 + 0.5)))
    return pd.DataFrame(
        {
            "l_returnflag": pd.Series(flags, dtype="object"),
            "n": pd.Series(ns, dtype="int64"),
            "corr_e6": pd.Series(corrs, dtype="int64"),
        }
    )


LINEITEM_CORR_SQL = """
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100, 0) AS BIGINT) AS q2,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p2
  FROM lineitem
),
s AS (
  SELECT l_returnflag, count(*) AS n,
         SUM(CAST(q2 AS HUGEINT)) AS sq, SUM(CAST(p2 AS HUGEINT)) AS sp,
         SUM(CAST(q2 AS HUGEINT) * q2) AS sqq,
         SUM(CAST(p2 AS HUGEINT) * p2) AS spp,
         SUM(CAST(q2 AS HUGEINT) * p2) AS sqp
  FROM q GROUP BY 1
)
SELECT l_returnflag, n,
       CAST(floor(
         CAST(n * sqp - sq * sp AS DOUBLE)
         / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
            * sqrt(CAST(n * spp - sp * sp AS DOUBLE)))
         * 1e6 + 0.5) AS BIGINT) AS corr_e6
FROM s
WHERE n * sqq - sq * sq > 0 AND n * spp - sp * sp > 0
"""

register("lineitem_corr_by_flag", lineitem_corr_by_flag, sql=LINEITEM_CORR_SQL)


def lineitem_regression_by_flag(sf_dir: str) -> "pd.DataFrame":
    """(l_returnflag, n, slope_e6, intercept_e6): ordinary-least-squares
    fit of extended price on quantity per return flag — the grouped
    regression every drift monitor and pricing model needs, sharing the
    X98 exact-moment fold: the same five int64 block partials (under the
    same ``_CORR_BLOCK_ROWS`` overflow cap), a Python-int driver fold,
    and then ONE shared IEEE chain per group (int→double conversions,
    one divide for the slope, one fused subtract-multiply-divide for the
    intercept) that the SQL twin spells out literally — not DuckDB's
    ``regr_slope``, whose float accumulation order differs. Zero-variance
    groups are excluded on both sides (slope undefined). Intercept is
    reported in natural price units quantized e6 (the e2 input scales of
    x and y cancel in the slope, so slope is natural-unit price/qty)."""
    import math  # noqa: F401  (parity with the corr chain's imports)

    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) > _CORR_BLOCK_ROWS:
            raise ValueError(
                f"regression partial got a {len(batch):,}-row block; int64 "
                f"moment partials are overflow-safe only under "
                f"{_CORR_BLOCK_ROWS:,} rows — lower batch_size"
            )
        q2 = (
            pc.cast(
                pc.round(
                    pc.multiply(batch["l_quantity"], pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        p2 = (
            pc.cast(
                pc.round(
                    pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "sq": pa.array(q2),
                "sp": pa.array(p2),
                "sqq": pa.array(q2 * q2),
                "sqp": pa.array(q2 * p2),
            }
        )
        g = t.group_by(["l_returnflag"]).aggregate(
            [("n", "sum"), ("sq", "sum"), ("sp", "sum"),
             ("sqq", "sum"), ("sqp", "sum")]
        )
        return g.rename_columns(["l_returnflag", "n", "sq", "sp", "sqq", "sqp"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=_CORR_BLOCK_ROWS,
    )

    acc: dict[str, list[int]] = {}
    for b in ds.iter_batches(batch_size=65_536, batch_format="pandas"):
        for row in b.itertuples(index=False):
            a = acc.setdefault(row.l_returnflag, [0, 0, 0, 0, 0])
            a[0] += int(row.n)
            a[1] += int(row.sq)
            a[2] += int(row.sp)
            a[3] += int(row.sqq)
            a[4] += int(row.sqp)

    flags, ns, slopes, inters = [], [], [], []
    for flag in sorted(acc):
        n, sq, sp, sqq, sqp = acc[flag]
        va = n * sqq - sq * sq
        if va <= 0:
            continue  # zero x-variance: slope undefined, excluded both sides
        slope = float(n * sqp - sq * sp) / float(va)
        inter = (float(sp) - slope * float(sq)) / float(n) / 100.0
        flags.append(flag)
        ns.append(n)
        slopes.append(int(np.floor(slope * 1e6 + 0.5)))
        inters.append(int(np.floor(inter * 1e6 + 0.5)))
    return pd.DataFrame(
        {
            "l_returnflag": pd.Series(flags, dtype="object"),
            "n": pd.Series(ns, dtype="int64"),
            "slope_e6": pd.Series(slopes, dtype="int64"),
            "intercept_e6": pd.Series(inters, dtype="int64"),
        }
    )


LINEITEM_REGRESSION_SQL = """
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100, 0) AS BIGINT) AS q2,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p2
  FROM lineitem
),
s AS (
  SELECT l_returnflag, count(*) AS n,
         SUM(CAST(q2 AS HUGEINT)) AS sq, SUM(CAST(p2 AS HUGEINT)) AS sp,
         SUM(CAST(q2 AS HUGEINT) * q2) AS sqq,
         SUM(CAST(q2 AS HUGEINT) * p2) AS sqp
  FROM q GROUP BY 1
)
SELECT l_returnflag, n,
       CAST(floor(
         CAST(n * sqp - sq * sp AS DOUBLE) / CAST(n * sqq - sq * sq AS DOUBLE)
         * 1e6 + 0.5) AS BIGINT) AS slope_e6,
       CAST(floor(
         (CAST(sp AS DOUBLE)
          - CAST(n * sqp - sq * sp AS DOUBLE)
            / CAST(n * sqq - sq * sq AS DOUBLE)
            * CAST(sq AS DOUBLE))
         / CAST(n AS DOUBLE) / 100.0 * 1e6 + 0.5) AS BIGINT) AS intercept_e6
FROM s
WHERE n * sqq - sq * sq > 0
"""

register(
    "lineitem_regression_by_flag", lineitem_regression_by_flag,
    sql=LINEITEM_REGRESSION_SQL,
)


# --- GROUP BY CUBE(priority, status, year) (X107) ----------------------------


def orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderpriority, o_orderstatus, order_year, n_orders, revenue_e2)
    at ALL 2³ = 8 grouping sets — the full CUBE a BI layer asks for, where
    ROLLUP (above) walks only the hierarchy prefix chain.

    Same plan shape as the ROLLUP: one pass over the fact table emitting
    bounded finest-grain integer partials (≤ #priorities × #statuses ×
    #years cells per block), one driver fold, and every super-aggregate
    level DERIVED by re-summing the finest level — the 8 grouping sets
    cost zero extra scans and zero shuffles. ``ROLLUP_ALL`` marks the
    aggregated-out dimensions (same sentinel contract as the ROLLUP;
    the year is emitted as VARCHAR so the sentinel shares the column).
    """

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .exchange import half_up_int64

        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = half_up_int64(price * 100.0)
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "o_orderstatus": batch["o_orderstatus"],
                "order_year": pc.year(batch["o_orderdate"]).cast(pa.string()),
                "n_orders": pa.array(np.ones(len(batch), dtype=np.int64)),
                "revenue_e2": pa.array(cents),
            }
        )
        return t.group_by(
            ["o_orderpriority", "o_orderstatus", "order_year"]
        ).aggregate([("n_orders", "sum"), ("revenue_e2", "sum")]).rename_columns(
            ["o_orderpriority", "o_orderstatus", "order_year", "n_orders", "revenue_e2"]
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderstatus", "o_orderdate", "o_totalprice"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    dims = ["o_orderpriority", "o_orderstatus", "order_year"]
    vals = ["n_orders", "revenue_e2"]
    finest = enum_group_sum(ds, dims, vals)
    frames = []
    for mask in range(8):
        keep = [d for i, d in enumerate(dims) if (mask >> i) & 1]
        if keep:
            g = finest.groupby(keep, sort=False)[vals].sum().reset_index()
        else:
            g = pd.DataFrame({v: [finest[v].sum()] for v in vals})
        for d in dims:
            if d not in keep:
                g[d] = ROLLUP_ALL
        frames.append(g[dims + vals])
    out = pd.concat(frames, ignore_index=True)
    for v in vals:
        out[v] = out[v].astype("int64")
    return ray.data.from_pandas(out.sort_values(dims).reset_index(drop=True))


ORDERS_CUBE_SQL = f"""
SELECT coalesce(o_orderpriority, '{ROLLUP_ALL}') AS o_orderpriority,
       coalesce(o_orderstatus, '{ROLLUP_ALL}') AS o_orderstatus,
       coalesce(CAST(year(o_orderdate) AS VARCHAR), '{ROLLUP_ALL}') AS order_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)), 0)
            AS BIGINT) AS revenue_e2
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus, year(o_orderdate))
"""

register("orders_cube", orders_cube, sql=ORDERS_CUBE_SQL)


# --- grouped Spearman rank correlation (X136) --------------------------------

#: equal-width y-bins for the counting-rank exchange (any monotone bucketing
#: works — between-bin order is what matters; ties share a bin by construction
#: because equal cents produce equal bins)
SPEARMAN_BINS = 4096


def lineitem_spearman_by_flag(sf_dir: str) -> "pd.DataFrame":
    """(l_returnflag, n, spearman_e6): Spearman rank correlation between
    quantity and extended price per return flag — the monotone-association
    twin of ``lineitem_corr_by_flag`` (Pearson), robust to the outliers
    and curvature a drift monitor meets in practice. Exact tie handling
    (average ranks) with NO global sort.

    Exactness contract: Spearman = Pearson on average ranks; doubled
    ranks ``2r = 2*cnt_less + cnt_eq + 1`` are integers, so every moment
    (Sxy, Sxx, Syy, Sx = Sy = n(n+1)) is an exact integer on both
    engines, and one shared IEEE chain (int→double, multiply, sqrt,
    divide, floor-e6) produces the correlation. The SQL twin spells the
    same doubled ranks via ``2*rank() + count(*) OVER (flag, v) - 1``.

    Scale shape (three column-pruned passes, zero global sorts):
    1. (flag, x-cents) count fold — quantity-like columns are
       enum-bounded (MAX_ENUM_GROUPS guard); the driver derives each
       flag's exact x-rank map, Sxx, n, and the y domain from the same
       fold (Python-int arithmetic, no overflow cliff).
    2. (flag, y-bin) count fold → per-bin start ranks (bins x flags
       rows, driver-held).
    3. ONE (flag, bin)-keyed exchange: each partition sorts its bins'
       (y, x) rows, assigns exact global y-ranks from the bin start (a
       tie never spans bins), looks x-ranks up in the broadcast map, and
       emits per-flag int64 partial moments under an explicit overflow
       guard (rows x (2n)^2 < 2^63, raising the string-decimal-partial
       reroute by name past it). The driver folds partials in Python
       ints, so the cross moment is exact at any corpus size the guard
       admits.
    """
    import math

    import pyarrow.compute as pc

    import ray as ray_core

    from .exchange import enum_group_agg, enum_group_sum, hash_partitioned

    path = table_path(sf_dir, "lineitem")
    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]

    def _keep(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.is_valid(batch["l_returnflag"]),
                pc.is_valid(batch["l_quantity"]),
            ),
            pc.is_valid(batch["l_extendedprice"]),
        )
        return batch.filter(m)

    def _e2(col) -> pa.Array:
        return pc.cast(
            pc.round(
                pc.multiply(col, pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )

    empty = pd.DataFrame(
        {
            "l_returnflag": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "spearman_e6": pd.Series(dtype="int64"),
        }
    )

    # -- pass 1: (flag, x) counts + y min/max ---------------------------------
    def partial_x(batch: pa.Table) -> pa.Table:
        t = _keep(batch)
        if t.num_rows == 0:
            return pa.table(
                {
                    "flag": pa.array([], pa.string()),
                    "x": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "ylo": pa.array([], pa.int64()),
                    "yhi": pa.array([], pa.int64()),
                }
            )
        y = _e2(t["l_extendedprice"])
        g = (
            pa.table(
                {
                    "flag": t["l_returnflag"],
                    "x": _e2(t["l_quantity"]),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "ylo": y,
                    "yhi": y,
                }
            )
            .group_by(["flag", "x"])
            .aggregate([("n", "sum"), ("ylo", "min"), ("yhi", "max")])
        )
        return g.rename_columns(["flag", "x", "n", "ylo", "yhi"])

    xfold = enum_group_agg(
        ray.data.read_parquet(path, columns=cols).map_batches(
            partial_x, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["flag", "x"],
        {"n": "sum", "ylo": "min", "yhi": "max"},
    )
    if len(xfold) == 0:
        return empty

    flags = sorted(xfold["flag"].unique())
    flag_id = {f: i for i, f in enumerate(flags)}
    n_of: dict[int, int] = {}
    sxx_of: dict[int, int] = {}
    r2x_of: dict[int, int] = {}  # (fid << 44) | x-cents -> doubled x-rank
    lo_of: dict[int, int] = {}
    hi_of: dict[int, int] = {}
    X_OFF = 1 << 44  # x-cents ceiling for the combined key (guarded below)
    for f, g in xfold.groupby("flag", sort=True):
        fid = flag_id[f]
        g = g.sort_values("x").reset_index(drop=True)
        if int(g["x"].max()) >= X_OFF or int(g["x"].min()) < 0:
            raise ValueError(
                "lineitem_spearman_by_flag: x-cents outside [0, 2^44) — "
                "widen the combined-key offset"
            )
        cnt = [int(v) for v in g["n"]]
        m = 0
        sxx = 0
        for xv, c in zip(g["x"], cnt):
            r2 = 2 * m + c + 1
            r2x_of[(fid << 44) | int(xv)] = r2
            sxx += c * r2 * r2
            m += c
        n_of[fid] = m
        sxx_of[fid] = sxx
        lo_of[fid] = int(g["ylo"].min())
        hi_of[fid] = int(g["yhi"].max())

    spans = {fid: hi_of[fid] - lo_of[fid] for fid in n_of}
    if any(s * SPEARMAN_BINS >= 2**63 for s in spans.values()):
        raise ValueError(
            "lineitem_spearman_by_flag: y span too wide for int64 binning"
        )
    # broadcast payload as flat numpy (vectorized probes, no per-row Python):
    # dense lo/span per fid, the x-rank map as sorted (key, value) arrays
    from .exchange import broadcast_lookup, probe_lookup

    n_flags = len(flags)
    lo_arr = np.array([lo_of[i] for i in range(n_flags)], dtype=np.int64)
    sp_arr = np.array([spans[i] for i in range(n_flags)], dtype=np.int64)
    r2x_keys, r2x_vals = broadcast_lookup(
        np.fromiter(r2x_of.keys(), dtype=np.int64, count=len(r2x_of)),
        np.fromiter(r2x_of.values(), dtype=np.int64, count=len(r2x_of)),
    )
    n_max = max(n_of.values())
    ref = ray_core.put(
        (pa.array(flags, type=pa.string()), lo_arr, sp_arr, r2x_keys, r2x_vals, n_max)
    )

    def _binned(batch: pa.Table) -> pa.Table:
        flag_set, lo, spn, _, _, _ = ray_core.get(ref)
        t = _keep(batch)
        fid = (
            pc.index_in(t["l_returnflag"], value_set=flag_set)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        x = _e2(t["l_quantity"]).to_numpy(zero_copy_only=False)
        y = _e2(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        lo_v = lo[fid]
        sp_v = spn[fid]
        b = np.where(
            sp_v > 0,
            np.clip(
                (y - lo_v) * SPEARMAN_BINS // np.maximum(sp_v, 1),
                0,
                SPEARMAN_BINS - 1,
            ),
            0,
        )
        return pa.table(
            {
                "key": pa.array(fid * SPEARMAN_BINS + b, type=pa.int64()),
                "fid": pa.array(fid, type=pa.int64()),
                "x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64()),
            }
        )

    # -- pass 2: (flag, bin) counts → start ranks ------------------------------
    def bin_counts(batch: pa.Table) -> pa.Table:
        t = _binned(batch)
        if t.num_rows == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        cnt = np.bincount(
            t["key"].to_numpy(zero_copy_only=False),
            minlength=n_flags * SPEARMAN_BINS,
        )
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "key": pa.array(nz, type=pa.int64()),
                "n": pa.array(cnt[nz], type=pa.int64()),
            }
        )

    bfold = enum_group_sum(
        ray.data.read_parquet(path, columns=cols).map_batches(
            bin_counts, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["key"],
        ["n"],
    )
    bfold = bfold.sort_values("key").reset_index(drop=True)
    keys = bfold["key"].to_numpy(dtype=np.int64)
    cnts = bfold["n"].to_numpy(dtype=np.int64)
    fid_of_key = keys // SPEARMAN_BINS
    starts = np.zeros_like(cnts)
    for fid in n_of:  # exclusive per-flag cumsum across that flag's bins
        sel = fid_of_key == fid
        c = cnts[sel]
        starts[sel] = np.cumsum(c) - c
    # dense start-rank array indexed by combined key (#flags x bins entries)
    start_arr = np.zeros(n_flags * SPEARMAN_BINS, dtype=np.int64)
    start_arr[keys] = starts
    sref = ray_core.put(start_arr)

    # -- pass 3: the rank exchange --------------------------------------------
    def rank_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        out = {
            "fid": pd.Series(dtype="int64"),
            "rows": pd.Series(dtype="int64"),
            "sxy": pd.Series(dtype="int64"),
            "syy": pd.Series(dtype="int64"),
        }
        if len(df) == 0:
            return pd.DataFrame(out)
        _, _, _, r2x_k, r2x_v, n_max = ray_core.get(ref)
        start_dense = ray_core.get(sref)
        df = df.sort_values(["key", "y"], kind="mergesort").reset_index(drop=True)
        key = df["key"].to_numpy(dtype=np.int64)
        y = df["y"].to_numpy(dtype=np.int64)
        fid = df["fid"].to_numpy(dtype=np.int64)
        x = df["x"].to_numpy(dtype=np.int64)
        # runs of equal (key, y) = global tie groups; runs of key = bins
        new_bin = np.r_[True, key[1:] != key[:-1]]
        new_val = new_bin | np.r_[True, y[1:] != y[:-1]]
        val_start = np.flatnonzero(new_val)
        val_len = np.diff(np.r_[val_start, key.size])
        bin_start = np.repeat(
            np.flatnonzero(new_bin), np.diff(np.r_[np.flatnonzero(new_bin), key.size])
        )
        # in-bin cnt_less for each tie run = run start - its bin's start
        run_first = np.repeat(val_start, val_len)
        in_less = run_first - bin_start
        r2y = 2 * (start_dense[key] + in_less) + np.repeat(val_len, val_len) + 1
        r2xv = probe_lookup(r2x_k, r2x_v, (fid << 44) | x)
        if (r2xv < 0).any():  # a probe miss would silently zero the moment
            raise AssertionError(
                "spearman rank exchange met an (flag, x) pair absent from "
                "the pass-1 fold"
            )
        if key.size * (2 * n_max) ** 2 >= 2**63:
            raise ValueError(
                "lineitem_spearman_by_flag: partition moment exceeds int64 — "
                "emit string-decimal partials per bin instead"
            )
        part = pd.DataFrame(
            {"fid": fid, "rows": 1, "sxy": r2xv * r2y, "syy": r2y * r2y}
        )
        return (
            part.groupby("fid", sort=False)[["rows", "sxy", "syy"]]
            .sum()
            .reset_index()
            .astype("int64")
        )

    parts = hash_partitioned(
        ray.data.read_parquet(path, columns=cols).map_batches(
            lambda b: _binned(b), batch_format="pyarrow", zero_copy_batch=True
        ),
        "key",
        rank_partition,
        coalesce_rows=1 << 20,
    )
    acc: dict[int, list[int]] = {}
    for b in parts.iter_batches(batch_size=65_536, batch_format="pandas"):
        for row in b.itertuples(index=False):
            a = acc.setdefault(int(row.fid), [0, 0, 0])
            a[0] += int(row.rows)
            a[1] += int(row.sxy)
            a[2] += int(row.syy)

    out_flags, out_n, out_rho = [], [], []
    for f in flags:
        fid = flag_id[f]
        n = n_of[fid]
        got = acc.get(fid, [0, 0, 0])
        if got[0] != n:  # a dropped partial would silently corrupt the moment
            raise AssertionError(
                f"spearman rank exchange lost rows for flag {f!r}: "
                f"{got[0]} != {n}"
            )
        sx = n * (n + 1)  # doubled ranks always sum to 2 * n(n+1)/2
        sxy, syy = got[1], got[2]
        dena = n * sxx_of[fid] - sx * sx
        denb = n * syy - sx * sx
        if dena <= 0 or denb <= 0:
            continue  # zero rank variance: correlation undefined, both sides
        rho = float(n * sxy - sx * sx) / math.sqrt(float(dena) * float(denb))
        out_flags.append(f)
        out_n.append(n)
        out_rho.append(int(math.floor(rho * 1e6 + 0.5)))
    return pd.DataFrame(
        {
            "l_returnflag": pd.Series(out_flags, dtype="object"),
            "n": pd.Series(out_n, dtype="int64"),
            "spearman_e6": pd.Series(out_rho, dtype="int64"),
        }
    )


LINEITEM_SPEARMAN_SQL = """
WITH q AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_quantity * 100, 0) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
    AND l_extendedprice IS NOT NULL
),
r AS (
  SELECT flag,
         CAST(2 * rank() OVER (PARTITION BY flag ORDER BY x)
              + count(*) OVER (PARTITION BY flag, x) - 1 AS HUGEINT) AS rx,
         CAST(2 * rank() OVER (PARTITION BY flag ORDER BY y)
              + count(*) OVER (PARTITION BY flag, y) - 1 AS HUGEINT) AS ry
  FROM q
),
s AS (
  SELECT flag, CAST(count(*) AS HUGEINT) AS n,
         sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
         sum(rx) AS sx
  FROM r GROUP BY flag
)
SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(floor(
         CAST(n * sxy - sx * sx AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sx * sx AS DOUBLE))
         * 1e6 + 0.5) AS BIGINT) AS spearman_e6
FROM s
WHERE n * sxx - sx * sx > 0 AND n * syy - sx * sx > 0
"""

register(
    "lineitem_spearman_by_flag", lineitem_spearman_by_flag,
    sql=LINEITEM_SPEARMAN_SQL,
)


# --- exact Kendall tau-b from the contingency table (X157) -----------------------


def lineitem_kendall_qty_line(sf_dir: str) -> "pd.DataFrame":
    """One-row (n, concordant, discordant, tau_b_e6): exact Kendall
    tau-b between quantity and line number — the O(n²)-pair rank
    statistic made scale-free by computing concordance from the BOUNDED
    (quantity-cents × linenumber) contingency table: C and D are sums of
    n_a·n_b over cell pairs with agreeing/opposing orders, so the corpus
    is read once and the quadratic work runs over cells, not rows.

    Exactness: the contingency folds through the bounded enum exchange
    (MAX_ENUM_GROUPS guards quantity-like cardinality); C, D, and the
    tie terms n0/n1/n2 are Python-int exact; tau-b's denominator
    sqrt((n0−n1)(n0−n2)) is ONE shared IEEE chain (two int→double
    casts, multiply, sqrt, divide, floor-e6) — the SQL twin spells the
    identical cell-pair double sum with HUGEINT. Zero rank variance in
    either margin excludes the row on both engines.
    """
    import math

    import pyarrow.compute as pc

    from .exchange import enum_group_sum

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(batch["l_quantity"]), pc.is_valid(batch["l_linenumber"])
        )
        t = batch.filter(keep)
        q2 = pc.cast(
            pc.round(
                pc.multiply(t["l_quantity"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        g = (
            pa.table(
                {
                    "x": q2,
                    "y": pc.cast(t["l_linenumber"], pa.int64()),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by(["x", "y"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["x", "y", "n"])

    fold = enum_group_sum(
        ray.data.read_parquet(
            table_path(sf_dir, "lineitem"), columns=["l_quantity", "l_linenumber"]
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["x", "y"],
        ["n"],
    )
    cols = {
        "n": "int64", "concordant": "int64",
        "discordant": "int64", "tau_b_e6": "int64",
    }
    if len(fold) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    xs = fold["x"].to_numpy(dtype=np.int64)
    ys = fold["y"].to_numpy(dtype=np.int64)
    ns = [int(v) for v in fold["n"]]
    n = sum(ns)
    # cell-pair concordance (cells ~ distinct x × distinct y, bounded)
    C = 0
    D = 0
    for i in range(len(ns)):
        for j in range(i + 1, len(ns)):
            dx = int(xs[i]) - int(xs[j])
            dy = int(ys[i]) - int(ys[j])
            if dx == 0 or dy == 0:
                continue
            if (dx > 0) == (dy > 0):
                C += ns[i] * ns[j]
            else:
                D += ns[i] * ns[j]
    n0 = n * (n - 1) // 2
    tx = pd.Series(ns).groupby(pd.Series(xs)).sum()
    ty = pd.Series(ns).groupby(pd.Series(ys)).sum()
    n1 = sum(int(t) * (int(t) - 1) // 2 for t in tx)
    n2 = sum(int(t) * (int(t) - 1) // 2 for t in ty)
    if n0 == n1 or n0 == n2:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    tau = float(C - D) / math.sqrt(float(n0 - n1) * float(n0 - n2))
    return pd.DataFrame(
        [
            {
                "n": n,
                "concordant": C,
                "discordant": D,
                "tau_b_e6": int(math.floor(tau * 1e6 + 0.5)),
            }
        ]
    ).astype(cols)


LINEITEM_KENDALL_SQL = """
WITH f AS (
  SELECT CAST(round(l_quantity * 100, 0) AS BIGINT) AS x,
         CAST(l_linenumber AS BIGINT) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
),
g AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS n FROM f GROUP BY x, y),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS n FROM g),
cd AS (
  SELECT
    CAST(coalesce(sum(a.n * b.n) FILTER (
      WHERE (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)), 0)
      AS HUGEINT) AS c,
    CAST(coalesce(sum(a.n * b.n) FILTER (
      WHERE (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)), 0)
      AS HUGEINT) AS d
  FROM g a JOIN g b ON (a.x, a.y) < (b.x, b.y)
),
ties AS (
  SELECT
    (SELECT CAST(coalesce(sum(t * (t - 1) / 2), 0) AS HUGEINT)
     FROM (SELECT sum(n) AS t FROM g GROUP BY x)) AS n1,
    (SELECT CAST(coalesce(sum(t * (t - 1) / 2), 0) AS HUGEINT)
     FROM (SELECT sum(n) AS t FROM g GROUP BY y)) AS n2,
    (SELECT n * (n - 1) / 2 FROM tot) AS n0
)
SELECT CAST(tot.n AS BIGINT) AS n,
       CAST(cd.c AS BIGINT) AS concordant,
       CAST(cd.d AS BIGINT) AS discordant,
       CAST(floor(
         CAST(cd.c - cd.d AS DOUBLE)
         / sqrt(CAST(ties.n0 - ties.n1 AS DOUBLE)
                * CAST(ties.n0 - ties.n2 AS DOUBLE))
         * 1e6 + 0.5) AS BIGINT) AS tau_b_e6
FROM cd, ties, tot
WHERE ties.n0 <> ties.n1 AND ties.n0 <> ties.n2
"""

register(
    "lineitem_kendall_qty_line", lineitem_kendall_qty_line,
    sql=LINEITEM_KENDALL_SQL,
)
