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
