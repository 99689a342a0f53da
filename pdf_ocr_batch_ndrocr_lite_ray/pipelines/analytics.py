"""Relational analytics pipelines: partial aggregation, broadcast join, top-k.

The reference's only aggregation is global run counters incremented one file
at a time (``ProcessResult``, app.py:183-189, 2675-2678) — these pipelines
are its scale-correct generalization over the driver test tables, each built
the way a 100 TB job must be:

- **partial (combiner) aggregation**: counts/sums are reduced inside
  ``map_batches`` first, so the groupby exchange moves ≤ #groups × #blocks
  tiny rows instead of every input row. A hot key (skewed group) is
  therefore pre-collapsed per block — the salting story for aggregates.
- **broadcast join**: the small side is ``ray.put`` ONCE and read inside
  each task (never re-shipped per batch, never shuffled) — the reference's
  in-memory lookup pattern (app.py:1652's page map) done cluster-wide.
- **top-k**: per-block partial top-k, then a final k-row reduce — no global
  sort of the full table.

Every query has a DuckDB oracle with identical column names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from .exchange import enum_group_sum
from .queryset import register, table_path


def _rename(ds: "ray.data.Dataset", mapping: dict[str, str]) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


# --- partial aggregation: events by type -----------------------------------

def events_by_type(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, n_events, total_value): combiner-then-reduce aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        # per-block combine: the exchange sees #types rows per block, not
        # #events — this is what keeps a skewed event_type harmless
        g = batch.group_by("event_type").aggregate(
            [("event_id", "count"), ("value", "sum")]
        )
        return g.rename_columns(["event_type", "n_events", "total_value"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # event_type is a bounded enum → fold the tiny partials on the driver
    # (enum_group_sum) instead of a sort-shuffle over a few KB
    g = enum_group_sum(ds, ["event_type"], ["n_events", "total_value"])
    # scaled-integer output: float sums differ across summation orders by
    # ~1 ulp, which breaks string-level value comparison; an integer in
    # 1e-4 units is stable on both engines. Half away from zero matches
    # DuckDB round(); numpy/pyarrow defaults (half-even) would flip the
    # hash on an exact-.5 boundary.
    v = g["total_value"].to_numpy()
    scaled = (np.sign(v) * np.floor(np.abs(v) * 10000.0 + 0.5)).astype(np.int64)
    out = pd.DataFrame(
        {
            "event_type": g["event_type"],
            "n_events": g["n_events"].astype("int64"),
            "total_value_e4": scaled,
        }
    )
    return ray.data.from_pandas(out)


EVENTS_BY_TYPE_SQL = """
SELECT event_type, count(event_id) AS n_events,
       CAST(round(sum(value) * 10000, 0) AS BIGINT) AS total_value_e4
FROM events GROUP BY event_type
"""


# --- broadcast join: orders enriched with customer nation ------------------

def orders_by_nation(sf_dir: str) -> "ray.data.Dataset":
    """(c_nationkey, n_orders, total_price): broadcast-hash-join + aggregate.

    ``customer`` (the small side) is put in the object store once; every
    task reads the same immutable copy. No shuffle of ``orders`` happens at
    all — the join is a map, the aggregate is combined per block.
    """
    import pyarrow.parquet as pq

    from .exchange import broadcast_lookup, int64_array, probe_lookup

    cust = pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    # sorted-key arrays + np.searchsorted beat a per-row dict probe; the
    # broadcast payload is two flat numpy arrays, read once per task
    ref = ray.put(
        broadcast_lookup(int64_array(cust["c_custkey"]), int64_array(cust["c_nationkey"]))
    )

    def join_partial(batch: pa.Table) -> pa.Table:
        skeys, snations = ray.get(ref)
        keys = int64_array(batch["o_custkey"])
        nation_np = probe_lookup(skeys, snations, keys).astype(np.int32)
        joined = pa.table(
            {
                "c_nationkey": pa.array(nation_np, type=pa.int32()),
                "o_orderkey": batch["o_orderkey"],
                "o_totalprice": batch["o_totalprice"],
            }
        ).filter(pa.array(nation_np != -1))  # inner-join: drop dangling orders
        g = joined.group_by("c_nationkey").aggregate(
            [("o_orderkey", "count"), ("o_totalprice", "sum")]
        )
        return g.rename_columns(["c_nationkey", "n_orders", "total_price"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(join_partial, batch_format="pyarrow", zero_copy_batch=True)
    g = enum_group_sum(ds, ["c_nationkey"], ["n_orders", "total_price"])
    v = g["total_price"].to_numpy()
    cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)
    out = pd.DataFrame(
        {
            "c_nationkey": g["c_nationkey"],
            "n_orders": g["n_orders"].astype("int64"),
            "total_price_cents": cents,
        }
    )
    return ray.data.from_pandas(out)


ORDERS_BY_NATION_SQL = """
SELECT c.c_nationkey, count(o.o_orderkey) AS n_orders,
       CAST(round(sum(o.o_totalprice) * 100, 0) AS BIGINT) AS total_price_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
"""


def orders_by_nation_shuffle(sf_dir: str) -> "ray.data.Dataset":
    """Same result as ``orders_by_nation``, built as a SHUFFLE join — the
    documented fallback for when the dimension side outgrows a broadcast
    (at 10^12 rows the customer table is not small). Both sides are tagged
    into ONE union keyed on ``o_custkey``; each hash partition joins with
    pandas and pre-aggregates to per-nation partials, so the second
    exchange carries ≤ #nations × #partitions tiny rows.
    """
    from .dedup import _hash_partitioned

    cust = ray.data.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": pc.cast(batch["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
                "price": pa.nulls(batch.num_rows, type=pa.float64()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        # raw doubles, NOT per-row cents: the oracle rounds the SUM, so a
        # per-row rounding accumulates half-cent bias (caught by the nasty
        # relational parity test: 100.005 + ... diverged by one cent)
        return pa.table(
            {
                "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                "c_nationkey": pa.nulls(batch.num_rows, type=pa.int64()),
                "price": pc.cast(batch["o_totalprice"], pa.float64()),
            }
        )

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def join_and_combine(df: pd.DataFrame) -> pd.DataFrame:
        dim = df[df["price"].isna()]
        lut = dict(zip(dim["o_custkey"], dim["c_nationkey"]))
        fact = df[df["price"].notna()].copy()
        fact["c_nationkey"] = fact["o_custkey"].map(lut)
        fact = fact.dropna(subset=["c_nationkey"])  # inner-join semantics
        g = (
            fact.groupby("c_nationkey", sort=True)
            .agg(n_orders=("price", "size"), total_price=("price", "sum"))
            .reset_index()
        )
        g["c_nationkey"] = g["c_nationkey"].astype("int64")
        g["n_orders"] = g["n_orders"].astype("int64")
        return g

    # final merge of ≤ #nations × #partitions partial rows happens on the
    # driver: a second Ray groupby over 64 tiny blocks costs multiple
    # seconds of pure sort-shuffle task overhead (measured: 8-14 s → ~4 s
    # for the whole query after this change) while the data is a few KB
    partials = _hash_partitioned(both, "o_custkey", join_and_combine).to_pandas()
    g = (
        partials.groupby("c_nationkey", sort=True)
        .agg(n_orders=("n_orders", "sum"), total_price=("total_price", "sum"))
        .reset_index()
    )
    # round the SUM to cents (oracle semantics), nation back to int32
    cents = np.floor(np.abs(g["total_price"].to_numpy()) * 100.0 + 0.5)
    cents = (np.sign(g["total_price"].to_numpy()) * cents).astype(np.int64)
    out = pd.DataFrame(
        {
            "c_nationkey": g["c_nationkey"].astype("int32"),
            "n_orders": g["n_orders"].astype("int64"),
            "total_price_cents": cents,
        }
    )
    return ray.data.from_pandas(out)


# --- top-k without a global sort -------------------------------------------

TOP_PARTS_K = 25


def lineitem_top_parts(sf_dir: str, k: int = TOP_PARTS_K) -> "ray.data.Dataset":
    """Top-k parts by revenue: coalesced partial sums → one hash exchange
    with partition-local top-k → bounded driver merge.

    The full lineitem table never sorts. Measured redesign (sf0.1, 32
    CPUs: 14 s → ~2 s): small read blocks made per-block partials nearly
    useless (each 25k-row block still emitted all 20k partkeys — 600k rows
    in, 478k "partials" out), and ``groupby().aggregate(Sum)`` paid Ray's
    sort-based aggregate over them. Now partials coalesce 256k rows per
    batch (≥ 10× collapse), the exchange is the fast ``hash_partitioned``
    path, and because partitions are group-complete each one emits only its
    local top-k — the driver merges ≤ k × #partitions rows.
    """
    from .exchange import hash_partitioned as _hash_partitioned_x

    def partial(batch: pa.Table) -> pa.Table:
        # per-ROW integer cents, then exact integer sums: float sums depend
        # on summation order and can land a half-cent either side of the
        # rounding boundary (observed: one-cent oracle mismatch at sf0.001)
        # round_mode matches DuckDB's round() (half away from zero);
        # pyarrow's default half-to-even diverges on the exact-.5 cents
        # these price×discount products frequently produce
        revenue = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                    ),
                    pa.scalar(100.0),
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table({"l_partkey": batch["l_partkey"], "revenue_cents": revenue})
        g = t.group_by("l_partkey").aggregate([("revenue_cents", "sum")])
        return g.rename_columns(["l_partkey", "revenue_cents"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=262_144
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        # partition-complete groups → each partition's top-k is a superset
        # filter for the global top-k
        g = df.groupby("l_partkey", sort=False)["revenue_cents"].sum().reset_index()
        return g.sort_values(
            ["revenue_cents", "l_partkey"], ascending=[False, True]
        ).head(k)

    cand = _hash_partitioned_x(ds, "l_partkey", local_topk).to_pandas()
    final = (
        cand.sort_values(["revenue_cents", "l_partkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    final["rank"] = np.arange(1, len(final) + 1, dtype=np.int64)
    return ray.data.from_pandas(final[["rank", "l_partkey", "revenue_cents"]])


LINEITEM_TOP_PARTS_SQL = f"""
WITH agg AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
)
SELECT row_number() OVER (ORDER BY rev DESC, l_partkey) AS rank,
       l_partkey, rev AS revenue_cents
FROM agg ORDER BY rev DESC, l_partkey LIMIT {TOP_PARTS_K}
"""


# --- grouped top-k: top customers per nation --------------------------------

TOP_CUST_K = 3


def top_customers_per_nation(sf_dir: str, k: int = TOP_CUST_K) -> "ray.data.Dataset":
    """Top-k customers by total order value WITHIN each nation:
    (c_nationkey, o_custkey, total_cents, rank).

    Grouped top-k without a global sort: broadcast-join nation onto orders,
    partial per-block (nation, customer) cents sums, one exchange keyed on
    ``o_custkey`` to complete the per-customer sums (a customer maps to one
    nation, so the finer key is partition-complete for both), then a second
    tiny exchange keyed on ``c_nationkey`` over ≤ #customers rows picks each
    nation's top k. Skewed nations cost one partition of customer-level
    rows, never the order rows themselves.
    """
    import pyarrow.parquet as pq

    from .dedup import _hash_partitioned
    from .exchange import broadcast_lookup, int64_array, probe_lookup

    cust = pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    ref = ray.put(
        broadcast_lookup(int64_array(cust["c_custkey"]), int64_array(cust["c_nationkey"]))
    )

    def join_partial(batch: pa.Table) -> pa.Table:
        skeys, snations = ray.get(ref)
        keys = int64_array(batch["o_custkey"])
        nation_np = probe_lookup(skeys, snations, keys)
        hit = nation_np != -1
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["o_totalprice"], 100.0),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "c_nationkey": pa.array(nation_np.astype(np.int64)),
                "o_custkey": pa.array(keys, type=pa.int64()),
                "cents": cents,
            }
        ).filter(pa.array(hit))  # inner-join semantics, matching the oracle
        g = t.group_by(["c_nationkey", "o_custkey"]).aggregate([("cents", "sum")])
        return g.rename_columns(["c_nationkey", "o_custkey", "cents"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(join_partial, batch_format="pyarrow", zero_copy_batch=True)

    def sum_per_customer(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["c_nationkey", "o_custkey"], sort=True)["cents"]
            .sum()
            .reset_index(name="total_cents")
        )
        g["total_cents"] = g["total_cents"].astype("int64")
        return g

    per_cust = _hash_partitioned(ds, "o_custkey", sum_per_customer)

    def topk_per_nation(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["c_nationkey", "total_cents", "o_custkey"],
            ascending=[True, False, True],
        )
        df = df.groupby("c_nationkey", sort=True).head(k).reset_index(drop=True)
        df["rank"] = df.groupby("c_nationkey").cumcount().astype("int64") + 1
        return df[["c_nationkey", "o_custkey", "total_cents", "rank"]]

    return _hash_partitioned(per_cust, "c_nationkey", topk_per_nation)


TOP_CUSTOMERS_PER_NATION_SQL = f"""
WITH j AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
agg AS (
  SELECT c_nationkey, o_custkey, CAST(sum(cents) AS BIGINT) AS total_cents
  FROM j GROUP BY 1, 2
)
SELECT c_nationkey, o_custkey, total_cents,
       row_number() OVER (
         PARTITION BY c_nationkey ORDER BY total_cents DESC, o_custkey
       ) AS rank
FROM agg
QUALIFY rank <= {TOP_CUST_K}
"""


# --- anti join: customers with no orders ------------------------------------

BIG_ORDER_PRICE_MIN = 300_000.0  # o_totalprice (currency units) threshold for the anti join

#: broadcast ceiling for the anti-join key set: ~400 MB of int64 on every
#: worker. Past it the pipeline AUTO-SWITCHES to the shuffle shape below
#: instead of materializing an unbounded array on the driver.
MAX_BROADCAST_KEYS = 50_000_000


def _customers_without_orders_shuffle(sf_dir: str) -> "ray.data.Dataset":
    """Shuffle-shape anti join (the past-the-broadcast-ceiling path): tag
    both sides, union, hash-partition on the key, and drop customers whose
    partition holds an order row with their key — one exchange, nothing on
    the driver, same rows as the broadcast path."""
    import pandas as pd

    from .exchange import hash_partitioned as _hash_partitioned

    def order_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["o_totalprice"], BIG_ORDER_PRICE_MIN))
        k = t.select(["o_custkey"]).group_by("o_custkey").aggregate([])
        n = k.num_rows
        return pa.table(
            {
                "key": k["o_custkey"],
                "c_nationkey": pa.array([-1] * n, type=pa.int64()),
                "is_order": pa.array([True] * n, type=pa.bool_()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["c_custkey"],
                "c_nationkey": batch["c_nationkey"].cast(pa.int64()),
                "is_order": pa.array([False] * batch.num_rows, type=pa.bool_()),
            }
        )

    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    custs = ray.data.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_side, batch_format="pyarrow", zero_copy_batch=True)

    def anti_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        have = set(df.loc[df["is_order"], "key"])
        out = df[~df["is_order"] & ~df["key"].isin(have)]
        return pd.DataFrame(
            {
                "c_custkey": out["key"].astype("int64").to_numpy(),
                "c_nationkey": out["c_nationkey"].astype("int64").to_numpy(),
            }
        )

    return _hash_partitioned(orders.union(custs), "key", anti_partition)


def customers_without_orders(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "ray.data.Dataset":
    """(c_custkey, c_nationkey) for customers with no BIG order (totalprice
    above the threshold) — the ANTI join. The probe side is pruned at the
    read (row filter) and reduced to a distinct-key set (per-block dedup,
    then one groupby over unique keys only), which is broadcast and
    checked with a vectorized ``np.isin``; the customer table streams and
    never shuffles. The key-set collection is CAPPED: past
    ``max_broadcast_keys`` it abandons the broadcast and reroutes to the
    union + hash-partition shuffle shape — never an unbounded driver
    materialization.
    """
    from ray.data.aggregate import Count as _Count

    from .exchange import int64_array

    def big_keys(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["o_totalprice"], BIG_ORDER_PRICE_MIN))
        return t.select(["o_custkey"]).group_by("o_custkey").aggregate([])

    keys = (
        ray.data.read_parquet(
            table_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(big_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(_Count())
    )
    key_arrays = []
    total = 0
    for b in keys.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            key_arrays.append(int64_array(b["o_custkey"]))
            total += b.num_rows
            if total > max_broadcast_keys:
                return _customers_without_orders_shuffle(sf_dir)
    have_orders = np.sort(np.concatenate(key_arrays)) if key_arrays else np.array([], dtype=np.int64)
    ref = ray.put(have_orders)

    def anti(batch: pa.Table) -> pa.Table:
        probe = ray.get(ref)
        ck = int64_array(batch["c_custkey"])
        keep = ~np.isin(ck, probe)
        return batch.filter(pa.array(keep)).select(["c_custkey", "c_nationkey"])

    return ray.data.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


CUSTOMERS_WITHOUT_ORDERS_SQL = f"""
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {BIG_ORDER_PRICE_MIN}
)
"""


register("events_by_type", events_by_type, sql=EVENTS_BY_TYPE_SQL)
register(
    "customers_without_orders",
    customers_without_orders,
    sql=CUSTOMERS_WITHOUT_ORDERS_SQL,
)
register("orders_by_nation", orders_by_nation, sql=ORDERS_BY_NATION_SQL)
register("orders_by_nation_shuffle", orders_by_nation_shuffle, sql=ORDERS_BY_NATION_SQL)
register("lineitem_top_parts", lineitem_top_parts, sql=LINEITEM_TOP_PARTS_SQL)
register(
    "top_customers_per_nation",
    top_customers_per_nation,
    sql=TOP_CUSTOMERS_PER_NATION_SQL,
)


# --- LEFT join with zero-extension: per-customer order counts ---------------

def customer_order_counts(sf_dir: str) -> "ray.data.Dataset":
    """(c_custkey, n_orders): every customer with their order count,
    INCLUDING order-less customers at 0 — the left-outer-join primitive.

    Shape is the union + co-partition merge (no broadcast, no driver
    key set, both sides arbitrarily large): the customer side emits
    (key, 0) seed rows, the orders side emits per-block partial counts,
    ONE hash exchange co-locates each key's rows, and the partition sums —
    a seed row guarantees presence, so customers with no orders surface
    with exactly 0, and a key is emitted ONLY if a seed row reached it, so
    orphan orders (o_custkey absent from customer — impossible under
    TPC-H FK integrity but legal input) are dropped exactly like the SQL
    LEFT JOIN drops them. Each exchanged row is 16 bytes regardless of
    table width.
    """
    from .exchange import hash_partitioned

    cust = ray.data.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_custkey"]
    )
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey"]
    )

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].cast(pa.int64()),
                "n": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["o_custkey"])
        return pa.table(
            {
                "c_custkey": vc.field("values").cast(pa.int64()),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    both = cust.map_batches(seed, batch_format="pyarrow").union(
        orders.map_batches(partial, batch_format="pyarrow")
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "c_custkey": pd.Series(dtype="int64"),
                    "n_orders": pd.Series(dtype="int64"),
                }
            )
        g = df.groupby("c_custkey", sort=True)["n"].agg(["sum", "min"]).reset_index()
        # LEFT-join semantics: only seeded keys (a customer seed carries
        # n == 0; order partials are ≥ 1) — orphan orders never emit
        g = g[g["min"] == 0]
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].astype("int64").to_numpy(),
                "n_orders": g["sum"].astype("int64").to_numpy(),
            }
        )

    return hash_partitioned(both, "c_custkey", merge)


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""

register("customer_order_counts", customer_order_counts, sql=CUSTOMER_ORDER_COUNTS_SQL)


# --- semi join: orders whose customer is in a market segment ------------------

SEMI_SEGMENT = "BUILDING"


def _orders_in_segment_shuffle(sf_dir: str) -> "ray.data.Dataset":
    """Shuffle-shape semi join (past-the-broadcast-ceiling path): tag both
    sides, union, hash-partition on the customer key, keep order rows whose
    partition holds a segment-customer row — the mirror image of the
    anti-join fallback."""
    import pandas as pd

    from .exchange import hash_partitioned as _hash_partitioned

    def cust_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["c_mktsegment"], SEMI_SEGMENT))
        n = t.num_rows
        return pa.table(
            {
                "key": t["c_custkey"],
                "o_orderkey": pa.array([-1] * n, type=pa.int64()),
                "o_totalprice": pa.array([0.0] * n, type=pa.float64()),
                "is_cust": pa.array([True] * n, type=pa.bool_()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_totalprice": batch["o_totalprice"],
                "is_cust": pa.array([False] * batch.num_rows, type=pa.bool_()),
            }
        )

    custs = ray.data.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)

    def semi_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        have = set(df.loc[df["is_cust"], "key"])
        out = df[~df["is_cust"] & df["key"].isin(have)]
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].astype("int64").to_numpy(),
                "o_custkey": out["key"].astype("int64").to_numpy(),
                "o_totalprice": out["o_totalprice"].astype("float64").to_numpy(),
            }
        )

    return _hash_partitioned(custs.union(orders), "key", semi_partition)


def _segment_keys_or_none(sf_dir: str, max_broadcast_keys: int):
    """Distinct segment-customer keys as a sorted int64 array, or ``None``
    once the count crosses the broadcast ceiling — THE one copy of the
    capped key-set collection shared by the semi join and the Q3 plan
    (each reroutes to its own co-partition shape on ``None``)."""
    from ray.data.aggregate import Count as _Count

    from .exchange import int64_array

    def seg_keys(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["c_mktsegment"], SEMI_SEGMENT))
        return t.select(["c_custkey"]).group_by("c_custkey").aggregate([])

    keys = (
        ray.data.read_parquet(
            table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
        )
        .map_batches(seg_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_custkey")
        .aggregate(_Count())
    )
    key_arrays = []
    total = 0
    for b in keys.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            key_arrays.append(int64_array(b["c_custkey"]))
            total += b.num_rows
            if total > max_broadcast_keys:
                return None
    return (
        np.sort(np.concatenate(key_arrays))
        if key_arrays
        else np.array([], dtype=np.int64)
    )


def orders_in_segment(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "ray.data.Dataset":
    """(o_orderkey, o_custkey, o_totalprice) for orders placed by a
    customer in the target market segment — the SEMI join (EXISTS),
    completing the join family next to the broadcast/shuffle inner,
    anti, and left-outer shapes.

    The filter side reduces to a distinct key set at the read (segment
    predicate + per-block dedup), broadcasts once via ``ray.put``, and
    the fact table streams through a vectorized ``np.isin`` probe —
    no shuffle of order rows. Same ceiling discipline as the anti join:
    past ``max_broadcast_keys`` it reroutes to the union + co-partition
    shuffle shape instead of materializing an unbounded key set.
    """
    from .exchange import int64_array

    seg = _segment_keys_or_none(sf_dir, max_broadcast_keys)
    if seg is None:
        return _orders_in_segment_shuffle(sf_dir)
    ref = ray.put(seg)

    def semi(batch: pa.Table) -> pa.Table:
        probe = ray.get(ref)
        ok = int64_array(batch["o_custkey"])
        keep = np.isin(ok, probe)
        return batch.filter(pa.array(keep)).select(
            ["o_orderkey", "o_custkey", "o_totalprice"]
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)


ORDERS_IN_SEGMENT_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
WHERE EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = '{SEMI_SEGMENT}'
)
"""

register("orders_in_segment", orders_in_segment, sql=ORDERS_IN_SEGMENT_SQL)


# --- three-table join: TPC-H Q3 shape (segment x date x date, top-k) ---------

Q3_CUTOFF = "1998-01-01"
Q3_TOPK = 10


def tpch_q3_topk(
    sf_dir: str,
    k: int = Q3_TOPK,
    max_broadcast_keys: int = MAX_BROADCAST_KEYS,
) -> "ray.data.Dataset":
    """(o_orderkey, revenue_e2, o_orderdate_us): the classic shipping-
    priority query — revenue of not-yet-shipped lineitems for orders
    placed by segment customers before the cutoff — exercising the
    composed join plan a reporting pipeline actually runs: broadcast
    semi-filter (customer), date-pruned fact reads, per-block partial
    aggregation, ONE co-partition exchange joining the two fact sides,
    and a mergeable top-k fold.

    Plan shape: the customer side collapses to a broadcast key set via
    the shared capped collector (``_segment_keys_or_none``); past the
    ceiling it reroutes to a custkey co-partition semi exchange feeding
    the same orderkey join — never an unbounded driver key set. Orders
    and lineitem are pruned
    at the read (columns + date row filter) and never shuffle raw — the
    lineitem side exchanges per-block (orderkey, cents) partials, the
    orders side (orderkey, date) stubs; each hash partition inner-joins
    its complete key groups and emits only its local top-k. Revenue is
    summed as integer cents (per-row half-away rounding, the
    ``lineitem_top_parts`` contract) so totals are order-independent.
    """
    import datetime as _dt

    from .exchange import driver_topk_fold, int64_array
    from .exchange import hash_partitioned as _hash_partitioned_x

    cutoff = _dt.datetime.fromisoformat(Q3_CUTOFF)

    def tag_orders(t: pa.Table) -> pa.Table:
        odate_us = t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "key": t["o_orderkey"],
                "odate_us": odate_us,
                "cents": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "is_order": pa.array([True] * t.num_rows, type=pa.bool_()),
            }
        )

    seg = _segment_keys_or_none(sf_dir, max_broadcast_keys)
    if seg is None:
        # past the ceiling: semi-filter orders by a custkey co-partition
        # exchange instead of a driver-held key set (second exchange, zero
        # driver state) — then the orderkey exchange below is unchanged
        def cust_rows(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["c_mktsegment"], SEMI_SEGMENT))
            return pa.table(
                {
                    "ckey": t["c_custkey"],
                    "o_orderkey": pa.array([-1] * t.num_rows, type=pa.int64()),
                    "odate_us": pa.array([-1] * t.num_rows, type=pa.int64()),
                    "is_cust": pa.array([True] * t.num_rows, type=pa.bool_()),
                }
            )

        def order_rows(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.less(batch["o_orderdate"], pa.scalar(cutoff)))
            odate_us = t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            return pa.table(
                {
                    "ckey": t["o_custkey"],
                    "o_orderkey": t["o_orderkey"],
                    "odate_us": odate_us,
                    "is_cust": pa.array([False] * t.num_rows, type=pa.bool_()),
                }
            )

        def semi_partition(df: "pd.DataFrame") -> "pd.DataFrame":
            have = set(df.loc[df["is_cust"], "ckey"])
            out = df[~df["is_cust"] & df["ckey"].isin(have)]
            return pd.DataFrame(
                {
                    "key": out["o_orderkey"].astype("int64").to_numpy(),
                    "odate_us": out["odate_us"].astype("int64").to_numpy(),
                    "cents": np.zeros(len(out), dtype=np.int64),
                    "is_order": np.ones(len(out), dtype=bool),
                }
            )

        custs = ray.data.read_parquet(
            table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
        ).map_batches(cust_rows, batch_format="pyarrow", zero_copy_batch=True)
        ords = ray.data.read_parquet(
            table_path(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
        orders = _hash_partitioned_x(custs.union(ords), "ckey", semi_partition)
    else:
        ref = ray.put(seg)

        def order_side(batch: pa.Table) -> pa.Table:
            probe = ray.get(ref)
            batch = batch.filter(pc.less(batch["o_orderdate"], pa.scalar(cutoff)))
            keep = np.isin(int64_array(batch["o_custkey"]), probe)
            return tag_orders(batch.filter(pa.array(keep)))

        orders = ray.data.read_parquet(
            table_path(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)

    def line_side(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], pa.scalar(cutoff)))
        revenue = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                    ),
                    pa.scalar(100.0),
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table({"key": batch["l_orderkey"], "cents": revenue})
        g = t.group_by("key").aggregate([("cents", "sum")])
        n = g.num_rows
        return pa.table(
            {
                "key": g["key"],
                "odate_us": pa.array(np.full(n, -1, dtype=np.int64)),
                "cents": g["cents_sum"],
                "is_order": pa.array([False] * n, type=pa.bool_()),
            }
        )

    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        line_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=262_144
    )

    def join_topk(df: pd.DataFrame) -> pd.DataFrame:
        ords = df[df["is_order"]].drop_duplicates("key").set_index("key")["odate_us"]
        lins = df[~df["is_order"]].groupby("key", sort=False)["cents"].sum()
        both = lins.index.intersection(ords.index)
        out = pd.DataFrame(
            {
                "o_orderkey": both.to_numpy(dtype=np.int64),
                "revenue_e2": lins.loc[both].to_numpy(dtype=np.int64),
                "o_orderdate_us": ords.loc[both].to_numpy(dtype=np.int64),
            }
        )
        return out.sort_values(
            ["revenue_e2", "o_orderkey"], ascending=[False, True]
        ).head(k)

    cand = _hash_partitioned_x(orders.union(lines), "key", join_topk)
    top = driver_topk_fold(
        cand, by=["revenue_e2", "o_orderkey"], ascending=[False, True], k=k
    )
    if top is None:
        top = pd.DataFrame(
            {
                "o_orderkey": pd.Series(dtype="int64"),
                "revenue_e2": pd.Series(dtype="int64"),
                "o_orderdate_us": pd.Series(dtype="int64"),
            }
        )
    return ray.data.from_pandas(
        top[["o_orderkey", "revenue_e2", "o_orderdate_us"]].reset_index(drop=True)
    )


TPCH_Q3_SQL = f"""
SELECT o.o_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_e2,
       epoch_us(o.o_orderdate) AS o_orderdate_us
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{SEMI_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue_e2 DESC, o.o_orderkey
LIMIT {Q3_TOPK}
"""

register("tpch_q3_topk", tpch_q3_topk, sql=TPCH_Q3_SQL)


# --- full outer join: customers x order counts --------------------------------


def customer_order_full_outer(sf_dir: str) -> "ray.data.Dataset":
    """(custkey, c_nationkey, n_orders): FULL OUTER join of the customer
    table against per-customer order counts — completing the join family
    (inner broadcast/shuffle, anti, semi, left outer): customers with no
    orders surface with 0, and orphan orders (custkey with no customer
    row — impossible under TPC-H FK integrity but legal input) surface
    with the -1 nation sentinel instead of being dropped the way the
    LEFT join's seed-row rule drops them.

    Same union + co-partition shape as ``customer_order_counts``: the
    customer side ships (key, nation, 0) seed rows, the orders side ships
    per-block partial counts, ONE hash exchange, and each partition emits
    every key it saw — neither side is required to be present, which is
    exactly the full-outer contract.
    """
    from .exchange import hash_partitioned as _hash_partitioned_x

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["c_custkey"],
                "nat": batch["c_nationkey"].cast(pa.int64()),
                "n": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                "is_cust": pa.array([True] * batch.num_rows, type=pa.bool_()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        g = batch.select(["o_custkey"]).group_by("o_custkey").aggregate(
            [([], "count_all")]
        )
        n = g.num_rows
        return pa.table(
            {
                "key": g["o_custkey"],
                "nat": pa.array(np.full(n, -1, dtype=np.int64)),
                "n": g["count_all"].cast(pa.int64()),
                "is_cust": pa.array([False] * n, type=pa.bool_()),
            }
        )

    custs = ray.data.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key", sort=True)
        # order-side rows carry the -1 sentinel, real nation keys are >= 0,
        # so a plain max picks the customer row's nation when one exists —
        # no per-group Python
        nat = g["nat"].max()
        n = g["n"].sum()
        return pd.DataFrame(
            {
                "custkey": nat.index.to_numpy(dtype=np.int64),
                "c_nationkey": nat.to_numpy(dtype=np.int64),
                "n_orders": n.to_numpy(dtype=np.int64),
            }
        )

    return _hash_partitioned_x(custs.union(orders), "key", merge)


CUSTOMER_ORDER_FULL_OUTER_SQL = """
WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey
)
SELECT coalesce(c.c_custkey, oc.o_custkey) AS custkey,
       CAST(coalesce(c.c_nationkey, -1) AS BIGINT) AS c_nationkey,
       CAST(coalesce(oc.n, 0) AS BIGINT) AS n_orders
FROM customer c FULL OUTER JOIN oc ON c.c_custkey = oc.o_custkey
"""

register(
    "customer_order_full_outer",
    customer_order_full_outer,
    sql=CUSTOMER_ORDER_FULL_OUTER_SQL,
)


# --- star join: TPC-H Q5 shape (region -> nation -> cust/supp, local volume) --

Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def tpch_q5_local_volume(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "ray.data.Dataset":
    """(n_name, revenue_e2): revenue from orders placed in a date window
    by customers of one region, counting only lineitems supplied from the
    CUSTOMER'S OWN nation — the local-supplier-volume star join, the
    classic multi-broadcast plan.

    Plan shape: the three dimension sides are broadcast maps
    (region→nation set: ≤ 25 rows; supplier→nation and customer→nation:
    key→int maps under the same ``MAX_BROADCAST_KEYS`` ceiling as the
    other joins — ENFORCED below from parquet metadata before either
    table is read, so past-ceiling inputs fail loud instead of silently
    accumulating unbounded driver state; at true scale the fix is a
    custkey co-partition exactly like Q3's fallback). The two fact tables
    never shuffle raw: orders emits (okey, cust_nation) stubs, lineitem
    emits per-block (okey, supp_nation, cents) partials, ONE co-partition
    exchange on the order key joins them, and the nation equality is
    applied in-partition before a bounded per-nation fold.
    """
    import datetime as _dt

    import pyarrow.parquet as _pq

    from .exchange import broadcast_lookup, int64_array, probe_lookup
    from .exchange import enum_group_sum
    from .exchange import hash_partitioned as _hash_partitioned_x

    lo = _dt.datetime.fromisoformat(Q5_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q5_DATE_HI)

    # broadcast-ceiling check BEFORE reading either dimension table: the
    # row count comes from parquet footers, so an over-ceiling input costs
    # O(metadata) and raises an actionable error, not an OOM
    for tbl in ("supplier", "customer"):
        n_rows = _pq.ParquetFile(table_path(sf_dir, tbl)).metadata.num_rows
        if n_rows > max_broadcast_keys:
            raise ValueError(
                f"tpch_q5_local_volume: {tbl} has {n_rows:,} rows, past the "
                f"broadcast ceiling ({max_broadcast_keys:,}); reroute the "
                f"{tbl}→nation lookup through a custkey co-partition "
                "exchange (the tpch_q3_topk fallback shape) instead of a "
                "driver-side broadcast map"
            )

    # dimension broadcasts (driver-side smalls: region 5, nation 25 rows)
    nat = _pq.read_table(
        table_path(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = _pq.read_table(table_path(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    region_keys = {
        int(k)
        for k, name in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
        if name == Q5_REGION
    }
    nation_name = {
        int(k): n
        for k, n, rk in zip(
            nat["n_nationkey"].to_pylist(),
            nat["n_name"].to_pylist(),
            nat["n_regionkey"].to_pylist(),
        )
        if int(rk) in region_keys
    }
    in_region = np.fromiter(sorted(nation_name), dtype=np.int64, count=len(nation_name))

    sup = _pq.read_table(
        table_path(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    s_keys, s_nats = broadcast_lookup(
        sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    cust = _pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    c_keys, c_nats = broadcast_lookup(
        cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    ref = ray.put((s_keys, s_nats, c_keys, c_nats, in_region))

    def order_side(batch: pa.Table) -> pa.Table:
        sk, sn, ck, cn, reg_n = ray.get(ref)
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        t = batch.filter(m)
        cnat = probe_lookup(ck, cn, int64_array(t["o_custkey"]), missing=-1)
        keep = np.isin(cnat, reg_n)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "key": t["o_orderkey"],
                "nat": pa.array(cnat[keep]),
                "cents": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "is_order": pa.array([True] * t.num_rows, type=pa.bool_()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        sk, sn, ck, cn, reg_n = ray.get(ref)
        snat = probe_lookup(sk, sn, int64_array(batch["l_suppkey"]), missing=-1)
        keep = np.isin(snat, reg_n)  # non-region suppliers can never match
        t = batch.filter(pa.array(keep))
        revenue = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(100.0),
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        g = (
            pa.table(
                {"key": t["l_orderkey"], "nat": pa.array(snat[keep]), "cents": revenue}
            )
            .group_by(["key", "nat"])
            .aggregate([("cents", "sum")])
        )
        n = g.num_rows
        return pa.table(
            {
                "key": g["key"],
                "nat": g["nat"],
                "cents": g["cents_sum"],
                "is_order": pa.array([False] * n, type=pa.bool_()),
            }
        )

    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        line_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=262_144
    )

    def local_join(df: pd.DataFrame) -> pd.DataFrame:
        ords = df[df["is_order"]].drop_duplicates("key").set_index("key")["nat"]
        lins = df[~df["is_order"]]
        cn = lins["key"].map(ords)  # customer nation of the line's order
        hit = lins[cn.notna() & (cn == lins["nat"])]
        g = hit.groupby("nat", sort=False)["cents"].sum().reset_index()
        g["cents"] = g["cents"].astype("int64")
        return g.rename(columns={"nat": "nationkey", "cents": "revenue_e2"})

    partials = _hash_partitioned_x(orders.union(lines), "key", local_join)
    folded = enum_group_sum(partials, ["nationkey"], ["revenue_e2"])
    folded["n_name"] = folded["nationkey"].map(nation_name)
    out = folded[["n_name", "revenue_e2"]].sort_values("n_name").reset_index(drop=True)
    return ray.data.from_pandas(out)


TPCH_Q5_SQL = f"""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_e2
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
             AND s.s_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o.o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
GROUP BY n.n_name
"""

register("tpch_q5_local_volume", tpch_q5_local_volume, sql=TPCH_Q5_SQL)


# --- reducible non-equi semi-join: late-shipment order priorities -----------

#: an order is "late-shipped" when ANY of its line items shipped more than
#: this many days after the order date (TPC-H Q4's EXISTS shape, adapted to
#: this schema's columns)
LATE_SHIP_DAYS = 60
_LATE_SHIP_US = LATE_SHIP_DAYS * 86_400 * 1_000_000


def orders_late_shipment_priority(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderpriority, n_late): orders with at least one line item shipped
    more than ``LATE_SHIP_DAYS`` after the order date, counted by priority —
    an EXISTS semi-join whose predicate is an INEQUALITY across the two
    tables (TPC-H Q4's shape; reference has no joins at all, SURVEY §2.6).

    The non-equi predicate is MONOTONE in the fact column (`exists shipdate
    > threshold` ⇔ `max(shipdate) > threshold`), so the fact side reduces
    to one (orderkey, max_shipdate) partial per key per block BEFORE the
    exchange — the shuffle carries per-key partials, never line items. One
    co-partition on the order key evaluates the inequality in-partition and
    emits bounded per-priority count partials; neither side is broadcast,
    so the plan is fact-to-fact safe at any scale.
    """
    from .exchange import hash_partitioned as _hpx

    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def line_side(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        n = g.num_rows
        return pa.table(
            {
                "key": g["l_orderkey"].cast(pa.int64()),
                "ship_max_us": g["l_shipdate_max"].cast(pa.int64()),
                "odate_us": pa.nulls(n, type=pa.int64()),
                "prio": pa.nulls(n, type=pa.string()),
                "is_fact": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["o_orderkey"].cast(pa.int64()),
                "ship_max_us": pa.nulls(n, type=pa.int64()),
                "odate_us": batch["o_orderdate"].cast(pa.int64()),
                "prio": batch["o_orderpriority"],
                "is_fact": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    both = lines.map_batches(
        line_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    )

    def late_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_orderpriority": pd.Series([], dtype="object"),
                "n_late": pd.Series([], dtype="int64"),
            }
        )
        if len(df) == 0:
            return empty
        fact = df[df["is_fact"]]
        dims = df[~df["is_fact"]]
        if len(fact) == 0 or len(dims) == 0:
            return empty
        smax = fact.groupby("key", sort=False)["ship_max_us"].max()
        m = dims.merge(smax.rename("smax"), left_on="key", right_index=True, how="inner")
        # SQL NULL semantics: a NULL o_orderdate (or a key whose every
        # shipdate is NULL, so max is NULL) makes the EXISTS predicate
        # NULL → the order is NOT counted. Drop those rows BEFORE the
        # int64 cast — casting NaN would silently produce INT64_MIN and
        # count the order as late.
        m = m.dropna(subset=["smax", "odate_us"])
        late = m[m["smax"].to_numpy(dtype=np.int64)
                 > m["odate_us"].to_numpy(dtype=np.int64) + _LATE_SHIP_US]
        g = late.groupby("prio", sort=False).size().rename("n_late").reset_index()
        g["n_late"] = g["n_late"].astype("int64")
        return g.rename(columns={"prio": "o_orderpriority"})

    partials = _hpx(both, "key", late_partition)
    return ray.data.from_pandas(
        enum_group_sum(partials, ["o_orderpriority"], ["n_late"])
    )


ORDERS_LATE_SHIPMENT_SQL = f"""
SELECT o_orderpriority, count(*) AS n_late
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
)
GROUP BY 1
"""

register(
    "orders_late_shipment_priority",
    orders_late_shipment_priority,
    sql=ORDERS_LATE_SHIPMENT_SQL,
)


# --- supplier revenue Pareto point (X150) ---------------------------------------

PARETO_BINS = 4096
#: Pareto threshold as an exact rational: num/den of revenue share
PARETO_NUM, PARETO_DEN = 4, 5  # 80%


def supplier_pareto(sf_dir: str) -> "pd.DataFrame":
    """One-row (n_suppliers, n_top, top_share_e6, threshold_rev_e2): the
    smallest set of suppliers covering ≥ 80% of lineitem revenue under
    the deterministic (revenue DESC, suppkey ASC) order — the 80/20
    concentration readout (is the supply chain a long tail or three
    vendors?) — WITHOUT a global sort.

    Exactness: revenue folds to integer cents per supplier (one suppkey
    co-partition exchange with in-block pre-aggregation); the 80%
    crossing uses the exact rational test ``5·cum ≥ 4·T`` (no float
    until the final share readout). The crossing is located by a
    descending scan over a bounded (bin, count, sum) fold, then ONE
    targeted filter pass resolves the crossing bin's suppliers exactly
    (sorted desc with suppkey tie-break). ``top_share_e6`` is one
    shared IEEE division.

    Scale shape: per-supplier revenue materializes once (#suppliers
    rows — dimension-sized, documented); the bin fold is ≤ 4096 rows;
    only the crossing bin's suppliers (cap: the skew of one bin) reach
    the driver sort.
    """
    import numpy as np

    from .exchange import enum_group_sum, hash_partitioned

    def line_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(batch["l_suppkey"]), pc.is_valid(batch["l_extendedprice"])
        )
        t = batch.filter(keep)
        cents = pc.cast(
            pc.round(
                pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        g = (
            pa.table({"supp": t["l_suppkey"], "rev": cents})
            .group_by(["supp"])
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["supp", "rev"])

    def supp_fold(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return pd.DataFrame(
                {"supp": pd.Series(dtype="int64"), "rev": pd.Series(dtype="int64")}
            )
        return (
            df.groupby("supp", sort=False)["rev"].sum().reset_index().astype("int64")
        )

    per_supplier = hash_partitioned(
        ray.data.read_parquet(
            table_path(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice"]
        ).map_batches(line_partial, batch_format="pyarrow", zero_copy_batch=True),
        "supp",
        supp_fold,
    ).materialize()  # dimension-sized: one row per supplier

    cols = {
        "n_suppliers": "int64", "n_top": "int64",
        "top_share_e6": "int64", "threshold_rev_e2": "int64",
    }
    from ray.data.aggregate import Count, Max, Min, Sum

    agg = per_supplier.aggregate(
        Count(), Min("rev"), Max("rev"), Sum("rev")
    )
    if agg is None or agg.get("count()") in (None, 0):
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    n_sup = int(agg["count()"])
    lo, hi = int(agg["min(rev)"]), int(agg["max(rev)"])
    T = int(agg["sum(rev)"])
    if T <= 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    span = hi - lo

    def to_bin(rev: np.ndarray) -> np.ndarray:
        if span <= 0:
            return np.zeros(rev.size, dtype=np.int64)
        return np.clip(
            (rev - lo) * PARETO_BINS // max(span, 1), 0, PARETO_BINS - 1
        )

    def bin_partial(batch: pa.Table) -> pa.Table:
        rev = batch["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = to_bin(rev)
        df = pd.DataFrame({"bin": b, "n": 1, "s": rev}).groupby(
            "bin", sort=False
        ).agg(n=("n", "sum"), s=("s", "sum")).reset_index()
        return pa.table(
            {
                "bin": pa.array(df["bin"].to_numpy(dtype=np.int64)),
                "n": pa.array(df["n"].to_numpy(dtype=np.int64)),
                "s": pa.array(df["s"].to_numpy(dtype=np.int64)),
            }
        )

    bins = enum_group_sum(
        per_supplier.map_batches(bin_partial, batch_format="pyarrow"),
        ["bin"],
        ["n", "s"],
    ).sort_values("bin", ascending=False)
    # descending scan: find the bin where 5·cum first reaches 4·T
    cum_n = 0
    cum_s = 0
    cross_bin = None
    for _, row in bins.iterrows():
        if PARETO_DEN * (cum_s + int(row["s"])) >= PARETO_NUM * T:
            cross_bin = int(row["bin"])
            break
        cum_n += int(row["n"])
        cum_s += int(row["s"])
    # resolve the crossing bin exactly: only ITS suppliers leave the cluster
    def in_cross(batch: pa.Table) -> pa.Table:
        rev = batch["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = to_bin(rev) == cross_bin
        return batch.filter(pa.array(m))

    members = (
        per_supplier.map_batches(in_cross, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rev", "supp"], ascending=[False, True])
        .reset_index(drop=True)
    )
    n_top, share = cum_n, cum_s
    thresh = None
    for rev, _supp in zip(members["rev"], members["supp"]):
        n_top += 1
        share += int(rev)
        thresh = int(rev)
        if PARETO_DEN * share >= PARETO_NUM * T:
            break
    return pd.DataFrame(
        [
            {
                "n_suppliers": n_sup,
                "n_top": n_top,
                "top_share_e6": int(
                    np.floor(float(share) / float(T) * 1e6 + 0.5)
                ),
                "threshold_rev_e2": thresh,
            }
        ]
    ).astype(cols)


SUPPLIER_PARETO_SQL = f"""
WITH r AS (
  SELECT l_suppkey AS supp,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY l_suppkey
),
t AS (SELECT CAST(sum(rev) AS HUGEINT) AS tot, count(*) AS n_sup FROM r),
c AS (
  SELECT supp, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, supp ASC
              ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum,
         row_number() OVER (ORDER BY rev DESC, supp ASC) AS k
  FROM r
),
pick AS (
  SELECT k, cum, rev FROM c, t
  WHERE {PARETO_DEN} * cum >= {PARETO_NUM} * t.tot
  ORDER BY k ASC LIMIT 1
)
SELECT CAST(t.n_sup AS BIGINT) AS n_suppliers,
       CAST(pick.k AS BIGINT) AS n_top,
       CAST(floor(CAST(pick.cum AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1e6
                  + 0.5) AS BIGINT) AS top_share_e6,
       CAST(pick.rev AS BIGINT) AS threshold_rev_e2
FROM pick, t
WHERE t.tot > 0
"""

register("supplier_pareto", supplier_pareto, sql=SUPPLIER_PARETO_SQL)


# --- return rate by part brand (X165) ----------------------------------------------


def brand_return_rate(sf_dir: str) -> "pd.DataFrame":
    """(p_brand, n_lines, n_returned, rate_e6): the share of lineitem
    rows flagged 'R' per part brand — the product-quality league table a
    returns desk reads (one brand at 3× the base rate = a supplier
    problem, not noise).

    Scale shape: the part table is the SMALL side — its (partkey →
    brand) map broadcasts once via ``ray.put`` under the
    MAX_BROADCAST_KEYS ceiling (loud error names the partkey
    co-partition reroute past it); the fact scan emits bounded
    (brand, n, returned) partials into the enum fold. Zero shuffle.

    Exactness: pure integer counts; ``rate_e6`` is one shared IEEE
    division. Lines with NULL partkey/returnflag or an unknown partkey
    group under the '(unmatched)' sentinel — referential noise is
    SHOWN, not dropped (LEFT JOIN semantics in the SQL twin).
    """
    import numpy as np

    import ray as ray_core

    import pyarrow.parquet as _pq

    from .exchange import broadcast_lookup, enum_group_sum, probe_lookup

    n_parts = _pq.ParquetFile(table_path(sf_dir, "part")).metadata.num_rows
    if n_parts > MAX_BROADCAST_KEYS:
        raise ValueError(
            f"brand_return_rate: part has {n_parts:,} rows, past the "
            f"broadcast ceiling ({MAX_BROADCAST_KEYS:,}); co-partition "
            "lineitem and part on partkey instead"
        )
    part = _pq.read_table(table_path(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    brands = sorted(set(part["p_brand"].to_pylist()))
    bid = {b: i for i, b in enumerate(brands)}
    UNMATCHED = len(brands)
    keys, vals = broadcast_lookup(
        part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        np.array([bid[b] for b in part["p_brand"].to_pylist()], dtype=np.int64),
    )
    ref = ray_core.put((keys, vals))

    def partial(batch: pa.Table) -> pa.Table:
        k, v = ray_core.get(ref)
        pk = pc.fill_null(batch["l_partkey"], -1).to_numpy(zero_copy_only=False)
        b = probe_lookup(k, v, pk.astype(np.int64), missing=UNMATCHED)
        rf = batch["l_returnflag"].to_pandas()
        ret = (rf == "R").to_numpy()
        n_b = np.bincount(b, minlength=UNMATCHED + 1)
        r_b = np.bincount(b[ret], minlength=UNMATCHED + 1)
        nz = np.flatnonzero(n_b)
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64)),
                "n": pa.array(n_b[nz].astype(np.int64)),
                "r": pa.array(r_b[nz].astype(np.int64)),
            }
        )

    fold = enum_group_sum(
        ray.data.read_parquet(
            table_path(sf_dir, "lineitem"), columns=["l_partkey", "l_returnflag"]
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["b"],
        ["n", "r"],
    )
    cols = {
        "p_brand": "object", "n_lines": "int64",
        "n_returned": "int64", "rate_e6": "int64",
    }
    if len(fold) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    fold = fold.sort_values("b").reset_index(drop=True)
    names = brands + ["(unmatched)"]
    rate = np.floor(
        fold["r"].to_numpy(dtype=np.float64)
        / fold["n"].to_numpy(dtype=np.float64)
        * 1e6
        + 0.5
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "p_brand": [names[int(i)] for i in fold["b"]],
            "n_lines": fold["n"].astype("int64"),
            "n_returned": fold["r"].astype("int64"),
            "rate_e6": rate,
        }
    ).astype(cols)


BRAND_RETURN_RATE_SQL = """
SELECT coalesce(p.p_brand, '(unmatched)') AS p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_returned,
       CAST(floor(
         CAST(coalesce(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END),
                       0) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS rate_e6
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""

register("brand_return_rate", brand_return_rate, sql=BRAND_RETURN_RATE_SQL)
