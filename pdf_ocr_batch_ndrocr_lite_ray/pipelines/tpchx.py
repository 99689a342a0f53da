"""TPC-H Q6/Q14/Q18/Q10 + Q7/Q15/Q13 over the synthetic tables
(X112-X118).

The reference has no relational layer at all (its aggregation surface is
the flat run counters, SURVEY.md §2.7); these four round out the TPC-H
family started by Q1/Q3/Q5 (rollup.py / analytics.py) with the remaining
shapes a warehouse engine is judged on that this schema can express:

- ``tpch_q6_forecast_revenue``: the pure scan-filter-aggregate — zero
  exchanges, one int64 partial per block, driver fold in Python ints
  (exact at any corpus size; the int64 OUTPUT bound is ~9.2e14 dollars
  of e4 discount-revenue, unreachable).
- ``tpch_q14_promo_revenue``: scan + ONE broadcast dimension (part →
  is-promo bitmap under the same parquet-footer ceiling check as Q5) —
  still zero exchanges; the ratio is derived on the driver from two
  exact integer sums.
- ``tpch_q18_large_orders``: the group-filter-join — per-order quantity
  sums in one co-partition exchange that ALSO carries the orders stubs
  (qty partials and order rows join in-partition, so qualifying orders
  never round-trip the driver), then a mergeable local-top-k fold.
- ``tpch_q10_returned_revenue``: the two-exchange star — lineitem 'R'
  partials co-partition with order stubs on the order key, re-key to the
  customer, ONE second exchange sums per customer, and only the folded
  top-20 rows ever see the driver-side customer/nation maps.

The second trio (appended below): ``tpch_q7_volume_shipping`` (the
directional two-nation pair star — both fact sides pre-filter to the
two nations before ONE co-partition exchange), ``tpch_q15_top_supplier``
(max-with-ties over one supplier-key exchange; each partition emits
only its local-max ties), and ``tpch_q13_customer_distribution`` (the
LEFT-JOIN count-of-counts with the zero-order row derived from the
exact parquet footer count — no customer row ever shuffles).

Verbatim Q6/Q14 (TPC-H 2.18 §2.4) apply unchanged; Q18/Q10 keep the
verbatim plan shape with this schema's columns (no l_commitdate /
c_phone here) and a TOTAL tie-break key (orderkey / custkey ASC) so the
LIMIT row-set is deterministic and the order-insensitive value hash is
well-defined at every scale. Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21 are schema-
blocked (no partsupp table, l_commitdate/l_receiptdate/l_shipmode
columns); their closest expressible shapes are covered elsewhere
(orders_late_shipment_priority is the Q4-shaped non-equi semi-join).

Money contract: products are quantized to fixed point PER ROW before
any sum (e2 for one-factor, e4 for the two-factor discount product —
the tpch_q1_pricing rule), so totals are independent of both float
summation order and partitioning.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as _pq

import ray
import ray.data

from .analytics import MAX_BROADCAST_KEYS
from .exchange import (
    broadcast_lookup,
    driver_topk_fold,
    enum_group_sum,
    hash_partitioned,
    int64_array,
    probe_lookup,
    round6,
)
from .queryset import register, table_path

# Q6: one forecast year, the mid-band discount, small quantities.
Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY_MAX = 24.0

# Q14: one promotion month.
Q14_DATE_LO = "1996-03-01"
Q14_DATE_HI = "1996-04-01"
Q14_PROMO_PREFIX = "PROMO"

# Q18: orders whose total quantity exceeds the threshold; top by price.
Q18_QTY_MIN_E2 = 250 * 100  # sum(l_quantity) > 250, in e2 fixed point
Q18_TOP_N = 100

# Q10: one quarter of returned-item revenue; top customers.
Q10_DATE_LO = "1996-10-01"
Q10_DATE_HI = "1997-01-01"
Q10_TOP_N = 20


def _rev_e2(t: pa.Table) -> pa.Array:
    """round(l_extendedprice * (1 - l_discount) * 100) as int64 — THE
    per-row revenue quantization shared by Q3/Q5/Q10/Q14/Q18."""
    return pc.cast(
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


def _scalar_fold(ds: "ray.data.Dataset", cols: list[str]) -> list[int]:
    """Driver fold of single-row int64 block partials in Python ints —
    exact past 2^63, bounded by (1 row × blocks)."""
    totals = [0] * len(cols)
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for i, c in enumerate(cols):
            totals[i] += sum(b[c].to_pylist())
    return totals


def tpch_q6_forecast_revenue(sf_dir: str) -> "pd.DataFrame":
    """(revenue_e4, n_lines): revenue increase if mid-band discounts had
    been dropped — sum(l_extendedprice * l_discount) over one shipped
    year, discount in [0.05, 0.07], quantity < 24. The canonical
    predicate-pushdown scan: no exchange at all, one (revenue, count)
    int64 partial per block, Python-int driver fold. Both factors carry
    two decimals, so the e4 quantization is exact per row."""
    lo = _dt.datetime.fromisoformat(Q6_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q6_DATE_HI)

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
                pc.less(batch["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(Q6_DISC_LO)),
                    pc.less_equal(batch["l_discount"], pa.scalar(Q6_DISC_HI)),
                ),
                pc.less(batch["l_quantity"], pa.scalar(Q6_QTY_MAX)),
            ),
        )
        t = batch.filter(m)
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(t["l_extendedprice"], t["l_discount"]),
                    pa.scalar(10_000.0),
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "revenue_e4": pa.array([pc.sum(rev).as_py() or 0], type=pa.int64()),
                "n_lines": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    revenue_e4, n_lines = _scalar_fold(ds, ["revenue_e4", "n_lines"])
    return pd.DataFrame(
        {
            "revenue_e4": pd.Series([revenue_e4], dtype="int64"),
            "n_lines": pd.Series([n_lines], dtype="int64"),
        }
    )


TPCH_Q6_SQL = f"""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_DATE_HI}'
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_MAX}
"""


def tpch_q14_promo_revenue(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(promo_e2, total_e2, promo_pct): share of one month's revenue from
    promotional parts. The part side is a broadcast is-promo bitmap
    (ceiling-enforced from the parquet footer BEFORE the read, the Q5
    rule — past the ceiling the fix is a partkey co-partition like
    Q3's); the fact scan emits one two-sum partial per block and never
    shuffles. Rows whose partkey misses the map are dropped (inner-join
    parity); the percentage is derived on the driver from the two exact
    integer sums with the shared round6 contract."""
    n_rows = _pq.ParquetFile(table_path(sf_dir, "part")).metadata.num_rows
    if n_rows > max_broadcast_keys:
        raise ValueError(
            f"tpch_q14_promo_revenue: part has {n_rows:,} rows, past the "
            f"broadcast ceiling ({max_broadcast_keys:,}); reroute the "
            "part→is-promo lookup through a partkey co-partition exchange "
            "(the tpch_q3_topk fallback shape) instead of a broadcast map"
        )
    part = _pq.read_table(table_path(sf_dir, "part"), columns=["p_partkey", "p_type"])
    is_promo = pc.starts_with(part["p_type"], Q14_PROMO_PREFIX)
    p_keys, p_promo = broadcast_lookup(
        part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        is_promo.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64),
    )
    ref = ray.put((p_keys, p_promo))
    lo = _dt.datetime.fromisoformat(Q14_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q14_DATE_HI)

    def partial(batch: pa.Table) -> pa.Table:
        pk, pv = ray.get(ref)
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        t = batch.filter(m)
        promo = probe_lookup(pk, pv, int64_array(t["l_partkey"]), missing=-1)
        t = t.filter(pa.array(promo >= 0))  # inner-join parity on the part key
        promo = promo[promo >= 0]
        rev = _rev_e2(t).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "promo_e2": pa.array([int(rev[promo == 1].sum())], type=pa.int64()),
                "total_e2": pa.array([int(rev.sum())], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    promo_e2, total_e2 = _scalar_fold(ds, ["promo_e2", "total_e2"])
    pct = round6(np.array([100.0 * promo_e2 / total_e2]))[0] if total_e2 else 0.0
    return pd.DataFrame(
        {
            "promo_e2": pd.Series([promo_e2], dtype="int64"),
            "total_e2": pd.Series([total_e2], dtype="int64"),
            "promo_pct": pd.Series([pct], dtype="float64"),
        }
    )


TPCH_Q14_SQL = f"""
SELECT CAST(sum(CASE WHEN p.p_type LIKE '{Q14_PROMO_PREFIX}%'
                     THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                     * 100, 0) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_e2,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS total_e2,
       round(100.0 * CAST(sum(CASE WHEN p.p_type LIKE '{Q14_PROMO_PREFIX}%'
                     THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                     * 100, 0) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 100, 0) AS BIGINT)) AS DOUBLE),
             6) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '{Q14_DATE_LO}'
  AND l.l_shipdate < TIMESTAMP '{Q14_DATE_HI}'
"""


def tpch_q18_large_orders(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(c_custkey, c_name, o_orderkey, o_orderdate, totalprice_e2,
    qty_e2): orders whose line quantities sum past the threshold, top-N
    by total price — the HAVING-on-a-group-join. Per-block (orderkey,
    qty_e2) partials and (orderkey, custkey, price, date) order stubs
    share ONE co-partition exchange; each partition finishes its group
    sums, applies the threshold, and joins locally, so qualifying rows
    flow straight into the mergeable local-top-N fold (driver holds ≤ N
    + one block's N rows). Only the N winners probe the driver-side
    customer-name map (ceiling-checked). Tie-break is total
    (price DESC, orderkey ASC) so the LIMIT set is deterministic."""
    n_rows = _pq.ParquetFile(table_path(sf_dir, "customer")).metadata.num_rows
    if n_rows > max_broadcast_keys:
        raise ValueError(
            f"tpch_q18_large_orders: customer has {n_rows:,} rows, past the "
            f"broadcast ceiling ({max_broadcast_keys:,}); resolve the top-N "
            "winners' names through a custkey co-partition exchange instead"
        )

    def line_side(batch: pa.Table) -> pa.Table:
        qty = pc.cast(
            pc.round(
                pc.multiply(batch["l_quantity"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        g = (
            pa.table({"key": batch["l_orderkey"], "qty_e2": qty})
            .group_by(["key"])
            .aggregate([("qty_e2", "sum")])
        )
        n = g.num_rows
        return pa.table(
            {
                "key": g["key"],
                "qty_e2": g["qty_e2_sum"],
                "custkey": pa.array(np.zeros(n, dtype=np.int64)),
                "price_e2": pa.array(np.zeros(n, dtype=np.int64)),
                "odate": pa.array([None] * n, type=pa.timestamp("us")),
                "is_order": pa.array([False] * n, type=pa.bool_()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        price = pc.cast(
            pc.round(
                pc.multiply(batch["o_totalprice"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["o_orderkey"],
                "qty_e2": pa.array(np.zeros(n, dtype=np.int64)),
                "custkey": batch["o_custkey"],
                "price_e2": price,
                "odate": pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                "is_order": pa.array([True] * n, type=pa.bool_()),
            }
        )

    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)

    def local_join(df: pd.DataFrame) -> pd.DataFrame:
        qty = (
            df[~df["is_order"]].groupby("key", sort=False)["qty_e2"].sum()
        )
        qty = qty[qty > Q18_QTY_MIN_E2]
        ords = df[df["is_order"]]
        hit = ords[ords["key"].isin(qty.index)].copy()
        hit["qty_e2"] = hit["key"].map(qty).astype("int64")
        return hit[["key", "custkey", "price_e2", "odate", "qty_e2"]]

    qualified = hash_partitioned(
        lines.union(orders), "key", local_join, coalesce_rows=1 << 20
    )
    top = driver_topk_fold(
        qualified, by=["price_e2", "key"], ascending=[False, True], k=Q18_TOP_N
    )
    if top is None or len(top) == 0:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype="object"),
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "totalprice_e2": pd.Series([], dtype="int64"),
                "qty_e2": pd.Series([], dtype="int64"),
            }
        )
    cust = _pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    )
    name_of = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist())
    )
    top = top.reset_index(drop=True)
    return pd.DataFrame(
        {
            "c_custkey": top["custkey"].astype("int64"),
            "c_name": top["custkey"].map(name_of),
            "o_orderkey": top["key"].astype("int64"),
            "o_orderdate": top["odate"],
            "totalprice_e2": top["price_e2"].astype("int64"),
            "qty_e2": top["qty_e2"].astype("int64"),
        }
    )


TPCH_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey AS key,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS qty_e2
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) > {Q18_QTY_MIN_E2}
)
SELECT o.o_custkey AS c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS totalprice_e2,
       big.qty_e2
FROM big
JOIN orders o ON o.o_orderkey = big.key
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice_e2 DESC, o.o_orderkey ASC
LIMIT {Q18_TOP_N}
"""


def tpch_q10_returned_revenue(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(c_custkey, c_name, n_name, acctbal_e2, revenue_e2): customers who
    returned the most revenue in one quarter — the returned-item report.
    Two bounded exchanges: lineitem 'R' revenue partials co-partition
    with date-filtered order stubs on the ORDER key (join + re-key to
    the customer in-partition, emitting per-partition (custkey, rev)
    partials), then ONE exchange on the CUSTOMER key finishes the sums.
    The mergeable top-N fold keeps ≤ N rows on the driver; only those
    winners probe the customer/nation maps (ceiling-checked). Tie-break
    (revenue DESC, custkey ASC) is total."""
    n_rows = _pq.ParquetFile(table_path(sf_dir, "customer")).metadata.num_rows
    if n_rows > max_broadcast_keys:
        raise ValueError(
            f"tpch_q10_returned_revenue: customer has {n_rows:,} rows, past "
            f"the broadcast ceiling ({max_broadcast_keys:,}); resolve the "
            "top-N winners' attributes through a custkey co-partition "
            "exchange instead"
        )
    lo = _dt.datetime.fromisoformat(Q10_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q10_DATE_HI)

    def line_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        g = (
            pa.table({"key": t["l_orderkey"], "rev_e2": _rev_e2(t)})
            .group_by(["key"])
            .aggregate([("rev_e2", "sum")])
        )
        n = g.num_rows
        return pa.table(
            {
                "key": g["key"],
                "rev_e2": g["rev_e2_sum"],
                "custkey": pa.array(np.zeros(n, dtype=np.int64)),
                "is_order": pa.array([False] * n, type=pa.bool_()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        t = batch.filter(m)
        n = t.num_rows
        return pa.table(
            {
                "key": t["o_orderkey"],
                "rev_e2": pa.array(np.zeros(n, dtype=np.int64)),
                "custkey": t["o_custkey"],
                "is_order": pa.array([True] * n, type=pa.bool_()),
            }
        )

    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)

    def join_rekey(df: pd.DataFrame) -> pd.DataFrame:
        ords = df[df["is_order"]].drop_duplicates("key").set_index("key")["custkey"]
        lins = df[~df["is_order"]]
        ck = lins["key"].map(ords)
        hit = lins[ck.notna()].copy()
        hit["custkey"] = ck[ck.notna()].astype("int64")
        g = hit.groupby("custkey", sort=False)["rev_e2"].sum().reset_index()
        g["rev_e2"] = g["rev_e2"].astype("int64")
        return g

    per_cust_partials = hash_partitioned(
        lines.union(orders), "key", join_rekey, coalesce_rows=1 << 20
    )

    def cust_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("custkey", sort=False)["rev_e2"].sum().reset_index()
        g["rev_e2"] = g["rev_e2"].astype("int64")
        return g

    per_cust = hash_partitioned(
        per_cust_partials, "custkey", cust_sum, coalesce_rows=1 << 20
    )
    top = driver_topk_fold(
        per_cust, by=["rev_e2", "custkey"], ascending=[False, True], k=Q10_TOP_N
    )
    if top is None or len(top) == 0:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype="object"),
                "n_name": pd.Series([], dtype="object"),
                "acctbal_e2": pd.Series([], dtype="int64"),
                "revenue_e2": pd.Series([], dtype="int64"),
            }
        )
    cust = _pq.read_table(
        table_path(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )
    nat = _pq.read_table(table_path(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    info = {
        int(k): (nm, n_name.get(int(nk)), int(round(bal * 100)))
        for k, nm, nk, bal in zip(
            cust["c_custkey"].to_pylist(),
            cust["c_name"].to_pylist(),
            cust["c_nationkey"].to_pylist(),
            cust["c_acctbal"].to_pylist(),
        )
    }
    top = top.reset_index(drop=True)
    rows = [info[int(k)] for k in top["custkey"]]
    return pd.DataFrame(
        {
            "c_custkey": top["custkey"].astype("int64"),
            "c_name": [r[0] for r in rows],
            "n_name": [r[1] for r in rows],
            "acctbal_e2": pd.Series([r[2] for r in rows], dtype="int64"),
            "revenue_e2": top["rev_e2"].astype("int64"),
        }
    )


TPCH_Q10_SQL = f"""
WITH per_cust AS (
  SELECT o.o_custkey AS c_custkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS revenue_e2
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
    AND o.o_orderdate < TIMESTAMP '{Q10_DATE_HI}'
  GROUP BY o.o_custkey
)
SELECT p.c_custkey, c.c_name, n.n_name,
       CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS acctbal_e2,
       p.revenue_e2
FROM per_cust p
JOIN customer c ON c.c_custkey = p.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY p.revenue_e2 DESC, p.c_custkey ASC
LIMIT {Q10_TOP_N}
"""

register("tpch_q6_forecast_revenue", tpch_q6_forecast_revenue, sql=TPCH_Q6_SQL)
register("tpch_q14_promo_revenue", tpch_q14_promo_revenue, sql=TPCH_Q14_SQL)
register("tpch_q18_large_orders", tpch_q18_large_orders, sql=TPCH_Q18_SQL)
register("tpch_q10_returned_revenue", tpch_q10_returned_revenue, sql=TPCH_Q10_SQL)


# --- Q7 / Q15 / Q13 (X116-X118) ---------------------------------------------

# Q7: two-nation shipping volume, both directions, by ship year.
Q7_NATION_A = "NATION_18"
Q7_NATION_B = "NATION_19"
Q7_DATE_LO = "1995-01-01"
Q7_DATE_HI = "1998-01-01"

# Q15: one quarter's top supplier(s) by revenue (ties kept, verbatim rule).
Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def tpch_q7_volume_shipping(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(supp_nation, cust_nation, l_year, revenue_e2): trade volume
    between two nations in both directions, by ship year — the
    directional-pair star. Supplier and customer nation maps broadcast
    (ceiling-enforced, Q5 rule); both fact sides pre-filter to the two
    nations BEFORE the one co-partition exchange on the order key, so
    the exchange carries only the two nations' stubs/partials; the final
    (supp, cust, year) grid is a bounded enum fold (2 × years)."""
    for tbl in ("supplier", "customer"):
        n_rows = _pq.ParquetFile(table_path(sf_dir, tbl)).metadata.num_rows
        if n_rows > max_broadcast_keys:
            raise ValueError(
                f"tpch_q7_volume_shipping: {tbl} has {n_rows:,} rows, past "
                f"the broadcast ceiling ({max_broadcast_keys:,}); reroute "
                f"the {tbl}→nation lookup through a co-partition exchange "
                "(the tpch_q3_topk fallback shape)"
            )
    nat = _pq.read_table(table_path(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    key_of = {n: int(k) for k, n in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())}
    name_of = {v: k for k, v in key_of.items()}
    ka, kb = key_of[Q7_NATION_A], key_of[Q7_NATION_B]
    pair = np.array(sorted((ka, kb)), dtype=np.int64)

    sup = _pq.read_table(table_path(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    s_keys, s_nats = broadcast_lookup(
        sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    cust = _pq.read_table(table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    c_keys, c_nats = broadcast_lookup(
        cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    ref = ray.put((s_keys, s_nats, c_keys, c_nats, pair))
    lo = _dt.datetime.fromisoformat(Q7_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q7_DATE_HI)

    def order_side(batch: pa.Table) -> pa.Table:
        sk, sn, ck, cn, pr = ray.get(ref)
        cnat = probe_lookup(ck, cn, int64_array(batch["o_custkey"]), missing=-1)
        keep = np.isin(cnat, pr)
        t = batch.filter(pa.array(keep))
        n = t.num_rows
        return pa.table(
            {
                "key": t["o_orderkey"],
                "nat": pa.array(cnat[keep]),
                "year": pa.array(np.zeros(n, dtype=np.int64)),
                "rev_e2": pa.array(np.zeros(n, dtype=np.int64)),
                "is_order": pa.array([True] * n, type=pa.bool_()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        sk, sn, ck, cn, pr = ray.get(ref)
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        t = batch.filter(m)
        snat = probe_lookup(sk, sn, int64_array(t["l_suppkey"]), missing=-1)
        keep = np.isin(snat, pr)
        t = t.filter(pa.array(keep))
        g = (
            pa.table(
                {
                    "key": t["l_orderkey"],
                    "nat": pa.array(snat[keep]),
                    "year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                    "rev_e2": _rev_e2(t),
                }
            )
            .group_by(["key", "nat", "year"])
            .aggregate([("rev_e2", "sum")])
        )
        n = g.num_rows
        return pa.table(
            {
                "key": g["key"],
                "nat": g["nat"],
                "year": g["year"],
                "rev_e2": g["rev_e2_sum"],
                "is_order": pa.array([False] * n, type=pa.bool_()),
            }
        )

    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)

    def local_join(df: pd.DataFrame) -> pd.DataFrame:
        ords = df[df["is_order"]].drop_duplicates("key").set_index("key")["nat"]
        lins = df[~df["is_order"]]
        cn = lins["key"].map(ords)
        hit = lins[cn.notna() & (cn != lins["nat"])].copy()  # opposite nations
        hit["cust_nat"] = cn[hit.index].astype("int64")
        g = (
            hit.groupby(["nat", "cust_nat", "year"], sort=False)["rev_e2"]
            .sum()
            .reset_index()
        )
        g["rev_e2"] = g["rev_e2"].astype("int64")
        return g.rename(columns={"nat": "supp_nat"})

    partials = hash_partitioned(
        orders.union(lines), "key", local_join, coalesce_rows=1 << 20
    )
    folded = enum_group_sum(partials, ["supp_nat", "cust_nat", "year"], ["rev_e2"])
    folded["supp_nation"] = folded["supp_nat"].map(name_of)
    folded["cust_nation"] = folded["cust_nat"].map(name_of)
    out = (
        folded.rename(columns={"year": "l_year", "rev_e2": "revenue_e2"})[
            ["supp_nation", "cust_nation", "l_year", "revenue_e2"]
        ]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    return out


TPCH_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(extract(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_e2
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
  AND l.l_shipdate >= TIMESTAMP '{Q7_DATE_LO}'
  AND l.l_shipdate < TIMESTAMP '{Q7_DATE_HI}'
GROUP BY 1, 2, 3
"""


def tpch_q15_top_supplier(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(s_suppkey, s_name, total_revenue_e2): the supplier(s) with the
    highest revenue in one quarter — verbatim Q15's max-with-ties rule.
    Per-block (suppkey, rev) partials, ONE exchange on the supplier key;
    each partition emits only its rows that tie the PARTITION max (the
    global max is among them), and the driver folds the global max over
    that tiny candidate set. Names resolve from the supplier table on
    the driver (ceiling-checked)."""
    n_rows = _pq.ParquetFile(table_path(sf_dir, "supplier")).metadata.num_rows
    if n_rows > max_broadcast_keys:
        raise ValueError(
            f"tpch_q15_top_supplier: supplier has {n_rows:,} rows, past the "
            f"broadcast ceiling ({max_broadcast_keys:,}); resolve the "
            "winners' names through a suppkey co-partition exchange instead"
        )
    lo = _dt.datetime.fromisoformat(Q15_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q15_DATE_HI)

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
            pc.less(batch["l_shipdate"], pa.scalar(hi)),
        )
        t = batch.filter(m)
        g = (
            pa.table({"suppkey": t["l_suppkey"], "rev_e2": _rev_e2(t)})
            .group_by(["suppkey"])
            .aggregate([("rev_e2", "sum")])
        )
        return g.rename_columns(["suppkey", "rev_e2"])

    from .exchange import recombine_partials

    ds = recombine_partials(
        ray.data.read_parquet(
            table_path(sf_dir, "lineitem"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["suppkey"],
        ["rev_e2"],
    )

    def local_max(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("suppkey", sort=False)["rev_e2"].sum()
        if len(g) == 0:
            return pd.DataFrame({"suppkey": [], "rev_e2": []}).astype("int64")
        top = g[g == g.max()].reset_index()
        top["rev_e2"] = top["rev_e2"].astype("int64")
        return top

    candidates = hash_partitioned(ds, "suppkey", local_max)
    best: pd.DataFrame | None = None
    for b in candidates.iter_batches(batch_size=4096, batch_format="pandas"):
        best = b if best is None else pd.concat([best, b])
        if len(best):
            best = best[best["rev_e2"] == best["rev_e2"].max()]
    if best is None or len(best) == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype="object"),
                "total_revenue_e2": pd.Series([], dtype="int64"),
            }
        )
    sup = _pq.read_table(table_path(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    name_of = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))
    best = best.sort_values("suppkey").reset_index(drop=True)
    return pd.DataFrame(
        {
            "s_suppkey": best["suppkey"].astype("int64"),
            "s_name": best["suppkey"].map(name_of),
            "total_revenue_e2": best["rev_e2"].astype("int64"),
        }
    )


TPCH_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS total_revenue_e2
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_DATE_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_DATE_HI}'
  GROUP BY l_suppkey
)
SELECT r.s_suppkey, s.s_name, r.total_revenue_e2
FROM rev r
JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_revenue_e2 = (SELECT max(total_revenue_e2) FROM rev)
"""


def tpch_q13_customer_distribution(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(c_count, custdist): how many customers placed exactly N orders —
    the LEFT-JOIN count-of-counts, INCLUDING the zero-order customers.
    Orders stubs filter against a broadcast customer-key set (inner-side
    membership = the LEFT JOIN's match rule; ceiling-checked), one
    exchange on the customer key; each partition emits its bounded
    count-of-counts partial plus its matched-customer count, and the
    zero row is derived on the driver as footer_total − matched (the
    parquet footer count is exact). No customer row ever shuffles."""
    n_rows = _pq.ParquetFile(table_path(sf_dir, "customer")).metadata.num_rows
    if n_rows > max_broadcast_keys:
        raise ValueError(
            f"tpch_q13_customer_distribution: customer has {n_rows:,} rows, "
            f"past the broadcast ceiling ({max_broadcast_keys:,}); reroute "
            "the membership filter through a custkey co-partition exchange "
            "(the tpch_q3_topk fallback shape)"
        )
    cust = _pq.read_table(table_path(sf_dir, "customer"), columns=["c_custkey"])
    c_keys = np.sort(cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    total_customers = int(n_rows)
    ref = ray.put(c_keys)

    def order_stub(batch: pa.Table) -> pa.Table:
        ck = ray.get(ref)
        keys = int64_array(batch["o_custkey"])
        pos = np.searchsorted(ck, keys)
        pos = np.minimum(pos, max(len(ck) - 1, 0))
        hit = (len(ck) > 0) & (ck[pos] == keys)
        g = (
            pa.table(
                {
                    "custkey": pa.array(keys[hit]),
                    "n": pa.array(np.ones(int(hit.sum()), dtype=np.int64)),
                }
            )
            .group_by(["custkey"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["custkey", "n"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey"]
    ).map_batches(order_stub, batch_format="pyarrow", zero_copy_batch=True)

    def count_of_counts(df: pd.DataFrame) -> pd.DataFrame:
        per_cust = df.groupby("custkey", sort=False)["n"].sum()
        cc = per_cust.value_counts()
        return pd.DataFrame(
            {"c_count": cc.index.astype("int64"), "custdist": cc.values.astype("int64")}
        )

    partials = hash_partitioned(
        ds, "custkey", count_of_counts, coalesce_rows=1 << 20
    )
    folded = enum_group_sum(partials, ["c_count"], ["custdist"])
    matched = int(folded["custdist"].sum())
    zero_row = pd.DataFrame(
        {"c_count": [0], "custdist": [total_customers - matched]}
    )
    out = (
        pd.concat([folded, zero_row], ignore_index=True)
        .astype({"c_count": "int64", "custdist": "int64"})
        .sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )
    return out[out["custdist"] > 0].reset_index(drop=True)


TPCH_Q13_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""

register("tpch_q7_volume_shipping", tpch_q7_volume_shipping, sql=TPCH_Q7_SQL)
register("tpch_q15_top_supplier", tpch_q15_top_supplier, sql=TPCH_Q15_SQL)
register(
    "tpch_q13_customer_distribution", tpch_q13_customer_distribution, sql=TPCH_Q13_SQL
)


# --- Q8 / Q17 / Q19 / Q22 (X119-X122) ---------------------------------------
# These four close out the TPC-H surface this schema can express. With
# them the expressible set is Q1/Q3/Q5/Q6/Q7/Q8/Q10/Q13/Q14/Q15/Q17/
# Q18/Q19/Q22 (+ the Q4-shaped orders_late_shipment_priority); the rest
# need partsupp / commitdate / shipmode columns this corpus lacks.

Q8_REGION = "EUROPE"
Q8_NATION = "NATION_18"  # the nation whose market share is measured
Q8_TYPE = "ECONOMY"
Q8_DATE_LO = "1995-01-01"
Q8_DATE_HI = "1997-01-01"

Q17_BRAND = "Brand#3"

# Q19: three disjunctive (brand, max size, qty band) predicates.
Q19_DISJUNCTS = (
    ("Brand#1", 5, 1.0, 11.0),
    ("Brand#2", 10, 10.0, 20.0),
    ("Brand#3", 15, 20.0, 30.0),
)


def tpch_q8_market_share(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(o_year, nation_e2, total_e2, mkt_share): one nation's share of a
    region's market for one part type, by order year. Three broadcast
    sides (type partkeys as a sorted membership array; supplier and
    customer nation maps, ceiling-enforced); both fact scans pre-filter
    (orders to region customers in the window, lineitem to the type's
    parts) before the ONE co-partition exchange on the order key; the
    final (year, is-target) grid is a bounded enum fold and the share is
    derived on the driver from exact integer sums."""
    for tbl in ("supplier", "customer", "part"):
        n_rows = _pq.ParquetFile(table_path(sf_dir, tbl)).metadata.num_rows
        if n_rows > max_broadcast_keys:
            raise ValueError(
                f"tpch_q8_market_share: {tbl} has {n_rows:,} rows, past the "
                f"broadcast ceiling ({max_broadcast_keys:,}); reroute that "
                "side through a co-partition exchange (the tpch_q3_topk "
                "fallback shape)"
            )
    nat = _pq.read_table(table_path(sf_dir, "nation"))
    reg = _pq.read_table(table_path(sf_dir, "region"))
    region_keys = {
        int(k)
        for k, name in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
        if name == Q8_REGION
    }
    region_nations = np.array(
        sorted(
            int(k)
            for k, rk in zip(
                nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()
            )
            if int(rk) in region_keys
        ),
        dtype=np.int64,
    )
    target_key = {
        n: int(k)
        for k, n in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    }[Q8_NATION]

    part = _pq.read_table(table_path(sf_dir, "part"), columns=["p_partkey", "p_type"])
    econ = pc.equal(part["p_type"], Q8_TYPE)
    type_parts = np.sort(
        part.filter(econ)["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    sup = _pq.read_table(table_path(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    s_keys, s_nats = broadcast_lookup(
        sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    cust = _pq.read_table(table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    c_keys, c_nats = broadcast_lookup(
        cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    ref = ray.put((type_parts, s_keys, s_nats, c_keys, c_nats, region_nations))
    lo = _dt.datetime.fromisoformat(Q8_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q8_DATE_HI)

    def order_side(batch: pa.Table) -> pa.Table:
        tp, sk, sn, ck, cn, rn = ray.get(ref)
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
            pc.less(batch["o_orderdate"], pa.scalar(hi)),
        )
        t = batch.filter(m)
        cnat = probe_lookup(ck, cn, int64_array(t["o_custkey"]), missing=-1)
        keep = np.isin(cnat, rn)
        t = t.filter(pa.array(keep))
        n = t.num_rows
        return pa.table(
            {
                "key": t["o_orderkey"],
                "year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "is_t": pa.array(np.zeros(n, dtype=bool)),
                "rev_e2": pa.array(np.zeros(n, dtype=np.int64)),
                "is_order": pa.array([True] * n, type=pa.bool_()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        tp, sk, sn, ck, cn, rn = ray.get(ref)
        keys = int64_array(batch["l_partkey"])
        pos = np.searchsorted(tp, keys)
        pos = np.minimum(pos, max(len(tp) - 1, 0))
        hit = (len(tp) > 0) & (tp[pos] == keys)
        t = batch.filter(pa.array(hit))
        snat = probe_lookup(sk, sn, int64_array(t["l_suppkey"]), missing=-1)
        g = (
            pa.table(
                {
                    "key": t["l_orderkey"],
                    "is_t": pa.array(snat == target_key),
                    "rev_e2": _rev_e2(t),
                }
            )
            .group_by(["key", "is_t"])
            .aggregate([("rev_e2", "sum")])
        )
        n = g.num_rows
        return pa.table(
            {
                "key": g["key"],
                "year": pa.array(np.zeros(n, dtype=np.int64)),
                "is_t": g["is_t"],
                "rev_e2": g["rev_e2_sum"],
                "is_order": pa.array([False] * n, type=pa.bool_()),
            }
        )

    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)

    def local_join(df: pd.DataFrame) -> pd.DataFrame:
        ords = df[df["is_order"]].drop_duplicates("key").set_index("key")["year"]
        lins = df[~df["is_order"]]
        yr = lins["key"].map(ords)
        hit = lins[yr.notna()].copy()
        hit["year"] = yr[hit.index].astype("int64")
        g = hit.groupby(["year", "is_t"], sort=False)["rev_e2"].sum().reset_index()
        g["rev_e2"] = g["rev_e2"].astype("int64")
        return g

    partials = hash_partitioned(
        orders.union(lines), "key", local_join, coalesce_rows=1 << 20
    )
    folded = enum_group_sum(partials, ["year", "is_t"], ["rev_e2"])
    years = sorted(folded["year"].unique())
    rows = []
    for y in years:
        sub = folded[folded["year"] == y]
        tot = int(sub["rev_e2"].sum())
        tgt = int(sub.loc[sub["is_t"], "rev_e2"].sum())
        share = round6(np.array([tgt / tot]))[0] if tot else 0.0
        rows.append((int(y), tgt, tot, share))
    return pd.DataFrame(
        rows, columns=["o_year", "nation_e2", "total_e2", "mkt_share"]
    ).astype({"o_year": "int64", "nation_e2": "int64", "total_e2": "int64"})


TPCH_Q8_SQL = f"""
WITH base AS (
  SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
              AS BIGINT) AS rev,
         (s.s_nationkey = (SELECT n_nationkey FROM nation
                           WHERE n_name = '{Q8_NATION}')) AS is_t
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE r.r_name = '{Q8_REGION}'
    AND p.p_type = '{Q8_TYPE}'
    AND o.o_orderdate >= TIMESTAMP '{Q8_DATE_LO}'
    AND o.o_orderdate < TIMESTAMP '{Q8_DATE_HI}'
)
SELECT o_year,
       CAST(sum(CASE WHEN is_t THEN rev ELSE 0 END) AS BIGINT) AS nation_e2,
       CAST(sum(rev) AS BIGINT) AS total_e2,
       round(CAST(sum(CASE WHEN is_t THEN rev ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
FROM base
GROUP BY o_year
"""


def tpch_q17_small_quantity(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(avg_yearly, total_e2, n_small): revenue lost if one brand's
    small-quantity orders (below 20%% of the part's average quantity)
    moved to bulk — sum(price)/7 over qualifying lines. The brand's
    partkeys broadcast as a sorted membership array; only that brand's
    lines (≈1/25 of the fact table — the predicate IS the bound,
    documented) enter the ONE partkey co-partition exchange, where each
    partition owns every line of its parts and applies the threshold
    with EXACT integer arithmetic: qty < 0.2·avg(qty) ⇔
    qty_e2·cnt·5 < sum_qty_e2 (no float average crosses the oracle
    boundary; overflow needs cnt > 7.3e13 lines per part)."""
    n_rows = _pq.ParquetFile(table_path(sf_dir, "part")).metadata.num_rows
    if n_rows > max_broadcast_keys:
        raise ValueError(
            f"tpch_q17_small_quantity: part has {n_rows:,} rows, past the "
            f"broadcast ceiling ({max_broadcast_keys:,}); reroute the brand "
            "membership filter through a partkey co-partition exchange "
            "(the tpch_q3_topk fallback shape)"
        )
    part = _pq.read_table(table_path(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    brand_parts = np.sort(
        part.filter(pc.equal(part["p_brand"], Q17_BRAND))["p_partkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ref = ray.put(brand_parts)

    def brand_lines(batch: pa.Table) -> pa.Table:
        bp = ray.get(ref)
        keys = int64_array(batch["l_partkey"])
        pos = np.searchsorted(bp, keys)
        pos = np.minimum(pos, max(len(bp) - 1, 0))
        hit = (len(bp) > 0) & (bp[pos] == keys)
        t = batch.filter(pa.array(hit))
        qty = pc.cast(
            pc.round(
                pc.multiply(t["l_quantity"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        price = pc.cast(
            pc.round(
                pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"partkey": t["l_partkey"], "qty_e2": qty, "price_e2": price})

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(brand_lines, batch_format="pyarrow", zero_copy_batch=True)

    def threshold_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("partkey", sort=False)["qty_e2"].agg(["sum", "count"])
        sums = df["partkey"].map(g["sum"]).to_numpy(dtype=np.int64)
        cnts = df["partkey"].map(g["count"]).to_numpy(dtype=np.int64)
        qty = df["qty_e2"].to_numpy(dtype=np.int64)
        small = qty * cnts * 5 < sums
        return pd.DataFrame(
            {
                "total_e2": pd.Series(
                    [int(df["price_e2"].to_numpy(dtype=np.int64)[small].sum())],
                    dtype="int64",
                ),
                "n_small": pd.Series([int(small.sum())], dtype="int64"),
            }
        )

    partials = hash_partitioned(
        ds, "partkey", threshold_sum, coalesce_rows=1 << 20
    )
    total_e2, n_small = _scalar_fold(partials, ["total_e2", "n_small"])
    avg_yearly = round6(np.array([total_e2 / 100.0 / 7.0]))[0]
    return pd.DataFrame(
        {
            "avg_yearly": pd.Series([avg_yearly], dtype="float64"),
            "total_e2": pd.Series([total_e2], dtype="int64"),
            "n_small": pd.Series([n_small], dtype="int64"),
        }
    )


TPCH_Q17_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_qty_e2,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'
  GROUP BY l_partkey
),
small AS (
  SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS price_e2
  FROM lineitem l
  JOIN per_part pp ON pp.l_partkey = l.l_partkey
  WHERE CAST(round(l.l_quantity * 100, 0) AS BIGINT) * pp.cnt * 5
        < pp.sum_qty_e2
)
SELECT round(CAST(COALESCE(sum(price_e2), 0) AS DOUBLE) / 100.0 / 7.0, 6)
         AS avg_yearly,
       CAST(COALESCE(sum(price_e2), 0) AS BIGINT) AS total_e2,
       CAST(count(*) AS BIGINT) AS n_small
FROM small
"""


def tpch_q19_disjunctive_revenue(
    sf_dir: str, max_broadcast_keys: int = MAX_BROADCAST_KEYS
) -> "pd.DataFrame":
    """(revenue_e2, n_lines): discounted revenue matching any of three
    (brand, size-cap, quantity-band) disjuncts — the OR-of-conjunctions
    predicate a pushdown planner must not naively split. The three
    brands' (partkey → disjunct index, size) map broadcasts as sorted
    arrays; the fact scan evaluates all three bands vectorized in one
    pass with NO exchange (single-row block partials, Python-int driver
    fold)."""
    n_rows = _pq.ParquetFile(table_path(sf_dir, "part")).metadata.num_rows
    if n_rows > max_broadcast_keys:
        raise ValueError(
            f"tpch_q19_disjunctive_revenue: part has {n_rows:,} rows, past "
            f"the broadcast ceiling ({max_broadcast_keys:,}); reroute the "
            "part attribute lookup through a partkey co-partition exchange "
            "(the tpch_q3_topk fallback shape)"
        )
    part = _pq.read_table(
        table_path(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"]
    )
    brands = pc.cast(part["p_brand"], pa.string()).to_pylist()
    keys = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sizes = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    brand_idx = {b: i for i, (b, _, _, _) in enumerate(Q19_DISJUNCTS)}
    codes = np.array([brand_idx.get(b, -1) for b in brands], dtype=np.int64)
    keep = codes >= 0
    order = np.argsort(keys[keep])
    p_keys = keys[keep][order]
    p_codes = codes[keep][order]
    p_sizes = sizes[keep][order]
    ref = ray.put((p_keys, p_codes, p_sizes))
    size_caps = np.array([d[1] for d in Q19_DISJUNCTS], dtype=np.int64)
    qty_lo = np.array([d[2] for d in Q19_DISJUNCTS], dtype=np.float64)
    qty_hi = np.array([d[3] for d in Q19_DISJUNCTS], dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        pk, pcodes, psz = ray.get(ref)
        keys = int64_array(batch["l_partkey"])
        pos = np.searchsorted(pk, keys)
        pos = np.minimum(pos, max(len(pk) - 1, 0))
        hit = (len(pk) > 0) & (pk[pos] == keys)
        t = batch.filter(pa.array(hit))
        code = pcodes[pos[hit]]
        size = psz[pos[hit]]
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        ok = (
            (size >= 1)
            & (size <= size_caps[code])
            & (qty >= qty_lo[code])
            & (qty <= qty_hi[code])
        )
        rev = _rev_e2(t).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "revenue_e2": pa.array([int(rev[ok].sum())], type=pa.int64()),
                "n_lines": pa.array([int(ok.sum())], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    revenue_e2, n_lines = _scalar_fold(ds, ["revenue_e2", "n_lines"])
    return pd.DataFrame(
        {
            "revenue_e2": pd.Series([revenue_e2], dtype="int64"),
            "n_lines": pd.Series([n_lines], dtype="int64"),
        }
    )


def _q19_disjunct_sql(brand: str, size_cap: int, lo: float, hi: float) -> str:
    return (
        f"(p.p_brand = '{brand}' AND p.p_size BETWEEN 1 AND {size_cap} "
        f"AND l.l_quantity BETWEEN {lo} AND {hi})"
    )


TPCH_Q19_SQL = f"""
SELECT CAST(COALESCE(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                    * 100, 0) AS BIGINT)), 0) AS BIGINT)
         AS revenue_e2,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {" OR ".join(_q19_disjunct_sql(*d) for d in Q19_DISJUNCTS)}
"""


Q22_CUTOFF = "2000-01-01"  # "lapsed" = no order on/after this date


def tpch_q22_global_sales_opportunity(sf_dir: str) -> "pd.DataFrame":
    """(c_nationkey, numcust, totacctbal_e2): wealthy customers with no
    order since the cutoff, by nation — the above-average anti-join
    (verbatim Q22's seven-years-idle form; "never ordered" is vacuous on
    this corpus where every customer has pre-cutoff orders). Pass 1 folds the
    positive-balance average as EXACT integers (one (sum, count) partial
    per customer block); pass 2 sends only the qualifying customer stubs
    and each order block's DISTINCT customer keys through ONE
    co-partition exchange where the anti-join and the per-nation partial
    happen in-partition (the qualifying threshold is applied with
    integer cross-multiplication — acctbal_e2·n > sum_e2 — so no float
    average crosses the oracle boundary). No ceiling needed: neither
    full table is ever driver-resident."""

    def balance_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"]
        posm = pc.greater(bal, pa.scalar(0.0))
        t = batch.filter(posm)
        e2 = pc.cast(
            pc.round(
                pc.multiply(t["c_acctbal"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "sum_e2": pa.array([pc.sum(e2).as_py() or 0], type=pa.int64()),
                "n_pos": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    bal_ds = ray.data.read_parquet(
        table_path(sf_dir, "customer"), columns=["c_acctbal"]
    ).map_batches(balance_partial, batch_format="pyarrow", zero_copy_batch=True)
    sum_e2, n_pos = _scalar_fold(bal_ds, ["sum_e2", "n_pos"])

    def cust_side(batch: pa.Table) -> pa.Table:
        e2 = pc.cast(
            pc.round(
                pc.multiply(batch["c_acctbal"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        vals = e2.to_numpy(zero_copy_only=False).astype(np.int64)
        null = pc.is_null(batch["c_acctbal"]).to_numpy(zero_copy_only=False)
        rich = (~null) & (vals * n_pos > sum_e2)
        t = batch.filter(pa.array(rich))
        n = t.num_rows
        return pa.table(
            {
                "key": t["c_custkey"],
                "nationkey": t["c_nationkey"],
                "bal_e2": pa.array(vals[rich]),
                "is_cust": pa.array([True] * n, type=pa.bool_()),
            }
        )

    cutoff = _dt.datetime.fromisoformat(Q22_CUTOFF)

    def order_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(cutoff))
        )
        keys = t["o_custkey"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = keys.drop_null().unique()
        n = len(keys)
        return pa.table(
            {
                "key": keys,
                "nationkey": pa.array(np.zeros(n, dtype=np.int64)),
                "bal_e2": pa.array(np.zeros(n, dtype=np.int64)),
                "is_cust": pa.array([False] * n, type=pa.bool_()),
            }
        )

    cust = ray.data.read_parquet(
        table_path(sf_dir, "customer"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(cust_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)

    def anti_join(df: pd.DataFrame) -> pd.DataFrame:
        ordered = set(df.loc[~df["is_cust"], "key"])
        cu = df[df["is_cust"] & ~df["key"].isin(ordered)]
        g = cu.groupby("nationkey", sort=False, dropna=False).agg(
            numcust=("key", "size"), totacctbal_e2=("bal_e2", "sum")
        )
        out = g.reset_index()
        out["numcust"] = out["numcust"].astype("int64")
        out["totacctbal_e2"] = out["totacctbal_e2"].astype("int64")
        return out

    partials = hash_partitioned(
        cust.union(orders), "key", anti_join, coalesce_rows=1 << 20
    )
    folded = enum_group_sum(partials, ["nationkey"], ["numcust", "totacctbal_e2"])
    out = (
        folded.rename(columns={"nationkey": "c_nationkey"})
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    return out[["c_nationkey", "numcust", "totacctbal_e2"]]


TPCH_Q22_SQL = """
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS totacctbal_e2
FROM customer c, pos
WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) * pos.n > pos.s
  AND c.c_custkey NOT IN
      (SELECT o_custkey FROM orders
       WHERE o_custkey IS NOT NULL
         AND o_orderdate >= TIMESTAMP '{CUTOFF}')
GROUP BY c.c_nationkey
""".replace("{CUTOFF}", Q22_CUTOFF)

register("tpch_q8_market_share", tpch_q8_market_share, sql=TPCH_Q8_SQL)
register("tpch_q17_small_quantity", tpch_q17_small_quantity, sql=TPCH_Q17_SQL)
register(
    "tpch_q19_disjunctive_revenue", tpch_q19_disjunctive_revenue, sql=TPCH_Q19_SQL
)
register(
    "tpch_q22_global_sales_opportunity",
    tpch_q22_global_sales_opportunity,
    sql=TPCH_Q22_SQL,
)
