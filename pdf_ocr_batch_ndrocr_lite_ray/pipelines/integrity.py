"""Cross-table referential-integrity audit (orphan-key counts).

A production ingest needs a cheap standing answer to "do my join keys
actually join": for each fact→dimension edge, how many fact ROWS carry a
key with no dimension match. Checked edges: lineitem→orders,
orders→customer, customer→nation, supplier→nation.

Scale shape — a distributed anti-join COUNT, not an anti-join result:
every side of every edge reduces to (edge, key, n) partials inside
``map_batches`` (fact sides: per-block key counts; dimension sides:
per-block distinct keys with n=0 and a side tag), the tagged partials of
ALL FOUR edges union into ONE hash exchange on the key (the edge id rides
the rows and scopes the in-partition grouping, so four audits pay one
exchange's fixed cost — measured 4× cheaper than four sequential
exchanges), and each partition emits per-edge (orphan-rows, fact-rows)
subtotals — the driver folds ≤ #edges × #partitions rows. Neither table
is broadcast, so the audit holds when BOTH sides are fact-scale (the case
the broadcast anti-join ceiling rejects); exchange volume is the
distinct-key set, never rows.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import hash_partitioned
from .queryset import register, table_path

#: audited edges: (name, fact table, fact key, dimension table, dim key)
_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _edge_partials(sf_dir: str, edge: int, fact: str, fkey: str, dim: str, dkey: str):
    """Two datasets of tagged (edge, k, n, is_dim) partial rows."""

    def fact_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"k": batch[fkey]}).group_by(["k"]).aggregate([([], "count_all")])
        g = g.rename_columns(["k", "n"])
        return pa.table(
            {
                "edge": pa.array([edge] * len(g), type=pa.int8()),
                "k": g["k"].cast(pa.int64()),
                "n": g["n"],
                "is_dim": pa.array([0] * len(g), type=pa.int8()),
            }
        )

    def dim_partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(
            batch[dkey].combine_chunks()
            if isinstance(batch[dkey], pa.ChunkedArray)
            else batch[dkey]
        )
        return pa.table(
            {
                "edge": pa.array([edge] * len(u), type=pa.int8()),
                "k": u.cast(pa.int64()),
                "n": pa.array([0] * len(u), type=pa.int64()),
                "is_dim": pa.array([1] * len(u), type=pa.int8()),
            }
        )

    facts = ray.data.read_parquet(table_path(sf_dir, fact), columns=[fkey]).map_batches(
        fact_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    dims = ray.data.read_parquet(table_path(sf_dir, dim), columns=[dkey]).map_batches(
        dim_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return facts, dims


def _audit_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Per-edge (orphan-row, fact-row) subtotals for one key partition."""
    out = []
    for edge, g in df.groupby("edge", sort=False):
        # dropna=False: a NULL foreign key is the dirtiest case an
        # integrity audit exists for — it can never match a dimension row,
        # so it must count in BOTH n_rows and n_orphans (the oracle's LEFT
        # JOIN semantics)
        agg = g.groupby("k", sort=False, dropna=False).agg(
            n=("n", "sum"), dim=("is_dim", "max")
        )
        out.append(
            {
                "edge": int(edge),
                "orphans": int(agg.loc[agg["dim"] == 0, "n"].sum()),
                "rows": int(agg["n"].sum()),
            }
        )
    return pd.DataFrame(out, columns=["edge", "orphans", "rows"]).astype("int64")


def ref_integrity_report(sf_dir: str) -> "pd.DataFrame":
    """(relation, n_rows, n_orphans) per audited fact→dimension edge."""
    sides: list["ray.data.Dataset"] = []
    for i, (_, fact, fkey, dim, dkey) in enumerate(_EDGES):
        facts, dims = _edge_partials(sf_dir, i, fact, fkey, dim, dkey)
        sides.extend([facts, dims])
    # union SUMS the eight sides' block counts; coalesce before the
    # exchange or the groupby sorts hundreds of tiny partial blocks
    # (measured 41 s -> 8 s at sf0.1 on 32 cpus)
    merged = sides[0].union(*sides[1:]).repartition(64)
    parts = hash_partitioned(merged, "k", _audit_partition)
    totals = {i: {"orphans": 0, "rows": 0} for i in range(len(_EDGES))}
    for b in parts.iter_batches(batch_size=65_536, batch_format="pandas"):
        for _, r in b.iterrows():
            totals[int(r["edge"])]["orphans"] += int(r["orphans"])
            totals[int(r["edge"])]["rows"] += int(r["rows"])
    out = pd.DataFrame(
        {
            "relation": [e[0] for e in _EDGES],
            "n_rows": [totals[i]["rows"] for i in range(len(_EDGES))],
            "n_orphans": [totals[i]["orphans"] for i in range(len(_EDGES))],
        }
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_orphans"] = out["n_orphans"].astype("int64")
    return out


REF_INTEGRITY_SQL = """
SELECT 'lineitem->orders' AS relation,
       (SELECT count(*) FROM lineitem) AS n_rows,
       (SELECT count(*) FROM lineitem l LEFT JOIN orders o
          ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders x LEFT JOIN customer c
          ON x.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer c LEFT JOIN nation n
          ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
UNION ALL
SELECT 'supplier->nation',
       (SELECT count(*) FROM supplier),
       (SELECT count(*) FROM supplier s LEFT JOIN nation n
          ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
"""

register("ref_integrity_report", ref_integrity_report, sql=REF_INTEGRITY_SQL)


# --- order-vs-lineitem financial reconciliation (X148) --------------------------

RECON_TOP_K = 10


def orders_reconciliation(sf_dir: str) -> "pd.DataFrame":
    """Top-10 worst (o_orderkey, n_lines, total_e2, lines_sum_e2,
    diff_e2): the cross-table FINANCIAL reconciliation — does each
    order's header total match the sum of its lines' discounted+taxed
    amounts? The audit every ingest of double-entry data runs; headers
    with zero lines surface with the full total as the discrepancy.

    Exactness contract: each line's amount quantizes to integer cents
    PER ROW through one shared IEEE chain
    ``round(price * (1 - disc) * (1 + tax) * 100)`` (half away from
    zero on both engines), so per-order sums are order-free integer
    sums; ``diff_e2 = lines_sum - total`` is exact. Ranked by
    ``abs(diff) DESC, o_orderkey ASC`` — a total order, so the LIMIT
    set is deterministic at any scale.

    Scale shape: per-block (orderkey, sum, n) line partials and order
    stubs share ONE co-partition exchange (the Q18 idiom); each
    partition finishes its orders and feeds the mergeable local-top-k
    driver fold (driver holds ≤ k + one block's k rows).
    """
    import numpy as np

    from .exchange import driver_topk_fold

    def line_side(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.is_valid(batch["l_orderkey"]),
                pc.is_valid(batch["l_extendedprice"]),
            ),
            pc.and_(
                pc.is_valid(batch["l_discount"]), pc.is_valid(batch["l_tax"])
            ),
        )
        t = batch.filter(keep)
        amt = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        pc.multiply(
                            t["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), t["l_discount"]),
                        ),
                        pc.add(pa.scalar(1.0), t["l_tax"]),
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
                {
                    "key": t["l_orderkey"],
                    "amt": amt,
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by(["key"])
            .aggregate([("amt", "sum"), ("n", "sum")])
        )
        m = g.num_rows
        return pa.table(
            {
                "key": g["key"],
                "amt": g["amt_sum"],
                "n": g["n_sum"],
                "total": pa.array(np.zeros(m, dtype=np.int64)),
                "is_order": pa.array([False] * m, type=pa.bool_()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(batch["o_orderkey"]), pc.is_valid(batch["o_totalprice"])
        )
        t = batch.filter(keep)
        total = pc.cast(
            pc.round(
                pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        m = t.num_rows
        return pa.table(
            {
                "key": t["o_orderkey"],
                "amt": pa.array(np.zeros(m, dtype=np.int64)),
                "n": pa.array(np.zeros(m, dtype=np.int64)),
                "total": total,
                "is_order": pa.array([True] * m, type=pa.bool_()),
            }
        )

    lines = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)

    def local_recon(df: pd.DataFrame) -> pd.DataFrame:
        ords = df[df["is_order"]]
        if len(ords) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "n_lines": pd.Series(dtype="int64"),
                    "total_e2": pd.Series(dtype="int64"),
                    "lines_sum_e2": pd.Series(dtype="int64"),
                    "diff_e2": pd.Series(dtype="int64"),
                    "abs_diff": pd.Series(dtype="int64"),
                }
            )
        lns = df[~df["is_order"]].groupby("key", sort=False)[["amt", "n"]].sum()
        out = pd.DataFrame(
            {
                "o_orderkey": ords["key"].to_numpy(dtype="int64"),
                "n_lines": ords["key"].map(lns["n"]).fillna(0).astype("int64"),
                "total_e2": ords["total"].to_numpy(dtype="int64"),
                "lines_sum_e2": ords["key"].map(lns["amt"]).fillna(0).astype("int64"),
            }
        )
        out["diff_e2"] = out["lines_sum_e2"] - out["total_e2"]
        out["abs_diff"] = out["diff_e2"].abs()
        # local top-k: only candidates for the global top-k leave the partition
        return out.sort_values(
            ["abs_diff", "o_orderkey"], ascending=[False, True]
        ).head(RECON_TOP_K)

    from .exchange import hash_partitioned as _hp

    cand = _hp(lines.union(orders), "key", local_recon, coalesce_rows=1 << 20)
    top = driver_topk_fold(
        cand, by=["abs_diff", "o_orderkey"], ascending=[False, True], k=RECON_TOP_K
    )
    cols = {
        "o_orderkey": "int64", "n_lines": "int64", "total_e2": "int64",
        "lines_sum_e2": "int64", "diff_e2": "int64",
    }
    if top is None or len(top) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    return top.reset_index(drop=True)[list(cols)].astype(cols)


ORDERS_RECONCILIATION_SQL = f"""
WITH l AS (
  SELECT l_orderkey AS key,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT)
           AS lines_sum_e2,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
  GROUP BY l_orderkey
),
o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_e2
  FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
)
SELECT o.o_orderkey,
       coalesce(l.n_lines, 0) AS n_lines,
       o.total_e2,
       coalesce(l.lines_sum_e2, 0) AS lines_sum_e2,
       coalesce(l.lines_sum_e2, 0) - o.total_e2 AS diff_e2
FROM o LEFT JOIN l ON l.key = o.o_orderkey
ORDER BY abs(coalesce(l.lines_sum_e2, 0) - o.total_e2) DESC, o.o_orderkey ASC
LIMIT {RECON_TOP_K}
"""

register("orders_reconciliation", orders_reconciliation, sql=ORDERS_RECONCILIATION_SQL)


# --- declarative domain-rule audit (X161) -----------------------------------------

#: (rule name, SQL predicate over lineitem) — the single source of truth:
#: the Ray kernel below evaluates the same predicates vectorized, so rule
#: text and execution cannot drift
_NO_KEY = 1 << 62  # fold sentinel: above any real orderkey

LINEITEM_RULES: tuple[tuple[str, str], ...] = (
    ("quantity_positive", "l_quantity > 0"),
    ("price_positive", "l_extendedprice > 0"),
    ("discount_unit_range", "l_discount >= 0 AND l_discount <= 1"),
    ("tax_nonnegative", "l_tax >= 0"),
    ("shipdate_present", "l_shipdate IS NOT NULL"),
    ("returnflag_known", "l_returnflag IN ('A', 'N', 'R')"),
)


def lineitem_domain_audit(sf_dir: str) -> "pd.DataFrame":
    """(rule, n_checked, n_violations, min_violating_key): the
    Deequ-style declarative expectations check — every row is tested
    against each domain rule; violations count exactly and the smallest
    violating orderkey is kept as the reproducible example a triage
    engineer opens first. NULL predicate inputs count as violations
    (SQL three-valued logic: ``coalesce(pred, FALSE)`` on both engines)
    except where the rule itself tests for NULL.

    Scale shape: one column-pruned scan; each block emits ≤ #rules
    partial rows (counts + a min-key) into the bounded enum fold — zero
    shuffle, driver holds #rules rows.
    """
    import numpy as np

    from .exchange import enum_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        tax = batch["l_tax"].to_numpy(zero_copy_only=False).astype(np.float64)
        ship_null = pc.is_null(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        rf = batch["l_returnflag"].to_pandas()
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # coalesce(pred, FALSE): NaN comparisons are already False in numpy
        ok = {
            "quantity_positive": qty > 0,
            "price_positive": price > 0,
            "discount_unit_range": (disc >= 0) & (disc <= 1),
            "tax_nonnegative": tax >= 0,
            "shipdate_present": ~ship_null,
            "returnflag_known": rf.isin(["A", "N", "R"]).to_numpy(),
        }
        rules, n_checked, n_viol, min_key = [], [], [], []
        n = batch.num_rows
        for rule, _sql in LINEITEM_RULES:
            bad = ~ok[rule]
            rules.append(rule)
            n_checked.append(n)
            n_viol.append(int(bad.sum()))
            # +inf-style sentinel FOR THE FOLD (a -1 would win every min
            # and erase real keys); converted to the -1 output sentinel at
            # readout (NULL would stringify None-vs-NaN across engines)
            min_key.append(int(key[bad].min()) if bad.any() else _NO_KEY)
        return pa.table(
            {
                "rule": pa.array(rules, pa.string()),
                "n_checked": pa.array(n_checked, pa.int64()),
                "n_violations": pa.array(n_viol, pa.int64()),
                "min_violating_key": pa.array(min_key, pa.int64()),
            }
        )

    fold = enum_group_agg(
        ray.data.read_parquet(
            table_path(sf_dir, "lineitem"),
            columns=[
                "l_orderkey", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate", "l_returnflag",
            ],
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["rule"],
        {
            "n_checked": "sum",
            "n_violations": "sum",
            "min_violating_key": "min",
        },
    )
    cols = {
        "rule": "object", "n_checked": "int64",
        "n_violations": "int64", "min_violating_key": "int64",
    }
    if len(fold) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    fold = fold.sort_values("rule").reset_index(drop=True)
    fold["min_violating_key"] = np.where(
        fold["min_violating_key"].to_numpy(dtype=np.int64) == _NO_KEY,
        -1,
        fold["min_violating_key"].to_numpy(dtype=np.int64),
    )
    return fold.astype(cols)


def _lineitem_audit_sql() -> str:
    parts = []
    for rule, pred in LINEITEM_RULES:
        parts.append(f"""
SELECT '{rule}' AS rule,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(coalesce(sum(CASE WHEN coalesce({pred}, FALSE) THEN 0 ELSE 1 END),
                     0) AS BIGINT) AS n_violations,
       CAST(coalesce(min(l_orderkey) FILTER (
             WHERE NOT coalesce({pred}, FALSE)), -1) AS BIGINT)
         AS min_violating_key
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


register("lineitem_domain_audit", lineitem_domain_audit, sql=_lineitem_audit_sql())
