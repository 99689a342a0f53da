"""Cross-table referential-integrity audit (orphan-key counts).

A production ingest needs a cheap standing answer to "do my join keys
actually join": for each fact→dimension edge, how many fact ROWS carry a
key with no dimension match. Checked edges: lineitem→orders,
orders→customer, customer→nation, supplier→nation.

Scale shape — a distributed anti-join COUNT, not an anti-join result:
both sides reduce to (key, n) partials inside ``map_batches`` (fact side:
per-block key counts; dimension side: per-block distinct keys with n=0 and
a side tag), ONE hash exchange on the key co-locates every key's rows, and
each partition emits a single orphan-row subtotal — the driver folds ≤
#partitions integers per edge. Neither table is broadcast, so the audit
holds when BOTH sides are fact-scale (the case the broadcast anti-join
ceiling rejects); exchange volume is the distinct-key set, never rows.
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


def _orphan_rows(sf_dir: str, fact: str, fkey: str, dim: str, dkey: str) -> tuple[int, int]:
    """(n_rows, n_orphans) for one fact→dimension edge."""

    def fact_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"k": batch[fkey]}).group_by(["k"]).aggregate([([], "count_all")])
        g = g.rename_columns(["k", "n"])
        return g.append_column("is_dim", pa.array([0] * len(g), type=pa.int8()))

    def dim_partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(
            batch[dkey].combine_chunks()
            if isinstance(batch[dkey], pa.ChunkedArray)
            else batch[dkey]
        )
        return pa.table(
            {
                "k": u,
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

    def orphan_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", sort=False).agg(n=("n", "sum"), dim=("is_dim", "max"))
        return pd.DataFrame({"orphans": [int(g.loc[g["dim"] == 0, "n"].sum())]})

    parts = hash_partitioned(facts.union(dims), "k", orphan_partition)
    n_orphans = sum(
        int(b["orphans"].sum())
        for b in parts.iter_batches(batch_size=65_536, batch_format="pandas")
    )
    n_rows = ray.data.read_parquet(table_path(sf_dir, fact), columns=[fkey]).count()
    return n_rows, n_orphans


def ref_integrity_report(sf_dir: str) -> "pd.DataFrame":
    """(relation, n_rows, n_orphans) per audited fact→dimension edge."""
    rows = []
    for name, fact, fkey, dim, dkey in _EDGES:
        n_rows, n_orphans = _orphan_rows(sf_dir, fact, fkey, dim, dkey)
        rows.append({"relation": name, "n_rows": n_rows, "n_orphans": n_orphans})
    out = pd.DataFrame(rows)
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
