"""Market-basket co-occurrence mining over order line items.

The reference has no relational operators (SURVEY.md §2.6); this is the
classic frequent-itemset support count (the A-priori / PCY candidate step,
Agrawal & Srikant VLDB'94) re-expressed in the engine's exchange idiom:

1. in-block dedup of (order, part) pairs shrinks the exchange,
2. ONE order-key exchange co-locates each basket, making the in-partition
   dedup global and the per-basket pair fan-out complete (baskets are
   small — TPC-H orders carry ≤ 7 lines, so the quadratic step is bounded
   by C(distinct parts per order, 2), never by catalog size),
3. pair-count partials (complete per basket, partial across partitions)
   recombine and take ONE pair-key exchange, making in-partition sums the
   exact global support,
4. only pairs at/above the support threshold leave the partition; the
   driver folds a mergeable local-top-k per block (global top-k under a
   total (support DESC, part_a, part_b) order is a subset of the union of
   local top-ks).

Nothing catalog-sized or corpus-sized ever reaches the driver: stage 4's
candidate set is ≤ k × blocks rows. At 100 TB the two exchanges carry
(order, part) stubs and (pair, count) partials — never line-item rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .exchange import driver_topk_fold, hash_partitioned, recombine_partials
from .queryset import register, table_path

#: minimum global support (distinct orders containing both parts) for a
#: pair to survive stage 3 — the A-priori pruning knob.
MIN_SUPPORT = 2

#: pair keys pack as part_a * PAIR_BASE + part_b; loud guard below keeps
#: the packing collision-free (TPC-H partkeys are dense small ints; 2^31
#: leaves int64 headroom up to ~4.3e9 distinct parts).
_PAIR_BASE = 1 << 31


def _dedup_block(batch: pa.Table) -> pa.Table:
    """In-block distinct (orderkey, partkey) — NULL keys excluded (the SQL
    twin's inner self-join drops them via ``a.pk < b.pk``)."""
    import pyarrow.compute as pc

    m = pc.and_(pc.is_valid(batch["l_orderkey"]), pc.is_valid(batch["l_partkey"]))
    t = batch.filter(m)
    g = t.select(["l_orderkey", "l_partkey"]).group_by(
        ["l_orderkey", "l_partkey"]
    ).aggregate([])
    return g


def _basket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Complete pair fan-out for the baskets co-located in this partition:
    global dedup of (order, part), then for every order the C(m, 2)
    ascending part pairs, counted locally. Vectorized: one lexsort, one
    run-length pass, one repeat/gather per side."""
    if len(df) == 0:
        return pd.DataFrame(
            {
                "pair_key": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
    d = df.drop_duplicates(["l_orderkey", "l_partkey"])
    ok = d["l_orderkey"].to_numpy(dtype=np.int64)
    pk = d["l_partkey"].to_numpy(dtype=np.int64)
    if pk.size and int(pk.max()) >= _PAIR_BASE:
        raise ValueError(
            f"basket_part_pairs: partkey {int(pk.max()):,} exceeds the "
            f"pair-packing base ({_PAIR_BASE:,}); widen _PAIR_BASE"
        )
    order = np.lexsort((pk, ok))
    ok, pk = ok[order], pk[order]
    # basket boundaries: starts[i]..starts[i+1] is one order's sorted parts
    starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
    counts = np.diff(np.r_[starts, ok.size])
    # pair fan-out: for each basket of size m, emit m*(m-1)/2 (a, b) pairs
    # with a-index < b-index (parts are sorted, so part_a < part_b). Build
    # the flat index arrays without a Python loop over pairs: repeat each
    # element index (within its basket) by how many successors it has.
    within = np.arange(ok.size) - np.repeat(starts, counts)
    succ = np.repeat(counts, counts) - within - 1  # successors per element
    a_idx = np.repeat(np.arange(ok.size), succ)
    # b index = a index + (1..succ): a running offset within each a-group
    off = np.arange(a_idx.size) - np.repeat(
        np.r_[0, np.cumsum(succ)[:-1]], succ
    )
    b_idx = a_idx + off + 1
    if a_idx.size == 0:
        return pd.DataFrame(
            {
                "pair_key": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
    key = pk[a_idx] * _PAIR_BASE + pk[b_idx]
    uniq, cnt = np.unique(key, return_counts=True)
    return pd.DataFrame({"pair_key": uniq, "n": cnt.astype(np.int64)})


def _global_support(df: pd.DataFrame) -> pd.DataFrame:
    """Pair-key partition: in-partition sum IS the exact global support
    (every partial for a pair lands here); threshold prunes before any
    row leaves."""
    if len(df) == 0:
        return pd.DataFrame(
            {
                "part_a": pd.Series([], dtype="int64"),
                "part_b": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
            }
        )
    g = df.groupby("pair_key", sort=False)["n"].sum()
    g = g[g >= MIN_SUPPORT]
    keys = g.index.to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "part_a": keys // _PAIR_BASE,
            "part_b": keys % _PAIR_BASE,
            "n_orders": g.to_numpy(dtype=np.int64),
        }
    )


def basket_part_pairs(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """(part_a, part_b, n_orders): the top-k part pairs by number of
    distinct orders containing both (support ≥ MIN_SUPPORT), ordered by
    (support DESC, part_a, part_b) — fully deterministic incl. ties."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    ).map_batches(_dedup_block, batch_format="pyarrow", zero_copy_batch=True)
    baskets = hash_partitioned(
        ds, "l_orderkey", _basket_pairs, coalesce_rows=1 << 20
    )
    partials = recombine_partials(baskets, ["pair_key"], ["n"])
    supports = hash_partitioned(
        partials, "pair_key", _global_support, coalesce_rows=1 << 20
    )
    out = driver_topk_fold(
        supports, ["n_orders", "part_a", "part_b"], [False, True, True], k
    )
    if out is None or len(out) == 0:
        return pd.DataFrame(
            {
                "part_a": pd.Series([], dtype="int64"),
                "part_b": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
            }
        )
    out = out.reset_index(drop=True)
    return out[["part_a", "part_b", "n_orders"]].astype("int64")


BASKET_PART_PAIRS_SQL = f"""
WITH d AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders FROM p
WHERE n_orders >= {MIN_SUPPORT}
ORDER BY n_orders DESC, part_a, part_b
LIMIT 100
"""

register("basket_part_pairs", basket_part_pairs, sql=BASKET_PART_PAIRS_SQL)
