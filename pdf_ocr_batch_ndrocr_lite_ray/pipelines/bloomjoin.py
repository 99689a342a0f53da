"""Bloom-pushdown semi-join: the classic distributed join optimization.

"Lineitem rows whose order cleared a price threshold" is a fact-to-fact
semi-join; at 100 TB neither side broadcasts exactly. The production
pattern — what engines like Spark/Presto do under the name runtime/bloom
filter pushdown — is implemented here Ray-Data-first:

1. the build side (qualifying orders) folds per-block DISTINCT bloom bit
   positions; the driver ORs them into a DENSE bitmap whose broadcast
   size is fixed by the array width (2^20 bits → 128 KiB), NOT by the
   key count — the same bounded-broadcast discipline as ``docs_bloom_gate``;
2. the probe side streams through a fully VECTORIZED membership test
   (4 Knuth multiplicative hashes per key, numpy, no per-row Python) that
   drops ~`selectivity` of the probe rows before any exchange;
3. survivors (true matches + bloom false positives) co-partition with the
   qualifying keys on ONE hash exchange and verify EXACTLY in-partition —
   the bloom only prunes, it never decides, so the result is exact and
   the oracle is the plain SQL semi-join.

The exchange carries only the pruned survivor rows: the bloom's job is
that the all-to-all moves ~10% of lineitem instead of all of it
(prune-rate asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .exchange import enum_group_sum, hash_partitioned, int64_array
from .queryset import register, table_path

PRICE_THRESHOLD = 450_000.0  # selects ~10% of orders on this distribution
_BLOOM_BITS = 1 << 20
#: 4 distinct odd multipliers → 4 independent-ish Knuth hashes
_BLOOM_MULTS = (2654435761, 2246822519, 3266489917, 668265263)


def _bloom_positions_vec(keys: np.ndarray, j: int) -> np.ndarray:
    """Vectorized bit position j for int64 keys (uint64 wrap semantics)."""
    return (
        (keys.astype(np.uint64) * np.uint64(_BLOOM_MULTS[j])) >> np.uint64(15)
    ) % np.uint64(_BLOOM_BITS)


def _build_bloom(sf_dir: str) -> np.ndarray:
    """Dense uint8 bitmap of the qualifying order keys' bit positions.

    Per-block partials are DISTINCT positions (≤ min(4·rows, 2^20) int32
    rows); the driver fold is a bounded bitmap OR."""

    def positions_partial(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch["o_totalprice"], PRICE_THRESHOLD)
        keys = int64_array(batch["o_orderkey"].filter(mask))
        pos = np.unique(
            np.concatenate(
                [_bloom_positions_vec(keys, j) for j in range(len(_BLOOM_MULTS))]
            )
            if len(keys)
            else [np.empty(0, dtype=np.uint64)][0]
        )
        return pa.table({"pos": pa.array(pos.astype(np.int64), type=pa.int64())})

    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(positions_partial, batch_format="pyarrow", zero_copy_batch=True)
    bits = np.zeros(_BLOOM_BITS, dtype=bool)
    for b in ds.iter_batches(batch_size=65_536, batch_format="pandas"):
        bits[b["pos"].to_numpy()] = True
    return bits


def _probe_mask(keys: np.ndarray, bits: np.ndarray) -> np.ndarray:
    keep = np.ones(len(keys), dtype=bool)
    for j in range(len(_BLOOM_MULTS)):
        keep &= bits[_bloom_positions_vec(keys, j).astype(np.int64)]
    return keep


def _pruned_survivors(sf_dir: str, bits_ref) -> "ray.data.Dataset":
    """Probe-side pass: bloom-prune lineitem, emit survivor rows tagged
    for the exact verify exchange (qty pre-quantized to exact ints)."""

    def probe(batch: pa.Table) -> pa.Table:
        keys = int64_array(batch["l_orderkey"])
        bits = ray.get(bits_ref)
        keep = _probe_mask(keys, bits)
        t = batch.filter(pa.array(keep))
        # half_towards_infinity == DuckDB round() (half away from zero);
        # Arrow's default half_to_even would flip x.5 quantities
        qty = pc.cast(
            pc.round(t["l_quantity"], round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table(
            {
                "k": t["l_orderkey"].cast(pa.int64()),
                "l_returnflag": t["l_returnflag"],
                "qty": qty,
                "is_dim": pa.array([0] * len(t), type=pa.int8()),
            }
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_quantity"],
    ).map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def bloom_semi_join_pricing(sf_dir: str) -> "ray.data.Dataset":
    """(l_returnflag, n_rows, sum_qty): lineitem totals over orders with
    ``o_totalprice > 450000`` — bloom-pruned, exactly verified."""
    bits_ref = ray.put(_build_bloom(sf_dir))
    survivors = _pruned_survivors(sf_dir, bits_ref)

    def dim_partial(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch["o_totalprice"], PRICE_THRESHOLD)
        t = batch.filter(mask)
        u = pc.unique(
            t["o_orderkey"].combine_chunks()
            if isinstance(t["o_orderkey"], pa.ChunkedArray)
            else t["o_orderkey"]
        )
        return pa.table(
            {
                "k": u.cast(pa.int64()),
                "l_returnflag": pa.array([""] * len(u), type=pa.string()),
                "qty": pa.array([0] * len(u), type=pa.int64()),
                "is_dim": pa.array([1] * len(u), type=pa.int8()),
            }
        )

    dims = ray.data.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(dim_partial, batch_format="pyarrow", zero_copy_batch=True)

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        good = set(df.loc[df["is_dim"] == 1, "k"])
        facts = df[(df["is_dim"] == 0) & df["k"].isin(good)]
        out = (
            facts.groupby("l_returnflag", sort=False)
            .agg(n_rows=("k", "size"), sum_qty=("qty", "sum"))
            .reset_index()
        )
        out["n_rows"] = out["n_rows"].astype("int64")
        out["sum_qty"] = out["sum_qty"].astype("int64")
        return out

    merged = survivors.union(dims).repartition(64)
    partials = hash_partitioned(merged, "k", verify_partition)
    return ray.data.from_pandas(
        enum_group_sum(partials, ["l_returnflag"], ["n_rows", "sum_qty"])
    )


BLOOM_SEMI_JOIN_SQL = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > {PRICE_THRESHOLD}
GROUP BY 1
"""

register("bloom_semi_join_pricing", bloom_semi_join_pricing, sql=BLOOM_SEMI_JOIN_SQL)
