"""Distributed 2-D skyline (Pareto front) over ``orders`` (X123).

The skyline operator — rows not dominated by any other row under a
multi-criteria preference — is a classic relational extension
(Börzsönyi/Kossmann/Stocker, ICDE 2001) that Ray Data has no operator
for. The 2-D instance here prefers HIGH ``o_totalprice`` and EARLY
``o_orderdate`` ("the cheapest-to-serve big spenders"): a row survives
iff no other row has price ≥ AND date ≤ with at least one strict.

Ray-Data-first shape — the skyline merge property (the global skyline is
a subset of the union of per-block skylines) makes it a two-level fold
with NO exchange:

1. every block reduces to its LOCAL skyline with a fully vectorized
   kernel (one lexsort by (price DESC, date ASC), then two running
   minima: a row is dominated iff the min date over strictly-higher
   prices ≤ its date, or its price group's first date < its date);
2. the driver concatenates the block skylines (each is tiny — expected
   O(log block_rows) for independent dims) and runs the SAME kernel once.

A loud candidate cap guards the fold the way the broadcast helpers are
guarded: adversarially-correlated data (price rising with date) can make
the skyline itself O(n), and that's a result-size property no plan can
shrink — the error names the streaming alternative (emit per-block
skylines as a Dataset and let the consumer paginate).

Exactness: prices quantize to e2 fixed point per row (the shared money
contract), dates compare as raw int64 microseconds, and equal
(price, date) duplicates co-survive (neither strictly dominates), all of
which the DuckDB NOT-EXISTS oracle reproduces bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .queryset import register, table_path

#: driver-fold ceiling on (union of per-block skylines); hit only when the
#: skyline itself is a large fraction of the input (perfectly correlated
#: dims) — a result-size property, not a plan defect.
MAX_SKYLINE_CANDIDATES = 5_000_000


def _skyline_kernel(
    keys: np.ndarray, price: np.ndarray, date: np.ndarray
) -> np.ndarray:
    """Boolean keep-mask of the (price max, date min) skyline.

    Sorted by (price DESC, date ASC): row i is dominated iff
    min(date over strictly higher prices) <= date_i, or the first (=min)
    date inside its own price group < date_i.
    """
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((date, -price))
    p, d = price[order], date[order]
    grp_start = np.empty(len(p), dtype=bool)
    grp_start[:1] = True
    grp_start[1:] = p[1:] != p[:-1]
    start_idx = np.maximum.accumulate(
        np.where(grp_start, np.arange(len(p)), 0)
    )
    cummin_d = np.minimum.accumulate(d)
    m1 = np.where(
        start_idx > 0,
        cummin_d[np.maximum(start_idx - 1, 0)],
        np.iinfo(np.int64).max,
    )
    m2 = d[start_idx]  # first (min) date of the row's own price group
    dominated = (m1 <= d) | (m2 < d)
    keep = np.zeros(len(p), dtype=bool)
    keep[order] = ~dominated
    return keep


def orders_price_date_skyline(
    sf_dir: str, max_candidates: int = MAX_SKYLINE_CANDIDATES
) -> "pd.DataFrame":
    """(o_orderkey, price_e2, o_orderdate): the orders on the
    (price max, date min) Pareto front. See module docstring for the
    two-level merge shape and the candidate-cap rule."""

    def local_skyline(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(batch["o_totalprice"]), pc.is_valid(batch["o_orderdate"])
        )
        t = batch.filter(m)
        price = (
            pc.cast(
                pc.round(
                    pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        date = (
            pc.cast(t["o_orderdate"], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keys = (
            pc.cast(t["o_orderkey"], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = _skyline_kernel(keys, price, date)
        return pa.table(
            {
                "o_orderkey": pa.array(keys[keep]),
                "price_e2": pa.array(price[keep]),
                "date_us": pa.array(date[keep]),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    ).map_batches(local_skyline, batch_format="pyarrow", zero_copy_batch=True)

    frames = []
    n = 0
    for b in ds.iter_batches(batch_size=65_536, batch_format="pandas"):
        n += len(b)
        if n > max_candidates:
            raise ValueError(
                f"orders_price_date_skyline: block-skyline union exceeds "
                f"{max_candidates:,} candidate rows — the skyline itself is "
                "input-sized (correlated dimensions); consume the per-block "
                "skylines as a streamed Dataset and paginate instead of "
                "folding a driver-side front"
            )
        frames.append(b)
    if not frames:
        return pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "price_e2": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            }
        )
    cand = pd.concat(frames, ignore_index=True)
    keep = _skyline_kernel(
        cand["o_orderkey"].to_numpy(dtype=np.int64),
        cand["price_e2"].to_numpy(dtype=np.int64),
        cand["date_us"].to_numpy(dtype=np.int64),
    )
    out = cand[keep].sort_values("o_orderkey").reset_index(drop=True)
    return pd.DataFrame(
        {
            "o_orderkey": out["o_orderkey"].astype("int64"),
            "price_e2": out["price_e2"].astype("int64"),
            "o_orderdate": pd.to_datetime(out["date_us"], unit="us"),
        }
    )


ORDERS_SKYLINE_SQL = """
WITH s AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_e2,
         o_orderdate
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT a.o_orderkey, a.price_e2, a.o_orderdate
FROM s a
WHERE NOT EXISTS (
  SELECT 1 FROM s b
  WHERE b.price_e2 >= a.price_e2 AND b.o_orderdate <= a.o_orderdate
    AND (b.price_e2 > a.price_e2 OR b.o_orderdate < a.o_orderdate)
)
"""

register("orders_price_date_skyline", orders_price_date_skyline, sql=ORDERS_SKYLINE_SQL)
