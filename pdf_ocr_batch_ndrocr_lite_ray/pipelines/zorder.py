"""Z-order (Morton) layout keys for multi-dimensional read pruning.

Petabyte-scale tables prune reads by sorting the layout on a
space-filling curve over the columns queries filter on (the technique
behind Delta/Iceberg OPTIMIZE ZORDER; cf. the petabyte-repartition
literature): interleave the bits of the dimension keys so rows close in
EVERY dimension land in the same file/row-group, and min-max footer
stats prune both dimensions at once.

This operator computes the curve key — (doc_id, zkey) over the two
dimensions a documents-table query actually filters on, ``n_chars``
(range predicates) and ``source`` (equality) — as a pure embarrassingly-
parallel map. Writing the layout is then just
``sort(zkey).write_parquet`` (the engine's existing ordered-write path);
the key, being the part that must be EXACT and stable forever (rewriting
history breaks pruning), carries the SQL oracle.

Key construction (16 bits per dimension, so the key fits easily in
int64): ``x`` = n_chars clamped to [0, 65535]; ``y`` = the first 2 md5
hex digits of source × 256 (dictionary dimension spread across the
curve); zkey interleaves x into even bits, y into odd bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .queryset import register, table_path

_BITS = 16


def _interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton-interleave two uint16 vectors into int64 (x even, y odd)."""
    z = np.zeros(len(x), dtype=np.int64)
    for b in range(_BITS):
        z |= ((x >> b) & 1).astype(np.int64) << (2 * b)
        z |= ((y >> b) & 1).astype(np.int64) << (2 * b + 1)
    return z


def docs_zorder_key(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, zkey): the Morton layout key over (n_chars, source)."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
    )

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        x = np.clip(df["n_chars"].to_numpy(dtype=np.int64), 0, 65535).astype(np.int64)
        # first md5 byte of source, scaled to use the full 16-bit range;
        # pairs with SQL ('0x' || substr(md5(source), 1, 2))::INT * 256
        srcs = {s: int(hashlib.md5(str(s).encode()).hexdigest()[:2], 16) * 256
                for s in df["source"].unique()}
        y = df["source"].map(srcs).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "zkey": _interleave(x, y)}
        )

    return ds.map_batches(keys, batch_format="pandas")


def _zorder_sql() -> str:
    # unrolled bit interleave: SQL has no loops, but 16 bits × 2 dims is a
    # fixed 32-term sum of shifts — exactly reproducible
    terms = []
    for b in range(_BITS):
        terms.append(f"(((x >> {b}) & 1) << {2 * b})")
        terms.append(f"(((y >> {b}) & 1) << {2 * b + 1})")
    expr = " + ".join(terms)
    return f"""
WITH dims AS (
  SELECT doc_id,
         least(greatest(n_chars, 0), 65535)::BIGINT AS x,
         (('0x' || substr(md5(source), 1, 2))::INT * 256)::BIGINT AS y
  FROM documents
)
SELECT doc_id, CAST({expr} AS BIGINT) AS zkey FROM dims
"""


register("docs_zorder_key", docs_zorder_key, sql=_zorder_sql())
