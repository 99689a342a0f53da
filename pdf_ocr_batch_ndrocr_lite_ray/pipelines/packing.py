"""Greedy document packing — the sequence-packing step of LLM training prep.

Training pipelines concatenate documents into fixed-token-budget bins
("packing") to avoid padding waste; the assignment step is a greedy
first-fit-in-order scan: walk documents in a deterministic order, open a
new bin whenever the next document would overflow the budget, oversized
documents get a bin of their own.

A global greedy scan is inherently sequential, so the distributed shape
shards it: documents hash into ``PACK_PARTITIONS`` independent streams
(``doc_id % P``) and each partition packs ITS documents in doc_id order —
the standard trade (bin count within P bins of a global scan's, in
exchange for embarrassing parallelism). Partition count is the scale
knob: at 100 TB you raise P so each partition's sequential scan stays
block-sized; bin ids stay globally unique via ``part * 1e6 + local``.

The per-partition scan is an honest per-row loop over ints — greedy
reset-on-overflow has a loop-carried dependency that no prefix-sum
expresses exactly — bounded by partition size, which partitioning keeps
small. The SQL oracle replays the identical scan as a recursive CTE
stepping ``row_number`` per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import hash_partitioned as _hash_partitioned
from .exchange import int64_array as _int64_array
from .queryset import register, table_path

PACK_BUDGET = 256  # tokens per bin (docs here run 10-99 tokens)
PACK_PARTITIONS = 32
_BIN_STRIDE = 1_000_000  # bin_id = part * stride + local index


def _doc_tokens(sf_dir: str) -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.fill_null(batch["text"], ""), r"\S+")
        ids = _int64_array(batch["doc_id"])
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "part": pa.array(ids % PACK_PARTITIONS, type=pa.int64()),
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _pack_partition(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for part, g in df.groupby("part", sort=True):
        g = g.sort_values("doc_id", kind="stable")
        ns = g["n_tokens"].to_numpy(dtype=np.int64)
        bins = np.empty(len(ns), dtype=np.int64)
        bin_idx, fill = 0, 0
        for i, n in enumerate(ns):
            if i > 0 and fill + n > PACK_BUDGET:
                bin_idx += 1
                fill = n
            else:
                fill += n
            bins[i] = bin_idx
        out.append(
            pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "bin_id": part * _BIN_STRIDE + bins,
                    "n_tokens": ns,
                }
            )
        )
    if not out:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "bin_id": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
            }
        )
    return pd.concat(out, ignore_index=True)


def docs_pack_greedy(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, bin_id, n_tokens): greedy first-fit packing into
    ``PACK_BUDGET``-token bins, ``PACK_PARTITIONS`` independent streams."""
    return _hash_partitioned(_doc_tokens(sf_dir), "part", _pack_partition)


DOCS_PACK_SQL = rf"""
WITH RECURSIVE docs AS (
  SELECT doc_id, doc_id % {PACK_PARTITIONS} AS part,
         len(regexp_extract_all(text, '\S+')) AS n_tokens
  FROM documents
),
ord AS (
  SELECT doc_id, part, n_tokens,
         row_number() OVER (PARTITION BY part ORDER BY doc_id) AS rn
  FROM docs
),
pack(part, rn, doc_id, n_tokens, bin_idx, fill) AS (
  SELECT part, rn, doc_id, n_tokens, 0, n_tokens FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.part, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.fill + o.n_tokens > {PACK_BUDGET}
              THEN p.bin_idx + 1 ELSE p.bin_idx END,
         CASE WHEN p.fill + o.n_tokens > {PACK_BUDGET}
              THEN o.n_tokens ELSE p.fill + o.n_tokens END
  FROM pack p JOIN ord o ON o.part = p.part AND o.rn = p.rn + 1
)
SELECT doc_id, part * {_BIN_STRIDE} + bin_idx AS bin_id, n_tokens FROM pack
"""


register("docs_pack_greedy", docs_pack_greedy, sql=DOCS_PACK_SQL)


def docs_pack_efficiency(sf_dir: str) -> "ray.data.Dataset":
    """(fill_decile, n_bins, total_tokens): packing-efficiency histogram —
    bins bucketed by fill ratio in tenths of the budget. The padding-waste
    report every packing run is judged by: a left-heavy histogram means the
    budget or the doc-length mix is wrong and GPU-hours become padding.

    Shape: rides the packed assignment; bin fills are summed IN-PARTITION
    (a bin lives entirely inside its packing partition by construction, so
    no second exchange is needed — the partition key is derivable from
    bin_id), then the decile histogram is a bounded (11-row) fold."""
    from .exchange import enum_group_sum
    from .exchange import hash_partitioned as _hp

    packed = docs_pack_greedy(sf_dir)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        fills = df.groupby("bin_id")["n_tokens"].sum()
        # decile of budget, clamped: oversized single-doc bins land at 10
        decile = np.minimum(
            (fills.to_numpy(dtype=np.int64) * 10) // PACK_BUDGET, 10
        )
        hist = pd.DataFrame({"fill_decile": decile, "tok": fills.to_numpy()})
        g = hist.groupby("fill_decile").agg(
            n_bins=("tok", "size"), total_tokens=("tok", "sum")
        )
        return g.reset_index()

    # bins are partition-local (bin_id = part*stride + local), so hashing
    # on bin_id re-partitions WITHOUT splitting any bin across partitions
    partials = _hp(packed, "bin_id", per_partition)
    return ray.data.from_pandas(
        enum_group_sum(partials, ["fill_decile"], ["n_bins", "total_tokens"])
    )


DOCS_PACK_EFFICIENCY_SQL = rf"""
WITH pack AS ({DOCS_PACK_SQL}),
fills AS (
  SELECT bin_id, CAST(sum(n_tokens) AS BIGINT) AS fill
  FROM pack GROUP BY bin_id
)
SELECT least(fill * 10 // {PACK_BUDGET}, 10) AS fill_decile,
       count(*) AS n_bins,
       CAST(sum(fill) AS BIGINT) AS total_tokens
FROM fills GROUP BY 1
"""

register("docs_pack_efficiency", docs_pack_efficiency, sql=DOCS_PACK_EFFICIENCY_SQL)
