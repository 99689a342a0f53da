"""Per-source mixture capping — the "data mixing" step of corpus prep.

Training mixes are built by capping or reweighting each source's share
(C4/Pile/Dolma all publish per-source document budgets); the operator
form is "keep at most Q documents per source, chosen deterministically".
Determinism matters for resumability: the pick must be a pure function
of (doc_id, source), not of arrival order — so the priority is the
``md5(doc_id)`` hash (a stable shuffle), with ``doc_id`` breaking the
(practically impossible) hash ties.

Distributed shape:

- the ONLY columns that ride the exchange are (doc_id, source, priority)
  — never text; downstream stages semi-join the kept ids against the
  corpus (the id-list output convention of :mod:`.dedup`);
- one hash partition on ``source`` co-locates each source's rows; rank =
  position in an in-partition (priority, doc_id) sort, ``picked`` =
  rank ≤ Q. A pathologically dominant source concentrates its (24-byte)
  rows in one partition — at 100 TB scale the fix is the two-phase
  order-statistic (per-block partial top-Q, then rank among ≤ Q × blocks
  survivors), which this composes to because the per-block top-Q is a
  superset of the global top-Q; the direct form keeps the oracle exact
  at test scale.

Oracle: ``row_number() OVER (PARTITION BY source ORDER BY priority,
doc_id) <= Q`` — the engine's sort and the window function see the same
total order by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .exchange import hash_partitioned
from .exchange import int64_array as _int64_array
from .queryset import register, table_path
from .sampling import _hash_bucket

MIX_QUOTA = 10  # max docs kept per source


def _priority(doc_ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable 32-bit md5-prefix priority, reproducible in DuckDB as
    ``('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT``."""
    return _hash_bucket(doc_ids, mod=1 << 32)


def docs_mixture_cap(sf_dir: str, quota: int = MIX_QUOTA) -> "ray.data.Dataset":
    """(doc_id, source, rank, picked): rank within source by hash
    priority; ``picked`` marks the ≤ quota survivors per source."""

    def rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "source": batch["source"],
                "priority": pa.array(_priority(batch["doc_id"]), type=pa.int64()),
            }
        )

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "source": pd.Series(dtype="object"),
                    "rank": pd.Series(dtype="int64"),
                    "picked": pd.Series(dtype="bool"),
                }
            )
        df = df.sort_values(["source", "priority", "doc_id"], kind="mergesort")
        # dropna=False: a NULL source is its own group, same as DuckDB's
        # row_number() OVER (PARTITION BY source) — without it pandas
        # silently yields NaN ranks for null-source rows
        rank = df.groupby("source", sort=False, dropna=False).cumcount().to_numpy() + 1
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "source": df["source"].to_numpy(),
                "rank": rank.astype(np.int64),
                "picked": rank <= quota,
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "source"]
    ).map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partitioned(ds, "source", rank_partition)


def _mixture_oracle_sql(quota: int = MIX_QUOTA) -> str:
    return f"""
SELECT doc_id, source, rank, rank <= {quota} AS picked FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS rank
  FROM documents
)
"""


register("docs_mixture_cap", docs_mixture_cap, sql=_mixture_oracle_sql())


# --- temperature-scaled mixture sampling ------------------------------------

#: scale constant: quota_s = max(1, floor(TEMP_C * sqrt(n_s)))
TEMP_C = 3.0


def docs_temperature_mixture(sf_dir: str, c: float = TEMP_C) -> "ray.data.Dataset":
    """(doc_id, source): sqrt-temperature mixture sample — keep
    ``max(1, floor(c·√n_s))`` docs per source, hash-priority order.

    The α=0.5 temperature flattens a Zipfian source mix (the multilingual/
    multi-source reweighting every large training mix publishes): a source
    4× larger contributes only 2× the documents. Quotas are UNNORMALIZED
    (per-source only — no cross-source share sum), which is what makes the
    float path SQL-parity-safe: ``sqrt`` is correctly rounded on both
    sides, the product with the integer-valued constant is one rounded op,
    and no order-dependent float accumulation exists anywhere.

    Shape: one bounded (#sources) count fold → broadcast quota dict → the
    same single hash exchange as :func:`docs_mixture_cap`.
    """
    from .exchange import enum_group_sum

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "source"]
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby("source", sort=False, dropna=False).size()
        return pd.DataFrame({"source": vc.index.to_numpy(), "n": vc.to_numpy()})

    counts = enum_group_sum(
        ds.map_batches(count_partial, batch_format="pandas"), ["source"], ["n"]
    )
    quotas = {
        s: max(1, int(np.floor(c * np.sqrt(float(n)))))
        for s, n in zip(counts["source"], counts["n"])
    }
    quota_ref = ray.put(quotas)

    def rows(batch: pa.Table) -> pa.Table:
        # two-phase order statistic: each block pre-prunes to its LOCAL
        # top-quota per source before the exchange (the global top-Q is a
        # subset of the union of block top-Qs), so a pathologically
        # dominant source ships ≤ quota × blocks rows instead of n_s —
        # the escalation the docs_mixture_cap docstring describes,
        # applicable here because only the kept rows are emitted
        q = ray.get(quota_ref)
        df = pd.DataFrame(
            {
                "doc_id": _int64_array(batch["doc_id"]),
                "source": batch["source"].to_pandas(),
                "priority": _priority(batch["doc_id"]),
            }
        )
        df = df.sort_values(["source", "priority", "doc_id"], kind="mergesort")
        rank = df.groupby("source", sort=False, dropna=False).cumcount().to_numpy() + 1
        cap = df["source"].map(q).to_numpy()
        keep = df[rank <= cap]
        return pa.table(
            {
                "doc_id": pa.array(keep["doc_id"].to_numpy(), type=pa.int64()),
                "source": pa.array(keep["source"]),
                "priority": pa.array(keep["priority"].to_numpy(), type=pa.int64()),
            }
        )

    def pick_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "source": pd.Series(dtype="object"),
                }
            )
        q = ray.get(quota_ref)
        df = df.sort_values(["source", "priority", "doc_id"], kind="mergesort")
        rank = df.groupby("source", sort=False, dropna=False).cumcount().to_numpy() + 1
        cap = df["source"].map(q).to_numpy()
        keep = df[rank <= cap]
        return pd.DataFrame(
            {"doc_id": keep["doc_id"].to_numpy(), "source": keep["source"].to_numpy()}
        )

    return hash_partitioned(
        ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True),
        "source",
        pick_partition,
    )


def _temperature_oracle_sql(c: float = TEMP_C) -> str:
    return f"""
WITH q AS (
  SELECT source, greatest(1, CAST(floor({c} * sqrt(count(*))) AS BIGINT)) AS quota
  FROM documents GROUP BY source
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS rk
  FROM documents
)
SELECT r.doc_id, r.source FROM r JOIN q USING (source) WHERE rk <= quota
"""


register(
    "docs_temperature_mixture", docs_temperature_mixture, sql=_temperature_oracle_sql()
)
