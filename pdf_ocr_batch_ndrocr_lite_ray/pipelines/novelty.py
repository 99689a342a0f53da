"""Per-document n-gram novelty: how much of a doc exists nowhere else.

The inverse signal of the dedup family: for each document, of its DISTINCT
word trigrams (the exact shingle contract of `dedup.py`), how many have
corpus document-frequency 1 — i.e. appear in no other document? Training-
data pipelines use this as a uniqueness/quality cut (a doc whose shingles
all recur elsewhere is boilerplate even when no single pair-level duplicate
fires) and as the complement to `docs_duplicate_spans`.

Output is (doc_id, n_grams, n_novel) — integers only, so SQL parity is
exact by construction; consumers derive the novelty ratio. Token-free
documents have no shingles and are not reported (mirrors the SQL, where
they produce no shingle rows).

Distributed shape — per-doc partials need NO join back to a per-doc
table, because each doc's distinct-gram total is just the sum of its
per-partition group sizes:

1. distinct (doc_id, sh) rows — per-block, text never leaves stage 1;
2. hash exchange on ``sh``: df within the partition is total (a gram
   lives in exactly one partition) → per-doc partial (doc_id, n_grams,
   n_novel) rows, ≤ one per (doc, partition);
3. hash exchange on ``doc_id``: sum partials. Both exchanges carry
   fixed-width rows; no all-to-all of text, no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .dedup import _shingle_rows
from .exchange import hash_partitioned
from .queryset import register, table_path


def docs_novelty(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_grams, n_novel): distinct trigram count and the number
    with corpus df=1, per document with ≥ 1 token."""
    def pairs_only(batch):
        # _shingle_rows also emits the per-doc n_sh count (MinHash's
        # ride-along); novelty recomputes totals from group sizes, so
        # drop it before it rides the exchange for nothing
        return _shingle_rows(batch).select(["doc_id", "sh"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(pairs_only, batch_format="pyarrow")

    def per_gram_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_grams": pd.Series(dtype="int64"),
                    "n_novel": pd.Series(dtype="int64"),
                }
            )
        novel = df.groupby("sh")["doc_id"].transform("size").to_numpy() == 1
        g = df.assign(novel=novel.astype(np.int64)).groupby("doc_id", sort=False)
        out = g.agg(n_grams=("sh", "size"), n_novel=("novel", "sum")).reset_index()
        return out.astype({"n_grams": "int64", "n_novel": "int64"})

    partials = hash_partitioned(ds, "sh", per_gram_partition)

    def per_doc_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return (
            df.groupby("doc_id", sort=False)[["n_grams", "n_novel"]]
            .sum()
            .reset_index()
            .astype({"n_grams": "int64", "n_novel": "int64"})
        )

    return hash_partitioned(partials, "doc_id", per_doc_partition)


NOVELTY_SQL = """
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
s AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
              ELSE ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT)+1] || ' ' || ws[CAST(i AS INT)+2]
         END AS sh
  FROM w, LATERAL UNNEST(generate_series(1, greatest(len(ws)-2, CASE WHEN len(ws) > 0 THEN 1 ELSE 0 END))) u(i)
  WHERE len(ws) > 0
),
d AS (SELECT DISTINCT doc_id, sh FROM s),
gdf AS (SELECT sh, count(*) AS df FROM d GROUP BY sh)
SELECT d.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
FROM d JOIN gdf USING (sh)
GROUP BY d.doc_id
"""

register("docs_novelty", docs_novelty, sql=NOVELTY_SQL)
