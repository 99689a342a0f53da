"""Incremental (delta) dedup: admit an incoming batch against an existing
corpus without re-ingesting duplicates.

The production shape every growing training corpus needs (the corpus-scope
generalization of the reference's re-processing skip rule, app.py:86-87,
1306-1323: "don't process what a previous run already produced"): the
existing corpus is already deduped; a new crawl/delivery arrives; each
incoming document is admitted iff its content fingerprint appears neither
in the existing corpus nor earlier (by ``doc_id``) in the same incoming
batch.

Plan (one pass + ONE hash exchange, nothing on the driver):

    corpus → fingerprint+side (md5 of whitespace-normalized text;
             side = hash-bucket(doc_id) < INCOMING_PCT → "incoming")
    → hash-partition by fingerprint (only (doc_id, fingerprint, side)
      rows move — raw text never leaves stage 1)
    → per-partition resolve: incoming rows labeled
      new / dup_of_existing / dup_in_batch

At 100 TB the existing side would not be re-fingerprinted per run: its
fingerprints live as a persisted index parquet partitioned by fingerprint
prefix, and only the (small) incoming batch shuffles — the exchange here is
the same; the existing side just reads pre-partitioned. ``dup_in_batch``
uses first-wins by min doc_id — the reference's L7 dedup rule
(app.py:1709-1725) at corpus scope.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import CORPUS_SQL, corpus
from .exchange import hash_partitioned as _hash_partitioned
from .queryset import register
from .sampling import _bucket_sql, _hash_bucket

#: share of the planted-dup corpus treated as the "incoming" delivery
INCOMING_PCT = 20


def _fingerprint_side(batch: pa.Table) -> pa.Table:
    # md5, not a faster hash: the oracle must reproduce the fingerprint in
    # DuckDB (md5() is the only shared digest), same as dedup_exact
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(batch["text"], pattern=r"\s+", replacement=" ")
    )
    fp = pa.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()],
        type=pa.string(),
    )
    side = pa.array(
        np.where(_hash_bucket(batch["doc_id"]) < INCOMING_PCT, "incoming", "existing")
    )
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": fp, "side": side})


def _resolve_partition(df: pd.DataFrame) -> pd.DataFrame:
    existing = set(df.loc[df["side"] == "existing", "fingerprint"])
    inc = df[df["side"] == "incoming"].sort_values(["fingerprint", "doc_id"])
    if inc.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "fingerprint": pd.Series(dtype="object"),
                "status": pd.Series(dtype="object"),
            }
        )
    first = ~inc.duplicated("fingerprint")  # sorted by doc_id → first == min
    status = np.where(
        inc["fingerprint"].isin(existing),
        "dup_of_existing",
        np.where(first, "new", "dup_in_batch"),
    )
    return pd.DataFrame(
        {
            "doc_id": inc["doc_id"].to_numpy(),
            "fingerprint": inc["fingerprint"].to_numpy(),
            "status": status,
        }
    )


def docs_dedup_incremental(sf_dir: str) -> "ray.data.Dataset":
    """Admission labels for the incoming delivery: (doc_id, fingerprint,
    status ∈ new | dup_of_existing | dup_in_batch)."""
    ds = corpus(sf_dir).map_batches(
        _fingerprint_side, batch_format="pyarrow", zero_copy_batch=True
    )
    return _hash_partitioned(ds, "fingerprint", _resolve_partition)


DEDUP_INCREMENTAL_SQL = f"""
WITH {CORPUS_SQL},
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
         CASE WHEN {_bucket_sql()} < {INCOMING_PCT}
              THEN 'incoming' ELSE 'existing' END AS side
  FROM corpus
),
inc AS (
  SELECT doc_id, fingerprint,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM fp WHERE side = 'incoming'
)
SELECT doc_id, fingerprint,
       CASE WHEN fingerprint IN (SELECT fingerprint FROM fp WHERE side = 'existing')
            THEN 'dup_of_existing'
            WHEN rn > 1 THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM inc
"""

register("docs_dedup_incremental", docs_dedup_incremental, sql=DEDUP_INCREMENTAL_SQL)
