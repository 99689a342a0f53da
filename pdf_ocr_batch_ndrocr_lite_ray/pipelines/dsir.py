"""DSIR-style importance weighting over hashed token features.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
public method): score each raw document by how much its hashed-token
feature distribution looks like a TARGET domain vs the RAW corpus, then
keep the highest-weight documents. Here the target is the corpus's own
``lang = 'en'`` slice (any metadata predicate slots in), features are
md5-hashed unigram buckets, and the weight is the standard smoothed
log-likelihood ratio.

Numeric contract (what makes the SQL oracle value-exact): the per-bucket
log ratios are quantized to int64 fixed point (1e-9 units) BEFORE the
per-document sum, so the document weight is an exact integer dot product
— order-free on both sides — rather than a float sum whose value depends
on reduction order:

    ratio_e9[b] = floor(ln(((t[b]+1)·(R+B)) / ((r[b]+1)·(T+B))) · 1e9 + .5)
    weight_e9(doc) = Σ_b count_doc[b] · ratio_e9[b]

Distributed shape (no all-to-all at any step):

1. bucket histogram: per-block partial counts over B=256 buckets →
   bounded driver fold (`enum_group_sum`) → 256-entry ratio table
   broadcast via ``ray.put``;
2. weights: one embarrassingly-parallel pass — tokens → buckets →
   ``np.bincount`` → integer dot with the broadcast table;
3. resample: per-block top-M rows fold on the driver (mergeable
   first-M under (weight DESC, doc_id)), ≤ M × blocks rows ever held.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .exchange import enum_group_sum
from .queryset import register, table_path

#: hashed-feature buckets (md5 first byte)
DSIR_BUCKETS = 256

#: documents kept by the resample query
DSIR_TOP_M = 120

#: the target-domain predicate (SQL literal and engine mask must agree)
_TARGET_LANG = "en"


@lru_cache(maxsize=65_536)
def _bucket_of(term: str) -> int:
    """md5-first-byte bucket; pairs with SQL
    ``('0x' || substr(md5(term), 1, 2))::INT``."""
    return int(hashlib.md5(term.encode()).hexdigest()[:2], 16)


def _terms(texts: "pd.Series") -> "pd.Series":
    """Lowercase ``[a-z]+`` tokens (the tf-idf/PMI term contract),
    exploded WITH repeats — counts matter here."""
    return texts.fillna("").str.lower().str.findall(r"[a-z]+").explode().dropna()


def _ratio_table(sf_dir: str) -> np.ndarray:
    """int64[DSIR_BUCKETS] fixed-point log ratios from one histogram pass."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["text", "lang"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # one tokenize + one bucket-hash pass; the target slice is a row
        # mask gathered through the exploded index, not a second pass
        df = df.reset_index(drop=True)
        t = _terms(df["text"])
        if len(t) == 0:
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int64"),
                    "r_cnt": pd.Series(dtype="int64"),
                    "t_cnt": pd.Series(dtype="int64"),
                }
            )
        b = np.fromiter((_bucket_of(x) for x in t), dtype=np.int64, count=len(t))
        is_target = (df["lang"] == _TARGET_LANG).to_numpy()[
            t.index.to_numpy(dtype=np.int64)
        ]
        r_cnt = np.bincount(b, minlength=DSIR_BUCKETS)
        t_cnt = np.bincount(b[is_target], minlength=DSIR_BUCKETS)
        nz = np.nonzero(r_cnt)[0]
        return pd.DataFrame(
            {"bucket": nz, "r_cnt": r_cnt[nz], "t_cnt": t_cnt[nz]}
        )

    hist = enum_group_sum(
        ds.map_batches(partial, batch_format="pandas"), ["bucket"], ["r_cnt", "t_cnt"]
    )
    r = np.zeros(DSIR_BUCKETS, dtype=np.float64)
    t = np.zeros(DSIR_BUCKETS, dtype=np.float64)
    if len(hist):
        r[hist["bucket"].to_numpy()] = hist["r_cnt"].to_numpy()
        t[hist["bucket"].to_numpy()] = hist["t_cnt"].to_numpy()
    r_tot, t_tot = r.sum(), t.sum()
    # the expression SHAPE mirrors the SQL exactly: exact integer-valued
    # products, one correctly-rounded division, then ln and e9 rounding
    ratio = np.log(
        ((t + 1.0) * (r_tot + float(DSIR_BUCKETS)))
        / ((r + 1.0) * (t_tot + float(DSIR_BUCKETS)))
    )
    return np.floor(ratio * 1e9 + 0.5).astype(np.int64)


def docs_importance_weights(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, weight_e9): exact fixed-point DSIR log-likelihood weight
    for every document (0 for token-free docs)."""
    ratio_ref = ray.put(_ratio_table(sf_dir))
    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    )

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        ratio = ray.get(ratio_ref)
        df = df.reset_index(drop=True)
        exploded = df["text"].fillna("").str.lower().str.findall(r"[a-z]+").explode().dropna()
        weights = np.zeros(len(df), dtype=np.int64)
        if len(exploded):
            b = np.fromiter(
                (_bucket_of(x) for x in exploded), dtype=np.int64, count=len(exploded)
            )
            rows = exploded.index.to_numpy(dtype=np.int64)
            # per-row integer dot product: int64 ratios summed as float64 stay
            # exact (|weight| << 2^53), then cast back
            weights = np.bincount(rows, weights=ratio[b].astype(np.float64),
                                  minlength=len(df)).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "weight_e9": weights})

    return ds.map_batches(weigh, batch_format="pandas")


def docs_importance_resample(sf_dir: str, m: int = DSIR_TOP_M) -> "pa.Table":
    """Top-m docs by (weight_e9 DESC, doc_id ASC) — the resampled keep-set.
    Per-block partial top-m folds on the driver; no global sort."""
    from .exchange import driver_topk_fold

    ds = docs_importance_weights(sf_dir)
    best = driver_topk_fold(ds, ["weight_e9", "doc_id"], [False, True], m)
    if best is None:
        best = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "weight_e9": pd.Series(dtype="int64")})
    return pa.table(
        {
            "doc_id": pa.array(best["doc_id"].to_numpy(), type=pa.int64()),
            "weight_e9": pa.array(best["weight_e9"].to_numpy(), type=pa.int64()),
        }
    )


_DSIR_CORE_SQL = f"""
toks AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tb AS (SELECT doc_id, lang, ('0x' || substr(md5(term), 1, 2))::INT AS bucket FROM toks),
buckets AS (SELECT unnest(range({DSIR_BUCKETS})) AS bucket),
cnt AS (
  SELECT bucket, count(*) AS r_cnt,
         count(*) FILTER (WHERE lang = '{_TARGET_LANG}') AS t_cnt
  FROM tb GROUP BY bucket
),
cnt_full AS (
  SELECT b.bucket, coalesce(r_cnt, 0) AS r_cnt, coalesce(t_cnt, 0) AS t_cnt
  FROM buckets b LEFT JOIN cnt USING (bucket)
),
tot AS (SELECT sum(r_cnt)::DOUBLE AS r_tot, sum(t_cnt)::DOUBLE AS t_tot FROM cnt_full),
ratio AS (
  SELECT bucket,
         CAST(floor(ln(((t_cnt + 1.0) * (r_tot + {DSIR_BUCKETS}.0))
                       / ((r_cnt + 1.0) * (t_tot + {DSIR_BUCKETS}.0))) * 1e9 + 0.5)
              AS BIGINT) AS ratio_e9
  FROM cnt_full, tot
),
docb AS (SELECT doc_id, bucket, count(*) AS c FROM tb GROUP BY doc_id, bucket),
w AS (
  SELECT doc_id, CAST(sum(c * ratio_e9) AS BIGINT) AS weight_e9
  FROM docb JOIN ratio USING (bucket) GROUP BY doc_id
),
wfull AS (
  SELECT d.doc_id, coalesce(w.weight_e9, CAST(0 AS BIGINT)) AS weight_e9
  FROM documents d LEFT JOIN w USING (doc_id)
)
"""

DSIR_WEIGHTS_SQL = f"WITH {_DSIR_CORE_SQL} SELECT doc_id, weight_e9 FROM wfull"

DSIR_RESAMPLE_SQL = f"""
WITH {_DSIR_CORE_SQL}
SELECT doc_id, weight_e9 FROM wfull
QUALIFY row_number() OVER (ORDER BY weight_e9 DESC, doc_id) <= {DSIR_TOP_M}
"""

register("docs_importance_weights", docs_importance_weights, sql=DSIR_WEIGHTS_SQL)
register("docs_importance_resample", docs_importance_resample, sql=DSIR_RESAMPLE_SQL)
