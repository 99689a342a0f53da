"""BM25 ranked retrieval over the document corpus.

The query-side complement of the inverted index (`index.py`): score every
document against a fixed keyword query with Okapi BM25 (public formula;
Robertson & Zaragoza 2009) and keep the global top-K. The corpus-scale
statistics a retrieval stack needs (N, avgdl, df) are exactly the bounded
aggregates this engine already folds without a shuffle.

Numeric contract (same discipline as `dsir.py`): every FLOAT expression is
written with the identical association shape in numpy and SQL, and the
per-term partial score is quantized to int64 1e-6 units BEFORE the
per-document sum — the only float accumulation anywhere would otherwise be
the per-doc Σ over query terms, whose order SQL does not define:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    norm     = tf / (tf + k1 * ((1 - b) + (b * dl) / avgdl))
    s_e6     = floor(idf * norm * 1e6 + 0.5)          # int64 per (doc, term)
    score_e6 = Σ_t s_e6                                # exact integer

Distributed shape: pass 1 folds (N, total_dl, df per query term) — a ≤
|query|+2-row reduction; pass 2 is embarrassingly parallel scoring with the
broadcast stats; the global top-K folds per-block partial top-Ks on the
driver (mergeable, ≤ K × blocks rows ever held). No all-to-all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .exchange import enum_group_sum
from .queryset import register, table_path

#: the registered query's fixed keyword query (vocab-present terms)
BM25_QUERY = ("data", "merge", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 50


def _term_lists(texts: "pd.Series") -> "pd.Series":
    """Per-row lists of lowercase ``[a-z]+`` terms (the shared term
    contract of the tf-idf / index family)."""
    return texts.fillna("").str.lower().str.findall(r"[a-z]+")


def docs_bm25_topk(
    sf_dir: str,
    query: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOPK,
) -> "pa.Table":
    """(doc_id, score_e6): global top-k docs for the fixed query by BM25,
    fixed-point scores, ties broken by doc_id ascending. Docs that match
    no query term (score 0) are never reported."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    )

    # --- pass 1: corpus stats (N, Σdl, df per query term) — bounded fold --
    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        tl = _term_lists(df["text"])
        # sentinel keys use "#" — impossible for [a-z]+ terms, and safe
        # through Arrow (a NUL byte is not: it truncates on conversion)
        rows = [("#N", len(df)), ("#DL", int(tl.str.len().sum()))]
        for t in query:
            rows.append((t, int(tl.apply(lambda ws: t in ws).sum())))
        return pd.DataFrame(rows, columns=["key", "n"])

    stats = enum_group_sum(
        ds.map_batches(stats_partial, batch_format="pandas"), ["key"], ["n"]
    ).set_index("key")["n"]
    n_docs = int(stats.get("#N", 0))
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "score_e6": pa.array([], type=pa.int64())})
    avgdl = float(stats.get("#DL", 0)) / float(n_docs)
    df_map = {t: float(stats.get(t, 0)) for t in query}
    # idf with the exact SQL expression shape
    idf = {
        t: np.log(1.0 + (float(n_docs) - df_map[t] + 0.5) / (df_map[t] + 0.5))
        for t in query
    }
    bcast = ray.put((avgdl, idf))

    # --- pass 2: per-doc integer score + per-block top-k ------------------
    def score(df: pd.DataFrame) -> pd.DataFrame:
        av, idf_m = ray.get(bcast)
        tl = _term_lists(df["text"])
        dl = tl.str.len().to_numpy(dtype=np.float64)
        total = np.zeros(len(df), dtype=np.int64)
        for t in query:
            tf = tl.apply(lambda ws: ws.count(t)).to_numpy(dtype=np.float64)
            denom = tf + BM25_K1 * ((1.0 - BM25_B) + (BM25_B * dl) / av)
            with np.errstate(invalid="ignore", divide="ignore"):
                norm = np.where(tf > 0, tf / denom, 0.0)
            total += np.floor(idf_m[t] * norm * 1e6 + 0.5).astype(np.int64)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "score_e6": total})
        return out[out["score_e6"] > 0]

    from .exchange import driver_topk_fold

    best = driver_topk_fold(
        ds.map_batches(score, batch_format="pandas"),
        ["score_e6", "doc_id"], [False, True], k,
    )
    if best is None:
        best = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score_e6": pd.Series(dtype="int64")})
    return pa.table(
        {
            "doc_id": pa.array(best["doc_id"].to_numpy(), type=pa.int64()),
            "score_e6": pa.array(best["score_e6"].to_numpy(), type=pa.int64()),
        }
    )


def _bm25_oracle_sql(
    query: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOPK,
) -> str:
    qvals = ", ".join(f"('{t}')" for t in query)
    return f"""
WITH q(term) AS (VALUES {qvals}),
tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS terms
  FROM documents
),
dl AS (SELECT doc_id, len(terms) AS dl FROM tl),
corpus AS (
  SELECT count(*)::DOUBLE AS n, (sum(len(terms)) / count(*)::DOUBLE) AS avgdl
  FROM tl
),
tf AS (
  SELECT u.doc_id, u.term, count(*) AS tf
  FROM (SELECT doc_id, unnest(terms) AS term FROM tl) u
  JOIN q ON q.term = u.term
  GROUP BY u.doc_id, u.term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
parts AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln(1.0 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + {BM25_K1} * ((1.0 - {BM25_B}) + ({BM25_B} * dl.dl) / corpus.avgdl)))
           * 1e6 + 0.5) AS BIGINT) AS s_e6
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus
),
scored AS (
  SELECT doc_id, CAST(sum(s_e6) AS BIGINT) AS score_e6
  FROM parts GROUP BY doc_id HAVING sum(s_e6) > 0
)
SELECT doc_id, score_e6 FROM scored
QUALIFY row_number() OVER (ORDER BY score_e6 DESC, doc_id) <= {k}
"""


register("docs_bm25_topk", docs_bm25_topk, sql=_bm25_oracle_sql())
