"""Corpus selection operators: per-source quantile gating and global
token-budget selection.

Both complete loops other modules open: ``sketches`` computes grouped
quantiles and ``text_analysis`` computes quality scores — these operators
actually CUT the corpus with them, which is what a training-data pipeline
does with those statistics (per-source length/quality cuts; "take the best
documents until the token budget is spent").

Scale shapes:

- ``docs_filter_by_source_quantile``: exact per-source median via ONE hash
  exchange of (source, n_chars) rows — text never moves — then the tiny
  (#sources) median table broadcasts via ``ray.put`` and the filter is an
  embarrassingly-parallel second read. #sources is assumed driver-bounded
  (thousands, not millions); a corpus with unbounded group keys should gate
  on the sketch quantiles instead.

- ``docs_select_budget``: global "highest quality first until the budget"
  selection WITHOUT a global sort of the corpus. The quality score is a
  6-decimal fixed-point integer, so the per-score token totals aggregate to
  ≤ 1,000,001 rows no matter the corpus size; the driver scans that bounded
  histogram to find the admission threshold, resolves the single boundary
  tie-group by (doc_id) order, and broadcasts the decision. Three passes
  over metadata columns, zero passes over text, no all-to-all of document
  rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.textstats import sql_stats_select
from .exchange import hash_partitioned as _hash_partitioned
from .queryset import register, table_path
from .text_analysis import doc_text_stats

# --- per-source median gate -------------------------------------------------


def docs_filter_by_source_quantile(sf_dir: str) -> "ray.data.Dataset":
    """Docs strictly longer than their source's median length:
    (doc_id, source, n_chars)."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
    )

    def median_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=True)["n_chars"].median().reset_index()
        return g.rename(columns={"n_chars": "med"})

    # exact per-source medians: one exchange of (source, n_chars) only
    med = _hash_partitioned(
        ds.select_columns(["source", "n_chars"]), "source", median_partition
    ).to_pandas()
    # bounded by #sources — the broadcast-small-side pattern, not a join
    med_ref = ray.put(dict(zip(med["source"], med["med"])))

    def keep(batch: pa.Table) -> pa.Table:
        meds = ray.get(med_ref)
        src = batch["source"].to_pylist()
        thr = np.array([meds[s] for s in src], dtype=np.float64)
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.filter(pa.array(n > thr))

    return ds.map_batches(keep, batch_format="pyarrow")


FILTER_BY_SOURCE_QUANTILE_SQL = """
WITH med AS (SELECT source, median(n_chars) AS med FROM documents GROUP BY source)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN med USING (source)
WHERE d.n_chars > med.med
"""

# --- global token-budget selection ------------------------------------------

#: token budget for the registered query (~43% of the 28k-token corpus —
#: the admission boundary bites at every test scale)
SELECT_BUDGET_TOKENS = 12_000

#: straggler guard: a boundary tie-group (one exact 6-decimal score value)
#: larger than this means the score is degenerate on this corpus — fail
#: with direction instead of materializing it on the driver
_MAX_BOUNDARY_GROUP = 2_000_000


def _scored(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, score_e6, n_tokens_ws): quality score as fixed-point int.

    ``quality_score`` is already rounded to 6 decimals with exact SQL
    parity (``docs_textstats`` is driver-green), so scaling by 1e6 with a
    half-up floor is integer-exact on both sides.
    """
    ds = doc_text_stats(sf_dir)

    def fixp(batch: pa.Table) -> pa.Table:
        q = batch["quality_score"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score_e6": pa.array(
                    np.floor(q * 1e6 + 0.5).astype(np.int64), type=pa.int64()
                ),
                "n_tokens_ws": batch["n_tokens_ws"],
            }
        )

    return ds.map_batches(fixp, batch_format="pyarrow")


def docs_select_budget(
    sf_dir: str, budget: int = SELECT_BUDGET_TOKENS
) -> "ray.data.Dataset":
    """Greedy quality-ranked selection under a total token budget.

    Admission order is (score_e6 DESC, doc_id ASC); a doc is admitted iff
    the running token total up to and including it is ≤ ``budget`` — the
    same prefix a single machine would take, computed distributedly:

    1. per-score token totals (bounded histogram, ≤ 1e6+1 rows) → driver
       finds the threshold score s* and the budget remaining at s*;
    2. the s* tie-group (alone) is pulled, ordered by doc_id, and admitted
       greedily into the remainder;
    3. one broadcast (s*, admitted boundary ids) filters the scored rows.
    """
    scored = _scored(sf_dir)

    # pass 1: bounded per-score histogram
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"score_e6": batch["score_e6"], "tok": batch["n_tokens_ws"]})
        g = t.group_by("score_e6").aggregate([("tok", "sum")])
        return g.rename_columns(["score_e6", "tok_sum"])

    from ray.data.aggregate import Sum

    hist = (
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("score_e6")
        .aggregate(Sum("tok_sum"))
        .to_pandas()
    )
    scol = [c for c in hist.columns if c.startswith("sum(")][0]
    hist = hist.rename(columns={scol: "tok_sum"}).sort_values(
        "score_e6", ascending=False
    )
    cum = hist["tok_sum"].cumsum()
    full = hist[cum <= budget]
    spent = int(full["tok_sum"].sum())
    rest = hist[cum > budget]
    if rest.empty:  # whole corpus fits
        return scored
    s_star = int(rest.iloc[0]["score_e6"])
    remaining = budget - spent

    # pass 2: resolve the single boundary tie-group in admission order
    boundary = scored.filter(
        expr=f"score_e6 == {s_star}"
    ).to_pandas()
    if len(boundary) > _MAX_BOUNDARY_GROUP:
        raise ValueError(
            f"boundary tie-group at score_e6={s_star} has {len(boundary)} docs "
            f"(> {_MAX_BOUNDARY_GROUP}); the quality score is degenerate here — "
            "re-rank with a finer score or pre-bucket by score range"
        )
    boundary = boundary.sort_values("doc_id")
    bcum = boundary["n_tokens_ws"].cumsum()
    admitted = set(boundary.loc[bcum <= remaining, "doc_id"].tolist())
    admitted_ref = ray.put(admitted)

    # pass 3: broadcast decision, embarrassingly-parallel filter
    def keep(batch: pa.Table) -> pa.Table:
        ids = np.fromiter(ray.get(admitted_ref), dtype=np.int64, count=-1)
        s = batch["score_e6"].to_numpy(zero_copy_only=False)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = (s > s_star) | np.isin(d, ids)
        return batch.filter(pa.array(mask))

    return scored.map_batches(keep, batch_format="pyarrow")


def _select_budget_sql(budget: int = SELECT_BUDGET_TOKENS) -> str:
    return f"""
WITH stats AS (SELECT doc_id, {sql_stats_select('text')} FROM documents),
scored AS (
  SELECT doc_id,
         CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT) AS score_e6,
         n_tokens_ws
  FROM stats
),
sel AS (
  SELECT doc_id, score_e6, n_tokens_ws,
         sum(n_tokens_ws) OVER (ORDER BY score_e6 DESC, doc_id) AS cum
  FROM scored
)
SELECT doc_id, score_e6, n_tokens_ws FROM sel WHERE cum <= {budget}
"""


register(
    "docs_filter_by_source_quantile",
    docs_filter_by_source_quantile,
    sql=FILTER_BY_SOURCE_QUANTILE_SQL,
)
register("docs_select_budget", docs_select_budget, sql=_select_budget_sql())
