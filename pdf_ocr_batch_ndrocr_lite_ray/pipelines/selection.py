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

import hashlib

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
    if med.empty:  # empty corpus: nothing to gate
        return ds
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

    from .exchange import enum_group_sum

    # the fixed-point score bounds distinct keys at 1e6+1 → driver fold
    hist = enum_group_sum(
        scored.map_batches(partial, batch_format="pyarrow"), ["score_e6"], ["tok_sum"]
    ).sort_values("score_e6", ascending=False)
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


# --- curriculum ordering ----------------------------------------------------

#: sub-ranges per bucket for the two-level rank assignment (first hash byte)
_CURRICULUM_SUBS = 256


def docs_curriculum_order(sf_dir: str) -> "ray.data.Dataset":
    """Curriculum layout: (doc_id, bucket, pos) — a GLOBAL total order
    (quality decile ascending, deterministic pseudo-shuffle inside each
    decile) assigned without any global sort.

    The order key is (bucket, md5(doc_id), doc_id): training curricula
    want difficulty-graded phases with the docs inside a phase shuffled,
    and the md5 makes that shuffle reproducible. Global positions come
    from the counting trick, not a sort shuffle:

    1. count docs per (bucket, first-hash-byte sub-range) — ≤ 10×256
       rows via ``enum_group_sum``; the driver prefix-sums them into
       range offsets (broadcast, a few KB);
    2. ONE hash exchange co-locates each (bucket, sub-range); the
       partition sorts only its own members (corpus/2560 of the data) and
       adds its range offset.

    Wall-clock at 100 TB: the only all-to-all carries (doc_id, key) rows,
    and no partition ever holds more than one sub-range.
    """
    scored = doc_text_stats(sf_dir)

    def key_batch(batch: pa.Table) -> pa.Table:
        q = batch["quality_score"].to_numpy(zero_copy_only=False)
        bucket = np.minimum(np.floor(q * 10.0).astype(np.int64), 9)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hx = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        sub = np.array([int(h[:2], 16) for h in hx], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(bucket, type=pa.int64()),
                "h": pa.array(hx, type=pa.string()),
                "range_key": pa.array(bucket * _CURRICULUM_SUBS + sub, type=pa.int64()),
            }
        )

    keyed = scored.map_batches(key_batch, batch_format="pyarrow")

    def count_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["range_key"])
        return pa.table(
            {
                "range_key": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    from .exchange import enum_group_sum

    counts = enum_group_sum(
        keyed.map_batches(count_partial, batch_format="pyarrow"), ["range_key"], ["n"]
    ).sort_values("range_key")
    offsets = dict(
        zip(
            counts["range_key"].to_numpy(),
            np.concatenate([[0], counts["n"].to_numpy()[:-1].cumsum()]),
        )
    )
    off_ref = ray.put(offsets)

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        out = []
        for rk, g in df.groupby("range_key", sort=False):
            g = g.sort_values(["h", "doc_id"])
            pos = offs[int(rk)] + np.arange(len(g), dtype=np.int64)
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": g["doc_id"].to_numpy(),
                        "bucket": g["bucket"].to_numpy(),
                        "pos": pos,
                    }
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "bucket": pd.Series(dtype="int64"),
                "pos": pd.Series(dtype="int64"),
            }
        )

    return _hash_partitioned(keyed, "range_key", rank_partition)


CURRICULUM_SQL = f"""
WITH stats AS (SELECT doc_id, {{stats}} FROM documents),
keyed AS (
  SELECT doc_id,
         least(CAST(floor(quality_score * 10.0) AS BIGINT), 9) AS bucket,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM stats
)
SELECT doc_id, bucket,
       row_number() OVER (ORDER BY bucket, h, doc_id) - 1 AS pos
FROM keyed
"""


register(
    "docs_curriculum_order",
    docs_curriculum_order,
    sql=CURRICULUM_SQL.format(stats=sql_stats_select("text")),
)
