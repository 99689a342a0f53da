"""Deterministic sampling / splitting / histograms over ``documents``.

A 100 TB training-data pipeline never samples with ``random()`` — it hashes
a stable key so every run, resume, and cluster size selects the identical
subset. These operators use ``md5(doc_id)`` exactly as the DuckDB oracles
do, so sampling decisions are value-checkable, embarrassingly parallel,
and shuffle-free (the histogram's exchange carries one row per bucket per
block).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from .exchange import rename
from .queryset import register, table_path

SAMPLE_PCT = 10  # docs_sample keeps ~10%
SPLIT_VAL_PCT = 5  # validation share of the train/val split
HIST_BUCKET = 25  # token-count histogram bucket width


def _hash_bucket(doc_ids: pa.ChunkedArray | pa.Array, mod: int = 100) -> np.ndarray:
    """Stable per-key bucket in [0, mod): first 8 hex chars of md5(doc_id).

    Matches the DuckDB expression
    ``CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % mod``.
    """
    out = np.empty(len(doc_ids), dtype=np.int64)
    for i, v in enumerate(doc_ids.to_pylist()):
        out[i] = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % mod
    return out


def _bucket_sql(mod: int = 100) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {mod}"
    )


def docs_sample(sf_dir: str, pct: int = SAMPLE_PCT) -> "ray.data.Dataset":
    """~pct% deterministic sample: (doc_id, n_chars). Same rows every run."""

    def pick(batch: pa.Table) -> pa.Table:
        keep = pa.array(_hash_bucket(batch["doc_id"]) < pct)
        t = batch.filter(keep)
        return pa.table(
            {"doc_id": t["doc_id"], "n_chars": pc.utf8_length(t["text"])}
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


DOCS_SAMPLE_SQL = f"""
SELECT doc_id, len(text) AS n_chars FROM documents
WHERE {_bucket_sql()} < {SAMPLE_PCT}
"""


def docs_split_counts(sf_dir: str) -> "ray.data.Dataset":
    """Train/val split sizes: (split, n_docs). Hash-stable, resume-safe."""

    def assign(batch: pa.Table) -> pa.Table:
        buckets = _hash_bucket(batch["doc_id"])
        split = pa.array(np.where(buckets < SPLIT_VAL_PCT, "val", "train"))
        t = pa.table({"split": split})
        g = t.group_by("split").aggregate([([], "count_all")])
        return g.rename_columns(["split", "n_docs"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    from .exchange import enum_group_sum

    return ray.data.from_pandas(enum_group_sum(ds, ["split"], ["n_docs"]))


DOCS_SPLIT_SQL = f"""
SELECT CASE WHEN {_bucket_sql()} < {SPLIT_VAL_PCT} THEN 'val' ELSE 'train' END AS split,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""


def docs_length_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Token-count histogram: (bucket_lo, n_docs), bucket width HIST_BUCKET.

    Per-block partial counts → the exchange moves #buckets rows per block.
    """

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(batch["text"], r"\S+")
        lo = pc.multiply(
            pc.cast(pc.divide(n_tok, HIST_BUCKET), pa.int64()), HIST_BUCKET
        )
        t = pa.table({"bucket_lo": lo})
        g = t.group_by("bucket_lo").aggregate([([], "count_all")])
        return g.rename_columns(["bucket_lo", "n_docs"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # bucket count = max-tokens / width — bounded, so fold on the driver
    from .exchange import enum_group_sum

    return ray.data.from_pandas(enum_group_sum(ds, ["bucket_lo"], ["n_docs"]))


DOCS_HISTOGRAM_SQL = f"""
SELECT (len(regexp_extract_all(text, '\\S+')) // {HIST_BUCKET}) * {HIST_BUCKET} AS bucket_lo,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""


STRATA_N = 20  # docs kept per language stratum


def docs_stratified_sample(sf_dir: str, n_per_stratum: int = STRATA_N) -> "ray.data.Dataset":
    """Balanced per-language subset: the ``n`` LOWEST-md5-hash docs of each
    detected language — (lang, doc_id, h). Deterministic quota sampling:
    every run/cluster size picks the identical rows (hash order, not
    ``random()``), and the selection is TWO-LEVEL so nothing big moves:
    each block keeps at most ``n`` candidates per language (partial top-n),
    then one tiny reduce picks the global ``n`` from ≤ n × #langs × #blocks
    candidate rows.
    """
    import pandas as pd

    from ..functions.textstats import text_stats_columns

    def partial(batch: pa.Table) -> pa.Table:
        lang = text_stats_columns(batch["text"])["lang"]
        h = _hash_bucket(batch["doc_id"], mod=2**31)
        df = pd.DataFrame(
            {
                "lang": lang.to_pylist() if hasattr(lang, "to_pylist") else lang,
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "h": h,
            }
        )
        df = df.sort_values(["lang", "h", "doc_id"]).groupby("lang").head(n_per_stratum)
        return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(df) -> "pd.DataFrame":
        df = df.sort_values(["lang", "h", "doc_id"]).groupby("lang").head(n_per_stratum)
        return df[["lang", "doc_id", "h"]].reset_index(drop=True)

    # candidate set is ≤ n × #langs × #blocks rows — a single-block reduce
    return ds.repartition(1).map_batches(final, batch_format="pandas", batch_size=None)


def _stratified_sql() -> str:
    from ..functions.textstats import sql_stats_select

    return f"""
WITH s AS (SELECT doc_id, {sql_stats_select('text')} FROM documents),
h AS (
  SELECT lang, doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {2**31} AS h
  FROM s
)
SELECT lang, doc_id, h FROM h
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= {STRATA_N}
"""


register("docs_sample", docs_sample, sql=DOCS_SAMPLE_SQL)
register("docs_split_counts", docs_split_counts, sql=DOCS_SPLIT_SQL)
register("docs_length_histogram", docs_length_histogram, sql=DOCS_HISTOGRAM_SQL)
register("docs_stratified_sample", docs_stratified_sample, sql=_stratified_sql())


# --- weight-proportional sampling without replacement (priority sampling) ----

WEIGHTED_K = 50


def docs_weighted_sample(sf_dir: str, k: int = WEIGHTED_K) -> "ray.data.Dataset":
    """(doc_id, weight, priority): the k documents with the largest
    priority ``q = w / u`` where ``w = n_chars`` and ``u = (h+1)/2^48``
    is the doc's stable md5-derived uniform — Priority Sampling
    (Duffield, Lund & Thorup 2007), the weight-proportional
    without-replacement scheme a mixture pipeline uses to oversample
    long/high-quality documents DETERMINISTICALLY (same k docs every
    run, resume, and cluster size — no ``random()``).

    The priority map is embarrassingly parallel; the global top-k folds
    through ``driver_topk_fold`` (mergeable local top-ks, no global
    sort). Float parity: the whole priority is the three-step chain
    ``double(w) * 2^48 / double(h+1)`` — each step is one
    correctly-rounded IEEE op on exact inputs, executed identically by
    numpy and DuckDB, so the ORDERING (not just the rounded output) is
    engine-independent.
    """
    from .exchange import driver_topk_fold

    def priorities(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16) for v in ids),
            dtype=np.int64,
            count=len(ids),
        )
        w = batch["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        q = w.astype(np.float64) * float(1 << 48) / (h + 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "weight": pa.array(w, type=pa.int64()),
                "priority": pa.array(q),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    ).map_batches(priorities, batch_format="pyarrow", zero_copy_batch=True)
    top = driver_topk_fold(ds, by=["priority", "doc_id"], ascending=[False, True], k=k)
    if top is None:  # zero input blocks — keep the schema, return no rows
        import pandas as pd

        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "weight": pd.Series(dtype="int64"),
                    "priority": pd.Series(dtype="float64"),
                }
            )
        )
    from .exchange import round6

    top["priority"] = round6(top["priority"].to_numpy())
    return ray.data.from_pandas(top.reset_index(drop=True))


DOCS_WEIGHTED_SAMPLE_SQL = f"""
WITH p AS (
  SELECT doc_id, n_chars AS weight,
         (n_chars * {float(1 << 48)!r})
           / CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1
                  AS DOUBLE) AS priority
  FROM documents
)
SELECT doc_id, weight, round(priority, 6) AS priority
FROM p ORDER BY p.priority DESC, doc_id LIMIT {WEIGHTED_K}
"""

register("docs_weighted_sample", docs_weighted_sample, sql=DOCS_WEIGHTED_SAMPLE_SQL)


# --- split-balance chi2 audit (X166) -----------------------------------------------


def split_balance_audit(sf_dir: str) -> "pa.Table":
    """One-row (chi2_e6, dof, n_docs, n_val): the independence test of
    (split × source) under the hash-stable train/val split rule — the
    QA gate before trusting a holdout: if the md5 split correlates with
    source, every per-source eval number is biased. Same per-cell
    fixed-point chi2 contract as ``events_type_hour_chi2``
    (profile.py X103): each observed-marginal cell's ((obs−e)²/e)
    quantizes to 1e-6 BEFORE the order-free integer sum.

    One column-pruned scan, bounded (split, source) enum fold, zero
    shuffle.
    """
    from .exchange import enum_group_sum
    from .profile import CHI2_SCALE

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch["source"])
        t = batch.filter(keep)
        buckets = _hash_bucket(t["doc_id"])
        split = pa.array(np.where(buckets < SPLIT_VAL_PCT, "val", "train"))
        g = (
            pa.table(
                {
                    "split": split,
                    "source": t["source"],
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by(["split", "source"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["split", "source", "n"])

    counts = enum_group_sum(
        ray.data.read_parquet(
            table_path(sf_dir, "documents"), columns=["doc_id", "source"]
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["split", "source"],
        ["n"],
    )
    schema = pa.schema(
        [
            ("chi2_e6", pa.int64()),
            ("dof", pa.int64()),
            ("n_docs", pa.int64()),
            ("n_val", pa.int64()),
        ]
    )
    if len(counts) == 0:
        return pa.table(
            {
                "chi2_e6": pa.array([None], pa.int64()),
                "dof": pa.array([1], pa.int64()),
                "n_docs": pa.array([None], pa.int64()),
                "n_val": pa.array([None], pa.int64()),
            },
            schema=schema,
        )
    obs = (
        counts.pivot_table(index="split", columns="source", values="n", fill_value=0)
        .to_numpy()
        .astype(np.float64)
    )
    rn = obs.sum(axis=1)
    cn = obs.sum(axis=0)
    n = np.float64(obs.sum())
    e = (rn[:, None] * cn[None, :]) / n
    term = ((obs - e) * (obs - e) / e) * np.float64(CHI2_SCALE)
    q = np.floor(term + 0.5).astype(np.int64)
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    n_val = int(counts.loc[counts["split"] == "val", "n"].sum())
    return pa.table(
        {
            "chi2_e6": pa.array([int(q.sum())], pa.int64()),
            "dof": pa.array([int(dof)], pa.int64()),
            "n_docs": pa.array([int(n)], pa.int64()),
            "n_val": pa.array([n_val], pa.int64()),
        },
        schema=schema,
    )


def _split_balance_sql() -> str:
    from .profile import CHI2_SCALE

    return f"""
WITH f AS (
  SELECT CASE WHEN {_bucket_sql()} < {SPLIT_VAL_PCT} THEN 'val' ELSE 'train' END
           AS split,
         source
  FROM documents WHERE source IS NOT NULL
),
c AS (SELECT split, source, count(*) AS n FROM f GROUP BY 1, 2),
rt AS (SELECT split, sum(n) AS rn FROM c GROUP BY 1),
ct AS (SELECT source, sum(n) AS cn FROM c GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n FROM c),
cells AS (
  SELECT coalesce(c.n, 0) AS obs,
         (CAST(rt.rn AS DOUBLE) * CAST(ct.cn AS DOUBLE)) / (SELECT n FROM tot)
           AS e
  FROM rt CROSS JOIN ct
  LEFT JOIN c ON rt.split = c.split AND ct.source = c.source
)
SELECT
  CAST(sum(CAST(floor(
    ((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e)
    * {CHI2_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS chi2_e6,
  (SELECT (count(*) - 1) FROM rt) * (SELECT (count(*) - 1) FROM ct) AS dof,
  (SELECT CAST(n AS BIGINT) FROM tot) AS n_docs,
  (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM c WHERE split = 'val')
    AS n_val
FROM cells
"""


register("split_balance_audit", split_balance_audit, sql=_split_balance_sql())
