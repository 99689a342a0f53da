"""Text-analysis pipelines over the ``documents`` table.

Language-ID, quality scoring, token counting and fingerprinting as one
vectorized ``map_batches`` pass (zero-copy Arrow in, Arrow out — no Python
row loop except the md5 fingerprint), plus a language-distribution aggregate
demonstrating the partial-then-global pattern.

Every query here has a full DuckDB oracle: the kernels and their SQL live
side by side in ``functions/textstats.py`` so they cannot drift silently.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.textstats import sql_stats_select, text_stats_columns
from .queryset import register, table_path


def _stats_batch(batch: pa.Table) -> pa.Table:
    cols = text_stats_columns(batch["text"])
    out = pa.table({"doc_id": batch["doc_id"], **cols})
    return out


def doc_text_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-document stats: one embarrassingly-parallel pass, no shuffle."""
    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def doc_lang_counts(sf_dir: str) -> "ray.data.Dataset":
    """Documents per detected language.

    The groupby here shuffles only the tiny per-batch stats rows, not the
    text; at 100 TB the right shape is partial counts inside ``map_batches``
    then a groupby over ≤ #langs × #blocks rows — which is exactly what this
    compiles to, since ``lang`` is computed before the exchange and only
    (doc_id, lang) columns flow into it.
    """
    ds = doc_text_stats(sf_dir).select_columns(["doc_id", "lang"])
    out = ds.groupby("lang").count()
    if "count()" in out.schema().names:
        out = out.rename_columns({"count()": "n_docs"})
    return out


register(
    "docs_textstats",
    lambda sf_dir: doc_text_stats(sf_dir),
    sql=f"SELECT doc_id, {sql_stats_select('text')} FROM documents",
)
register(
    "docs_lang_counts",
    lambda sf_dir: doc_lang_counts(sf_dir),
    sql=f"""
    WITH s AS (SELECT doc_id, {sql_stats_select('text')} FROM documents)
    SELECT lang, count(*) AS n_docs FROM s GROUP BY lang
    """,
)
