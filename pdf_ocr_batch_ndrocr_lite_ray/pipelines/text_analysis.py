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
def doc_winnow_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_fingerprints, fp_min): winnowing rolling-hash fingerprints.

    Rows-only (the O(n) rolling recurrence is not SQL-expressible);
    determinism and the shared-substring guarantee are pinned by unit tests.
    """
    from ..functions.textstats import winnow_fingerprints

    def fp_batch(batch: pa.Table) -> pa.Table:
        n_fp, fp_min = [], []
        for text in batch["text"].to_pylist():
            fps = winnow_fingerprints(text or "")
            n_fp.append(len(fps))
            fp_min.append(min(fps) if fps else 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": pa.array(n_fp, type=pa.int64()),
                "fp_min": pa.array(fp_min, type=pa.uint64()),
            }
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(fp_batch, batch_format="pyarrow", zero_copy_batch=True)


register("docs_winnow_fingerprints", doc_winnow_fingerprints)  # rows-only

register(
    "docs_lang_counts",
    lambda sf_dir: doc_lang_counts(sf_dir),
    sql=f"""
    WITH s AS (SELECT doc_id, {sql_stats_select('text')} FROM documents)
    SELECT lang, count(*) AS n_docs FROM s GROUP BY lang
    """,
)
