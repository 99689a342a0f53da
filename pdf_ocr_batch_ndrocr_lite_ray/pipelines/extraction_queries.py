"""Extraction-family queries for the driver's correctness harness.

The extraction pipeline itself is not SQL-expressible (fixpoint regex
normalization, greedy geometric clustering, DOM stripping), so the flagship
queries are rows-only checks; the SQL-expressible kernels (whitespace
collapse, content sniffing) get full DuckDB oracles for value-level parity.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.sniffer import SNIFF_PREFIX_BYTES, classify_text_array, sniff_batch
from .extraction import extract_transcripts
from .queryset import register, table_path, transcripts_for_sf


def q_extract_flagship(sf_dir: str):
    """Full extraction over the synthesized transcript table, canonical order."""
    path = transcripts_for_sf(sf_dir)
    ds = extract_transcripts(path, order=True)
    return ds.drop_columns(["spans"])  # list<struct> hashes poorly across drivers


def q_extract_action_counts(sf_dir: str):
    """Per-action row counts of the flagship extraction (small aggregate)."""
    path = transcripts_for_sf(sf_dir)
    ds = extract_transcripts(path)
    out = ds.groupby("action").count()
    return out.rename_columns({"count()": "n"}) if "count()" in out.schema().names else out


def q_docs_normalize_space(sf_dir: str):
    """Vectorized whitespace collapse (kernel F1) over documents — Arrow-native."""

    def norm_batch(batch: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(batch["text"], pattern=r"\s+", replacement=" ")
        )
        return pa.table({"doc_id": batch["doc_id"], "norm_text": norm})

    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(norm_batch, batch_format="pyarrow")


def q_docs_sniff_kind(sf_dir: str):
    """Content-kind sniff over documents (vectorized dual-evidence classifier)."""

    def sniff(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "content_kind": classify_text_array(batch["text"])}
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(sniff, batch_format="pyarrow")


_SNIFF_SQL = f"""
WITH p AS (
  SELECT doc_id, substr(text, 1, {SNIFF_PREFIX_BYTES}) AS pre FROM documents
)
SELECT doc_id,
  CASE
    WHEN regexp_matches(pre, '^\\s*$') OR pre IS NULL THEN 'empty'
    WHEN regexp_matches(pre, '^\\s*[\\[{{]') THEN 'pdfish'
    WHEN len(regexp_extract_all(pre, '</?[A-Za-z][A-Za-z0-9]*(\\s[^>]*)?>')) >= 1
         AND (
           regexp_matches(pre, '(?i)<(p|div|html|body|head|br|span|a|li|ul|ol|h[1-6]|nav|footer|header|table|td|th|tr|article|section|main|aside|pre|blockquote|script|style|img|form|em|strong|b|i|code)\\b')
           OR len(regexp_extract_all(pre, '</?[A-Za-z][A-Za-z0-9]*(\\s[^>]*)?>')) >= 3
         ) THEN 'html'
    ELSE 'plain'
  END AS content_kind
FROM p
"""

register("extract_flagship", q_extract_flagship)  # rows-only: not SQL-expressible
register("extract_action_counts", q_extract_action_counts)  # rows-only
register(
    "docs_normalize_space",
    q_docs_normalize_space,
    sql=r"SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm_text FROM documents",
)
register("docs_sniff_kind", q_docs_sniff_kind, sql=_SNIFF_SQL)
