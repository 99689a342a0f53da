"""PII redaction over ``documents`` — the C4-style scrub pass.

Web-corpus prep masks emails, phone numbers, and IP addresses before
training (C4 dropped pages with "dirty" tokens; modern pipelines like
Dolma replace the spans with typed placeholder tokens, which is what
this does). Pure per-row regex work → the cheapest possible Ray shape:
ONE ``map_batches`` pass, all three patterns applied as vectorized
``pyarrow.compute`` RE2 kernels, no exchange, output rides the input
blocks.

Cross-engine contract: pyarrow's ``replace_substring_regex`` /
``count_substring_regex`` and DuckDB's ``regexp_replace(..., 'g')`` /
``regexp_extract_all`` are BOTH RE2, so the same pattern strings behave
identically; patterns are applied in a fixed order (email → phone → ip)
and each counts matches on the text state it receives — the SQL mirrors
by nesting the replaces in the same order.

The synthesized corpus contains no organic PII, so the pipeline plants a
deterministic contact line on every 10th document (same in-pipeline
planting pattern as :func:`.dedup.corpus`) — giving the oracle non-zero
counts to value-check and downstream tests a known redaction target.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .queryset import register, table_path

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PLANT_MOD = 10  # every 10th doc gets a planted contact line


def _plant(batch: pa.Table) -> pa.Table:
    """Append ``' contact user<id>@example.com or 555-123-4567 at
    10.0.0.1'`` to every ``doc_id % 10 == 0`` row (deterministic, mirrored
    verbatim in the oracle SQL)."""
    ids = batch["doc_id"].cast(pa.int64())
    text = pc.fill_null(batch["text"], "")
    suffix = pc.binary_join_element_wise(
        pa.array([" contact user"] * batch.num_rows),
        pc.cast(ids, pa.string()),
        pa.array(["@example.com or 555-123-4567 at 10.0.0.1"] * batch.num_rows),
        "",
    )
    from .dedup import _mod_mask

    planted = _mod_mask(ids, _PLANT_MOD)
    new_text = pc.if_else(planted, pc.binary_join_element_wise(text, suffix, ""), text)
    return pa.table({"doc_id": ids, "text": new_text})


def docs_redact_pii(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_emails, n_phones, n_ips, clean_text) — typed-placeholder
    PII masking with per-doc match counts."""

    def scrub(batch: pa.Table) -> pa.Table:
        batch = _plant(batch)
        t = batch["text"]
        n_emails = pc.count_substring_regex(t, EMAIL_RE)
        t = pc.replace_substring_regex(t, pattern=EMAIL_RE, replacement="<EMAIL>")
        n_phones = pc.count_substring_regex(t, PHONE_RE)
        t = pc.replace_substring_regex(t, pattern=PHONE_RE, replacement="<PHONE>")
        n_ips = pc.count_substring_regex(t, IP_RE)
        t = pc.replace_substring_regex(t, pattern=IP_RE, replacement="<IP>")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_phones": pc.cast(n_phones, pa.int64()),
                "n_ips": pc.cast(n_ips, pa.int64()),
                "clean_text": t,
            }
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def _redact_oracle_sql() -> str:
    plant = (
        "CASE WHEN doc_id % {m} = 0 THEN coalesce(text, '') "
        "|| ' contact user' || doc_id "
        "|| '@example.com or 555-123-4567 at 10.0.0.1' "
        "ELSE coalesce(text, '') END"
    ).format(m=_PLANT_MOD)
    return f"""
WITH planted AS (SELECT doc_id, {plant} AS t FROM documents),
s1 AS (
  SELECT doc_id, len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
         regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS t
  FROM planted
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phones,
         regexp_replace(t, '{PHONE_RE}', '<PHONE>', 'g') AS t
  FROM s1
)
SELECT doc_id, n_emails, n_phones,
       len(regexp_extract_all(t, '{IP_RE}')) AS n_ips,
       regexp_replace(t, '{IP_RE}', '<IP>', 'g') AS clean_text
FROM s2
"""


register("docs_redact_pii", docs_redact_pii, sql=_redact_oracle_sql())
