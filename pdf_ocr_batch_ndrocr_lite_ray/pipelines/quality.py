"""Gopher-style rule-based quality filtering over the ``documents`` table.

The reference only *normalizes* text (app.py:3925-3983); a training-data
pipeline also has to *gate* it. This is the rule-filter family popularized
by Gopher / MassiveText and C4: cheap deterministic per-document signals —
token-count bounds, mean word length, stopword presence, repetition ratios
(duplicate-line fraction and the character share of the most common word
2-gram) — composed into a keep/drop decision with the first failing rule
recorded as the drop reason.

Shape: one embarrassingly-parallel ``map_batches`` pass, zero shuffles —
every signal is a function of a single document, each document lives in one
row, so the stage streams at 100 TB with no exchange at all. All kernels
are Arrow C-path (regex replace/split, list flatten + offsets, grouped
counts); the only numpy is offset arithmetic for in-row adjacency masks.

Tokenization parity contract (shared with the DuckDB oracle): tokens are
``string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')`` — both
engines run RE2, ``\\s`` is ASCII whitespace in both, so U+3000 / NBSP stay
inside tokens identically. Ratios are rounded to 6 dp before every
threshold comparison so the keep/drop decision is bit-identical across
engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textstats import STOPWORD_RE
from .queryset import register, table_path

# --- thresholds (interpolated verbatim into the oracle SQL) ----------------

MIN_TOKENS = 20
MAX_TOKENS = 10_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_STOPWORD_HITS = 1
MAX_DUP_LINE_FRAC = 0.3
MAX_TOP2GRAM_FRAC = 0.12

#: rule evaluation order — the FIRST failing rule becomes the drop reason
RULE_ORDER = ("tokens", "mean_word_len", "stopwords", "dup_lines", "top_2gram")


def _round6(x: np.ndarray) -> np.ndarray:
    """Half-AWAY 6-dp rounding (DuckDB's round); numpy's half-even diverges
    on exact .5 ulps like 5/128 (caught by the sf0.001 parity test).
    Inputs here are non-negative fractions."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def _first_per_group(ids: np.ndarray) -> np.ndarray:
    """Indices of the first row of each run in a sorted id array."""
    if len(ids) == 0:
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero(np.concatenate([[True], ids[1:] != ids[:-1]]))


def _quality_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].combine_chunks() if isinstance(
        batch["doc_id"], pa.ChunkedArray
    ) else batch["doc_id"]
    text = pc.fill_null(batch["text"], "")

    # --- tokens: collapse ASCII whitespace, trim, split on single space ---
    collapsed = pc.replace_substring_regex(text, pattern=r"\s+", replacement=" ")
    trimmed = pc.utf8_trim(collapsed, " ")
    tok_lists = pc.split_pattern(trimmed, " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    raw_lens = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
    empty_doc = np.asarray(pc.equal(trimmed, "").to_numpy(zero_copy_only=False))
    n_tok = np.where(empty_doc, 0, raw_lens).astype(np.int64)

    # mean word length over non-space chars of the trimmed text
    tr_len = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False).astype(np.int64)
    nonspace = np.where(n_tok > 0, tr_len - (n_tok - 1), 0)
    mean_wl = _round6(nonspace / np.maximum(n_tok, 1))

    stop_hits = (
        pc.count_substring_regex(text, STOPWORD_RE)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    # --- duplicate-line fraction (lines of the RAW text) ------------------
    line_lists = pc.split_pattern(text, "\n")
    if isinstance(line_lists, pa.ChunkedArray):
        line_lists = line_lists.combine_chunks()
    line_lens = pc.list_value_length(line_lists).to_numpy(zero_copy_only=False)
    line_parents = np.repeat(
        doc_ids.to_numpy(zero_copy_only=False), line_lens
    )
    lt = pa.table(
        {
            "doc_id": pa.array(line_parents, type=pa.int64()),
            "line": pc.list_flatten(line_lists),
        }
    )
    per_line = lt.group_by(["doc_id", "line"]).aggregate([([], "count_all")])
    per_doc = per_line.group_by("doc_id").aggregate(
        [("count_all", "sum"), ([], "count_all")]
    )
    # map back to input row order (group_by does not preserve it)
    pd_ids = per_doc["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(pd_ids)
    row_ids = doc_ids.to_numpy(zero_copy_only=False)
    pos = np.searchsorted(pd_ids[order], row_ids)
    n_lines = per_doc["count_all_sum"].to_numpy(zero_copy_only=False)[order][pos]
    n_distinct = per_doc["count_all"].to_numpy(zero_copy_only=False)[order][pos]
    dup_line_frac = _round6((n_lines - n_distinct) / np.maximum(n_lines, 1))

    # --- top word-2gram character fraction --------------------------------
    flat = pc.list_flatten(tok_lists)
    starts = np.concatenate([[0], np.cumsum(raw_lens)])[:-1]
    tok_parents = np.repeat(row_ids, raw_lens)
    top2 = np.zeros(len(row_ids), dtype=np.float64)
    if len(flat) > 1:
        pos_in_row = np.arange(len(flat)) - np.repeat(starts, raw_lens)
        # a pair (j, j+1) is in-row iff j is not its row's last token; empty
        # docs have a single '' token and never form a pair
        valid = (pos_in_row[:-1] < np.repeat(raw_lens, raw_lens)[:-1] - 1) & ~np.repeat(
            empty_doc, raw_lens
        )[:-1]
        grams = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        )
        gt = pa.table(
            {
                "doc_id": pa.array(tok_parents[:-1][valid], type=pa.int64()),
                "g": grams.filter(pa.array(valid)),
            }
        )
        if gt.num_rows:
            gc = gt.group_by(["doc_id", "g"]).aggregate([([], "count_all")])
            # deterministic top: count desc, gram asc
            gc = gc.sort_by(
                [("doc_id", "ascending"), ("count_all", "descending"), ("g", "ascending")]
            )
            g_ids = gc["doc_id"].to_numpy(zero_copy_only=False)
            first = _first_per_group(g_ids)
            top_c = gc["count_all"].to_numpy(zero_copy_only=False)[first]
            top_len = (
                pc.utf8_length(gc["g"]).to_numpy(zero_copy_only=False)[first]
            )
            # scatter into row order; denominator is the owning doc's
            # trimmed length
            tops = g_ids[first]
            tpos = np.searchsorted(tops, row_ids)
            has = (tpos < len(first)) & (tops[np.minimum(tpos, len(first) - 1)] == row_ids)
            top2[has] = _round6(
                top_c[tpos[has]] * top_len[tpos[has]] / np.maximum(tr_len[has], 1)
            )

    # --- rules ------------------------------------------------------------
    r_tokens = (n_tok >= MIN_TOKENS) & (n_tok <= MAX_TOKENS)
    r_mwl = (mean_wl >= MIN_MEAN_WORD_LEN) & (mean_wl <= MAX_MEAN_WORD_LEN)
    r_stop = stop_hits >= MIN_STOPWORD_HITS
    r_dup = dup_line_frac <= MAX_DUP_LINE_FRAC
    r_top2 = top2 <= MAX_TOP2GRAM_FRAC
    keep = r_tokens & r_mwl & r_stop & r_dup & r_top2
    reason = np.full(len(row_ids), "", dtype=object)
    for name, flag in zip(
        reversed(RULE_ORDER), (~r_top2, ~r_dup, ~r_stop, ~r_mwl, ~r_tokens)
    ):
        reason[flag] = name

    return pa.table(
        {
            "doc_id": doc_ids,
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "mean_word_len": pa.array(mean_wl, type=pa.float64()),
            "stopword_hits": pa.array(stop_hits, type=pa.int64()),
            "dup_line_frac": pa.array(dup_line_frac, type=pa.float64()),
            "top_2gram_frac": pa.array(top2, type=pa.float64()),
            "keep": pa.array(keep),
            "reason": pa.array(reason, type=pa.string()),
        }
    )


def docs_quality_filter(sf_dir: str) -> "ray.data.Dataset":
    """Per-document quality gate: signals + keep/drop + first-fail reason."""
    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(_quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def _quality_oracle_sql() -> str:
    reason = "CASE"
    checks = {
        "tokens": f"NOT (n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS})",
        "mean_word_len": (
            f"NOT (mean_word_len >= {MIN_MEAN_WORD_LEN}"
            f" AND mean_word_len <= {MAX_MEAN_WORD_LEN})"
        ),
        "stopwords": f"stopword_hits < {MIN_STOPWORD_HITS}",
        "dup_lines": f"dup_line_frac > {MAX_DUP_LINE_FRAC}",
        "top_2gram": f"top_2gram_frac > {MAX_TOP2GRAM_FRAC}",
    }
    for name in RULE_ORDER:
        reason += f" WHEN {checks[name]} THEN '{name}'"
    reason += " ELSE '' END"
    return rf"""
WITH toks AS (
  SELECT doc_id, text,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS tr,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS tl
  FROM documents
),
base AS (
  SELECT doc_id, text, tr, tl,
         CASE WHEN tr = '' THEN 0 ELSE len(tl) END AS n_tokens,
         length(tr) AS tr_len
  FROM toks
),
series AS (
  SELECT unnest(range(1, greatest((SELECT max(len(tl)) FROM toks), 1))) AS i
),
grams AS (
  SELECT doc_id, tl[i] || ' ' || tl[i+1] AS g
  FROM base JOIN series ON tr <> '' AND i <= len(tl) - 1
),
gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
top AS (
  SELECT doc_id, c, g,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
  FROM gc
),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
lagg AS (
  SELECT doc_id, count(*) AS n_lines, count(DISTINCT line) AS n_distinct
  FROM lines GROUP BY doc_id
),
sig AS (
  SELECT b.doc_id,
         b.n_tokens,
         round(CASE WHEN b.n_tokens > 0
                    THEN (b.tr_len - (b.n_tokens - 1)) * 1.0 / b.n_tokens
                    ELSE 0.0 END, 6) AS mean_word_len,
         len(regexp_extract_all(b.text, '{STOPWORD_RE}')) AS stopword_hits,
         round((l.n_lines - l.n_distinct) * 1.0 / greatest(l.n_lines, 1), 6)
           AS dup_line_frac,
         coalesce(round(t.c * length(t.g) * 1.0 / greatest(b.tr_len, 1), 6), 0.0)
           AS top_2gram_frac
  FROM base b
  JOIN lagg l USING (doc_id)
  LEFT JOIN top t ON t.doc_id = b.doc_id AND t.rn = 1
)
SELECT doc_id, n_tokens, mean_word_len, stopword_hits, dup_line_frac,
       top_2gram_frac,
       (n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
        AND mean_word_len >= {MIN_MEAN_WORD_LEN}
        AND mean_word_len <= {MAX_MEAN_WORD_LEN}
        AND stopword_hits >= {MIN_STOPWORD_HITS}
        AND dup_line_frac <= {MAX_DUP_LINE_FRAC}
        AND top_2gram_frac <= {MAX_TOP2GRAM_FRAC}) AS keep,
       {reason} AS reason
FROM sig
"""


register("docs_quality_filter", docs_quality_filter, sql=_quality_oracle_sql())


def docs_quality_report(sf_dir: str) -> "ray.data.Dataset":
    """(source, action, n): per-source gate outcomes — ``keep`` or the
    first-failing rule name. The corpus-health dashboard a 100 TB filter
    run emits per shard: which sources are losing documents and to which
    rule. Shape: the per-doc signals stay embarrassingly parallel
    (``_quality_batch`` row-aligned with the input, so ``source`` zips
    back on without a join); both report keys are bounded enums
    (sources × 6 actions) → per-batch partial counts, driver fold."""
    from .exchange import enum_group_sum

    def partial(batch: pa.Table) -> pa.Table:
        q = _quality_batch(batch.select(["doc_id", "text"]))
        action = pc.if_else(q["keep"], pa.scalar("keep"), q["reason"])
        t = pa.table({"source": batch["source"], "action": action})
        g = t.group_by(["source", "action"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "action", "n"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text", "source"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return ray.data.from_pandas(enum_group_sum(ds, ["source", "action"], ["n"]))


DOCS_QUALITY_REPORT_SQL = f"""
WITH q AS ({_quality_oracle_sql()})
SELECT d.source,
       CASE WHEN q.keep THEN 'keep' ELSE q.reason END AS action,
       count(*) AS n
FROM q JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""

register("docs_quality_report", docs_quality_report, sql=DOCS_QUALITY_REPORT_SQL)
