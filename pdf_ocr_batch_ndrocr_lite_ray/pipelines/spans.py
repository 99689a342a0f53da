"""Cross-document duplicate-ngram SPAN detection — substring-level dedup.

Document-level dedup (exact / MinHash, :mod:`.dedup`) removes whole
near-duplicate documents; the remaining large-corpus contamination is
*partial* overlap — boilerplate paragraphs, quoted passages, licence
blocks — which the "Deduplicating Training Data Makes Language Models
Better" (Lee et al., 2022) line of work removes at the substring level.
This operator finds, for every document, the token spans covered by at
least one word-8-gram that also appears in ANOTHER document, merging
overlapping hits into maximal spans — the "mark for removal" output of a
substring dedup pass.

Distributed shape (the MapReduce alternative to Lee et al.'s suffix
arrays, which need a global in-memory index):

1. one ``map_batches`` pass tokenizes (same RE2 whitespace contract as
   :mod:`.quality`) and emits ``(h, doc_id, pos)`` per 8-gram, where
   ``h`` is a 60-bit md5 prefix of the gram text — 24 bytes/token ride
   the exchange, never the text;
2. hash-partition on ``h``: an 8-gram whose group spans ≥ 2 DISTINCT
   documents marks every occurrence a hit — a linear distinct-count +
   filter, so a boilerplate gram in a million docs costs a million rows,
   never a million² pairs (no pairwise emission at this stage);
3. hash-partition on ``doc_id``: per-document interval merge of the hit
   grams' ``[pos, pos+7]`` ranges (vectorized gaps-and-islands) into
   ``(doc_id, span_start, span_end, n_grams)``.

Both exchanges are linear in token count. Grouping is by the 60-bit
digest, not the gram text; a collision would fuse two gram groups in both
the engine AND the oracle identically (~n²/2⁶⁰, negligible), which is why
the digest is part of the cross-engine contract rather than an
implementation detail.

Runs over the planted near-duplicate corpus of :mod:`.dedup` (originals +
tail-truncated every-5th + exact every-7th copies), so shared spans exist
by construction and the DuckDB oracle sees the identical input.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import CORPUS_SQL, corpus
from .exchange import hash_partitioned as _hash_partitioned
from .queryset import register

#: span granularity: word 8-grams, the Lee et al. ballpark scaled to this
#: corpus's 10-99-token documents
NGRAM_N = 8


def _gram_rows(batch: pa.Table) -> pa.Table:
    """(h, doc_id, pos) per word-8-gram; pos is the 0-based token index."""
    text = pc.fill_null(batch["text"], "")
    collapsed = pc.replace_substring_regex(text, pattern=r"\s+", replacement=" ")
    trimmed = pc.utf8_trim(collapsed, " ")
    tok_lists = pc.split_pattern(trimmed, " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    lens = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
    empty_doc = np.asarray(pc.equal(trimmed, "").to_numpy(zero_copy_only=False))
    flat = pc.list_flatten(tok_lists)
    m = len(flat)
    if m < NGRAM_N:
        return pa.table(
            {
                "h": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
            }
        )
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    pos_in_row = np.arange(m) - np.repeat(starts, lens)
    head = m - (NGRAM_N - 1)
    # an 8-gram starting at global index j stays in-row iff its row still
    # has >= 8 tokens from that position on
    valid = (
        pos_in_row[:head] <= np.repeat(lens, lens)[:head] - NGRAM_N
    ) & ~np.repeat(empty_doc, lens)[:head]
    grams = pc.binary_join_element_wise(
        *(flat.slice(k, head) for k in range(NGRAM_N)), " "
    ).filter(pa.array(valid))
    doc_ids = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    parents = np.repeat(doc_ids, lens)[:head][valid]
    pos = pos_in_row[:head][valid]
    # 60-bit md5 prefix — fits int64, reproducible in DuckDB as
    # ('0x' || substr(md5(g), 1, 15))::UBIGINT::BIGINT
    hs = np.fromiter(
        (int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) for g in grams.to_pylist()),
        dtype=np.int64,
        count=len(grams),
    )
    return pa.table(
        {
            "h": pa.array(hs, type=pa.int64()),
            "doc_id": pa.array(parents, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


def _cross_doc_hits(df: pd.DataFrame) -> pd.DataFrame:
    """Occurrences of grams present in >= 2 distinct docs of this partition
    (partition-complete in ``h``, so 'this partition' means 'globally')."""
    nd = df.drop_duplicates(["h", "doc_id"]).groupby("h").size()
    mask = df["h"].map(nd).to_numpy() >= 2
    return df.loc[mask, ["doc_id", "pos"]]


def _merge_spans(df: pd.DataFrame) -> pd.DataFrame:
    """Gaps-and-islands merge of [pos, pos+N-1] hit intervals per doc."""
    if df.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "span_start": pd.Series(dtype="int64"),
                "span_end": pd.Series(dtype="int64"),
                "n_grams": pd.Series(dtype="int64"),
            }
        )
    df = df.sort_values(["doc_id", "pos"], kind="stable")
    doc = df["doc_id"].to_numpy(dtype=np.int64)
    pos = df["pos"].to_numpy(dtype=np.int64)
    end = pos + (NGRAM_N - 1)
    new_doc = np.concatenate([[True], doc[1:] != doc[:-1]])
    prev_max_end = pd.Series(end).groupby(doc).cummax().shift(1).to_numpy()
    brk = new_doc | (pos > np.where(new_doc, -1, prev_max_end))
    island = np.cumsum(brk) - 1
    first = np.flatnonzero(brk)
    # span_end is the running max of ends within the island; ends are
    # monotone in pos here (fixed-width intervals), so the last one wins
    last = np.concatenate([first[1:] - 1, [len(doc) - 1]])
    return pd.DataFrame(
        {
            "doc_id": doc[first],
            "span_start": pos[first],
            "span_end": end[last],
            "n_grams": np.diff(np.concatenate([first, [len(doc)]])),
        }
    )


def docs_duplicate_spans(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, span_start, span_end, n_grams): maximal token spans covered
    by word-8-grams shared with at least one other document."""
    grams = corpus(sf_dir).map_batches(
        _gram_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    hits = _hash_partitioned(grams, "h", _cross_doc_hits)
    return _hash_partitioned(hits, "doc_id", _merge_spans)


DOCS_DUPLICATE_SPANS_SQL = rf"""
WITH {CORPUS_SQL.strip().lstrip()},
toks AS (
  SELECT doc_id,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS tr,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS tl
  FROM corpus
),
series AS (
  SELECT unnest(range(1, greatest((SELECT max(len(tl)) FROM toks), 1))) AS i
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(tl[i:i+{NGRAM_N - 1}], ' ')), 1, 15))::UBIGINT::BIGINT AS h
  FROM toks JOIN series ON tr <> '' AND i <= len(tl) - {NGRAM_N - 1}
),
dups AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dups USING (h)),
marked AS (
  SELECT doc_id, pos, pos + {NGRAM_N - 1} AS e,
         CASE WHEN pos > coalesce(max(pos + {NGRAM_N - 1}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT doc_id, pos, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
)
SELECT doc_id, min(pos) AS span_start, max(e) AS span_end,
       count(*) AS n_grams
FROM isl GROUP BY doc_id, island
"""


register("docs_duplicate_spans", docs_duplicate_spans, sql=DOCS_DUPLICATE_SPANS_SQL)


# --- segment-level corpus dedup (C4-style, keep first occurrence) ------------

#: fixed window size: 32-token non-overlapping segments (the C4 paper
#: dedups three-sentence spans; this corpus has no sentence boundaries,
#: so the unit is a fixed token window)
SEG_TOKENS = 32


def _segment_rows(batch: pa.Table) -> pa.Table:
    """(h, doc_id, seg_idx, n_tok) per non-overlapping 32-token segment.

    Same tokenization contract as ``_gram_rows`` (collapse ``\\s+``, trim,
    split on single space); the md5-60-bit digest of the segment text is
    the dedup key on both engines. The per-row Python loop is the md5
    boundary (same adjudication as dedup.py's fingerprint loops): ≤ 4
    segments per document at this corpus's 10-99-token lengths.
    """
    text = pc.fill_null(batch["text"], "")
    collapsed = pc.replace_substring_regex(text, pattern=r"\s+", replacement=" ")
    trimmed = pc.utf8_trim(collapsed, " ")
    tok_lists = pc.split_pattern(trimmed, " ")
    doc_ids = batch["doc_id"].cast(pa.int64()).to_pylist()
    hs: list[int] = []
    docs: list[int] = []
    segs: list[int] = []
    ntoks: list[int] = []
    for doc_id, toks, tr in zip(doc_ids, tok_lists.to_pylist(), trimmed.to_pylist()):
        if not tr:
            continue
        for s in range(0, (len(toks) + SEG_TOKENS - 1) // SEG_TOKENS):
            window = toks[s * SEG_TOKENS : (s + 1) * SEG_TOKENS]
            digest = hashlib.md5(" ".join(window).encode("utf-8")).hexdigest()
            hs.append(int(digest[:15], 16))
            docs.append(doc_id)
            segs.append(s)
            ntoks.append(len(window))
    return pa.table(
        {
            "h": pa.array(hs, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "seg_idx": pa.array(segs, type=pa.int64()),
            "n_tok": pa.array(ntoks, type=pa.int64()),
        }
    )


def _mark_first(df: pd.DataFrame) -> pd.DataFrame:
    """kept = 1 for the first occurrence of each digest under the total
    order (doc_id, seg_idx) — partition-complete in ``h``, so 'first in
    this partition' is 'first globally'."""
    df = df.sort_values(["h", "doc_id", "seg_idx"], kind="stable")
    first = np.concatenate([[True], df["h"].to_numpy()[1:] != df["h"].to_numpy()[:-1]])
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "n_segs": np.ones(len(df), dtype=np.int64),
            "n_kept": first.astype(np.int64),
            "kept_tokens": np.where(first, df["n_tok"].to_numpy(), 0).astype(np.int64),
        }
    )


def docs_dedup_segments(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_segs, n_kept, kept_tokens): corpus-wide segment-level
    exact dedup — C4-style duplicate-span REMOVAL (where
    ``docs_duplicate_spans`` only marks). Every 32-token segment keeps
    its first occurrence under the total order (doc_id, seg_idx);
    repeats — within a document or across documents — are dropped, and
    each document reports how much of it survived.

    Two linear hash exchanges, no joins: segments ride as 32-byte digest
    rows to the ``h`` partition (winner marking), then the per-segment
    keep flags fold per document. Documents that tokenize to nothing emit
    no row (no segments to keep or drop), matching the SQL. Token counts
    ride the rows, so no text is ever re-joined.
    """
    segs = corpus(sf_dir).map_batches(
        _segment_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    flags = _hash_partitioned(segs, "h", _mark_first)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("doc_id", sort=True)[["n_segs", "n_kept", "kept_tokens"]]
            .sum()
            .reset_index()
        )
        for c in ("n_segs", "n_kept", "kept_tokens"):
            g[c] = g[c].astype("int64")
        return g

    return _hash_partitioned(flags, "doc_id", per_doc)


DOCS_DEDUP_SEGMENTS_SQL = rf"""
WITH {CORPUS_SQL.strip().lstrip()},
toks AS (
  SELECT doc_id,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS tr,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS tl
  FROM corpus
),
series AS (
  SELECT unnest(range(0, greatest(
    (SELECT CAST(ceil(max(len(tl)) / {SEG_TOKENS}.0) AS BIGINT) FROM toks), 1
  ))) AS s
),
segs AS (
  SELECT doc_id, s AS seg_idx,
         least(len(tl) - s * {SEG_TOKENS}, {SEG_TOKENS}) AS n_tok,
         ('0x' || substr(md5(array_to_string(
            tl[s * {SEG_TOKENS} + 1 : s * {SEG_TOKENS} + {SEG_TOKENS}], ' '
          )), 1, 15))::UBIGINT::BIGINT AS h
  FROM toks JOIN series ON tr <> '' AND s * {SEG_TOKENS} < len(tl)
),
ranked AS (
  SELECT doc_id, seg_idx, n_tok,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM ranked GROUP BY doc_id
"""

register("docs_dedup_segments", docs_dedup_segments, sql=DOCS_DEDUP_SEGMENTS_SQL)
