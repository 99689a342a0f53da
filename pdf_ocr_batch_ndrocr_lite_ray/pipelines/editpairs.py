"""FastSS-style edit-distance-1 token pairs over the transcript vocabulary.

Typo/variant mining for a training-data pipeline: find every pair of
corpus tokens at Levenshtein distance exactly 1 (substitution, insertion
or deletion) WITHOUT the quadratic all-pairs comparison, using the
deletion-neighborhood index of FastSS (Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007 — public algorithm): index each token
under itself and all of its single-character deletions; two tokens within
edit distance 1 necessarily share an index key, so candidate generation is
one hash exchange on the (L+1)-sized key set and verification touches only
co-bucketed pairs.

Scale shape (the vocabulary is corpus-SUBLINEAR, but not driver-bounded):
1. one streaming pass folds per-block token counts; a hash exchange on
   ``token`` completes the global counts and applies the min-count gate —
   the raw text never travels;
2. the surviving vocabulary fans out ≤ len+1 variant rows per token and a
   hash exchange on ``variant`` co-locates each neighborhood; per-variant
   buckets are capped at ``_MAX_VARIANT_BUCKET`` lexicographically-first
   tokens (mirrored in the oracle) so an adversarial hot key (e.g. a
   corpus of one repeated character) degrades to a bounded bucket
   quadratic instead of a full one;
3. candidate pairs dedup on a second hash exchange and verify edit
   distance == 1 in-partition (a shared deletion key admits distance-2
   pairs like transpositions — verification is not optional).

Everything the driver ever holds is partial-batch-sized; no stage
materializes the vocabulary in one place.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import hash_partitioned
from .queryset import register, transcripts_for_sf, transcripts_path_for_sf

MIN_LEN, MAX_LEN = 2, 16
MIN_COUNT = 3
#: per-deletion-key bucket cap: lexicographically-first tokens kept, the
#: same determinism rule the LSH buckets use (dedup.py _MAX_BUCKET)
_MAX_VARIANT_BUCKET = 256


def _lev1(a: str, b: str) -> bool:
    """Exactly-one-edit check (no general DP needed at distance 1)."""
    la, lb = len(a), len(b)
    if la == lb:
        return a != b and sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _token_count_rows(batch: pa.Table) -> pa.Table:
    """Per-block (token, n) partials: lowercase → strip non-alpha → split,
    all Arrow kernels (the tokenization contract shared with the SQL
    oracle's ``regexp_extract_all(lower(text), '[a-z]+')``)."""
    toks = pc.utf8_split_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(batch["text"]), pattern="[^a-z]+", replacement=" "
        )
    )
    flat = pc.list_flatten(toks)
    lens = pc.utf8_length(flat)
    keep = pc.and_(pc.greater_equal(lens, MIN_LEN), pc.less_equal(lens, MAX_LEN))
    vc = pc.value_counts(flat.filter(keep))
    return pa.table(
        {"token": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
    )


def _vocab_partition(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("token", sort=False)["n"].sum().reset_index()
    return g[g["n"] >= MIN_COUNT][["token"]]


def _variant_rows(batch: pa.Table) -> pa.Table:
    """(variant, token) fan-out: the token itself plus each 1-deletion,
    DISTINCT per token (repeated-letter tokens collapse duplicates).
    Python loop over the vocabulary side only — never over corpus rows."""
    vs, ts = [], []
    for tok in batch["token"].to_pylist():
        seen = {tok}
        seen.update(tok[:i] + tok[i + 1 :] for i in range(len(tok)))
        for v in seen:
            vs.append(v)
            ts.append(tok)
    return pa.table({"v": pa.array(vs, type=pa.string()), "token": pa.array(ts, type=pa.string())})


def _bucket_pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
    out_a: list[str] = []
    out_b: list[str] = []
    for _, g in df.groupby("v", sort=False):
        toks = np.sort(g["token"].unique())[:_MAX_VARIANT_BUCKET]
        if len(toks) < 2:
            continue
        for i in range(len(toks) - 1):
            for j in range(i + 1, len(toks)):
                out_a.append(toks[i])
                out_b.append(toks[j])
    return pd.DataFrame({"token_a": out_a, "token_b": out_b}).drop_duplicates()


def _verify_partition(df: pd.DataFrame) -> pd.DataFrame:
    df = df.drop_duplicates(["token_a", "token_b"])
    if len(df) == 0:
        return df
    ok = [_lev1(a, b) for a, b in zip(df["token_a"], df["token_b"])]
    return df[np.asarray(ok, dtype=bool)]


def transcript_edit1_pairs(sf_dir: str) -> "ray.data.Dataset":
    """(token_a, token_b) pairs at edit distance exactly 1 in the
    transcript vocabulary (tokens of ``MIN_LEN``..``MAX_LEN`` lowercase
    letters occurring ≥ ``MIN_COUNT`` times)."""
    counts = ray.data.read_parquet(
        transcripts_for_sf(sf_dir), columns=["text"]
    ).map_batches(_token_count_rows, batch_format="pyarrow", zero_copy_batch=True)
    vocab = hash_partitioned(counts, "token", _vocab_partition)
    variants = vocab.map_batches(
        _variant_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = hash_partitioned(variants, "v", _bucket_pairs_partition)
    return hash_partitioned(cand, "token_a", _verify_partition)


_ORACLE_TRANSCRIPTS = transcripts_path_for_sf("/root/testdata/sf0.01")

TRANSCRIPT_EDIT1_PAIRS_SQL = f"""
WITH toks AS (
  SELECT t AS token FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
    FROM read_parquet('{_ORACLE_TRANSCRIPTS}')
  )
  WHERE len(t) BETWEEN {MIN_LEN} AND {MAX_LEN}
  GROUP BY 1 HAVING count(*) >= {MIN_COUNT}
),
vars AS (
  SELECT DISTINCT token, v FROM (
    SELECT token, token AS v FROM toks
    UNION ALL
    SELECT token,
           substr(token, 1, CAST(i AS INT) - 1) || substr(token, CAST(i AS INT) + 1) AS v
    FROM toks, LATERAL UNNEST(generate_series(1, len(token))) u(i)
  )
),
capped AS (
  SELECT token, v FROM vars
  QUALIFY row_number() OVER (PARTITION BY v ORDER BY token) <= {_MAX_VARIANT_BUCKET}
),
cand AS (
  SELECT DISTINCT a.token AS token_a, b.token AS token_b
  FROM capped a JOIN capped b ON a.v = b.v AND a.token < b.token
)
SELECT token_a, token_b FROM cand WHERE levenshtein(token_a, token_b) = 1
"""

register("transcript_edit1_pairs", transcript_edit1_pairs, sql=TRANSCRIPT_EDIT1_PAIRS_SQL)
