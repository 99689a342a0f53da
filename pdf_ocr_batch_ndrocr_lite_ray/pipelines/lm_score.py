"""CCNet-style bigram language-model quality scoring over ``documents``.

CCNet (Wenzek et al., "CCNet: Extracting high quality monolingual
datasets from web crawl data", arXiv:1911.00359) ranks web documents by
the perplexity of a SMALL language model trained on trusted text; the
corpus streams through the scorer, the model is broadcast. This is that
shape with an in-repo trainable stand-in for KenLM: an add-one-smoothed
bigram model trained on a deterministic hash-sample of the corpus
itself.

Distributed shape:

1. **train** — one ``map_batches`` pass over the ~20 % ``md5(doc_id)``
   sample (same bucket rule as :mod:`.sampling`) emits per-block partial
   unigram/bigram counts (unigrams tagged ``w2 = ''``, impossible for an
   ``[a-z]+`` token — the :func:`.text_analysis.docs_top_bigrams_pmi`
   trick); the driver merges these VOCAB-sized partials (bounded by the
   fixed-size training sample, never the corpus — the CCNet property that
   makes the model broadcastable at any corpus scale) and ``ray.put``\\ s
   the count dicts once;
2. **score** — one shuffle-free ``map_batches`` pass over ALL documents
   probes the broadcast dicts per bigram. No exchange at all: the output
   rides the input blocks.

Determinism contract (mirrored in the SQL oracle): per-bigram logprob
``ln((c(w1,w2)+1) / (c(w1)+V))`` is scaled to integer micro-nats
(``round_half_away(ln(p) * 1e6)``) so the per-doc SUM is exact integer
arithmetic — float summation order can never flip the rounded result.
``lm_logprob = round(micro_sum / (n_bigrams * 1e6), 6)``; docs with
fewer than 2 tokens score 0.0 with ``n_bigrams = 0``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .queryset import register, table_path
from .sampling import _bucket_sql, _hash_bucket

LM_TRAIN_PCT = 20  # md5-bucket share of docs used to train the model
_WORD_RE = re.compile(r"[a-z]+")


def _round_half_away(x: np.ndarray | float, scale: float):
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5)


def _partial_counts(batch: pa.Table) -> pa.Table:
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for t in batch["text"].to_pylist():
        ws = _WORD_RE.findall((t or "").lower())
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    w1s, w2s, cs = [], [], []
    for w, c in uni.items():
        w1s.append(w)
        w2s.append("")
        cs.append(c)
    for (a, b), c in big.items():
        w1s.append(a)
        w2s.append(b)
        cs.append(c)
    return pa.table(
        {
            "w1": pa.array(w1s, type=pa.string()),
            "w2": pa.array(w2s, type=pa.string()),
            "c": pa.array(cs, type=pa.int64()),
        }
    )


def train_bigram_lm(sf_dir: str, pct: int = LM_TRAIN_PCT):
    """(unigram counts, bigram counts, vocab size V) from the doc sample.

    The per-block partials are vocab-bounded, so the driver-side Counter
    merge touches |sample vocab| × n_blocks rows at most — the standard
    bounded-partials collect, same as the k-means centroid reduce.
    """
    from collections import Counter

    def pick(batch: pa.Table) -> pa.Table:
        keep = pa.array(_hash_bucket(batch["doc_id"]) < pct)
        return batch.filter(keep)

    rows = (
        ray.data.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_partial_counts, batch_format="pyarrow", zero_copy_batch=True)
    )
    uni: Counter = Counter()
    big: Counter = Counter()
    for b in rows.iter_batches(batch_format="pyarrow"):
        for w1, w2, c in zip(b["w1"].to_pylist(), b["w2"].to_pylist(), b["c"].to_pylist()):
            if w2 == "":
                uni[w1] += c
            else:
                big[(w1, w2)] += c
    return dict(uni), dict(big), len(uni)


def docs_lm_score(sf_dir: str, pct: int = LM_TRAIN_PCT) -> "ray.data.Dataset":
    """(doc_id, n_bigrams, lm_logprob): mean add-one bigram log-likelihood
    of each document under the sample-trained model (higher = more like
    the training sample; the CCNet quality cut is a threshold on this)."""
    uni, big, vocab = train_bigram_lm(sf_dir, pct)
    # an empty/tokenless training sample degenerates to V=0 → every count
    # is 0 and p would be 1/0; clamping V to 1 makes p = (0+1)/(0+1) = 1
    # (score 0) — mirrored by greatest(v, 1) in the oracle
    ref = ray.put((uni, big, max(vocab, 1)))

    def score(batch: pa.Table) -> pa.Table:
        u, bg, v = ray.get(ref)
        ids = batch["doc_id"]
        ns, scores = [], []
        for t in batch["text"].to_pylist():
            ws = _WORD_RE.findall((t or "").lower())
            n = max(len(ws) - 1, 0)
            ns.append(n)
            if n == 0:
                scores.append(0.0)
                continue
            # dict probes are per-bigram Python (the model is a hash map);
            # ln + rounding are vectorized over the doc's bigram array —
            # the integer micro-nat sum keeps the result order-independent
            ps = np.fromiter(
                (
                    (bg.get((w1, w2), 0) + 1) / (u.get(w1, 0) + v)
                    for w1, w2 in zip(ws, ws[1:])
                ),
                dtype=np.float64,
                count=n,
            )
            micro = int(_round_half_away(np.log(ps), 1e6).astype(np.int64).sum())
            scores.append(float(_round_half_away(micro / (n * 1e6), 1e6)) / 1e6)
        return pa.table(
            {
                "doc_id": ids,
                "n_bigrams": pa.array(ns, type=pa.int64()),
                "lm_logprob": pa.array(scores, type=pa.float64()),
            }
        )

    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _lm_score_oracle_sql(pct: int = LM_TRAIN_PCT) -> str:
    return rf"""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE {_bucket_sql()} < {pct}
),
tseq AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) AS pos
  FROM train
),
uni AS (SELECT w AS w1, count(*) AS c1 FROM tseq GROUP BY 1),
vocab AS (SELECT greatest(count(*), 1) AS v FROM uni),
tbig AS (
  SELECT w1, w AS w2, count(*) AS c12 FROM (
    SELECT doc_id, pos, w,
           lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
    FROM tseq
  ) WHERE w1 IS NOT NULL GROUP BY 1, 2
),
cseq AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) AS pos
  FROM documents
),
cbig AS (
  SELECT doc_id, w1, w AS w2 FROM (
    SELECT doc_id, pos, w,
           lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
    FROM cseq
  ) WHERE w1 IS NOT NULL
),
micro AS (
  SELECT b.doc_id,
         CAST(round(ln((coalesce(tb.c12, 0) + 1)
                       / CAST(coalesce(u.c1, 0) + vocab.v AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS m
  FROM cbig b
  LEFT JOIN tbig tb ON tb.w1 = b.w1 AND tb.w2 = b.w2
  LEFT JOIN uni u ON u.w1 = b.w1
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(m) AS DOUBLE) AS s
  FROM micro GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       CASE WHEN p.doc_id IS NULL THEN 0.0
            ELSE round(round(p.s / (p.n_bigrams * 1000000.0) * 1000000, 0) / 1000000, 6)
       END AS lm_logprob
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


register("docs_lm_score", docs_lm_score, sql=_lm_score_oracle_sql())
