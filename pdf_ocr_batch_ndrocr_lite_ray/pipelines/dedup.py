"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine — the training-data-pipeline extensions.

All run over a deterministic **near-duplicate corpus** derived from the
``documents`` table inside the pipeline itself (originals + a tail-truncated
copy of every 5th doc + an exact copy of every 7th doc), so duplicate
structure is planted and both the Ray pipelines and the DuckDB oracles see
the identical input.

Scale shapes (100 TB):

- exact dedup: fingerprint inside ``map_batches`` (no text leaves the
  block), then a ``groupby(fingerprint)`` whose exchange carries only
  (hash, doc_id) — the canonical hash-partition + per-group-first.
- n-gram Jaccard is EXACT pair similarity: shingle explode (each row
  carrying its doc's set size) → shingle-bucket pair emission → one
  partition-complete pair reduce that finishes jaccard in place — two
  exchanges, no joins. Pair fan-out is bounded by shingle
  document-frequency; at corpus scale you put the MinHash/LSH variant in
  front and use this only to verify candidates.
- MinHash+LSH / SimHash / embedding-LSH: signature inside ``map_batches``
  (vectorized numpy), candidates from band-bucket groupbys (only
  signatures shuffle, never text), pairwise work bounded per bucket.
- embedding near-dup is banded-LSH generate → exact-cosine verify in one
  composition: the vector rides with each band row, buckets verify their
  own candidates, a final partition-complete dedupe collapses multi-band
  hits. Nothing materializes on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from .exchange import hash_partitioned as _hash_partitioned
from .exchange import int64_array as _int64_array
from .exchange import list_matrix as _list_matrix
from .exchange import rename as _rename
from .queryset import register, table_path



# --- planted near-duplicate corpus (same construction in SQL below) --------

NEAR_DUP_OFFSET = 100_000  # every 5th doc, first 10 chars dropped
EXACT_DUP_OFFSET = 200_000  # every 7th doc, identical text

CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(text, 11) AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
)
"""


def _mod_mask(ids: pa.ChunkedArray | pa.Array, mod: int) -> pa.Array:
    return pa.array(_int64_array(ids) % mod == 0)


def _corpus_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"]
    text = batch["text"]
    near_mask = _mod_mask(ids, 5)
    exact_mask = _mod_mask(ids, 7)
    near = pa.table(
        {
            "doc_id": pc.add(ids.filter(near_mask), NEAR_DUP_OFFSET),
            "text": pc.utf8_slice_codeunits(text.filter(near_mask), start=10),
        }
    )
    exact = pa.table(
        {
            "doc_id": pc.add(ids.filter(exact_mask), EXACT_DUP_OFFSET),
            "text": text.filter(exact_mask),
        }
    )
    base = pa.table({"doc_id": ids, "text": text})
    return pa.concat_tables([base, near, exact])


def corpus(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(_corpus_batch, batch_format="pyarrow", zero_copy_batch=True)


# --- exact dedup -----------------------------------------------------------

def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(batch["text"], pattern=r"\s+", replacement=" ")
    )
    fp = pa.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()],
        type=pa.string(),
    )
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": fp})


def dedup_exact(sf_dir: str) -> "ray.data.Dataset":
    """Duplicate groups by content hash: (fingerprint, keep_doc_id, n_dups).

    ``keep = min(doc_id)`` is the reference's first-wins dedup rule
    (app.py:1709-1725: first occurrence in deterministic order survives)
    lifted to corpus scope via hash-partitioned groupby.
    """
    ds = corpus(sf_dir).map_batches(
        _fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("fingerprint").aggregate(Min("doc_id"), Count())
    schema = out.schema()
    if schema is None:  # empty input: Ray's aggregate yields no schema
        import pandas as _pd

        return ray.data.from_pandas(
            _pd.DataFrame(
                {
                    "fingerprint": _pd.Series(dtype="object"),
                    "keep_doc_id": _pd.Series(dtype="int64"),
                    "n_dups": _pd.Series(dtype="int64"),
                }
            )
        )
    renames = {}
    for name in schema.names:
        if name.startswith("min("):
            renames[name] = "keep_doc_id"
        elif name.startswith("count"):
            renames[name] = "n_dups"
    return _rename(out, renames)


DEDUP_EXACT_SQL = f"""
WITH {CORPUS_SQL}
SELECT md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_dups
FROM corpus GROUP BY 1
"""


# --- shingles (shared by Jaccard + MinHash) --------------------------------

SHINGLE_WORDS = 3  # word trigrams

#: ASCII \S+, matching the oracles' RE2 semantics exactly. Python's
#: ``str.split()`` also breaks on UNICODE whitespace (U+3000, NBSP, ...),
#: which DuckDB's '\\S+' does not — a latent value divergence on any corpus
#: containing ideographic spaces (pinned by the adversarial-corpus test).
import re as _re

_WORDS_RE = _re.compile(r"\S+", _re.ASCII)


def _doc_shingles(text: str) -> set[str]:
    words = _WORDS_RE.findall(text)
    if len(words) < SHINGLE_WORDS:
        return {" ".join(words)} if words else set()
    return {
        " ".join(words[i : i + SHINGLE_WORDS])
        for i in range(len(words) - SHINGLE_WORDS + 1)
    }


def _shingle_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, sh, n_sh) — the doc's DISTINCT shingle count rides with every
    shingle row (+8 bytes/row), which lets the pair stage compute jaccard
    without any join back to a per-doc count table."""
    doc_ids: list[int] = []
    shingles: list[str] = []
    n_col: list[int] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        doc_sh = _doc_shingles(text or "")
        for sh in doc_sh:
            doc_ids.append(doc_id)
            shingles.append(sh)
            n_col.append(len(doc_sh))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "sh": pa.array(shingles),
            "n_sh": pa.array(n_col, type=pa.int64()),
        }
    )


#: document-frequency cap: a shingle present in more than this many docs is
#: excluded from intersection evidence. Without it, pair emission is
#: O(df²) per shingle and a stop-phrase shingle detonates the exchange
#: (observed: sf0.1's small-vocab corpus never finishes uncapped). The SQL
#: oracle applies the identical HAVING filter, so results stay value-exact.
MAX_SHINGLE_DF = 64



def _pair_min_hamming_partition(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby(["doc_a", "doc_b"], sort=True)["hamming"].min().reset_index()
    g["hamming"] = g["hamming"].astype("int64")
    return g



def _shingle_partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
    # prune singleton shingles (no intersection) and high-df shingles
    # (quadratic pair fan-out; excluded from evidence on both engines)
    vc = df["sh"].map(df["sh"].value_counts())
    df = df[(vc > 1) & (vc <= MAX_SHINGLE_DF)]
    a: list[int] = []
    b: list[int] = []
    na: list[int] = []
    nb: list[int] = []
    for _, group in df.groupby("sh", sort=True):
        rows = sorted(set(zip(group["doc_id"].tolist(), group["n_sh"].tolist())))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a.append(rows[i][0])
                b.append(rows[j][0])
                na.append(rows[i][1])
                nb.append(rows[j][1])
    return pd.DataFrame(
        {
            "doc_a": pd.Series(a, dtype="int64"),
            "doc_b": pd.Series(b, dtype="int64"),
            "n_a": pd.Series(na, dtype="int64"),
            "n_b": pd.Series(nb, dtype="int64"),
        }
    )



def dedup_ngram_jaccard(sf_dir: str, tau: float = 0.5) -> "ray.data.Dataset":
    """EXACT word-trigram Jaccard pairs ≥ tau: (doc_a, doc_b, jaccard).

    TWO exchanges, zero joins: the per-doc distinct-shingle count rides
    with each shingle row (+8 bytes), so the shingle buckets emit pairs
    that already carry both set sizes, and the pair-count partition (keyed
    on ``doc_a`` — partition-complete) sums the intersection and finishes
    jaccard in place. The previous shape paid two ``Dataset.join``
    barriers (an aggregator actor pool each) for exactly this lookup.
    """
    sh = corpus(sf_dir).map_batches(_shingle_rows, batch_format="pyarrow")
    pairs = _hash_partitioned(sh, "sh", _shingle_partition_pairs)

    def finish_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "jaccard": pd.Series([], dtype="float64"),
                }
            )
        g = (
            df.groupby(["doc_a", "doc_b"], sort=True)
            .agg(m=("n_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first"))
            .reset_index()
        )
        j = np.round(g["m"] / (g["n_a"] + g["n_b"] - g["m"]), 6)
        out = pd.DataFrame(
            {"doc_a": g["doc_a"], "doc_b": g["doc_b"], "jaccard": j}
        )
        return out[out["jaccard"] >= tau].reset_index(drop=True)

    return _hash_partitioned(pairs, "doc_a", finish_partition)


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH {CORPUS_SQL},
w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM corpus),
s AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
              ELSE ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT)+1] || ' ' || ws[CAST(i AS INT)+2]
         END AS sh
  FROM w, LATERAL UNNEST(generate_series(1, greatest(len(ws)-2, CASE WHEN len(ws) > 0 THEN 1 ELSE 0 END))) u(i)
),
d AS (SELECT DISTINCT doc_id, sh FROM s),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM d GROUP BY 1),
lowdf AS (SELECT sh FROM d GROUP BY sh HAVING count(*) <= {MAX_SHINGLE_DF}),
d2 AS (SELECT d.doc_id, d.sh FROM d JOIN lowdf USING (sh)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
  FROM d2 a JOIN d2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(m::DOUBLE / (ca.n_sh + cb.n_sh - m), 6) AS jaccard
FROM inter
JOIN cnt ca ON doc_a = ca.doc_id
JOIN cnt cb ON doc_b = cb.doc_id
WHERE round(m::DOUBLE / (ca.n_sh + cb.n_sh - m), 6) >= 0.5
"""


# --- exact n-gram CONTAINMENT (asymmetric near-superset detection) ----------

#: containment threshold: |A∩B| / min(|A|,|B|) ≥ this reports the pair
CONTAINMENT_TAU = 0.8


def dedup_ngram_containment(
    sf_dir: str, tau: float = CONTAINMENT_TAU
) -> "ray.data.Dataset":
    """EXACT trigram containment pairs ≥ tau: (doc_a, doc_b, containment).

    Containment = m / min(n_a, n_b) — the asymmetric complement of
    Jaccard: a short document fully quoted inside a long one scores ~1.0
    here while its Jaccard can be arbitrarily low, which is why corpus
    hygiene needs both (quote/excerpt detection vs near-twin detection).
    Same two-exchange shape and df-cap as :func:`dedup_ngram_jaccard` —
    the set sizes ride with the shingle rows, so containment finishes in
    the pair partition with no join.
    """
    sh = corpus(sf_dir).map_batches(_shingle_rows, batch_format="pyarrow")
    pairs = _hash_partitioned(sh, "sh", _shingle_partition_pairs)

    def finish_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "containment": pd.Series([], dtype="float64"),
                }
            )
        g = (
            df.groupby(["doc_a", "doc_b"], sort=True)
            .agg(m=("n_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first"))
            .reset_index()
        )
        c = np.round(g["m"] / np.minimum(g["n_a"], g["n_b"]), 6)
        out = pd.DataFrame(
            {"doc_a": g["doc_a"], "doc_b": g["doc_b"], "containment": c}
        )
        return out[out["containment"] >= tau].reset_index(drop=True)

    return _hash_partitioned(pairs, "doc_a", finish_partition)


DEDUP_NGRAM_CONTAINMENT_SQL = f"""
WITH {CORPUS_SQL},
w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM corpus),
s AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
              ELSE ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT)+1] || ' ' || ws[CAST(i AS INT)+2]
         END AS sh
  FROM w, LATERAL UNNEST(generate_series(1, greatest(len(ws)-2, CASE WHEN len(ws) > 0 THEN 1 ELSE 0 END))) u(i)
),
d AS (SELECT DISTINCT doc_id, sh FROM s),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM d GROUP BY 1),
lowdf AS (SELECT sh FROM d GROUP BY sh HAVING count(*) <= {MAX_SHINGLE_DF}),
d2 AS (SELECT d.doc_id, d.sh FROM d JOIN lowdf USING (sh)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
  FROM d2 a JOIN d2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(m::DOUBLE / least(ca.n_sh, cb.n_sh), 6) AS containment
FROM inter
JOIN cnt ca ON doc_a = ca.doc_id
JOIN cnt cb ON doc_b = cb.doc_id
WHERE round(m::DOUBLE / least(ca.n_sh, cb.n_sh), 6) >= {CONTAINMENT_TAU}
"""


# --- MinHash + LSH (rows-only: not SQL-expressible) ------------------------

N_PERMS = 64
N_BANDS = 16  # 16 bands x 4 rows → catches jaccard ≳ 0.5
ROWS_PER_BAND = N_PERMS // N_BANDS
#: shared by minhash_duplicate_pairs' default AND its SQL oracle — change
#: it in one place or the registered oracle silently desynchronizes
MINHASH_TAU = 0.5
_MERSENNE = np.uint64((1 << 31) - 1)  # 31-bit prime: products wrap, perms mix
_MAX_BUCKET = 256  # pairwise cap per LSH bucket (skew guard; logged via count)


def _perm_tables(seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=N_PERMS, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=N_PERMS, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_tables()


def _base_hashes(shingles: set[str]) -> np.ndarray:
    # md5 (not blake2b): DuckDB can reproduce it, which is what lets the
    # whole MinHash pipeline carry a value-level SQL oracle —
    # ('0x' || substr(md5(sh), 1, 8))::UBIGINT equals these 4 bytes
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )


def minhash_signature(shingles: set[str]) -> np.ndarray:
    """64-perm MinHash signature; empty shingle set → all-max sentinel."""
    if not shingles:
        return np.full(N_PERMS, _MERSENNE, dtype=np.uint64)
    h = _base_hashes(shingles) % _MERSENNE  # (S,) values in [0, p)
    # (P,1)*(1,S): a,h < 2^31 → products < 2^62, safe in uint64; the mod
    # wraps many times, which is what makes each row an independent perm
    prod = (_PERM_A[:, None] * h[None, :] + _PERM_B[:, None]) % _MERSENNE
    return prod.min(axis=1)





def _band_sig_rows(batch: pa.Table) -> pa.Table:
    """(band_key, doc_id, sig) rows — the signature rides WITH its band row
    so the bucket stage can score pairs in place (no signature join). The
    band key is an int64 (blake2b digest bits) so the exchange takes the
    vectorized integer-hash path, not the per-row string path."""
    doc_ids: list[int] = []
    band_keys: list[int] = []
    sig_col: list[bytes] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sig = minhash_signature(_doc_shingles(text or "")).tobytes()
        for band in range(N_BANDS):
            chunk = sig[band * ROWS_PER_BAND * 8 : (band + 1) * ROWS_PER_BAND * 8]
            key = int.from_bytes(
                hashlib.blake2b(
                    str(band).encode() + b":" + chunk, digest_size=8
                ).digest(),
                "big",
                signed=True,
            )
            doc_ids.append(doc_id)
            band_keys.append(key)
            sig_col.append(sig)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band_key": pa.array(band_keys, type=pa.int64()),
            "sig": pa.array(sig_col, type=pa.binary()),
        }
    )


def minhash_duplicate_pairs(sf_dir: str, tau: float = MINHASH_TAU) -> "ray.data.Dataset":
    """Near-dup candidate pairs via MinHash banding: (doc_a, doc_b, est_jaccard).

    ONE streaming pass, TWO exchanges, nothing on the driver:

    1. corpus → signature + band rows in a single ``map_batches`` (the
       signature rides with each band row — N_BANDS × 512 B per doc
       through the first exchange; at 10⁹ docs that's ~8 KB/doc of shuffle
       volume spread across the cluster, the price of never needing a
       signature join afterwards);
    2. hash-partition on ``band_key``: every LSH bucket scores its own
       (capped, sorted) pairs vectorized — est_jaccard is a pure function
       of the two signatures, both already local;
    3. hash-partition on ``doc_a``: a pair colliding in several bands got
       the same estimate everywhere, so the dedupe is a plain
       ``drop_duplicates`` on a partition-complete key.

    Raw text never leaves stage 1; no ``materialize`` barrier anywhere.
    """
    bands = corpus(sf_dir).map_batches(_band_sig_rows, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["band_key"].map(df["band_key"].value_counts())
        df = df[vc > 1]  # singleton buckets cannot emit candidates
        a_ids: list[int] = []
        b_ids: list[int] = []
        ests: list[float] = []
        for _, group in df.groupby("band_key", sort=True):
            rows = sorted(set(zip(group["doc_id"].tolist(), group["sig"].tolist())))
            rows = rows[:_MAX_BUCKET]
            if len(rows) < 2:
                continue
            mat = np.frombuffer(
                b"".join(sig for _, sig in rows), dtype=np.uint64
            ).reshape(len(rows), N_PERMS)
            ia, ib = np.triu_indices(len(rows), k=1)
            est = np.round((mat[ia] == mat[ib]).mean(axis=1), 6)
            keep = est >= tau
            for i, j, e in zip(ia[keep], ib[keep], est[keep]):
                a_ids.append(rows[i][0])
                b_ids.append(rows[j][0])
                ests.append(float(e))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(a_ids, dtype="int64"),
                "doc_b": pd.Series(b_ids, dtype="int64"),
                "est_jaccard": pd.Series(ests, dtype="float64"),
            }
        )

    pairs = _hash_partitioned(bands, "band_key", bucket_pairs)

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)

    return _hash_partitioned(pairs, "doc_a", distinct_pairs)


# --- SimHash (rows-only) ---------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 x 16-bit bands → catches hamming ≤ 3
SIMHASH_MAX_HAMMING = 3


def simhash64(text: str) -> int:
    """64-bit SimHash over distinct whitespace words (unweighted votes).

    Word hash = first 8 bytes of md5 (not blake2b) so DuckDB can reproduce
    the full pipeline as a value-level oracle.
    """
    votes = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for w in set(_WORDS_RE.findall(text)):  # ASCII \S+ == the oracle's RE2
        h = np.uint64(int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big"))
        bits = (h >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), 1, -1)
    return int(
        sum(1 << i for i in range(SIMHASH_BITS) if votes[i] > 0)
    )


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    doc_ids, band_keys, hashes = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        h = simhash64(text or "")
        for band in range(SIMHASH_BANDS):
            chunk = (h >> (band * 16)) & 0xFFFF
            doc_ids.append(doc_id)
            # int key (band in the high bits) → vectorized exchange hash
            band_keys.append((band << 16) | chunk)
            hashes.append(h)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band_key": pa.array(band_keys, type=pa.int64()),
            "simhash": pa.array(hashes, type=pa.uint64()),
        }
    )


def _simhash_partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
    vc = df["band_key"].map(df["band_key"].value_counts())
    df = df[vc > 1]
    a, b, d = [], [], []
    for _, group in df.groupby("band_key", sort=True):
        rows = sorted(
            set(zip(group["doc_id"].tolist(), group["simhash"].tolist()))
        )[:_MAX_BUCKET]
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                ham = int(bin(int(rows[i][1]) ^ int(rows[j][1])).count("1"))
                if ham <= SIMHASH_MAX_HAMMING:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
    return pd.DataFrame(
        {
            "doc_a": pd.Series(a, dtype="int64"),
            "doc_b": pd.Series(b, dtype="int64"),
            "hamming": pd.Series(d, dtype="int64"),
        }
    )


def simhash_duplicate_pairs(sf_dir: str) -> "ray.data.Dataset":
    """SimHash near-dup pairs (hamming ≤ 3): (doc_a, doc_b, hamming)."""
    ds = corpus(sf_dir).map_batches(_simhash_band_rows, batch_format="pyarrow")
    pairs = _hash_partitioned(ds, "band_key", _simhash_partition_pairs)
    return _hash_partitioned(pairs, "doc_a", _pair_min_hamming_partition)


# --- embedding cosine near-dup ---------------------------------------------

EMB_DUP_OFFSET = 100_000
EMB_TAU = 0.95


def _emb_corpus_batch(batch: pa.Table) -> pa.Table:
    ids = batch["vec_id"]
    mask = _mod_mask(ids, 5)
    dup = pa.table(
        {
            "vec_id": pc.add(ids.filter(mask), EMB_DUP_OFFSET),
            "embedding": batch["embedding"].filter(mask),
        }
    )
    return pa.concat_tables(
        [pa.table({"vec_id": ids, "embedding": batch["embedding"]}), dup]
    )


def emb_corpus(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).map_batches(_emb_corpus_batch, batch_format="pyarrow", zero_copy_batch=True)


#: banded hyperplane LSH (the recall path): the 12 shared hyperplanes split
#: into 4 bands × 3 planes; a pair is a candidate if ANY band's 3 sign bits
#: agree (OR-of-ANDs). At cos ≥ 0.95 the per-plane agreement probability is
#: 1 − arccos(0.95)/π ≈ 0.899, so band recall = 0.899³ ≈ 0.73 and 4-band
#: recall ≈ 1 − (1 − 0.73)⁴ ≈ 0.994 — versus ≈ 0.28 for the all-12-bit
#: single-bucket variant below, whose precision (fewer candidates) is the
#: trade it buys.
EMB_BANDS = 4
PLANES_PER_BAND = 3  # EMB_BANDS * PLANES_PER_BAND == LSH_PLANES


def _emb_bucket_pairs(df: pd.DataFrame, key: str, tau: float) -> pd.DataFrame:
    """Exact-cosine verification within each LSH bucket of a partition.

    Shared by the banded generator (``key="band_key"``) and the
    single-bucket variant (``key="bucket"``). Buckets are rank-capped at
    ``_MAX_BUCKET`` over vec_id order — mirrored in both SQL oracles via
    ``row_number()``. Zero-norm vectors are guarded to 0-similarity
    (documented precondition: DuckDB's list_cosine_similarity returns -1
    there, so oracles assume no zero vectors in the corpus).
    """
    vc = df[key].map(df[key].value_counts())
    df = df[vc > 1]
    a, b, cs = [], [], []
    for _, group in df.groupby(key, sort=True):
        ids = np.asarray(group["vec_id"].tolist(), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order][:_MAX_BUCKET]
        mat = np.asarray(group["embedding"].tolist(), dtype=np.float64)[order][:_MAX_BUCKET]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] != ids[j] and round(float(sims[i, j]), 6) >= tau:
                    a.append(ids[i])
                    b.append(ids[j])
                    cs.append(round(float(sims[i, j]), 6))
    return pd.DataFrame(
        {
            "vec_a": pd.Series(a, dtype="int64"),
            "vec_b": pd.Series(b, dtype="int64"),
            "cosine": pd.Series(cs, dtype="float64"),
        }
    )


def embedding_near_dup_pairs(sf_dir: str, tau: float = EMB_TAU) -> "ray.data.Dataset":
    """Cosine near-dup pairs ≥ tau via banded LSH generate → exact verify:
    (vec_a, vec_b, cosine).

    Fully distributed, nothing on the driver — this replaced the round-2
    N×N driver-materialized baseline. Generator and verifier are one
    composition:

    1. one ``map_batches`` computes the 12 hyperplane signs per vector and
       emits EMB_BANDS rows, the vector riding WITH each band row (the
       MinHash signature-riding shape; ~4× the embedding bytes through the
       first exchange, the price of never joining vectors back);
    2. hash-partition on ``band_key``: every band bucket verifies its own
       candidates with an exact in-bucket cosine (rank-capped);
    3. hash-partition on ``vec_a``: a pair agreeing in several bands got
       the identical cosine everywhere → plain ``drop_duplicates`` on a
       partition-complete key.

    Recall at tau=0.95 is ≈ 0.994 by the banding math above; precision is
    exact (every emitted pair passed the true-cosine check).
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "band_key": pa.array([], type=pa.int64()),
                    "embedding": batch["embedding"],
                }
            )
        mat = _list_matrix(batch["embedding"])
        planes = _lsh_planes(mat.shape[1])
        # round-then-sign: numpy's blocked matmul and DuckDB's sequential
        # list_inner_product can differ by ~1 ulp; rounding first makes the
        # bit identical on both engines except on a measure-zero boundary
        bits = (np.round(mat @ planes.T, 4) > 0).astype(np.int64)  # (B, 12)
        ids = batch["vec_id"]
        tables = []
        weights = 1 << np.arange(PLANES_PER_BAND - 1, -1, -1, dtype=np.int64)
        for band in range(EMB_BANDS):
            chunk = bits[:, band * PLANES_PER_BAND : (band + 1) * PLANES_PER_BAND]
            keys = (band << PLANES_PER_BAND) | (chunk @ weights)
            tables.append(
                pa.table(
                    {
                        "vec_id": ids,
                        "band_key": pa.array(keys, type=pa.int64()),
                        "embedding": batch["embedding"],
                    }
                )
            )
        return pa.concat_tables(tables)

    ds = emb_corpus(sf_dir).map_batches(band_rows, batch_format="pyarrow")
    pairs = _hash_partitioned(
        ds, "band_key", lambda df: _emb_bucket_pairs(df, "band_key", tau)
    )

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["vec_a", "vec_b"]).reset_index(drop=True)

    return _hash_partitioned(pairs, "vec_a", distinct_pairs)


def _emb_banded_oracle_sql(dim: int = 64, tau: float = EMB_TAU) -> str:
    """Value-level oracle for the banded generate→verify pipeline: the 12
    hyperplanes as DOUBLE[] literals, band chunk = the band's 3 rounded
    sign bits, candidates = any-band agreement under the rank cap,
    verification = exact cosine ≥ tau."""
    planes = _lsh_planes(dim)
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(v) for v in planes[p]))
        for p in range(LSH_PLANES)
    )
    return f"""
WITH ecorpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id % 5 = 0
),
planes(p, pv) AS (VALUES {rows}),
sig AS (
  SELECT vec_id, p // {PLANES_PER_BAND} AS band,
         string_agg(
           CASE WHEN round(list_inner_product(emb, pv), 4) > 0 THEN '1' ELSE '0' END,
           '' ORDER BY p) AS chunk
  FROM ecorpus CROSS JOIN planes GROUP BY vec_id, p // {PLANES_PER_BAND}
),
ranked AS (
  SELECT vec_id, band, chunk,
         row_number() OVER (PARTITION BY band, chunk ORDER BY vec_id) AS rn
  FROM sig
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM ranked a JOIN ranked b
    ON a.band = b.band AND a.chunk = b.chunk AND a.vec_id < b.vec_id
  WHERE a.rn <= {_MAX_BUCKET} AND b.rn <= {_MAX_BUCKET}
)
SELECT c.vec_a, c.vec_b,
       round(list_cosine_similarity(ea.emb, eb.emb), 6) AS cosine
FROM cand c
JOIN ecorpus ea ON ea.vec_id = c.vec_a
JOIN ecorpus eb ON eb.vec_id = c.vec_b
WHERE round(list_cosine_similarity(ea.emb, eb.emb), 6) >= {tau}
"""


# --- embedding LSH (rows-only scale path) ----------------------------------

LSH_PLANES = 12
_LSH_SEED = 4242


def _lsh_planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((LSH_PLANES, dim))


def embedding_lsh_near_dup_pairs(sf_dir: str, tau: float = EMB_TAU) -> "ray.data.Dataset":
    """Random-hyperplane LSH bucketing, exact cosine within buckets.

    Fully SQL-oracled: the hyperplanes are literal constants in the oracle
    and the bucket bit is the sign of the dot product ROUNDED to 4
    decimals — numpy's blocked matmul and DuckDB's sequential
    ``list_inner_product`` can differ by ~1 ulp, and rounding first makes
    the sign decision identical on both engines except on a measure-zero
    boundary.
    """
    def sig_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # preserve the input's embedding type exactly (list<float32/64>)
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "bucket": pa.array([], type=pa.string()),
                    "embedding": batch["embedding"],
                }
            )
        mat = _list_matrix(batch["embedding"])
        planes = _lsh_planes(mat.shape[1])
        bits = np.round(mat @ planes.T, 4) > 0  # (B, PLANES)
        keys = [
            "".join("1" if b else "0" for b in bits[i]) for i in range(bits.shape[0])
        ]
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(keys),
                "embedding": batch["embedding"],
            }
        )

    ds = emb_corpus(sf_dir).map_batches(sig_rows, batch_format="pyarrow")
    # a vector has exactly ONE bucket (the bucket is a function of the
    # vector), so a pair can never be emitted twice — no dedupe exchange
    return _hash_partitioned(
        ds, "bucket", lambda df: _emb_bucket_pairs(df, "bucket", tau)
    )


# --- registration ----------------------------------------------------------

def _minhash_oracle_sql() -> str:
    """Value-level DuckDB oracle for the ENTIRE MinHash+LSH pipeline.

    Expressible because every stage is deterministic arithmetic: shingle
    base hash = first 4 bytes of md5 (``('0x'||substr(md5(sh),1,8))::UBIGINT``),
    permutations = the module's (a, b) constants embedded as literals,
    signature = min over shingles, banding = equality of the band's 4-perm
    tuple (the Python band_key is blake2b OF that tuple — equal iff the
    tuple is equal), bucket cap = row_number ≤ _MAX_BUCKET over sorted doc
    ids, estimate = agreement fraction k/64 (exact binary fraction, so
    np.round and SQL round agree bit-for-bit). Shingle-less docs carry the
    all-sentinel signature on both engines.
    """
    perm_rows = ", ".join(
        f"({p}, {int(a)}, {int(b)})"
        for p, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    m = int(_MERSENNE)
    return f"""
WITH {CORPUS_SQL},
w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM corpus),
s AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
              ELSE ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT)+1] || ' ' || ws[CAST(i AS INT)+2]
         END AS sh
  FROM w, LATERAL UNNEST(generate_series(1, greatest(len(ws)-2, CASE WHEN len(ws) > 0 THEN 1 ELSE 0 END))) u(i)
),
d AS (SELECT DISTINCT doc_id, sh FROM s),
h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::UBIGINT % {m} AS hv FROM d),
perms(p, a, b) AS (VALUES {perm_rows}),
sig AS (
  SELECT doc_id, p, min((a::UBIGINT * hv + b::UBIGINT) % {m}) AS v
  FROM h CROSS JOIN perms GROUP BY doc_id, p
),
sig_all AS (
  SELECT doc_id, CAST(p AS INT) AS p, v FROM sig
  UNION ALL
  SELECT w.doc_id, CAST(pp.p AS INT) AS p, {m}::UBIGINT AS v
  FROM w CROSS JOIN (SELECT unnest(range({N_PERMS})) AS p) pp WHERE len(ws) = 0
),
band_sig AS (
  SELECT doc_id, p // {ROWS_PER_BAND} AS band,
         string_agg(v::VARCHAR, ',' ORDER BY p) AS bkey
  FROM sig_all GROUP BY doc_id, p // {ROWS_PER_BAND}
),
ranked AS (
  SELECT doc_id, band, bkey,
         row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS rn
  FROM band_sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ranked a JOIN ranked b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  WHERE a.rn <= {_MAX_BUCKET} AND b.rn <= {_MAX_BUCKET}
)
SELECT c.doc_a, c.doc_b,
       round(sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / {N_PERMS}.0, 6) AS est_jaccard
FROM cand c
JOIN sig_all sa ON sa.doc_id = c.doc_a
JOIN sig_all sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
GROUP BY 1, 2
HAVING est_jaccard >= {MINHASH_TAU}
"""


register("dedup_exact", dedup_exact, sql=DEDUP_EXACT_SQL)
register("dedup_ngram_jaccard", dedup_ngram_jaccard, sql=DEDUP_NGRAM_JACCARD_SQL)
register(
    "dedup_ngram_containment", dedup_ngram_containment, sql=DEDUP_NGRAM_CONTAINMENT_SQL
)
def _simhash_oracle_sql() -> str:
    """Value-level DuckDB oracle for the SimHash pipeline.

    Word hash = first 8 bytes of md5; bit votes over distinct words;
    sign-threshold reassembly uses ``1::HUGEINT << bit`` (NOT ``**`` — DuckDB
    power returns DOUBLE and silently loses bits past 2^53); banding =
    equality of each 16-bit chunk; bucket cap mirrors the Python
    sorted-(doc_id, simhash)[:_MAX_BUCKET] rule via row_number.
    """
    return f"""
WITH {CORPUS_SQL},
w AS (
  SELECT DISTINCT doc_id, wd
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS wd FROM corpus)
),
wh AS (SELECT doc_id, ('0x' || substr(md5(wd), 1, 16))::UBIGINT AS h FROM w),
bits AS (SELECT unnest(range({SIMHASH_BITS})) AS bit),
votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN ((h >> CAST(bit AS INT)) & 1::UBIGINT) = 1 THEN 1 ELSE -1 END) AS v
  FROM wh CROSS JOIN bits GROUP BY doc_id, bit
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (1::HUGEINT << CAST(bit AS INT)) ELSE 0 END) AS UBIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
sh_all AS (
  SELECT c.doc_id, coalesce(sh.simhash, 0::UBIGINT) AS simhash
  FROM corpus c LEFT JOIN sh USING (doc_id)
),
bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> CAST(b.band * 16 AS INT)) & 65535::UBIGINT AS chunk
  FROM sh_all CROSS JOIN (SELECT unnest(range({SIMHASH_BANDS})) AS band) b
),
ranked AS (
  SELECT doc_id, simhash, band, chunk,
         row_number() OVER (PARTITION BY band, chunk ORDER BY doc_id, simhash) AS rn
  FROM bands
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM ranked a JOIN ranked b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
  WHERE a.rn <= {_MAX_BUCKET} AND b.rn <= {_MAX_BUCKET}
    AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
)
SELECT doc_a, doc_b, hamming FROM pairs
"""


register("dedup_minhash", minhash_duplicate_pairs, sql=_minhash_oracle_sql())
register("dedup_simhash", simhash_duplicate_pairs, sql=_simhash_oracle_sql())
def _embedding_lsh_oracle_sql(dim: int = 64) -> str:
    """SQL oracle for the LSH path: hyperplanes as DOUBLE[] literals (exact
    repr round-trip of the seeded numpy constants), bucket = concatenated
    rounded-dot signs, exact cosine within rank-capped buckets."""
    planes = _lsh_planes(dim)
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(v) for v in planes[p]))
        for p in range(LSH_PLANES)
    )
    return f"""
WITH ecorpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id % 5 = 0
),
planes(p, pv) AS (VALUES {rows}),
sig AS (
  SELECT vec_id,
         string_agg(
           CASE WHEN round(list_inner_product(emb, pv), 4) > 0 THEN '1' ELSE '0' END,
           '' ORDER BY p) AS bucket
  FROM ecorpus CROSS JOIN planes GROUP BY vec_id
),
ranked AS (
  SELECT s.vec_id, s.bucket, e.emb,
         row_number() OVER (PARTITION BY s.bucket ORDER BY s.vec_id) AS rn
  FROM sig s JOIN ecorpus e USING (vec_id)
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
FROM ranked a JOIN ranked b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE a.rn <= {_MAX_BUCKET} AND b.rn <= {_MAX_BUCKET}
  AND round(list_cosine_similarity(a.emb, b.emb), 6) >= {EMB_TAU}
"""


register("dedup_embedding", embedding_near_dup_pairs, sql=_emb_banded_oracle_sql())
register("dedup_embedding_lsh", embedding_lsh_near_dup_pairs, sql=_embedding_lsh_oracle_sql())


# --- exact-dup source flow (who copies whom) --------------------------------

def _corpus_src_batch(batch: pa.Table) -> pa.Table:
    """The planted corpus with a source lineage: base rows keep the
    document's real ``source``; near-dup replicas are tagged ``mirror``
    and exact replicas ``scraper`` — the provenance structure a real
    crawl has and the flow matrix below recovers."""
    ids = batch["doc_id"]
    text = batch["text"]
    src = batch["source"]
    near_mask = _mod_mask(ids, 5)
    exact_mask = _mod_mask(ids, 7)
    near = pa.table(
        {
            "doc_id": pc.add(ids.filter(near_mask), NEAR_DUP_OFFSET),
            "text": pc.utf8_slice_codeunits(text.filter(near_mask), start=10),
            "source": pa.array(["mirror"] * int(near_mask.true_count), type=pa.string()),
        }
    )
    exact = pa.table(
        {
            "doc_id": pc.add(ids.filter(exact_mask), EXACT_DUP_OFFSET),
            "text": text.filter(exact_mask),
            "source": pa.array(["scraper"] * int(exact_mask.true_count), type=pa.string()),
        }
    )
    base = pa.table({"doc_id": ids, "text": text, "source": src})
    return pa.concat_tables([base, near, exact])


def dedup_source_flow(sf_dir: str) -> "ray.data.Dataset":
    """(canon_src, dup_src, n): exact-duplicate flow matrix — for every
    non-canonical copy, which source holds the canonical (min doc_id)
    original vs which source carries the copy. The planning input for
    source-priority dedup ("drop the scraper's copies, keep the
    publisher's").

    Scale shape: fingerprints ride (doc_id, source) through ONE hash
    exchange; each fingerprint group resolves canon + flow rows
    in-partition; the fold frame is ≤ #sources² rows.
    """
    from .exchange import enum_group_sum

    def fp_rows(batch: pa.Table) -> pa.Table:
        fp = _fingerprint_batch(batch)
        return fp.append_column("source", batch["source"])

    def flow_partition(df):
        import pandas as pd

        rows_c: list[str] = []
        rows_d: list[str] = []
        for _, g in df.groupby("fingerprint", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id")
            canon_src = g.iloc[0]["source"]
            rows_c.extend([canon_src] * (len(g) - 1))
            rows_d.extend(g.iloc[1:]["source"])
        out = (
            pd.DataFrame({"canon_src": rows_c, "dup_src": rows_d})
            .groupby(["canon_src", "dup_src"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        return out

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text", "source"]
    ).map_batches(_corpus_src_batch, batch_format="pyarrow", zero_copy_batch=True)
    fps = ds.map_batches(fp_rows, batch_format="pyarrow", zero_copy_batch=True)
    partials = _hash_partitioned(fps, "fingerprint", flow_partition)
    return ray.data.from_pandas(
        enum_group_sum(partials, ["canon_src", "dup_src"], ["n"])
    )


DEDUP_SOURCE_FLOW_SQL = """
WITH corpus_src AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(text, 11) AS text, 'mirror' AS source
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text, 'scraper' AS source
  FROM documents WHERE doc_id % 7 = 0
),
f AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
  FROM corpus_src
),
c AS (SELECT fp, min(doc_id) AS keep FROM f GROUP BY 1 HAVING count(*) > 1),
canon AS (
  SELECT c.fp, c.keep, f.source AS canon_src
  FROM c JOIN f ON f.doc_id = c.keep AND f.fp = c.fp
)
SELECT canon.canon_src, f.source AS dup_src, count(*) AS n
FROM f JOIN canon ON f.fp = canon.fp AND f.doc_id != canon.keep
GROUP BY 1, 2
"""

register("dedup_source_flow", dedup_source_flow, sql=DEDUP_SOURCE_FLOW_SQL)
