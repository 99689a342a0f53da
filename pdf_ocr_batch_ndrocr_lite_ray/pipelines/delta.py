"""Incremental (delta) dedup: admit an incoming batch against an existing
corpus without re-ingesting duplicates.

The production shape every growing training corpus needs (the corpus-scope
generalization of the reference's re-processing skip rule, app.py:86-87,
1306-1323: "don't process what a previous run already produced"): the
existing corpus is already deduped; a new crawl/delivery arrives; each
incoming document is admitted iff its content fingerprint appears neither
in the existing corpus nor earlier (by ``doc_id``) in the same incoming
batch.

Plan (one pass + ONE hash exchange, nothing on the driver):

    corpus → fingerprint+side (md5 of whitespace-normalized text;
             side = hash-bucket(doc_id) < INCOMING_PCT → "incoming")
    → hash-partition by fingerprint (only (doc_id, fingerprint, side)
      rows move — raw text never leaves stage 1)
    → per-partition resolve: incoming rows labeled
      new / dup_of_existing / dup_in_batch

At 100 TB the existing side would not be re-fingerprinted per run: its
fingerprints live as a persisted index parquet partitioned by fingerprint
prefix, and only the (small) incoming batch shuffles — the exchange here is
the same; the existing side just reads pre-partitioned. ``dup_in_batch``
uses first-wins by min doc_id — the reference's L7 dedup rule
(app.py:1709-1725) at corpus scope.
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
from .queryset import register, table_path
from .sampling import _bucket_sql, _hash_bucket

#: share of the planted-dup corpus treated as the "incoming" delivery
INCOMING_PCT = 20


def _fingerprint_side(batch: pa.Table) -> pa.Table:
    # md5, not a faster hash: the oracle must reproduce the fingerprint in
    # DuckDB (md5() is the only shared digest), same as dedup_exact
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(batch["text"], pattern=r"\s+", replacement=" ")
    )
    fp = pa.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()],
        type=pa.string(),
    )
    side = pa.array(
        np.where(_hash_bucket(batch["doc_id"]) < INCOMING_PCT, "incoming", "existing")
    )
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": fp, "side": side})


def _resolve_partition(df: pd.DataFrame) -> pd.DataFrame:
    existing = set(df.loc[df["side"] == "existing", "fingerprint"])
    inc = df[df["side"] == "incoming"].sort_values(["fingerprint", "doc_id"])
    if inc.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "fingerprint": pd.Series(dtype="object"),
                "status": pd.Series(dtype="object"),
            }
        )
    first = ~inc.duplicated("fingerprint")  # sorted by doc_id → first == min
    status = np.where(
        inc["fingerprint"].isin(existing),
        "dup_of_existing",
        np.where(first, "new", "dup_in_batch"),
    )
    return pd.DataFrame(
        {
            "doc_id": inc["doc_id"].to_numpy(),
            "fingerprint": inc["fingerprint"].to_numpy(),
            "status": status,
        }
    )


def docs_dedup_incremental(sf_dir: str) -> "ray.data.Dataset":
    """Admission labels for the incoming delivery: (doc_id, fingerprint,
    status ∈ new | dup_of_existing | dup_in_batch)."""
    ds = corpus(sf_dir).map_batches(
        _fingerprint_side, batch_format="pyarrow", zero_copy_batch=True
    )
    return _hash_partitioned(ds, "fingerprint", _resolve_partition)


DEDUP_INCREMENTAL_SQL = f"""
WITH {CORPUS_SQL},
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
         CASE WHEN {_bucket_sql()} < {INCOMING_PCT}
              THEN 'incoming' ELSE 'existing' END AS side
  FROM corpus
),
inc AS (
  SELECT doc_id, fingerprint,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM fp WHERE side = 'incoming'
)
SELECT doc_id, fingerprint,
       CASE WHEN fingerprint IN (SELECT fingerprint FROM fp WHERE side = 'existing')
            THEN 'dup_of_existing'
            WHEN rn > 1 THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM inc
"""

register("docs_dedup_incremental", docs_dedup_incremental, sql=DEDUP_INCREMENTAL_SQL)


# --- corpus version diff ----------------------------------------------------
#
# The id-based complement to the content-based incremental dedup above:
# given two corpus versions keyed by doc_id, report added / removed /
# changed docs (changed = same id, different content fingerprint). The
# dataset-versioning primitive behind incremental corpus refreshes.
#
# Version B is synthesized deterministically from the documents table, the
# same pattern as dedup.CORPUS_SQL's planted duplicates: every 11th doc is
# dropped (removed), every 7th surviving doc gets its text rewritten
# (changed), and every 13th doc reappears with doc_id+300000 (added).

VERSION_ADD_OFFSET = 300_000


def _version_b_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"]
    text = batch["text"]
    keep = pc.invert(_mod0(ids, 11))
    kept_ids, kept_text = ids.filter(keep), text.filter(keep)
    changed = _mod0(kept_ids, 7)
    new_text = pa.array(
        [
            ("v2: " + t) if c else t
            for t, c in zip(kept_text.to_pylist(), changed.to_pylist())
        ],
        type=pa.string(),
    )
    added_mask = _mod0(ids, 13)
    return pa.concat_tables(
        [
            pa.table({"doc_id": kept_ids, "text": new_text}),
            pa.table(
                {
                    "doc_id": pc.add(ids.filter(added_mask), VERSION_ADD_OFFSET),
                    "text": text.filter(added_mask),
                }
            ),
        ]
    )


def _mod0(ids: pa.ChunkedArray | pa.Array, mod: int) -> pa.Array:
    vals = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)
    return pa.array((vals % mod) == 0)


def docs_version_diff(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, status ∈ added | removed | changed) between corpus versions.

    One pass reads version A and synthesizes version B; one hash exchange
    on ``doc_id`` co-locates each doc's (side, fingerprint) rows; the
    per-partition compare is vectorized pandas. Unchanged docs are dropped
    in-partition, so the result is diff-sized, not corpus-sized.
    """
    base = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    )

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            b = batch if side == "a" else _version_b_batch(batch)
            norm = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(b["text"], pattern=r"\s+", replacement=" ")
            )
            fp = pa.array(
                [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()],
                type=pa.string(),
            )
            return pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "fingerprint": fp,
                    "side": pa.array([side] * b.num_rows, type=pa.string()),
                }
            )

        return f

    both = base.map_batches(tag("a"), batch_format="pyarrow").union(
        base.map_batches(tag("b"), batch_format="pyarrow")
    )

    def diff_partition(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == "a"].set_index("doc_id")["fingerprint"]
        b = df[df["side"] == "b"].set_index("doc_id")["fingerprint"]
        added = b.index.difference(a.index)
        removed = a.index.difference(b.index)
        common = a.index.intersection(b.index)
        changed = common[(a.loc[common] != b.loc[common]).to_numpy()]
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [
                        added.to_numpy(dtype=np.int64),
                        removed.to_numpy(dtype=np.int64),
                        changed.to_numpy(dtype=np.int64),
                    ]
                ),
                "status": ["added"] * len(added)
                + ["removed"] * len(removed)
                + ["changed"] * len(changed),
            }
        )

    return _hash_partitioned(both, "doc_id", diff_partition)


VERSION_DIFF_SQL = f"""
WITH a AS (
  SELECT doc_id, md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
b_src AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0),
b AS (
  SELECT doc_id,
         md5(trim(regexp_replace(
           CASE WHEN doc_id % 7 = 0 THEN 'v2: ' || text ELSE text END,
           '\\s+', ' ', 'g'))) AS fp
  FROM b_src
  UNION ALL
  SELECT doc_id + {VERSION_ADD_OFFSET} AS doc_id,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
  FROM documents WHERE doc_id % 13 = 0
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b USING (doc_id)
WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.fp <> b.fp
"""

register("docs_version_diff", docs_version_diff, sql=VERSION_DIFF_SQL)


# --- Bloom-filter membership gate (the broadcast-scalable delta path) --------

#: 4 positions, each ``4·pos_hex`` bits (non-overlapping md5 hex slices) →
#: a 2^(4·pos_hex)-bit filter. The broadcast side is a DENSE bitmap of
#: 2^(4·pos_hex)/8 bytes — fixed by the array width regardless of
#: existing-corpus size (h=5 → 128 KiB, h=6 → 2 MiB, h=7 → 32 MiB) — vs
#: the unbounded key-set broadcast of the exact incremental dedup.
BLOOM_K = 4
BLOOM_POS_HEX = 5
#: h=7 (2^28 bits, 32 MiB per worker) is the broadcast-practical ceiling;
#: md5's 32 hex chars bound k·h ≤ 32 anyway
_BLOOM_MAX_POS_HEX = 7


def bloom_pos_hex_for(expected_n: int) -> int:
    """Slice width h sized to the EXPECTED existing-corpus cardinality.

    Smallest h whose 2^(4h)-bit array keeps ≥ 8 bits per expected key
    (k=4 → ~2.4 % false-positive rate). SATURATION: past n ≈ m/k keys
    (h=5: ~260k docs; h=6: ~4.2M; h=7: ~67M) the filter degenerates to
    all-``maybe_dup`` — still sound (``definitely_new`` never lies), just
    useless as a pre-filter; this helper is how a caller keeps m ahead of
    n. Past h=7, shard the corpus and gate per shard.
    """
    h = BLOOM_POS_HEX
    while h < _BLOOM_MAX_POS_HEX and (1 << (4 * h)) < 8 * expected_n:
        h += 1
    return h


def _bloom_positions(fingerprint_hex: str, pos_hex: int = BLOOM_POS_HEX) -> list[int]:
    """k bit positions from non-overlapping md5 hex slices — the SQL twin
    is ``('0x' || substr(h, 1 + pos_hex*j, pos_hex))::BIGINT`` for j<k."""
    return [
        int(fingerprint_hex[j * pos_hex : (j + 1) * pos_hex], 16)
        for j in range(BLOOM_K)
    ]


def docs_bloom_gate(
    sf_dir: str,
    expected_n: "int | None" = None,
    pos_hex: "int | None" = None,
) -> "ray.data.Dataset":
    """(doc_id, status ∈ {definitely_new, maybe_dup}): incoming documents
    gated by a Bloom filter built from the existing corpus's content
    fingerprints — the pre-filter a 100 TB delta-dedup runs BEFORE the
    exact fingerprint exchange, because the filter's broadcast size is
    fixed by the bit-array width while the exact key set grows with the
    corpus. ``definitely_new`` is sound (no false negatives — a planted
    existing duplicate can never pass); ``maybe_dup`` rows proceed to the
    exact check (``docs_dedup_incremental``).

    Shape: existing side folds to distinct bit positions per block
    (bounded by 2^(4h)), one driver union into a DENSE bitmap (2^(4h)/8
    bytes — the broadcast size is set by the array width, not the corpus),
    ``ray.put`` broadcast; the incoming side streams through a vectorized
    all-k-positions probe. The gate decision is a deterministic function
    of md5 slices, so the SQL oracle reproduces it bit for bit — false
    positives included. Size the filter with ``expected_n`` (existing-side
    cardinality) or an explicit ``pos_hex``; see ``bloom_pos_hex_for`` for
    the saturation points.
    """
    if pos_hex is None:
        pos_hex = (
            bloom_pos_hex_for(expected_n) if expected_n else BLOOM_POS_HEX
        )
    if not BLOOM_POS_HEX <= pos_hex <= _BLOOM_MAX_POS_HEX:
        raise ValueError(f"pos_hex must be in [{BLOOM_POS_HEX}, {_BLOOM_MAX_POS_HEX}]")
    h_hex = pos_hex

    # side-filter BEFORE fingerprinting (the md5 loop is the dominant
    # cost): each row is hashed exactly once, in whichever side's pass it
    # belongs to — a single combined pass would either re-execute the lazy
    # fingerprint pipeline on the second consumption or force a
    # materialization of the full fingerprint table
    def existing_positions(batch: pa.Table) -> pa.Table:
        mask = pa.array(_hash_bucket(batch["doc_id"]) >= INCOMING_PCT)
        t = batch.filter(mask)
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(t["text"], pattern=r"\s+", replacement=" ")
        )
        pos = sorted(
            {
                p
                for s in norm.to_pylist()
                for p in _bloom_positions(
                    hashlib.md5(s.encode("utf-8")).hexdigest(), h_hex
                )
            }
        )
        return pa.table({"p": pa.array(pos, type=pa.int64())})

    bitmap = np.zeros(1 << (4 * h_hex - 3), dtype=np.uint8)  # 2^(4h) bits
    for b in (
        corpus(sf_dir)
        .map_batches(existing_positions, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=65_536, batch_format="pyarrow")
    ):
        pos = b["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    import ray as _ray

    ref = _ray.put(bitmap)

    def gate(batch: pa.Table) -> pa.Table:
        bm = _ray.get(ref)
        mask = pa.array(_hash_bucket(batch["doc_id"]) < INCOMING_PCT)
        t = batch.filter(mask)
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(t["text"], pattern=r"\s+", replacement=" ")
        )
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()]
        hit = np.ones(len(fps), dtype=bool)
        for j in range(BLOOM_K):
            pos = np.fromiter(
                (int(f[j * h_hex : (j + 1) * h_hex], 16) for f in fps),
                dtype=np.int64,
                count=len(fps),
            )
            hit &= (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        status = np.where(hit, "maybe_dup", "definitely_new")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "status": pa.array(status.tolist(), type=pa.string()),
            }
        )

    return corpus(sf_dir).map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    )


def bloom_gate_sql(pos_hex: int = BLOOM_POS_HEX) -> str:
    """DuckDB twin of ``docs_bloom_gate`` at any slice width — the oracle
    contract is bit-exact at EVERY filter size, not just the default."""
    slices = " AND ".join(
        f"('0x' || substr(fingerprint, {1 + j * pos_hex}, {pos_hex}))::BIGINT"
        f" IN (SELECT p FROM existing_pos)"
        for j in range(BLOOM_K)
    )
    return f"""
WITH {CORPUS_SQL},
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
         CASE WHEN {_bucket_sql()} < {INCOMING_PCT}
              THEN 'incoming' ELSE 'existing' END AS side
  FROM corpus
),
existing_pos AS (
  SELECT DISTINCT
         ('0x' || substr(fingerprint, 1 + {pos_hex} * j, {pos_hex}))::BIGINT AS p
  FROM fp, LATERAL UNNEST(generate_series(0, {BLOOM_K - 1})) u(j)
  WHERE side = 'existing'
)
SELECT doc_id,
       CASE WHEN {slices} THEN 'maybe_dup' ELSE 'definitely_new' END AS status
FROM fp WHERE side = 'incoming'
"""


DOCS_BLOOM_GATE_SQL = bloom_gate_sql(BLOOM_POS_HEX)

register("docs_bloom_gate", docs_bloom_gate, sql=DOCS_BLOOM_GATE_SQL)
