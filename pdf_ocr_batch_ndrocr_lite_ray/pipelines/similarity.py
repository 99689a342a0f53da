"""Similarity search over the ``embeddings`` table (list<float> column).

- ``brute_force_topk``: exact cosine top-k — the baseline and the
  SQL-oracled conformance query. The query matrix is broadcast ONCE with
  ``ray.put``; each batch does one float64 matmul against it and emits only
  its local top-k candidates, so the final per-query reduce sees
  ≤ k × n_blocks rows, not N.
- ``ivf_topk``: IVF-style bucketed ANN — the scale path. Vectors are
  assigned to their nearest centroid inside ``map_batches``; a query probes
  only the ``IVF_NPROBE`` nearest centroid buckets. Approximate → rows-only
  (recall vs brute force is asserted in tests).

At 100 TB the same shapes hold: the broadcast is a fixed small query set /
centroid table, candidate generation stays embarrassingly parallel, and the
only exchange is the tiny per-query candidate groupby.

Precondition: embedding rows must have NONZERO norm — cosine is undefined
for the zero vector and the engines pick different conventions (the unit
guard here yields score 0; DuckDB's list_cosine_similarity yields -1).
Adversarial parity (duplicates, antipodal, tiny magnitudes) is pinned in
tests/test_extensions.py::TestAdversarialEmbeddingsParity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .exchange import int64_array, list_matrix
from .queryset import register, table_path

TOPK_K = 10
N_QUERIES = 8  # queries = the embeddings with vec_id < N_QUERIES
IVF_CENTROIDS = 16  # centroids = the embeddings with vec_id < IVF_CENTROIDS
IVF_NPROBE = 4

_EMPTY_TOPK = pa.table(
    {
        "query_id": pa.array([], type=pa.int64()),
        "vec_id": pa.array([], type=pa.int64()),
        "score": pa.array([], type=pa.float64()),
    }
)


def _unit(mat: np.ndarray) -> np.ndarray:
    if mat.shape[0] == 0:
        return mat
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _small_matrix(sf_dir: str, max_vec_id: int) -> tuple[np.ndarray, np.ndarray]:
    """(ids, unit rows) for vec_id < max_vec_id — a driver-side small lookup."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    tbl = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    tbl = tbl.filter(pc.less(tbl["vec_id"], max_vec_id))
    ids = int64_array(tbl["vec_id"])
    mat = _unit(list_matrix(tbl["embedding"]))
    order = np.argsort(ids)
    return ids[order], mat[order]


def _topk_per_query(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
    return g[["query_id", "vec_id", "score"]].reset_index(drop=True)


def brute_force_topk(sf_dir: str, k: int = TOPK_K) -> "ray.data.Dataset":
    """Exact cosine top-k: (query_id, vec_id, score), k rows per query."""
    q_ids, q_mat = _small_matrix(sf_dir, N_QUERIES)
    ref = ray.put((q_ids, q_mat))

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # Ray Data can deliver empty blocks
            return _EMPTY_TOPK
        ids_q, mat_q = ray.get(ref)
        b_ids = int64_array(batch["vec_id"])
        b_mat = _unit(list_matrix(batch["embedding"]))
        sims = mat_q @ b_mat.T  # (Q, B)
        qcol, vcol, scol = [], [], []
        for qi in range(len(ids_q)):
            row = sims[qi]
            mask = b_ids != ids_q[qi]
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            # local top-k: full sort not needed, argpartition then order
            take = idx[np.argpartition(-row[idx], min(k, len(idx)) - 1)[:k]]
            take = take[np.lexsort((b_ids[take], -row[take]))]
            for j in take:
                qcol.append(int(ids_q[qi]))
                vcol.append(int(b_ids[j]))
                scol.append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(qcol, type=pa.int64()),
                "vec_id": pa.array(vcol, type=pa.int64()),
                "score": pa.array(scol, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)

    out = ds.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pandas"
    )

    return out.map_batches(_round_score, batch_format="pyarrow")


def _round_score(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # half-away-from-zero matches DuckDB round(); pyarrow defaults to
    # half-to-even, which would flip the oracle hash on an exact boundary
    return t.set_column(
        t.schema.get_field_index("score"),
        "score",
        pc.round(t["score"], ndigits=6, round_mode="half_towards_infinity"),
    )


BRUTE_FORCE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
)
SELECT query_id, e.vec_id,
       round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) AS score
FROM q, embeddings e
WHERE e.vec_id != q.query_id
QUALIFY row_number() OVER (
  PARTITION BY query_id
  ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id
) <= {TOPK_K}
"""


def ivf_topk(sf_dir: str, k: int = TOPK_K) -> "ray.data.Dataset":
    """IVF-bucketed approximate top-k: (query_id, vec_id, score).

    Centroids are a fixed deterministic subset (vec_id < IVF_CENTROIDS) —
    at corpus scale they'd come from a sampled k-means pass, but bucket
    mechanics (assign in map, probe nprobe buckets, exact math inside
    buckets) are identical. Assignment and probe DECISIONS compare dots
    rounded to 6 decimals with centroid-index tie-break, which makes the
    bucket structure reproducible in the SQL oracle (numpy's blocked
    matmul and DuckDB's sequential sum differ by ulps; rounding first
    pins the comparisons except on a measure-zero boundary).
    """
    c_ids, c_mat = _small_matrix(sf_dir, IVF_CENTROIDS)
    q_ids, q_mat = _small_matrix(sf_dir, N_QUERIES)
    # probe table as a dense (Q, C) boolean lookup — vectorized per-batch
    # masking is probe_bool[qi][assign], no per-row Python
    n_cent = c_mat.shape[0]
    probe_bool = np.zeros((len(q_ids), n_cent), dtype=bool)
    for i in range(len(q_ids)):
        dots = np.round(q_mat[i] @ c_mat.T, 6)
        order = np.lexsort((np.arange(n_cent), -dots))  # dot desc, cid asc
        probe_bool[i, order[:IVF_NPROBE]] = True
    # centroids probed by NO query are dead: their vectors are dropped before
    # any query scoring. At corpus scale the dataset is WRITTEN partitioned
    # by centroid_id and non-probed partitions are pruned at the read; here
    # the prune happens right after assignment, which preserves the compute
    # shape (probed fraction only) on an unpartitioned input.
    probe_any = probe_bool.any(axis=0)
    ref = ray.put((q_ids, q_mat, c_mat, probe_bool, probe_any))

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TOPK
        ids_q, mat_q, cent, p_bool, p_any = ray.get(ref)
        b_ids = int64_array(batch["vec_id"])
        b_mat = _unit(list_matrix(batch["embedding"]))
        # nearest centroid per vector: rounded dots, first-max = lowest cid
        assign = np.argmax(np.round(b_mat @ cent.T, 6), axis=1)
        keep = p_any[assign]  # IVF prune: drop vectors in never-probed buckets
        b_ids, b_mat, assign = b_ids[keep], b_mat[keep], assign[keep]
        qcol, vcol, scol = [], [], []
        for qi in range(len(ids_q)):
            qid = int(ids_q[qi])
            mask = p_bool[qi][assign] & (b_ids != qid)
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            # score ONLY the probed subset — never the whole batch
            row = mat_q[qi] @ b_mat[idx].T
            take = np.argpartition(-row, min(k, len(idx)) - 1)[:k]
            for t in take:
                qcol.append(qid)
                vcol.append(int(b_ids[idx[t]]))
                scol.append(float(row[t]))
        return pa.table(
            {
                "query_id": pa.array(qcol, type=pa.int64()),
                "vec_id": pa.array(vcol, type=pa.int64()),
                "score": pa.array(scol, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pandas"
    )
    return out.map_batches(_round_score, batch_format="pyarrow")


#: IVF SQL oracle. Unit-vector dots ARE cosines, so every comparison uses
#: list_cosine_similarity; assignment/probing mirror the engine's rounded
#: comparisons (round 6, centroid-id tie-break); final ranking uses the
#: UNROUNDED cosine exactly like the Ray path's selection math.
IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {IVF_CENTROIDS}),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < {N_QUERIES}),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cent.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.emb, cent.cemb), 6) DESC, cent.cid
           ) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, cent.cid,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qemb, cent.cemb), 6) DESC, cent.cid
           ) AS rn
    FROM q CROSS JOIN cent
  ) WHERE rn <= {IVF_NPROBE}
)
SELECT query_id, e.vec_id AS vec_id,
       round(list_cosine_similarity(q.qemb, e.emb), 6) AS score
FROM q
JOIN probes USING (query_id)
JOIN assign ON assign.cid = probes.cid
JOIN e ON e.vec_id = assign.vec_id AND e.vec_id != q.query_id
QUALIFY row_number() OVER (
  PARTITION BY query_id
  ORDER BY list_cosine_similarity(q.qemb, e.emb) DESC, e.vec_id
) <= {TOPK_K}
"""


# --- centroid-partitioned IVF layout (read-I/O pruning) ---------------------

_IVF_INDEX_VERSION = 1


def ivf_index_dir(sf_dir: str) -> str:
    """Cache location of the centroid-partitioned embedding layout for a
    source dir — content-keyed on the source parquet's (size, mtime) via the
    marker file, so a changed source rebuilds."""
    import hashlib as _hl
    from pathlib import Path

    key = _hl.md5(str(Path(sf_dir).resolve()).encode()).hexdigest()[:12]
    return f"/tmp/graft_cache/ivf-index-{key}-c{IVF_CENTROIDS}-v{_IVF_INDEX_VERSION}"


def build_ivf_index(sf_dir: str) -> str:
    """ONE distributed pass writes the embeddings partitioned by nearest
    centroid: ``<index>/centroid_id=<c>/*.parquet`` (hive layout). The
    centroid id is also kept as a regular column (``cid``) so readers of an
    explicit partition-dir subset still see it without hive discovery.

    This is the layout half of IVF at scale: with vectors co-located by
    centroid, a query's read I/O is proportional to the probed fraction —
    non-probed partitions never leave storage. Idempotent per source file
    state; concurrent/re-runs rebuild into a fresh directory then rename.
    """
    import os
    import shutil
    from pathlib import Path

    src = Path(table_path(sf_dir, "embeddings"))
    stat = src.stat()
    stamp = f"{stat.st_size}:{stat.st_mtime_ns}"
    out = Path(ivf_index_dir(sf_dir))
    marker = out / "_DONE"
    if marker.exists() and marker.read_text() == stamp:
        return str(out)

    c_ids, c_mat = _small_matrix(sf_dir, IVF_CENTROIDS)
    ref = ray.put(c_mat)

    def assign_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cid", pa.array([], type=pa.int64())) \
                        .append_column("centroid_id", pa.array([], type=pa.int64()))
        cent = ray.get(ref)
        mat = _unit(list_matrix(batch["embedding"]))
        # same rounded-dot argmax as ivf_topk: identical bucket structure
        assign = np.argmax(np.round(mat @ cent.T, 6), axis=1).astype(np.int64)
        return batch.append_column("cid", pa.array(assign, type=pa.int64())) \
                    .append_column("centroid_id", pa.array(assign, type=pa.int64()))

    tmp = out.with_name(out.name + f".build-{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    ray.data.read_parquet(str(src), columns=["vec_id", "embedding"]).map_batches(
        assign_batch, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(str(tmp), partition_cols=["centroid_id"])
    (tmp / "_DONE").write_text(stamp)
    if out.exists():
        shutil.rmtree(out)
    tmp.replace(out)
    return str(out)


def probed_partition_paths(index_dir: str, probed: "np.ndarray") -> list[str]:
    """Parquet files under the probed centroid partitions — ONLY these are
    read (``read_parquet`` wants files when given a list). A probed centroid
    that attracted no vectors has no dir; skip it."""
    from pathlib import Path

    base = Path(index_dir)
    files: list[str] = []
    for c in np.nonzero(probed)[0]:
        d = base / f"centroid_id={c}"
        if d.is_dir():
            files.extend(sorted(str(p) for p in d.glob("*.parquet")))
    return files


def ivf_topk_partitioned(
    sf_dir: str, k: int = TOPK_K, n_queries: int = N_QUERIES
) -> "ray.data.Dataset":
    """IVF top-k over the centroid-partitioned layout: identical rows to
    ``ivf_topk``, but the read touches ONLY the union of the queries'
    probed partitions — the scan I/O shrinks with the probed fraction
    instead of always streaming the whole corpus.
    """
    index_dir = build_ivf_index(sf_dir)
    c_ids, c_mat = _small_matrix(sf_dir, IVF_CENTROIDS)
    q_ids, q_mat = _small_matrix(sf_dir, n_queries)
    n_cent = c_mat.shape[0]
    probe_bool = np.zeros((len(q_ids), n_cent), dtype=bool)
    for i in range(len(q_ids)):
        dots = np.round(q_mat[i] @ c_mat.T, 6)
        order = np.lexsort((np.arange(n_cent), -dots))
        probe_bool[i, order[:IVF_NPROBE]] = True
    paths = probed_partition_paths(index_dir, probe_bool.any(axis=0))
    if not paths:
        return ray.data.from_arrow(_EMPTY_TOPK)
    ref = ray.put((q_ids, q_mat, probe_bool))

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TOPK
        ids_q, mat_q, p_bool = ray.get(ref)
        b_ids = int64_array(batch["vec_id"])
        b_cid = int64_array(batch["cid"])
        b_mat = _unit(list_matrix(batch["embedding"]))
        qcol, vcol, scol = [], [], []
        for qi in range(len(ids_q)):
            qid = int(ids_q[qi])
            mask = p_bool[qi][b_cid] & (b_ids != qid)
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            row = mat_q[qi] @ b_mat[idx].T
            take = np.argpartition(-row, min(k, len(idx)) - 1)[:k]
            for t in take:
                qcol.append(qid)
                vcol.append(int(b_ids[idx[t]]))
                scol.append(float(row[t]))
        return pa.table(
            {
                "query_id": pa.array(qcol, type=pa.int64()),
                "vec_id": pa.array(vcol, type=pa.int64()),
                "score": pa.array(scol, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(paths, columns=["vec_id", "cid", "embedding"]).map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pandas"
    )
    return out.map_batches(_round_score, batch_format="pyarrow")


register("ann_brute_force_topk", brute_force_topk, sql=BRUTE_FORCE_TOPK_SQL)
register("ann_ivf_topk", ivf_topk, sql=IVF_TOPK_SQL)
# same oracle as ann_ivf_topk: the partitioned layout changes WHERE bytes
# are read, not what the query computes
register("ann_ivf_topk_partitioned", ivf_topk_partitioned, sql=IVF_TOPK_SQL)


# --- k-NN graph construction (in-cell, the SemDeDup/dedup-graph input) -------

KNN_K = 5


def emb_knn_graph(sf_dir: str, k: int = KNN_K) -> "ray.data.Dataset":
    """(vec_id, nbr_id, score): each vector's top-k cosine neighbors WITHIN
    its IVF cell — the k-NN graph that feeds SemDeDup, near-dup connected
    components, and graph-based diversity selection. Cell-scoped (not
    global) by design: that is what makes graph construction linear-ish
    instead of N² — at corpus scale the centroid count grows with N so
    cells stay bounded, and the same assign → co-locate → in-cell matmul
    shape holds.

    One hash exchange on the assigned centroid id (embeddings ride it
    once); each partition computes its cells' unit-dot Gram blocks and
    emits k rows per vector. Assignment uses the IVF round-6 argmax
    contract; ranking uses the unrounded scores with vec_id tie-break,
    exactly like the ANN oracles.
    """
    from .exchange import hash_partitioned as _hash_partitioned

    c_ids, c_mat = _small_matrix(sf_dir, IVF_CENTROIDS)
    ref = ray.put(c_mat)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cid": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=batch["embedding"].type),
                }
            )
        cent = ray.get(ref)
        mat = _unit(list_matrix(batch["embedding"]))
        cid = np.argmax(np.round(mat @ cent.T, 6), axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cid": pa.array(cid),
                "embedding": batch["embedding"],
            }
        )

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        out_v, out_n, out_s = [], [], []
        for _, g in df.groupby("cid", sort=False):
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            if len(ids) < 2:  # singleton cell: nothing to rank, skip the stack
                continue
            mat = _unit(np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]]))
            s = mat @ mat.T
            for i in range(len(ids)):
                row = s[i].copy()
                row[i] = -np.inf  # exclude self
                # rank: score desc, nbr_id asc — lexsort on (-score, id)
                sel = np.lexsort((ids, -row))[: min(k, len(ids) - 1)]
                out_v.extend([int(ids[i])] * len(sel))
                out_n.extend(int(ids[j]) for j in sel)
                out_s.extend(float(row[j]) for j in sel)
        from .exchange import round6

        return pd.DataFrame(
            {
                "vec_id": pd.Series(out_v, dtype="int64"),
                "nbr_id": pd.Series(out_n, dtype="int64"),
                "score": round6(np.asarray(out_s, dtype=np.float64))
                if out_s
                else pd.Series(dtype="float64"),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return _hash_partitioned(ds, "cid", per_cell)


EMB_KNN_GRAPH_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {IVF_CENTROIDS}),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cent.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.emb, cent.cemb), 6) DESC, cent.cid
           ) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
)
SELECT a.vec_id, b.vec_id AS nbr_id,
       round(list_cosine_similarity(e1.emb, e2.emb), 6) AS score
FROM assign a
JOIN assign b ON a.cid = b.cid AND a.vec_id != b.vec_id
JOIN e e1 ON e1.vec_id = a.vec_id
JOIN e e2 ON e2.vec_id = b.vec_id
QUALIFY row_number() OVER (
  PARTITION BY a.vec_id
  ORDER BY list_cosine_similarity(e1.emb, e2.emb) DESC, b.vec_id
) <= {KNN_K}
"""

register("emb_knn_graph", emb_knn_graph, sql=EMB_KNN_GRAPH_SQL)


# --- ANN recall audit: IVF vs brute-force ground truth (X167) ----------------------


def ann_recall_audit(sf_dir: str, k: int = TOPK_K) -> "pd.DataFrame":
    """(query_id, k, n_hits, recall_e6): recall@k of the IVF index
    against the brute-force ground truth per query, the accuracy half of
    the speed/accuracy trade an ANN deployment signs off on (the probed
    -partition pruning is only a win if recall stays where the nprobe
    setting promises).

    Composition of two value-oracled pipelines: both top-k sets land on
    the driver (k × n_queries rows each — constant-sized), intersect
    per query as ID SETS (score-agnostic, so ties broken differently by
    the two paths can't flap the audit), and divide once per query. The
    SQL twin nests both oracles.
    """
    import pandas as pd

    bf = brute_force_topk(sf_dir, k).to_pandas()
    iv = ivf_topk(sf_dir, k).to_pandas()
    cols = {
        "query_id": "int64", "k": "int64",
        "n_hits": "int64", "recall_e6": "int64",
    }
    if len(bf) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    truth = bf.groupby("query_id")["vec_id"].agg(set)
    got = iv.groupby("query_id")["vec_id"].agg(set)
    rows = []
    for qid in sorted(truth.index):
        t = truth[qid]
        g = got.get(qid, set())
        hits = len(t & g)
        rows.append(
            {
                "query_id": int(qid),
                "k": len(t),
                "n_hits": hits,
                "recall_e6": int(
                    np.floor(hits / len(t) * 1e6 + 0.5)
                ),
            }
        )
    return pd.DataFrame(rows).astype(cols)


ANN_RECALL_AUDIT_SQL = f"""
WITH bf AS ({BRUTE_FORCE_TOPK_SQL}),
iv AS ({IVF_TOPK_SQL}),
t AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k FROM bf GROUP BY 1),
h AS (
  SELECT bf.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM bf JOIN iv ON bf.query_id = iv.query_id AND bf.vec_id = iv.vec_id
  GROUP BY 1
)
SELECT t.query_id, t.k, coalesce(h.n_hits, 0) AS n_hits,
       CAST(floor(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(t.k AS DOUBLE)
                  * 1e6 + 0.5) AS BIGINT) AS recall_e6
FROM t LEFT JOIN h USING (query_id)
"""

register("ann_recall_audit", ann_recall_audit, sql=ANN_RECALL_AUDIT_SQL)
