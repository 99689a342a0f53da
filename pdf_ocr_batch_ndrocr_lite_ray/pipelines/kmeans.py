"""Distributed k-means (Lloyd's algorithm) over the ``embeddings`` table.

Embedding-space clustering is the third leg of the embedding family next
to near-dup pairing (:mod:`.dedup`) and ANN search (:mod:`.similarity`):
training-data pipelines use it for topic bucketing, semantic dedup
sharding, and building IVF coarse quantizers (the static ``vec_id <
IVF_CENTROIDS`` centroids in :mod:`.similarity` are exactly what a k-means
pass would replace at scale).

Distributed shape — the classic mini-batch-free Lloyd on Ray Data:

- centroids are a K×dim matrix, broadcast once per iteration via
  ``ray.put`` (never re-shipped per block);
- each iteration is ONE ``map_batches`` pass emitting per-block partial
  sums: (cluster_id, count, per-dim sum) — K rows per block, so the
  driver-side reduce touches K × n_blocks tiny rows, never the corpus
  (the bounded-partials collect pattern, same as the KMV sketch);
- assignment is vectorized: ``d² = ‖e‖² + ‖c‖² − 2·e·cᵀ`` via one matmul
  per block, clamped to ≥ 0 (fp cancellation can dip below zero) and
  rounded to 4 dp half-away BEFORE the argmin, lowest-centroid-id
  tie-break — the same rounded-decision convention the ANN/IVF oracles
  use, making the assignment bit-identical to DuckDB's sequential
  ``list_inner_product`` arithmetic except on measure-zero boundaries.

Determinism contract (mirrored verbatim in the SQL oracle):
init centroids = the vectors with ``vec_id < K``, cluster k seeded by
vec_id k; ITERS assignment passes with means updated between them (an
empty cluster keeps its previous centroid); means rounded to 6 dp
half-away each update. The oracle unrolls the iterations as generated
CTE chains with the same formulas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .exchange import int64_array as _int64_array
from .exchange import list_matrix as _list_matrix
from .queryset import register, table_path

K_CLUSTERS = 8
KMEANS_ITERS = 3  # assignment passes; means update after all but the last
EMB_DIM = 64


def _round_half_away(x: np.ndarray, ndigits: int) -> np.ndarray:
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def _assign(mat: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster ids, rounded d²) for each row of ``mat``."""
    e2 = np.sum(mat * mat, axis=1)
    c2 = np.sum(cent * cent, axis=1)
    d2 = e2[:, None] + c2[None, :] - 2.0 * (mat @ cent.T)
    d2 = _round_half_away(np.maximum(d2, 0.0), 4)
    # np.argmin takes the FIRST minimum → lowest centroid id on ties
    a = np.argmin(d2, axis=1)
    return a, d2[np.arange(len(a)), a]


def _init_centroids(sf_dir: str) -> np.ndarray:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    tbl = tbl.filter(pc.less(tbl["vec_id"], K_CLUSTERS)).sort_by("vec_id")
    return _list_matrix(tbl["embedding"])


def lloyd_centroids(source, cent: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Run ``iters - 1`` Lloyd update passes over ``source()`` (a Dataset
    factory yielding (vec_id, embedding) rows) starting from ``cent``;
    returns the centroids the FINAL assignment pass should use.

    Shared by :func:`kmeans_assignments` and the SemDeDup pipeline
    (:mod:`.semdedup`) so both train bit-identically to the unrolled SQL
    oracle CTEs from :func:`lloyd_cte_sql`.
    """
    dim = cent.shape[1]
    for _ in range(iters - 1):
        ref = ray.put(cent)

        def partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "cluster_id": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                        "sums": pa.array([], type=pa.list_(pa.float64())),
                    }
                )
            c = ray.get(ref)
            mat = _list_matrix(batch["embedding"])
            a, _ = _assign(mat, c)
            counts = np.bincount(a, minlength=len(c))
            sums = np.zeros((len(c), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, a, mat)
            present = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster_id": pa.array(present, type=pa.int64()),
                    "n": pa.array(counts[present], type=pa.int64()),
                    "sums": pa.array(list(sums[present]), type=pa.list_(pa.float64())),
                }
            )

        # bounded collect: <= k rows per block of (count, dim-sum) — the
        # corpus itself never reaches the driver
        rows = source().map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in rows:
            counts[r["cluster_id"]] += r["n"]
            sums[r["cluster_id"]] += np.asarray(r["sums"], dtype=np.float64)
        nonempty = counts > 0
        new_cent = cent.copy()  # empty clusters keep their previous centroid
        new_cent[nonempty] = _round_half_away(
            sums[nonempty] / counts[nonempty, None], 6
        )
        cent = new_cent
    return cent


def kmeans_assignments(
    sf_dir: str, k: int = K_CLUSTERS, iters: int = KMEANS_ITERS
) -> "ray.data.Dataset":
    """(vec_id, cluster_id, dist2) after ``iters`` Lloyd assignment passes."""

    def source() -> "ray.data.Dataset":
        return ray.data.read_parquet(
            table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
        )

    cent = lloyd_centroids(source, _init_centroids(sf_dir), k, iters)
    ref = ray.put(cent)

    def final_assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                    "dist2": pa.array([], type=pa.float64()),
                }
            )
        c = ray.get(ref)
        mat = _list_matrix(batch["embedding"])
        a, d2 = _assign(mat, c)
        return pa.table(
            {
                "vec_id": pa.array(_int64_array(batch["vec_id"]), type=pa.int64()),
                "cluster_id": pa.array(a, type=pa.int64()),
                "dist2": pa.array(d2, type=pa.float64()),
            }
        )

    return source().map_batches(
        final_assign, batch_format="pyarrow", zero_copy_batch=True
    )


def lloyd_cte_sql(
    corpus_body: str,
    k: int = K_CLUSTERS,
    iters: int = KMEANS_ITERS,
    dim: int = EMB_DIM,
) -> str:
    """Unrolled-Lloyd CTE chain (no leading WITH, no final SELECT):
    ``ecorpus`` is defined by ``corpus_body`` (must yield ``vec_id, e``);
    iteration t assigns with cent{t-1}, means form cent{t}; empty clusters
    coalesce to the previous centroid. The caller appends its own SELECT
    over ``a{iters}`` (vec_id, cid, d2) and may reuse ``ecorpus``."""
    sql = f"""ecorpus AS (
  {corpus_body}
),
dims AS (SELECT unnest(range(1, {dim + 1})) AS d),
cent0 AS (SELECT vec_id AS cid, e AS c FROM ecorpus WHERE vec_id < {k})"""
    for t in range(1, iters + 1):
        prev = f"cent{t - 1}"
        sql += f""",
d{t} AS (
  SELECT v.vec_id, c.cid,
         greatest(round(
           list_inner_product(v.e, v.e)
           - 2 * list_inner_product(v.e, c.c)
           + list_inner_product(c.c, c.c), 4), 0) AS d2
  FROM ecorpus v CROSS JOIN {prev} c
),
a{t} AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT vec_id, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
    FROM d{t}
  ) WHERE rn = 1
)"""
        if t < iters:
            sql += f""",
m{t} AS (
  SELECT a.cid, dims.d, round(avg(v.e[dims.d]), 6) AS mv
  FROM a{t} a JOIN ecorpus v USING (vec_id) CROSS JOIN dims
  GROUP BY a.cid, dims.d
),
cent{t} AS (
  SELECT p.cid, coalesce(m.c, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT cid, list(mv ORDER BY d) AS c FROM m{t} GROUP BY cid
  ) m USING (cid)
)"""
    return sql


def _kmeans_oracle_sql(
    k: int = K_CLUSTERS, iters: int = KMEANS_ITERS, dim: int = EMB_DIM
) -> str:
    body = lloyd_cte_sql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings",
        k,
        iters,
        dim,
    )
    return (
        f"WITH {body}\n"
        f"SELECT vec_id, cid AS cluster_id, d2 AS dist2 FROM a{iters}"
    )


register("emb_kmeans_assign", kmeans_assignments, sql=_kmeans_oracle_sql())
