"""SemDeDup-style semantic deduplication over the ``embeddings`` table.

Semantic dedup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540) removes
*meaning*-level duplicates that lexical dedup (MinHash / SimHash in
:mod:`.dedup`) cannot see: cluster the embedding space coarsely with
k-means, then compare pairs ONLY within a cluster and drop all but one
member of each near-duplicate set.

Distributed shape — a composition of two already-verified stages:

1. k-means centroids via :func:`.kmeans.lloyd_centroids` (bounded-partials
   collect: the driver touches K × n_blocks tiny rows, never the corpus);
2. ONE ``map_batches`` pass assigns every vector to its centroid and emits
   (vec_id, cluster_id, embedding) — the vector rides WITH its cluster row
   (the MinHash signature-riding shape) so no join ships vectors back;
3. ``hash_partitioned`` on ``cluster_id``: each cluster's members land in
   one partition, where an exact pairwise unit-cosine matrix decides
   keep/drop in-process.

Keep rule (deterministic, mirrored in the SQL oracle): within a cluster,
members are ranked by ``vec_id``; a member is DROPPED iff some
earlier-ranked member (within the ``_MAX_CLUSTER`` rank cap) has rounded
cosine ≥ ``SEM_TAU`` with it. Members beyond the rank cap are kept
unconditionally — the same ``row_number()``-mirrored skew guard as the
LSH buckets in :mod:`.dedup`. This is the "keep lowest-id exemplar"
variant of SemDeDup's keep-one-per-group; the paper's
farthest-from-centroid choice differs only in which exemplar survives.

At 100 TB the number of clusters K scales with the corpus (SemDeDup used
K ≈ 11k for 230M docs) so the per-cluster pairwise work stays bounded at
(N/K)² and the cluster partitions provide the parallelism; K = 8 here is
the test-scale setting of the same shape. The corpus is the planted-dup
variant (:func:`.dedup.emb_corpus`) so exact-duplicate vectors exist for
the drop path to exercise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .dedup import EMB_DUP_OFFSET, emb_corpus
from .exchange import hash_partitioned, int64_array, list_matrix
from .kmeans import (
    EMB_DIM,
    K_CLUSTERS,
    KMEANS_ITERS,
    _assign,
    _init_centroids,
    lloyd_centroids,
    lloyd_cte_sql,
)
from .queryset import register

SEM_TAU = 0.95
_MAX_CLUSTER = 512  # pairwise cap per cluster (skew guard, rank by vec_id)


def semantic_dedup(sf_dir: str, tau: float = SEM_TAU) -> "ray.data.Dataset":
    """(vec_id, cluster_id, kept) — kept=False iff an earlier-id member of
    the same k-means cluster is a rounded-cosine ≥ tau near-duplicate."""
    cent = lloyd_centroids(
        lambda: emb_corpus(sf_dir), _init_centroids(sf_dir), K_CLUSTERS, KMEANS_ITERS
    )
    ref = ray.put(cent)

    def assign_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        c = ray.get(ref)
        a, _ = _assign(list_matrix(batch["embedding"]), c)
        return pa.table(
            {
                "vec_id": pa.array(int64_array(batch["vec_id"]), type=pa.int64()),
                "cluster_id": pa.array(a, type=pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_cl, out_kept = [], [], []
        for cl, group in df.groupby("cluster_id", sort=True):
            ids = np.asarray(group["vec_id"].tolist(), dtype=np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            mat = np.asarray(group["embedding"].tolist(), dtype=np.float64)[order]
            kept = np.ones(len(ids), dtype=bool)
            capped = mat[:_MAX_CLUSTER]
            norms = np.linalg.norm(capped, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0  # zero-norm guard, same as dedup.py
            unit = capped / norms
            sims = unit @ unit.T
            for j in range(1, len(capped)):
                row = np.round(sims[j, :j], 6)
                if (row >= tau).any():
                    kept[j] = False
            out_id.append(ids)
            out_cl.append(np.full(len(ids), cl, dtype=np.int64))
            out_kept.append(kept)
        if not out_id:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "cluster_id": pd.Series(dtype="int64"),
                    "kept": pd.Series(dtype="bool"),
                }
            )
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_id),
                "cluster_id": np.concatenate(out_cl),
                "kept": np.concatenate(out_kept),
            }
        )

    rows = emb_corpus(sf_dir).map_batches(
        assign_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partitioned(rows, "cluster_id", per_partition)


def _semdedup_oracle_sql(
    tau: float = SEM_TAU,
    k: int = K_CLUSTERS,
    iters: int = KMEANS_ITERS,
    dim: int = EMB_DIM,
) -> str:
    corpus = f"""SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id % 5 = 0"""
    body = lloyd_cte_sql(corpus, k, iters, dim)
    return f"""
WITH {body},
members AS (
  SELECT a.vec_id, a.cid AS cluster_id, v.e,
         row_number() OVER (PARTITION BY a.cid ORDER BY a.vec_id) AS rn
  FROM a{iters} a JOIN ecorpus v USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM members a JOIN members b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE a.rn <= {_MAX_CLUSTER} AND b.rn <= {_MAX_CLUSTER}
    AND round(list_cosine_similarity(a.e, b.e), 6) >= {tau}
)
SELECT m.vec_id, m.cluster_id, (d.vec_id IS NULL) AS kept
FROM members m LEFT JOIN dropped d ON m.vec_id = d.vec_id
"""


register("semantic_dedup", semantic_dedup, sql=_semdedup_oracle_sql())
