"""Iterative PageRank over the near-duplicate similarity graph.

The engine's iterative-algorithm shape: power iteration where the edge
set stays DISTRIBUTED (one streaming pass per iteration) and the rank
vector is the broadcast state — the bulk-synchronous pattern every
iterative graph/ML algorithm on Ray Data reduces to. The graph is the
symmetrized exact-Jaccard near-dup graph (`dedup_ngram_jaccard` ≥ 0.5),
i.e. "how central is this document in its duplicate neighborhood" — the
signal used to pick canonical representatives inside big dup families.

Numeric contract — the whole iteration runs in int64 1e-9 fixed point so
a SQL oracle can replay it EXACTLY with unrolled CTEs (one per
iteration; iteration count is a constant):

    r0        = floor(1e9 / N + 0.5)
    contrib(u)= floor((r_k[u] * 0.85) / deg[u] + 0.5)     # one fp op chain
    r_{k+1}[v]= base + Σ_{u→v} contrib(u)                 # exact int sum
    base      = floor(0.15 * 1e9 / N + 0.5)

Scale notes: edges never leave the cluster (per-block partial dst-sums
fold on the driver); the rank vector is driver/broadcast state, bounded
by the number of NODES (docs with ≥ 1 near-dup edge — a small slice of
any real corpus). ``_MAX_BROADCAST_NODES`` guards the assumption with an
actionable error naming the escalation (hash-partition-aligned
rank/edge join, the same shape as `exchange.hash_partitioned`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .dedup import DEDUP_NGRAM_JACCARD_SQL, dedup_ngram_jaccard
from .queryset import register

PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85

#: broadcast-state guard: beyond this many graph nodes the rank vector no
#: longer belongs on the driver — switch to a partition-aligned join
_MAX_BROADCAST_NODES = 5_000_000


def docs_pagerank(sf_dir: str, iters: int = PAGERANK_ITERS) -> "pa.Table":
    """(doc_id, rank_e9): fixed-point PageRank after ``iters`` power
    iterations over the symmetrized near-dup graph. Deterministic and
    SQL-replayable; isolated docs (no near-dup edge) are not nodes."""
    pairs = dedup_ngram_jaccard(sf_dir).select_columns(["doc_a", "doc_b"])

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["doc_b"].combine_chunks(), t["doc_a"].combine_chunks()]
                ),
            }
        )

    # materialize ONCE: the edge list is the small derived output of the
    # jaccard pipeline (pairs only, never text); leaving it lazy would
    # re-execute both jaccard exchanges on every one of the iters+1
    # passes below
    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # degree fold: per-block src counts → driver dict (node-bounded state)
    deg: dict[int, int] = {}
    for b in edges.iter_batches(batch_size=65_536, batch_format="pandas"):
        for u, c in b["src"].value_counts().items():
            deg[int(u)] = deg.get(int(u), 0) + int(c)
    n = len(deg)
    if n == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "rank_e9": pa.array([], type=pa.int64())})
    if n > _MAX_BROADCAST_NODES:
        raise ValueError(
            f"near-dup graph has {n} nodes (> {_MAX_BROADCAST_NODES}); "
            "broadcast-rank power iteration no longer fits driver state — "
            "switch to the hash-partition-aligned rank/edge join"
        )
    base = int(np.floor(0.15 * 1e9 / n + 0.5))
    ranks = {u: int(np.floor(1e9 / n + 0.5)) for u in deg}

    for _ in range(iters):
        state = ray.put((ranks, deg))

        def partial_sums(b: pd.DataFrame) -> pd.DataFrame:
            r, d = ray.get(state)
            src = b["src"].to_numpy()
            contrib = np.array(
                [int(np.floor((r[int(u)] * PAGERANK_DAMPING) / d[int(u)] + 0.5))
                 for u in src],
                dtype=np.int64,
            )
            g = pd.DataFrame({"dst": b["dst"].to_numpy(), "c": contrib}).groupby(
                "dst", sort=False
            )["c"].sum()
            return pd.DataFrame({"dst": g.index.to_numpy(), "c": g.to_numpy()})

        sums: dict[int, int] = {}
        for b in edges.map_batches(partial_sums, batch_format="pandas").iter_batches(
            batch_size=65_536, batch_format="pandas"
        ):
            for v, c in zip(b["dst"], b["c"]):
                sums[int(v)] = sums.get(int(v), 0) + int(c)
        ranks = {u: base + sums.get(u, 0) for u in deg}

    out = sorted(ranks.items())
    return pa.table(
        {
            "doc_id": pa.array([u for u, _ in out], type=pa.int64()),
            "rank_e9": pa.array([r for _, r in out], type=pa.int64()),
        }
    )


def _pagerank_oracle_sql(iters: int = PAGERANK_ITERS) -> str:
    # reuse the jaccard oracle verbatim as the edge source, then unroll
    # the fixed-point power iteration one CTE per round
    body = DEDUP_NGRAM_JACCARD_SQL.strip().rstrip(";")
    it = f"""
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src AS u, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT u, CAST(floor(1e9 / n + 0.5) AS BIGINT) AS r FROM deg, nn)
"""
    for k in range(iters):
        it += f""",
r{k + 1} AS (
  SELECT d.u,
         CAST(floor(0.15 * 1e9 / nn.n + 0.5) AS BIGINT)
           + coalesce(s.c, 0) AS r
  FROM deg d CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS u,
           CAST(sum(CAST(floor((r{k}.r * {PAGERANK_DAMPING}) / deg.deg + 0.5)
                         AS BIGINT)) AS BIGINT) AS c
    FROM edges e
    JOIN r{k} ON r{k}.u = e.src
    JOIN deg ON deg.u = e.src
    GROUP BY e.dst
  ) s ON s.u = d.u
)
"""
    return (
        f"WITH pairs AS ({body}),\n{it}\n"
        f"SELECT u AS doc_id, r AS rank_e9 FROM r{iters}"
    )


register("docs_pagerank", docs_pagerank, sql=_pagerank_oracle_sql())
