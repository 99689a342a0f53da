"""Distributed PCA over the embedding corpus.

Dimensionality reduction ahead of ANN/clustering is a standard
training-data step; its distributed core is just a bounded partial fold:
the d×d second-moment (Gram) matrix and the column-sum vector are
mergeable sums, so each block emits one d×d partial and the driver holds
≤ d² + d values — no all-to-all, no materialized corpus. Covariance,
eigenvectors, and the projection follow on the driver from those
sufficient statistics (Tropp-style streaming PCA without the sketching,
exact because d is small).

Numeric contract: embeddings quantize to int64 1e-6 fixed point FIRST,
so every Gram/sum entry is an EXACT integer — reduction-order-free and
value-oracle-able in SQL (`emb_gram`). The eigendecomposition itself is
not SQL-expressible; `emb_pca_project` is value-oracled instead against a
MATERIALIZED serial golden (e6-quantized output, deterministic sign) and
additionally pinned by invariant tests: projected variance equals the
eigenvalue, components are orthonormal.

Magnitude safety: |q| ≤ ~2^21 for unit-scale embeddings (1e-6 units),
so a Gram entry grows ~2^42 per row — int64 overflows past ~2M rows per
PARTIAL and float64 loses exactness past 2^53 in the FOLD. Blocks are
far below the former; the fold guards the latter explicitly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .exchange import enum_group_agg, list_matrix
from .queryset import register, table_path

#: fixed-point scale for embedding coordinates
EMB_E6 = 1_000_000

#: principal components emitted by the projection query
PCA_K = 2


def _quantized(batch: pa.Table) -> np.ndarray:
    """int64 1e-6 fixed-point matrix; pairs with SQL
    ``CAST(floor(e * 1000000 + 0.5) AS BIGINT)`` (float32 widens to
    double exactly on both engines)."""
    m = list_matrix(batch["embedding"])
    return np.floor(m * EMB_E6 + 0.5).astype(np.int64)


def _gram_fold(sf_dir: str) -> tuple[np.ndarray, np.ndarray, int]:
    """(gram int64[d,d], col_sum int64[d], n): exact sufficient stats in
    one streaming pass."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantized(batch)
        if q.size == 0:
            return pa.table(
                {
                    "i": pa.array([], type=pa.int64()),
                    "j": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.int64()),
                    "m": pa.array([], type=pa.int64()),
                }
            )
        # overflow pre-check in FLOAT, before any int64 product can wrap:
        # every entry of q.T @ q is bounded by n_rows * max|q|^2
        qmax = int(np.abs(q).max())
        if len(q) * float(qmax) ** 2 >= 2.0**63:
            raise ValueError(
                f"gram partial over {len(q)} rows with max|q|={qmax} can "
                "exceed int64 — lower the block size or switch to the "
                "hierarchical int128 fold"
            )
        d = q.shape[1]
        g = q.T @ q  # int64-exact per the pre-check above
        iu = np.triu_indices(d)
        sums = q.sum(axis=0)
        # ride the column sums, the row count, and max|q| as extra rows
        # (j = -1 / -2 / -3); "m" is the max-folded channel (0 elsewhere)
        n_rows = len(iu[0]) + d + 2
        m_col = np.zeros(n_rows, dtype=np.int64)
        m_col[-1] = qmax
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate([iu[0], np.arange(d), [0, 0]]), type=pa.int64()
                ),
                "j": pa.array(
                    np.concatenate([iu[1], np.full(d, -1), [-2, -3]]), type=pa.int64()
                ),
                "s": pa.array(
                    np.concatenate([g[iu], sums, [len(q), 0]]), type=pa.int64()
                ),
                "m": pa.array(m_col, type=pa.int64()),
            }
        )

    rows = enum_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        {"s": "sum", "m": "max"},
    )
    if len(rows) == 0:
        return np.zeros((0, 0), dtype=np.int64), np.zeros(0, dtype=np.int64), 0
    n = int(rows.loc[(rows["i"] == 0) & (rows["j"] == -2), "s"].sum())
    # int64-exactness check for the WHOLE fold, from the ridden row count
    # and global max|q| — never from the already-summed entries, which wrap
    # silently on overflow (a doubly-wrapped sum can land back under any
    # threshold). Documented escalation: hierarchical int128 fold.
    qmax = int(rows.loc[rows["j"] == -3, "m"].max())
    if float(n) * float(qmax) ** 2 >= 2.0**63:
        raise ValueError(
            f"gram fold over n={n} rows with max|q|={qmax} can exceed "
            "int64 — switch to the hierarchical int128 fold"
        )
    sums_rows = rows[rows["j"] == -1]
    d = len(sums_rows)
    col_sum = np.zeros(d, dtype=np.int64)
    col_sum[sums_rows["i"].to_numpy()] = sums_rows["s"].to_numpy()
    gram = np.zeros((d, d), dtype=np.int64)
    gm = rows[rows["j"] >= 0]
    gram[gm["i"].to_numpy(), gm["j"].to_numpy()] = gm["s"].to_numpy()
    gram = gram + np.triu(gram, 1).T  # mirror the upper triangle
    return gram, col_sum, n


def emb_gram(sf_dir: str) -> "pa.Table":
    """(i, j, s): the exact upper-triangle int64 Gram matrix of the
    1e-6-quantized embeddings — the distributed sufficient statistic
    PCA/covariance reduces to. One streaming pass, d²-bounded fold."""
    gram, _, _ = _gram_fold(sf_dir)
    if gram.size == 0:
        return pa.table(
            {
                "i": pa.array([], type=pa.int64()),
                "j": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
            }
        )
    iu = np.triu_indices(gram.shape[0])
    return pa.table(
        {
            "i": pa.array(iu[0], type=pa.int64()),
            "j": pa.array(iu[1], type=pa.int64()),
            "s": pa.array(gram[iu], type=pa.int64()),
        }
    )


def emb_pca_project(sf_dir: str, k: int = PCA_K) -> "ray.data.Dataset":
    """(vec_id, pc1, pc2): project every embedding onto the top-k
    principal components of the corpus (covariance from the exact Gram
    fold; eigendecomposition on the driver; components broadcast).

    Output contract: projections are quantized to 1e-6 (half-away, the
    repo-wide ``round6`` contract) under a deterministic sign convention
    (largest-|coordinate| loading positive). That makes the query
    value-oracle-able via a MATERIALIZED golden (serial single-process
    twin, ``materialize_expected_pca``): the eigendecomposition input (the
    exact int64 Gram) is identical on both paths, so eigh is bit-identical,
    and the only float divergence left — BLAS reduction order in the
    batched projection gemm — is ulp-scale, absorbed by the e6
    quantization. Invariant tests additionally pin projected variance ≈
    eigenvalue and orthonormality.
    """
    gram, col_sum, n = _gram_fold(sf_dir)
    if n == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    **{f"pc{c + 1}": pd.Series(dtype="float64") for c in range(k)},
                }
            )
        )
    mean = col_sum.astype(np.float64) / n
    cov = gram.astype(np.float64) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps = evecs[:, ::-1][:, :k]  # top-k columns
    # deterministic sign: make the largest-|x| coordinate positive
    for c in range(comps.shape[1]):
        arg = int(np.argmax(np.abs(comps[:, c])))
        if comps[arg, c] < 0:
            comps[:, c] = -comps[:, c]
    ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pa.Table:
        from .exchange import round6

        mean_b, comps_b = ray.get(ref)
        q = _quantized(batch).astype(np.float64)
        proj = round6((q - mean_b) @ comps_b / EMB_E6)  # back to unit scale
        cols = {"vec_id": batch["vec_id"].cast(pa.int64())}
        for c in range(comps_b.shape[1]):
            cols[f"pc{c + 1}"] = pa.array(proj[:, c], type=pa.float64())
        return pa.table(cols)

    ds = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    return ds.map_batches(project, batch_format="pyarrow")


# --- materialized golden oracle -----------------------------------------------

_EXPECTED_PCA_VERSION = 1


def _build_expected_pca(sf_dir: str) -> pa.Table:
    """Serial single-process twin of ``emb_pca_project`` (no Ray, no
    batching): exact int64 Gram accumulated over the whole table at once,
    same eigh/sign/rounding chain, one full-matrix projection gemm."""
    import pyarrow.parquet as _pq

    from .exchange import round6

    src = _pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    q = np.floor(
        np.asarray(src["embedding"].to_pylist(), dtype=np.float64) * EMB_E6 + 0.5
    ).astype(np.int64)
    n = len(q)
    gram = q.T @ q
    col_sum = q.sum(axis=0)
    mean = col_sum.astype(np.float64) / n
    cov = gram.astype(np.float64) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :PCA_K]
    for c in range(comps.shape[1]):
        arg = int(np.argmax(np.abs(comps[:, c])))
        if comps[arg, c] < 0:
            comps[:, c] = -comps[:, c]
    proj = round6((q.astype(np.float64) - mean) @ comps / EMB_E6)
    cols = {"vec_id": src["vec_id"].cast(pa.int64())}
    for c in range(PCA_K):
        cols[f"pc{c + 1}"] = pa.array(proj[:, c], type=pa.float64())
    return pa.table(cols)


def expected_pca_path(sf_dir: str) -> str:
    from .queryset import expected_table_path

    return expected_table_path("expected-pca", sf_dir, _EXPECTED_PCA_VERSION)


def materialize_expected_pca(sf_dir: str) -> str:
    from .queryset import materialize_expected_table

    return materialize_expected_table(
        "expected-pca", sf_dir, _EXPECTED_PCA_VERSION, _build_expected_pca
    )


EMB_PCA_PROJECT_SQL = (
    "SELECT vec_id, pc1, pc2 FROM read_parquet("
    f"'{expected_pca_path('/root/testdata/sf0.01')}')"
)


#: the inner CAST AS DOUBLE is load-bearing: without it DuckDB multiplies
#: in FLOAT (the column type) and the float32-rounded product lands on the
#: other side of floor() for ~half of all coordinates
EMB_GRAM_SQL = f"""
WITH x AS (
  SELECT vec_id,
         unnest(range(1, len(embedding) + 1)) AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {EMB_E6} + 0.5) AS BIGINT) AS q
  FROM embeddings
)
SELECT a.i - 1 AS i, b.i - 1 AS j, CAST(sum(a.q * b.q) AS BIGINT) AS s
FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
"""

register("emb_gram", emb_gram, sql=EMB_GRAM_SQL)
register("emb_pca_project", emb_pca_project, sql=EMB_PCA_PROJECT_SQL)

from .queryset import MATERIALIZERS, SF_PATH_HELPERS  # noqa: E402

MATERIALIZERS.append(materialize_expected_pca)
SF_PATH_HELPERS.append(expected_pca_path)


def emb_label_centroids(sf_dir: str) -> "pd.DataFrame":
    """(label, n, centroid_e6 list<int64>): per-label element-wise vector
    sums in e6 fixed point plus counts — the exact mergeable form of a
    per-class centroid table (mean = centroid_e6 / n / 1e6 derived by the
    caller, so no division ever enters the hashed value).

    Scale shape: each block folds its labels' (count, 64-dim int sum) —
    ≤ #labels rows per block regardless of block height, all matmul-free
    ``np.add.at`` on the zero-copy matrix view; the driver merges a
    #labels × dim integer frame. Exact-integer discipline like
    ``emb_gram``'s Gram fold — float32 widens to float64 losslessly and
    each element quantizes to e6 BEFORE any sum, so block layout can't
    move a digit — but note the quantizer here is half-AWAY-from-zero
    (matching this op's own oracle) while ``emb_gram``'s ``_quantized``
    is half-up; they differ at negative .5e-6 boundaries.

    NULL contract (mirrored in the SQL): rows with a NULL label or NULL
    embedding are excluded; NULL elements inside a vector count as 0.
    """
    def _filled_matrix(col):
        """list_matrix with NULL elements as 0 (a fully-NULL list was
        already filtered out, so offsets are uniform)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc

        # flatten(), not .values: a sliced ListArray's .values returns the
        # full unsliced child (same slice-safety rule as exchange.list_matrix)
        if pa.types.is_fixed_size_list(col.type):
            w = col.type.list_size
        else:
            offs = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            if widths.size and (widths != widths[0]).any():
                raise ValueError("ragged list column cannot form a matrix")
            w = int(widths[0]) if widths.size else 0
        vals = pc.fill_null(col.flatten(), 0.0)
        flat = vals.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        return flat.reshape(len(col), w) if len(col) else np.zeros((0, 0))

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_valid(batch["label"]), pc.is_valid(batch["embedding"]))
        batch = batch.filter(keep)
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(labels) == 0:
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "sums": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        m = _filled_matrix(batch["embedding"])  # float32 -> float64, lossless
        q = (np.sign(m) * np.floor(np.abs(m) * 1e6 + 0.5)).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq, type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
                "sums": pa.array(sums.tolist(), type=pa.list_(pa.int64())),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["label", "embedding"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    acc: dict[int, tuple[int, np.ndarray]] = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for lab, n, s in zip(b["label"], b["n"], b["sums"]):
            s = np.asarray(s, dtype=np.int64)
            if int(lab) in acc:
                pn, ps = acc[int(lab)]
                acc[int(lab)] = (pn + int(n), ps + s)
            else:
                acc[int(lab)] = (int(n), s)
    labs = sorted(acc)
    # comma-joined string, not a list column: list cells stringify
    # differently in pandas vs DuckDB df() (``[1, 2]`` vs ``[1 2]``) and
    # would break the driver's value hash — the same flat-serialization
    # rule the flagship span boundaries use
    return pd.DataFrame(
        {
            "label": pd.Series(labs, dtype="int64"),
            "n": pd.Series([acc[l][0] for l in labs], dtype="int64"),
            "centroid_e6": pd.Series(
                [",".join(map(str, acc[l][1].tolist())) for l in labs],
                dtype="object",
            ),
        }
    )


EMB_LABEL_CENTROIDS_SQL = """
WITH e AS (
  SELECT label, i,
         CAST(CASE WHEN v IS NULL THEN 0
                   WHEN CAST(v AS DOUBLE) >= 0
                     THEN floor(CAST(v AS DOUBLE) * 1e6 + 0.5)
                   ELSE -floor(-CAST(v AS DOUBLE) * 1e6 + 0.5)
              END AS BIGINT) AS q
  FROM (
    SELECT label, unnest(embedding) AS v,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
    WHERE label IS NOT NULL AND embedding IS NOT NULL
  )
),
s AS (
  SELECT label, i, CAST(sum(q) AS BIGINT) AS sq, count(*) AS cnt
  FROM e GROUP BY 1, 2
)
SELECT label,
       CAST(max(cnt) AS BIGINT) AS n,
       array_to_string(list(sq ORDER BY i), ',') AS centroid_e6
FROM s GROUP BY label
"""

register("emb_label_centroids", emb_label_centroids, sql=EMB_LABEL_CENTROIDS_SQL)


# --- per-dimension stats + int8 quantization scales (X126) -------------------

EMB_DIM = 64  # the synthetic embedding width (embeddings.parquet)


def emb_dimension_stats(sf_dir: str) -> "pd.DataFrame":
    """(dim, n, min_e9, max_e9, scale_e9): per-dimension value range over
    the embedding corpus plus the int8 quantization step each dimension
    would use — the calibration pass every scalar-quantized ANN index
    (FAISS SQ8 shape) runs before encoding. min/max are order-free exact
    folds (no summation): one (dim, n, min, max) partial per block via
    the zero-copy list→matrix view, driver enum fold over the fixed 64
    dims, zero exchanges. NULL rows and ragged lists are excluded; NULL
    ELEMENTS are skipped per dimension (nan-aware min/max) — both
    mirrored by the SQL unnest twin. Quantization: e9 fixed point
    half-away (the shared contract), scale = ceil(span/255) in INTEGER
    arithmetic so engine and oracle pick the same step."""
    import pandas as pd

    from .exchange import half_up_int64

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc

        lens = pc.list_value_length(col)
        m = pc.and_(pc.is_valid(col), pc.equal(pc.fill_null(lens, -1), EMB_DIM))
        t = col.filter(m)
        if len(t) == 0:
            return pa.table(
                {
                    "dim": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "mn": pa.array([], type=pa.float64()),
                    "mx": pa.array([], type=pa.float64()),
                }
            )
        mat = list_matrix(t)  # NULL elements arrive as NaN
        n = (~np.isnan(mat)).sum(axis=0).astype(np.int64)
        with np.errstate(invalid="ignore"):
            mn = np.nanmin(mat, axis=0)
            mx = np.nanmax(mat, axis=0)
        keep = n > 0
        dims = np.arange(1, EMB_DIM + 1, dtype=np.int64)
        return pa.table(
            {
                "dim": pa.array(dims[keep]),
                "n": pa.array(n[keep]),
                "mn": pa.array(mn[keep]),
                "mx": pa.array(mx[keep]),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["embedding"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    acc: dict[int, list] = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for row in b.itertuples(index=False):
            a = acc.setdefault(int(row.dim), [0, np.inf, -np.inf])
            a[0] += int(row.n)
            a[1] = min(a[1], float(row.mn))
            a[2] = max(a[2], float(row.mx))
    dims = sorted(acc)
    mins = half_up_int64(np.array([acc[d][1] for d in dims]) * 1e9)
    maxs = half_up_int64(np.array([acc[d][2] for d in dims]) * 1e9)
    span = maxs - mins
    scale = (span + 254) // 255  # integer ceil(span/255); 0 for flat dims
    return pd.DataFrame(
        {
            "dim": pd.Series(dims, dtype="int64"),
            "n": pd.Series([acc[d][0] for d in dims], dtype="int64"),
            "min_e9": pd.Series(mins, dtype="int64"),
            "max_e9": pd.Series(maxs, dtype="int64"),
            "scale_e9": pd.Series(scale, dtype="int64"),
        }
    )


EMB_DIMENSION_STATS_SQL = f"""
WITH x AS (
  SELECT unnest(embedding) AS v,
         unnest(generate_series(1, len(embedding))) AS dim
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {EMB_DIM}
),
s AS (
  SELECT dim, CAST(count(v) AS BIGINT) AS n,
         CAST(round(CAST(min(v) AS DOUBLE) * 1e9, 0) AS BIGINT) AS min_e9,
         CAST(round(CAST(max(v) AS DOUBLE) * 1e9, 0) AS BIGINT) AS max_e9
  FROM x GROUP BY dim HAVING count(v) > 0
)
SELECT CAST(dim AS BIGINT) AS dim, n, min_e9, max_e9,
       CAST(floor((max_e9 - min_e9 + 254) / 255.0) AS BIGINT) AS scale_e9
FROM s
"""

register("emb_dimension_stats", emb_dimension_stats, sql=EMB_DIMENSION_STATS_SQL)


# --- per-label simplified silhouette (X141) -----------------------------------


def emb_label_silhouette(sf_dir: str) -> "pd.DataFrame":
    """(label, n, mean_sil_e6): the SIMPLIFIED silhouette of each label's
    embedding cluster — per point, a = rounded squared distance to its
    own label centroid, b = the minimum over other labels, s =
    (b−a)/max(a,b) — the label-quality score a curator reads before
    trusting class-balanced sampling (negative mean = that label's
    points sit closer to some other centroid than their own; the O(n·k)
    centroid form of the O(n²) exact silhouette).

    Float contract (the ``emb_kmeans_assign`` chain, kmeans.py:54-61):
    centroids are float64 per-dim means rounded half-away to 6 decimals;
    squared distances round half-away to 4 BEFORE comparison; per-point
    ``s`` quantizes to e6 BEFORE the order-free integer sum; one shared
    IEEE division per label. max(a,b) == 0 → s = 0 on both engines.

    Scale shape: two column-pruned passes, zero shuffle — a (label,
    count, dim-sum) fold (≤ #labels rows per block) for centroids, then
    a broadcast-centroid pass emitting ≤ #labels (n, Σs_e6) partials per
    block into the enum fold. Single-label corpora return empty (b is
    undefined).
    """
    import pyarrow.compute as pc

    from .kmeans import _round_half_away

    path = table_path(sf_dir, "embeddings")

    def cent_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["label"]), pc.is_valid(batch["embedding"]))
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sums": pa.array([], pa.list_(pa.float64())),
                }
            )
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_matrix(t["embedding"])
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        return pa.table(
            {
                "label": pa.array(uniq, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sums": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    rows = (
        ray.data.read_parquet(path, columns=["label", "embedding"])
        .map_batches(cent_partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()  # bounded: ≤ #labels rows per block
    )
    empty = pd.DataFrame(
        {
            "label": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "mean_sil_e6": pd.Series(dtype="int64"),
        }
    )
    acc: dict[int, tuple[int, np.ndarray]] = {}
    for r in rows:
        lab = int(r["label"])
        s = np.asarray(r["sums"], dtype=np.float64)
        if lab in acc:
            pn, ps = acc[lab]
            acc[lab] = (pn + int(r["n"]), ps + s)
        else:
            acc[lab] = (int(r["n"]), s)
    labs = sorted(acc)
    if len(labs) < 2:
        return empty
    cent = _round_half_away(
        np.stack([acc[l][1] / acc[l][0] for l in labs]), 6
    )
    lab_arr = np.array(labs, dtype=np.int64)
    ref = ray.put((lab_arr, cent))

    def sil_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["label"]), pc.is_valid(batch["embedding"]))
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "ssum": pa.array([], pa.int64()),
                }
            )
        labsb, c = ray.get(ref)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_matrix(t["embedding"])
        # full rounded-d2 matrix through the exact _assign arithmetic
        # (kmeans.py:54-61; _assign itself returns only the argmin)
        e2 = np.sum(m * m, axis=1)
        c2 = np.sum(c * c, axis=1)
        d2 = e2[:, None] + c2[None, :] - 2.0 * (m @ c.T)
        d2 = _round_half_away(np.maximum(d2, 0.0), 4)
        own_idx = np.searchsorted(labsb, labels)
        a = d2[np.arange(len(labels)), own_idx]
        masked = d2.copy()
        masked[np.arange(len(labels)), own_idx] = np.inf
        b = masked.min(axis=1)
        mx = np.maximum(a, b)
        s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
        s6 = np.floor(s * 1e6 + 0.5).astype(np.int64)
        g = pd.DataFrame({"label": labels, "n": 1, "ssum": s6}).groupby(
            "label", sort=False
        ).sum().reset_index()
        return pa.table(
            {
                "label": pa.array(g["label"].to_numpy(dtype=np.int64)),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
                "ssum": pa.array(g["ssum"].to_numpy(dtype=np.int64)),
            }
        )

    folded = enum_group_agg(
        ray.data.read_parquet(path, columns=["label", "embedding"]).map_batches(
            sil_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["label"],
        {"n": "sum", "ssum": "sum"},
    )
    if len(folded) == 0:
        return empty
    folded = folded.sort_values("label").reset_index(drop=True)
    mean = np.floor(
        folded["ssum"].to_numpy(dtype=np.float64)
        / folded["n"].to_numpy(dtype=np.float64)
        + 0.5
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "label": folded["label"].astype("int64"),
            "n": folded["n"].astype("int64"),
            "mean_sil_e6": mean,
        }
    )


EMB_LABEL_SILHOUETTE_SQL = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL
),
dims AS (SELECT unnest(range(1, 65)) AS d),
m AS (
  SELECT label AS cid, dims.d, round(avg(e[dims.d]), 6) AS mv
  FROM e CROSS JOIN dims GROUP BY 1, 2
),
cent AS (SELECT cid, list(mv ORDER BY d) AS c FROM m GROUP BY cid),
dd AS (
  SELECT v.vec_id, v.label, c.cid,
         greatest(round(
           list_inner_product(v.e, v.e)
           - 2 * list_inner_product(v.e, c.c)
           + list_inner_product(c.c, c.c), 4), 0) AS d2
  FROM e v CROSS JOIN cent c
),
ab AS (
  SELECT vec_id, label,
         max(CASE WHEN cid = label THEN d2 END) AS a,
         min(CASE WHEN cid <> label THEN d2 END) AS b
  FROM dd GROUP BY 1, 2
),
s AS (
  SELECT label,
         CAST(floor(
           CASE WHEN greatest(a, b) = 0 THEN 0.0
                ELSE (b - a) / greatest(a, b) END * 1e6 + 0.5) AS BIGINT) AS s6
  FROM ab WHERE b IS NOT NULL
),
g AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s6) AS BIGINT) AS ssum
  FROM s GROUP BY label
)
SELECT label, n,
       CAST(floor(CAST(ssum AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)
         AS mean_sil_e6
FROM g
"""

register("emb_label_silhouette", emb_label_silhouette, sql=EMB_LABEL_SILHOUETTE_SQL)
