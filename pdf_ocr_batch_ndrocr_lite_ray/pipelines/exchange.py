"""Shared exchange helpers for grouped work over Ray Datasets."""

from __future__ import annotations

import pyarrow as pa

import ray.data

_GROUP_PARTITIONS = 64


def rename(ds: "ray.data.Dataset", mapping: dict[str, str]) -> "ray.data.Dataset":
    """Rename via an Arrow projection; ``Dataset.rename_columns`` breaks on
    pandas-format blocks (map_groups output)."""

    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def hash_partitioned(
    ds: "ray.data.Dataset", key: str, per_partition, num_partitions: int = _GROUP_PARTITIONS
) -> "ray.data.Dataset":
    """Apply ``per_partition(df)`` once per hash partition of ``key``.

    ``groupby(key).map_groups`` pays per-group task/DataFrame overhead —
    ruinous when groups are tiny and numerous (LSH buckets: ~16×n_docs
    groups, almost all singletons). Partitioning by ``hash(key)`` first
    gives every group to exactly one partition, and ``per_partition``
    iterates groups in-process with plain pandas. Same exchange volume,
    ~1000× fewer task invocations.
    """
    import zlib

    import numpy as np

    def add_pid(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if pa.types.is_integer(col.type) and col.null_count == 0:
            # vectorized Knuth multiplicative hash — the per-row Python
            # crc32 loop dominates at millions of pair rows. int64→uint64
            # reinterpretation keeps negative keys well-defined; null keys
            # fall back to the generic path below.
            vals = np.asarray(col.to_pylist(), dtype=np.int64).astype(np.uint64)
            pid_np = ((vals * np.uint64(2654435761)) >> np.uint64(16)) % np.uint64(
                num_partitions
            )
            pid = pa.array(pid_np.astype(np.int32), type=pa.int32())
        else:
            pid = pa.array(
                [
                    zlib.crc32(str(k).encode()) % num_partitions
                    for k in col.to_pylist()
                ],
                type=pa.int32(),
            )
        return batch.append_column("_pid", pid)

    def run_partition(df):
        out = per_partition(df)
        # the partition id is internal plumbing: never let it leak into a
        # per_partition result that passes input columns through
        if "_pid" in out.columns:
            out = out.drop(columns=["_pid"])
        return out

    return (
        ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("_pid")
        .map_groups(run_partition, batch_format="pandas")
    )
