"""10× stress harness: deterministic key-offset replicas + one timed run.

Reproduces the BASELINE.md stress protocol (fresh process per op per scale:
untimed self-warmup, then ONE timed run) with a COMMITTED generator, so the
streaming-signature tables can be regenerated in any session.

Usage:
  python tools/stress_replicas.py gen [src_sf_dir] [dst_dir] [copies]
      build key-offset replicas of events/orders/lineitem/documents
      (join structure preserved: lineitem.l_orderkey offsets in lockstep
      with orders.o_orderkey; sources/types/ts untouched so enum folds and
      per-source ops see 10× rows per group, not 10× groups of same size)
  python tools/stress_replicas.py run <query_name> <sf_dir> [num_cpus]
      warmup + timed run of one registered query; prints one JSON line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: per-table int64 key columns to offset per copy (value += copy * span).
#: orders/lineitem share the orderkey span so the join structure of every
#: copy mirrors the original's exactly.
_OFFSET_KEYS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "documents": ["doc_id"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    # labels stay verbatim so per-label ops see 10x rows per label
    "embeddings": ["vec_id"],
}

#: dimension tables copied verbatim (shared by every replica — nation keys
#: are a fixed 25-row enum, offsetting them would break the region join)
_VERBATIM_TABLES = ("nation", "region")


def gen(src: str, dst: str, copies: int = 10) -> None:
    Path(dst).mkdir(parents=True, exist_ok=True)
    # one span per LOGICAL key, taken from the key's defining table, so
    # foreign keys offset in lockstep (lineitem.l_orderkey uses the span of
    # orders.o_orderkey — a per-table max would break the join when the
    # widest orderkey has no line items)
    span_of = {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
        "l_partkey": ("part", "p_partkey"),
        "o_custkey": ("customer", "c_custkey"),
    }
    spans: dict[str, int] = {}

    def span_for(table: str, col: str) -> int:
        st, sc = span_of.get(col, (table, col))
        key = f"{st}.{sc}"
        if key not in spans:
            v = pq.read_table(f"{src}/{st}.parquet", columns=[sc])[sc]
            if len(v):
                vmax = v.combine_chunks().cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                ).max()
                spans[key] = int(vmax) + 1
            else:
                spans[key] = 1
        return spans[key]

    for table, keys in _OFFSET_KEYS.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        parts = []
        for c in range(copies):
            cols = {}
            for name in t.column_names:
                col = t[name]
                if name in keys:
                    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    if arr.null_count:
                        raise ValueError(
                            f"{table}.{name}: {arr.null_count} NULL key values — "
                            "key-offset replication needs non-null keys; drop or "
                            "fill them in the source before generating replicas"
                        )
                    v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
                    cols[name] = pa.array(
                        v + np.int64(c * span_for(table, name)), type=pa.int64()
                    )
                else:
                    cols[name] = col
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts), f"{dst}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {t.num_rows * copies}", file=sys.stderr)
    for table in _VERBATIM_TABLES:
        pq.write_table(pq.read_table(f"{src}/{table}.parquet"), f"{dst}/{table}.parquet")
        print(f"{table}: copied verbatim", file=sys.stderr)


def run(query: str, sf_dir: str, num_cpus: int = 32) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             log_to_driver=False)
    import __ray_entry__ as e

    fn = e.queries()[query]

    import ray.data

    def consume():
        r = fn(sf_dir)
        if isinstance(r, ray.data.Dataset):
            return r.count()
        if isinstance(r, pa.Table):
            return r.num_rows
        return len(r)

    consume()  # untimed self-warmup (read path + worker pool)
    t0 = time.perf_counter()
    n = consume()
    el = time.perf_counter() - t0
    print(json.dumps({"query": query, "sf_dir": sf_dir, "rows": n,
                      "sec": round(el, 3), "num_cpus": num_cpus}))
    ray.shutdown()


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_stress_r5s5",
            int(sys.argv[4]) if len(sys.argv) > 4 else 10)
    elif sys.argv[1] == "run":
        run(sys.argv[2], sys.argv[3],
            int(sys.argv[4]) if len(sys.argv) > 4 else 32)
    else:
        raise SystemExit(__doc__)
