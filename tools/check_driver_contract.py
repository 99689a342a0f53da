"""Simulate the evaluation driver: run entry(), then each queries() entry at
sf=0.01 and compare against its oracle_sql() via DuckDB (row count + schema +
order-insensitive value hash).
Usage: python tools/check_driver_contract.py [sf_dir] [only_substr ...]
Extra args filter the checked queries by substring (faster iteration); with
filters active, entry() is skipped.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd
import pyarrow as pa

import ray

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if hasattr(result, "to_pandas"):  # ray Dataset
        return result.to_pandas()
    raise TypeError(type(result))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    if len(df) == 0:  # apply() on an empty frame returns a DataFrame
        return "empty"
    rows = sorted(df.apply(lambda r: "\x1f".join(r.values), axis=1).tolist())
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main() -> int:
    ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)
    import __ray_entry__ as e

    if not ONLY:
        res = e.entry()
        n = res.count() if hasattr(res, "count") else len(res)
        print(f"entry(): OK, {n} rows, schema: {res.schema() if hasattr(res, 'schema') else list(res.columns)}")

    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

    # re-target cache-path oracles at the sf_dir under comparison (the
    # driver-facing e.oracle_sql() pins the driver's sf0.01 scale)
    qs, oracles = e.queries(), queryset.oracle_sql_for(SF_DIR)
    if ONLY:
        qs = {n: f for n, f in qs.items() if any(s in n for s in ONLY)}
    failures = 0
    for name, fn in qs.items():
        try:
            ours = to_pandas(fn(SF_DIR))
        except Exception as exc:
            print(f"  {name}: QUERY ERROR {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"  {name}: rows-only, {len(ours)} rows, cols={sorted(ours.columns)}")
            continue
        try:
            golden = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"  {name}: ORACLE SQL ERROR {exc}")
            failures += 1
            continue
        ok_rows = len(ours) == len(golden)
        ok_cols = sorted(ours.columns) == sorted(golden.columns)
        ok_hash = ok_rows and ok_cols and value_hash(ours) == value_hash(golden)
        status = "MATCH" if ok_hash else "MISMATCH"
        if not ok_hash:
            failures += 1
        print(f"  {name}: {status} (rows {len(ours)}/{len(golden)}, cols ok={ok_cols})")
        if not ok_hash and ok_cols:
            merged = ours.sort_values(sorted(ours.columns)).reset_index(drop=True).compare(
                golden[ours.columns].sort_values(sorted(ours.columns)).reset_index(drop=True)
                if ok_rows else golden[ours.columns].head(len(ours)).sort_values(sorted(ours.columns)).reset_index(drop=True)
            ) if ok_rows else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
