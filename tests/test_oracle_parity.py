"""Blanket value-parity loop: one test per oracle-carrying registry query.

The driver's CORRECTNESS gate hashes only its 50-entry window per round;
this loop keeps EVERY query with an ``oracle_sql()`` entry value-checked in
pytest regardless of window position (VERDICT r3 item 8). Dedicated operator
tests elsewhere pin invariants and edge cases; this one pins the value hash.

Scale selection: oracles that embed deterministic cache paths (synthesized
transcripts / media tables) are pinned to sf0.01 data, so those queries run
at sf0.01; everything else runs against the sf0.001 views — same comparison
the driver performs (row count + column set + order-insensitive value hash).
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_CACHE = "/root/testdata/sf0.01"  # cache-path oracles embed this scale
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _names() -> list[str]:
    import __ray_entry__  # noqa: F401  (registers every query module)
    from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

    return sorted(queryset.ORACLE_SQL)


@pytest.fixture(scope="module")
def oracle_env():
    import __ray_entry__  # noqa: F401  (registers every query module)
    from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

    # one SQL dict per scale, each with its cache-path oracles re-targeted
    # and its cache tables materialized (oracle_sql_for does both)
    sqls = {sf: queryset.oracle_sql_for(sf) for sf in (SF_SMALL, SF_CACHE)}
    cache_names = queryset.cache_sql_names()
    cons = {}
    for sf in (SF_SMALL, SF_CACHE):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        cons[sf] = con
    return sqls, cache_names, cons


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    if len(df) == 0:
        return "empty"
    rows = sorted(df.apply(lambda r: "\x1f".join(r.values), axis=1).tolist())
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", _names())
def test_value_parity(name, ray_session, oracle_env):
    from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

    sqls, cache_names, cons = oracle_env
    # cache-path oracles stay at the driver's sf0.01 (the scale the external
    # gate hashes); everything else runs the cheaper sf0.001 views — but the
    # selection is now explicit registry metadata, not a substring of the SQL
    sf = SF_CACHE if name in cache_names else SF_SMALL
    sql = sqls[sf][name]
    ours = queryset.QUERIES[name](sf)
    if hasattr(ours, "to_pandas"):
        ours = ours.to_pandas()
    gold = cons[sf].execute(sql).df()
    assert len(ours) == len(gold), f"{name}: rows {len(ours)} != {len(gold)}"
    assert sorted(ours.columns) == sorted(gold.columns), f"{name}: columns differ"
    assert _value_hash(ours) == _value_hash(gold), f"{name}: value mismatch"
