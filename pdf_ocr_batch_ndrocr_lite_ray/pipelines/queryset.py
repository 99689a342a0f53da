"""Registry of driver-checkable queries.

Each query is ``name -> callable(sf_dir) -> Dataset | pandas | pyarrow.Table``;
where the semantics are ANSI-SQL-expressible the matching DuckDB oracle SQL is
registered too (same column names — the driver hashes values under sorted
column names). Query modules call ``register`` at import time;
``__ray_entry__`` imports this module and the feature modules.

Transcript-shaped inputs (the engine's primary table) don't exist under
``/root/testdata``, so extraction queries synthesize a deterministic
transcript table per scale factor (cached under /tmp) — same seed, same
table, every run.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Optional

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}
#: zero-arg callables run by ``__ray_entry__.oracle_sql()`` before the SQL is
#: handed to the driver — they materialize any cached tables the static SQL
#: strings reference by path (transcripts, media), so the oracle is runnable
#: even if the matching Ray query never ran.
MATERIALIZERS: list[Callable[[], None]] = []

_CACHE_DIR = Path("/tmp/graft_cache")

# conversations per scale factor for the synthesized transcript table
_SF_CONVS = {"sf0.001": 40, "sf0.01": 160, "sf0.1": 640}
_SYNTH_SEED = 42
# bump when the payload GENERATOR changes (cache files are content-addressed
# by (name, n_convs, seed, version) — a stale cache would silently pin the
# old distribution)
_SYNTH_VERSION = 2


def register(name: str, fn: Callable[[str], Any], sql: Optional[str] = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


def transcripts_path_for_sf(sf_dir: str) -> str:
    """Deterministic transcript cache path (pure path math, no file write).

    Oracle SQL strings embed this path at registration time;
    ``transcripts_for_sf`` materializes the file before any query runs.
    """
    name = Path(sf_dir).name or "sf0.001"
    n_convs = _SF_CONVS.get(name, 40)
    return str(
        _CACHE_DIR
        / f"transcripts-{name}-c{n_convs}-s{_SYNTH_SEED}-v{_SYNTH_VERSION}.parquet"
    )


def transcripts_for_sf(sf_dir: str) -> str:
    """Deterministic transcript parquet for a given testdata scale dir."""
    from ..sources.transcripts import write_transcripts

    name = Path(sf_dir).name or "sf0.001"
    n_convs = _SF_CONVS.get(name, 40)
    path = Path(transcripts_path_for_sf(sf_dir))
    if not path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp.parquet")
        write_transcripts(tmp, n_convs=n_convs, seed=_SYNTH_SEED)
        tmp.replace(path)
    return str(path)


def jsonl_transcripts_path_for_sf(sf_dir: str) -> str:
    """Deterministic NDJSON twin of the transcript cache (pure path math)."""
    name = Path(sf_dir).name or "sf0.001"
    n_convs = _SF_CONVS.get(name, 40)
    return str(
        _CACHE_DIR
        / f"transcripts-{name}-c{n_convs}-s{_SYNTH_SEED}-v{_SYNTH_VERSION}.jsonl"
    )


def jsonl_transcripts_for_sf(sf_dir: str) -> str:
    """Materialize the NDJSON transcript twin for a scale dir (cached)."""
    from ..sources.transcripts import write_transcript_jsonl

    name = Path(sf_dir).name or "sf0.001"
    n_convs = _SF_CONVS.get(name, 40)
    path = Path(jsonl_transcripts_path_for_sf(sf_dir))
    if not path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp.jsonl")
        write_transcript_jsonl(tmp, n_convs=n_convs, seed=_SYNTH_SEED)
        tmp.replace(path)
    return str(path)


def table_path(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def expected_table_path(prefix: str, sf_dir: str, version: int) -> str:
    """Cache path for a materialized golden table (pure path math).

    Content-addressed by (prefix, scale, corpus params, synth version,
    the caller's expected-computation version) — bump the caller's version
    when its golden computation or any kernel it rides changes.
    """
    name = Path(sf_dir).name or "sf0.001"
    n_convs = _SF_CONVS.get(name, 40)
    return str(
        _CACHE_DIR
        / (
            f"{prefix}-{name}-c{n_convs}-s{_SYNTH_SEED}"
            f"-v{_SYNTH_VERSION}.{version}.parquet"
        )
    )


def materialize_expected_table(
    prefix: str, sf_dir: str, version: int, build_table
) -> str:
    """Write ``build_table(sf_dir) -> pyarrow.Table`` to its cache path
    (atomic tmp+rename, skip if present) — the ONE copy of the golden-table
    cache contract shared by every materialized oracle."""
    import pyarrow.parquet as _pq

    path = Path(expected_table_path(prefix, sf_dir, version))
    if path.exists():
        return str(path)
    tbl = build_table(sf_dir)
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.parquet")
    _pq.write_table(tbl, tmp)
    tmp.replace(path)
    return str(path)


# bench-scale transcript tables: sharded (parallel read + per-fragment
# checkpointing) and big enough that per-turn compute dominates actor startup
_BENCH_CONVS = {"sf0.001": 256, "sf0.01": 1024, "sf0.1": 32768}
_BENCH_SHARDS = 64


def bench_transcripts_dir(sf_dir: str) -> str:
    """Deterministic sharded transcript dir for benchmarking a scale factor."""
    from ..sources.transcripts import write_transcript_shards

    name = Path(sf_dir).name or "sf0.1"
    n_convs = _BENCH_CONVS.get(name, 1024)
    d = _CACHE_DIR / (
        f"transcripts-bench-{name}-c{n_convs}-s{_SYNTH_SEED}"
        f"-n{_BENCH_SHARDS}-v{_SYNTH_VERSION}"
    )
    marker = d / "_DONE"
    if not marker.exists():
        write_transcript_shards(d, n_convs=n_convs, seed=_SYNTH_SEED, n_shards=_BENCH_SHARDS)
        marker.write_text("ok")
    return str(d)
