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
#: sf_dir-taking callables run by ``oracle_sql_for`` before the SQL is handed
#: out — they materialize any cached tables the SQL strings reference by path
#: (synthesized transcripts, media, golden expected tables), so the oracle is
#: runnable even if the matching Ray query never ran.
MATERIALIZERS: list[Callable[[str], None]] = []
#: sf_dir→path helpers whose outputs appear inside registered SQL strings.
#: ``oracle_sql_for`` uses them to re-target cache-path oracles at any scale:
#: registered SQL embeds the DRIVER scale's paths (the driver contract is a
#: static dict evaluated at sf0.01), and each helper gives the exact
#: old-path→new-path substitution for another sf_dir.
SF_PATH_HELPERS: list[Callable[[str], str]] = []

#: the scale the external driver evaluates oracle_sql() at
DRIVER_SF_DIR = "/root/testdata/sf0.01"

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


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """Oracle SQL re-targeted at ``sf_dir``, with its cache tables built.

    Registered SQL pins the DRIVER scale's cache paths (the driver contract
    is a static ``dict[str, str]`` evaluated at sf0.01); comparing at any
    other scale swaps each registered path helper's driver-scale output for
    its ``sf_dir`` output — so the repo's own gates (pytest parity loop,
    ``tools/check_driver_contract.py``) stay valid at every scale instead of
    spuriously failing the golden-table oracles away from sf0.01.
    """
    transcripts_for_sf(sf_dir)
    for materialize in MATERIALIZERS:
        materialize(sf_dir)
    if sf_dir == DRIVER_SF_DIR:
        return dict(ORACLE_SQL)
    pairs = [(h(DRIVER_SF_DIR), h(sf_dir)) for h in SF_PATH_HELPERS]
    out: dict[str, str] = {}
    for name, sql in ORACLE_SQL.items():
        for old, new in pairs:
            sql = sql.replace(old, new)
        out[name] = sql
    return out


def cache_sql_names() -> set[str]:
    """Names whose oracle SQL embeds a deterministic cache path (and is
    therefore scale-pinned unless re-targeted via ``oracle_sql_for``)."""
    probes = [h(DRIVER_SF_DIR) for h in SF_PATH_HELPERS]
    return {n for n, sql in ORACLE_SQL.items() if any(p in sql for p in probes)}


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


def csv_transcripts_path_for_sf(sf_dir: str) -> str:
    """Deterministic CSV twin of the transcript cache (pure path math)."""
    name = Path(sf_dir).name or "sf0.001"
    n_convs = _SF_CONVS.get(name, 40)
    return str(
        _CACHE_DIR
        / f"transcripts-{name}-c{n_convs}-s{_SYNTH_SEED}-v{_SYNTH_VERSION}.csv"
    )


def csv_transcripts_for_sf(sf_dir: str) -> str:
    """Materialize the CSV transcript twin for a scale dir (cached)."""
    from ..sources.transcripts import write_transcript_csv

    name = Path(sf_dir).name or "sf0.001"
    n_convs = _SF_CONVS.get(name, 40)
    path = Path(csv_transcripts_path_for_sf(sf_dir))
    if not path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp.csv")
        write_transcript_csv(tmp, n_convs=n_convs, seed=_SYNTH_SEED)
        tmp.replace(path)
    return str(path)


SF_PATH_HELPERS.append(transcripts_path_for_sf)
SF_PATH_HELPERS.append(csv_transcripts_path_for_sf)
SF_PATH_HELPERS.append(jsonl_transcripts_path_for_sf)


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
