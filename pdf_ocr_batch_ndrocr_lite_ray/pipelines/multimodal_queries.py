"""Multimodal pipeline queries: decode + feature-extract over binary columns.

The media table is synthesized deterministically per scale factor (cached
under /tmp) — binary payloads are not SQL-friendly, so these are rows-only
conformance checks; byte-exact behavior is pinned by unit tests instead.
"""

from __future__ import annotations

from pathlib import Path

import ray.data

from ..stages.multimodal import MediaFeatureExtractor
from .queryset import _CACHE_DIR, register

_SF_MEDIA_ROWS = {"sf0.001": 120, "sf0.01": 600, "sf0.1": 3000}
_MEDIA_SEED = 42


def media_table_for_sf(sf_dir: str) -> str:
    from ..sources.media import write_media_table

    name = Path(sf_dir).name or "sf0.001"
    n = _SF_MEDIA_ROWS.get(name, 120)
    path = _CACHE_DIR / f"media-{name}-r{n}-s{_MEDIA_SEED}.parquet"
    if not path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp.parquet")
        write_media_table(tmp, n_rows=n, seed=_MEDIA_SEED)
        tmp.replace(path)
    return str(path)


def media_features(sf_dir: str) -> "ray.data.Dataset":
    """Header parse + byte features via the actor-pool decode stage."""
    ds = ray.data.read_parquet(
        media_table_for_sf(sf_dir), columns=["media_id", "payload"]
    )
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


def media_kind_counts(sf_dir: str) -> "ray.data.Dataset":
    """Rows per decoded kind/action — the decode health report."""
    out = media_features(sf_dir).groupby(["kind", "action"]).count()
    if "count()" in out.schema().names:
        out = out.rename_columns({"count()": "n"})
    return out


def media_resized_features(sf_dir: str) -> "ray.data.Dataset":
    """Resize stage chained into feature extraction: decode health after a
    payload-rewriting actor stage (images resized to 16x16, rest pass)."""
    from ..stages.multimodal import MediaFeatureExtractor, MediaResizer

    ds = ray.data.read_parquet(
        media_table_for_sf(sf_dir), columns=["media_id", "payload"]
    )
    ds = ds.map_batches(
        MediaResizer,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        fn_constructor_kwargs={"target_w": 16, "target_h": 16},
    )
    ds = ds.drop_columns(["action", "error"])
    return ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


register("media_features", media_features)  # rows-only: binary payloads
register("media_resized_features", media_resized_features)  # rows-only
register("media_kind_counts", media_kind_counts)  # rows-only
