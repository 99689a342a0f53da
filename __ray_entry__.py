"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline; ``queries()`` exposes every
implemented operator/pipeline keyed by name; ``oracle_sql()`` gives DuckDB
equivalents where the semantics are SQL-expressible (same column names as the
Ray result). Ray is initialised by the driver before this module is imported —
nothing here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Feature modules self-register into the queryset registry at import time.
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset as _queryset
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import extraction_queries as _eq  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import text_analysis as _ta  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup as _dd  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import similarity as _sim  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import multimodal_queries as _mm  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import analytics as _an  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import windows as _win  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import conversations as _conv  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import sampling as _samp  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import asof as _asof  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import sketches as _sk  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import prep as _prep  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import clusters as _cl  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import quality as _q  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import spans as _sp  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import kmeans as _km  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import semdedup as _sd  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import lm_score as _lm  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import decontam as _dc  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import mixture as _mx  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import chunking as _ch  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import redact as _rd  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import packing as _pk  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import delta as _dl  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import selection as _sel  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import transcript_stats as _ts  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import heavy as _hh  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import index as _idx  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dsir as _dsir  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import bm25 as _bm25  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import novelty as _nov  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import pca as _pca  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import graphrank as _gr  # noqa: F401
from pdf_ocr_batch_ndrocr_lite_ray.pipelines import zorder as _zo  # noqa: F401

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline at the smoke scale; returns the extracted Dataset."""
    from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import extract_transcripts
    from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import transcripts_for_sf

    path = transcripts_for_sf(_SMOKE_SF_DIR)
    return extract_transcripts(path, order=True)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 + extensions)."""
    return dict(_queryset.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query (same column names).

    The extraction oracles read the synthesized transcript table directly
    (``read_parquet('<cache path>')``) — materialize it here so the SQL is
    runnable regardless of whether the matching query ran first.
    """
    _queryset.transcripts_for_sf("/root/testdata/sf0.01")
    for materialize in _queryset.MATERIALIZERS:
        materialize()
    return dict(_queryset.ORACLE_SQL)
