"""Fault and memory robustness: task retries and tiny-block backpressure.

The reference isolates per-item errors but has no retry story (SURVEY.md
§4); Ray supplies task-level retries. These tests pin that the engine's
stages actually survive them: a transform that crashes the first time each
worker process sees it must still yield a complete, correct result, and a
run under a tiny ``target_max_block_size`` must split blocks rather than
die.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pytest


def _flaky_once(marker_dir: str):
    """Batch fn that raises exactly once per worker process, then works."""

    def fn(batch: pa.Table) -> pa.Table:
        marker = os.path.join(marker_dir, f"pid-{os.getpid()}")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("crashed")
            raise RuntimeError("injected transient failure")
        return batch

    return fn


class TestFaultTolerance:
    def test_transient_task_failure_retries_to_completion(self, ray_session, tmp_path):
        import ray
        import ray.data

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import build_extraction
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts

        src = tmp_path / "in.parquet"
        write_transcripts(src, n_convs=8, seed=11)
        marker_dir = tempfile.mkdtemp(dir=str(tmp_path))

        ds = ray.data.read_parquet(str(src))
        # injected flaky stage BEFORE extraction; Ray retries the failed
        # task on the same (now-marked) or another worker
        ds = ds.map_batches(
            _flaky_once(marker_dir),
            batch_format="pyarrow",
            # application exceptions are only retried when opted in;
            # system failures (worker death) retry by default
            max_retries=4,
            retry_exceptions=True,
        )
        ds = build_extraction(ds)
        out = ds.to_pandas()

        import pyarrow.parquet as pq

        expected_rows = pq.read_metadata(str(src)).num_rows
        assert len(out) == expected_rows
        assert set(out.action.unique()) <= {
            "extracted", "extracted_fallback", "skipped_clean", "empty", "error",
        }
        # the failure actually fired at least once
        assert len(os.listdir(marker_dir)) >= 1

    def test_tiny_block_size_still_completes(self, ray_session, tmp_path):
        import ray.data
        from ray.data.context import DataContext

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            extract_transcripts,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts

        src = tmp_path / "in.parquet"
        write_transcripts(src, n_convs=12, seed=13)

        ctx = DataContext.get_current()
        prev = ctx.target_max_block_size
        try:
            ctx.target_max_block_size = 64 * 1024  # 64 KiB: force splitting
            out = extract_transcripts(str(src), order=True).to_pandas()
        finally:
            ctx.target_max_block_size = prev

        import pyarrow.parquet as pq

        assert len(out) == pq.read_metadata(str(src)).num_rows
        # canonical order held through the many tiny blocks
        assert out.groupby("conv_id").turn_idx.apply(
            lambda s: (s.values == sorted(s.values)).all()
        ).all()
