"""End-to-end golden tests: Ray pipeline output ≡ single-process oracle,
plus checkpoint/resume equivalence and parallelism-invariance of results."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_ocr_batch_ndrocr_lite_ray.oracle import GOLDEN_COLUMNS, oracle_extract_parquet


def _canon(table: pa.Table) -> pa.Table:
    cols = [c for c in GOLDEN_COLUMNS if c in table.column_names]
    return (
        table.select(cols)
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        .combine_chunks()
    )


def _assert_tables_equal(ours: pa.Table, golden: pa.Table):
    ours, golden = _canon(ours), _canon(golden)
    assert ours.num_rows == golden.num_rows
    assert ours.column_names == golden.column_names
    for name in ours.column_names:
        a, b = ours[name].to_pylist(), golden[name].to_pylist()
        if a != b:
            for i, (x, y) in enumerate(zip(a, b)):
                assert x == y, f"column {name} row {i}: {x!r} != {y!r}"
    assert ours.equals(golden) or ours.to_pylist() == golden.to_pylist()


class TestGoldenPipeline:
    def test_pipeline_matches_oracle(self, ray_session, tiny_transcripts):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import extract_transcripts

        golden = oracle_extract_parquet(tiny_transcripts)
        ours = extract_transcripts(
            str(tiny_transcripts), concurrency=2, batch_size=32, order=True
        ).to_arrow_refs()
        import ray

        ours = pa.concat_tables([ray.get(r) for r in ours])
        _assert_tables_equal(ours, golden)

    def test_pipeline_matches_oracle_second_seed(self, ray_session, tmp_path):
        """Full-output golden parity on a second corpus seed (VERDICT r3 #6):
        the flagship query is rows-only forever by oracle floor, so this is
        its end-to-end drift net — a different seed and corpus size than both
        the registry corpus (seed 42) and the tiny fixture (seed 7), catching
        kernel drift the per-family oracles can't see composed."""
        import ray

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            extract_transcripts,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import (
            write_transcripts,
        )

        path = tmp_path / "seed1234.parquet"
        write_transcripts(path, n_convs=60, seed=1234)
        golden = oracle_extract_parquet(path)
        refs = extract_transcripts(str(path), order=True).to_arrow_refs()
        ours = pa.concat_tables([ray.get(r) for r in refs])
        _assert_tables_equal(ours, golden)

    def test_all_actions_present(self, tiny_transcripts):
        golden = oracle_extract_parquet(tiny_transcripts)
        actions = set(golden["action"].to_pylist())
        # the fixture mix must exercise every reachable action family
        # (action="error" needs an unknown kind or a non-fallback extractor
        # failure — pinned by unit tests; garbage payloads now FALL BACK)
        assert {"extracted", "empty", "extracted_fallback", "skipped_clean"} <= actions
        kinds = set(golden["content_kind"].to_pylist())
        assert {"plain", "html", "pdfish", "xml", "empty"} <= kinds

    def test_parallelism_invariance(self, ray_session, tiny_transcripts):
        """Result is a function of the input, not of block count — the
        property that makes the N vs 4N cluster runs byte-comparable."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            extract_transcripts,
        )

        lo = extract_transcripts(
            tiny_transcripts, override_num_blocks=2, order=True
        ).to_arrow_refs()
        import ray as _ray
        import pyarrow as _pa

        lo_tbl = _pa.concat_tables(_ray.get(lo))
        hi = extract_transcripts(
            tiny_transcripts, override_num_blocks=16, order=True
        ).to_arrow_refs()
        hi_tbl = _pa.concat_tables(_ray.get(hi))
        assert _canon(lo_tbl).to_pylist() == _canon(hi_tbl).to_pylist()

    def test_batch_size_invariance(self, ray_session, tiny_transcripts):
        """Results must not depend on batching (block boundaries)."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import extract_transcripts

        a = extract_transcripts(str(tiny_transcripts), concurrency=1, batch_size=7).take_all()
        b = extract_transcripts(str(tiny_transcripts), concurrency=2, batch_size=512).take_all()
        key = lambda r: (r["conv_id"], r["turn_idx"])
        a, b = sorted(a, key=key), sorted(b, key=key)
        assert [r["extracted_text"] for r in a] == [r["extracted_text"] for r in b]
        assert [r["spans"] for r in a] == [r["spans"] for r in b]


class TestResume:
    def _write_shards(self, tmp_path, n_shards=4, convs_per_shard=6, seed=11):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts

        paths = []
        for i in range(n_shards):
            p = tmp_path / f"shard-{i:03d}.parquet"
            write_transcripts(p, n_convs=convs_per_shard, seed=seed + i, first_conv=i * convs_per_shard)
            paths.append(str(p))
        return paths

    def test_prep_resumable_kill_equals_direct(self, ray_session, tmp_path):
        """The composed prep flow through the extraction checkpoint —
        killed after 2 fragments and resumed — equals the direct
        (non-checkpointed) composition on the same shards."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.conversations import (
            reassemble_conversations,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            extract_transcripts,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.prep import (
            dedup_stats_split,
            prep_corpus_resumable,
            quality_gate,
        )

        paths = self._write_shards(tmp_path)
        ckpt = tmp_path / "prep_ckpt"

        # phase 1 "killed" after 2 fragments (result reflects partial input)
        partial = prep_corpus_resumable(paths, ckpt, max_partitions=2).to_pandas()
        # resumed: remaining fragments extract, composition sees everything
        resumed = (
            prep_corpus_resumable(paths, ckpt)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert len(resumed) > len(partial)

        ext = extract_transcripts(paths)
        direct = (
            dedup_stats_split(
                reassemble_conversations(
                    ext.map_batches(quality_gate, batch_format="pyarrow")
                )
            )
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert resumed[direct.columns.tolist()].astype(str).equals(direct.astype(str))

    def test_kill_and_resume_equals_uninterrupted(self, ray_session, tmp_path):
        import ray
        from pdf_ocr_batch_ndrocr_lite_ray.state.checkpoint import (
            read_extracted,
            run_resumable_extraction,
        )

        paths = self._write_shards(tmp_path)

        # uninterrupted run
        full_dir = tmp_path / "full"
        report_full = run_resumable_extraction(paths, full_dir, concurrency=2)
        assert report_full["partitions_committed"] == 4

        # killed after 2 partitions, then resumed
        resume_dir = tmp_path / "resumed"
        report_k = run_resumable_extraction(paths, resume_dir, concurrency=2, max_partitions=2)
        assert report_k["partitions_committed"] == 2
        report_r = run_resumable_extraction(paths, resume_dir, concurrency=2)
        assert report_r["partitions_committed"] == 4
        assert report_r["partitions_skipped_resume"] == 2

        full = pa.concat_tables(
            [ray.get(r) for r in read_extracted(full_dir).to_arrow_refs()]
        )
        resumed = pa.concat_tables(
            [ray.get(r) for r in read_extracted(resume_dir).to_arrow_refs()]
        )
        _assert_tables_equal(full, resumed)
        assert report_full["rows"] == report_r["rows"]
        assert report_full["actions"] == report_r["actions"]

        # manifests byte-identical between the two runs, and identical to a
        # local recount of the durable output — the distributed count tasks
        # must be a pure relocation of the driver-side scan
        from pathlib import Path

        from pdf_ocr_batch_ndrocr_lite_ray.state.checkpoint import (
            _count_actions,
            completed_partitions,
        )

        full_m = completed_partitions(full_dir)
        res_m = completed_partitions(resume_dir)
        assert full_m.keys() == res_m.keys()
        for pid in full_m:
            f, r = dict(full_m[pid]), dict(res_m[pid])
            assert f == r  # same inputs → byte-identical manifests
            local = dict(_count_actions(Path(full_dir) / "data" / f"part_id={pid}"))
            assert f["actions"] == local

    def test_rerun_is_noop(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.state.checkpoint import run_resumable_extraction

        paths = self._write_shards(tmp_path, n_shards=2)
        out = tmp_path / "out"
        run_resumable_extraction(paths, out, concurrency=2)
        report = run_resumable_extraction(paths, out, concurrency=2)
        assert report["partitions_skipped_resume"] == 2
        assert report["partitions_committed"] == 2

    def test_resumed_output_matches_oracle(self, ray_session, tmp_path):
        import ray
        from pdf_ocr_batch_ndrocr_lite_ray.state.checkpoint import (
            read_extracted,
            run_resumable_extraction,
        )

        paths = self._write_shards(tmp_path, n_shards=3)
        out = tmp_path / "out"
        run_resumable_extraction(paths, out, concurrency=2, max_partitions=1)
        run_resumable_extraction(paths, out, concurrency=2)

        golden = pa.concat_tables([oracle_extract_parquet(p) for p in paths])
        ours = pa.concat_tables(
            [ray.get(r) for r in read_extracted(out).to_arrow_refs()]
        )
        _assert_tables_equal(ours, golden)


class TestWaveCommit:
    """Per-wave manifest commit: a job that dies mid-run recovers every
    COMPLETED wave instead of nothing (streaming checkpoint granularity)."""

    def _write_shards(self, tmp_path, n_shards=4, convs_per_shard=3, seed=11):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts

        paths = []
        for i in range(n_shards):
            p = tmp_path / f"shard-{i}.parquet"
            write_transcripts(p, n_convs=convs_per_shard, seed=seed + i, first_conv=i * convs_per_shard)
            paths.append(str(p))
        return paths

    def test_crash_mid_run_keeps_completed_waves(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.state.checkpoint import (
            completed_partitions,
            run_resumable_extraction,
        )

        paths = self._write_shards(tmp_path)
        # corrupt the shard that lands in wave 2 (inputs are processed in
        # sorted order; waves of 2 → shard-2 starts wave 2)
        bad = tmp_path / "shard-2.parquet"
        bad.write_bytes(b"not a parquet file")

        out = tmp_path / "out"
        with pytest.raises(Exception):
            run_resumable_extraction(paths, out, concurrency=2, wave_size=2)

        # wave 1 (shards 0+1) committed before the crash
        done = completed_partitions(out)
        assert len(done) == 2
        committed_inputs = sorted(m["input_path"] for m in done.values())
        assert committed_inputs == [str(tmp_path / "shard-0.parquet"),
                                    str(tmp_path / "shard-1.parquet")]

        # repair the shard; the resume skips wave 1 entirely
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts

        write_transcripts(bad, n_convs=3, seed=13, first_conv=6)
        report = run_resumable_extraction(paths, out, concurrency=2, wave_size=2)
        assert report["partitions_skipped_resume"] == 2
        assert report["partitions_committed"] == 4

    def test_wave_size_invariance(self, ray_session, tmp_path):
        import ray
        from pdf_ocr_batch_ndrocr_lite_ray.state.checkpoint import (
            read_extracted,
            run_resumable_extraction,
        )

        paths = self._write_shards(tmp_path, n_shards=3)
        a_dir, b_dir = tmp_path / "a", tmp_path / "b"
        run_resumable_extraction(paths, a_dir, concurrency=2, wave_size=1)
        run_resumable_extraction(paths, b_dir, concurrency=2, wave_size=8)
        a = pa.concat_tables([ray.get(r) for r in read_extracted(a_dir).to_arrow_refs()])
        b = pa.concat_tables([ray.get(r) for r in read_extracted(b_dir).to_arrow_refs()])
        _assert_tables_equal(a, b)


class TestOutputPaths:
    """Destination modes + rename-sequence conflict policy (S6/U4)."""

    def test_modes(self, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.state.output_paths import (
            SUBDIR_NAME,
            resolve_output_dir,
        )

        src = tmp_path / "in" / "frag.parquet"
        src.parent.mkdir()
        src.touch()
        assert resolve_output_dir(src, tmp_path / "in", "same_dir") == src.parent
        assert (
            resolve_output_dir(src, tmp_path / "in", "input_subdir")
            == tmp_path / "in" / SUBDIR_NAME
        )
        assert resolve_output_dir(src, tmp_path / "in", "custom_dir", tmp_path / "x") == tmp_path / "x"
        with pytest.raises(ValueError):
            resolve_output_dir(src, tmp_path / "in", "custom_dir")
        # unknown mode falls back to same_dir (reference default branch)
        assert resolve_output_dir(src, tmp_path / "in", "bogus") == src.parent

    def test_rename_sequence(self, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.state.output_paths import make_output_dir

        base = tmp_path / "out"
        assert make_output_dir(base, "rename") == base  # clear → base itself
        base.mkdir()
        (base / "f").touch()
        assert make_output_dir(base, "rename") == tmp_path / "out_001"
        (tmp_path / "out_001").mkdir()
        (tmp_path / "out_001" / "f").touch()
        assert make_output_dir(base, "rename") == tmp_path / "out_002"
        # empty existing dir is reusable, not a conflict
        (tmp_path / "out_002").mkdir()
        assert make_output_dir(base, "rename") == tmp_path / "out_002"

    def test_rename_exhaustion(self, tmp_path, monkeypatch):
        import pdf_ocr_batch_ndrocr_lite_ray.state.output_paths as op

        base = tmp_path / "out"
        base.mkdir()
        (base / "f").touch()
        monkeypatch.setattr(op, "_RENAME_LIMIT", 3)
        for i in range(1, 4):
            d = tmp_path / f"out_{i:03d}"
            d.mkdir()
            (d / "f").touch()
        with pytest.raises(RuntimeError):
            op.make_output_dir(base, "rename")

    def test_fail_and_overwrite(self, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.state.output_paths import make_output_dir

        base = tmp_path / "out"
        base.mkdir()
        (base / "f").touch()
        with pytest.raises(FileExistsError):
            make_output_dir(base, "fail")
        # overwrite CLEARS the stale contents (ADVICE r2: the clear must live
        # in the library, not the CLI wrapper, so no caller double-counts
        # stale parquet)
        assert make_output_dir(base, "overwrite") == base
        assert not base.exists()
        with pytest.raises(ValueError):
            make_output_dir(base, "bogus")

    def test_file_target(self, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.state.output_paths import make_output_dir

        f = tmp_path / "out"
        f.touch()
        # a plain FILE at the target is a clean policy error, never rmtree'd
        with pytest.raises(FileExistsError, match="not a directory"):
            make_output_dir(f, "overwrite")
        with pytest.raises(FileExistsError, match="not a directory"):
            make_output_dir(f, "fail")
        assert f.exists()
        # rename treats the file as taken and probes onward
        assert make_output_dir(f, "rename") == tmp_path / "out_001"
