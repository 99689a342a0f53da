"""Tests for the training-data extensions: text stats, dedup family,
similarity search, multimodal plumbing.

SQL-oracled queries are checked value-exact against DuckDB at sf0.001;
approximate operators (MinHash, SimHash, embedding-LSH, IVF) are checked
for planted-duplicate recall against their exact counterparts.
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in (
        "documents",
        "embeddings",
        "events",
        "orders",
        "customer",
        "lineitem",
        "supplier",
        "nation",
        "region",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    if len(df) == 0:  # apply() on an empty frame returns a DataFrame
        return "empty"
    rows = sorted(df.apply(lambda r: "\x1f".join(r.values), axis=1).tolist())
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def _check_against_oracle(name: str, oracle_con) -> pd.DataFrame:
    from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

    ours = queryset.QUERIES[name](SF).to_pandas()
    gold = oracle_con.execute(queryset.ORACLE_SQL[name]).df()
    assert len(ours) == len(gold), f"{name}: rows {len(ours)} != {len(gold)}"
    assert sorted(ours.columns) == sorted(gold.columns)
    assert _value_hash(ours) == _value_hash(gold), f"{name}: value mismatch"
    return ours


class TestIncrementalDedup:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import delta  # noqa: F401

        df = _check_against_oracle("docs_dedup_incremental", oracle_con)
        assert set(df["status"]) <= {"new", "dup_of_existing", "dup_in_batch"}
        # planted exact dups guarantee cross-side collisions at any sf
        assert (df["status"] == "dup_of_existing").any()
        # admitted docs are unique by content
        new = df[df["status"] == "new"]
        assert new["fingerprint"].is_unique
        # nothing admitted twice: a fingerprint with an admitted doc has all
        # its other incoming twins labeled dup_in_batch (or dup_of_existing)
        dup_in_batch = df[df["status"] == "dup_in_batch"]
        assert set(dup_in_batch["fingerprint"]) <= set(df["fingerprint"])


class TestEmptyCorpus:
    """Every selection/dedup/analysis op must return an empty result — not
    raise — on a zero-row documents table (schema intact): the shape of a
    filtered-to-nothing partition in a real run."""

    @pytest.fixture(scope="class")
    def empty_dir(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("empty")
        tbl = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
        pq.write_table(tbl, d / "documents.parquet")
        return str(d)

    @pytest.mark.parametrize(
        "name",
        [
            "dedup_exact",
            "docs_heavy_hitters",
            "docs_inverted_index",
            "docs_importance_weights",
            "docs_temperature_mixture",
            "docs_novelty",
            "docs_zorder_key",
            "docs_importance_resample",
            "docs_top_ngrams",
            "docs_char_entropy",
            "docs_dedup_incremental",
            "docs_version_diff",
            "docs_select_budget",
            "docs_curriculum_order",
            "docs_filter_by_source_quantile",
            "docs_textstats",
            "docs_quality_filter",
            "docs_dedup_segments",
            "docs_weighted_sample",
            "docs_bloom_gate",
            "docs_count_min",
            "docs_pack_efficiency",
            "token_frequency_spectrum",
            "dedup_cluster_sizes",
            "docs_quality_report",
        ],
    )
    def test_empty_input_yields_empty_output(self, ray_session, empty_dir, name):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import (  # noqa: F401
            dedup,
            delta,
            dsir,
            heavy,
            index,
            mixture,
            novelty,
            sampling,
            sketches,
            spans,
            zorder,
            quality,
            selection,
            text_analysis,
            clusters,
            packing,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        res = queryset.QUERIES[name](empty_dir)
        n = res.count() if hasattr(res, "count") else len(res)
        assert n == 0


class TestEmptyEvents:
    """Windowed/ordered ops must come back empty — not raise — on a
    zero-row events table."""

    @pytest.fixture(scope="class")
    def empty_dir(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("empty_events")
        tbl = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "props": pa.array([], type=pa.string()),
            }
        )
        pq.write_table(tbl, d / "events.parquet")
        return str(d)

    @pytest.mark.parametrize(
        "name",
        [
            "events_by_type",
            "events_hourly",
            "events_sliding",
            "user_sessions",
            "user_funnel_counts",
            "events_distinct_users",
            "events_asof_view_click",
            "events_median_value_by_type",
            "events_quantiles_by_type",
            "events_winsorized",
            "events_distinct_users_kmv",
            "events_time_delta",
            "events_robust_scaled",
            "user_event_pivot",
            "events_distinct_users_hll_by_type",
            "user_retention_cohorts",
            "events_percent_rank",
            "events_hourly_dense",
            "events_anomaly_mad",
            "events_value_ntile",
            "events_moving_avg",
            "events_hot_window_join",
            "events_band_pairs",
            "session_window_overlap",
            "events_daily_distinct_exact",
            "user_event_transitions",
            "user_conversion_lag",
            "events_decayed_counts",
            "events_props_stats",
            "user_event_trigrams",
            "events_sliding_distinct_hll",
        ],
    )
    def test_empty_events_yield_empty_output(self, ray_session, empty_dir, name):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import (  # noqa: F401
            analytics,
            asof,
            intervals,
            rollup,
            semistruct,
            sequences,
            sketches,
            windows,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        res = queryset.QUERIES[name](empty_dir)
        n = res.count() if hasattr(res, "count") else len(res)
        assert n == 0


class TestEnumGroupSum:
    def test_folds_across_many_batches_with_refold(self, ray_session):
        import ray

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.exchange import enum_group_sum

        # 300 single-row blocks force >64 partial frames → the in-loop
        # refold path runs; values chosen so every group's total is unique
        rows = [{"k": f"g{i % 7}", "n": i} for i in range(300)]
        ds = ray.data.from_items(rows)
        out = enum_group_sum(ds, ["k"], ["n"]).set_index("k")["n"].to_dict()
        expected: dict = {}
        for r in rows:
            expected[r["k"]] = expected.get(r["k"], 0) + r["n"]
        assert out == expected

    def test_empty_dataset(self, ray_session):
        import ray

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.exchange import enum_group_sum

        ds = ray.data.from_items([{"k": "a", "n": 1}]).filter(lambda r: False)
        out = enum_group_sum(ds, ["k"], ["n"])
        assert list(out.columns) == ["k", "n"] and len(out) == 0


class TestVersionDiff:
    def test_matches_oracle_and_planted_statuses(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import delta  # noqa: F401

        df = _check_against_oracle("docs_version_diff", oracle_con)
        counts = df["status"].value_counts().to_dict()
        # the synthetic version B plants all three statuses
        assert set(counts) == {"added", "removed", "changed"}
        # every removed id is a multiple of 11; every added id carries the
        # version offset; changed ids are multiples of 7 (surviving docs)
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.delta import VERSION_ADD_OFFSET

        assert (df.loc[df["status"] == "removed", "doc_id"] % 11 == 0).all()
        assert (df.loc[df["status"] == "added", "doc_id"] >= VERSION_ADD_OFFSET).all()
        assert (df.loc[df["status"] == "changed", "doc_id"] % 7 == 0).all()


class TestSelection:
    def test_source_quantile_gate_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import selection  # noqa: F401

        df = _check_against_oracle("docs_filter_by_source_quantile", oracle_con)
        assert 0 < len(df) < 500  # a median gate keeps a strict subset
        # strictly-above-median: each kept source's min beats its median
        med = oracle_con.execute(
            "SELECT source, median(n_chars) AS med FROM documents GROUP BY source"
        ).df()
        merged = df.merge(med, on="source")
        assert (merged["n_chars"] > merged["med"]).all()

    def test_curriculum_order_matches_oracle_and_is_total(
        self, ray_session, oracle_con
    ):
        df = _check_against_oracle("docs_curriculum_order", oracle_con)
        # pos is a permutation of 0..N-1 (a genuine global total order)
        assert sorted(df["pos"]) == list(range(len(df)))
        # buckets are non-decreasing along the curriculum
        s = df.sort_values("pos")
        assert (np.diff(s["bucket"].to_numpy()) >= 0).all()
        assert s["bucket"].nunique() > 1  # multiple difficulty phases exist

    def test_budget_selection_matches_oracle_and_is_maximal(
        self, ray_session, oracle_con
    ):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.selection import (
            SELECT_BUDGET_TOKENS,
        )

        df = _check_against_oracle("docs_select_budget", oracle_con)
        assert 0 < len(df) < 500  # the budget boundary actually bites
        assert df["n_tokens_ws"].sum() <= SELECT_BUDGET_TOKENS
        # admitted scores dominate: every admitted score_e6 >= every
        # excluded one except within the boundary tie-group (greedy prefix
        # property; exactness vs the cum<=budget window is the oracle match)
        assert df["score_e6"].min() >= 0


class TestTopNgrams:
    def test_matches_oracle_and_boundary_is_deterministic(
        self, ray_session, oracle_con
    ):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import text_analysis  # noqa: F401

        df = _check_against_oracle("docs_top_ngrams", oracle_con)
        assert len(df) == 20
        # the k-th boundary tie-break (df DESC, ngram ASC) is what makes
        # the top-k SET deterministic: re-sorting reproduces the frame
        s = df.sort_values(["df", "ngram"], ascending=[False, True]).reset_index(
            drop=True
        )
        assert s.equals(df.reset_index(drop=True)) or set(
            map(tuple, s.values)
        ) == set(map(tuple, df.values))


class TestTranscriptStats:
    def _gold(self, sql: str) -> pd.DataFrame:
        return duckdb.connect().execute(sql).df()

    def test_boilerplate_matches_oracle(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import (
            transcripts_for_sf,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats import (
            _boilerplate_sql,
            turns_boilerplate,
        )

        ours = turns_boilerplate(SF).to_pandas()
        gold = self._gold(_boilerplate_sql(transcripts_for_sf(SF)))
        assert len(ours) == len(gold) > 0
        assert _value_hash(ours) == _value_hash(gold)
        assert (ours["n_convs"] >= 3).all()
        assert (ours["n_turns"] >= ours["n_convs"]).all()

    def test_conversation_stats_match_oracle(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import (
            transcripts_for_sf,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats import (
            _conversation_stats_sql,
            conversation_stats,
        )

        ours = conversation_stats(SF).to_pandas()
        gold = self._gold(_conversation_stats_sql(transcripts_for_sf(SF)))
        assert len(ours) == len(gold) > 0
        assert _value_hash(ours) == _value_hash(gold)
        # hot conversations (1 in 25, 50x median turns) surface as skew
        assert ours["n_turns"].max() >= 10 * ours["n_turns"].median()


class TestTextAnalysis:
    def test_textstats_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis  # noqa: F401

        df = _check_against_oracle("docs_textstats", oracle_con)
        assert set(df.lang.unique()) <= {"ja", "en", "other", "unknown"}
        assert ((df.quality_score >= 0) & (df.quality_score <= 1)).all()

    def test_lang_counts_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis  # noqa: F401

        _check_against_oracle("docs_lang_counts", oracle_con)


class TestDedup:
    def test_exact_dedup_matches_oracle_and_finds_planted(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup  # noqa: F401

        df = _check_against_oracle("dedup_exact", oracle_con)
        # every 7th doc has an exact planted copy → groups with n_dups >= 2
        assert (df.n_dups >= 2).any()
        dup_groups = df[df.n_dups >= 2]
        # first-wins: keeper is always the original (small) id
        assert (dup_groups.keep_doc_id < dedup.EXACT_DUP_OFFSET).all()

    def test_ngram_jaccard_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup  # noqa: F401

        df = _check_against_oracle("dedup_ngram_jaccard", oracle_con)
        pairs = set(zip(df.doc_a, df.doc_b))
        # tail-truncated copies are high-jaccard near dups of their source
        planted = [
            (a, b) for (a, b) in pairs if b - a == dedup.NEAR_DUP_OFFSET
        ]
        assert len(planted) > 0

    def test_minhash_recall_vs_exact(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup, queryset

        exact = oracle_con.execute(queryset.ORACLE_SQL["dedup_ngram_jaccard"]).df()
        mh = queryset.QUERIES["dedup_minhash"](SF).to_pandas()
        exact_pairs = set(zip(exact.doc_a, exact.doc_b))
        mh_pairs = set(zip(mh.doc_a, mh.doc_b))
        recall = len(exact_pairs & mh_pairs) / max(len(exact_pairs), 1)
        assert recall >= 0.8, f"minhash recall {recall}"
        assert ((mh.est_jaccard >= 0) & (mh.est_jaccard <= 1)).all()

    def test_minhash_signature_estimates_jaccard(self):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.dedup import (
            _doc_shingles,
            minhash_signature,
        )

        a = _doc_shingles("the quick brown fox jumps over the lazy dog " * 5)
        b = _doc_shingles("the quick brown fox jumps over the lazy cat " * 5)
        true_j = len(a & b) / len(a | b)
        est = float(np.mean(minhash_signature(a) == minhash_signature(b)))
        assert abs(est - true_j) < 0.25
        # identical sets → identical signatures
        assert (minhash_signature(a) == minhash_signature(set(a))).all()

    def test_minhash_matches_oracle(self, ray_session, oracle_con):
        """The FULL MinHash+LSH pipeline is value-exact vs its SQL oracle
        (md5 base hash + literal perm constants + band-tuple equality)."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup  # noqa: F401

        df = _check_against_oracle("dedup_minhash", oracle_con)
        assert ((df.est_jaccard >= 0.5) & (df.est_jaccard <= 1)).all()

    def test_simhash_finds_planted_copies(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup, queryset

        df = _check_against_oracle("dedup_simhash", oracle_con)
        # exact copies share the simhash → hamming 0 pairs at offset 200000
        exact_copy_pairs = df[
            (df.doc_b - df.doc_a == dedup.EXACT_DUP_OFFSET) & (df.hamming == 0)
        ]
        assert len(exact_copy_pairs) > 0
        assert (df.hamming <= dedup.SIMHASH_MAX_HAMMING).all()

    def test_embedding_near_dup_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup  # noqa: F401

        df = _check_against_oracle("dedup_embedding", oracle_con)
        # planted identical embeddings → cosine 1.0 pairs
        assert (df.cosine >= dedup.EMB_TAU).all()
        assert ((df.vec_b - df.vec_a) == dedup.EMB_DUP_OFFSET).any()

    def test_embedding_lsh_recall(self, ray_session):
        """The single-bucket variant's candidates are a subset of the banded
        variant's (all-12-planes agree ⟹ every band agrees), and on the
        planted exact-duplicate corpus both reach the same pairs."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        banded = queryset.QUERIES["dedup_embedding"](SF).to_pandas()
        lsh = queryset.QUERIES["dedup_embedding_lsh"](SF).to_pandas()
        banded_pairs = set(zip(banded.vec_a, banded.vec_b))
        lsh_pairs = set(zip(lsh.vec_a, lsh.vec_b))
        assert lsh_pairs <= banded_pairs  # no false positives (exact check in-bucket)
        recall = len(banded_pairs & lsh_pairs) / max(len(banded_pairs), 1)
        assert recall >= 0.9, f"embedding LSH recall {recall}"
        # planted identical embeddings (every 5th vec) must all be found
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup

        planted = banded[(banded.vec_b - banded.vec_a) == dedup.EMB_DUP_OFFSET]
        assert (planted.cosine == 1.0).all()
        assert len(planted) > 0


class TestClusters:
    """Connected components over dup pairs + canonical-doc selection."""

    def _cc(self, pairs, force_distributed=False):
        import ray

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.clusters import (
            connected_components,
        )

        ds = ray.data.from_items(
            [{"doc_a": a, "doc_b": b, "est_jaccard": 1.0} for a, b in pairs]
        )
        out = connected_components(
            ds, force_distributed=force_distributed
        ).to_pandas()
        return dict(zip(out["node"], out["label"]))

    def test_handbuilt_graphs(self, ray_session):
        # two components + a pair, min-id labels
        assert self._cc([(1, 2), (2, 3), (4, 5)]) == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
        # a 10-node path exercises MULTI-ROUND propagation (diameter 9,
        # label0 gives one hop free -> several real iterations)
        path = [(i, i + 1) for i in range(9)]
        assert self._cc(path) == {i: 0 for i in range(10)}
        # two chains merged through a shared node
        merged = [(10, 11), (11, 12), (20, 21), (21, 12)]
        assert self._cc(merged) == {10: 10, 11: 10, 12: 10, 20: 10, 21: 10}

    def test_distributed_path_matches_union_find(self, ray_session):
        # the hash-min propagation loop (the at-scale path) must agree with
        # the driver union-find fast path on every handbuilt graph
        for pairs in (
            [(1, 2), (2, 3), (4, 5)],
            [(i, i + 1) for i in range(9)],
            [(10, 11), (11, 12), (20, 21), (21, 12)],
        ):
            assert self._cc(pairs, force_distributed=True) == self._cc(pairs)

    def test_clusters_match_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import clusters  # noqa: F401

        df = _check_against_oracle("dedup_minhash_clusters", oracle_con)
        assert (df["cluster_id"] <= df["doc_id"]).all()
        # every cluster representative is a member of its own cluster
        assert set(df["cluster_id"]) <= set(df["doc_id"])

    def test_canonical_docs_match_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import clusters  # noqa: F401

        df = _check_against_oracle("dedup_canonical_docs", oracle_con)
        # exactly one kept doc per cluster, and it is the min member id
        kept = df[df["keep"]]
        assert kept["doc_id"].equals(kept["cluster_id"])
        assert len(kept) == df["cluster_id"].nunique()
        mins = df.groupby("cluster_id")["doc_id"].min()
        assert set(zip(mins.values, mins.index)) == set(
            zip(kept["doc_id"], kept["cluster_id"])
        )
        # planted exact copies (doc_id % 7 == 0 -> +200000) are never kept
        exact_copies = df[df["doc_id"] >= 200_000]
        assert len(exact_copies) > 0 and not exact_copies["keep"].any()


class TestDuplicateSpans:
    def test_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.spans  # noqa: F401

        df = _check_against_oracle("docs_duplicate_spans", oracle_con)
        # exact planted copies (every 7th doc) share their ENTIRE text →
        # both sides carry one full-width span starting at token 0
        assert (df[df.doc_id >= 200_000].span_start == 0).all()
        assert (df.span_end - df.span_start + 1 >= 8).all()
        assert (df.n_grams >= 1).all()

    def test_handbuilt_shared_window(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.spans import (
            docs_duplicate_spans,
        )

        shared = " ".join(f"s{i}" for i in range(10))
        texts = {
            1: " ".join(f"u{i}" for i in range(5))
            + f" {shared} "
            + " ".join(f"v{i}" for i in range(5)),
            2: f"x0 x1 x2 {shared} y0 y1 y2",
            3: "no overlap here at all with anything else whatsoever",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(texts), type=pa.int64()),
                    "text": pa.array(list(texts.values())),
                }
            ),
            tmp_path / "documents.parquet",
        )
        df = (
            docs_duplicate_spans(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # ids 1-3 get no planted copies (not ≡0 mod 5/7) → only the shared
        # 10-token window produces spans: grams at 3 start positions each
        assert df.to_dict("records") == [
            {"doc_id": 1, "span_start": 5, "span_end": 14, "n_grams": 3},
            {"doc_id": 2, "span_start": 3, "span_end": 12, "n_grams": 3},
        ]


class TestPacking:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.packing as packing

        df = _check_against_oracle("docs_pack_greedy", oracle_con)
        assert df["doc_id"].is_unique
        fills = df.groupby("bin_id")["n_tokens"].sum()
        sizes = df.groupby("bin_id")["n_tokens"].count()
        # a bin overflows the budget only when a single oversized doc owns it
        over = fills[fills > packing.PACK_BUDGET]
        assert (sizes[over.index] == 1).all()

    def test_handbuilt_greedy_sequence(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import packing

        # all ids ≡ 0 mod 32 → one partition, doc_id order, known counts
        counts = [100, 100, 100, 100, 300]
        ids = [32 * i for i in range(len(counts))]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(["w " * c for c in counts]),
                }
            ),
            tmp_path / "documents.parquet",
        )
        df = (
            packing.docs_pack_greedy(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # budget 256: [100+100], [100+100], [300 alone in its own bin]
        assert list(df["bin_id"]) == [0, 0, 1, 1, 2]
        assert list(df["n_tokens"]) == counts


class TestKMeans:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import kmeans

        df = _check_against_oracle("emb_kmeans_assign", oracle_con)
        assert df["cluster_id"].between(0, kmeans.K_CLUSTERS - 1).all()
        assert (df["dist2"] >= 0).all()
        # the seed vector of every non-empty cluster stays closest to its
        # own mean more often than not — weak sanity, strong is the oracle
        assert df["cluster_id"].nunique() >= 2

    def test_converges_on_separated_blobs(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.kmeans import (
            kmeans_assignments,
        )

        rng = np.random.default_rng(3)
        dim = 64
        centers = rng.standard_normal((2, dim)) * 50
        # seeds 0..7 alternate blobs so init spans both; the rest cluster
        rows = [centers[i % 2] + rng.standard_normal(dim) for i in range(100)]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(100), type=pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in rows],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0] * 100, type=pa.int32()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )
        df = kmeans_assignments(str(tmp_path)).to_pandas()
        # K=8 seeds split 4-and-4 across the two blobs, so each blob
        # partitions among ITS seeds — the separation invariant is that no
        # cluster ever spans both blobs (parity is constant per cluster)
        per_cluster = df.groupby("cluster_id")[df.columns[0]].count()
        parity_per_cluster = df.groupby("cluster_id").apply(
            lambda g: (g["vec_id"] % 2).nunique(), include_groups=False
        )
        assert (parity_per_cluster == 1).all()
        assert per_cluster.sum() == 100


class TestRedactPii:
    def test_matches_oracle_and_scrubs_planted(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import redact  # noqa: F401

        df = _check_against_oracle("docs_redact_pii", oracle_con)
        planted = df[df.doc_id % 10 == 0]
        assert (planted.n_emails >= 1).all()
        assert (planted.n_phones >= 1).all()
        assert (planted.n_ips >= 1).all()
        # nothing PII-shaped survives in the clean text
        assert not planted.clean_text.str.contains("@example.com").any()
        assert not planted.clean_text.str.contains("555-123-4567").any()
        assert not planted.clean_text.str.contains("10.0.0.1").any()
        assert planted.clean_text.str.contains("<EMAIL>").all()
        assert planted.clean_text.str.contains("<PHONE>").all()
        assert planted.clean_text.str.contains("<IP>").all()
        # unplanted synthetic docs carry no organic PII
        rest = df[df.doc_id % 10 != 0]
        assert (rest[["n_emails", "n_phones", "n_ips"]].to_numpy() == 0).all()


class TestChunking:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import chunking

        df = _check_against_oracle("docs_chunks", oracle_con)
        assert (df.n_tokens <= chunking.CHUNK_TOKENS).all()
        assert (df.n_tokens > 0).all()
        # chunk 0 always exists; consecutive chunk_idx per doc
        for _, g in df.groupby("doc_id"):
            assert sorted(g.chunk_idx) == list(range(len(g)))
        # every non-final chunk is full-width
        last = df.groupby("doc_id")["chunk_idx"].transform("max")
        assert (df.loc[df.chunk_idx < last, "n_tokens"] == chunking.CHUNK_TOKENS).all()

    def test_coverage_and_overlap(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.chunking import docs_chunks

        text = " ".join(f"w{i}" for i in range(70))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array([text, "one two", ""]),
                }
            ),
            tmp_path / "documents.parquet",
        )
        df = docs_chunks(str(tmp_path), max_tokens=32, stride=24).to_pandas()
        d1 = df[df.doc_id == 1].sort_values("chunk_idx")
        # windows: [0,32) [24,56) [48,70) — reconstruction covers every token
        covered = set()
        for _, r in d1.iterrows():
            covered.update(range(r.start_tok, r.start_tok + r.n_tokens))
        assert covered == set(range(70))
        # overlap region repeats verbatim
        assert d1.iloc[0].chunk_text.split()[24:] == d1.iloc[1].chunk_text.split()[:8]
        # 2-token doc → single chunk; empty doc → no chunks
        assert len(df[df.doc_id == 2]) == 1
        assert df[df.doc_id == 2].iloc[0].chunk_text == "one two"
        assert len(df[df.doc_id == 3]) == 0


class TestMixtureCap:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import mixture

        df = _check_against_oracle("docs_mixture_cap", oracle_con)
        per_src = df[df.picked].groupby("source").size()
        assert (per_src <= mixture.MIX_QUOTA).all()
        # ranks are a 1..n permutation within every source
        for _, g in df.groupby("source"):
            assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        # corpus has sources both above and below the quota? at sf0.01
        # every source exceeds it — all groups capped exactly
        assert (per_src == per_src.max()).any()


class TestDecontam:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import decontam  # noqa: F401

        df = _check_against_oracle("docs_decontaminate", oracle_con)
        assert (df.n_hits <= df.n_grams).all()
        assert (df.contaminated == (df.n_hits > 0)).all()
        # eval-bucket docs never appear in the training-side output
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.decontam import BENCH_BUCKET_MIN
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling import _hash_bucket

        import pyarrow as pa

        buckets = _hash_bucket(pa.array(df.doc_id.tolist(), type=pa.int64()))
        assert (buckets < BENCH_BUCKET_MIN).all()

    def test_planted_eval_copy_is_flagged(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.decontam import (
            BENCH_BUCKET_MIN,
            docs_decontaminate,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling import _hash_bucket

        # find one doc_id that hashes into the eval bucket and one that
        # doesn't, give them the same 10-token text, plus a clean doc
        ids = pa.array(range(1000), type=pa.int64())
        buckets = _hash_bucket(ids)
        eval_id = int(np.flatnonzero(buckets >= BENCH_BUCKET_MIN)[0])
        train_id, clean_id = (
            int(i) for i in np.flatnonzero(buckets < BENCH_BUCKET_MIN)[:2]
        )
        leaked = "the quick brown fox jumps over the lazy dog again"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([eval_id, train_id, clean_id], type=pa.int64()),
                    "text": pa.array(
                        [leaked, leaked, "completely different words " * 4]
                    ),
                }
            ),
            tmp_path / "documents.parquet",
        )
        df = (
            docs_decontaminate(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(df.loc[train_id, "contaminated"])
        assert not bool(df.loc[clean_id, "contaminated"])
        assert eval_id not in df.index


class TestLmScore:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import lm_score  # noqa: F401

        df = _check_against_oracle("docs_lm_score", oracle_con)
        # add-one bigram probabilities are < 1 → strictly negative mean
        # log-likelihood wherever the doc has at least one bigram
        scored = df[df.n_bigrams > 0]
        assert (scored.lm_logprob < 0).all()
        assert (df.loc[df.n_bigrams == 0, "lm_logprob"] == 0.0).all()

    def test_in_sample_docs_score_higher(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.lm_score import docs_lm_score
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling import _hash_bucket

        import pyarrow as pa

        df = docs_lm_score(SF).to_pandas()
        buckets = _hash_bucket(pa.array(df.doc_id.tolist(), type=pa.int64()))
        in_sample = df[(buckets < 20) & (df.n_bigrams > 0)]
        out_sample = df[(buckets >= 20) & (df.n_bigrams > 0)]
        # the model saw the in-sample docs — their mean likelihood must beat
        # the held-out mean (weak but direction-pinning sanity check)
        assert in_sample.lm_logprob.mean() > out_sample.lm_logprob.mean()


class TestSemDedup:
    def test_matches_oracle_and_drops_planted(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup, kmeans
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import semdedup  # noqa: F401

        df = _check_against_oracle("semantic_dedup", oracle_con)
        assert df["cluster_id"].between(0, kmeans.K_CLUSTERS - 1).all()
        # every planted exact-copy vector (vec_id >= offset) has an identical
        # earlier-id cluster-mate (cos == 1 >= tau) → dropped, original kept
        planted = df["vec_id"] >= dedup.EMB_DUP_OFFSET
        assert planted.any()
        assert (~df.loc[planted, "kept"]).all()
        assert df.loc[~planted, "kept"].all()
        # planted copy lands in the same cluster as its source
        merged = df[planted].assign(src=lambda d: d.vec_id - dedup.EMB_DUP_OFFSET)
        src_cluster = df.set_index("vec_id")["cluster_id"]
        assert (
            merged["cluster_id"].to_numpy()
            == src_cluster.loc[merged["src"]].to_numpy()
        ).all()


class TestQualityFilter:
    def test_matches_oracle_and_invariants(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import quality

        df = _check_against_oracle("docs_quality_filter", oracle_con)
        # keep <=> no reason; drop <=> first-failing-rule reason
        assert (df.loc[df["keep"], "reason"] == "").all()
        assert (df.loc[~df["keep"], "reason"] != "").all()
        assert set(df["reason"].unique()) <= set(quality.RULE_ORDER) | {""}
        # corpus thresholds chosen so BOTH outcomes occur
        assert df["keep"].any() and (~df["keep"]).any()
        # top_2gram_frac can exceed 1 on pathological repetition (overlapping
        # occurrences each contribute their full char span) — only >= 0 is
        # a true invariant
        assert (df["top_2gram_frac"] >= 0).all()
        assert ((df["dup_line_frac"] >= 0) & (df["dup_line_frac"] < 1)).all()


class TestSimilarity:
    def test_brute_force_topk_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import similarity  # noqa: F401

        df = _check_against_oracle("ann_brute_force_topk", oracle_con)
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.similarity import N_QUERIES, TOPK_K

        counts = df.groupby("query_id").size()
        assert len(counts) == N_QUERIES
        assert (counts == TOPK_K).all()

    def test_ivf_recall_vs_brute_force(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        bf = queryset.QUERIES["ann_brute_force_topk"](SF).to_pandas()
        ivf = queryset.QUERIES["ann_ivf_topk"](SF).to_pandas()
        bf_pairs = set(zip(bf.query_id, bf.vec_id))
        ivf_pairs = set(zip(ivf.query_id, ivf.vec_id))
        recall = len(bf_pairs & ivf_pairs) / max(len(bf_pairs), 1)
        assert recall >= 0.5, f"IVF recall {recall} (nprobe-bounded)"

    def test_ivf_partitioned_rows_identical(self, ray_session, oracle_con):
        """The centroid-partitioned layout changes read I/O, not results:
        rows must be value-identical to the unpartitioned IVF (and its
        shared SQL oracle)."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        part = _check_against_oracle("ann_ivf_topk_partitioned", oracle_con)
        flat = queryset.QUERIES["ann_ivf_topk"](SF).to_pandas()
        assert _value_hash(part) == _value_hash(flat)

    def test_ivf_partitioned_read_prunes_io(self, ray_session):
        """The read touches ONLY probed partition dirs — strictly fewer
        than the total partitions on disk when the probe union is partial
        (1 query × nprobe=4 of 16 centroids)."""
        import os

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.similarity import (
            IVF_NPROBE,
            build_ivf_index,
            ivf_topk_partitioned,
            probed_partition_paths,
        )

        index_dir = build_ivf_index(SF)
        all_parts = [d for d in os.listdir(index_dir) if d.startswith("centroid_id=")]
        df = ivf_topk_partitioned(SF, n_queries=1).to_pandas()
        assert len(df) > 0 and (df.query_id == 0).all()
        # one query probes at most IVF_NPROBE of the partitions
        probed = np.zeros(len(all_parts), dtype=bool)
        # recompute the single-query probe set via the library helper path
        import numpy as _np
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.similarity import _small_matrix

        c_ids, c_mat = _small_matrix(SF, 16)
        q_ids, q_mat = _small_matrix(SF, 1)
        dots = _np.round(q_mat[0] @ c_mat.T, 6)
        order = _np.lexsort((_np.arange(c_mat.shape[0]), -dots))
        mask = _np.zeros(c_mat.shape[0], dtype=bool)
        mask[order[:IVF_NPROBE]] = True
        paths = probed_partition_paths(index_dir, mask)
        read_dirs = {os.path.basename(os.path.dirname(p)) for p in paths}
        assert 0 < len(read_dirs) <= IVF_NPROBE < len(all_parts)
        assert read_dirs < set(all_parts)  # strictly fewer dirs than on disk


class TestAnalytics:
    def test_events_by_type_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics  # noqa: F401

        df = _check_against_oracle("events_by_type", oracle_con)
        assert len(df) > 0

    def test_orders_by_nation_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics  # noqa: F401

        _check_against_oracle("orders_by_nation", oracle_con)

    def test_lineitem_top_parts_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics  # noqa: F401

        df = _check_against_oracle("lineitem_top_parts", oracle_con)
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import TOP_PARTS_K

        assert len(df) == TOP_PARTS_K
        # rank 1 has the max revenue
        assert df.loc[df["rank"].idxmin(), "revenue_cents"] == df.revenue_cents.max()


class TestExtensionSurface:
    def test_extractor_registry_routes_custom_kind(self):
        from pdf_ocr_batch_ndrocr_lite_ray.stages import extract as ex

        def shout(raw: str):
            return raw.upper(), [(0, len(raw), "shout")]

        ex.register_extractor("shout", shout)
        try:
            text, spans, action, error = ex.extract_turn("hello", "shout")
            assert (text, action, error) == ("HELLO", "extracted", "")
            assert spans == [(0, 5, "shout")]
        finally:
            ex.EXTRACTOR_REGISTRY.pop("shout", None)
        # unknown kind stays an isolated error row
        _, _, action, error = ex.extract_turn("hello", "nope")
        assert action == "error" and "nope" in error

    def test_resume_conflict_fail_policy(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts
        from pdf_ocr_batch_ndrocr_lite_ray.state.checkpoint import (
            DATA_SUBDIR,
            part_id_for_path,
            run_resumable_extraction,
        )

        src = tmp_path / "in.parquet"
        write_transcripts(src, n_convs=4, seed=3)
        out = tmp_path / "out"
        # fabricate an uncommitted partition dir (data, no manifest)
        pid = part_id_for_path(str(src))
        stale = out / DATA_SUBDIR / f"part_id={pid}"
        stale.mkdir(parents=True)
        (stale / "junk.parquet").write_bytes(b"not parquet")
        with pytest.raises(FileExistsError):
            run_resumable_extraction([str(src)], out, on_conflict="fail")
        # overwrite policy clears it and commits
        report = run_resumable_extraction([str(src)], out, on_conflict="overwrite")
        assert report["partitions_committed"] == 1


class TestSketches:
    def test_distinct_users_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches  # noqa: F401

        _check_against_oracle("events_distinct_users", oracle_con)

    def test_kmv_estimate_within_bound(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        est = int(
            queryset.QUERIES["docs_distinct_shingles_kmv"](SF).to_pandas().estimate.iloc[0]
        )
        exact = oracle_con.execute(
            r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(text,'\S+') ws FROM documents),
            s AS (SELECT CASE WHEN len(ws)<3 THEN array_to_string(ws,' ')
                  ELSE ws[CAST(i AS INT)]||' '||ws[CAST(i AS INT)+1]||' '||ws[CAST(i AS INT)+2] END sh
                  FROM w, LATERAL UNNEST(generate_series(1, greatest(len(ws)-2,
                       CASE WHEN len(ws)>0 THEN 1 ELSE 0 END))) u(i))
            SELECT count(DISTINCT sh) FROM s
            """
        ).fetchone()[0]
        # KMV with k=1024 → std err ≈ 1/sqrt(k) ≈ 3.1%; allow 4 sigma
        assert abs(est - exact) / exact < 0.125, (est, exact)

    def test_kmv_exact_below_k(self):
        import numpy as np
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import kmv_estimate

        h = np.array([5, 9, 2], dtype=np.uint64)
        assert kmv_estimate(h) == 3.0  # fewer than k distinct → exact

    def test_quantile_sketch_within_bin_width(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches as sk
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        qs = queryset.QUERIES["events_value_quantiles"](SF).to_pandas()
        bin_w = (sk.QUANT_HI - sk.QUANT_LO) / sk.QUANT_BINS
        for _, r in qs.iterrows():
            true = oracle_con.execute(
                f"SELECT quantile_cont(value, {r.q}) FROM events"
            ).fetchone()[0]
            assert abs(r.value_estimate - true) <= bin_w + 1e-9, (r.q, r.value_estimate, true)

    def test_grouped_quantiles_match_oracle_and_bin_bound(self, ray_session, oracle_con):
        """Per-type quantile sketch: value-exact vs the SQL oracle AND within
        one (per-type) bin width of the true per-type quantile."""
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches as sk

        df = _check_against_oracle("events_quantiles_by_type", oracle_con)
        assert set(df.q.unique()) == set(sk.QUANTILES)
        import math

        for _, r in df.iterrows():
            n, lo, hi = oracle_con.execute(
                f"""SELECT count(*), min(value), max(value)
                    FROM events WHERE event_type = '{r.event_type}'"""
            ).fetchone()
            # the sketch reads the bin's UPPER edge for the rank-⌈q·n⌉ order
            # statistic (same float product as the engine) — compare against
            # THAT value, not quantile_cont's interpolation, whose distance
            # to an order stat is unbounded on sparse groups
            k = math.ceil(r.q * n)
            true_k = oracle_con.execute(
                f"""SELECT value FROM events WHERE event_type = '{r.event_type}'
                    ORDER BY value LIMIT 1 OFFSET {k - 1}"""
            ).fetchone()[0]
            bin_w = (hi - lo) / sk.QUANT_BINS
            assert true_k - 1e-6 <= r.value_estimate <= true_k + bin_w + 1e-6, (
                r.event_type, r.q, r.value_estimate, true_k,
            )


class TestAsofJoin:
    def test_asof_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.asof  # noqa: F401

        df = _check_against_oracle("events_asof_view_click", oracle_con)
        assert (df.gap_us >= 0).all()

    def test_asof_partition_semantics(self):
        import pandas as pd
        import numpy as np
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.asof import _asof_partition

        base = np.datetime64("2024-01-01T00:00:00", "us")
        sec = np.timedelta64(1_000_000, "us")
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "user_id": [9, 9, 9, 9, 9],
                "event_type": ["click", "view", "click", "view", "click"],
                "ts": pd.Series([base, base + sec, base + 2 * sec, base + 3 * sec, base + 4 * sec]),
            }
        )
        out = _asof_partition(df).sort_values("event_id").reset_index(drop=True)
        # first click has no prior view → dropped; later clicks take the
        # latest view at or before them
        assert out.event_id.tolist() == [3, 5]
        assert out.prior_view_id.tolist() == [2, 4]
        assert out.gap_us.tolist() == [1_000_000, 1_000_000]


class TestSampling:
    def test_sample_matches_oracle_and_is_stable(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        df = _check_against_oracle("docs_sample", oracle_con)
        # deterministic: identical selection across runs
        df2 = queryset.QUERIES["docs_sample"](SF).to_pandas()
        assert sorted(df.doc_id) == sorted(df2.doc_id)

    def test_split_counts_match_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling  # noqa: F401

        df = _check_against_oracle("docs_split_counts", oracle_con)
        assert set(df.split) <= {"train", "val"}

    def test_length_histogram_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling  # noqa: F401

        df = _check_against_oracle("docs_length_histogram", oracle_con)
        assert (df.bucket_lo % 25 == 0).all()


class TestConversationReassembly:
    def test_salted_equals_unsalted_and_oracle(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.oracle import oracle_extract_parquet
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.conversations import (
            TURN_SEP,
            reassemble_conversations,
            reassemble_unsalted,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            extract_transcripts,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import transcripts_for_sf

        path = transcripts_for_sf(SF)
        salted = (
            reassemble_conversations(extract_transcripts(path), salt_block=16)
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        unsalted = (
            reassemble_unsalted(extract_transcripts(path))
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        assert salted.equals(unsalted)

        # single-process oracle reassembly
        golden = oracle_extract_parquet(path).to_pandas()
        golden = golden.sort_values(["conv_id", "turn_idx"])
        expect = (
            golden.groupby("conv_id")["extracted_text"]
            .apply(lambda s: TURN_SEP.join(t for t in s.tolist() if t))
            .reset_index()
            .rename(columns={"extracted_text": "full_text"})
            .sort_values("conv_id").reset_index(drop=True)
        )
        assert (salted["conv_id"] == expect["conv_id"]).all()
        assert (salted["full_text"] == expect["full_text"]).all()
        # hot conversations (50x median) came through intact
        assert salted.n_turns.max() >= 400


class TestWindows:
    def test_events_hourly_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows  # noqa: F401

        df = _check_against_oracle("events_hourly", oracle_con)
        assert df.n_events.sum() > 0

    def test_user_sessions_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows  # noqa: F401

        df = _check_against_oracle("user_sessions", oracle_con)
        assert (df.longest_session_events <= df.n_events).all()
        assert (df.n_sessions >= 1).all()

    def test_sessionize_gap_rule(self):
        import pandas as pd
        import numpy as np
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            SESSION_GAP_SEC,
            _sessionize_partition,
        )

        base = np.datetime64("2024-01-01T00:00:00", "us")
        gap = np.timedelta64(SESSION_GAP_SEC * 1_000_000 + 1, "us")
        within = np.timedelta64(60 * 1_000_000, "us")
        ts = [base, base + within, base + within + gap, base + within + gap + within]
        df = pd.DataFrame({"user_id": [7] * 4, "ts": pd.Series(ts)})
        out = _sessionize_partition(df)
        assert out.iloc[0].to_dict() == {
            "user_id": 7, "n_sessions": 2, "n_events": 4, "longest_session_events": 2,
        }


class TestWinnowing:
    def test_rolling_hash_matches_direct(self):
        from pdf_ocr_batch_ndrocr_lite_ray.functions.textstats import (
            WINNOW_K,
            _ROLL_BASE,
            _ROLL_MOD,
            rolling_hashes,
        )

        text = "hello winnowing world"
        hs = rolling_hashes(text)
        direct = [
            sum(
                ord(c) * pow(_ROLL_BASE, WINNOW_K - 1 - j, _ROLL_MOD)
                for j, c in enumerate(text[i : i + WINNOW_K])
            )
            % _ROLL_MOD
            for i in range(len(text) - WINNOW_K + 1)
        ]
        assert hs == direct

    def test_shared_substring_shares_fingerprint(self):
        from pdf_ocr_batch_ndrocr_lite_ray.functions.textstats import (
            winnow_fingerprints,
        )

        shared = "a long common passage of text here"
        a = winnow_fingerprints("XX " + shared + " YY")
        b = winnow_fingerprints("completely different prefix " + shared)
        assert a & b  # winnowing guarantee: long shared runs share prints
        assert winnow_fingerprints("") == set()
        assert len(winnow_fingerprints("abcd")) == 0  # shorter than k

    def test_winnow_query_matches_oracle(self, ray_session, oracle_con):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis  # noqa: F401

        df = _check_against_oracle("docs_winnow_fingerprints", oracle_con)
        assert len(df) > 0 and (df.n_fingerprints > 0).all()

    def test_tfidf_top_terms_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import text_analysis as ta

        df = _check_against_oracle("docs_tfidf_top_terms", oracle_con)
        # at most k terms per doc, ranked by score then term
        assert df.groupby("doc_id").size().max() <= ta.TFIDF_TOPK
        assert (df.tf >= 1).all()


class TestGroupedOps:
    def test_events_sliding_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import windows as w

        df = _check_against_oracle("events_sliding", oracle_con)
        # every window start is step-aligned and each event lands in
        # LEN/STEP windows → total count is a LEN/STEP multiple of events
        assert (df.window_start % w.SLIDE_STEP_SEC == 0).all()

    def test_top_customers_per_nation_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import analytics as an

        df = _check_against_oracle("top_customers_per_nation", oracle_con)
        assert df.groupby("c_nationkey").size().max() <= an.TOP_CUST_K
        # ranks are 1..k and descending by total within each nation
        for _, g in df.groupby("c_nationkey"):
            g = g.sort_values("rank")
            assert g["rank"].tolist() == list(range(1, len(g) + 1))
            assert g.total_cents.is_monotonic_decreasing or len(g) == 1


class TestMediaResize:
    def test_resize_fake_image_roundtrip(self):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.media import generate_media_table
        from pdf_ocr_batch_ndrocr_lite_ray.stages.multimodal import (
            parse_header,
            resize_fake_image,
        )

        t = generate_media_table(30, seed=5)
        img = next(
            r for r in t.to_pylist() if r["kind"] == "image" and len(r["payload"]) > 16
        )
        resized = resize_fake_image(img["payload"], 8, 6)
        meta = parse_header(resized)
        assert (meta["width"], meta["height"]) == (8, 6)
        assert len(resized) == 16 + 8 * 6 * meta["channels"]
        # deterministic
        assert resize_fake_image(img["payload"], 8, 6) == resized

    def test_resize_rejects_non_image(self):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.media import pack_header
        from pdf_ocr_batch_ndrocr_lite_ray.stages.multimodal import resize_fake_image

        audio = pack_header("audio", 0, 0, 0, 8000, 0) + b"\x00" * 64
        with pytest.raises(ValueError):
            resize_fake_image(audio, 8, 8)

    def test_resized_features_pipeline(self, ray_session):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.multimodal_queries  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        df = queryset.QUERIES["media_resized_features"](SF).to_pandas()
        decoded_images = df[(df.action == "decoded") & (df.kind == "image")]
        assert len(decoded_images) > 0
        # every decoded image body is now exactly 16x16x3
        assert (decoded_images.body_bytes == 16 * 16 * 3).all()


class TestMultimodal:
    def test_header_roundtrip(self):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.media import pack_header, parse_header

        h = pack_header("video", 16, 12, 3, 0, 7)
        meta = parse_header(h + b"\x00" * 10)
        assert meta == {
            "kind": "video", "width": 16, "height": 12,
            "channels": 3, "sample_rate": 0, "n_frames": 7,
        }

    def test_parse_rejects_garbage(self):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.media import parse_header

        with pytest.raises(ValueError):
            parse_header(b"shrt")
        with pytest.raises(ValueError):
            parse_header(b"NOPE" + b"\x00" * 32)

    def test_decode_stub_is_explicit(self):
        from pdf_ocr_batch_ndrocr_lite_ray.stages.multimodal import decode_image_pixels

        # without Pillow the stub must raise the documented
        # NotImplementedError; with Pillow installed the same call reaches
        # the real decoder, which rejects the garbage bytes instead
        try:
            import PIL  # noqa: F401

            has_pil = True
        except ImportError:
            has_pil = False
        if has_pil:
            with pytest.raises(Exception):
                decode_image_pixels(b"anything")
        else:
            with pytest.raises(NotImplementedError):
                decode_image_pixels(b"anything")

    def test_frame_sampling(self):
        from pdf_ocr_batch_ndrocr_lite_ray.stages.multimodal import sample_frame_offsets

        assert sample_frame_offsets(7, 2) == [0, 2, 4, 6]
        assert sample_frame_offsets(0, 2) == []
        assert sample_frame_offsets(3, 0) == [0, 1, 2]  # stride clamped to 1

    def test_media_features_pipeline(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.multimodal_queries  # noqa: F401

        df = queryset.QUERIES["media_features"](SF).to_pandas()
        assert len(df) > 0
        decoded = df[df.action == "decoded"]
        errors = df[df.action == "error"]
        assert len(decoded) > 0 and len(errors) > 0  # corrupt rows isolated
        assert (decoded.kind.isin(["image", "audio", "video"])).all()
        # histogram sums to body length for decoded rows
        row = decoded.iloc[0]
        assert sum(row.byte_histogram) == row.body_bytes
        # deterministic: same input → same checksums across runs
        df2 = queryset.QUERIES["media_features"](SF).to_pandas()
        assert sorted(df.checksum.dropna()) == sorted(df2.checksum.dropna())


class TestOracleRegistry:
    def test_every_registered_oracle_sql_executes(self, ray_session):
        """Guard: each ORACLE_SQL string must be runnable DuckDB — a broken
        oracle would otherwise surface only in the driver's correctness
        gate. Views are registered at sf0.01 because several oracles embed
        that scale's deterministic cache paths (materialized first)."""
        import duckdb

        import __ray_entry__ as entrymod
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        sqls = entrymod.oracle_sql()  # runs MATERIALIZERS
        con = duckdb.connect()
        sf = "/root/testdata/sf0.01"
        for t in ("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        assert set(sqls) <= set(queryset.QUERIES), "oracle without a query"
        for name, sql in sqls.items():
            try:
                con.execute(f"SELECT * FROM ({sql}) LIMIT 1").fetchall()
            except Exception as exc:
                raise AssertionError(f"oracle SQL for {name!r} failed: {exc}") from exc


class TestPrepCorpus:
    def test_prep_corpus_end_to_end(self, ray_session):
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.prep  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        df = queryset.QUERIES["prep_corpus"](SF).to_pandas()
        assert set(df.columns) == {"conv_id", "n_turns", "n_tokens", "lang", "split"}
        assert len(df) > 0 and df.conv_id.is_unique
        assert set(df.split.unique()) <= {"train", "val"}
        assert (df.n_turns >= 1).all() and (df.n_tokens >= 1).all()
        # deterministic: identical rows on a second run
        df2 = queryset.QUERIES["prep_corpus"](SF).to_pandas()
        a = df.sort_values("conv_id").reset_index(drop=True)
        b = df2.sort_values("conv_id").reset_index(drop=True)
        assert a.equals(b)


class TestExchangeNullKeys:
    def test_string_key_nulls_route_to_one_partition(self, ray_session):
        """The dictionary-encoded string-hash path must keep a key's
        partition independent of which batch it arrives in, with nulls
        pinned to one partition (group-splitting regression guard)."""
        import pyarrow as pa

        import ray.data
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.exchange import hash_partitioned

        t1 = pa.table({"k": ["a", None, "b", "a"], "v": [1, 2, 3, 4]})
        t2 = pa.table({"k": [None, "b", "c"], "v": [5, 6, 7]})
        ds = ray.data.from_arrow([t1, t2])

        def group_sums(df):
            g = df.groupby("k", sort=True, dropna=False)["v"].sum().reset_index()
            g["v"] = g["v"].astype("int64")
            return g

        out = hash_partitioned(ds, "k", group_sums, num_partitions=4).to_pandas()
        # every key (including null) must appear EXACTLY once → groups were
        # partition-complete across batches
        keys = out["k"].tolist()
        assert len(keys) == len(set(map(str, keys)))
        sums = {str(r.k): r.v for r in out.itertuples()}
        assert sums["a"] == 5 and sums["b"] == 9 and sums["c"] == 7
        assert sums.get("None", sums.get("nan")) == 7 or 7 in sums.values()


class TestAdversarialCorpusParity:
    """Oracle parity on a NASTY documents table (unicode whitespace, CJK,
    empties, single words, huge repetition) — the driver's synthetic corpus
    is ASCII-only and would never expose unicode-semantics divergence
    between Python kernels and the RE2-based SQL."""

    TEXTS = [
        "",
        " ",
        "one",
        "two words",
        "exactly three words",
        "a b c d e f g h",
        "tab\tand\nnewline\rsplits",
        "ideographic　space　separated words here",
        "nbsp\xa0joined\xa0tokens stay one word in ascii \\S+",
        "日本語 テキスト の 単語 分割 テスト",
        "mixed 日本語 and english words",
        ("repeat me often " * 50).strip(),
        "punctuation, heavy! text? with; lots: of. marks",
        "🙂 emoji 🚀 tokens 🙂",
        "dup line\ndup line\ndup line\nunique line",
        "a\n\n\na\n\nb",  # duplicate EMPTY lines count too
    ]

    @pytest.fixture(scope="class")
    def nasty_dir(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("nasty")
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(self.TEXTS)), type=pa.int64()),
                "text": pa.array(self.TEXTS),
            }
        )
        pq.write_table(tbl, d / "documents.parquet")
        return str(d)

    @pytest.mark.parametrize(
        "name",
        [
            "dedup_exact",
            "dedup_ngram_jaccard",
            "dedup_ngram_containment",
            "dedup_minhash",
            "dedup_simhash",
            "docs_winnow_fingerprints",
            "docs_tfidf_top_terms",
            "docs_normalize_space",
            "docs_textstats",
            "docs_lang_counts",
            "docs_sample",
            "docs_split_counts",
            "docs_length_histogram",
            "docs_stratified_sample",
            "docs_top_bigrams_pmi",
            "docs_quality_filter",
            "docs_duplicate_spans",
            "docs_pack_greedy",
            "docs_char_entropy",
            "docs_top_ngrams",
            "docs_dedup_incremental",
            "docs_bloom_gate",
            "docs_version_diff",
            "docs_heavy_hitters",
            "docs_inverted_index",
            "docs_bm25_topk",
            "docs_novelty",
            "docs_dedup_segments",
            "docs_count_min",
            "docs_pack_efficiency",
            "token_frequency_spectrum",
        ],
    )
    def test_matches_oracle_on_nasty_corpus(self, ray_session, nasty_dir, name):
        import duckdb

        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.dedup  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.delta  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.bm25  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.heavy  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.index  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.novelty  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction_queries  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.packing  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.quality  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.spans  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{nasty_dir}/documents.parquet')"
        )
        ours = queryset.QUERIES[name](nasty_dir).to_pandas()
        gold = con.execute(queryset.ORACLE_SQL[name]).df()
        assert len(ours) == len(gold), f"{name}: rows {len(ours)} != {len(gold)}"
        assert _value_hash(ours) == _value_hash(gold), f"{name}: value mismatch"


class TestAdversarialEventsParity:
    """Windowed/ordered oracles on a nasty events table: duplicate
    timestamps within a user (total-order tie-break), negative values,
    exact .5 scaled-rounding boundaries, session-gap edges."""

    @pytest.fixture(scope="class")
    def nasty_events_dir(self, tmp_path_factory):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0

        def add(user, sec, etype, value):
            nonlocal eid
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + dt.timedelta(seconds=sec),
                    "user_id": user,
                    "event_type": etype,
                    "value": value,
                    "props": "",
                }
            )
            eid += 1

        # user 1: duplicate timestamps (tie-break must be total)
        for v in (1.0, 2.0, 3.0):
            add(1, 100, "click", v)
        add(1, 100, "purchase", -1.5)
        # user 2: exact .5 boundaries at 1e-4 scale, negatives
        for i, v in enumerate((0.00005, -0.00005, 2.00015, -3.99995)):
            add(2, 200 + i, "view", v)
        # user 3: session-gap edges (exactly the gap, one over, one under)
        add(3, 0, "view", 1.0)
        add(3, 1800, "purchase", 1.0)   # == gap → same session
        add(3, 3601, "view", 1.0)       # > gap from previous → new session
        add(3, 5400, "purchase", 1.0)
        # user 4: single event
        add(4, 50, "purchase", 0.5)
        # user 6: an even-count type whose median is an exact .5e-6
        # boundary (2e-6, 3e-6 → 2.5e-6) — half-even vs half-away rounding
        # diverges here (regression case for the median rounding fix)
        add(6, 400, "signup", 0.000002)
        add(6, 401, "signup", 0.000003)
        # user 5: view/click at the SAME microsecond (as-of tie-break by
        # event_id), plus interleavings around it
        add(5, 10, "view", 1.0)
        add(5, 20, "click", 1.0)     # prior view at t=10
        add(5, 30, "view", 1.0)
        add(5, 30, "click", 1.0)     # same-ts view: prior by event_id order
        add(5, 30, "click", 1.0)     # second click in the same microsecond
        add(5, 40, "click", 1.0)     # prior view at t=30
        d = tmp_path_factory.mktemp("nasty_events")
        pq.write_table(pa.Table.from_pylist(rows), d / "events.parquet")
        return str(d)

    @pytest.mark.parametrize(
        "name",
        [
            "user_running_value",
            "user_sessions",
            "session_purchase_counts",
            "events_median_value_by_type",
            "events_hourly",
            "events_sliding",
            "events_by_type",
            "events_asof_view_click",
            "user_funnel_counts",
            "events_distinct_users",
            "events_quantiles_by_type",
            "events_winsorized",
            "events_distinct_users_kmv",
            "events_time_delta",
            "events_robust_scaled",
            "events_distinct_users_hll",
            "events_distinct_users_hll_by_type",
            "user_event_pivot",
            "user_retention_cohorts",
            "events_percent_rank",
            "events_hourly_dense",
            "events_anomaly_mad",
            "events_value_ntile",
            "events_moving_avg",
            "events_hot_window_join",
            "events_band_pairs",
            "session_window_overlap",
            "events_daily_distinct_exact",
            "user_event_transitions",
            "user_conversion_lag",
            "events_decayed_counts",
            "user_event_trigrams",
        ],
    )
    def test_matches_oracle_on_nasty_events(self, ray_session, nasty_events_dir, name):
        import duckdb

        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.asof  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.intervals  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sequences  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{nasty_events_dir}/events.parquet')"
        )
        ours = queryset.QUERIES[name](nasty_events_dir).to_pandas()
        gold = con.execute(queryset.ORACLE_SQL[name]).df()
        assert len(ours) == len(gold), f"{name}: rows {len(ours)} != {len(gold)}"
        assert _value_hash(ours) == _value_hash(gold), f"{name}: value mismatch"


class TestExchangeGroupCompleteness:
    def test_partition_layout_invariance(self, ray_session):
        """hash_partitioned must deliver every key's rows to exactly one
        partition regardless of how the input is split into batches —
        every per-partition consumer in the engine rides on this."""
        import random

        import pyarrow as pa

        import ray.data
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.exchange import hash_partitioned

        for seed in (1, 7, 42):
            rng = random.Random(seed)
            keys = [rng.choice([-5, -1, 0, 3, 2**40, None]) for _ in range(300)]
            vals = list(range(300))
            expected: dict = {}
            for k, v in zip(keys, vals):
                expected[k] = expected.get(k, 0) + v
            # random batch layout
            cuts = sorted(rng.sample(range(1, 300), 5))
            tables = []
            lo = 0
            for hi in cuts + [300]:
                tables.append(
                    pa.table(
                        {
                            "k": pa.array(keys[lo:hi], type=pa.int64()),
                            "v": pa.array(vals[lo:hi], type=pa.int64()),
                        }
                    )
                )
                lo = hi
            ds = ray.data.from_arrow(tables)

            def sums(df):
                g = df.groupby("k", sort=True, dropna=False)["v"].sum().reset_index()
                g["v"] = g["v"].astype("int64")
                return g

            out = hash_partitioned(ds, "k", sums, num_partitions=7).to_pandas()
            got = {}
            for r in out.itertuples():
                k = None if pd.isna(r.k) else int(r.k)
                assert k not in got, f"key {k} split across partitions (seed {seed})"
                got[k] = int(r.v)
            assert got == expected, f"sums diverge (seed {seed})"


class TestAdversarialEmbeddingsParity:
    """Similarity oracles on a nasty embeddings table: exact duplicates,
    antipodal vectors, tiny magnitudes, near-parallel pairs. Exact-zero
    vectors are excluded by precondition — cosine is undefined there and
    the engines disagree on the convention (Python unit-guard → 0, DuckDB
    list_cosine_similarity → -1)."""

    @pytest.fixture(scope="class")
    def nasty_emb_dir(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(7)
        dim = 64  # the LSH oracle embeds dim-64 hyperplane literals
        base = rng.standard_normal((40, dim)).astype(np.float32)
        base[1] = base[0]                      # exact duplicate
        base[2] = -base[0]                     # antipodal
        base[3] = base[0] * 1e-3               # tiny-magnitude parallel
        base[4] = base[0] + rng.standard_normal(dim).astype(np.float32) * 0.01
        tbl = pa.table(
            {
                "vec_id": pa.array(range(40), type=pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in base],
                                      type=pa.list_(pa.float32())),
                "label": pa.array([0] * 40, type=pa.int32()),
            }
        )
        d = tmp_path_factory.mktemp("nasty_emb")
        pq.write_table(tbl, d / "embeddings.parquet")
        return str(d)

    @pytest.mark.parametrize(
        "name",
        [
            "dedup_embedding",
            "dedup_embedding_lsh",
            "ann_brute_force_topk",
            "ann_ivf_topk",
            "ann_ivf_topk_partitioned",
            "emb_kmeans_assign",
            "emb_knn_graph",
        ],
    )
    def test_matches_oracle_on_nasty_embeddings(self, ray_session, nasty_emb_dir, name):
        import duckdb

        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.dedup  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.kmeans  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.similarity  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{nasty_emb_dir}/embeddings.parquet')"
        )
        ours = queryset.QUERIES[name](nasty_emb_dir).to_pandas()
        gold = con.execute(queryset.ORACLE_SQL[name]).df()
        assert len(ours) == len(gold), f"{name}: rows {len(ours)} != {len(gold)}"
        assert _value_hash(ours) == _value_hash(gold), f"{name}: value mismatch"


class TestAdversarialRelationalParity:
    """Money-rounding and join-edge oracles on a nasty relational corpus:
    exact half-cent totals, a customer with no orders, orders whose
    custkey has no customer row, and a lineitem at an exact .5-cent
    revenue boundary."""

    @pytest.fixture(scope="class")
    def nasty_rel_dir(self, tmp_path_factory):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("nasty_rel")
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "c_nationkey": pa.array([10, 10, 20, 30], type=pa.int32()),
                    "c_mktsegment": pa.array(
                        ["BUILDING", "MACHINERY", "BUILDING", "AUTOMOBILE"]
                    ),
                }
            ),
            d / "customer.parquet",
        )
        # order 103 has NO matching customer; 100.005 is an exact half-cent
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([100, 101, 102, 103, 104], type=pa.int64()),
                    "o_custkey": pa.array([1, 1, 2, 99, 3], type=pa.int64()),
                    "o_totalprice": pa.array(
                        [100.005, 250_000.0, 399_999.995, 50.0, 500_000.0]
                    ),
                    "o_orderpriority": pa.array(
                        ["1-URGENT", "5-LOW", "1-URGENT", "5-LOW", "3-MEDIUM"]
                    ),
                    "o_orderstatus": pa.array(["O", "O", "F", "P", "F"]),
                    # orders 100/102/103 inside the Q5 window; 104 outside
                    "o_orderdate": pa.array(
                        [
                            dt.datetime(1996, 6, 1),
                            dt.datetime(1996, 6, 2),
                            dt.datetime(1996, 6, 3),
                            dt.datetime(1996, 6, 4),
                            dt.datetime(1999, 1, 1),
                        ],
                        type=pa.timestamp("us"),
                    ),
                }
            ),
            d / "orders.parquet",
        )
        # revenue 10.005 * (1 - 0.0) * 100 = 1000.5 → exact .5-cent boundary
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([7, 7, 8, 9, 9], type=pa.int64()),
                    "l_extendedprice": pa.array([10.005, 20.0, 5.125, 5.125, 7.0]),
                    "l_discount": pa.array([0.0, 0.5, 0.0, 0.0, 0.0]),
                    "l_quantity": pa.array([1.005, 2.0, 3.5, 1.0, 1.0]),
                    "l_tax": pa.array([0.05, 0.0, 0.08, 0.0, 0.0]),
                    "l_returnflag": pa.array(["N", "R", "N", "N", "N"]),
                    "l_linestatus": pa.array(["O", "F", "O", "O", "O"]),
                    "l_shipdate": pa.array(
                        [dt.datetime(1997, 1, 1)] * 5, type=pa.timestamp("us")
                    ),
                    # Q5 edges: line 1 matches (cust nation == supp nation,
                    # half-cent revenue 1000.5), line 2 wrong supp nation,
                    # line 4 rides the orphan order 103 (no customer row),
                    # line 5 probes a MISSING supplier key (9)
                    "l_orderkey": pa.array(
                        [100, 100, 102, 103, 100], type=pa.int64()
                    ),
                    "l_suppkey": pa.array([1, 2, 1, 1, 9], type=pa.int64()),
                }
            ),
            d / "lineitem.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                    "s_nationkey": pa.array([10, 20, 30], type=pa.int32()),
                }
            ),
            d / "supplier.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([10, 20, 30], type=pa.int32()),
                    "n_name": pa.array(["JAPAN", "CHINA", "FRANCE"]),
                    "n_regionkey": pa.array([0, 0, 1], type=pa.int32()),
                }
            ),
            d / "nation.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "r_regionkey": pa.array([0, 1], type=pa.int32()),
                    "r_name": pa.array(["ASIA", "EUROPE"]),
                }
            ),
            d / "region.parquet",
        )
        return str(d)

    @pytest.mark.parametrize(
        "name",
        [
            "orders_by_nation",
            "orders_by_nation_shuffle",
            "top_customers_per_nation",
            "customers_without_orders",
            "lineitem_top_parts",
            "orders_rollup",
            "orders_in_segment",
            "customer_order_full_outer",
            "tpch_q1_pricing",
            "tpch_q5_local_volume",
        ],
    )
    def test_matches_oracle_on_nasty_relational(self, ray_session, nasty_rel_dir, name):
        import duckdb

        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics  # noqa: F401
        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{nasty_rel_dir}/{t}.parquet')"
            )
        ours = queryset.QUERIES[name](nasty_rel_dir).to_pandas()
        gold = con.execute(queryset.ORACLE_SQL[name]).df()
        assert len(ours) == len(gold), f"{name}: rows {len(ours)} != {len(gold)}"
        assert _value_hash(ours) == _value_hash(gold), f"{name}: value mismatch"

    def test_anti_join_reroutes_past_broadcast_cap(self, ray_session, nasty_rel_dir, oracle_con):
        """An oversized key set never materializes on the driver: with the
        cap forced to zero the pipeline auto-switches to the shuffle shape
        and still returns the identical anti-join rows."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            customers_without_orders,
        )

        broadcast = customers_without_orders(SF).to_pandas()
        shuffled = customers_without_orders(SF, max_broadcast_keys=0).to_pandas()
        assert _value_hash(broadcast) == _value_hash(shuffled)
        # and on the nasty corpus (dangling keys, boundary prices) too
        b2 = customers_without_orders(nasty_rel_dir).to_pandas()
        s2 = customers_without_orders(nasty_rel_dir, max_broadcast_keys=0).to_pandas()
        assert _value_hash(b2) == _value_hash(s2)


class TestHeavyHitters:
    """Two-pass Misra-Gries heavy hitters: exact output, candidate-superset
    guarantee, selectivity on skewed corpora."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import heavy  # noqa: F401

        df = _check_against_oracle("docs_heavy_hitters", oracle_con)
        # exactness invariant: every reported n clears the strict threshold
        import duckdb

        n_tot = oracle_con.execute(
            "SELECT count(*) FROM (SELECT unnest(regexp_extract_all(text,"
            " '\\S+')) FROM documents)"
        ).fetchone()[0]
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.heavy import HH_K

        assert (df["n"] * HH_K > n_tot).all()

    def test_compress_is_misra_gries(self):
        """Compression subtracts the (m+1)-th largest count: survivors ≤ m,
        undercount per key ≤ that value, and a dominant key always survives."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.heavy import _compress

        counts = pd.Series({f"t{i}": i + 1 for i in range(100)})
        out = _compress(counts, m=10)
        assert len(out) <= 10
        kth = sorted(counts.to_numpy(), reverse=True)[10]
        for tok, c in out.items():
            assert c == counts[tok] - kth


    def test_unicode_whitespace_tokenization_matches_oracle(self, ray_session, tmp_path):
        """Regression: ``str.split()`` splits on NBSP/U+3000 while RE2's
        ASCII \\S+ does not — with the pinned ASCII regex, a corpus whose
        heavy hitter CONTAINS unicode whitespace reports identically to
        the SQL oracle (the old code split it into two different rows)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import heavy
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        texts = ["hot\u00a0pair " * 30] * 5  # literal NBSP inside the hitter + [f"f{i} g{i}" for i in range(40)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            tmp_path / "documents.parquet",
        )
        ours = heavy.docs_heavy_hitters(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["docs_heavy_hitters"]).df()
        assert set(ours["token"]) == set(gold["token"]) == {"hot pair"}
        assert int(ours["n"].iloc[0]) == int(gold["n"].iloc[0]) == 150

    def test_mg_fold_superset_guarantee_on_zipf_stream(self):
        """Folding per-block MG summaries with compression never loses a
        token above the 1/K share threshold (mergeable-summaries property),
        even across adversarial block splits."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.heavy import HH_K, _compress

        rng = np.random.default_rng(7)
        tokens = [f"t{int(z)}" for z in rng.zipf(1.3, size=200_000) if z < 5000]
        merged = pd.Series(dtype="int64")
        for blk in np.array_split(np.array(tokens), 40):
            g = pd.Series(blk).value_counts()
            merged = _compress(merged.add(_compress(g), fill_value=0).astype("int64"))
        true = pd.Series(tokens).value_counts()
        reportable = set(true[true * HH_K > len(tokens)].index)
        assert reportable  # the stream actually has heavy hitters
        assert reportable <= set(merged.index)

    def test_selective_on_skewed_corpus(self, ray_session, tmp_path):
        """A corpus with one dominant token and a long unique tail reports
        exactly the dominant token, with its exact count."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import heavy

        texts = ["hot " * 50] * 20 + [f"cold{i} rare{i} once{i}" for i in range(400)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = heavy.docs_heavy_hitters(str(tmp_path)).to_pandas()
        assert set(out["token"]) == {"hot"}
        assert int(out["n"].iloc[0]) == 1000


class TestHeavyHittersBySource:
    """Per-source heavy hitters: oracle parity plus source isolation —
    a token heavy inside one source but diluted corpus-wide must report
    under exactly that source."""

    def _write(self, tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), type=pa.int64()),
                    "source": pa.array([r[0] for r in rows], type=pa.string()),
                    "text": pa.array([r[1] for r in rows], type=pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )

    def test_source_isolation_matches_oracle(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import heavy
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # "forum" is dominated by one token; "web" has a long unique tail
        # that dilutes it corpus-wide; one NULL-source row is excluded by
        # the enum contract on both sides.
        rows = [("forum", "spam " * 50)] * 5
        rows += [("web", f"w{i} x{i} y{i} z{i}") for i in range(200)]
        rows += [(None, "spam " * 999)]
        self._write(tmp_path, rows)
        ours = (
            heavy.docs_heavy_hitters_by_source(str(tmp_path))
            .to_pandas()
            .sort_values(["source", "token"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = (
            con.execute(ORACLE_SQL["docs_heavy_hitters_by_source"])
            .df()
            .sort_values(["source", "token"])
            .reset_index(drop=True)
        )
        assert _value_hash(ours) == _value_hash(gold)
        assert set(zip(ours["source"], ours["token"])) == {("forum", "spam")}
        assert int(ours["n"].iloc[0]) == 250

    def test_empty_corpus_yields_typed_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import heavy

        self._write(tmp_path, [])
        out = heavy.docs_heavy_hitters_by_source(str(tmp_path)).to_pandas()
        assert len(out) == 0
        assert list(out.columns) == ["source", "token", "n"]


class TestInvertedIndex:
    """Term → (df, capped postings) build: oracle parity plus cap semantics."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import index  # noqa: F401

        df = _check_against_oracle("docs_inverted_index", oracle_con)
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.index import POSTINGS_CAP

        n_posted = df["postings"].str.count(",") + 1
        assert (n_posted == df["df"].clip(upper=POSTINGS_CAP)).all()

    def test_cap_keeps_first_ids_ascending(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.index import docs_inverted_index

        # 10 docs all containing "common"; doc 3 and 7 also "rare"
        texts = ["common word" if i not in (3, 7) else "common rare" for i in range(10)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(10), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_inverted_index(str(tmp_path), cap=4).to_pandas().set_index("term")
        assert out.loc["common", "df"] == 10
        assert out.loc["common", "postings"] == "0,1,2,3"  # first 4 ascending
        assert out.loc["rare", "postings"] == "3,7"


class TestDSIR:
    """Hashed-feature importance weighting: oracle parity, integer-exact
    weights, resample consistency, lang-column adversarial corpus."""

    def test_weights_match_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dsir  # noqa: F401

        df = _check_against_oracle("docs_importance_weights", oracle_con)
        assert df["weight_e9"].dtype == np.int64

    def test_resample_is_top_m_of_weights(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dsir

        _check_against_oracle("docs_importance_resample", oracle_con)
        w = dsir.docs_importance_weights(SF).to_pandas()
        expect = (
            w.sort_values(["weight_e9", "doc_id"], ascending=[False, True])
            .head(dsir.DSIR_TOP_M)
            .reset_index(drop=True)
        )
        got = (
            dsir.docs_importance_resample(SF)
            .to_pandas()
            .sort_values(["weight_e9", "doc_id"], ascending=[False, True])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)

    def test_adversarial_lang_corpus(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dsir
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        texts = [
            "english english shared tokens here",
            "english words appear in target docs",
            "autre langue mots partages shared",
            None,
            "",
            "123 !!! 456 ???",
            "shared shared shared",
        ]
        langs = ["en", "en", "fr", "en", "fr", "de", "zh"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(langs),
                }
            ),
            tmp_path / "documents.parquet",
        )
        ours = (
            dsir.docs_importance_weights(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = (
            con.execute(ORACLE_SQL["docs_importance_weights"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (ours["weight_e9"].to_numpy() == gold["weight_e9"].to_numpy()).all()
        # token-free docs carry exactly weight 0
        assert set(ours.loc[[3, 4, 5], "weight_e9"]) == {0}
        # docs made of target-heavy tokens outweigh the non-target-only doc
        en_heavy = ours.loc[0, "weight_e9"]
        fr_only = ours.loc[2, "weight_e9"]
        assert en_heavy > fr_only


class TestTemperatureMixture:
    """sqrt-temperature per-source sampling: oracle parity + flattening."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import mixture  # noqa: F401

        _check_against_oracle("docs_temperature_mixture", oracle_con)

    def test_flattens_skewed_sources(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.mixture import (
            docs_temperature_mixture,
        )

        sources = ["big"] * 100 + ["small"] * 4 + ["tiny"] * 1
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(sources)), type=pa.int64()),
                    "source": pa.array(sources),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_temperature_mixture(str(tmp_path)).to_pandas()
        got = out["source"].value_counts().to_dict()
        # quotas floor(3·√n): big 30 of 100; small 6 but only 4 exist;
        # tiny 3 but only 1 exists — availability caps the quota
        assert got == {"big": 30, "small": 4, "tiny": 1}
        # 25x source skew became 5x sample skew — the α=0.5 flattening
        run2 = docs_temperature_mixture(str(tmp_path)).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("doc_id").reset_index(drop=True),
            run2.sort_values("doc_id").reset_index(drop=True),
        )


class TestBM25:
    """Okapi BM25 global top-k: oracle parity + hand-checked ranking."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import bm25  # noqa: F401

        df = _check_against_oracle("docs_bm25_topk", oracle_con)
        assert (df["score_e6"] > 0).all()

    def test_ranking_semantics(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.bm25 import docs_bm25_topk

        texts = [
            "data data data data",              # high tf, short doc
            "data filler filler filler filler " * 20,  # tf=20 but long doc
            "nothing relevant here",            # no match -> excluded
            "data",                             # tf=1, shortest
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_bm25_topk(str(tmp_path), query=("data",), k=10).to_pandas()
        # non-matching doc never reported; matches ranked by BM25
        assert set(out["doc_id"]) == {0, 1, 3}
        # doc 0 (saturated tf, short) beats doc 3 (tf=1, shortest)
        ranks = out.sort_values("score_e6", ascending=False)["doc_id"].tolist()
        assert ranks[0] == 0

    def test_empty_and_no_match_corpus(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.bm25 import docs_bm25_topk

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        assert len(docs_bm25_topk(str(tmp_path))) == 0


class TestNovelty:
    """df=1 trigram novelty: oracle parity + planted-unique semantics."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import novelty  # noqa: F401

        df = _check_against_oracle("docs_novelty", oracle_con)
        assert (df["n_novel"] <= df["n_grams"]).all()

    def test_planted_unique_and_shared(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.novelty import docs_novelty

        texts = [
            "alpha beta gamma delta",        # grams: 2, both shared with doc 1
            "alpha beta gamma delta",        # exact twin -> 0 novel
            "unique words only here now",    # 3 grams, all df=1
            "",                              # token-free -> not reported
            "ab",                            # <3 words -> one whole-text shingle
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_novelty(str(tmp_path)).to_pandas().set_index("doc_id")
        assert 3 not in out.index  # token-free excluded
        assert out.loc[0, "n_novel"] == 0 and out.loc[1, "n_novel"] == 0
        assert out.loc[2, "n_grams"] == 3 and out.loc[2, "n_novel"] == 3
        assert out.loc[4, "n_grams"] == 1 and out.loc[4, "n_novel"] == 1


class TestWinsorize:
    """Per-type quantile clipping: oracle parity + hand-checked band."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import windows  # noqa: F401

        df = _check_against_oracle("events_winsorized", oracle_con)
        assert len(df)

    def test_clips_to_known_band(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import events_winsorized

        # 21 values 0..20 → h_lo=(20)(.05)=1.0 → p05=1.0; p95=19.0
        base = dt.datetime(2024, 1, 1)
        rows = [
            {
                "event_id": i,
                "ts": base,
                "user_id": 1,
                "event_type": "t",
                "value": float(i),
                "props": "",
            }
            for i in range(21)
        ]
        pq.write_table(pa.Table.from_pylist(rows), tmp_path / "events.parquet")
        out = events_winsorized(str(tmp_path)).to_pandas().set_index("event_id")
        assert out.loc[0, "value_w"] == 1.0    # clipped up to p05
        assert out.loc[20, "value_w"] == 19.0  # clipped down to p95
        assert out.loc[10, "value_w"] == 10.0  # interior untouched


class TestGroupedKMV:
    """Per-group KMV sketch: oracle parity + accuracy vs exact distinct."""

    def test_matches_oracle_and_tracks_exact(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import sketches  # noqa: F401

        df = _check_against_oracle("events_distinct_users_kmv", oracle_con)
        exact = oracle_con.execute(
            "SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY event_type"
        ).df().set_index("event_type")["n"]
        for r in df.itertuples(index=False):
            true = int(exact[r.event_type])
            if true < 1024:  # below k the sketch IS the exact count
                assert r.estimate == true
            else:  # standard KMV error band (~1/sqrt(k) ≈ 3%; allow 10%)
                assert abs(r.estimate - true) / true < 0.10


class TestContainment:
    """Asymmetric n-gram containment: oracle parity + quote detection."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import dedup  # noqa: F401

        df = _check_against_oracle("dedup_ngram_containment", oracle_con)
        assert (df["containment"] <= 1.0).all()

    def test_detects_quote_that_jaccard_misses(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.dedup import (
            dedup_ngram_containment,
            dedup_ngram_jaccard,
        )

        quote = "the exact quoted passage lives here verbatim"
        # use doc_ids that trigger no planted-dup replication (avoid %5/%7)
        texts = {
            1: quote,
            2: quote + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40)),
            3: "unrelated content entirely different words",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(texts), type=pa.int64()),
                    "text": pa.array(list(texts.values())),
                }
            ),
            tmp_path / "documents.parquet",
        )
        cont = dedup_ngram_containment(str(tmp_path)).to_pandas()
        jac = dedup_ngram_jaccard(str(tmp_path)).to_pandas()
        pair = cont[(cont["doc_a"] == 1) & (cont["doc_b"] == 2)]
        assert len(pair) == 1 and pair["containment"].iloc[0] == 1.0
        # the same quote pair is invisible to jaccard at tau=0.5 (no pair
        # on this corpus clears it at all)
        assert jac.empty


class TestQuantileInterpolationParity:
    """The winsorize quantile must reproduce DuckDB's quantile_cont
    bit-for-bit after 6-decimal rounding. The naive ``a + (b-a)·f``
    interpolation — algebraically equal — flips the 6th decimal on ~0.4%
    of random inputs; DuckDB's ``a·(CRN−RN) + b·(RN−FRN)`` shape is the
    contract. 1,500 random arrays × 3 quantiles, zero divergence."""

    def test_fuzz_against_duckdb(self):
        import duckdb

        def qcont(sorted_vals, q):
            rn = (len(sorted_vals) - 1) * q
            frn, crn = int(np.floor(rn)), int(np.ceil(rn))
            if crn == frn:
                return float(sorted_vals[frn])
            return float(sorted_vals[frn] * (crn - rn) + sorted_vals[crn] * (rn - frn))

        def round6(v):
            return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6)

        con = duckdb.connect()
        rng = np.random.default_rng(0)
        for _ in range(1500):
            n = int(rng.integers(1, 40))
            vals = np.sort(np.round(rng.normal(0, 100, n), int(rng.integers(0, 8))))
            for q in (0.05, 0.5, 0.95):
                mine = round6(qcont(vals, q))
                theirs = con.execute(
                    f"SELECT round(quantile_cont(v, {q}), 6) FROM (SELECT unnest(?::DOUBLE[]) AS v)",
                    [list(map(float, vals))],
                ).fetchone()[0]
                assert mine == theirs, (n, q, mine, theirs)


class TestPCA:
    """Distributed Gram fold + driver eigenprojection."""

    def test_gram_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import pca  # noqa: F401

        df = _check_against_oracle("emb_gram", oracle_con)
        # diagonal entries are sums of squares: non-negative
        diag = df[df["i"] == df["j"]]
        assert (diag["s"] >= 0).all()

    def test_projection_invariants(self, ray_session):
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pca import (
            EMB_E6,
            emb_pca_project,
        )

        out = emb_pca_project(SF).to_pandas().sort_values("vec_id")
        # ground truth: numpy PCA over the same quantized corpus
        emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        x = np.stack(emb["embedding"].to_numpy())
        q = np.floor(x.astype(np.float64) * EMB_E6 + 0.5)
        qc = q - q.mean(axis=0)
        cov = qc.T @ qc / len(q)
        evals = np.linalg.eigvalsh(cov)[::-1]
        # projected variance per component equals the eigenvalue
        v1 = out["pc1"].var(ddof=0) * EMB_E6**2
        v2 = out["pc2"].var(ddof=0) * EMB_E6**2
        assert abs(v1 - evals[0]) / evals[0] < 1e-6
        assert abs(v2 - evals[1]) / evals[1] < 1e-6
        # components are uncorrelated in projection space
        c12 = np.cov(out["pc1"], out["pc2"], ddof=0)[0, 1]
        assert abs(c12) * EMB_E6**2 / evals[0] < 1e-6
        # deterministic across runs (sign convention pins the direction)
        again = emb_pca_project(SF).to_pandas().sort_values("vec_id")
        assert (again["pc1"].to_numpy() == out["pc1"].to_numpy()).all()


class TestPageRank:
    """Fixed-point power iteration over the near-dup graph."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import graphrank  # noqa: F401

        df = _check_against_oracle("docs_pagerank", oracle_con)
        # mass conservation: Σ rank ≈ 1e9 (damping leak is re-injected via
        # the base term; rounding drift stays < 1 unit per node per iter)
        total = df["rank_e9"].sum()
        assert abs(total - 1_000_000_000) < len(df) * 10

    def test_broadcast_cap_autoswitches_to_partitioned(self, ray_session, tmp_path):
        """Past the node cap docs_pagerank no longer raises — it reroutes to
        the partition-aligned join and returns the same rows."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import ray.data

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import graphrank

        hub = "alpha beta gamma delta epsilon zeta eta theta"
        texts = {1: hub, 2: hub + " tail0", 3: hub + " tail1"}
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(texts), type=pa.int64()),
                    "text": pa.array(list(texts.values())),
                }
            ),
            tmp_path / "documents.parquet",
        )
        bc = graphrank.docs_pagerank(str(tmp_path), iters=1).to_pandas()
        pt = graphrank.docs_pagerank(str(tmp_path), iters=1, max_broadcast_nodes=1)
        assert isinstance(pt, ray.data.Dataset)  # the escalation path ran
        pt = pt.to_pandas()
        pd.testing.assert_frame_equal(
            bc.sort_values("doc_id").reset_index(drop=True),
            pt.sort_values("doc_id").reset_index(drop=True).astype({c: bc[c].dtype for c in bc}),
        )

    def test_partitioned_path_equals_broadcast_on_synthetic_graph(self, ray_session):
        """2-iteration parity of the two paths on a ring + hub graph fed
        directly as a symmetric edge Dataset (no jaccard pipeline)."""
        import pyarrow as pa

        import ray.data

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import graphrank as gr

        pairs = [(i, (i + 1) % 8) for i in range(8)] + [(i, 99) for i in range(0, 8, 2)]
        src = [a for a, b in pairs] + [b for a, b in pairs]
        dst = [b for a, b in pairs] + [a for a, b in pairs]
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64()),
                }
            )
        ).materialize()
        bc = gr.pagerank_over_edges(edges, iters=2, max_broadcast_nodes=10**6)
        pt = gr.pagerank_over_edges(edges, iters=2, max_broadcast_nodes=1)
        bc_df = bc.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pt_df = pt.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            bc_df, pt_df.astype({c: bc_df[c].dtype for c in bc_df})
        )
        # the hub gathers contributions from every even ring node → top rank
        assert bc_df.set_index("doc_id")["rank_e9"].idxmax() == 99

    def test_hub_outranks_leaves(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.graphrank import docs_pagerank

        # star of near-identical docs: doc 1 pairs with every leaf (all
        # share the same long text => complete graph actually; instead
        # craft hub-dominant structure: leaves share text ONLY with hub)
        hub = "alpha beta gamma delta epsilon zeta eta theta"
        texts = {1: hub}
        # each leaf: hub text + distinct long tail (jaccard with hub >= .5
        # needs the shared prefix to dominate; tails differ pairwise)
        for i in range(3):
            texts[2 + i] = hub + f" tail{i}"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(texts), type=pa.int64()),
                    "text": pa.array(list(texts.values())),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_pagerank(str(tmp_path)).to_pandas().set_index("doc_id")
        assert 1 in out.index
        leaves = [i for i in out.index if i != 1]
        assert leaves
        # the hub is every leaf's best (often only) neighbor → max rank
        assert out.loc[1, "rank_e9"] == out["rank_e9"].max()

    def test_empty_graph(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.graphrank import docs_pagerank

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "text": pa.array(["solitary document with no twin"]),
                }
            ),
            tmp_path / "documents.parquet",
        )
        assert len(docs_pagerank(str(tmp_path))) == 0


class TestZOrder:
    """Morton layout keys: oracle parity + locality property."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import zorder  # noqa: F401

        _check_against_oracle("docs_zorder_key", oracle_con)

    def test_interleave_roundtrip_and_locality(self):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.zorder import _interleave

        rng = np.random.default_rng(3)
        x = rng.integers(0, 65536, 500).astype(np.int64)
        y = rng.integers(0, 65536, 500).astype(np.int64)
        z = _interleave(x, y)
        # bijective: de-interleave recovers both dimensions
        def extract(z, off):
            out = np.zeros(len(z), dtype=np.int64)
            for b in range(16):
                out |= ((z >> (2 * b + off)) & 1) << b
            return out
        assert (extract(z, 0) == x).all() and (extract(z, 1) == y).all()
        # locality: sorting by zkey clusters BOTH dims — the mean |Δx| and
        # |Δy| between zkey-adjacent rows is far below the random-order mean
        order = np.argsort(z)
        dx = np.abs(np.diff(x[order])).mean()
        dy = np.abs(np.diff(y[order])).mean()
        rand_dx = np.abs(np.diff(x)).mean()
        rand_dy = np.abs(np.diff(y)).mean()
        assert dx < rand_dx / 2 and dy < rand_dy / 2

    def test_layout_write_prunes_row_groups(self, ray_session, tmp_path):
        """The operator's purpose: a 2-D predicate overlaps strictly fewer
        row-group footer stats in the z-ordered layout than in the same data
        written in insertion order — and both layouts return identical rows."""
        import duckdb as _duckdb

        import ray.data

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.zorder import (
            matching_row_groups,
            write_zordered_layout,
        )

        zdir, pdir = str(tmp_path / "zordered"), str(tmp_path / "plain")
        write_zordered_layout(SF, zdir)
        ray.data.read_parquet(SF + "/documents.parquet").write_parquet(
            pdir, min_rows_per_file=256, row_group_size=64
        )
        pred = ((100, 400), "src3")
        mz, tz = matching_row_groups(zdir, *pred)
        mp, tp = matching_row_groups(pdir, *pred)
        # block boundaries may split the writes into ±1 row group; compare
        # the matched FRACTION, which is what pruning actually buys
        assert mz / tz < mp / tp  # the z-order layout prunes
        assert mz < tz  # and not vacuously (some groups are skipped)
        rows = lambda d: _duckdb.sql(  # noqa: E731
            f"SELECT doc_id FROM read_parquet('{d}/*.parquet') "
            "WHERE n_chars BETWEEN 100 AND 400 AND source = 'src3' ORDER BY doc_id"
        ).df()
        assert rows(zdir).equals(rows(pdir))

    def test_matching_row_groups_survives_all_null_stats(self, tmp_path):
        """An all-null source row group has a stats object WITHOUT min/max;
        the pruning counter must treat it as unprunable, not crash."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.zorder import matching_row_groups

        pq.write_table(
            pa.table(
                {
                    "n_chars": pa.array([None, None, None], type=pa.int64()),
                    "source": pa.array([None, None, None], type=pa.string()),
                }
            ),
            tmp_path / "layout.parquet",
        )
        m, t = matching_row_groups(str(tmp_path), (0, 100), "src1")
        assert (m, t) == (1, 1)  # unprunable → counted as matching

    def test_null_source_matches_oracle(self, ray_session, tmp_path):
        """NULL sources bucket identically in both engines (ADVICE r3): the
        SQL coalesces to 'None' to mirror Python's str(None)."""
        import duckdb as _duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.zorder import (
            _zorder_sql,
            docs_zorder_key,
        )

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array(["a", "b", "c"]),
                    "lang": pa.array(["en", "en", "en"]),
                    "source": pa.array(["src1", None, "src2"]),
                    "n_chars": pa.array([10, 20, 30], type=pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = docs_zorder_key(str(tmp_path)).to_pandas().sort_values("doc_id")
        con = _duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
        )
        want = con.execute(_zorder_sql() + " ORDER BY doc_id").df()
        assert (got["zkey"].to_numpy() == want["zkey"].to_numpy()).all()


class TestProfile:
    """One-pass table profiler: oracle parity lives in the blanket loop;
    here the edges — empty table, null-heavy columns, lexicographic-vs-
    numeric min/max — get pinned directly."""

    def test_empty_table_yields_zeroed_rows(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            PROFILE_COLUMNS,
            docs_profile,
        )

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                    "lang": pa.array([], type=pa.string()),
                    "source": pa.array([], type=pa.string()),
                    "n_chars": pa.array([], type=pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        df = docs_profile(str(tmp_path))
        assert list(df["col"]) == list(PROFILE_COLUMNS)
        assert (df["n_rows"] == 0).all() and (df["n_distinct_kmv"] == 0).all()
        assert df["min_val"].isna().all() and df["max_val"].isna().all()

    def test_float_e6_quantization_parity_fuzz(self):
        """The engine's sign*floor(abs*1e6+0.5) chain == DuckDB's
        round(CAST(v AS DOUBLE) * 1000000) on random doubles, exact halves,
        negatives, and subnormal-ish magnitudes."""
        import duckdb as _duckdb

        rng = np.random.default_rng(11)
        vals = np.concatenate(
            [
                rng.normal(0, 100, 500),
                rng.uniform(-1e-5, 1e-5, 200),
                np.arange(-50, 50) / 2 * 1e-6,  # exact .5 ties at e6 scale
            ]
        )
        a = vals * 1e6
        engine = (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)
        con = _duckdb.connect()
        con.register("v", pd.DataFrame({"x": vals}))
        duck = con.execute(
            "SELECT CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FROM v"
        ).df().iloc[:, 0].to_numpy(np.int64)
        assert (engine == duck).all()

    def test_float_e6_rejects_nonfinite(self, ray_session, tmp_path):
        """NaN/inf must fail loud (the SQL oracle errors there too) — a
        validator that coerces anomalies to INT64_MIN lies about the data."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import profile_table

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2], type=pa.int64()),
                    "value": pa.array([1.5, float("nan")], type=pa.float64()),
                }
            ),
            tmp_path / "events.parquet",
        )
        with pytest.raises(Exception, match="float_e6|NaN|RayTaskError") as exc:
            profile_table(str(tmp_path), "events", {"value": "float_e6"})
        assert "float_e6" in str(exc.value)

    def test_nulls_and_typed_minmax_match_duckdb(self, ray_session, tmp_path):
        import duckdb as _duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            _profile_sql,
            docs_profile,
        )

        # doc_id values chosen so numeric min/max differs from the
        # lexicographic order of their strings ('100' < '9'); nulls in
        # every column type
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([9, 100, None, 3], type=pa.int64()),
                    "text": pa.array(["b", None, "a", "a"]),
                    "lang": pa.array(["en", "ja", None, "en"]),
                    "source": pa.array([None, None, "s1", "s0"]),
                    "n_chars": pa.array([5, None, 1, 400], type=pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = docs_profile(str(tmp_path)).sort_values("col").reset_index(drop=True)
        con = _duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import PROFILE_COLUMNS

        want = (
            con.execute(_profile_sql("documents", PROFILE_COLUMNS))
            .df()
            .sort_values("col")
            .reset_index(drop=True)
        )
        assert got.astype(str).values.tolist() == want.astype(str).values.tolist()
        row = got.set_index("col")
        assert row.loc["doc_id", "min_val"] == "3"  # numeric, not lexicographic
        assert row.loc["doc_id", "max_val"] == "100"
        assert row.loc["source", "n_nulls"] == 2


class TestDriverTopkFold:
    """driver_topk_fold == global sort + head, on any block layout."""

    def test_equals_global_sort(self, ray_session):
        import ray as _ray
        import ray.data as rd

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.exchange import driver_topk_fold

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(1000, dtype=np.int64),
                "w": rng.integers(-50, 50, 1000),  # heavy ties
            }
        )
        ds = rd.from_pandas([df.iloc[i : i + 37] for i in range(0, 1000, 37)])
        got = driver_topk_fold(ds, ["w", "doc_id"], [False, True], 25)
        want = df.sort_values(["w", "doc_id"], ascending=[False, True]).head(25)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_empty_dataset_returns_none(self, ray_session):
        import ray.data as rd

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.exchange import driver_topk_fold

        ds = rd.from_pandas(pd.DataFrame({"w": pd.Series(dtype="int64")}))
        out = driver_topk_fold(ds, ["w"], [False], 5)
        assert out is None or len(out) == 0


class TestLeftJoinCounts:
    """Union + co-partition left join: zero-extension semantics."""

    def test_matches_oracle_and_zero_extends(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import analytics  # noqa: F401

        df = _check_against_oracle("customer_order_counts", oracle_con)
        n_cust = oracle_con.execute("SELECT count(*) FROM customer").fetchone()[0]
        assert len(df) == n_cust  # every customer present

    def test_zero_extension(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            customer_order_counts,
        )

        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2, 3], type=pa.int64())}),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11, 12], type=pa.int64()),
                    "o_custkey": pa.array([1, 1, 3], type=pa.int64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        out = (
            customer_order_counts(str(tmp_path)).to_pandas().set_index("c_custkey")
        )
        assert out["n_orders"].to_dict() == {1: 2, 2: 0, 3: 1}

    def test_orphan_orders_dropped_like_left_join(self, ray_session, tmp_path):
        """An o_custkey absent from customer never emits a row — exactly the
        SQL LEFT JOIN's behavior (no FK-integrity assumption, ADVICE r3)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            customer_order_counts,
        )

        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2], type=pa.int64())}),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11, 12], type=pa.int64()),
                    "o_custkey": pa.array([1, 999, 999], type=pa.int64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        out = (
            customer_order_counts(str(tmp_path)).to_pandas().set_index("c_custkey")
        )
        assert out["n_orders"].to_dict() == {1: 1, 2: 0}


class TestEmptyEmbeddings:
    """Embedding-family ops must return empty — not raise — on a zero-row
    embeddings table."""

    def test_pca_and_gram_on_empty(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pca import emb_gram, emb_pca_project

        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32())),
                    "label": pa.array([], type=pa.int32()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )
        assert len(emb_gram(str(tmp_path))) == 0
        res = emb_pca_project(str(tmp_path))
        assert (res.count() if hasattr(res, "count") else len(res)) == 0


class TestRound4SessionOps:
    """Invariant pins for the lag / robust-scale / rollup / pivot / HLL /
    segment-dedup / priority-sample / semi-join family (value parity runs
    in the blanket oracle loop; these pin semantics the hash can't see)."""

    def test_time_delta_per_user_invariants(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import events_time_delta

        df = events_time_delta(SF).to_pandas()
        # exactly one sentinel (-1) per user: the first event of the frame
        firsts = df[df["delta_us"] == -1].groupby("user_id").size()
        assert (firsts == 1).all()
        assert set(firsts.index) == set(df["user_id"].unique())
        # all real deltas are non-negative (frame order is a total order)
        assert (df.loc[df["delta_us"] != -1, "delta_us"] >= 0).all()

    def test_robust_scaled_centers_each_group(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            events_robust_scaled,
        )

        df = events_robust_scaled(SF).to_pandas()
        # median of the scaled values is ~0 and the IQR is ~1 per group
        for _, g in df.groupby("event_type"):
            med = g["value_r"].median()
            iqr = g["value_r"].quantile(0.75) - g["value_r"].quantile(0.25)
            assert abs(med) < 1e-4
            assert abs(iqr - 1.0) < 1e-4

    def test_rollup_levels_are_consistent(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            ROLLUP_ALL,
            orders_rollup,
        )

        df = orders_rollup(SF).to_pandas()
        finest = df[
            (df["o_orderpriority"] != ROLLUP_ALL) & (df["o_orderstatus"] != ROLLUP_ALL)
        ]
        mid = df[
            (df["o_orderpriority"] != ROLLUP_ALL) & (df["o_orderstatus"] == ROLLUP_ALL)
        ]
        grand = df[df["o_orderpriority"] == ROLLUP_ALL]
        assert len(grand) == 1
        for col in ("n_orders", "revenue_e2"):
            assert finest[col].sum() == grand[col].iloc[0]
            assert mid[col].sum() == grand[col].iloc[0]
            per_pri = finest.groupby("o_orderpriority")[col].sum()
            assert per_pri.equals(
                mid.set_index("o_orderpriority")[col].reindex(per_pri.index)
            )

    def test_pivot_counts_total_matches_event_count(self, ray_session):
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import user_event_pivot

        df = user_event_pivot(SF).to_pandas()
        n_events = pq.read_metadata(f"{SF}/events.parquet").num_rows
        count_cols = [c for c in df.columns if c.startswith("n_")]
        assert int(df[count_cols].to_numpy().sum()) == n_events
        assert df["user_id"].is_unique

    def test_pivot_rejects_unknown_event_type(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import user_event_pivot

        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([1], type=pa.int64()),
                    "event_type": pa.array(["mystery"]),
                }
            ),
            tmp_path / "events.parquet",
        )
        with pytest.raises(Exception, match="unknown event_type"):
            user_event_pivot(str(tmp_path)).to_pandas()

    def test_hll_estimate_within_bound_of_truth(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            events_distinct_users_hll,
        )

        est = events_distinct_users_hll(SF)["n_users_hll"][0].as_py()
        true = oracle_con.execute(
            "SELECT count(DISTINCT user_id) FROM events"
        ).fetchone()[0]
        # n << m here → linear-counting regime, much tighter than the
        # 1.04/sqrt(256) asymptotic bound
        assert abs(est - true) <= max(3, 0.1 * true)

    def test_hll_rho_edges(self):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            HLL_RHO_BITS,
            hll_rho,
        )

        assert hll_rho(0) == HLL_RHO_BITS + 1
        assert hll_rho(1) == HLL_RHO_BITS
        assert hll_rho(2**HLL_RHO_BITS - 1) == 1

    def test_segment_dedup_on_handmade_corpus(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.spans import (
            SEG_TOKENS,
            docs_dedup_segments,
        )

        a = " ".join(f"w{i}" for i in range(SEG_TOKENS * 2))  # 2 full segments
        first_seg = " ".join(f"w{i}" for i in range(SEG_TOKENS))
        texts = [a, a, first_seg, "totally unique words here"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([10, 20, 30, 40], type=pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * 4),
                    "source": pa.array(["s"] * 4),
                    "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        df = (
            docs_dedup_segments(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # the planted-duplicate corpus() wrapper adds copies of these docs,
        # but the ORIGINAL ids keep/lose deterministically:
        assert df.loc[10, "n_kept"] == 2          # first occurrence keeps all
        assert df.loc[20, "n_kept"] == 0          # exact copy keeps nothing
        assert df.loc[30, "n_kept"] == 0          # segment already seen in doc 10
        assert df.loc[40, "n_kept"] == 1
        assert (df["n_kept"] <= df["n_segs"]).all()

    def test_weighted_sample_is_exact_topk_of_priorities(self, ray_session):
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling import (
            WEIGHTED_K,
            docs_weighted_sample,
        )

        got = docs_weighted_sample(SF).to_pandas()
        # local single-process recomputation of the identical float chain
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
        rows = []
        for doc_id, w in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
            h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
            rows.append((doc_id, w, float(w) * float(1 << 48) / float(h + 1)))
        rows.sort(key=lambda r: (-r[2], r[0]))
        want_ids = [r[0] for r in rows[:WEIGHTED_K]]
        assert got["doc_id"].tolist() == want_ids
        # priorities are emitted in rank order and weights ride unmodified
        assert (got["priority"].to_numpy()[:-1] >= got["priority"].to_numpy()[1:]).all()

    def test_semi_join_reroutes_past_broadcast_cap(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import orders_in_segment

        broadcast = orders_in_segment(SF).to_pandas()
        shuffled = orders_in_segment(SF, max_broadcast_keys=0).to_pandas()
        assert _value_hash(broadcast) == _value_hash(shuffled)
        assert len(broadcast) > 0


class TestTpchQ3:
    def test_matches_oracle_and_join_semantics(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import analytics  # noqa: F401

        df = _check_against_oracle("tpch_q3_topk", oracle_con)
        # inner-join semantics: every surviving order belongs to a segment
        # customer, predates the cutoff, and has post-cutoff lineitems
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            Q3_CUTOFF,
            SEMI_SEGMENT,
        )

        ok = oracle_con.execute(
            f"""
            SELECT count(*) FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE o.o_orderkey IN ({",".join(map(str, df["o_orderkey"]))})
              AND c.c_mktsegment = '{SEMI_SEGMENT}'
              AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
            """
        ).fetchone()[0]
        assert ok == len(df)
        assert (df["revenue_e2"] > 0).all()
        # emitted in rank order
        r = df["revenue_e2"].to_numpy()
        assert (r[:-1] >= r[1:]).all()

    def test_reroutes_past_broadcast_cap(self, ray_session):
        """Past the key ceiling the customer filter becomes a custkey
        co-partition exchange — identical rows, zero driver key state."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import tpch_q3_topk

        broadcast = tpch_q3_topk(SF).to_pandas()
        rerouted = tpch_q3_topk(SF, max_broadcast_keys=0).to_pandas()
        assert _value_hash(broadcast) == _value_hash(rerouted)
        assert len(broadcast) > 0


class TestJoinAndCohortFamily:
    def test_full_outer_surfaces_orphans_with_sentinel(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            customer_order_full_outer,
        )

        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2], type=pa.int64()),
                    "c_nationkey": pa.array([10, 20], type=pa.int32()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table({"o_custkey": pa.array([1, 1, 99], type=pa.int64())}),
            tmp_path / "orders.parquet",
        )
        df = (
            customer_order_full_outer(str(tmp_path))
            .to_pandas()
            .set_index("custkey")
            .sort_index()
        )
        assert df.loc[1, "n_orders"] == 2 and df.loc[1, "c_nationkey"] == 10
        assert df.loc[2, "n_orders"] == 0 and df.loc[2, "c_nationkey"] == 20
        assert df.loc[99, "n_orders"] == 1 and df.loc[99, "c_nationkey"] == -1

    def test_retention_offset_zero_covers_every_user(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            user_retention_cohorts,
        )

        df = user_retention_cohorts(SF).to_pandas()
        n_users = oracle_con.execute(
            "SELECT count(DISTINCT user_id) FROM events"
        ).fetchone()[0]
        # every user appears in their own cohort's week 0
        assert int(df.loc[df["week_offset"] == 0, "n_users"].sum()) == n_users
        assert (df["week_offset"] >= 0).all()
        # retention never exceeds the cohort's week-0 size
        w0 = df[df["week_offset"] == 0].set_index("cohort_week")["n_users"]
        for _, r in df.iterrows():
            assert r["n_users"] <= w0[r["cohort_week"]]

    def test_grouped_hll_within_bound_of_truth(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            events_distinct_users_hll_by_type,
        )

        got = events_distinct_users_hll_by_type(SF).to_pandas().set_index("event_type")
        true = dict(
            oracle_con.execute(
                "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
            ).fetchall()
        )
        assert set(got.index) == set(true)
        for et, t in true.items():
            assert abs(int(got.loc[et, "n_users_hll"]) - t) <= max(3, 0.12 * t)


class TestBloomGate:
    def test_sound_against_exact_incremental_dedup(self, ray_session, oracle_con):
        """The Bloom guarantee: no false negatives — every incoming doc the
        exact check labels dup_of_existing must be flagged maybe_dup."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.delta import (
            docs_bloom_gate,
            docs_dedup_incremental,
        )

        gate = docs_bloom_gate(SF).to_pandas().set_index("doc_id")["status"]
        exact = docs_dedup_incremental(SF).to_pandas()
        dups = exact.loc[exact["status"] == "dup_of_existing", "doc_id"]
        assert len(dups) > 0
        assert (gate.loc[dups] == "maybe_dup").all()
        # and the gate never drops an incoming row
        assert len(gate) == len(exact)

    @pytest.mark.parametrize("pos_hex", [5, 6])
    def test_bit_exact_oracle_at_two_sizes(self, ray_session, oracle_con, pos_hex):
        """Parameterized filter width (VERDICT r4 #7): the SQL twin
        reproduces the gate bit for bit — false positives included — at
        both 2^20 and 2^24 bits, and the wider filter only ever CLEARS
        maybe_dup flags (fewer collisions), never sets new ones."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.delta import (
            bloom_gate_sql,
            docs_bloom_gate,
        )

        ours = (
            docs_bloom_gate(SF, pos_hex=pos_hex)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        gold = (
            oracle_con.execute(bloom_gate_sql(pos_hex))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert ours.equals(gold[ours.columns])

    def test_expected_n_sizing_and_monotone_fp(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.delta import (
            bloom_pos_hex_for,
            docs_bloom_gate,
        )

        assert bloom_pos_hex_for(10_000) == 5
        assert bloom_pos_hex_for(1_000_000) == 6
        assert bloom_pos_hex_for(10_000_000) == 7
        assert bloom_pos_hex_for(10**9) == 7  # capped, never past broadcast-practical
        narrow = docs_bloom_gate(SF, pos_hex=5).to_pandas().set_index("doc_id")["status"]
        wide = docs_bloom_gate(SF, expected_n=1_000_000).to_pandas().set_index("doc_id")["status"]
        # widening can only clear false positives: wide maybe_dup ⊆ narrow maybe_dup
        assert set(wide[wide == "maybe_dup"].index) <= set(
            narrow[narrow == "maybe_dup"].index
        )


class TestRound5Reports:
    """Invariant pins for the round-5 audit/report operators (value hashes
    are covered by the blanket oracle-parity loop)."""

    def test_quality_report_partitions_the_corpus(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import quality

        df = _check_against_oracle("docs_quality_report", oracle_con)
        n_docs = oracle_con.execute("SELECT count(*) FROM documents").fetchone()[0]
        assert df["n"].sum() == n_docs  # every doc lands in exactly one bucket
        assert set(df["action"]) <= {"keep", *quality.RULE_ORDER}

    def test_cluster_sizes_partition_the_corpus(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import clusters  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        df = queryset.QUERIES["dedup_cluster_sizes"](SF).to_pandas()
        total = (df["cluster_size"] * df["n_clusters"]).sum()
        corpus_n = queryset.QUERIES["dedup_canonical_docs"](SF).count()
        assert total == corpus_n  # sizes × counts cover every corpus doc once
        assert (df["cluster_size"] >= 1).all()
        assert (df.loc[df["cluster_size"] >= 2, "n_clusters"] > 0).any()  # planted dups

    def test_pack_efficiency_conserves_tokens(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import packing  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        df = _check_against_oracle("docs_pack_efficiency", oracle_con)
        total_tokens = oracle_con.execute(
            r"SELECT CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)"
            " FROM documents"
        ).fetchone()[0]
        assert df["total_tokens"].sum() == total_tokens  # no token lost to binning
        assert df["fill_decile"].between(0, 10).all()

    def test_tool_stats_bounds(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import transcript_stats  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        df = queryset.QUERIES["transcript_tool_stats"](SF).to_pandas()
        assert len(df) > 0
        assert (df["n_turns"] >= df["n_convs"]).all()
        stats = queryset.QUERIES["conversation_stats"](SF).to_pandas()
        assert (df["n_convs"] <= len(stats)).all()


class TestCliRayInit:
    """cli._init_ray contract: local session by default, attach (and drop
    num_cpus with a warning) when RAY_ADDRESS points at a cluster, fall
    back to local on a set-but-EMPTY RAY_ADDRESS."""

    def _captured(self, monkeypatch, env_value, num_cpus):
        import ray as _ray

        from pdf_ocr_batch_ndrocr_lite_ray import cli

        seen = {}
        monkeypatch.setattr(_ray, "is_initialized", lambda: False)
        monkeypatch.setattr(_ray, "init", lambda **kw: seen.update(kw))
        if env_value is None:
            monkeypatch.delenv("RAY_ADDRESS", raising=False)
        else:
            monkeypatch.setenv("RAY_ADDRESS", env_value)
        cli._init_ray(num_cpus)
        return seen

    def test_unset_env_starts_local_with_num_cpus(self, monkeypatch):
        seen = self._captured(monkeypatch, None, 4)
        assert seen["address"] == "local" and seen["num_cpus"] == 4

    def test_empty_env_falls_back_to_local(self, monkeypatch):
        seen = self._captured(monkeypatch, "", 4)
        assert seen["address"] == "local" and seen["num_cpus"] == 4

    def test_cluster_env_attaches_and_warns_on_num_cpus(self, monkeypatch, capsys):
        seen = self._captured(monkeypatch, "ray://head:10001", 8)
        assert seen["address"] == "ray://head:10001"
        assert "num_cpus" not in seen
        assert "ignored" in capsys.readouterr().err


class TestEnumGroupGuard:
    def test_high_cardinality_fails_loud(self, ray_session):
        """The driver-side enum fold rejects unbounded keys with the
        reroute named (VERDICT r4 #9) instead of ballooning driver memory."""
        import pyarrow as pa
        import ray

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.exchange import enum_group_agg

        ds = ray.data.from_arrow(
            pa.table({"k": list(range(5000)), "v": [1] * 5000})
        )
        with pytest.raises(ValueError, match="hash_partitioned"):
            enum_group_agg(ds, ["k"], {"v": "sum"}, max_groups=1000)
        # under the ceiling the fold is unchanged
        out = enum_group_agg(ds, ["k"], {"v": "sum"}, max_groups=10_000)
        assert len(out) == 5000 and out["v"].sum() == 5000


class TestCountMin:
    def test_point_queries_bound_true_counts(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            CM_W,
            count_min_estimate,
            count_min_lut,
            docs_count_min,
        )

        frame = docs_count_min(SF).to_pandas()
        sketch = count_min_lut(frame)
        truth = dict(
            oracle_con.execute(
                "SELECT token, count(*) FROM (SELECT unnest(regexp_extract_all("
                "text, '\\S+')) AS token FROM documents) GROUP BY token"
                " ORDER BY count(*) DESC LIMIT 25"
            ).fetchall()
        )
        n_total = oracle_con.execute(
            "SELECT count(*) FROM (SELECT unnest(regexp_extract_all(text,"
            " '\\S+')) FROM documents)"
        ).fetchone()[0]
        assert truth
        for tok, true_n in truth.items():
            est = count_min_estimate(sketch, tok)
            assert est >= true_n  # never undercounts
            # classic CM bound with d=4 rows: overflow ≤ ~N/W w.h.p.
            assert est <= true_n + 8 * n_total / CM_W
        # total mass per row equals the token stream length
        per_row = frame.groupby("row_id")["n"].sum()
        assert (per_row == n_total).all()


class TestTpchQ5:
    def test_matches_oracle_and_star_semantics(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import analytics  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import Q5_REGION

        df = _check_against_oracle("tpch_q5_local_volume", oracle_con)
        region_nations = {
            r[0]
            for r in oracle_con.execute(
                f"""SELECT n_name FROM nation n JOIN region r
                    ON n.n_regionkey = r.r_regionkey WHERE r.r_name = '{Q5_REGION}'"""
            ).fetchall()
        }
        assert set(df["n_name"]) <= region_nations
        assert (df["revenue_e2"] > 0).all()

    def test_broadcast_ceiling_raises_before_reading(self, ray_session):
        """Past-ceiling dimension tables fail loud from parquet metadata
        (ADVICE r4: no unbounded driver state), naming the reroute."""
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            tpch_q5_local_volume,
        )

        with pytest.raises(ValueError, match="broadcast ceiling.*co-partition"):
            tpch_q5_local_volume(SF, max_broadcast_keys=10)


class TestOracleRetargeting:
    """oracle_sql_for re-targets cache-path oracles at any scale; the
    driver-facing oracle_sql() stays pinned to sf0.01 (ADVICE r4)."""

    def test_cache_paths_swap_scale(self):
        import __ray_entry__  # noqa: F401
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        cache_names = queryset.cache_sql_names()
        assert "extract_flagship" in cache_names
        assert "conversation_texts" in cache_names
        assert "tpch_q1_pricing" not in cache_names
        small = queryset.oracle_sql_for("/root/testdata/sf0.001")
        for name in cache_names:
            # nothing pinned to the driver scale survives: neither a
            # sf0.01 cache filename nor the raw sf0.01 testdata dir
            # (parquet_layout_audit embeds the dir itself, not a cache)
            assert "sf0.01-" not in small[name], name
            assert "/root/testdata/sf0.01/" not in small[name], name
            assert (
                "sf0.001-" in small[name]
                or "/root/testdata/sf0.001/" in small[name]
            ), name
        driver = queryset.oracle_sql_for(queryset.DRIVER_SF_DIR)
        for name in cache_names:
            assert (
                "sf0.01-" in driver[name]
                or "/root/testdata/sf0.01/" in driver[name]
            ), name


class TestExtractionSingleCpuFallback:
    def test_default_actor_sizing_degrades_on_one_cpu(self, ray_session, monkeypatch):
        """use_actors=True with DEFAULT sizing on a 1-CPU cluster warns and
        takes the task-pool path instead of raising (ADVICE r4); explicit
        concurrency keeps the loud error."""
        import ray as _ray

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import extraction
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import transcripts_for_sf

        monkeypatch.setattr(
            _ray, "cluster_resources", lambda: {"CPU": 1.0}, raising=True
        )
        path = transcripts_for_sf(SF)
        with pytest.warns(UserWarning, match="task-pool"):
            ds = extraction.extract_transcripts(path, use_actors=True)
        assert ds.count() > 0
        with pytest.raises(ValueError, match="deadlock"):
            extraction.extract_transcripts(path, use_actors=True, concurrency=4)


class TestRandomizedCorpusParity:
    """Randomized (seeded) corpora through the FULL Ray pipelines vs
    DuckDB — breadth beyond the hand-built nasty fixtures for the ops
    whose exchanges do nontrivial regrouping (segment dedup, pivot, lag).
    Three seeds keep the wall cost bounded; failures print the seed."""

    @pytest.mark.parametrize("seed", [3, 31, 314])
    def test_segment_dedup_and_pivot_and_lag(self, ray_session, tmp_path, seed):
        import datetime as dt

        import duckdb as _duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import (  # noqa: F401
            rollup,
            spans,
            windows,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        rng = np.random.default_rng(seed)
        d = tmp_path / f"rand{seed}"
        d.mkdir()
        # documents: random small vocab (forces segment collisions), random
        # lengths straddling the 32-token boundary, occasional empties
        vocab = [f"w{i}" for i in range(12)]
        texts = []
        for _ in range(80):
            n = int(rng.integers(0, 70))
            texts.append(" ".join(rng.choice(vocab, size=n)) if n else "")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            d / "documents.parquet",
        )
        # events: random users/types/timestamps with duplicate ts ties
        n_ev = 400
        base = dt.datetime(2024, 1, 1)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(n_ev), type=pa.int64()),
                    "ts": pa.array(
                        [
                            base + dt.timedelta(seconds=int(s))
                            for s in rng.integers(0, 5000, size=n_ev)
                        ],
                        type=pa.timestamp("us"),
                    ),
                    "user_id": pa.array(
                        rng.integers(1, 12, size=n_ev), type=pa.int64()
                    ),
                    "event_type": pa.array(
                        rng.choice(["click", "view", "purchase", "signup", "error"], size=n_ev)
                    ),
                    "value": pa.array(rng.normal(size=n_ev)),
                    "props": pa.array([""] * n_ev),
                }
            ),
            d / "events.parquet",
        )
        con = _duckdb.connect()
        for t in ("documents", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        for name in ("docs_dedup_segments", "user_event_pivot", "events_time_delta"):
            ours = queryset.QUERIES[name](str(d)).to_pandas()
            gold = con.execute(queryset.ORACLE_SQL[name]).df()
            assert len(ours) == len(gold), f"{name} seed={seed}"
            assert _value_hash(ours) == _value_hash(gold), f"{name} seed={seed}"


class TestHotWindowJoin:
    """Range-join invariants beyond the oracle hash: window geometry and
    event containment."""

    def test_windows_are_merged_hour_runs(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.intervals import _hot_intervals

        starts, ends = _hot_intervals(SF)
        assert len(starts) == len(ends) and len(starts) > 0
        hour = 3_600_000_000
        assert ((ends - starts) % hour == 0).all() and (ends > starts).all()
        assert (starts % hour == 0).all()
        # maximal runs: consecutive intervals never touch (they'd have merged)
        assert (starts[1:] > ends[:-1]).all()

    def test_joined_events_fall_inside_their_window(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.intervals import (
            events_hot_window_join,
        )

        out = events_hot_window_join(SF).to_pandas()
        assert len(out) > 0
        ts = duckdb.connect().execute(
            f"SELECT event_id, ts FROM read_parquet('{SF}/events.parquet')"
        ).df()
        j = out.merge(ts, on="event_id", validate="one_to_one")
        assert (j["ts"] >= j["window_start"]).all()
        assert (j["ts"] < j["window_end"]).all()

    def test_interval_ceiling_fails_loud(self, ray_session, monkeypatch):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import intervals

        monkeypatch.setattr(intervals, "MAX_BROADCAST_INTERVALS", 0)
        with pytest.raises(ValueError, match="co-partition"):
            intervals.events_hot_window_join(SF)


class TestDailyDistinctExact:
    def test_matches_pandas_nunique(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            events_daily_distinct_exact,
        )

        ours = (
            events_daily_distinct_exact(SF)
            .to_pandas()
            .sort_values(["day", "event_type"])
            .reset_index(drop=True)
        )
        ev = duckdb.connect().execute(
            f"SELECT ts, event_type, user_id FROM read_parquet('{SF}/events.parquet')"
        ).df()
        ev["day"] = ev["ts"].dt.floor("D")
        gold = (
            ev.groupby(["day", "event_type"])["user_id"]
            .nunique()
            .rename("n_users")
            .reset_index()
            .sort_values(["day", "event_type"])
            .reset_index(drop=True)
        )
        assert len(ours) == len(gold)
        assert (ours["n_users"].to_numpy() == gold["n_users"].to_numpy()).all()


class TestEdit1Pairs:
    @pytest.mark.parametrize(
        "a,b,want",
        [
            ("abcd", "abed", True),   # substitution
            ("abc", "abcd", True),    # insertion at end
            ("abc", "zabc", True),    # insertion at front
            ("abcd", "bacd", False),  # transposition = distance 2
            ("abc", "abc", False),    # equal
            ("abc", "abcde", False),  # distance 2 by length
            ("aaaa", "aaa", True),    # repeated-letter deletion
        ],
    )
    def test_lev1(self, a, b, want):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.editpairs import _lev1

        assert _lev1(a, b) is want and _lev1(b, a) is want

    def test_pairs_are_verified_ordered_and_unique(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.editpairs import (
            _lev1,
            transcript_edit1_pairs,
        )

        df = transcript_edit1_pairs(SF).to_pandas()
        assert len(df) > 0
        assert (df["token_a"] < df["token_b"]).all()
        assert not df.duplicated(["token_a", "token_b"]).any()
        assert all(_lev1(a, b) for a, b in zip(df["token_a"], df["token_b"]))

    def test_variant_rows_distinct_per_token(self):
        import pyarrow as pa

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.editpairs import _variant_rows

        t = _variant_rows(pa.table({"token": ["aaaa", "ab"]})).to_pandas()
        # "aaaa" deletions all collapse to "aaa": {aaaa, aaa} = 2 rows
        assert sorted(t[t["token"] == "aaaa"]["v"]) == ["aaa", "aaaa"]
        assert sorted(t[t["token"] == "ab"]["v"]) == ["a", "ab", "b"]

    def test_bucket_cap_is_deterministic_prefix(self):
        import pandas as pd

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import editpairs

        toks = [f"t{i:03d}" for i in range(10)]
        df = pd.DataFrame({"v": ["x"] * 10, "token": toks[::-1]})
        old = editpairs._MAX_VARIANT_BUCKET
        try:
            editpairs._MAX_VARIANT_BUCKET = 3
            out = editpairs._bucket_pairs_partition(df)
        finally:
            editpairs._MAX_VARIANT_BUCKET = old
        # cap keeps the 3 lexicographically-first tokens -> C(3,2)=3 pairs
        assert sorted(map(tuple, out.values)) == [
            ("t000", "t001"), ("t000", "t002"), ("t001", "t002"),
        ]


class TestSequences:
    def test_transition_mass_conservation(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sequences import (
            user_event_transitions,
        )

        t = user_event_transitions(SF).to_pandas()
        n_events, n_users = duckdb.connect().execute(
            f"SELECT count(*), count(DISTINCT user_id) "
            f"FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()
        # each user with k events contributes exactly k-1 transitions
        assert int(t["n"].sum()) == n_events - n_users
        assert (t["n"] > 0).all()

    def test_gap_histogram_mass_and_nonnegative(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sequences import (
            order_gap_histogram,
        )

        h = order_gap_histogram(SF).to_pandas()
        n_orders, n_cust = duckdb.connect().execute(
            f"SELECT count(*), count(DISTINCT o_custkey) "
            f"FROM read_parquet('{SF}/orders.parquet')"
        ).fetchone()
        assert int(h["n"].sum()) == n_orders - n_cust
        assert (h["gap_weeks"] >= 0).all()


class TestPropsStats:
    def test_garbage_props_null_on_mismatch(self, ray_session, tmp_path):
        """The schema-on-read contract: regex extraction yields NULL on
        malformed payloads; count(*) still counts the row."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.semistruct import (
            events_props_stats,
        )

        rows = [
            {"event_type": "a", "props": '{"k": 7}'},
            {"event_type": "a", "props": "not json at all"},
            {"event_type": "a", "props": '{"k": -3}'},
            {"event_type": "b", "props": ""},
            {"event_type": "b", "props": '{"j": 1, "k": 100}'},
            {"event_type": "b", "props": None},
        ]
        pq.write_table(pa.Table.from_pylist(rows), tmp_path / "events.parquet")
        ours = (
            events_props_stats(str(tmp_path))
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
        )
        gold = (
            con.execute(queryset.ORACLE_SQL["events_props_stats"])
            .df()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert _value_hash(ours) == _value_hash(gold)
        a = ours[ours["event_type"] == "a"].iloc[0]
        assert (a["n"], a["sum_k"], a["min_k"], a["max_k"]) == (3, 4, -3, 7)


class TestRefIntegrity:
    def test_clean_tpch_has_zero_orphans(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.integrity import (
            ref_integrity_report,
        )

        rep = ref_integrity_report(SF)
        assert len(rep) == 4
        assert (rep["n_orphans"] == 0).all()
        assert (rep["n_rows"] > 0).all()

    def test_orphans_counted_as_rows_not_keys(self, ray_session, tmp_path):
        """3 lineitem ROWS over 2 missing orderkeys -> 3 orphans (row count,
        not distinct-key count); dimension-only keys don't count; the other
        edges report their own orphans independently off the SAME exchange."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.integrity import (
            ref_integrity_report,
        )

        def w(name, col, vals):
            pq.write_table(
                pa.table({col: pa.array(vals, type=pa.int64())}),
                tmp_path / f"{name}.parquet",
            )

        w("lineitem", "l_orderkey", [1, 2, 900, 900, 901])
        w("orders", "o_orderkey", [1, 2, 3, 4])
        # orders->customer needs o_custkey too: rewrite orders with both cols
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "o_custkey": pa.array([10, 10, 11, 99], type=pa.int64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([10, 11], type=pa.int64()),
                    "c_nationkey": pa.array([0, 0], type=pa.int64()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        w("nation", "n_nationkey", [0])
        w("supplier", "s_nationkey", [0, 5])
        rep = ref_integrity_report(str(tmp_path)).set_index("relation")
        assert rep.loc["lineitem->orders", "n_rows"] == 5
        assert rep.loc["lineitem->orders", "n_orphans"] == 3
        assert rep.loc["orders->customer", "n_orphans"] == 1
        assert rep.loc["customer->nation", "n_orphans"] == 0
        assert rep.loc["supplier->nation", "n_orphans"] == 1


class TestConversationSequences:
    def test_role_transition_mass(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import transcripts_for_sf
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats import (
            conversation_role_transitions,
        )

        t = conversation_role_transitions(SF).to_pandas()
        path = transcripts_for_sf(SF)
        n_turns, n_convs = duckdb.connect().execute(
            f"SELECT count(*), count(DISTINCT conv_id) FROM read_parquet('{path}')"
        ).fetchone()
        assert int(t["n"].sum()) == n_turns - n_convs

    def test_tool_cooccurrence_bounded_by_marginals(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats import (
            tool_cooccurrence,
            transcript_tool_stats,
        )

        co = tool_cooccurrence(SF).to_pandas()
        marg = transcript_tool_stats(SF).to_pandas().set_index("tool")["n_convs"]
        assert len(co) > 0
        assert (co["tool_a"] < co["tool_b"]).all()
        for _, r in co.iterrows():
            assert r["n_convs"] <= min(marg[r["tool_a"]], marg[r["tool_b"]])

    def test_conversion_lag_excludes_purchase_before_view(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sequences import (
            user_conversion_lag,
        )

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0

        def add(user, hours, etype):
            nonlocal eid
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + dt.timedelta(hours=hours),
                    "user_id": user,
                    "event_type": etype,
                    "value": 1.0,
                    "props": "",
                }
            )
            eid += 1

        add(1, 0, "view"); add(1, 5, "purchase")      # lag 5h
        add(2, 3, "purchase"); add(2, 4, "view")      # purchase first: excluded
        add(3, 0, "view")                             # never converts: excluded
        add(4, 1, "purchase")                         # never viewed: excluded
        add(5, 2, "view"); add(5, 2, "purchase")      # same instant: lag 0
        pq.write_table(pa.Table.from_pylist(rows), tmp_path / "events.parquet")
        out = user_conversion_lag(str(tmp_path)).to_pandas()
        got = dict(zip(out["lag_hours"], out["n_users"]))
        assert got == {5: 1, 0: 1}


class TestSourceFlow:
    def test_flow_mass_equals_noncanonical_copies(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.dedup import dedup_source_flow

        flow = dedup_source_flow(SF).to_pandas()
        total, distinct = duckdb.connect().execute(
            f"""
            WITH corpus_src AS (
              SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')
              UNION ALL
              SELECT doc_id + 100000, substr(text, 11)
              FROM read_parquet('{SF}/documents.parquet') WHERE doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 200000, text
              FROM read_parquet('{SF}/documents.parquet') WHERE doc_id % 7 = 0
            )
            SELECT count(*),
                   count(DISTINCT md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
            FROM corpus_src
            """
        ).fetchone()
        assert int(flow["n"].sum()) == total - distinct
        # planted exact replicas are tagged 'scraper' and can never be
        # canonical (offset ids are the largest in each group)
        assert "scraper" in set(flow["dup_src"])
        assert "scraper" not in set(flow["canon_src"])


class TestJoinSizeKmv:
    def test_estimate_close_to_truth_and_internally_consistent(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            KMV_K,
            orders_join_size_kmv,
        )

        out = orders_join_size_kmv(SF).iloc[0]
        truth = duckdb.connect().execute(
            f"""
            SELECT count(*) FROM (
              SELECT DISTINCT l_orderkey FROM read_parquet('{SF}/lineitem.parquet')
              INTERSECT
              SELECT DISTINCT o_orderkey FROM read_parquet('{SF}/orders.parquet')
            )
            """
        ).fetchone()[0]
        assert out["rho"] <= out["k"] == KMV_K
        assert out["intersect_estimate"] <= out["union_estimate"]
        # k=1024 -> ~3% stderr; 15% is a generous determinism-free bound
        assert abs(out["intersect_estimate"] - truth) <= max(0.15 * truth, 5)


class TestSourceSimilarityKmv:
    def test_identical_and_disjoint_sources(self, ray_session, tmp_path):
        """Two sources sharing every shingle estimate Jaccard 1.0; a third
        with disjoint text estimates 0 against both. NULL source excluded."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            source_similarity_kmv,
        )

        shared = " ".join(f"tok{i}" for i in range(300))
        other = " ".join(f"alien{i}" for i in range(300))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(4), type=pa.int64()),
                    "source": pa.array(["a", "b", "c", None], type=pa.string()),
                    "text": pa.array([shared, shared, other, shared]),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = source_similarity_kmv(str(tmp_path)).set_index(["source_a", "source_b"])
        assert set(out.index) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert int(out.loc[("a", "b"), "jaccard_e6"]) == 1_000_000
        assert int(out.loc[("a", "c"), "jaccard_e6"]) == 0
        assert int(out.loc[("b", "c"), "rho"]) == 0

    def test_estimate_tracks_true_jaccard(self, ray_session, tmp_path):
        """A planted 50% shingle overlap estimates within KMV error bounds."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            source_similarity_kmv,
        )

        # sources share tokens 0..2999 of 0..5999 → Jaccard ≈ (3000-2)/(9000-4)
        # on trigram shingles ≈ 1/3
        a = " ".join(f"t{i}" for i in range(6000))
        b = " ".join(f"t{i}" for i in range(3000)) + " " + " ".join(
            f"u{i}" for i in range(3000)
        )
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "source": pa.array(["a", "b"], type=pa.string()),
                    "text": pa.array([a, b]),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = source_similarity_kmv(str(tmp_path)).iloc[0]
        assert abs(out["jaccard_e6"] / 1e6 - 1 / 3) < 0.08


class TestBloomSemiJoin:
    def test_bloom_prunes_most_rows_before_exchange(self, ray_session):
        import duckdb

        import ray as _ray
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.bloomjoin import (
            _build_bloom,
            _pruned_survivors,
        )

        bits = _build_bloom(SF)
        ref = _ray.put(bits)
        survivors = _pruned_survivors(SF, ref).count()
        total, true_matches = duckdb.connect().execute(
            f"""
            SELECT (SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')),
                   (SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet') l
                    JOIN read_parquet('{SF}/orders.parquet') o
                      ON l.l_orderkey = o.o_orderkey
                    WHERE o.o_totalprice > 450000)
            """
        ).fetchone()
        # pruning must be sound (never drops a true match) ...
        assert survivors >= true_matches
        # ... and effective: the exchange sees a small fraction of the probe
        # side (threshold selects ~10% of orders; 2^20 bits over ~10^2-10^3
        # keys keeps the false-positive rate near zero at this scale)
        assert survivors < 0.25 * total

    def test_false_positives_never_reach_the_result(self, ray_session):
        """Corrupt the bloom to all-ones (every row 'passes') — the exact
        verify stage must still produce the identical result."""
        import numpy as np

        import ray as _ray
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import bloomjoin

        clean = bloomjoin.bloom_semi_join_pricing(SF).to_pandas()
        orig = bloomjoin._build_bloom
        try:
            bloomjoin._build_bloom = lambda sf: np.ones(
                bloomjoin._BLOOM_BITS, dtype=bool
            )
            allpass = bloomjoin.bloom_semi_join_pricing(SF).to_pandas()
        finally:
            bloomjoin._build_bloom = orig
        a = clean.sort_values("l_returnflag").reset_index(drop=True)
        b = allpass.sort_values("l_returnflag").reset_index(drop=True)
        assert a.equals(b)


class TestNullEdgeParity:
    """Round-5 review regressions: NULL keys/values/ts must match the SQL
    oracle's semantics in every new operator (engine vs DuckDB on an
    adversarial tmp events table)."""

    @pytest.fixture(scope="class")
    def null_events_dir(self, tmp_path_factory):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0

        def add(user, hours, etype, value, props='{"k": 1}', ts_null=False):
            nonlocal eid
            rows.append(
                {
                    "event_id": eid,
                    "ts": None if ts_null else base + dt.timedelta(hours=hours),
                    "user_id": user,
                    "event_type": etype,
                    "value": value,
                    "props": props,
                }
            )
            eid += 1

        add(1, 0, "view", 1.0)
        add(1, 1, "click", 2.0)
        add(None, 2, "view", 3.0)          # NULL user ...
        add(None, 3, "purchase", None)     # ... twice: one window partition
        add(2, 4, "view", -5.0)
        add(2, 5, "purchase", 4.0, props="garbage")
        add(3, 6, "signup", None, props="no k here")  # all-miss props group
        add(3, 7, None, 1.0)                          # NULL event_type
        add(4, 0, "view", 6.0, ts_null=True)          # NULL ts, known type
        add(5, 0, "refund", 7.0, ts_null=True)        # type whose EVERY ts is NULL
        add(None, 8, "ghost", 8.0)                    # type whose every user is NULL
        pq.write_table(
            pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        ("event_id", pa.int64()),
                        ("ts", pa.timestamp("us")),
                        ("user_id", pa.int64()),
                        ("event_type", pa.string()),
                        ("value", pa.float64()),
                        ("props", pa.string()),
                    ]
                ),
            ),
            tmp_path_factory.mktemp("null_events") / "events.parquet",
        )
        return str(
            sorted(tmp_path_factory.getbasetemp().glob("null_events*"))[-1]
        )

    @pytest.mark.parametrize(
        "name",
        [
            "events_daily_distinct_exact",
            "user_event_transitions",
            "user_conversion_lag",
            "events_hot_window_join",
            "events_band_pairs",
            "session_window_overlap",
            "events_props_stats",
            "events_decayed_counts",
            "user_event_trigrams",
            "events_latest_per_user",
            "user_modal_event_type",
            "events_type_hour_chi2",
            "user_type_entropy",
        ],
    )
    def test_null_edges_match_oracle(self, ray_session, null_events_dir, name):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import (  # noqa: F401
            compaction,
            intervals,
            profile,
            semistruct,
            sequences,
            windows,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{null_events_dir}/events.parquet')"
        )
        ours = queryset.QUERIES[name](null_events_dir).to_pandas()
        gold = con.execute(queryset.ORACLE_SQL[name]).df()
        assert len(ours) == len(gold), f"{name}: rows {len(ours)} != {len(gold)}"
        assert _value_hash(ours) == _value_hash(gold), f"{name}: value mismatch"

    def test_corpus_src_batch_handles_blocks_without_replicas(self):
        import pyarrow as pa

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.dedup import _corpus_src_batch

        # doc_ids with no multiple of 5 and no multiple of 7: both replica
        # sides are EMPTY and must still concat (typed empty arrays)
        t = _corpus_src_batch(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array(["a b c d e f g h i j k", "x", "y"]),
                    "source": pa.array(["s1", "s2", "s3"]),
                }
            )
        )
        assert len(t) == 3 and t["source"].to_pylist() == ["s1", "s2", "s3"]

    def test_bloom_join_rounds_half_away(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.bloomjoin import (
            bloom_semi_join_pricing,
        )

        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
                    "l_returnflag": pa.array(["A", "A", "A"]),
                    "l_quantity": pa.array([2.5, 3.5, 1.0], type=pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2], type=pa.int64()),
                    "o_totalprice": pa.array([500000.0, 100.0], type=pa.float64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        ours = bloom_semi_join_pricing(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(queryset.ORACLE_SQL["bloom_semi_join_pricing"]).df()
        # 2.5 -> 3 and 3.5 -> 4 under half-away: sum_qty == 7, rows == 2
        assert ours.iloc[0]["sum_qty"] == 7 == gold.iloc[0]["sum_qty"]
        assert _value_hash(ours) == _value_hash(gold)


class TestConversationDedup:
    def test_groups_cover_all_conversations(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.conversations import (
            conversation_dedup_exact,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import transcripts_for_sf

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.conversations import (
            q_conversation_plain_texts,
        )

        g = conversation_dedup_exact(SF).to_pandas()
        # groups partition exactly the conversations that HAVE plain turns
        # (a conv with none never enters the plain reassembly — same rule
        # as the oracle's plain_turns CTE)
        n_plain_convs = q_conversation_plain_texts(SF).count()
        assert int(g["n_dups"].sum()) == n_plain_convs
        assert n_plain_convs <= duckdb.connect().execute(
            f"SELECT count(DISTINCT conv_id) FROM read_parquet('{transcripts_for_sf(SF)}')"
        ).fetchone()[0]
        # keep is always a member with the smallest id: groups are disjoint
        assert g["keep_conv_id"].is_unique


class TestLabelCentroids:
    def test_centroid_matches_serial_fixed_point(self, ray_session):
        import duckdb
        import numpy as np

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pca import emb_label_centroids

        out = emb_label_centroids(SF).set_index("label")
        emb = duckdb.connect().execute(
            f"SELECT label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        ).df()
        for lab, g in emb.groupby("label"):
            m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
            q = (np.sign(m) * np.floor(np.abs(m) * 1e6 + 0.5)).astype(np.int64)
            want = q.sum(axis=0)
            got = np.array(out.loc[lab, "centroid_e6"].split(","), dtype=np.int64)
            assert (got == want).all() and out.loc[lab, "n"] == len(g)


class TestPartitionChecksums:
    def test_replica_diff_localizes_to_changed_bucket(self, ray_session, tmp_path, monkeypatch):
        import hashlib

        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import transcript_stats as ts
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import transcripts_for_sf

        base = ts.transcript_partition_checksums(SF).to_pandas().set_index("bucket")
        # perturb ONE conversation's text in a copy of the table
        t = pq.read_table(transcripts_for_sf(SF))
        df = t.to_pandas()
        victim = df["conv_id"].iloc[0]
        df.loc[df["conv_id"] == victim, "text"] = "TAMPERED"
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "copy.parquet")
        monkeypatch.setattr(ts, "transcripts_for_sf", lambda sf: str(tmp_path / "copy.parquet"))
        tampered = ts.transcript_partition_checksums(SF).to_pandas().set_index("bucket")
        want_bucket = (
            int.from_bytes(hashlib.md5(str(victim).encode()).digest()[:8], "big")
            % ts.N_CHECKSUM_BUCKETS
        )
        diff = base.join(tampered, rsuffix="_t")
        changed = diff[diff["xor_hash"] != diff["xor_hash_t"]].index.tolist()
        assert changed == [want_bucket]
        assert (diff["n_rows"] == diff["n_rows_t"]).all()


class TestSlidingHll:
    def test_estimates_track_exact_sliding_distinct(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            HLL_WINDOW_HOURS,
            events_sliding_distinct_hll,
        )

        est = events_sliding_distinct_hll(SF).to_pandas().set_index("window_start")
        exact = duckdb.connect().execute(
            f"""
            WITH h AS (SELECT DISTINCT date_trunc('hour', ts) AS hr, user_id
                       FROM read_parquet('{SF}/events.parquet')),
            w AS (SELECT DISTINCT hr AS ws FROM h)
            SELECT w.ws, count(DISTINCT h.user_id) AS n
            FROM w JOIN h ON h.hr >= w.ws
                         AND h.hr < w.ws + INTERVAL {HLL_WINDOW_HOURS} HOUR
            GROUP BY 1
            """
        ).df().set_index("ws")["n"]
        assert len(est) == len(exact)
        rel = (est["n_users_hll"] - exact).abs() / exact
        # m=256 registers -> ~6.5% stderr; 25% is a generous uniform bound
        assert rel.max() <= 0.25


class TestNullEdgeRound2:
    """Second review batch: NULL embeddings/labels and NULL conv keys."""

    def test_label_centroids_null_contract(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pca import emb_label_centroids

        emb_t = pa.array(
            [[1.0, 2.0], [None, 4.0], None, [5.0, 6.0]],
            type=pa.list_(pa.float32()),
        )
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "embedding": emb_t,
                    "label": pa.array([0, 0, 0, None], type=pa.int64()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )
        ours = emb_label_centroids(str(tmp_path))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
        )
        gold = con.execute(queryset.ORACLE_SQL["emb_label_centroids"]).df()
        # row 3 (NULL list) and row 4 (NULL label) excluded; NULL element -> 0
        assert len(ours) == len(gold) == 1
        assert ours.iloc[0]["n"] == 2
        assert ours.iloc[0]["centroid_e6"] == gold.iloc[0]["centroid_e6"] == "1000000,6000000"

    def test_partition_checksums_null_conv(self, ray_session, tmp_path, monkeypatch):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import transcript_stats as ts
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import DRIVER_SF_DIR

        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array(["c1", None, "c2"], type=pa.string()),
                    "turn_idx": pa.array([0, None, 1], type=pa.int32()),
                    "text": pa.array(["a", None, "b"], type=pa.string()),
                }
            ),
            tmp_path / "t.parquet",
        )
        path = str(tmp_path / "t.parquet")
        monkeypatch.setattr(ts, "transcripts_for_sf", lambda sf: path)
        ours = ts.transcript_partition_checksums(DRIVER_SF_DIR).to_pandas()
        con = duckdb.connect()
        gold = con.execute(ts._partition_checksums_sql(path)).df()
        assert int(ours["n_rows"].sum()) == 3 == int(gold["n_rows"].sum())
        a = ours.sort_values("bucket").reset_index(drop=True)
        b = gold.sort_values("bucket").reset_index(drop=True)
        assert (a["xor_hash"].astype("uint64").to_numpy()
                == b["xor_hash"].astype("uint64").to_numpy()).all()


class TestLineitemCorr:
    def test_planted_perfect_and_inverse_correlation(self, ray_session, tmp_path):
        """y = 3x gives corr_e6 exactly 1e6; y = -2x gives -1e6; a
        zero-variance group is excluded on both sides."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            lineitem_corr_by_flag,
        )

        n = 50
        flags = ["P"] * n + ["M"] * n + ["Z"] * n
        qty = list(range(1, n + 1)) * 2 + [7.0] * n
        price = [3.0 * q for q in range(1, n + 1)]
        price += [-2.0 * q for q in range(1, n + 1)]
        price += [9.0] * n  # constant in both columns → excluded
        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(flags, type=pa.string()),
                    "l_quantity": pa.array([float(q) for q in qty], type=pa.float64()),
                    "l_extendedprice": pa.array(price, type=pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        ours = lineitem_corr_by_flag(str(tmp_path)).set_index("l_returnflag")
        assert set(ours.index) == {"P", "M"}
        assert int(ours.loc["P", "corr_e6"]) == 1_000_000
        assert int(ours.loc["M", "corr_e6"]) == -1_000_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["lineitem_corr_by_flag"]).df()
        assert _value_hash(ours.reset_index()) == _value_hash(gold)

    def test_matches_duckdb_corr_to_quantization(self, ray_session):
        """On the real table the e6-fixed-point r agrees with DuckDB's own
        corr() aggregate to the quantization step (the oracle reproduces
        the engine's exact chain; corr() is the independent floatier twin)."""
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            lineitem_corr_by_flag,
        )

        ours = lineitem_corr_by_flag(SF).set_index("l_returnflag")
        ref = duckdb.connect().execute(
            f"""
            SELECT l_returnflag, corr(l_quantity, l_extendedprice) AS r
            FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1
            """
        ).df().set_index("l_returnflag")
        for flag in ours.index:
            assert abs(ours.loc[flag, "corr_e6"] / 1e6 - ref.loc[flag, "r"]) < 1e-4


class TestTokenFrequencySpectrum:
    def test_planted_spectrum_exact(self, ray_session, tmp_path):
        """Tokens planted at counts 1, 2, 3, 4, 8, 1000 land in exactly the
        right log2 buckets with exact distinct-token counts, across
        adversarial block splits (each token's instances scattered over
        many docs)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            token_frequency_spectrum,
        )

        # counts: a→1, b→2, c→3, d→4, e→8, f→1000; scattered one per doc
        plan = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 8, "f": 1000}
        toks = [t for t, n in plan.items() for _ in range(n)]
        texts = [" ".join(toks[i::37]) for i in range(37)]  # 37 scattered docs
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = (
            token_frequency_spectrum(str(tmp_path))
            .to_pandas()
            .set_index("bucket")["n_tokens"]
            .to_dict()
        )
        # bucket 0: {a}, 1: {b,c}, 2: {d}, 3: {e}, 9: {f: 1000 in [512,1024)}
        assert out == {0: 1, 1: 2, 2: 1, 3: 1, 9: 1}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["token_frequency_spectrum"]).df()
        assert {int(r.bucket): int(r.n_tokens) for r in gold.itertuples()} == out


class TestSourceDriftKs:
    def test_planted_drift_and_null_source_extreme(self, ray_session, tmp_path):
        """Identical distributions give ks_e6 = 0; disjoint ones give 1e6;
        a NULL-source row holding the global max n_chars must NOT shift the
        bin domain (the min/max pre-pass applies the same contract filter
        as the bin pass)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import source_drift_ks
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = [("a", n) for n in range(100, 200)]
        rows += [("b", n) for n in range(100, 200)]   # identical to a
        rows += [("c", n) for n in range(5000, 5100)]  # disjoint from both
        rows += [(None, 10_000_000)]                   # NULL-source extreme
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), type=pa.int64()),
                    "source": pa.array([r[0] for r in rows], type=pa.string()),
                    "text": pa.array(["x"] * len(rows)),
                    "n_chars": pa.array([r[1] for r in rows], type=pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = source_drift_ks(str(tmp_path)).set_index(["source_a", "source_b"])
        assert int(out.loc[("a", "b"), "ks_e6"]) == 0
        assert int(out.loc[("a", "c"), "ks_e6"]) == 1_000_000
        assert int(out.loc[("b", "c"), "ks_e6"]) == 1_000_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["source_drift_ks"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestCompactionOps:
    """X101-X104: latest-per-key compaction, grouped mode, chi-square
    independence, and the reducible non-equi semi-join."""

    def _events_dir(self, tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "events.parquet")
        return str(tmp_path)

    def test_latest_picks_max_ts_then_max_event_id(self, ray_session, tmp_path):
        import datetime as dt

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.compaction import (
            events_latest_per_user,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: later ts wins regardless of event_id order
            dict(event_id=5, ts=t0, user_id=1, event_type="old", value=1.0, props="{}"),
            dict(event_id=1, ts=t0.replace(hour=2), user_id=1, event_type="new", value=2.0, props="{}"),
            # user 2: equal ts -> max event_id wins
            dict(event_id=7, ts=t0, user_id=2, event_type="lo", value=1.0, props="{}"),
            dict(event_id=9, ts=t0, user_id=2, event_type="hi", value=2.0, props="{}"),
            # user 3: all-null ts -> max event_id wins, ts output NULL
            dict(event_id=3, ts=None, user_id=3, event_type="a", value=1.0, props="{}"),
            dict(event_id=4, ts=None, user_id=3, event_type="b", value=2.0, props="{}"),
            # user 4: null ts never beats a non-null one
            dict(event_id=99, ts=None, user_id=4, event_type="nullts", value=0.0, props="{}"),
            dict(event_id=1, ts=t0, user_id=4, event_type="real", value=1.0, props="{}"),
        ]
        out = (
            events_latest_per_user(self._events_dir(tmp_path, rows))
            .to_pandas()
            .set_index("user_id")
        )
        assert out.loc[1, "last_type"] == "new"
        assert out.loc[2, "last_type"] == "hi"
        assert out.loc[3, "last_type"] == "b"
        assert pd.isna(out.loc[3, "last_ts_us"])
        assert out.loc[4, "last_type"] == "real"

    def test_modal_tie_breaks_lexicographically(self, ray_session, tmp_path):
        import datetime as dt

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.compaction import (
            user_modal_event_type,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            dict(event_id=i, ts=t0, user_id=1, event_type=t, value=0.0, props="{}")
            for i, t in enumerate(["zeta", "zeta", "alpha", "alpha", "mid"])
        ]
        out = user_modal_event_type(self._events_dir(tmp_path, rows)).to_pandas()
        assert out.loc[0, "modal_type"] == "alpha"  # 2-2 tie -> lexicographic min
        assert int(out.loc[0, "n_events"]) == 2

    def test_chi2_independent_grid_is_zero(self, ray_session, tmp_path):
        """A perfectly independent type × hour grid has chi2 == 0, and the
        zero cells of a dependent grid are counted (statistic > 0)."""
        import datetime as dt

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            events_type_hour_chi2,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h in (1, 2):
            for t in ("a", "b"):
                for _ in range(3):  # equal counts everywhere -> independent
                    rows.append(
                        dict(event_id=eid, ts=t0.replace(hour=h), user_id=1,
                             event_type=t, value=0.0, props="{}")
                    )
                    eid += 1
        out = events_type_hour_chi2(self._events_dir(tmp_path, rows)).to_pandas()
        assert int(out.loc[0, "chi2_e6"]) == 0
        assert int(out.loc[0, "dof"]) == 1
        assert int(out.loc[0, "n_obs"]) == 12

        rows2 = [
            dict(event_id=0, ts=t0.replace(hour=1), user_id=1, event_type="a",
                 value=0.0, props="{}"),
            dict(event_id=1, ts=t0.replace(hour=2), user_id=1, event_type="b",
                 value=0.0, props="{}"),
        ]
        import pathlib

        d2 = tmp_path / "dep"
        d2.mkdir()
        out2 = events_type_hour_chi2(self._events_dir(d2, rows2)).to_pandas()
        assert int(out2.loc[0, "chi2_e6"]) == 2_000_000  # chi2 == n == 2 exact

    def test_late_shipment_reduction_equals_exists(self, ray_session, tmp_path):
        """max(shipdate) reduction == EXISTS semantics on a handmade case
        where only ONE of several lines crosses the threshold."""
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            ORDERS_LATE_SHIPMENT_SQL,
            orders_late_shipment_priority,
        )

        d0 = dt.datetime(2024, 1, 1)
        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_custkey": pa.array([1, 1, 1], type=pa.int64()),
                "o_orderstatus": pa.array(["F", "F", "F"]),
                "o_totalprice": pa.array([1.0, 1.0, 1.0], type=pa.float64()),
                "o_orderdate": pa.array([d0, d0, d0], type=pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"]),
            }
        )
        lines = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),
                "l_partkey": pa.array([1, 1, 1, 1], type=pa.int64()),
                "l_suppkey": pa.array([1, 1, 1, 1], type=pa.int64()),
                "l_linenumber": pa.array([1, 2, 1, 1], type=pa.int32()),
                "l_quantity": pa.array([1.0] * 4, type=pa.float64()),
                "l_extendedprice": pa.array([1.0] * 4, type=pa.float64()),
                "l_discount": pa.array([0.0] * 4, type=pa.float64()),
                "l_tax": pa.array([0.0] * 4, type=pa.float64()),
                "l_returnflag": pa.array(["N"] * 4),
                "l_linestatus": pa.array(["O"] * 4),
                # order 1: one early + one late line -> late; order 2: exactly
                # at +60d (NOT strictly greater) -> not late; order 3: early
                "l_shipdate": pa.array(
                    [
                        d0 + dt.timedelta(days=1),
                        d0 + dt.timedelta(days=61),
                        d0 + dt.timedelta(days=60),
                        d0 + dt.timedelta(days=2),
                    ],
                    type=pa.timestamp("us"),
                ),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        pq.write_table(lines, tmp_path / "lineitem.parquet")
        out = orders_late_shipment_priority(str(tmp_path)).to_pandas()
        assert dict(zip(out["o_orderpriority"], out["n_late"])) == {"1-URGENT": 1}
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORDERS_LATE_SHIPMENT_SQL).df()
        assert _value_hash(out) == _value_hash(gold)


class TestSnapshotAndGini:
    """X105 as-of snapshot (pushdown + compaction) and X106 per-source Gini."""

    def test_snapshot_keeps_only_pre_cutoff_state(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.compaction import (
            SNAPSHOT_CUTOFF,
            orders_snapshot_asof,
        )

        cutoff = dt.datetime.fromisoformat(SNAPSHOT_CUTOFF)
        pre, post = cutoff - dt.timedelta(days=30), cutoff + dt.timedelta(days=30)
        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_custkey": pa.array([1, 1, 2], type=pa.int64()),
                "o_orderstatus": pa.array(["OLD", "NEW", "POST"]),
                "o_totalprice": pa.array([10.005, 20.0, 30.0], type=pa.float64()),
                # cust 1: two pre-cutoff orders (latest wins); cust 2: only a
                # post-cutoff order -> absent from the snapshot entirely
                "o_orderdate": pa.array(
                    [pre - dt.timedelta(days=5), pre, post], type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1", "1", "1"]),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        out = orders_snapshot_asof(str(tmp_path)).to_pandas().set_index("o_custkey")
        assert list(out.index) == [1]
        assert out.loc[1, "last_status"] == "NEW"
        assert int(out.loc[1, "last_price_e2"]) == 2000

    def test_gini_known_values_and_null_contract(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            DOCS_GINI_BY_SOURCE_SQL,
            docs_gini_by_source,
        )

        rows = (
            [("equal", 7)] * 4                       # all equal -> gini 0
            + [("skew", 0), ("skew", 0), ("skew", 10)]  # 2*30/(3*10)-4/3 = 2/3
            + [("solo", 123)]                         # n=1 -> gini 0
            + [(None, 50), ("skew", None)]            # excluded on both sides
        )
        t = pa.table(
            {
                "doc_id": pa.array(range(len(rows)), type=pa.int64()),
                "text": pa.array(["x"] * len(rows)),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([r[0] for r in rows], type=pa.string()),
                "n_chars": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = (
            docs_gini_by_source(str(tmp_path)).to_pandas().set_index("source")
        )
        assert int(out.loc["equal", "gini_e6"]) == 0
        assert int(out.loc["skew", "gini_e6"]) == 666_667
        assert int(out.loc["solo", "gini_e6"]) == 0
        assert int(out.loc["skew", "n"]) == 3  # NULL n_chars row excluded
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(DOCS_GINI_BY_SOURCE_SQL).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestOrdersCube:
    def test_cube_has_all_grouping_sets_and_consistent_totals(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            ROLLUP_ALL,
            orders_cube,
        )

        out = orders_cube("/root/testdata/sf0.001").to_pandas()
        dims = ["o_orderpriority", "o_orderstatus", "order_year"]
        # every one of the 2^3 grouping sets is present
        masks = {
            tuple(c == ROLLUP_ALL for c in row)
            for row in out[dims].itertuples(index=False)
        }
        assert len(masks) == 8
        # the grand total equals the finest level's sum, for both measures
        grand = out[(out[dims] == ROLLUP_ALL).all(axis=1)]
        finest = out[(out[dims] != ROLLUP_ALL).all(axis=1)]
        assert int(grand["n_orders"].iloc[0]) == int(finest["n_orders"].sum())
        assert int(grand["revenue_e2"].iloc[0]) == int(finest["revenue_e2"].sum())


class TestSession5NullEdges:
    """Review regressions: X104/X105/X106 NULL- and zero-edge parity with
    their DuckDB twins (the events-based X101-X103 ride the shared
    TestNullEdgeParity fixture)."""

    def test_late_shipment_null_dates_match_oracle(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            ORDERS_LATE_SHIPMENT_SQL,
            orders_late_shipment_priority,
        )

        d0 = dt.datetime(2024, 1, 1)
        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_custkey": pa.array([1, 1, 1], type=pa.int64()),
                "o_orderstatus": pa.array(["F", "F", "F"]),
                "o_totalprice": pa.array([1.0, 1.0, 1.0], type=pa.float64()),
                # order 1 has NULL orderdate (EXISTS predicate NULL -> never
                # late); order 2's only shipdate is NULL (max NULL -> never
                # late); order 3 is genuinely late
                "o_orderdate": pa.array([None, d0, d0], type=pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-LOW"]),
            }
        )
        lines = pa.table(
            {
                "l_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "l_partkey": pa.array([1] * 3, type=pa.int64()),
                "l_suppkey": pa.array([1] * 3, type=pa.int64()),
                "l_linenumber": pa.array([1] * 3, type=pa.int32()),
                "l_quantity": pa.array([1.0] * 3, type=pa.float64()),
                "l_extendedprice": pa.array([1.0] * 3, type=pa.float64()),
                "l_discount": pa.array([0.0] * 3, type=pa.float64()),
                "l_tax": pa.array([0.0] * 3, type=pa.float64()),
                "l_returnflag": pa.array(["N"] * 3),
                "l_linestatus": pa.array(["O"] * 3),
                "l_shipdate": pa.array(
                    [d0 + dt.timedelta(days=90), None, d0 + dt.timedelta(days=90)],
                    type=pa.timestamp("us"),
                ),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        pq.write_table(lines, tmp_path / "lineitem.parquet")
        out = orders_late_shipment_priority(str(tmp_path)).to_pandas()
        assert dict(zip(out["o_orderpriority"], out["n_late"])) == {"3-LOW": 1}
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORDERS_LATE_SHIPMENT_SQL).df()
        assert _value_hash(out) == _value_hash(gold)

    def test_snapshot_null_key_price_status_match_oracle(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.compaction import (
            ORDERS_SNAPSHOT_ASOF_SQL,
            SNAPSHOT_CUTOFF,
            orders_snapshot_asof,
        )

        pre = dt.datetime.fromisoformat(SNAPSHOT_CUTOFF) - dt.timedelta(days=10)
        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                # two NULL-key rows form ONE group; latest (orderkey 3) wins
                "o_custkey": pa.array([1, None, None, 1], type=pa.int64()),
                "o_orderstatus": pa.array(["F", "O", None, "F"]),
                "o_totalprice": pa.array([10.0, 20.0, None, None], type=pa.float64()),
                "o_orderdate": pa.array(
                    [pre, pre, pre + dt.timedelta(days=1), pre + dt.timedelta(days=1)],
                    type=pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1"] * 4),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        out = orders_snapshot_asof(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORDERS_SNAPSHOT_ASOF_SQL).df()
        assert len(out) == len(gold) == 2
        assert _value_hash(out) == _value_hash(gold)

    def test_gini_all_zero_source_is_null_not_crash(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            DOCS_GINI_BY_SOURCE_SQL,
            docs_gini_by_source,
        )

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(["x"] * 4),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["zeros", "zeros", "zeros", "ok"]),
                "n_chars": pa.array([0, 0, 0, 5], type=pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = docs_gini_by_source(str(tmp_path)).to_pandas()
        z = out.set_index("source")
        assert pd.isna(z.loc["zeros", "gini_e6"])  # NULL, not a crash
        assert int(z.loc["ok", "gini_e6"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(DOCS_GINI_BY_SOURCE_SQL).df()
        assert _value_hash(out) == _value_hash(gold)

    def test_latest_per_user_big_int64_keys_survive(self, ray_session, tmp_path):
        """Keys above 2^53 must pass through exactly (no float detour)."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.compaction import (
            events_latest_per_user,
        )

        big = (1 << 53) + 1  # not representable in float64
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            {"event_id": 1, "ts": t0, "user_id": big, "event_type": "a",
             "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": t0, "user_id": big + 2, "event_type": "b",
             "value": 2.0, "props": "{}"},
        ]
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "events.parquet")
        out = events_latest_per_user(str(tmp_path)).to_pandas()
        assert sorted(out["user_id"].tolist()) == [big, big + 2]


class TestCompactionFuzz:
    """Randomized engine-vs-DuckDB parity for the compaction family: random
    small event tables with NULL keys/ts/types/values and heavy ties must
    hash-match the registered oracles on every draw (the tie rules and NULL
    orders are exactly where hand-built fixtures under-cover)."""

    @pytest.mark.parametrize("seed", [3, 17, 41, 97, 211])
    def test_random_tables_match_oracles(self, ray_session, tmp_path, seed):
        import datetime as dt

        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import (  # noqa: F401
            compaction,
            profile,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset

        rng = np.random.default_rng(seed)
        n = int(rng.integers(20, 120))
        base = dt.datetime(2024, 1, 1)
        # few users and types, coarse timestamps -> dense tie structure
        users = rng.integers(0, 6, size=n).astype(object)
        users[rng.random(n) < 0.15] = None
        hours = rng.integers(0, 8, size=n)
        ts = np.array([base + dt.timedelta(hours=int(h)) for h in hours], dtype=object)
        ts[rng.random(n) < 0.15] = None
        types = rng.choice(["a", "b", "c"], size=n).astype(object)
        types[rng.random(n) < 0.15] = None
        vals = np.round(rng.normal(0, 3, size=n), 3).astype(object)
        vals[rng.random(n) < 0.15] = None
        rows = [
            {
                "event_id": i,
                "ts": ts[i],
                "user_id": None if users[i] is None else int(users[i]),
                "event_type": types[i],
                "value": None if vals[i] is None else float(vals[i]),
                "props": "{}",
            }
            for i in range(n)
        ]
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        d = tmp_path / f"s{seed}"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), d / "events.parquet")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        for name in (
            "events_latest_per_user",
            "user_modal_event_type",
            "user_type_entropy",
            "events_type_hour_chi2",
        ):
            ours = queryset.QUERIES[name](str(d)).to_pandas()
            gold = con.execute(queryset.ORACLE_SQL[name]).df()
            assert len(ours) == len(gold), f"{name} seed={seed}"
            assert _value_hash(ours) == _value_hash(gold), f"{name} seed={seed}"


class TestWeightedMedianAndTTR:
    """X110 weighted median (known crossings, NULL contract) and X111
    type-token ratio (known values, NULL source exclusion)."""

    def test_weighted_median_known_values(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            LINEITEM_WEIGHTED_MEDIAN_SQL,
            lineitem_weighted_median,
        )

        def li(flag, price, qty):
            return dict(
                l_orderkey=1, l_partkey=1, l_suppkey=1, l_linenumber=1,
                l_quantity=qty, l_extendedprice=price, l_discount=0.0,
                l_tax=0.0, l_returnflag=flag, l_linestatus="O",
                l_shipdate=None,
            )

        rows = [
            # flag A: weights 1,1,10 over prices 1,2,3 -> median 3 (weight
            # mass concentrated at the top)
            li("A", 1.0, 1.0), li("A", 2.0, 1.0), li("A", 3.0, 10.0),
            # flag B: equal weights over 1,2,3 -> lower weighted median 2
            li("B", 1.0, 1.0), li("B", 2.0, 1.0), li("B", 3.0, 1.0),
            # flag C: NULL price/qty rows excluded; only the 5.0 row counts
            li("C", None, 1.0), li("C", 5.0, None), li("C", 5.0, 2.0),
        ]
        schema = pa.schema(
            [
                ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        out = lineitem_weighted_median(str(tmp_path)).set_index("l_returnflag")
        assert int(out.loc["A", "wmedian_price_e2"]) == 300
        assert int(out.loc["B", "wmedian_price_e2"]) == 200
        assert int(out.loc["C", "wmedian_price_e2"]) == 500
        assert int(out.loc["C", "total_qty_e2"]) == 200
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(LINEITEM_WEIGHTED_MEDIAN_SQL).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_ttr_known_values_and_null_source(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            SOURCE_LEXICAL_DIVERSITY_SQL,
            source_lexical_diversity,
        )

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": pa.array(
                    ["a b a b", "a c", None, "x y z", "dropped tokens"],
                    type=pa.string(),
                ),
                "lang": pa.array(["en"] * 5),
                # s1: tokens a b a b a c -> 3 distinct / 6 total = 0.5
                # s2: one doc NULL text, one with 3 distinct / 3 total
                # NULL source: excluded entirely
                "source": pa.array(["s1", "s1", "s2", "s2", None], type=pa.string()),
                "n_chars": pa.array([7, 3, 0, 5, 14], type=pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = source_lexical_diversity(str(tmp_path)).set_index("source")
        assert int(out.loc["s1", "distinct_tokens"]) == 3
        assert int(out.loc["s1", "total_tokens"]) == 6
        assert int(out.loc["s1", "ttr_e6"]) == 500_000
        assert int(out.loc["s2", "ttr_e6"]) == 1_000_000
        assert set(out.index) == {"s1", "s2"}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(SOURCE_LEXICAL_DIVERSITY_SQL).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestTpchQuartet:
    """X112-X115: Q6 (scan-agg), Q14 (broadcast dimension), Q18
    (group-filter-join + top-N), Q10 (two-exchange star + top-N).
    Value parity vs DuckDB is in the blanket loop; these pin the
    structural invariants and the ceiling guards."""

    def test_q6_known_values(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q6_forecast_revenue,
        )

        def li(ship, disc, qty, price):
            return dict(
                l_shipdate=ship, l_discount=disc, l_quantity=qty,
                l_extendedprice=price,
            )

        import datetime as dt

        in_win = dt.datetime(1996, 6, 1)
        out_win = dt.datetime(1997, 6, 1)
        rows = [
            li(in_win, 0.06, 10.0, 100.0),   # kept: 100*0.06 = 6.00 -> 60000 e4
            li(in_win, 0.04, 10.0, 100.0),   # discount below band
            li(in_win, 0.06, 30.0, 100.0),   # quantity past cap
            li(out_win, 0.06, 10.0, 100.0),  # outside the year
        ]
        schema = pa.schema(
            [
                ("l_shipdate", pa.timestamp("us")), ("l_discount", pa.float64()),
                ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        out = tpch_q6_forecast_revenue(str(tmp_path))
        assert int(out["revenue_e4"].iloc[0]) == 60_000
        assert int(out["n_lines"].iloc[0]) == 1

    def test_q14_and_q18_and_q10_ceilings_raise_before_reading(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q10_returned_revenue,
            tpch_q14_promo_revenue,
            tpch_q18_large_orders,
        )

        with pytest.raises(ValueError, match="broadcast ceiling.*co-partition"):
            tpch_q14_promo_revenue(SF, max_broadcast_keys=10)
        with pytest.raises(ValueError, match="broadcast ceiling.*co-partition"):
            tpch_q18_large_orders(SF, max_broadcast_keys=10)
        with pytest.raises(ValueError, match="broadcast ceiling.*co-partition"):
            tpch_q10_returned_revenue(SF, max_broadcast_keys=10)

    def test_q18_threshold_and_total_order(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            Q18_QTY_MIN_E2,
            tpch_q18_large_orders,
        )

        out = tpch_q18_large_orders(SF)
        assert (out["qty_e2"] > Q18_QTY_MIN_E2).all()
        # total tie-break: (price DESC, orderkey ASC) is a strict order
        key = list(zip(-out["totalprice_e2"], out["o_orderkey"]))
        assert key == sorted(key)
        assert out["c_name"].notna().all()

    def test_q10_returned_only_and_topn(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            Q10_TOP_N,
            tpch_q10_returned_revenue,
        )

        out = tpch_q10_returned_revenue(SF)
        assert len(out) <= Q10_TOP_N
        assert (out["revenue_e2"] > 0).all()
        # the winners' revenue is reproduced by a direct DuckDB recount
        con = duckdb.connect()
        gold = con.execute(
            f"""
            SELECT o.o_custkey AS c_custkey,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                        * 100, 0) AS BIGINT)) AS BIGINT) AS rev
            FROM read_parquet('{SF}/lineitem.parquet') l
            JOIN read_parquet('{SF}/orders.parquet') o
              ON o.o_orderkey = l.l_orderkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-10-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1
            """
        ).df().set_index("c_custkey")["rev"]
        for _, r in out.iterrows():
            assert int(gold.loc[int(r["c_custkey"])]) == int(r["revenue_e2"])


class TestTpchSecondTrio:
    """X116-X118: Q7 directional pairs, Q15 max-with-ties, Q13 zero-
    inclusive count-of-counts. Value parity is in the blanket loop."""

    def test_q7_directions_and_bounds(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            Q7_NATION_A,
            Q7_NATION_B,
            tpch_q7_volume_shipping,
        )

        out = tpch_q7_volume_shipping(SF)
        assert len(out) > 0
        pairs = set(zip(out["supp_nation"], out["cust_nation"]))
        assert pairs <= {(Q7_NATION_A, Q7_NATION_B), (Q7_NATION_B, Q7_NATION_A)}
        assert (out["revenue_e2"] > 0).all()
        assert out["l_year"].between(1995, 1997).all()

    def test_q15_ties_rule_on_fixture(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q15_top_supplier,
        )

        in_win = dt.datetime(1996, 2, 1)
        rows = [
            # suppliers 1 and 2 tie at 200.00; supplier 3 trails
            dict(l_suppkey=1, l_shipdate=in_win, l_extendedprice=200.0, l_discount=0.0),
            dict(l_suppkey=2, l_shipdate=in_win, l_extendedprice=100.0, l_discount=0.0),
            dict(l_suppkey=2, l_shipdate=in_win, l_extendedprice=100.0, l_discount=0.0),
            dict(l_suppkey=3, l_shipdate=in_win, l_extendedprice=50.0, l_discount=0.0),
        ]
        schema = pa.schema(
            [
                ("l_suppkey", pa.int64()), ("l_shipdate", pa.timestamp("us")),
                ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                    "s_name": pa.array(["S1", "S2", "S3"], type=pa.string()),
                }
            ),
            tmp_path / "supplier.parquet",
        )
        out = tpch_q15_top_supplier(str(tmp_path))
        assert list(out["s_suppkey"]) == [1, 2]  # BOTH tied winners, verbatim rule
        assert set(out["total_revenue_e2"]) == {20_000}

    def test_q13_includes_zero_order_customers(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q13_customer_distribution,
        )

        out = tpch_q13_customer_distribution(SF)
        con = duckdb.connect()
        total = con.execute(
            f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
        ).fetchone()[0]
        assert int(out["custdist"].sum()) == total  # every customer in exactly one bucket
        zero = con.execute(
            f"""SELECT count(*) FROM read_parquet('{SF}/customer.parquet') c
                WHERE c.c_custkey NOT IN
                  (SELECT o_custkey FROM read_parquet('{SF}/orders.parquet'))"""
        ).fetchone()[0]
        got_zero = out.loc[out["c_count"] == 0, "custdist"]
        assert (int(got_zero.iloc[0]) if len(got_zero) else 0) == zero


class TestTpchFinalFour:
    """X119-X122: Q8 market share, Q17 exact-integer threshold, Q19
    disjunctive scan, Q22 recency anti-join. Value parity is in the
    blanket loop; these pin structure and edge rules."""

    def test_q8_share_bounds_and_grid(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q8_market_share,
        )

        out = tpch_q8_market_share(SF)
        assert set(out["o_year"]) <= {1995, 1996}
        assert (out["mkt_share"] >= 0.0).all() and (out["mkt_share"] <= 1.0).all()
        assert (out["nation_e2"] <= out["total_e2"]).all()

    def test_q17_integer_threshold_on_fixture(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            Q17_BRAND,
            tpch_q17_small_quantity,
        )

        # part 1: qties 1, 1, 10 -> avg 4, 0.2*avg = 0.8 -> nothing below
        # part 2: qties 1, 9, 10 -> avg 20/3, 0.2*avg = 4/3 -> the 1 row
        # qualifies (exact rule: 100*3*5=1500 < 2000)
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
                    "p_brand": pa.array([Q17_BRAND, Q17_BRAND, "Brand#9"]),
                }
            ),
            tmp_path / "part.parquet",
        )
        rows = []
        for pk, q in [(1, 1.0), (1, 1.0), (1, 10.0), (2, 1.0), (2, 9.0), (2, 10.0), (3, 1.0)]:
            rows.append(dict(l_partkey=pk, l_quantity=q, l_extendedprice=70.0))
        schema = pa.schema(
            [
                ("l_partkey", pa.int64()), ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        out = tpch_q17_small_quantity(str(tmp_path))
        assert int(out["n_small"].iloc[0]) == 1
        assert int(out["total_e2"].iloc[0]) == 7000
        assert float(out["avg_yearly"].iloc[0]) == 10.0

    def test_q19_known_disjuncts(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q19_disjunctive_revenue,
        )

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
                    "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#1"]),
                    "p_size": pa.array([3, 8, 40], type=pa.int64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        rows = [
            dict(l_partkey=1, l_quantity=5.0, l_extendedprice=100.0, l_discount=0.0),   # in (d1)
            dict(l_partkey=1, l_quantity=20.0, l_extendedprice=100.0, l_discount=0.0),  # qty out
            dict(l_partkey=2, l_quantity=15.0, l_extendedprice=50.0, l_discount=0.0),   # in (d2)
            dict(l_partkey=3, l_quantity=5.0, l_extendedprice=100.0, l_discount=0.0),   # size out
        ]
        schema = pa.schema(
            [
                ("l_partkey", pa.int64()), ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        out = tpch_q19_disjunctive_revenue(str(tmp_path))
        assert int(out["revenue_e2"].iloc[0]) == 15_000
        assert int(out["n_lines"].iloc[0]) == 2

    def test_q22_anti_join_rules_on_fixture(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q22_global_sales_opportunity,
        )

        # balances: 100, 200, 300, -50 -> positive avg = 200; "rich" = >200
        # cust 3 (300): no recent order -> the one winner
        # cust 4 (300): recent order -> excluded by the anti-join
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                    "c_nationkey": pa.array([7, 7, 7, 7, 8], type=pa.int64()),
                    "c_acctbal": pa.array([100.0, 200.0, 300.0, 300.0, -50.0]),
                }
            ),
            tmp_path / "customer.parquet",
        )
        old, new = dt.datetime(1999, 1, 1), dt.datetime(2000, 6, 1)
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([3, 4], type=pa.int64()),
                    "o_orderdate": pa.array([old, new], type=pa.timestamp("us")),
                }
            ),
            tmp_path / "orders.parquet",
        )
        out = tpch_q22_global_sales_opportunity(str(tmp_path))
        assert len(out) == 1
        assert int(out["c_nationkey"].iloc[0]) == 7
        assert int(out["numcust"].iloc[0]) == 1
        assert int(out["totacctbal_e2"].iloc[0]) == 30_000

    def test_final_four_ceilings(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.tpchx import (
            tpch_q8_market_share,
            tpch_q17_small_quantity,
            tpch_q19_disjunctive_revenue,
        )

        for fn in (tpch_q8_market_share, tpch_q17_small_quantity,
                   tpch_q19_disjunctive_revenue):
            with pytest.raises(ValueError, match="broadcast ceiling.*co-partition"):
                fn(SF, max_broadcast_keys=10)


class TestSkylineAndCoverage:
    """X123 2-D skyline (kernel invariants, dominance fixture, cap) and
    X124 interval-union coverage (island rules, NULL exclusion). Value
    parity vs DuckDB is in the blanket loop."""

    def test_skyline_kernel_fixture(self):
        import numpy as np

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pareto import _skyline_kernel

        # rows: (key, price, date)
        # A (1, 100, 10): on front
        # B (2, 100, 10): duplicate of A -> co-survives
        # C (3, 100, 11): same price, later date -> dominated by A
        # D (4, 90, 5): cheaper but earlier -> on front
        # E (5, 80, 7): dominated by D (90>=80? no wait 90>80 and 5<7 -> dominated)
        # F (6, 120, 20): highest price -> on front despite late date
        keys = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
        price = np.array([100, 100, 100, 90, 80, 120], dtype=np.int64)
        date = np.array([10, 10, 11, 5, 7, 20], dtype=np.int64)
        keep = _skyline_kernel(keys, price, date)
        assert set(keys[keep]) == {1, 2, 4, 6}

    def test_skyline_matches_brute_force(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pareto import (
            orders_price_date_skyline,
        )

        out = orders_price_date_skyline(SF)
        con = duckdb.connect()
        gold = con.execute(
            f"""
            WITH s AS (SELECT o_orderkey,
                              CAST(round(o_totalprice*100,0) AS BIGINT) AS p,
                              o_orderdate AS d
                       FROM read_parquet('{SF}/orders.parquet')
                       WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL)
            SELECT a.o_orderkey FROM s a
            WHERE NOT EXISTS (SELECT 1 FROM s b WHERE b.p >= a.p AND b.d <= a.d
                              AND (b.p > a.p OR b.d < a.d))
            ORDER BY 1
            """
        ).df()
        assert list(out["o_orderkey"]) == list(gold["o_orderkey"])

    def test_skyline_cap_raises_loud(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pareto import (
            orders_price_date_skyline,
        )

        with pytest.raises(ValueError, match="candidate rows.*paginate"):
            orders_price_date_skyline(SF, max_candidates=1)

    def test_coverage_islands_fixture(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.intervals import (
            COVERAGE_WINDOW_SEC,
            USER_INTERVAL_COVERAGE_SQL,
            user_interval_coverage,
        )

        base = dt.datetime(2000, 1, 1)
        W = COVERAGE_WINDOW_SEC

        def ev(uid, sec):
            return dict(
                event_id=1, ts=base + dt.timedelta(seconds=sec), user_id=uid,
                event_type="view", value=1.0, props="{}",
            )

        rows = [
            # u1: events at 0 and 100 overlap (window 300) -> one island
            #     covering [0, 400); event at 1000 -> second island [1000, 1300)
            ev(1, 0), ev(1, 100), ev(1, 1000),
            # u2: touching windows (0 and 300) merge -> one island [0, 600)
            ev(2, 0), ev(2, 300),
            # NULL user and NULL ts excluded
            dict(event_id=2, ts=base, user_id=None, event_type="x", value=0.0, props="{}"),
            dict(event_id=3, ts=None, user_id=9, event_type="x", value=0.0, props="{}"),
        ]
        schema = pa.schema(
            [
                ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()), ("event_type", pa.string()),
                ("value", pa.float64()), ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "events.parquet")
        out = user_interval_coverage(str(tmp_path)).to_pandas().set_index("user_id")
        assert int(out.loc[1, "n_islands"]) == 2
        assert int(out.loc[1, "covered_us"]) == (400 + 300) * 1_000_000
        assert int(out.loc[2, "n_islands"]) == 1
        assert int(out.loc[2, "covered_us"]) == 600 * 1_000_000
        assert set(out.index) == {1, 2}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(USER_INTERVAL_COVERAGE_SQL).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestRegressionByFlag:
    """X125 grouped OLS: known-value fixture + zero-variance exclusion.
    Value parity vs DuckDB is in the blanket loop."""

    def test_known_fit_and_zero_variance(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            lineitem_regression_by_flag,
        )

        rows = [
            # flag A: y = 2x + 1 exactly -> slope 2, intercept 1
            dict(l_returnflag="A", l_quantity=1.0, l_extendedprice=3.0),
            dict(l_returnflag="A", l_quantity=2.0, l_extendedprice=5.0),
            dict(l_returnflag="A", l_quantity=3.0, l_extendedprice=7.0),
            # flag B: constant x -> zero variance, excluded
            dict(l_returnflag="B", l_quantity=4.0, l_extendedprice=1.0),
            dict(l_returnflag="B", l_quantity=4.0, l_extendedprice=9.0),
        ]
        schema = pa.schema(
            [
                ("l_returnflag", pa.string()), ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        out = lineitem_regression_by_flag(str(tmp_path))
        assert list(out["l_returnflag"]) == ["A"]
        assert int(out["slope_e6"].iloc[0]) == 2_000_000
        assert int(out["intercept_e6"].iloc[0]) == 1_000_000


class TestEmbDimensionStats:
    """X126 per-dimension quantization calibration: NULL element/row and
    ragged-list exclusion on a fixture. Value parity is in the blanket
    loop."""

    def test_null_and_ragged_rules(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pca import (
            EMB_DIM,
            EMB_DIMENSION_STATS_SQL,
            emb_dimension_stats,
        )

        good1 = [float(i) for i in range(EMB_DIM)]
        good2 = [float(-i) for i in range(EMB_DIM)]
        with_null_elem = [1.0] + [None] * (EMB_DIM - 1)
        ragged = [1.0, 2.0]
        t = pa.table(
            {
                "vec_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "embedding": pa.array(
                    [good1, good2, with_null_elem, ragged, None],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0, 0, 0, 0], type=pa.int32()),
            }
        )
        pq.write_table(t, tmp_path / "embeddings.parquet")
        out = emb_dimension_stats(str(tmp_path)).set_index("dim")
        assert len(out) == EMB_DIM
        # dim 1: values {0, -0, 1} -> min 0/-0 max 1; NULL element counted out
        assert int(out.loc[1, "n"]) == 3
        assert int(out.loc[2, "n"]) == 2  # null element skipped
        assert int(out.loc[2, "min_e9"]) == -1_000_000_000
        assert int(out.loc[2, "max_e9"]) == 1_000_000_000
        # int8 step: ceil(2e9 / 255)
        assert int(out.loc[2, "scale_e9"]) == -(-2_000_000_000 // 255)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
        )
        gold = con.execute(EMB_DIMENSION_STATS_SQL).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestLateArrivals:
    """X127 watermark accounting: known out-of-order fixture with exact
    lateness; NULL exclusion. Value parity is in the blanket loop."""

    def test_known_lateness(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            events_late_arrivals,
        )

        base = dt.datetime(2000, 1, 1)

        def ev(eid, uid, sec, typ):
            return dict(
                event_id=eid, ts=base + dt.timedelta(seconds=sec), user_id=uid,
                event_type=typ, value=1.0, props="{}",
            )

        rows = [
            # u1 ingestion order (event_id): ts 100, 50 (late by 50s), 200
            ev(1, 1, 100, "view"), ev(2, 1, 50, "view"), ev(3, 1, 200, "click"),
            # u2: monotone -> nothing late
            ev(4, 2, 10, "view"), ev(5, 2, 20, "view"),
            # NULL ts excluded
            dict(event_id=6, ts=None, user_id=1, event_type="view", value=0.0, props="{}"),
        ]
        schema = pa.schema(
            [
                ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()), ("event_type", pa.string()),
                ("value", pa.float64()), ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "events.parquet")
        out = events_late_arrivals(str(tmp_path)).set_index("event_type")
        assert int(out.loc["view", "n_events"]) == 4
        assert int(out.loc["view", "n_late"]) == 1
        assert int(out.loc["view", "max_lateness_us"]) == 50 * 1_000_000
        assert int(out.loc["click", "n_late"]) == 0


class TestUserGrowthAccounting:
    """X128 growth curve: first-seen dedup across hours and the running
    total on a fixture. Value parity is in the blanket loop."""

    def test_first_seen_and_cumsum(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            user_growth_accounting,
        )

        base = dt.datetime(2000, 1, 1)

        def ev(eid, uid, hours):
            return dict(
                event_id=eid, ts=base + dt.timedelta(hours=hours), user_id=uid,
                event_type="view", value=1.0, props="{}",
            )

        rows = [
            ev(1, 1, 0.1), ev(2, 1, 5.0),   # u1 first in hour 0; later event ignored
            ev(3, 2, 0.9),                   # u2 also hour 0
            ev(4, 3, 2.5),                   # u3 hour 2
            dict(event_id=5, ts=None, user_id=4, event_type="x", value=0.0, props="{}"),
        ]
        schema = pa.schema(
            [
                ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()), ("event_type", pa.string()),
                ("value", pa.float64()), ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "events.parquet")
        out = user_growth_accounting(str(tmp_path))
        assert list(out["new_users"]) == [2, 1]
        assert list(out["cumulative_users"]) == [2, 3]
        assert out["hour"].iloc[1] - out["hour"].iloc[0] == 2


class TestBasketPartPairs:
    """X129 market-basket support counts: duplicate-line dedup, complete
    in-basket fan-out, threshold pruning, and the (support DESC, a, b)
    tie order on a fixture. Value parity is in the blanket loop."""

    def test_supports_and_order(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.baskets import (
            basket_part_pairs,
        )

        def li(ok, pk, ln):
            return dict(
                l_orderkey=ok, l_partkey=pk, l_suppkey=1, l_linenumber=ln,
                l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0,
                l_tax=0.0, l_returnflag="N", l_linestatus="O", l_shipdate=None,
            )

        rows = [
            # order 1: parts {10, 20, 30} → pairs (10,20) (10,30) (20,30);
            # part 10 appears on TWO lines — distinct-order support counts it once
            li(1, 10, 1), li(1, 10, 2), li(1, 20, 3), li(1, 30, 4),
            # order 2: {10, 20} → (10,20) again → support 2
            li(2, 20, 1), li(2, 10, 2),
            # order 3: {20, 30} → (20,30) again → support 2
            li(3, 30, 1), li(3, 20, 2),
            # order 4: singleton basket → no pairs
            li(4, 40, 1),
            # NULL keys are excluded before pairing
            li(5, None, 1), li(None, 50, 1), li(5, 60, 2), li(5, 70, 3),
        ]
        schema = pa.schema(
            [
                ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        out = basket_part_pairs(str(tmp_path))
        # threshold MIN_SUPPORT=2 prunes (10,30) and order 5's (60,70)
        assert list(out.itertuples(index=False, name=None)) == [
            (10, 20, 2),
            (20, 30, 2),
        ]

    def test_wide_basket_fanout(self, ray_session, tmp_path):
        """A 5-part basket replicated twice: all C(5,2)=10 pairs at
        support 2 — pins the vectorized fan-out index arithmetic."""
        import itertools

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.baskets import (
            basket_part_pairs,
        )

        rows = []
        for ok in (1, 2):
            for i, pk in enumerate([3, 1, 4, 5, 2]):  # unsorted input order
                rows.append(
                    dict(
                        l_orderkey=ok, l_partkey=pk, l_suppkey=1,
                        l_linenumber=i + 1, l_quantity=1.0,
                        l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                        l_returnflag="N", l_linestatus="O", l_shipdate=None,
                    )
                )
        schema = pa.schema(
            [
                ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "lineitem.parquet")
        out = basket_part_pairs(str(tmp_path))
        expect = sorted(itertools.combinations([1, 2, 3, 4, 5], 2))
        assert list(out[["part_a", "part_b"]].itertuples(index=False, name=None)) == expect
        assert (out["n_orders"] == 2).all()


class TestVocabularyGrowth:
    """X130 Heaps curve: global first-occurrence min across blocks, the
    equal-width bucket rule, the cumulative sum, and the footer-less
    min/max fallback. Value parity is in the blanket loop."""

    @staticmethod
    def _docs(rows, tmp_path, stats=True):
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                ("doc_id", pa.int64()), ("text", pa.string()),
                ("lang", pa.string()), ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        )
        pq.write_table(
            pa.Table.from_pylist(rows, schema=schema),
            tmp_path / "documents.parquet",
            write_statistics=stats,
        )

    def test_curve_and_buckets(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            vocabulary_growth,
        )

        def d(i, text):
            return dict(doc_id=i, text=text, lang="en", source="s", n_chars=len(text))

        rows = [
            d(0, "a b c d"),          # shingles "a b c", "b c d" first at id 0
            d(15, "a b c x y z"),     # "a b c" already seen; 3 new at id 15
            d(31, "a b c"),           # nothing new in the last bucket
            d(16, "short one"),       # <3 tokens → whole-text shingle at id 16
            dict(doc_id=None, text="n u l l", lang="en", source="s", n_chars=7),
        ]
        self._docs(rows, tmp_path)
        out = vocabulary_growth(str(tmp_path))
        # span = 32, 16 buckets → width 2: id 0→b0, 15→b7, 16→b8, 31→b15
        assert list(out["bucket"]) == [0, 7, 8]
        assert list(out["new_tokens"]) == [2, 3, 1]
        assert list(out["vocab_size"]) == [2, 5, 6]

    def test_footerless_fallback_and_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            vocabulary_growth,
        )

        self._docs(
            [dict(doc_id=4, text="p q r", lang="en", source="s", n_chars=5)],
            tmp_path,
            stats=False,
        )
        out = vocabulary_growth(str(tmp_path))
        assert list(out.itertuples(index=False, name=None)) == [(0, 1, 1)]

        self._docs([], tmp_path)
        out2 = vocabulary_growth(str(tmp_path))
        assert len(out2) == 0
        assert list(out2.columns) == ["bucket", "new_tokens", "vocab_size"]


class TestOrdersDailyAutocorrelation:
    """X131 ACF: dense-grid zero fill, the exact centered-integer ratio,
    and the degenerate-series rules. Value parity is in the blanket loop."""

    @staticmethod
    def _orders(days, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = dt.datetime(2000, 1, 1)
        rows = [
            dict(
                o_orderkey=i, o_custkey=1, o_orderstatus="O",
                o_totalprice=1.0,
                o_orderdate=None if d is None else base + dt.timedelta(days=d),
                o_orderpriority="1-URGENT",
            )
            for i, d in enumerate(days)
        ]
        schema = pa.schema(
            [
                ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "orders.parquet")

    def test_alternating_series(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_daily_autocorrelation,
        )

        # grid days 0..4 with counts [2,0,2,0,2] (days 1,3 absent →
        # zero-filled); N=5, S=6, c = 5x−6 = [4,−6,4,−6,4], den = 120:
        # r1 = −96/120, r2 = 68/120, r3 = −48/120, r4 = 16/120
        self._orders([0, 0, 2, 2, 4, 4, None], tmp_path)
        out = orders_daily_autocorrelation(str(tmp_path)).set_index("lag")
        import math

        assert int(out.loc[1, "r_e6"]) == math.floor(-96 / 120 * 1e6 + 0.5)
        assert int(out.loc[2, "r_e6"]) == math.floor(68 / 120 * 1e6 + 0.5)
        assert int(out.loc[3, "r_e6"]) == math.floor(-48 / 120 * 1e6 + 0.5)
        # lags ≥ the 5-day grid length emit no row
        assert set(out.index) == {1, 2, 3, 4}

    def test_degenerate_series(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_daily_autocorrelation,
        )

        # constant series (one order every day) → zero variance → no rows
        self._orders([0, 1, 2, 3], tmp_path)
        assert len(orders_daily_autocorrelation(str(tmp_path))) == 0
        # single day → no rows; all-NULL dates → no rows
        self._orders([5, 5, 5], tmp_path)
        assert len(orders_daily_autocorrelation(str(tmp_path))) == 0
        self._orders([None, None], tmp_path)
        assert len(orders_daily_autocorrelation(str(tmp_path))) == 0


class TestOrdersPriceQuintile:
    """X132 global ntile by counting: remainder rule, cross-bin ranks,
    tie order, NULL exclusion, and the single-value degenerate bin.
    Value parity is in the blanket loop."""

    @staticmethod
    def _orders(prices, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [
            dict(
                o_orderkey=i + 1, o_custkey=1, o_orderstatus="O",
                o_totalprice=p, o_orderdate=None, o_orderpriority="1-URGENT",
            )
            for i, p in enumerate(prices)
        ]
        schema = pa.schema(
            [
                ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "orders.parquet")

    def test_remainder_rule_and_ties(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            orders_price_quintile,
        )

        # 7 non-null prices, K=5 → tile sizes [2,2,1,1,1] in rank order;
        # two ties at 10.0 break by orderkey (keys 2 then 5)
        self._orders([30.0, 10.0, 20.0, None, 10.0, 50.0, 40.0, 15.0], tmp_path)
        out = (
            orders_price_quintile(str(tmp_path))
            .to_pandas()
            .set_index("o_orderkey")["tile"]
        )
        # rank order: k2(10), k5(10), k8(15), k3(20), k1(30), k7(40), k6(50)
        assert out.to_dict() == {2: 1, 5: 1, 8: 2, 3: 2, 1: 3, 7: 4, 6: 5}

    def test_single_value_and_all_null(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            orders_price_quintile,
        )

        # one distinct price → span 0 → one bin; ranks purely by key
        self._orders([7.0] * 6, tmp_path)
        out = (
            orders_price_quintile(str(tmp_path))
            .to_pandas()
            .sort_values("o_orderkey")
        )
        assert list(out["tile"]) == [1, 1, 2, 3, 4, 5]
        self._orders([None, None], tmp_path)
        assert orders_price_quintile(str(tmp_path)).count() == 0


class TestCustomerRfmSegments:
    """X133 RFM: per-customer metric fold, three independent global
    quintile ranks, the segment code, and NULL exclusion. Value parity is
    in the blanket loop."""

    def test_tiles_and_code(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            customer_rfm_segments,
        )

        base = dt.datetime(2020, 1, 1)
        rows = []

        def o(key, cust, day, price):
            rows.append(
                dict(
                    o_orderkey=key, o_custkey=cust, o_orderstatus="O",
                    o_totalprice=price,
                    o_orderdate=None if day is None else base + dt.timedelta(days=day),
                    o_orderpriority="1-URGENT",
                )
            )

        # 5 customers → quintile == rank+1 on each metric.
        # cust 1: 3 orders, last day 10, total 30.00  → F rank high
        o(1, 1, 1, 10.0); o(2, 1, 5, 10.0); o(3, 1, 10, 10.0)
        # cust 2: 1 order, day 50, total 500.00       → R,M top; F bottom (tie, key order)
        o(4, 2, 50, 500.0)
        # cust 3: 2 orders, last day 20, total 2.00
        o(5, 3, 2, 1.0); o(6, 3, 20, 1.0)
        # cust 4: 1 order, day 30, total 100.00
        o(7, 4, 30, 100.0)
        # cust 5: 2 orders, last day 40, total 60.00
        o(8, 5, 35, 30.0); o(9, 5, 40, 30.0)
        # excluded rows: NULL custkey / date / price
        o(10, None, 3, 9.0); o(11, 1, None, 9.0)
        rows.append(
            dict(
                o_orderkey=12, o_custkey=1, o_orderstatus="O",
                o_totalprice=None, o_orderdate=base, o_orderpriority="1-URGENT",
            )
        )
        schema = pa.schema(
            [
                ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "orders.parquet")
        out = (
            customer_rfm_segments(str(tmp_path))
            .to_pandas()
            .set_index("o_custkey")
            .sort_index()
        )
        # recency_day:  c1=10 c2=50 c3=20 c4=30 c5=40 → ranks 1,5,2,3,4
        # frequency:    c1=3  c2=1  c3=2  c4=1  c5=2  → (f, cust) order
        #               c2,c4,c3,c5,c1 → tiles per cust = [5,1,3,2,4]
        # monetary:     c1=30 c2=500 c3=2 c4=100 c5=60 → ranks 2,5,1,4,3
        assert list(out["r_tile"]) == [1, 5, 2, 3, 4]
        assert list(out["f_tile"]) == [5, 1, 3, 2, 4]
        assert list(out["m_tile"]) == [2, 5, 1, 4, 3]
        assert out.loc[2, "rfm"] == "515"
        assert len(out) == 5


class TestLineitemBenford:
    """X134 Benford leading-digit profile: exact cent quantization, the
    int64 power-table digit extraction across 1..16-digit magnitudes,
    non-positive/NULL exclusion, and the e6 fixed-point frequency
    contract vs the DuckDB substr oracle."""

    @staticmethod
    def _lineitem(prices, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"l_extendedprice": pa.array(prices, type=pa.float64())}),
            tmp_path / "lineitem.parquet",
        )

    def test_planted_digits_and_exclusions(self, ray_session, tmp_path):
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            lineitem_benford_digits,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # cents: 1 (1 digit), 95, 950, 31_415, 2^44-ish 14-digit, plus
        # excluded rows: NULL, negative, and 0.004 -> floor(0.9) = 0.
        prices = [
            0.01,            # cents 1  -> digit 1
            0.95,            # cents 95 -> digit 9
            9.5,             # cents 950 -> digit 9
            314.15,          # cents 31415 -> digit 3
            123456789012.34, # cents 12345678901234 -> digit 1
            None,
            -5.0,            # cents -500 -> excluded
            0.004,           # cents 0 -> excluded
        ]
        self._lineitem(prices, tmp_path)
        out = lineitem_benford_digits(str(tmp_path)).set_index("digit")
        assert dict(out["n"]) == {1: 2, 3: 1, 9: 2}
        assert int(out.loc[1, "freq_e6"]) == math.floor(2 / 5 * 1e6 + 0.5)
        assert int(out.loc[9, "benford_e6"]) == math.floor(
            math.log10(1 + 1 / 9) * 1e6 + 0.5
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["lineitem_benford_digits"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_empty_and_all_excluded(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            lineitem_benford_digits,
        )

        self._lineitem([None, -1.0, 0.0], tmp_path)
        assert len(lineitem_benford_digits(str(tmp_path))) == 0


class TestOrdersShipDelayProfile:
    """X135 fulfillment-delay profile: the co-partition join, exact
    counting-quantile rule at the cum >= q*n boundary, negative-delay
    integrity counter, NULL/orphan exclusion, and the e6 mean contract."""

    @staticmethod
    def _tables(tmp_path, orders, lines):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                    "o_custkey": pa.array([1] * len(orders), pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
                    "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
                    "o_orderdate": pa.array([o[1] for o in orders], pa.timestamp("us")),
                    "o_orderpriority": pa.array([o[2] for o in orders], pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
                    "l_shipdate": pa.array([l[1] for l in lines], pa.timestamp("us")),
                }
            ),
            tmp_path / "lineitem.parquet",
        )

    def test_quantile_boundary_and_neg_counter(self, ray_session, tmp_path):
        import datetime as dt
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_ship_delay_profile,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        d0 = dt.datetime(2020, 1, 1)

        def day(k):
            return d0 + dt.timedelta(days=k)

        # priority U: delays [-2, 0, 1, 1, 3, 10] (n=6, cum 1,2,4,5,6):
        #   p50: cum >= 3.0 -> delay 1 (cum 4); p90: cum >= 5.4 -> 10
        #   (delay 3's cum is only 5); p99: cum >= 5.94 -> 10
        #   neg_n = 1; mean = 13/6
        # priority L: one line, delay 5 -> all quantiles 5
        orders = [
            (1, day(0), "U"), (2, day(10), "U"), (3, day(100), "L"),
            (4, day(0), None),   # NULL priority: excluded
            (5, None, "U"),      # NULL order date: excluded
            (6, day(0), "U"),    # order with no lines: no row
        ]
        lines = [
            (1, day(-2)), (1, day(0)), (1, day(1)), (1, day(1)), (1, day(3)),
            (2, day(20)),            # delay 10
            (3, day(105)),           # L delay 5
            (4, day(1)), (5, day(1)),  # parents excluded
            (9, day(7)),             # orphan line: dropped
            (2, None),               # NULL shipdate: excluded
        ]
        self._tables(tmp_path, orders, lines)
        out = orders_ship_delay_profile(str(tmp_path)).set_index("o_orderpriority")
        assert set(out.index) == {"U", "L"}
        u = out.loc["U"]
        assert (int(u["n"]), int(u["neg_n"])) == (6, 1)
        assert (int(u["p50"]), int(u["p90"]), int(u["p99"])) == (1, 10, 10)
        assert (int(u["min_delay"]), int(u["max_delay"])) == (-2, 10)
        assert int(u["mean_e6"]) == math.floor(13 / 6 * 1e6 + 0.5)
        l = out.loc["L"]
        assert (int(l["p50"]), int(l["p99"]), int(l["n"])) == (5, 5, 1)
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORACLE_SQL["orders_ship_delay_profile"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_empty_inputs(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_ship_delay_profile,
        )

        self._tables(tmp_path, [(1, None, "U")], [(1, None)])
        assert len(orders_ship_delay_profile(str(tmp_path))) == 0


class TestLineitemSpearman:
    """X136 grouped Spearman: exact average-rank tie handling through the
    counting-rank exchange, perfect monotone (nonlinear) = +/-1e6,
    zero-variance exclusion, NULL exclusion, DuckDB doubled-rank parity."""

    @staticmethod
    def _lineitem(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                    "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
                    "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )

    def test_ties_monotone_and_exclusions(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            lineitem_spearman_by_flag,
        )

        rows = []
        # flag T: x=[1,1,2,3], y=[10,20,20,30] -> doubled ranks
        # rx=[3,3,6,8], ry=[2,5,5,8]; rho = 60/72 -> 833333
        rows += [("T", 1.0, 10.0), ("T", 1.0, 20.0), ("T", 2.0, 20.0), ("T", 3.0, 30.0)]
        # flag M: y = x^3 (nonlinear, strictly monotone) -> exactly 1e6
        rows += [("M", float(i), float(i) ** 3) for i in range(1, 8)]
        # flag D: strictly decreasing -> exactly -1e6
        rows += [("D", float(i), float(100 - i)) for i in range(1, 6)]
        # flag Z: constant y -> zero rank variance -> excluded
        rows += [("Z", 1.0, 5.0), ("Z", 2.0, 5.0)]
        # NULLs excluded everywhere
        rows += [(None, 1.0, 1.0), ("T", None, 1.0), ("T", 1.0, None)]
        self._lineitem(rows, tmp_path)
        out = lineitem_spearman_by_flag(str(tmp_path)).set_index("l_returnflag")
        assert set(out.index) == {"T", "M", "D"}
        assert int(out.loc["T", "spearman_e6"]) == 833333
        assert int(out.loc["M", "spearman_e6"]) == 1_000_000
        assert int(out.loc["D", "spearman_e6"]) == -1_000_000
        assert int(out.loc["T", "n"]) == 4
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["lineitem_spearman_by_flag"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_all_excluded(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            lineitem_spearman_by_flag,
        )

        self._lineitem([("Z", 1.0, 5.0), ("Z", 2.0, 5.0), (None, 1.0, 1.0)], tmp_path)
        assert len(lineitem_spearman_by_flag(str(tmp_path))) == 0


class TestSourceVocabOverlap:
    """X137 pairwise source-vocabulary Jaccard: exact intersection via the
    bitmask fold, zero-vocab source pairing, short-doc single-shingle rule,
    NULL exclusion, and the all-empty-union exclusion."""

    @staticmethod
    def _docs(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "source": pa.array([r[0] for r in rows], pa.string()),
                    "n_chars": pa.array([0] * len(rows), pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )

    def test_planted_overlap(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            source_vocab_overlap,
        )

        # source A vocab: {a b c, b c d} (two trigrams), B: {b c d, x y z},
        # C: single short doc -> one sub-3-word shingle {"hi"}, D: empty text
        # (zero vocab), NULL source excluded.
        rows = [
            ("A", "a b c d"),          # shingles: "a b c", "b c d"
            ("B", "b c d"),            # exactly one trigram "b c d"
            ("B", "x y z"),
            ("C", "hi"),
            ("D", ""),
            (None, "a b c d"),
        ]
        self._docs(rows, tmp_path)
        out = source_vocab_overlap(str(tmp_path)).set_index(["source_a", "source_b"])
        ab = out.loc[("A", "B")]
        assert (int(ab["vocab_a"]), int(ab["vocab_b"])) == (2, 2)
        assert (int(ab["inter_n"]), int(ab["union_n"])) == (1, 3)
        assert int(ab["jaccard_e6"]) == 333333
        ad = out.loc[("A", "D")]
        assert (int(ad["vocab_b"]), int(ad["inter_n"]), int(ad["jaccard_e6"])) == (0, 0, 0)
        # every pair except those with union 0: D-D impossible; all 6 pairs present
        assert len(out) == 6
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["source_vocab_overlap"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_single_source_and_all_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            source_vocab_overlap,
        )

        self._docs([("A", "a b c")], tmp_path)
        assert len(source_vocab_overlap(str(tmp_path))) == 0
        self._docs([("A", ""), ("B", "")], tmp_path)
        assert len(source_vocab_overlap(str(tmp_path))) == 0


class TestEventsTypeHourMI:
    """X138 mutual information: independence -> exactly 0, deterministic
    dependence -> MI == min marginal entropy, NULL exclusion, empty-input
    NULL row, DuckDB per-cell e9 parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_independent_and_deterministic(self, ray_session, tmp_path):
        import datetime as dt
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            events_type_hour_mi,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        d0 = dt.datetime(2020, 1, 1)

        def at(h):
            return d0 + dt.timedelta(hours=h)

        # independent: every (type, hour) cell equal -> every cell term
        # ln(1) = 0 -> mi exactly 0
        rows = [(at(h), t) for h in (1, 2) for t in ("a", "b") for _ in range(3)]
        rows += [(None, "a"), (at(1), None)]
        self._events(rows, tmp_path)
        out = events_type_hour_mi(str(tmp_path)).to_pandas().iloc[0]
        assert int(out["mi_e9"]) == 0
        assert int(out["n_obs"]) == 12
        # uniform 2-way marginals: H = ln 2, quantized per the shared rule
        half = math.floor(-0.5 * math.log(0.5) * 1e9 + 0.5)
        assert int(out["ht_e9"]) == 2 * half
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_type_hour_mi"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)

        # deterministic: hour fixes the type -> MI == H(type) == H(hour)
        rows = [(at(1), "a")] * 4 + [(at(2), "b")] * 4
        self._events(rows, tmp_path)
        out = events_type_hour_mi(str(tmp_path)).to_pandas().iloc[0]
        assert int(out["mi_e9"]) == int(out["ht_e9"]) == int(out["hh_e9"]) == 2 * half

    def test_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            events_type_hour_mi,
        )

        self._events([(None, "a")], tmp_path)
        out = events_type_hour_mi(str(tmp_path)).to_pandas().iloc[0]
        assert out["mi_e9"] is None or np.isnan(out["mi_e9"])
        assert int(out["n_types"]) == 0


class TestUserTwap:
    """X139 sessionized TWAP: hand-computed weighting, the session-gap
    exclusion, zero-duration intervals, tie ordering by event_id,
    zero-total-time exclusion, NULL exclusion, DuckDB lead() parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array(["view"] * len(rows), pa.string()),
                    "value": pa.array([r[3] for r in rows], pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_weighting_and_gap(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import user_twap

        d0 = dt.datetime(2020, 1, 1)

        def at(sec):
            return d0 + dt.timedelta(seconds=sec)

        rows = [
            # user 1: v=10 held 100s, v=30 held 300s, last value unheld;
            # TWAP = (10*100 + 30*300) / 400 = 25
            (1, at(0), 1, 10.0),
            (2, at(100), 1, 30.0),
            (3, at(400), 1, 99.0),
            # user 2: 40-minute gap ends the session -> that interval is
            # excluded; only the 60 s one counts -> TWAP = 7
            (4, at(0), 2, 7.0),
            (5, at(60), 2, 50.0),
            (6, at(60 + 2400), 2, 50.0),
            # user 3: same-ts tie ordered by event_id -> zero-duration
            # interval (weight 0) then 10 s of v=5 -> TWAP = 5
            (7, at(0), 3, 1.0),
            (8, at(0), 3, 5.0),
            (9, at(10), 3, 123.0),
            # user 4: single event -> no interval -> no row
            (10, at(0), 4, 1.0),
            # NULLs excluded
            (11, None, 1, 1.0), (12, at(5), None, 1.0), (13, at(6), 5, None),
        ]
        self._events(rows, tmp_path)
        out = user_twap(str(tmp_path)).to_pandas().set_index("user_id")
        assert set(out.index) == {1, 2, 3}
        assert int(out.loc[1, "twap_e6"]) == 25_000_000
        assert int(out.loc[1, "n_intervals"]) == 2
        assert int(out.loc[1, "total_dur_us"]) == 400_000_000
        assert int(out.loc[2, "twap_e6"]) == 7_000_000
        assert int(out.loc[2, "n_intervals"]) == 1
        assert int(out.loc[3, "twap_e6"]) == 5_000_000
        assert int(out.loc[3, "n_intervals"]) == 2  # zero-dur tie included
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["user_twap"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_zero_total_time_excluded(self, ray_session, tmp_path):
        import datetime as dt

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import user_twap

        d0 = dt.datetime(2020, 1, 1)
        # two events at the identical instant: one interval of zero
        # duration -> total time 0 -> user excluded
        self._events([(1, d0, 1, 1.0), (2, d0, 1, 2.0)], tmp_path)
        assert len(user_twap(str(tmp_path)).to_pandas()) == 0


class TestEventRunLengths:
    """X140 gaps-and-islands burstiness: run boundaries at type AND user
    changes, tie order by event_id, NULL pre-exclusion (a NULL row must
    NOT split a run), DuckDB islands parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_runs_and_null_bridging(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            event_run_lengths,
        )

        d0 = dt.datetime(2020, 1, 1)

        def at(s):
            return d0 + dt.timedelta(seconds=s)

        rows = [
            # user 1: a a a | b | a a  -> runs a:3, b:1, a:2
            (1, at(0), 1, "a"), (2, at(1), 1, "a"), (3, at(2), 1, "a"),
            (4, at(3), 1, "b"), (5, at(4), 1, "a"), (6, at(5), 1, "a"),
            # a NULL-type row between the two a-runs of user 2 must NOT
            # split them (pre-exclusion): a a [null] a -> ONE run of 3
            (7, at(0), 2, "a"), (8, at(1), 2, "a"),
            (9, at(2), 2, None), (10, at(3), 2, "a"),
            # same type crossing users does NOT merge: user 3 then 4
            (11, at(9), 3, "b"), (12, at(9), 4, "b"),
            # tie at same ts ordered by event_id: b(13) a(14) -> two runs
            (13, at(20), 5, "b"), (14, at(20), 5, "a"),
        ]
        self._events(rows, tmp_path)
        out = event_run_lengths(str(tmp_path)).set_index("event_type")
        # a-runs: u1 [3, 2], u2 [3], u5 [1]  -> 4 runs, 9 events, max 3
        assert (int(out.loc["a", "n_runs"]), int(out.loc["a", "n_events"])) == (4, 9)
        assert int(out.loc["a", "max_run"]) == 3
        assert int(out.loc["a", "mean_run_e6"]) == 2_250_000
        # b-runs: u1 [1], u3 [1], u4 [1], u5 [1]
        assert (int(out.loc["b", "n_runs"]), int(out.loc["b", "max_run"])) == (4, 1)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["event_run_lengths"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            event_run_lengths,
        )

        self._events([(1, None, 1, "a")], tmp_path)
        assert len(event_run_lengths(str(tmp_path))) == 0


class TestEmbLabelSilhouette:
    """X141 simplified silhouette: well-separated planted clusters score
    ~+1, a label centered on another's centroid scores negative, the
    single-label empty rule, and DuckDB centroid/d2-chain parity."""

    @staticmethod
    def _emb(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(len(rows)), pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                    "label": pa.array([r[0] for r in rows], pa.int64()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )

    def test_planted_separation(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pca import (
            emb_label_silhouette,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        dim = 64

        def vec(axis, mag, jitter):
            v = [0.0] * dim
            v[axis] = mag + jitter
            return v

        rows = []
        # label 0 tight around +10 on axis 0; label 1 tight around +10 on
        # axis 1 -> both silhouettes near +1
        for j in (-0.1, 0.0, 0.1):
            rows.append((0, vec(0, 10.0, j)))
            rows.append((1, vec(1, 10.0, j)))
        # label 2's points sit exactly ON label 0's centroid -> a ~ 0,
        # own centroid is also there -> but jitter pulls its own centroid
        # away; make them split between label 0's area and far away ->
        # strongly negative for the near points
        rows.append((2, vec(0, 10.0, 0.0)))
        rows.append((2, vec(0, -30.0, 0.0)))
        self._emb(rows, tmp_path)
        out = emb_label_silhouette(str(tmp_path)).set_index("label")
        assert set(out.index) == {0, 1, 2}
        assert int(out.loc[0, "mean_sil_e6"]) > 900_000
        assert int(out.loc[1, "mean_sil_e6"]) > 900_000
        assert int(out.loc[2, "mean_sil_e6"]) < 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{tmp_path}/embeddings.parquet')"
        )
        gold = con.execute(ORACLE_SQL["emb_label_silhouette"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_single_label_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.pca import (
            emb_label_silhouette,
        )

        self._emb([(0, [1.0] * 64), (0, [2.0] * 64)], tmp_path)
        assert len(emb_label_silhouette(str(tmp_path))) == 0


class TestCustomerLtvCurve:
    """X142 LTV curve: bucket-0 anchoring at each customer's first order,
    30-day bucket edges, distinct-customer counts per tenure bucket, the
    cumulative sum, NULL exclusion, DuckDB window-min parity."""

    @staticmethod
    def _orders(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                    "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                    "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                    "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )

    def test_curve(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            customer_ltv_curve,
        )

        d0 = dt.datetime(2020, 1, 1)

        def at(days):
            return d0 + dt.timedelta(days=days)

        rows = [
            # cust 1: first at day 0 ($10), day 29 same bucket ($5),
            # day 30 -> bucket 1 ($20), day 65 -> bucket 2 ($1)
            (1, at(0), 10.0), (1, at(29), 5.0), (1, at(30), 20.0), (1, at(65), 1.0),
            # cust 2: first at day 100 -> ITS bucket 0 ($7); day 135 -> bucket 1 ($3)
            (2, at(100), 7.0), (2, at(135), 3.0),
            # NULLs excluded
            (None, at(0), 9.0), (3, None, 9.0), (3, at(0), None),
        ]
        self._orders(rows, tmp_path)
        out = customer_ltv_curve(str(tmp_path)).set_index("tenure_month")
        # cust 1 day0 = 2020-01-01: absolute bucket boundary is epoch-based,
        # so day 29 may or may not share cust 1's first bucket — derive
        # expectations the same way both engines do (trunc div)
        m0 = (at(0) - dt.datetime(1970, 1, 1)).days * 86400 * 10**6 // (30 * 86400 * 10**6)
        m29 = (at(29) - dt.datetime(1970, 1, 1)).days * 86400 * 10**6 // (30 * 86400 * 10**6)
        same = m29 == m0
        b0 = int(out.loc[0, "revenue_e2"])
        # cust1 bucket0 (+5 if day29 falls in it) + cust2 bucket0 = 10+7 (+5)
        assert b0 == (1000 + 700 + (500 if same else 0))
        assert int(out.loc[0, "n_customers"]) == 2
        assert int(out["cum_revenue_e2"].iloc[-1]) == int(out["revenue_e2"].sum())
        assert (out["cum_revenue_e2"].to_numpy() == out["revenue_e2"].cumsum().to_numpy()).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORACLE_SQL["customer_ltv_curve"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            customer_ltv_curve,
        )

        self._orders([(None, None, None)], tmp_path)
        assert len(customer_ltv_curve(str(tmp_path))) == 0


class TestOrdersTheil:
    """X143 Theil-T: equal values -> exactly 0, a hand-computed two-value
    split, zero-value terms, negative-row exclusion, zero-total group
    exclusion, DuckDB per-row e9 parity."""

    @staticmethod
    def _orders(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                    "o_custkey": pa.array([1] * len(rows), pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                    "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
                    "o_orderdate": pa.array([None] * len(rows), pa.timestamp("us")),
                    "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )

    def test_planted_inequality(self, ray_session, tmp_path):
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_theil_by_priority,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = [
            # E: perfectly equal -> T = 0
            ("E", 10.0), ("E", 10.0), ("E", 10.0),
            # U: one of [30, 10]: n=2, mean=20; terms r=1.5, r=0.5
            ("U", 30.0), ("U", 10.0),
            # Z: a zero among positives (0*ln0 -> 0 term, counts in n)
            ("Z", 0.0), ("Z", 10.0),
            # G: all zero -> sum 0 -> excluded
            ("G", 0.0), ("G", 0.0),
            # negative row excluded entirely
            ("U", -5.0),
            (None, 1.0), ("E", None),
        ]
        self._orders(rows, tmp_path)
        out = orders_theil_by_priority(str(tmp_path)).set_index("o_orderpriority")
        assert set(out.index) == {"E", "U", "Z"}
        assert int(out.loc["E", "theil_e9"]) == 0
        # U by hand: terms quantized e9 then averaged
        t1 = math.floor(1.5 * math.log(1.5) * 1e9 + 0.5)
        t2 = math.floor(0.5 * math.log(0.5) * 1e9 + 0.5)
        assert int(out.loc["U", "theil_e9"]) == math.floor((t1 + t2) / 2.0 + 0.5)
        assert int(out.loc["U", "n"]) == 2
        # Z: r for the 10 is 2.0 (n=2, mean 5), zero contributes 0
        tz = math.floor(2.0 * math.log(2.0) * 1e9 + 0.5)
        assert int(out.loc["Z", "theil_e9"]) == math.floor(tz / 2.0 + 0.5)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORACLE_SQL["orders_theil_by_priority"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_all_excluded(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_theil_by_priority,
        )

        self._orders([("G", 0.0), ("H", -1.0), (None, 5.0)], tmp_path)
        assert len(orders_theil_by_priority(str(tmp_path))) == 0


class TestSourceLengthMwu:
    """X144 Mann-Whitney drift: hand-computed doubled-U with ties, the
    tie-corrected z, shifted-distribution sign, single-source exclusion,
    all-tied exclusion, DuckDB doubled-rank parity."""

    @staticmethod
    def _docs(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), pa.int64()),
                    "text": pa.array([""] * len(rows), pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "source": pa.array([r[0] for r in rows], pa.string()),
                    "n_chars": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )

    def test_shift_and_ties(self, ray_session, tmp_path):
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            source_length_mwu,
        )

        # A = {1, 2, 2}, B = {2, 5, 9}: sorted [1,2,2,2,5,9]
        # doubled ranks: 1->2; each 2 -> 2*1+3+1 = 6; 5 -> 10; 9 -> 12
        # R_A x2 = 2+6+6 = 14 ; U_A x2 = 14 - 3*4 = 2
        # num_A = 2 - 9 = -7 ; T = 3^3-3 = 24 ; N=6
        # var factor a = 9 * (210 - 24) = 1674 ; b = 12*6*5 = 360
        rows = [("A", 1), ("A", 2), ("A", 2), ("B", 2), ("B", 5), ("B", 9)]
        self._docs(rows, tmp_path)
        out = source_length_mwu(str(tmp_path)).set_index("source")
        assert int(out.loc["A", "u_x2"]) == 2
        z = -7.0 / (2.0 * math.sqrt(1674.0 / 360.0))
        assert int(out.loc["A", "z_e6"]) == math.floor(z * 1e6 + 0.5)
        # B mirrors: R_B x2 = 6+10+12 = 28, U_B x2 = 28 - 12 = 16
        # (U_A + U_B doubled = 2*n1*n2 = 18 = 2 + 16)
        assert int(out.loc["B", "u_x2"]) == 16
        assert int(out.loc["B", "z_e6"]) == math.floor(-z * 1e6 + 0.5)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["source_length_mwu"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_degenerate(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            source_length_mwu,
        )

        # single source -> no counterpart -> empty
        self._docs([("A", 1), ("A", 2)], tmp_path)
        assert len(source_length_mwu(str(tmp_path))) == 0
        # every length identical -> zero rank variance -> empty
        self._docs([("A", 5), ("B", 5), ("C", 5)], tmp_path)
        assert len(source_length_mwu(str(tmp_path))) == 0


class TestEventsWeeklyDrift:
    """X145 W1 drift: identical weeks -> 0, a hand-computed mass shift,
    gap weeks breaking the chain, NULL-ts rows feeding the grid but not
    the histograms, degenerate domain -> 0, DuckDB dense-CDF parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array(["view"] * len(rows), pa.string()),
                    "value": pa.array([r[1] for r in rows], pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_shift_and_gap(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            W1_BINS,
            events_weekly_value_drift,
        )

        wk = dt.timedelta(days=7)
        w0 = dt.datetime(1970, 1, 1)  # epoch -> week 0 exactly

        rows = [
            # grid: values 0..100 (the NULL-ts row carries the max -> it
            # shapes the grid without entering any histogram)
            (None, 100.0),
            # week 0: all mass at 0 ; week 1: all mass at 50
            (w0, 0.0), (w0, 0.0),
            (w0 + wk, 50.0), (w0 + wk, 50.0),
            # week 2 == week 1 -> W1 exactly 0
            (w0 + 2 * wk, 50.0), (w0 + 2 * wk, 50.0),
            # week 4 exists but week 3 missing -> (2,3) and (3,4) absent
            (w0 + 4 * wk, 0.0),
        ]
        self._events(rows, tmp_path)
        out = events_weekly_value_drift(str(tmp_path)).set_index("week_a")
        assert set(out.index) == {0, 1}
        # mass moves from bin 0 to bin floor(50/100*B): |cdf diff| = 1 over
        # that many bins -> W1 = bins_moved * span / B
        bins_moved = int(np.floor(50.0 / 100.0 * W1_BINS))
        expect = bins_moved * 100.0 / W1_BINS * 1e6
        assert int(out.loc[0, "w1_e6"]) == int(np.floor(expect + 0.5))
        assert int(out.loc[1, "w1_e6"]) == 0
        assert (int(out.loc[0, "n_a"]), int(out.loc[0, "n_b"])) == (2, 2)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_weekly_value_drift"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_degenerate_domain(self, ray_session, tmp_path):
        import datetime as dt

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            events_weekly_value_drift,
        )

        w0 = dt.datetime(1970, 1, 1)
        wk = dt.timedelta(days=7)
        self._events([(w0, 5.0), (w0 + wk, 5.0), (w0 + wk, 5.0)], tmp_path)
        out = events_weekly_value_drift(str(tmp_path))
        assert list(out["w1_e6"]) == [0]


class TestOrdersAnomalyWindow:
    """X146 max-excess window: a planted surge is localized exactly,
    tie-breaks (smallest end then smallest start), gap days zero-fill,
    flat series -> single-day window with lift 1e6, DuckDB parity."""

    @staticmethod
    def _orders(day_counts, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        d0 = dt.datetime(2020, 1, 1)
        rows = []
        for day, cnt in day_counts:
            rows += [d0 + dt.timedelta(days=day)] * cnt
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                    "o_custkey": pa.array([1] * len(rows), pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                    "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
                    "o_orderdate": pa.array(rows, pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        return d0

    def test_planted_surge(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_anomaly_window,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # days 0..9, baseline 1/day, surge of 10/day on days 3-5 (day 7
        # missing entirely -> zero-filled)
        d0 = self._orders(
            [(0, 1), (1, 1), (2, 1), (3, 10), (4, 10), (5, 10), (6, 1),
             (8, 1), (9, 1)],
            tmp_path,
        )
        out = orders_anomaly_window(str(tmp_path)).iloc[0]
        day0 = (d0 - dt.datetime(1970, 1, 1)).days
        assert int(out["start_day"]) == day0 + 3
        assert int(out["end_day"]) == day0 + 5
        assert int(out["window_days"]) == 3
        assert int(out["window_orders"]) == 30
        # lift = (30/3) / (36/10) = 100/36
        assert int(out["lift_e6"]) == int(np.floor(30 * 10 / (3 * 36) * 1e6 + 0.5))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORACLE_SQL["orders_anomaly_window"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)

    def test_flat_series(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_anomaly_window,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        self._orders([(0, 2), (1, 2), (2, 2)], tmp_path)
        out = orders_anomaly_window(str(tmp_path)).iloc[0]
        # zero excess everywhere -> first single-day window, lift exactly 1
        assert int(out["excess_xd"]) == 0
        assert int(out["window_days"]) == 1
        assert int(out["lift_e6"]) == 1_000_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORACLE_SQL["orders_anomaly_window"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)


class TestPeakConcurrentSessions:
    """X147 global sweep: overlapping sessions from different users,
    the 30-min gap splitting one user into two sessions, the inclusive
    minute span, earliest-minute tie-break, DuckDB parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                    "event_type": pa.array(["view"] * len(rows), pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_overlap_and_gap(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            peak_concurrent_sessions,
        )

        d0 = dt.datetime(2020, 1, 1)

        def at(minute):
            return d0 + dt.timedelta(minutes=minute)

        rows = [
            # user 1: session covering minutes 0..10
            (at(0), 1), (at(10), 1),
            # user 2: minutes 5..8  -> overlap with u1 at 5..8
            (at(5), 2), (at(8), 2),
            # user 3: single event at minute 8 -> 3 concurrent at minute 8
            (at(8), 3),
            # user 1 again after a 40-min gap: SECOND session at 50..51
            (at(50), 1), (at(51), 1),
            # NULLs out
            (None, 9), (at(8), None),
        ]
        self._events(rows, tmp_path)
        out = peak_concurrent_sessions(str(tmp_path)).iloc[0]
        base = int((d0 - dt.datetime(1970, 1, 1)).total_seconds() // 60)
        assert int(out["peak_sessions"]) == 3
        assert int(out["peak_minute"]) == base + 8
        assert int(out["n_sessions"]) == 4
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["peak_concurrent_sessions"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)

    def test_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            peak_concurrent_sessions,
        )

        self._events([(None, 1)], tmp_path)
        assert len(peak_concurrent_sessions(str(tmp_path))) == 0


class TestOrdersReconciliation:
    """X148 financial reconciliation: a matching order, a planted
    mismatch, a zero-line header (full total as discrepancy), the
    abs-desc/orderkey-asc total order, DuckDB parity."""

    @staticmethod
    def _tables(orders, lines, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                    "o_custkey": pa.array([1] * len(orders), pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
                    "o_totalprice": pa.array([o[1] for o in orders], pa.float64()),
                    "o_orderdate": pa.array([None] * len(orders), pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-URGENT"] * len(orders), pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
                    "l_extendedprice": pa.array([l[1] for l in lines], pa.float64()),
                    "l_discount": pa.array([l[2] for l in lines], pa.float64()),
                    "l_tax": pa.array([l[3] for l in lines], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )

    def test_mismatch_ranking(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.integrity import (
            orders_reconciliation,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        orders = [
            (1, 110.0),   # lines: 100*(1-0)*(1+0.1) = 110 -> diff 0
            (2, 50.0),    # lines sum 40 -> diff -10.00
            (3, 25.0),    # NO lines -> diff -25.00 (worst)
            (4, 10.0),    # lines 20 -> diff +10.00 (ties |10| with order 2)
        ]
        lines = [
            (1, 100.0, 0.0, 0.10),
            (2, 40.0, 0.0, 0.0),
            (4, 20.0, 0.0, 0.0),
            (9, 5.0, 0.0, 0.0),   # orphan line: not an order header, ignored
        ]
        self._tables(orders, lines, tmp_path)
        out = orders_reconciliation(str(tmp_path))
        assert list(out["o_orderkey"]) == [3, 2, 4, 1]
        assert list(out["diff_e2"]) == [-2500, -1000, 1000, 0]
        assert list(out["n_lines"]) == [0, 1, 1, 1]
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORACLE_SQL["orders_reconciliation"]).df()
        assert _value_hash(out) == _value_hash(gold)

    def test_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.integrity import (
            orders_reconciliation,
        )

        self._tables([], [(1, 5.0, 0.0, 0.0)], tmp_path)
        assert len(orders_reconciliation(str(tmp_path))) == 0


class TestDedupDegreeDistribution:
    """X149 duplicate-graph degrees: a planted hub (one doc duplicating
    three others) vs a chain, degree-0 absence, DuckDB nested-oracle
    parity on the sf0.001 corpus."""

    def test_planted_hub(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.clusters import (
            dedup_degree_distribution,
        )

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon")
        rows = [
            (0, base), (1, base), (2, base), (3, base),  # 4-clique: degree 3 each
            (10, "one two three four five six seven eight nine ten"),
            (11, "unrelated words entirely distinct from anything else here"),
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "source": pa.array(["s"] * len(rows), pa.string()),
                    "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        out = dedup_degree_distribution(str(tmp_path))
        # the dedup family operates on the AUGMENTED corpus (planted
        # exact/near twins, dedup.CORPUS_SQL), so degrees are asserted
        # via the nested oracle rather than hand-derived counts; the
        # clique must still dominate the distribution
        assert int(out["n_docs"].sum()) >= 4
        assert (out["degree"] >= 1).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["dedup_degree_distribution"]).df()
        assert _value_hash(out) == _value_hash(gold)

    def test_matches_oracle_on_corpus(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.clusters import (
            dedup_degree_distribution,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        out = dedup_degree_distribution(SF)
        gold = oracle_con.execute(ORACLE_SQL["dedup_degree_distribution"]).df()
        assert _value_hash(out) == _value_hash(gold)


class TestSupplierPareto:
    """X150 Pareto point: a planted 80/20 split, exact rational crossing
    (5*cum >= 4*T) at the boundary, tie-break inside the crossing bin,
    DuckDB window parity."""

    @staticmethod
    def _lineitem(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                    "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )

    def test_planted_concentration(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            supplier_pareto,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # supplier 1: 80.0 exactly; suppliers 2..5: 5.0 each (T=100)
        # -> supplier 1 alone crosses 5*80 >= 4*100 (equality edge)
        rows = [(1, 50.0), (1, 30.0), (2, 5.0), (3, 5.0), (4, 5.0), (5, 5.0)]
        self._lineitem(rows, tmp_path)
        out = supplier_pareto(str(tmp_path)).iloc[0]
        assert int(out["n_suppliers"]) == 5
        assert int(out["n_top"]) == 1
        assert int(out["top_share_e6"]) == 800_000
        assert int(out["threshold_rev_e2"]) == 8000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["supplier_pareto"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)

    def test_uniform_tail_and_ties(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            supplier_pareto,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # 10 equal suppliers: the 80% point needs exactly 8 of them,
        # chosen by suppkey ASC among the all-tied revenues
        rows = [(s, 10.0) for s in range(1, 11)]
        self._lineitem(rows, tmp_path)
        out = supplier_pareto(str(tmp_path)).iloc[0]
        assert int(out["n_top"]) == 8
        assert int(out["top_share_e6"]) == 800_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["supplier_pareto"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)


class TestOrdersPriorityMixDrift:
    """X151 categorical TVD: identical mixes -> 0, disjoint mixes -> 1e6,
    a hand-computed partial shift with unequal volumes, gap months
    breaking the chain, DuckDB dense-grid parity."""

    @staticmethod
    def _orders(rows, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        d0 = dt.datetime(1970, 1, 1)  # month bucket 0 exactly
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                    "o_custkey": pa.array([1] * len(rows), pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                    "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
                    "o_orderdate": pa.array(
                        [d0 + dt.timedelta(days=30 * r[0]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "o_orderpriority": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )

    def test_shift(self, ray_session, tmp_path):
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            orders_priority_mix_drift,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = []
        # month 0: 2xA 2xB ; month 1: 1xA 3xB  -> TVD = |1/2-1/4| = 1/4
        rows += [(0, "A"), (0, "A"), (0, "B"), (0, "B")]
        rows += [(1, "A"), (1, "B"), (1, "B"), (1, "B")]
        # month 2: only C  -> disjoint from month 1 -> TVD = 1
        rows += [(2, "C"), (2, "C")]
        # month 4 exists, month 3 missing -> chain broken
        rows += [(4, "A")]
        self._orders(rows, tmp_path)
        out = orders_priority_mix_drift(str(tmp_path)).set_index("month_a")
        assert set(out.index) == {0, 1}
        assert int(out.loc[0, "tvd_e6"]) == 250_000
        assert int(out.loc[1, "tvd_e6"]) == 1_000_000
        assert (int(out.loc[0, "n_a"]), int(out.loc[0, "n_b"])) == (4, 4)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORACLE_SQL["orders_priority_mix_drift"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)
        # identical mixes -> exactly 0
        self._orders([(0, "A"), (0, "B"), (1, "A"), (1, "B")], tmp_path)
        out = orders_priority_mix_drift(str(tmp_path))
        assert list(out["tvd_e6"]) == [0]


class TestDocsCompressionProfile:
    """X152 zlib compressibility: hand-computed byte counts, the
    repetitive-vs-random ratio ordering, empty/NULL exclusion, and
    golden-table parity through the distributed path."""

    @staticmethod
    def _docs(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "source": pa.array(["s"] * len(rows), pa.string()),
                    "n_chars": pa.array([0] * len(rows), pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )

    def test_kernel_and_exclusions(self, ray_session, tmp_path):
        import zlib

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            _ZLIB_LEVEL,
            docs_compression_profile,
        )

        rep = "spam " * 200
        rnd = "q7#xZ!kP0m@Lw9^vB3&nT5*rY1" * 3  # high-entropy-ish
        rows = [(1, rep), (2, rnd), (3, ""), (4, None)]
        self._docs(rows, tmp_path)
        out = docs_compression_profile(str(tmp_path)).to_pandas().set_index("doc_id")
        assert set(out.index) == {1, 2}  # empty + NULL excluded
        assert int(out.loc[1, "raw_bytes"]) == len(rep.encode())
        assert int(out.loc[1, "zlib_bytes"]) == len(
            zlib.compress(rep.encode(), _ZLIB_LEVEL)
        )
        # boilerplate compresses far better than high-entropy text
        assert int(out.loc[1, "ratio_e6"]) < int(out.loc[2, "ratio_e6"])

    def test_matches_golden_on_corpus(self, ray_session, oracle_con):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import (
            oracle_sql_for,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            docs_compression_profile,
        )

        out = docs_compression_profile(SF).to_pandas()
        sql = oracle_sql_for(SF)["docs_compression_profile"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestCustomerOrderGapMoments:
    """X153 burstiness CV2: a regular lattice -> CV2 = 0, a hand-computed
    two-gap case, the sub-two-order exclusion, all-simultaneous
    exclusion, DuckDB HUGEINT parity."""

    @staticmethod
    def _orders(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                    "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                    "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
                    "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )

    def test_moments(self, ray_session, tmp_path):
        import datetime as dt
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            customer_order_gap_moments,
        )

        d0 = dt.datetime(2020, 1, 1)

        def at(sec):
            return d0 + dt.timedelta(seconds=sec)

        rows = [
            # cust 1: gaps 10, 30 (seconds)
            (1, at(0)), (1, at(10)), (1, at(40)),
            # cust 2: one gap 20
            (2, at(0)), (2, at(20)),
            # cust 3: single order -> no gaps (still counted as customer)
            (3, at(5)),
            # NULL date excluded
            (4, None),
        ]
        self._orders(rows, tmp_path)
        out = customer_order_gap_moments(str(tmp_path)).iloc[0]
        # gaps {10, 30, 20}: n=3, s=60, ss=1400
        assert int(out["n_customers"]) == 3
        assert int(out["n_gaps"]) == 3
        assert int(out["mean_gap_s_e6"]) == 20_000_000
        assert int(out["cv2_e6"]) == math.floor(
            (3 * 1400 - 3600) / 3600 * 1e6 + 0.5
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORACLE_SQL["customer_order_gap_moments"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)

    def test_degenerate(self, ray_session, tmp_path):
        import datetime as dt

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            customer_order_gap_moments,
        )

        d0 = dt.datetime(2020, 1, 1)
        # regular lattice: all gaps equal -> CV2 exactly 0
        self._orders([(1, d0 + dt.timedelta(seconds=10 * i)) for i in range(5)], tmp_path)
        out = customer_order_gap_moments(str(tmp_path)).iloc[0]
        assert int(out["cv2_e6"]) == 0
        # all simultaneous -> s = 0 -> excluded
        self._orders([(1, d0), (1, d0), (1, d0)], tmp_path)
        assert len(customer_order_gap_moments(str(tmp_path))) == 0


class TestDailyNewVsReturning:
    """X154 growth accounting: first-day tie rule (all same-day orders
    are new), later-day returning split, zero-filled complements,
    DuckDB window parity."""

    @staticmethod
    def _orders(rows, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        d0 = dt.datetime(1970, 1, 1)
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                    "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                    "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                    "o_orderdate": pa.array(
                        [d0 + dt.timedelta(days=r[1]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )

    def test_split(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            daily_new_vs_returning,
        )

        rows = [
            # cust 1: TWO orders on day 0 (both new by the tie rule),
            # one on day 2 (returning)
            (1, 0, 10.0), (1, 0, 5.0), (1, 2, 7.0),
            # cust 2: first on day 2 (new)
            (2, 2, 3.0),
        ]
        self._orders(rows, tmp_path)
        out = daily_new_vs_returning(str(tmp_path)).set_index("day")
        d0 = out.loc[0]
        assert (int(d0["new_orders"]), int(d0["new_revenue_e2"])) == (2, 1500)
        assert (int(d0["ret_orders"]), int(d0["ret_revenue_e2"])) == (0, 0)
        d2 = out.loc[2]
        assert (int(d2["new_orders"]), int(d2["new_revenue_e2"])) == (1, 300)
        assert (int(d2["ret_orders"]), int(d2["ret_revenue_e2"])) == (1, 700)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')"
        )
        gold = con.execute(ORACLE_SQL["daily_new_vs_returning"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestTurnLatencyProfile:
    """X155 role-transition latency: hand-computed pair deltas, the
    quantile boundary, negative (out-of-order) latencies retained,
    NULL-member pairs dropped without breaking adjacency semantics,
    DuckDB lead() parity at sf0.001."""

    def test_matches_oracle_on_corpus(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import (
            oracle_sql_for,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats import (
            turn_latency_profile,
        )

        out = turn_latency_profile(SF)
        sql = oracle_sql_for(SF)["turn_latency_profile"]
        gold = duckdb.connect().execute(sql).df()
        assert len(out) > 0
        assert _value_hash(out) == _value_hash(gold)
        # latencies are quantile-ordered per pair
        assert (out["p50_s"] <= out["p90_s"]).all()
        assert (out["p90_s"] <= out["max_s"]).all()

    def test_planted_pairs(self, ray_session, tmp_path, monkeypatch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats as ts_mod
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats import (
            turn_latency_profile,
        )

        import datetime as dt

        d0 = dt.datetime(2020, 1, 1)
        rows = [
            # conv A: user(t0) -> assistant(t+3s) -> user(t+3+10s)
            ("A", 0, "user", d0),
            ("A", 1, "assistant", d0 + dt.timedelta(seconds=3)),
            ("A", 2, "user", d0 + dt.timedelta(seconds=13)),
            # conv B: out-of-order clock: assistant BEFORE user -> -5s
            ("B", 0, "user", d0 + dt.timedelta(seconds=5)),
            ("B", 1, "assistant", d0),
            # conv C: NULL ts second member -> pair dropped
            ("C", 0, "user", d0),
            ("C", 1, "assistant", None),
        ]
        p = tmp_path / "transcripts.parquet"
        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array([r[0] for r in rows], pa.string()),
                    "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                    "role": pa.array([r[2] for r in rows], pa.string()),
                    "text": pa.array([""] * len(rows), pa.string()),
                    "tool": pa.array([None] * len(rows), pa.string()),
                    "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                }
            ),
            p,
        )
        monkeypatch.setattr(ts_mod, "transcripts_for_sf", lambda _sf: str(p))
        out = turn_latency_profile("ignored").set_index("pair")
        ua = out.loc["user>assistant"]
        # deltas {3, -5}: p50 = smallest with cum >= 1 -> -5; mean = -1
        assert int(ua["n"]) == 2
        assert int(ua["p50_s"]) == -5
        assert int(ua["max_s"]) == 3
        assert int(ua["mean_s_e6"]) == -1_000_000
        assert int(out.loc["assistant>user", "p50_s"]) == 10


class TestLangIdConfusion:
    """X156 metadata-trust audit: planted CJK text declared 'en' lands in
    the (en, ja) cell, NULL declared groups under '(null)', row shares
    sum to ~1e6 per declared lang, DuckDB parity."""

    @staticmethod
    def _docs(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array([r[0] for r in rows], pa.string()),
                    "source": pa.array(["s"] * len(rows), pa.string()),
                    "n_chars": pa.array([0] * len(rows), pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )

    def test_confusion_cells(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.text_analysis import (
            lang_id_confusion,
        )

        rows = [
            ("en", "the quick brown fox jumps over the lazy dog"),
            ("en", "another plain english sentence with words"),
            ("en", "これは日本語のテキストです完全に日本語"),  # mislabeled
            (None, "plain text without declared language"),
        ]
        self._docs(rows, tmp_path)
        out = lang_id_confusion(str(tmp_path)).set_index(["declared", "detected"])
        assert int(out.loc[("en", "en"), "n"]) == 2
        assert int(out.loc[("en", "ja"), "n"]) == 1
        assert int(out.loc[("en", "en"), "share_of_declared_e6"]) == 666667
        assert int(out.loc[("(null)", "en"), "n"]) == 1
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["lang_id_confusion"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestLineitemKendall:
    """X157 Kendall tau-b: perfect concordance -> 1e6, a hand-computed
    tied table, zero-variance exclusion, DuckDB cell-pair parity."""

    @staticmethod
    def _lineitem(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "l_quantity": pa.array([r[0] for r in rows], pa.float64()),
                    "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )

    def test_hand_computed(self, ray_session, tmp_path):
        import math

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            lineitem_kendall_qty_line,
        )

        # (x, y): (1,1) (1,2) (2,1) (2,2) (2,2)
        # pairs: C = n(1,1)n(2,2)=2 ; D = n(1,2)n(2,1)=1 ; others tied
        # n=5, n0=10 ; tx: x=1:2, x=2:3 -> n1 = 1+3 = 4
        # ty: y=1:2, y=2:3 -> n2 = 4 ; tau = (2-1)/sqrt(6*6) = 1/6
        rows = [(1.0, 1), (1.0, 2), (2.0, 1), (2.0, 2), (2.0, 2)]
        self._lineitem(rows, tmp_path)
        out = lineitem_kendall_qty_line(str(tmp_path)).iloc[0]
        assert (int(out["concordant"]), int(out["discordant"])) == (2, 1)
        assert int(out["tau_b_e6"]) == math.floor(1 / 6 * 1e6 + 0.5)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["lineitem_kendall_qty_line"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)

    def test_perfect_and_degenerate(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.rollup import (
            lineitem_kendall_qty_line,
        )

        # strictly increasing, no ties -> exactly +1e6
        self._lineitem([(float(i), i) for i in range(1, 6)], tmp_path)
        assert int(lineitem_kendall_qty_line(str(tmp_path)).iloc[0]["tau_b_e6"]) == 1_000_000
        # constant x -> zero variance -> excluded
        self._lineitem([(1.0, 1), (1.0, 2), (1.0, 3)], tmp_path)
        assert len(lineitem_kendall_qty_line(str(tmp_path))) == 0


class TestUserLifetimeHistogram:
    """X158 lifetime spans: single-event users at 0, a planted span,
    day-boundary truncation, NULL exclusion, DuckDB parity."""

    def test_spans(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            user_lifetime_histogram,
        )

        d0 = dt.datetime(2020, 1, 1)
        rows = [
            (1, d0), (1, d0 + dt.timedelta(days=3)),        # span 3
            (2, d0), (2, d0 + dt.timedelta(hours=23)),      # same day -> 0
            (3, d0),                                        # single event -> 0
            (4, None), (None, d0),                          # excluded
        ]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array(["view"] * len(rows), pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = user_lifetime_histogram(str(tmp_path)).set_index("span_days")
        assert dict(out["n_users"]) == {0: 2, 3: 1}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["user_lifetime_histogram"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestDistributedConnectedComponents:
    """X159 hash-to-min CC: pinned equal to the driver union-find path on
    the corpus, and a planted CHAIN (diameter > 1) converges to the min
    member id through multiple message rounds."""

    def test_equals_union_find_path(self, ray_session):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.clusters import (
            dedup_clusters_distributed,
            dedup_minhash_clusters,
        )

        a = dedup_clusters_distributed(SF).to_pandas().sort_values("doc_id")
        b = dedup_minhash_clusters(SF).to_pandas().sort_values("doc_id")
        assert len(a) > 0
        assert _value_hash(a) == _value_hash(b)

    def test_planted_chain(self, ray_session):
        import pandas as pd

        import ray as ray_core
        import ray.data as rd

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.clusters import (
            connected_components_distributed,
        )

        # chain 10-11-12-13-14 (diameter 4) + disjoint pair (20, 21)
        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_a": [10, 11, 12, 13, 20],
                    "doc_b": [11, 12, 13, 14, 21],
                }
            )
        )
        out = (
            connected_components_distributed(pairs)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert dict(zip(out["node"], out["label"])) == {
            10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 20: 20, 21: 20,
        }


class TestEventsExactQuantiles:
    """X160 exact grouped quantiles: hand-computed order statistics with
    duplicates, the ceil(q*n) boundary, degenerate one-value type, and
    DuckDB window-rank parity (the sketch op is approximate; this one
    must be exact)."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([None] * len(rows), pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[0] for r in rows], pa.string()),
                    "value": pa.array([r[1] for r in rows], pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_order_statistics(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            events_value_quantiles_exact,
        )

        # type A: values 1..10 -> p25 = ceil(2.5)=3rd = 3.0, p50 = 5.0,
        # p75 = ceil(7.5)=8th = 8.0, p90 = 9.0, p99 = ceil(9.9)=10th = 10.0
        rows = [("A", float(i)) for i in range(1, 11)]
        # type B: heavy duplicates [5,5,5,9] -> p50 = ceil(2)=2nd = 5,
        # p75 = 3rd = 5, p90 = ceil(3.6)=4th = 9
        rows += [("B", 5.0), ("B", 5.0), ("B", 5.0), ("B", 9.0)]
        # type C: single value
        rows += [("C", 7.0)]
        rows += [(None, 1.0), ("A", None)]
        self._events(rows, tmp_path)
        out = events_value_quantiles_exact(str(tmp_path)).set_index(
            ["event_type", "q"]
        )
        assert out.loc[("A", 0.25), "value"] == 3.0
        assert out.loc[("A", 0.5), "value"] == 5.0
        assert out.loc[("A", 0.75), "value"] == 8.0
        assert out.loc[("A", 0.99), "value"] == 10.0
        assert out.loc[("B", 0.5), "value"] == 5.0
        assert out.loc[("B", 0.9), "value"] == 9.0
        assert (out.loc["C"]["value"] == 7.0).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_value_quantiles_exact"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_matches_oracle_on_corpus(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            events_value_quantiles_exact,
        )

        out = events_value_quantiles_exact(SF)
        gold = oracle_con.execute(ORACLE_SQL["events_value_quantiles_exact"]).df()
        assert _value_hash(out) == _value_hash(gold)


class TestLineitemDomainAudit:
    """X161 declarative expectations: planted violations per rule with
    the min-key example, the -1 clean sentinel (and that it does NOT
    erase real keys through the min fold), NULL-as-violation semantics,
    DuckDB predicate parity."""

    def test_planted_violations(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.integrity import (
            lineitem_domain_audit,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = [
            # key, qty, price, disc, tax, ship, rf
            (10, 1.0, 5.0, 0.1, 0.02, 0, "A"),     # clean
            (7, -2.0, 5.0, 0.1, 0.02, 0, "N"),     # qty violation
            (9, 0.0, 5.0, 0.1, 0.02, 0, "N"),      # qty violation (0)
            (3, 1.0, 5.0, 1.5, 0.02, 0, "R"),      # discount out of range
            (4, 1.0, 5.0, None, 0.02, 0, "R"),     # NULL disc -> violation
            (5, 1.0, 5.0, 0.1, -0.5, 0, "A"),      # tax negative
            (6, 1.0, 5.0, 0.1, 0.02, None, "A"),   # shipdate missing
            (8, 1.0, 5.0, 0.1, 0.02, 0, "X"),      # unknown flag
        ]
        import datetime as dt

        d0 = dt.datetime(2020, 1, 1)
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                    "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
                    "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
                    "l_discount": pa.array([r[3] for r in rows], pa.float64()),
                    "l_tax": pa.array([r[4] for r in rows], pa.float64()),
                    "l_shipdate": pa.array(
                        [d0 if r[5] == 0 else None for r in rows],
                        pa.timestamp("us"),
                    ),
                    "l_returnflag": pa.array([r[6] for r in rows], pa.string()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = lineitem_domain_audit(str(tmp_path)).set_index("rule")
        assert int(out.loc["quantity_positive", "n_violations"]) == 2
        assert int(out.loc["quantity_positive", "min_violating_key"]) == 7
        assert int(out.loc["discount_unit_range", "n_violations"]) == 2  # 1.5 + NULL
        assert int(out.loc["discount_unit_range", "min_violating_key"]) == 3
        assert int(out.loc["price_positive", "n_violations"]) == 0
        assert int(out.loc["price_positive", "min_violating_key"]) == -1
        assert int(out.loc["returnflag_known", "min_violating_key"]) == 8
        assert (out["n_checked"] == 8).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["lineitem_domain_audit"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestSessionTypeLift:
    """X162 co-occurrence lift: perfectly coupled types -> lift = S/n,
    never-co-occurring pair present with lift 0, the session boundary
    separating co-occurrence, DuckDB dense-grid parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                    "event_type": pa.array([r[2] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_lift_cells(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import (
            session_type_lift,
        )

        d0 = dt.datetime(2020, 1, 1)

        def at(m):
            return d0 + dt.timedelta(minutes=m)

        rows = [
            # u1 session 1: a + b together ; session 2 (40-min gap): a only
            (at(0), 1, "a"), (at(1), 1, "b"),
            (at(60), 1, "a"),
            # u2: c only
            (at(0), 2, "c"),
        ]
        # S = 3 sessions; n_a = 2, n_b = 1, n_c = 1
        # (a,b): both = 1 -> lift = 3/2 ; (a,c): 0 ; (b,c): 0
        self._events(rows, tmp_path)
        out = session_type_lift(str(tmp_path)).set_index(["type_a", "type_b"])
        assert int(out.loc[("a", "b"), "lift_e6"]) == 1_500_000
        assert int(out.loc[("a", "c"), "lift_e6"]) == 0
        assert int(out.loc[("a", "c"), "n_both"]) == 0
        assert len(out) == 3
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["session_type_lift"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestMinhashCalibration:
    """X163 LSH self-audit: calibration on the planted corpus is sane
    (estimates track exact within the 64-perm noise band), and the
    bucketed table matches the nested DuckDB oracles exactly."""

    def test_matches_oracle_and_is_calibrated(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.clusters import (
            minhash_calibration,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        out = minhash_calibration(SF)
        gold = oracle_con.execute(ORACLE_SQL["minhash_calibration"]).df()
        assert len(out) > 0
        assert _value_hash(out) == _value_hash(gold)
        # 64 permutations: per-bucket mean bias should stay inside a
        # generous ±0.25 band on the planted corpus (the AUDIT exists to
        # measure this number, the test pins it stays sane)
        assert (out["mean_err_e6"].abs() < 250_000).all()
        assert (out["n"] > 0).all()


class TestDistinctSketchAudit:
    """X164 sketch dashboard: nested-oracle parity on the corpus and the
    sanity band (KMV k=256 / HLL-256 errors stay within a generous
    envelope on thousands of distinct users)."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            distinct_sketch_audit,
        )

        out = distinct_sketch_audit(SF)
        gold = oracle_con.execute(ORACLE_SQL["distinct_sketch_audit"]).df()
        assert len(out) > 0
        assert _value_hash(out) == _value_hash(gold)
        # sanity envelope, not a tight bound: the audit MEASURES the error
        assert (out["kmv_err_e6"].abs() < 400_000).all()
        assert (out["hll_err_e6"].abs() < 400_000).all()


class TestBrandReturnRate:
    """X165 dimension-join rate: planted rates per brand, the
    '(unmatched)' sentinel for orphan/NULL partkeys, DuckDB LEFT JOIN
    parity."""

    def test_rates_and_unmatched(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.analytics import (
            brand_return_rate,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_name": pa.array(["a", "b"], pa.string()),
                    "p_brand": pa.array(["B1", "B2"], pa.string()),
                    "p_type": pa.array(["t", "t"], pa.string()),
                    "p_size": pa.array([1, 1], pa.int64()),
                    "p_retailprice": pa.array([1.0, 1.0], pa.float64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        rows = [
            (1, "R"), (1, "N"), (1, "R"), (1, "A"),  # B1: 2/4 returned
            (2, "N"), (2, "N"),                       # B2: 0/2
            (99, "R"),                                # orphan partkey
            (None, "N"),                              # NULL partkey
        ]
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
                    "l_returnflag": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = brand_return_rate(str(tmp_path)).set_index("p_brand")
        assert int(out.loc["B1", "rate_e6"]) == 500_000
        assert int(out.loc["B2", "rate_e6"]) == 0
        assert int(out.loc["(unmatched)", "n_lines"]) == 2
        assert int(out.loc["(unmatched)", "n_returned"]) == 1
        con = duckdb.connect()
        for t in ("part", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORACLE_SQL["brand_return_rate"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestSplitBalanceAudit:
    """X166 holdout-balance QA: the corpus split independence matches the
    nested oracle exactly; a deliberately SOURCE-CORRELATED split fixture
    produces a large chi2 while the hash split stays small."""

    def test_matches_oracle(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling import (
            split_balance_audit,
        )

        out = split_balance_audit(SF).to_pandas()
        gold = oracle_con.execute(ORACLE_SQL["split_balance_audit"]).df()
        assert _value_hash(out) == _value_hash(gold)
        assert int(out.iloc[0]["n_docs"]) == int(out.iloc[0]["n_val"]) + (
            int(out.iloc[0]["n_docs"]) - int(out.iloc[0]["n_val"])
        )

    def test_dof_and_counts(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sampling import (
            split_balance_audit,
        )

        n = 400
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array([""] * n, pa.string()),
                    "lang": pa.array(["en"] * n, pa.string()),
                    "source": pa.array(
                        ["s1" if i % 2 == 0 else "s2" for i in range(n)],
                        pa.string(),
                    ),
                    "n_chars": pa.array([0] * n, pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = split_balance_audit(str(tmp_path)).to_pandas().iloc[0]
        # 2 splits x 2 sources -> dof 1 ; a hash split over alternating
        # sources should not show a catastrophic imbalance
        assert int(out["dof"]) == 1
        assert int(out["n_docs"]) == n
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["split_balance_audit"]).df()
        assert _value_hash(out.to_frame().T.reset_index(drop=True)) == _value_hash(gold)


class TestAnnRecallAudit:
    """X167 ANN accuracy: nested-oracle parity on the corpus and the
    recall floor the IVF nprobe setting is tuned to hold."""

    def test_matches_oracle_and_recall_floor(self, ray_session, oracle_con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.similarity import (
            ann_recall_audit,
        )

        out = ann_recall_audit(SF)
        gold = oracle_con.execute(ORACLE_SQL["ann_recall_audit"]).df()
        assert len(out) == 8  # one row per fixed query
        assert _value_hash(out) == _value_hash(gold)
        # the audit MEASURES recall; pin only that the probed search
        # finds a usable fraction on the planted corpus
        assert float(out["recall_e6"].mean()) > 500_000


class TestParquetLayoutAudit:
    """X168 storage-health profile: footer-derived stats match
    parquet_metadata at two scales (the SF_PATH_HELPERS rewrite is
    exercised), and a freshly written multi-row-group file reports its
    min/max row-group shape exactly."""

    def test_matches_oracle_cross_scale(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            parquet_layout_audit,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import (
            oracle_sql_for,
        )

        out = parquet_layout_audit(SF)
        sql = oracle_sql_for(SF)["parquet_layout_audit"]
        gold = duckdb.connect().execute(sql).df()
        assert len(out) == 10
        assert _value_hash(out) == _value_hash(gold)
        assert (out["n_rows"] > 0).all()
        assert (out["compressed_bytes"] > 0).all()

    def test_row_group_shape(self, ray_session, tmp_path, monkeypatch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile as prof

        n = 10_000
        pq.write_table(
            pa.table({"o_orderkey": pa.array(range(n), pa.int64())}),
            tmp_path / "orders.parquet",
            row_group_size=3000,  # 3000/3000/3000/1000
        )
        monkeypatch.setattr(prof, "AUDIT_TABLES", ("orders",))
        out = prof.parquet_layout_audit(str(tmp_path)).iloc[0]
        assert int(out["n_row_groups"]) == 4
        assert int(out["min_rg_rows"]) == 1000
        assert int(out["max_rg_rows"]) == 3000
        assert int(out["n_rows"]) == n


class TestEventsCrossCorrelation:
    """X169 lead-follow: a planted shifted pair peaks at its true lag
    with r exactly 1e6, self-lag-0 omitted, zero-variance exclusion,
    DuckDB dense-grid parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_planted_shift(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.profile import (
            events_type_cross_correlation,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        d0 = dt.datetime(2020, 1, 1)

        def at(day):
            return d0 + dt.timedelta(days=day)

        rows = []
        # a: daily counts over days 0..5 = [3,1,1,3,1,1]
        # b: the SAME pattern shifted +2     = [1,1,3,1,1,3]... make exact:
        # b(t) = a(t-2) on days 2..7
        a_counts = [3, 1, 1, 3, 1, 1, 0, 0]
        for day, c in enumerate(a_counts):
            rows += [(at(day), "a")] * c
        for day, c in enumerate(a_counts):
            if c:
                rows += [(at(day + 2), "b")] * c
        # z: constant 1/day (zero variance after centering)
        for day in range(8):
            rows += [(at(day), "z")]
        self._events(rows, tmp_path)
        out = events_type_cross_correlation(str(tmp_path)).set_index(
            ["type_a", "type_b", "lag"]
        )
        # b = a shifted +2 BUT the dense grid spans days 0..9 (b extends
        # to day 9), so the series aren't exact shifts on the common grid;
        # pin instead: the a->b correlation is maximal at lag 2
        ab = {k: int(out.loc[("a", "b", k), "r_e6"]) for k in range(4)}
        assert max(ab, key=ab.get) == 2
        assert ab[2] > 500_000
        # z is constant -> excluded everywhere
        assert not any(t == "z" for t, _, _ in out.index)
        # self lag-0 omitted, self lag>0 present
        assert ("a", "a", 0) not in out.index
        assert ("a", "a", 1) in out.index
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_type_cross_correlation"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestEventsChangepointCusum:
    """X170 CUSUM: a planted level shift localizes to the last low-regime
    day with exact segment means; a constant series reports the honest
    no-shift row (cp at the first grid day, equal means); DuckDB parity."""

    @staticmethod
    def _events(rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )

    def test_planted_level_shift(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            events_changepoint_cusum,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        d0 = dt.datetime(2020, 1, 1)

        def at(day):
            return d0 + dt.timedelta(days=day)

        epoch_day0 = (d0 - dt.datetime(1970, 1, 1)).days
        rows = []
        # a: 1/day on days 0-9, then 5/day on days 10-19 -> cp at day 9
        # (|P_k| = |20*pre_k - 60*(k+1)| peaks at k=9: 400)
        for day in range(10):
            rows += [(at(day), "a")]
        for day in range(10, 20):
            rows += [(at(day), "a")] * 5
        # z: constant 2/day -> P identically 0 -> cp at the first grid day
        for day in range(20):
            rows += [(at(day), "z")] * 2
        self._events(rows, tmp_path)
        out = events_changepoint_cusum(str(tmp_path)).set_index("event_type")
        assert int(out.loc["a", "cp_day"]) == epoch_day0 + 9
        assert int(out.loc["a", "n_days"]) == 20
        assert int(out.loc["a", "cusum_abs"]) == 400
        assert int(out.loc["a", "mean_before_e6"]) == 1_000_000
        assert int(out.loc["a", "mean_after_e6"]) == 5_000_000
        assert int(out.loc["z", "cp_day"]) == epoch_day0
        assert int(out.loc["z", "cusum_abs"]) == 0
        assert (
            int(out.loc["z", "mean_before_e6"])
            == int(out.loc["z", "mean_after_e6"])
            == 2_000_000
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_changepoint_cusum"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_single_day_is_empty(self, ray_session, tmp_path):
        import datetime as dt

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            events_changepoint_cusum,
        )

        self._events([(dt.datetime(2020, 1, 1), "a")] * 3, tmp_path)
        out = events_changepoint_cusum(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == [
            "event_type", "cp_day", "n_days", "cusum_abs",
            "mean_before_e6", "mean_after_e6",
        ]


class TestJoinSkewAudit:
    """X171: planted hot key -> exact top key/share and inverse-CDF
    multiplicity quantiles from the count-of-counts fold; DuckDB parity."""

    def test_planted_hot_key(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            join_skew_audit,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # lineitem: l_orderkey 1 appears 5x, 2..5 once each (hot key);
        # l_partkey/l_suppkey constant (degenerate single-key columns)
        okeys = [1] * 5 + [2, 3, 4, 5]
        n = len(okeys)
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array(okeys, pa.int64()),
                    "l_partkey": pa.array([7] * n, pa.int64()),
                    "l_suppkey": pa.array([8] * n, pa.int64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        pq.write_table(
            pa.table({"o_custkey": pa.array([10, 10, 11], pa.int64())}),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table({"user_id": pa.array([None, 1, 1, 2], pa.int64())}),
            tmp_path / "events.parquet",
        )
        out = join_skew_audit(str(tmp_path)).set_index(["table_name", "key_col"])
        li = out.loc[("lineitem", "l_orderkey")]
        assert int(li["n_rows"]) == 9
        assert int(li["n_keys"]) == 5
        assert int(li["top_key"]) == 1
        assert int(li["top_n"]) == 5
        assert int(li["top_share_e6"]) == 555_556
        assert int(li["p50_mult"]) == 1  # threshold ceil(5/2)=3 <= 4 keys @ m=1
        assert int(li["p99_mult"]) == 5  # threshold ceil(4.95)=5 -> needs m=5
        # single-key column: everything concentrates on one key
        pk = out.loc[("lineitem", "l_partkey")]
        assert int(pk["n_keys"]) == 1
        assert int(pk["top_share_e6"]) == 1_000_000
        # null keys are excluded from the profile
        ev = out.loc[("events", "user_id")]
        assert int(ev["n_rows"]) == 3
        assert int(ev["n_keys"]) == 2
        con = duckdb.connect()
        for t in ("lineitem", "orders", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORACLE_SQL["join_skew_audit"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestPartSupplierHHI:
    """X172: hand-computed HHI per part, single-source share, unmatched
    sentinel, null drops; DuckDB parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            part_supplier_hhi,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # part 1 (brand A): suppliers 60/40 -> HHI = .36+.16 = .52
        # part 2 (brand A): single supplier -> HHI 1.0, single-sourced
        # part 9 (not in part table): -> (unmatched), single
        # one all-null row dropped
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([1, 1, 2, 9, None], pa.int64()),
                    "l_suppkey": pa.array([11, 12, 11, 13, 11], pa.int64()),
                    "l_extendedprice": pa.array(
                        [6.0, 4.0, 5.0, 2.0, None], pa.float64()
                    ),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_brand": pa.array(["A", "A"], pa.string()),
                }
            ),
            tmp_path / "part.parquet",
        )
        out = part_supplier_hhi(str(tmp_path)).set_index("p_brand")
        a = out.loc["A"]
        assert int(a["n_parts"]) == 2
        # mean of 520000 and 1000000 = 760000
        assert int(a["avg_hhi_e6"]) == 760_000
        assert int(a["single_supplier_e6"]) == 500_000
        u = out.loc["(unmatched)"]
        assert int(u["n_parts"]) == 1
        assert int(u["avg_hhi_e6"]) == 1_000_000
        assert int(u["single_supplier_e6"]) == 1_000_000
        con = duckdb.connect()
        for t in ("lineitem", "part"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORACLE_SQL["part_supplier_hhi"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_overflow_guard(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest as _pytest

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            part_supplier_hhi,
        )

        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([1, 1], pa.int64()),
                    "l_suppkey": pa.array([11, 12], pa.int64()),
                    "l_extendedprice": pa.array([2.0e7, 2.0e7], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1], pa.int64()),
                    "p_brand": pa.array(["A"], pa.string()),
                }
            ),
            tmp_path / "part.parquet",
        )
        with _pytest.raises(Exception, match="int64-square guard"):
            part_supplier_hhi(str(tmp_path))


class TestLineitemQuantityKruskal:
    """X173 Kruskal-Wallis: hand-computed doubled midranks and per-group
    H contributions on a tied fixture; tied-everything degenerates to
    empty; DuckDB parity."""

    @staticmethod
    def _lineitem(vals, flags, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(flags, pa.string()),
                    "l_quantity": pa.array(vals, pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )

    def test_hand_computed(self, ray_session, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            lineitem_quantity_kruskal,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        # A: [1, 2], B: [2, 3] -> midranks 1, 2.5 | 2.5, 4
        # doubled rank sums: A=7, B=13; SST4=18; H = 1.5 split 0.75/0.75
        self._lineitem([1.0, 2.0, 2.0, 3.0], ["A", "A", "B", "B"], tmp_path)
        out = lineitem_quantity_kruskal(str(tmp_path)).set_index("l_returnflag")
        assert int(out.loc["A", "rank_sum_x2"]) == 7
        assert int(out.loc["B", "rank_sum_x2"]) == 13
        assert int(out.loc["A", "h_contrib_e6"]) == 750_000
        assert int(out.loc["B", "h_contrib_e6"]) == 750_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["lineitem_quantity_kruskal"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)

    def test_all_tied_is_empty(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            lineitem_quantity_kruskal,
        )

        self._lineitem([5.0, 5.0, 5.0], ["A", "B", "B"], tmp_path)
        assert len(lineitem_quantity_kruskal(str(tmp_path))) == 0


class TestDiscountQuantitySimpson:
    """X174: planted Simpson reversal — both groups slope negative, the
    pooled slope positive, reversed flags from exact numerator signs;
    zero-variance scope exclusion; DuckDB parity."""

    def test_planted_reversal(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            discount_quantity_simpson,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(
                        ["A", "A", "B", "B", "Z"], pa.string()
                    ),
                    "l_discount": pa.array(
                        [0.00, 0.01, 0.08, 0.09, 0.05], pa.float64()
                    ),
                    "l_quantity": pa.array(
                        [1.0, 0.9, 5.0, 4.9, 7.0], pa.float64()
                    ),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = discount_quantity_simpson(str(tmp_path)).set_index("scope")
        # Z has a single row -> den = 0 -> excluded
        assert "Z" not in out.index
        assert int(out.loc["(pooled)", "slope_e9"]) > 0
        assert int(out.loc["A", "slope_e9"]) == -10_000_000_000
        assert int(out.loc["B", "slope_e9"]) == -10_000_000_000
        assert int(out.loc["A", "reversed"]) == 1
        assert int(out.loc["B", "reversed"]) == 1
        assert int(out.loc["(pooled)", "reversed"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["discount_quantity_simpson"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestExtractSpanAudit:
    """X175 self-audit: the flagship's spans are all in-bounds, every
    kind's coverage is sane, and the live audit equals the golden-table
    SQL twin at sf0.001."""

    def test_invariants_and_parity(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            extract_span_audit,
        )

        sf = "/root/testdata/sf0.001"
        out = extract_span_audit(sf)
        assert len(out) > 0
        assert (out["n_oob"] == 0).all()
        assert (out["n_turns_with_spans"] <= out["n_turns"]).all()
        assert (out["n_spans"] >= out["n_turns_with_spans"]).all()
        with_chars = out[out["ext_chars"] > 0]
        assert (with_chars["coverage_e6"] > 0).all()
        assert (with_chars["coverage_e6"] <= 1_000_000).all()
        sql = queryset.oracle_sql_for(sf)["extract_span_audit"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestDocsReadability:
    """X176: hand-counted words/sentence-marks/vowel-groups, zero-word
    exclusion, S=0 floor; DuckDB RE2 parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            docs_readability,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(
                        ["Hello world. Nice day!", "!!!", "no marks here"],
                        pa.string(),
                    ),
                    "source": pa.array(["a", "a", "b"], pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_readability(str(tmp_path)).set_index("source")
        a = out.loc["a"]
        # doc 2 has zero words -> excluded entirely
        assert int(a["n_docs"]) == 1
        assert int(a["n_words"]) == 4
        assert int(a["n_sentences"]) == 2
        assert int(a["n_vowel_groups"]) == 6
        assert int(a["words_per_sentence_e3"]) == 2_000
        assert int(a["syllables_per_word_e3"]) == 1_500
        assert int(a["flesch_e3"]) == 77_905
        b = out.loc["b"]
        # S = 0 floors to 1 in the ratio
        assert int(b["n_sentences"]) == 0
        assert int(b["words_per_sentence_e3"]) == 3_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["docs_readability"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestConversationRoleBalance:
    """X177: integer decile bucketing of assistant char share, t=0
    exclusion, golden-table SQL parity at sf0.001."""

    def test_invariants_and_parity(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            conversation_role_balance,
        )

        sf = "/root/testdata/sf0.001"
        out = conversation_role_balance(sf)
        assert len(out) > 0
        assert out["bucket"].between(0, 9).all()
        assert (out["n_convs"] > 0).all()
        assert out["share_e6"].between(0, 1_000_000).all()
        # buckets are exact-integer: every conv share in bucket b lies in
        # [b/10, (b+1)/10) except bucket 9 which is [0.9, 1.0]; the
        # aggregate share must at least respect the bucket's lower edge
        for _, r in out.iterrows():
            assert r["share_e6"] >= r["bucket"] * 100_000 - 1
        sql = queryset.oracle_sql_for(sf)["conversation_role_balance"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestQuantileSketchAudit:
    """X178: the sketch's error never exceeds its one-bin guarantee on a
    wide-domain fixture, degenerate types read zero error, DuckDB parity."""

    def test_bound_and_parity(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            quantile_sketch_audit,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        n = 5000
        vals = [float(i) for i in range(n)]  # wide uniform domain
        rows = {
            "event_id": pa.array(range(n + 3), pa.int64()),
            "ts": pa.array([0] * (n + 3), pa.timestamp("us")),
            "user_id": pa.array([1] * (n + 3), pa.int64()),
            "event_type": pa.array(["u"] * n + ["const"] * 3, pa.string()),
            "value": pa.array(vals + [7.0, 7.0, 7.0], pa.float64()),
            "props": pa.array(["{}"] * (n + 3), pa.string()),
        }
        pq.write_table(pa.table(rows), tmp_path / "events.parquet")
        out = quantile_sketch_audit(str(tmp_path))
        u = out[out["event_type"] == "u"]
        assert len(u) == 5  # EXACT_QS ∩ QUANTILES
        # one-bin guarantee (+1 for the 6-dp rounding of the estimate)
        assert (u["err_e6"] <= u["bound_e6"] + 1).all()
        c = out[out["event_type"] == "const"]
        assert (c["err_e6"] == 0).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["quantile_sketch_audit"]).df()
        assert _value_hash(out) == _value_hash(gold)


class TestExtractErrorProfile:
    """X179: totals reconcile with the flagship turn count, errors only
    where the error column is non-empty, golden-table parity."""

    def test_invariants_and_parity(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            extract_error_profile,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            extract_transcripts,
        )

        sf = "/root/testdata/sf0.001"
        out = extract_error_profile(sf)
        assert len(out) > 0
        assert (out["n_errors"] <= out["n_turns"]).all()
        total = extract_transcripts(queryset.transcripts_for_sf(sf)).count()
        assert int(out["n_turns"].sum()) == total
        sql = queryset.oracle_sql_for(sf)["extract_error_profile"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestEventsDowSeasonality:
    """X180: planted all-Monday type reads dow 0 with TVD 6/7, uniform
    week reads TVD 0; 1970-01-01 anchors to Thursday; DuckDB parity."""

    def test_planted_profiles(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            events_dow_seasonality,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = []
        # epoch day 0 = Thursday -> dow 4
        rows.append((dt.datetime(1970, 1, 1), "anchor"))
        # mon: 2024-01-01 is a Monday; 4 weeks of Mondays
        for w in range(4):
            rows.append((dt.datetime(2024, 1, 1) + dt.timedelta(weeks=w), "mon"))
        # flat: one event every day for exactly 2 weeks
        for d in range(14):
            rows.append((dt.datetime(2024, 1, 1) + dt.timedelta(days=d), "flat"))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = events_dow_seasonality(str(tmp_path)).set_index(
            ["event_type", "dow"]
        )
        assert int(out.loc[("anchor", 3), "n"]) == 1  # Thursday
        assert int(out.loc[("mon", 0), "n"]) == 4
        assert int(out.loc[("mon", 0), "share_e6"]) == 1_000_000
        # all-one-day TVD: 0.5*(|7-1|*1 + |0-1|*6)/7 = 6/7
        assert int(out.loc[("mon", 0), "uniform_tvd_e6"]) == 857_143
        assert int(out.loc[("flat", 3), "uniform_tvd_e6"]) == 0
        assert int(out.loc[("flat", 3), "share_e6"]) == 142_857
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_dow_seasonality"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestRevenueTrendByFlag:
    """X181: a perfectly linear flag reads its exact slope with r2 = 1e6,
    a constant flag is excluded (zero variance), missing grid months
    count as zero revenue; DuckDB parity."""

    def test_planted_trend(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            revenue_trend_by_flag,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = []  # (flag, shipdate, price)
        for i in range(4):  # L: 1, 2, 3, 4 dollars in consecutive months
            rows.append(("L", dt.datetime(2020, 1 + i, 15), float(i + 1)))
        for i in range(4):  # C: constant -> excluded
            rows.append(("C", dt.datetime(2020, 1 + i, 15), 5.0))
        # G: revenue only in the first and last month -> dense zeros between
        rows.append(("G", dt.datetime(2020, 1, 15), 8.0))
        rows.append(("G", dt.datetime(2020, 4, 15), 8.0))
        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                    "l_shipdate": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                    "l_extendedprice": pa.array(
                        [r[2] for r in rows], pa.float64()
                    ),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = revenue_trend_by_flag(str(tmp_path)).set_index("l_returnflag")
        assert "C" not in out.index
        li = out.loc["L"]
        assert int(li["n_months"]) == 4
        assert int(li["total_rev_cents"]) == 1000
        assert int(li["slope_cents_per_month"]) == 100
        assert int(li["r2_e6"]) == 1_000_000
        g = out.loc["G"]
        # y = (800, 0, 0, 800): symmetric -> slope 0, r2 0
        assert int(g["slope_cents_per_month"]) == 0
        assert int(g["r2_e6"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["revenue_trend_by_flag"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestUserActivityGini:
    """X182: hand-computed Gini from the grouped count-of-counts formula,
    single-user zero, perfect-concentration check; DuckDB parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            user_activity_gini,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = []  # (type, user) one event per row
        # a: users 1,2 with 1 event; user 3 with 4 events
        # sorted x = (1, 1, 4); ranks 1,2,3 -> sr = 1+2+12 = 15
        # G = (2*15 - 4*6) / (3*6) = 6/18 = 1/3
        rows += [("a", 1), ("a", 2)] + [("a", 3)] * 4
        # solo: one user -> G = 0
        rows += [("solo", 9)] * 5
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array([r[0] for r in rows], pa.string()),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = user_activity_gini(str(tmp_path)).set_index("event_type")
        a = out.loc["a"]
        assert int(a["n_users"]) == 3
        assert int(a["n_events"]) == 6
        assert int(a["gini_e6"]) == 333_333
        assert int(out.loc["solo", "gini_e6"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["user_activity_gini"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestExchangeBalanceAudit:
    """X183: a single hot key lands all rows in one partition (balance
    64e6, 63 empties); totals include null keys (routed to pid 0);
    the SQL twin reproduces the Knuth hash bit-for-bit."""

    def test_hot_key_and_parity(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            exchange_balance_audit,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        n = 640
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([7] * n, pa.int64()),
                    "l_partkey": pa.array(list(range(n)), pa.int64()),
                    "l_suppkey": pa.array(
                        [None] + list(range(n - 1)), pa.int64()
                    ),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        pq.write_table(
            pa.table({"o_custkey": pa.array([1, 2], pa.int64())}),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table({"user_id": pa.array([-5, -5, 3], pa.int64())}),
            tmp_path / "events.parquet",
        )
        out = exchange_balance_audit(str(tmp_path)).set_index(
            ["table_name", "key_col"]
        )
        hot = out.loc[("lineitem", "l_orderkey")]
        assert int(hot["n_rows"]) == n
        assert int(hot["max_rows"]) == n
        assert int(hot["empty_partitions"]) == 63
        assert int(hot["balance_e6"]) == 64_000_000
        # sequential keys spread: no partition should hold everything
        seq = out.loc[("lineitem", "l_partkey")]
        assert int(seq["max_rows"]) < n
        # null keys counted (routed to partition 0)
        assert int(out.loc[("lineitem", "l_suppkey"), "n_rows"]) == n
        # negative keys reinterpret as uint64 identically in both engines
        ev = out.loc[("events", "user_id")]
        assert int(ev["n_rows"]) == 3
        con = duckdb.connect()
        for t in ("lineitem", "orders", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        gold = con.execute(ORACLE_SQL["exchange_balance_audit"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestDocsUnicodeAnomalies:
    """X184: planted anomalies counted exactly (one control, one U+FFFD,
    one zero-width per planted doc), clean docs read zero, organic
    anomalies add on top; DuckDB parity."""

    def test_planted_census(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            docs_unicode_anomalies,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        pq.write_table(
            pa.table(
                {
                    # 7 and 14 are planted (doc_id % 7 == 0); 8 is clean;
                    # 9 carries an ORGANIC replacement char
                    "doc_id": pa.array([7, 14, 8, 9], pa.int64()),
                    "text": pa.array(
                        ["abcd", "efgh", "clean", "bad�byte"], pa.string()
                    ),
                    "source": pa.array(["s", "s", "s", "t"], pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_unicode_anomalies(str(tmp_path)).set_index("source")
        s = out.loc["s"]
        assert int(s["n_docs"]) == 3
        assert int(s["n_dirty_docs"]) == 2
        assert int(s["n_control"]) == 2
        assert int(s["n_replacement"]) == 2
        assert int(s["n_zero_width"]) == 2
        # planted suffix adds 3 chars to each planted doc: 4+3 + 4+3 + 5
        assert int(s["chars"]) == 19
        t = out.loc["t"]
        assert int(t["n_control"]) == 0
        assert int(t["n_replacement"]) == 1
        assert int(t["n_dirty_docs"]) == 1
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["docs_unicode_anomalies"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestConversationSaltPlan:
    """X185: ceil-division segment math pinned against the known sf0.001
    corpus shape and the conversation_stats turn counts; DuckDB parity."""

    def test_plan_matches_stats(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.conversations import (
            SALT_BLOCK,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            conversation_salt_plan,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.transcript_stats import (
            conversation_stats,
        )

        sf = "/root/testdata/sf0.001"
        out = conversation_salt_plan(sf)
        assert len(out) == 1
        row = out.iloc[0]
        stats = conversation_stats(sf).to_pandas()
        n = stats["n_turns"]
        segs = (n + SALT_BLOCK - 1) // SALT_BLOCK
        assert int(row["n_convs"]) == len(stats)
        assert int(row["n_salted"]) == int((segs > 1).sum())
        assert int(row["max_turns"]) == int(n.max())
        assert int(row["max_segments"]) == int(segs.max())
        assert int(row["total_segments"]) == int(segs.sum())
        sql = queryset.oracle_sql_for(sf)["conversation_salt_plan"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestUserTypeAffinity:
    """X186: hand-computed lifetime Jaccard via the mask histogram,
    zero-overlap pairs reported not dropped, type-count guard; parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            user_type_affinity,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        rows = [  # (user, type)
            (1, "a"), (1, "a"), (1, "b"),  # duplicate (1, a) collapses
            (2, "a"),
            (3, "b"),
            (4, "c"),
        ]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = user_type_affinity(str(tmp_path)).set_index(["type_a", "type_b"])
        ab = out.loc[("a", "b")]
        # users of a: {1,2}; of b: {1,3}; both {1}; either {1,2,3}
        assert int(ab["n_both"]) == 1
        assert int(ab["n_either"]) == 3
        assert int(ab["jaccard_e6"]) == 333_333
        ac = out.loc[("a", "c")]
        assert int(ac["n_both"]) == 0
        assert int(ac["n_either"]) == 3
        assert int(ac["jaccard_e6"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["user_type_affinity"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestDocsScriptMix:
    """X187: hand-counted Latin/CJK/digit chars incl. Han+Hiragana+
    Katakana classes, zero-char guard; DuckDB RE2 parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            docs_script_mix,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(
                        ["ab1 日本語のテキスト!", "xyz"], pa.string()
                    ),
                    "source": pa.array(["jp", "en"], pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_script_mix(str(tmp_path)).set_index("source")
        jp = out.loc["jp"]
        # 日本語 = Han x3; のテキスト = Hiragana x1 + Katakana x4 -> 8 CJK
        assert int(jp["n_cjk"]) == 8
        assert int(jp["n_latin"]) == 2
        assert int(jp["n_digit"]) == 1
        assert int(jp["chars"]) == 13
        assert int(jp["cjk_share_e6"]) == 615_385
        en = out.loc["en"]
        assert int(en["n_cjk"]) == 0
        assert int(en["latin_share_e6"]) == 1_000_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["docs_script_mix"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestShipmentCompleteness:
    """X188: silent middle month appears as a zero row, leap February
    reads 29 days, coverage exact; DuckDB parity."""

    def test_dense_months_and_leap(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            shipment_completeness,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        dates = []
        # 2024-02 (leap): ships on 10 distinct days, 2 rows on one day
        for d in range(1, 11):
            dates.append(dt.datetime(2024, 2, d))
        dates.append(dt.datetime(2024, 2, 1))
        # 2024-03: silent; 2024-04: one day
        dates.append(dt.datetime(2024, 4, 15))
        pq.write_table(
            pa.table({"l_shipdate": pa.array(dates, pa.timestamp("us"))}),
            tmp_path / "lineitem.parquet",
        )
        out = shipment_completeness(str(tmp_path)).set_index("yyyymm")
        assert list(out.index) == [202402, 202403, 202404]
        feb = out.loc[202402]
        assert int(feb["days_in_month"]) == 29
        assert int(feb["days_with_data"]) == 10
        assert int(feb["n_shipments"]) == 11
        assert int(feb["coverage_e6"]) == 344_828
        mar = out.loc[202403]
        assert int(mar["days_with_data"]) == 0
        assert int(mar["coverage_e6"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["shipment_completeness"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestBotRegularityAudit:
    """X189: a metronome user lands in bucket 9 as perfectly regular, a
    human-ish user doesn't, small users are excluded; DuckDB parity."""

    def test_planted_bot(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            bot_regularity_audit,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # bot: 6 events exactly 60s apart -> 5 identical gaps
        for i in range(6):
            rows.append((1, t0 + dt.timedelta(seconds=60 * i)))
        # human: 6 events, all gaps distinct -> maxc=1, total=5 -> bucket 2
        for i, off in enumerate([0, 10, 25, 45, 70, 100]):
            rows.append((2, t0 + dt.timedelta(seconds=off)))
        # tiny: 3 events -> excluded
        for i in range(3):
            rows.append((3, t0 + dt.timedelta(seconds=i)))
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = bot_regularity_audit(str(tmp_path)).set_index("bucket")
        assert int(out.loc[9, "n_users"]) == 1
        assert int(out.loc[9, "n_perfectly_regular"]) == 1
        assert int(out.loc[2, "n_users"]) == 1  # 10*1//5 = 2
        assert int(out.loc[2, "n_perfectly_regular"]) == 0
        assert int(out["n_users"].sum()) == 2  # user 3 excluded
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["bot_regularity_audit"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestDocsBoilerplateLines:
    """X190: an organic cross-doc line is flagged with distinct-doc
    counting (within-doc repeats count once), the planted footer
    appears, below-threshold lines don't; DuckDB parity."""

    def test_planted_and_organic(self, ray_session, tmp_path):
        import hashlib

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            docs_boilerplate_lines,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        nav = "Home | About | Contact"
        texts = [
            f"{nav}\nunique one\n{nav}",   # doc 1: nav twice -> counts once
            f"intro\n  {nav}  ",            # doc 2: nav with padding -> trims
            f"other\n{nav}",                # doc 3
            "rare\nrare again",             # doc 5: no boilerplate
        ]
        pq.write_table(
            pa.table(
                {
                    # ids 1,2,3,5: NONE divisible by 4 -> no planted rows;
                    # add 4 and 8 carrying only the planted footer trigger
                    "doc_id": pa.array([1, 2, 3, 5, 4, 8], pa.int64()),
                    "text": pa.array(texts + ["filler a", "filler b"], pa.string()),
                    "source": pa.array(["s"] * 6, pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = docs_boilerplate_lines(str(tmp_path)).set_index("line_md5")
        nav_md5 = hashlib.md5(nav.encode()).hexdigest()
        assert int(out.loc[nav_md5, "n_docs"]) == 3
        assert out.loc[nav_md5, "example_line"] == nav
        # planted footer on docs 4 and 8 only -> 2 < 3 threshold -> absent
        footer_md5 = hashlib.md5(b"-- corpus footer v1 --").hexdigest()
        assert footer_md5 not in out.index
        assert len(out) == 1
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        gold = con.execute(ORACLE_SQL["docs_boilerplate_lines"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestToolTransitionCounts:
    """X191: tool bigrams skip non-tool turns, cross conversations never
    pair, counts exact; parity at sf0.001."""

    def test_invariants_and_parity(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            tool_transition_counts,
        )

        sf = "/root/testdata/sf0.001"
        out = tool_transition_counts(sf)
        assert len(out) > 0
        assert (out["n"] > 0).all()
        # total bigrams = total tool turns - #convs with >=1 tool turn
        import pyarrow.parquet as pq

        src = pq.read_table(
            queryset.transcripts_for_sf(sf), columns=["conv_id", "tool"]
        ).to_pandas()
        tools = src[src["tool"].fillna("") != ""]
        expected = len(tools) - tools["conv_id"].nunique()
        assert int(out["n"].sum()) == expected
        sql = queryset.oracle_sql_for(sf)["tool_transition_counts"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestEventsBurstWindows:
    """X192: a planted burst localizes to its exact start minute with
    first-window tie-breaking; short spans report whole-span totals;
    DuckDB parity."""

    def test_planted_burst(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            events_burst_windows,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # a: 1 event/min for 300 minutes, plus a 50-event burst in
        # minutes 100-119 -> peak window must start at minute 61..100;
        # exact: window [41,100]..[100,159] all contain the burst; the
        # MAX total is burst(50 over 20 min) + 60 singles... the best
        # window covers all 20 burst minutes: starts in [60, 100];
        # first-max tie-break -> start = minute 60+... compute: every
        # window fully containing [100,119] has sum 60 + 50; first such
        # start = 60. Earlier windows contain less of the burst.
        for i in range(300):
            rows.append((t0 + dt.timedelta(minutes=i), "a"))
        for i in range(100, 120):
            for _ in range(5):  # +5 extra per burst minute -> 50... 100
                rows.append((t0 + dt.timedelta(minutes=i), "a"))
        # s: 3 events in 2 minutes (span < window)
        rows.append((t0, "s"))
        rows.append((t0 + dt.timedelta(minutes=1), "s"))
        rows.append((t0 + dt.timedelta(minutes=1), "s"))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = events_burst_windows(str(tmp_path)).set_index("event_type")
        epoch_min = int(t0.timestamp()) // 60
        a = out.loc["a"]
        # windows fully containing the burst: starts 60..100; first wins
        assert int(a["peak_start_minute"]) == epoch_min + 60
        assert int(a["peak_count"]) == 60 + 20 * 5
        assert int(a["n_minutes"]) == 300
        s = out.loc["s"]
        assert int(s["peak_count"]) == 3
        assert int(s["n_minutes"]) == 2
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_burst_windows"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestFirstTouchAttribution:
    """X193: deterministic (ts, event_id) first-touch incl. a timestamp
    tie, conversion flags from anywhere in the timeline; parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            first_touch_attribution,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        t0 = dt.datetime(2024, 1, 1)
        rows = [  # (event_id, ts, user, type)
            # user 1: tie at t0 -> event_id 1 wins -> first=view; converts
            (2, t0, 1, "click"),
            (1, t0, 1, "view"),
            (3, t0 + dt.timedelta(60), 1, "purchase"),
            # user 2: first=view; never purchases
            (4, t0, 2, "view"),
            (5, t0 + dt.timedelta(60), 2, "click"),
            # user 3: first IS a purchase
            (6, t0, 3, "purchase"),
        ]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = first_touch_attribution(str(tmp_path)).set_index("first_type")
        v = out.loc["view"]
        assert int(v["n_users"]) == 2  # users 1 (tie-break) and 2
        assert int(v["n_converted"]) == 1
        assert int(v["cvr_e6"]) == 500_000
        p = out.loc["purchase"]
        assert int(p["n_users"]) == 1
        assert int(p["cvr_e6"]) == 1_000_000
        assert "click" not in out.index  # never anyone's first touch
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["first_touch_attribution"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestEventsDispersionIndex:
    """X194: a metronome type reads 0 (constant per-minute counts), a
    burst-everything-in-one-minute type reads n_minutes - mean... i.e.
    maximal dispersion; hand-computed values; DuckDB parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            events_dispersion_index,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # flat: exactly 2/min for 10 minutes -> variance 0 -> D = 0
        for i in range(10):
            rows += [(t0 + dt.timedelta(minutes=i), "flat")] * 2
        # burst: 10 events all in minute 0, one in minute 9 (span 10)
        # x = (10,0,...,0,1); n=10 sx=11 sxx=101
        # D = (10*101 - 121)/(10*11) = 889/110 = 8.081818...
        rows += [(t0, "burst")] * 10
        rows += [(t0 + dt.timedelta(minutes=9), "burst")]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = events_dispersion_index(str(tmp_path)).set_index("event_type")
        assert int(out.loc["flat", "dispersion_e6"]) == 0
        assert int(out.loc["burst", "dispersion_e6"]) == 8_081_818
        assert int(out.loc["burst", "n_minutes"]) == 10
        assert int(out.loc["burst", "n_events"]) == 11
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["events_dispersion_index"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestExtractShrinkageProfile:
    """X195: html shrinks (boilerplate dropped), no kind GROWS text
    beyond small joiner effects, char sums reconcile with the flagship;
    golden-table parity."""

    def test_invariants_and_parity(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            extract_shrinkage_profile,
        )

        sf = "/root/testdata/sf0.001"
        out = extract_shrinkage_profile(sf).set_index("content_kind")
        assert len(out) > 0
        # html must lose most of its markup
        assert int(out.loc["html", "keep_e6"]) < 600_000
        # no kind keeps more than ~101% (joiner chars can add slightly)
        assert (out["keep_e6"] <= 1_010_000).all()
        sql = queryset.oracle_sql_for(sf)["extract_shrinkage_profile"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestUserStickiness:
    """X196: always-on user reads 1e6, one-hour users read 1e6/24,
    duplicate events in the same hour count once; DuckDB parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            user_stickiness,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: active every hour of day 0 (two events in hour 0 -> once)
        for h in range(24):
            rows.append((1, t0 + dt.timedelta(hours=h)))
        rows.append((1, t0 + dt.timedelta(minutes=30)))
        # user 2: one hour only
        rows.append((2, t0 + dt.timedelta(hours=5)))
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = user_stickiness(str(tmp_path))
        assert len(out) == 1
        r = out.iloc[0]
        assert int(r["dau"]) == 2
        assert int(r["hau_sum"]) == 25  # 24 + 1
        # 25 / (24*2) = 0.520833...
        assert int(r["stickiness_e6"]) == 520_833
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["user_stickiness"]).df()
        assert _value_hash(out) == _value_hash(gold)


class TestTypeHourProfileSimilarity:
    """X197: identical rhythms read 1e6, disjoint hours read exactly 0
    (the LEFT-JOIN edge), orthogonality respected; DuckDB parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            type_hour_profile_similarity,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # a and b: the same 9am/10am rhythm (different volumes — cosine
        # is scale-free) -> 1e6
        for d in range(2):
            rows.append((t0 + dt.timedelta(days=d, hours=9), "a"))
            rows.append((t0 + dt.timedelta(days=d, hours=10), "a"))
            rows += [(t0 + dt.timedelta(days=d, hours=9), "b")] * 3
            rows += [(t0 + dt.timedelta(days=d, hours=10), "b")] * 3
        # night: only 2am -> disjoint from a/b -> cosine exactly 0
        rows.append((t0 + dt.timedelta(hours=2), "night"))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = type_hour_profile_similarity(str(tmp_path)).set_index(
            ["type_a", "type_b"]
        )
        assert int(out.loc[("a", "b"), "cosine_e6"]) == 1_000_000
        assert int(out.loc[("a", "night"), "cosine_e6"]) == 0
        assert int(out.loc[("b", "night"), "cosine_e6"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        gold = con.execute(ORACLE_SQL["type_hour_profile_similarity"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestExtractSpansPerTurn:
    """X198: totals reconcile with the flagship, buckets capped at 10,
    empty turns land in bucket 0; golden-table parity."""

    def test_invariants_and_parity(self, ray_session):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            extract_spans_per_turn,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            extract_transcripts,
        )

        sf = "/root/testdata/sf0.001"
        out = extract_spans_per_turn(sf)
        assert len(out) > 0
        assert out["spans_bucket"].between(0, 10).all()
        total = extract_transcripts(queryset.transcripts_for_sf(sf)).count()
        assert int(out["n_turns"].sum()) == total
        # empty payloads extract zero spans -> bucket 0 exists
        assert (out["spans_bucket"] == 0).any()
        sql = queryset.oracle_sql_for(sf)["extract_spans_per_turn"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestTaxRatePeriods:
    """X199: exact rate/day ranges; pure-integer contract; parity."""

    def test_hand_computed(self, ray_session, tmp_path):
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            tax_rate_periods,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        d0 = dt.datetime(2020, 1, 1)
        epoch0 = (d0 - dt.datetime(1970, 1, 1)).days
        pq.write_table(
            pa.table(
                {
                    "l_tax": pa.array([0.05, 0.05, 0.08], pa.float64()),
                    "l_shipdate": pa.array(
                        [d0, d0 + dt.timedelta(days=10), d0 + dt.timedelta(days=3)],
                        pa.timestamp("us"),
                    ),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = tax_rate_periods(str(tmp_path)).set_index("tax_e2")
        assert int(out.loc[5, "n_lines"]) == 2
        assert int(out.loc[5, "first_day"]) == epoch0
        assert int(out.loc[5, "span_days"]) == 10
        assert int(out.loc[8, "span_days"]) == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')"
        )
        gold = con.execute(ORACLE_SQL["tax_rate_periods"]).df()
        assert _value_hash(out.reset_index()) == _value_hash(gold)


class TestConversationStructureAudit:
    """X200: first/last roles from exact turn_idx endpoints over the
    known corpus, shares sum to ~1e6; parity at sf0.001."""

    def test_invariants_and_parity(self, ray_session):
        import duckdb
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            conversation_structure_audit,
        )

        sf = "/root/testdata/sf0.001"
        out = conversation_structure_audit(sf)
        assert len(out) > 0
        src = pq.read_table(
            queryset.transcripts_for_sf(sf),
            columns=["conv_id", "turn_idx", "role"],
        ).to_pandas()
        assert int(out["n_convs"].sum()) == src["conv_id"].nunique()
        # pin one conversation's endpoints independently
        conv = src["conv_id"].iloc[0]
        sub = src[src["conv_id"] == conv].sort_values("turn_idx")
        fr, lr = sub["role"].iloc[0], sub["role"].iloc[-1]
        row = out[(out["first_role"] == fr) & (out["last_role"] == lr)]
        assert len(row) == 1 and int(row["n_convs"].iloc[0]) >= 1
        assert abs(int(out["share_e6"].sum()) - 1_000_000) <= len(out)
        sql = queryset.oracle_sql_for(sf)["conversation_structure_audit"]
        gold = duckdb.connect().execute(sql).df()
        assert _value_hash(out) == _value_hash(gold)


class TestCustomerSegmentNationChi2:
    """X201: independent grid reads chi2 0 / V 0; perfectly associated
    grid reads V exactly 1e6; DuckDB parity on both."""

    @staticmethod
    def _tables(segs, keys, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "c_mktsegment": pa.array(segs, pa.string()),
                    "c_nationkey": pa.array(keys, pa.int32()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0, 1], pa.int32()),
                    "n_name": pa.array(["X", "Y"], pa.string()),
                }
            ),
            tmp_path / "nation.parquet",
        )

    def _gold(self, tmp_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.queryset import ORACLE_SQL

        con = duckdb.connect()
        for t in ("customer", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        return con.execute(ORACLE_SQL["customer_segment_nation_chi2"]).df()

    def test_independent(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            customer_segment_nation_chi2,
        )

        segs = ["A"] * 4 + ["B"] * 4
        keys = [0, 0, 1, 1] * 2
        self._tables(segs, keys, tmp_path)
        out = customer_segment_nation_chi2(str(tmp_path))
        assert int(out["chi2_e6"].iloc[0]) == 0
        assert int(out["cramers_v_e6"].iloc[0]) == 0
        assert int(out["dof"].iloc[0]) == 1
        assert _value_hash(out) == _value_hash(self._gold(tmp_path))

    def test_perfect_association(self, ray_session, tmp_path):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.diagnostics import (
            customer_segment_nation_chi2,
        )

        segs = ["A"] * 3 + ["B"] * 3
        keys = [0, 0, 0, 1, 1, 1]
        self._tables(segs, keys, tmp_path)
        out = customer_segment_nation_chi2(str(tmp_path))
        assert int(out["n_obs"].iloc[0]) == 6
        assert int(out["chi2_e6"].iloc[0]) == 6_000_000  # chi2 = N
        assert int(out["cramers_v_e6"].iloc[0]) == 1_000_000
        assert _value_hash(out) == _value_hash(self._gold(tmp_path))
