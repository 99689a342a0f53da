"""Randomized parity pins for the SQL-twin hash/bit contracts.

Each engine-side helper added in round 4 has a DuckDB expression twin
embedded in an oracle string. These fuzzes evaluate BOTH sides over
hundreds of random inputs at the FUNCTION level (no Ray, no corpus), so a
DuckDB upgrade or a helper edit that moves any contract fails loudly and
points at the exact expression — the same role the quantile-interpolation
fuzz plays for the float contracts.
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


class TestHllRhoTwin:
    def test_rho_matches_bin_ltrim_expression(self, con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import (
            HLL_RHO_BITS,
            hll_rho,
        )

        rng = np.random.default_rng(7)
        vals = [0, 1, 2**HLL_RHO_BITS - 1, 2 ** (HLL_RHO_BITS - 1)] + [
            int(x) for x in rng.integers(0, 2**HLL_RHO_BITS, size=400)
        ]
        rows = con.execute(
            f"SELECT v, {HLL_RHO_BITS + 1} - length(ltrim(bin(v), '0')) FROM "
            "(SELECT unnest(?::BIGINT[]) AS v)",
            [vals],
        ).fetchall()
        for v, sql_rho in rows:
            assert hll_rho(int(v)) == sql_rho, v

    def test_bucket_and_rho_slices_match_md5(self, con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import hll_rho

        rng = np.random.default_rng(11)
        users = [str(int(u)) for u in rng.integers(0, 10**9, size=200)]
        rows = con.execute(
            "SELECT u, ('0x' || substr(md5(u), 1, 2))::INT,"
            " ('0x' || substr(md5(u), 3, 12))::BIGINT"
            " FROM (SELECT unnest(?::VARCHAR[]) AS u)",
            [users],
        ).fetchall()
        for u, sql_bucket, sql_slice in rows:
            hx = hashlib.md5(u.encode()).hexdigest()
            assert int(hx[0:2], 16) == sql_bucket
            assert int(hx[2:14], 16) == sql_slice
            assert 1 <= hll_rho(int(hx[2:14], 16)) <= 49


class TestBloomPositionTwin:
    def test_positions_match_sql_slices(self, con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.delta import (
            BLOOM_K,
            BLOOM_POS_HEX,
            _bloom_positions,
        )

        rng = np.random.default_rng(13)
        fps = [
            hashlib.md5(bytes(rng.integers(0, 256, size=24, dtype=np.uint8))).hexdigest()
            for _ in range(200)
        ]
        exprs = ", ".join(
            f"('0x' || substr(fp, {1 + j * BLOOM_POS_HEX}, {BLOOM_POS_HEX}))::BIGINT"
            for j in range(BLOOM_K)
        )
        rows = con.execute(
            f"SELECT fp, {exprs} FROM (SELECT unnest(?::VARCHAR[]) AS fp)", [fps]
        ).fetchall()
        for row in rows:
            assert _bloom_positions(row[0]) == list(row[1:])


class TestCountMinBucketTwin:
    def test_buckets_match_sql_mod(self, con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.sketches import CM_D, CM_W

        rng = np.random.default_rng(17)
        toks = [f"tok{int(x)}" for x in rng.integers(0, 10**7, size=300)]
        exprs = ", ".join(
            f"('0x' || substr(md5(t), {1 + 5 * j}, 5))::BIGINT % {CM_W}"
            for j in range(CM_D)
        )
        rows = con.execute(
            f"SELECT t, {exprs} FROM (SELECT unnest(?::VARCHAR[]) AS t)", [toks]
        ).fetchall()
        for row in rows:
            h = hashlib.md5(row[0].encode()).hexdigest()
            for j in range(CM_D):
                assert int(h[j * 5 : j * 5 + 5], 16) % CM_W == row[1 + j]


class TestPrioritySamplingChainTwin:
    def test_float_chain_is_bit_identical(self, con):
        """w·2^48/(h+1): every step is one correctly-rounded IEEE op on
        exact inputs — numpy and DuckDB must agree to the LAST BIT (the
        ordering of the weighted sample rides on unrounded values)."""
        rng = np.random.default_rng(19)
        ws = rng.integers(1, 100_000, size=300)
        hs = rng.integers(0, 2**48, size=300)
        rows = con.execute(
            f"SELECT w, h, (w * {float(1 << 48)!r}) / CAST(h + 1 AS DOUBLE)"
            " FROM (SELECT unnest(?::BIGINT[]) AS w, unnest(?::BIGINT[]) AS h)",
            [[int(w) for w in ws], [int(h) for h in hs]],
        ).fetchall()
        for w, h, sql_q in rows:
            np_q = np.float64(w) * float(1 << 48) / np.float64(h + 1)
            assert np_q == sql_q, (w, h)


class TestTruncatingDivisionTwin:
    def test_week_bucketing_matches_duckdb_on_pre_epoch(self, con):
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.windows import WEEK_US

        rng = np.random.default_rng(23)
        us = np.concatenate(
            [
                rng.integers(-5 * WEEK_US, 5 * WEEK_US, size=200),
                np.array([0, -1, 1, WEEK_US, -WEEK_US, -WEEK_US - 1, WEEK_US - 1]),
            ]
        )
        rows = con.execute(
            f"SELECT v, v // {WEEK_US} FROM (SELECT unnest(?::BIGINT[]) AS v)",
            [[int(v) for v in us]],
        ).fetchall()
        for v, sql_wk in rows:
            q = int(v) // WEEK_US
            if v < 0 and v - q * WEEK_US != 0:
                q += 1  # the engine's trunc correction (windows.per_user)
            assert q == sql_wk, v
