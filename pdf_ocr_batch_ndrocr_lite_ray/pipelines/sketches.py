"""Mergeable sketches: distinct counts and quantiles at corpus scale.

The reference computes no distinct-counts or quantiles (SURVEY.md §2.7);
these are the sketch operators a 10^12-row pipeline needs, built as
**per-block sketch → merge** so the exchange carries sketches, not rows:

- ``events_distinct_users``: EXACT distinct count per group — per-block
  distinct pairs, pair-level groupby, then count per group. SQL-oracled.
- ``docs_distinct_shingles_kmv``: KMV (k-minimum-values) cardinality
  estimate of the corpus' distinct shingle count. One k-sized sketch per
  block, one merge — estimate = (k-1) / max_of_k_min_hashes. Approximate →
  rows-only; the error bound vs the exact count is asserted in tests
  (cf. "Quantile Sketches over Data Streams", EDBT 2023 family).
- ``events_value_quantiles``: fixed-bin histogram quantile estimator over
  ``events.value`` — per-block histograms merge by vector addition;
  quantiles read off the cumulative distribution (error ≤ bin width).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

from .dedup import _doc_shingles
from .exchange import rename
from .queryset import register, table_path

KMV_K = 1024
QUANT_BINS = 2048
QUANT_LO, QUANT_HI = 0.0, 1024.0  # events.value domain guess; clamped
QUANTILES = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


# --- exact distinct count per group (SQL-oracled) --------------------------

def events_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, n_users): exact distinct user count per event type.

    Per-block distinct pairs collapse duplicates early; ONE hash exchange
    on ``user_id`` then makes the per-partition dedup global (each user
    lives in exactly one partition, so per-partition distinct counts sum
    to the true distinct count). The bounded (event_type, n) partials fold
    on the driver. Replaces a multi-key ``groupby().aggregate(Count())``
    chain that paid two sort shuffles for the same answer (7.3 s → ~1.5 s
    at sf0.1)."""
    from .dedup import _hash_partitioned
    from .exchange import enum_group_sum

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch["event_type"], "user_id": batch["user_id"]})
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return g

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["event_type", "user_id"])
        g = u.groupby("event_type", sort=False).size().reset_index(name="n_users")
        g["n_users"] = g["n_users"].astype("int64")
        return g

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_type", "user_id"]
    ).map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)
    partials = _hash_partitioned(ds, "user_id", per_partition)
    return ray.data.from_pandas(enum_group_sum(partials, ["event_type"], ["n_users"]))


EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# --- KMV distinct-count sketch (approximate, rows-only) --------------------

def _kmv_hash(values: list[str]) -> np.ndarray:
    # first 8 md5 bytes (not blake2b): DuckDB reproduces this as
    # ('0x' || substr(md5(v), 1, 16))::UBIGINT, which makes the whole
    # sketch VALUE oracle-checkable (the sketch is a deterministic
    # function; only its relation to the true cardinality is approximate)
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "big")
    return out


def kmv_estimate(min_hashes: np.ndarray, k: int = KMV_K) -> float:
    """Cardinality estimate from the k smallest 64-bit hashes seen."""
    if len(min_hashes) < k:
        return float(len(min_hashes))  # saw fewer than k distinct values
    kth = float(np.sort(min_hashes)[k - 1])
    return (k - 1) / (kth / float(2**64))


def kmv_merge(*arrays) -> np.ndarray:
    """Merge k-min sketches: union the hash arrays, keep the K smallest.

    THE one copy of the merge contract — every KMV site (corpus shingles,
    grouped users, table profiler) folds through this."""
    return np.unique(
        np.concatenate([np.asarray(a, dtype=np.uint64) for a in arrays])
    )[:KMV_K]


def kmv_estimate_sql(n: str = "n", kth: str = "kth") -> str:
    """SQL twin of ``kmv_estimate`` — the CASE fragment over a (count,
    max-of-k-min-hashes) pair; shared by every KMV oracle so the estimator
    constant and rounding rule live in one place."""
    return (
        f"CASE WHEN {n} < {KMV_K} THEN {n} "
        f"ELSE CAST(round(({KMV_K} - 1) / ({kth} / 18446744073709551616.0), 0) AS BIGINT) "
        "END"
    )


def docs_distinct_shingles_kmv(sf_dir: str) -> "ray.data.Dataset":
    """One-row result: (estimate, k) — approx distinct word-trigram count."""

    def block_sketch(batch: pa.Table) -> pa.Table:
        # running k-min sketch: memory is bounded by k + one doc's hashes,
        # independent of the block's total distinct-shingle cardinality
        smallest = np.empty(0, dtype=np.uint64)
        for text in batch["text"].to_pylist():
            doc_hashes = _kmv_hash(sorted(_doc_shingles(text or "")))
            smallest = kmv_merge(smallest, doc_hashes)
        return pa.table(
            {"min_hashes": pa.array([smallest.tolist()], type=pa.list_(pa.uint64()))}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        merged = kmv_merge(*df["min_hashes"])
        est = kmv_estimate(merged)
        # half-away rounding matches DuckDB round(); est is positive
        return pd.DataFrame({"estimate": pd.Series([int(np.floor(est + 0.5))], dtype="int64"),
                             "k": pd.Series([KMV_K], dtype="int64")})

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["text"]
    ).map_batches(block_sketch, batch_format="pyarrow")
    # all block sketches merge in ONE reduce row (sketches are k-sized)
    return ds.repartition(1).map_batches(merge, batch_format="pandas", batch_size=None)


# --- histogram quantile sketch (approximate, rows-only) --------------------

def events_value_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """(q, value_estimate): histogram-sketch quantiles of events.value.

    The bin domain comes from a cheap column-pruned min/max PRE-PASS, not a
    hard-coded guess — a guessed domain silently clamps (and biases) any
    value distribution that moves outside it.
    """
    source = ray.data.read_parquet(table_path(sf_dir, "events"), columns=["value"])

    from ray.data.aggregate import Max, Min

    mm = source.aggregate(Min("value"), Max("value"))
    lo = float(mm.get("min(value)", QUANT_LO))
    hi = float(mm.get("max(value)", QUANT_HI))
    if not (np.isfinite(lo) and np.isfinite(hi)) or hi <= lo:
        lo, hi = QUANT_LO, QUANT_HI
    edges = np.linspace(lo, hi, QUANT_BINS + 1)

    def block_hist(batch: pa.Table) -> pa.Table:
        vals = np.clip(
            batch["value"].to_numpy(zero_copy_only=False).astype(np.float64),
            lo,
            hi,
        )
        hist, _ = np.histogram(vals, bins=edges)
        return pa.table({"hist": pa.array([hist.tolist()], type=pa.list_(pa.int64()))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        total = np.sum(
            [np.asarray(h, dtype=np.int64) for h in df["hist"]], axis=0
        )
        cum = np.cumsum(total)
        n = cum[-1]
        qs, vals = [], []
        for q in QUANTILES:
            idx = int(np.searchsorted(cum, q * n, side="left"))
            e = float(edges[min(idx + 1, QUANT_BINS)])
            # half-away rounding matches DuckDB round()
            vals.append(float(np.sign(e) * np.floor(abs(e) * 1e6 + 0.5) / 1e6))
            qs.append(q)
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value_estimate": pd.Series(vals, dtype="float64")})

    ds = source.map_batches(block_hist, batch_format="pyarrow")
    return ds.repartition(1).map_batches(merge, batch_format="pandas", batch_size=None)


#: the histogram-sketch quantile VALUE is deterministic given the data:
#: same min/max domain, same 2048 uniform bins, same first-cum-≥-target
#: pick, same upper-edge readout — so it gets a full oracle. Only its
#: relation to the true quantile is approximate (bin-width error bound,
#: asserted in tests).
EVENTS_QUANTILES_SQL = f"""
WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
b AS (
  SELECT least(CAST(floor((value - mm.lo) / (mm.hi - mm.lo) * {QUANT_BINS}) AS INT),
               {QUANT_BINS} - 1) AS bin
  FROM events, mm
),
hist AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
cum AS (
  SELECT bin, sum(c) OVER (ORDER BY bin) AS cum,
         (SELECT count(*) FROM events) AS n
  FROM hist
),
qs(q) AS (VALUES {", ".join(f"({q})" for q in QUANTILES)}),
pick AS (
  SELECT q, min(bin) AS idx FROM qs JOIN cum ON cum.cum >= q * cum.n GROUP BY q
)
SELECT q,
       round(mm.lo + (mm.hi - mm.lo) * least(idx + 1, {QUANT_BINS}) / {QUANT_BINS}, 6)
         AS value_estimate
FROM pick, mm
"""


#: the KMV sketch VALUE is deterministic, so it gets a full oracle: same
#: distinct-shingle set, same md5-derived 64-bit hashes, same k-min — the
#: only "approximation" is the estimate's relation to the true cardinality
#: (asserted separately in tests).
DOCS_KMV_SQL = f"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
s AS (
  SELECT CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
              ELSE ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT)+1] || ' ' || ws[CAST(i AS INT)+2]
         END AS sh
  FROM w, LATERAL UNNEST(generate_series(1, greatest(len(ws)-2, CASE WHEN len(ws) > 0 THEN 1 ELSE 0 END))) u(i)
),
d AS (SELECT DISTINCT sh FROM s),
h AS (SELECT ('0x' || substr(md5(sh), 1, 16))::UBIGINT AS hv FROM d),
k AS (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K}),
agg AS (SELECT count(*) AS n, max(hv) AS kth FROM k)
SELECT {kmv_estimate_sql()} AS estimate,
       {KMV_K} AS k
FROM agg
"""

# --- grouped histogram quantile sketch --------------------------------------

def _round6_half_away(x: float) -> float:
    return float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6)


def events_quantiles_by_type(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, q, value_estimate): per-group histogram-sketch quantiles
    — the per-source length/quality-cut shape a training-data pipeline
    needs. Mergeable by construction: each block emits one B-bin count
    vector PER GROUP it saw; group vectors add; quantiles read off the
    group's cumulative distribution (error ≤ its bin width).

    The per-type domain comes from a column-pruned groupby min/max
    pre-pass (a handful of rows — broadcast, not re-shipped per batch).
    Bin assignment uses the explicit ``floor((v-lo)/(hi-lo)*B)`` formula
    (clamped to B-1) so the SQL oracle is bit-identical. A degenerate type
    (all values equal) reports that value at every quantile.
    """
    import ray as ray_core

    source = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_type", "value"]
    )
    # per-batch partial min/max folded on the driver (enum-bounded types) —
    # the prior Ray groupby sort-shuffled every event row for a 5-row answer
    from .exchange import enum_group_agg

    def mm_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "lo": batch["value"],
                "hi": batch["value"],
            }
        )
        g = t.group_by("event_type").aggregate([("lo", "min"), ("hi", "max")])
        return g.rename_columns(["event_type", "lo", "hi"])

    mm = enum_group_agg(
        source.map_batches(mm_partial, batch_format="pyarrow"),
        ["event_type"],
        {"lo": "min", "hi": "max"},
    )
    domains = {
        t: (float(lo), float(hi))
        for t, lo, hi in zip(mm["event_type"], mm["lo"], mm["hi"])
    }
    ref = ray_core.put(domains)

    def block_hists(batch: pa.Table) -> pa.Table:
        doms = ray_core.get(ref)
        types_out: list[str] = []
        hists_out: list[list[int]] = []
        tdf = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "value": batch["value"].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        for t, g in tdf.groupby("event_type", sort=True):
            lo, hi = doms[t]
            if hi <= lo:
                continue  # degenerate type: handled at readout from domains
            idx = np.floor((g["value"].to_numpy() - lo) / (hi - lo) * QUANT_BINS)
            idx = np.minimum(idx.astype(np.int64), QUANT_BINS - 1)
            hists_out.append(np.bincount(idx, minlength=QUANT_BINS).tolist())
            types_out.append(t)
        return pa.table(
            {
                "event_type": pa.array(types_out, type=pa.string()),
                "hist": pa.array(hists_out, type=pa.list_(pa.int64())),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        doms = ray_core.get(ref)
        types, qs, vals = [], [], []
        merged_types = set()
        for t, g in df.groupby("event_type", sort=True):
            lo, hi = doms[t]
            total = np.sum([np.asarray(h, dtype=np.int64) for h in g["hist"]], axis=0)
            cum = np.cumsum(total)
            n = cum[-1]
            for q in QUANTILES:
                idx = int(np.searchsorted(cum, q * n, side="left"))
                e = lo + (hi - lo) * min(idx + 1, QUANT_BINS) / QUANT_BINS
                types.append(t)
                qs.append(q)
                vals.append(_round6_half_away(e))
            merged_types.add(t)
        # degenerate types never emitted a histogram: constant value
        for t, (lo, hi) in sorted(doms.items()):
            if hi <= lo and t not in merged_types:
                for q in QUANTILES:
                    types.append(t)
                    qs.append(q)
                    vals.append(_round6_half_away(hi))
        return pd.DataFrame(
            {
                "event_type": pd.Series(types, dtype="object"),
                "q": pd.Series(qs, dtype="float64"),
                "value_estimate": pd.Series(vals, dtype="float64"),
            }
        )

    ds = source.map_batches(block_hists, batch_format="pyarrow")
    # B-bin vectors per (block, type): tiny — one reduce row merges them all
    return ds.repartition(1).map_batches(merge, batch_format="pandas", batch_size=None)


EVENTS_QUANTILES_BY_TYPE_SQL = f"""
WITH mm AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi, count(*) AS n
  FROM events GROUP BY event_type
),
b AS (
  SELECT e.event_type,
         least(CAST(floor((e.value - mm.lo) / (mm.hi - mm.lo) * {QUANT_BINS}) AS INT),
               {QUANT_BINS} - 1) AS bin
  FROM events e JOIN mm USING (event_type)
  WHERE mm.hi > mm.lo
),
hist AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM hist
),
qs(q) AS (VALUES {", ".join(f"({q})" for q in QUANTILES)}),
pick AS (
  SELECT c.event_type, q, min(bin) AS idx
  FROM qs JOIN cum c ON c.cum >= q * (SELECT n FROM mm WHERE mm.event_type = c.event_type)
  GROUP BY 1, 2
)
SELECT p.event_type, q,
       round(mm.lo + (mm.hi - mm.lo) * least(idx + 1, {QUANT_BINS}) / {QUANT_BINS}, 6)
         AS value_estimate
FROM pick p JOIN mm USING (event_type)
UNION ALL
SELECT mm.event_type, q, round(mm.hi, 6) AS value_estimate
FROM mm, qs WHERE mm.hi <= mm.lo
"""


register("events_distinct_users", events_distinct_users, sql=EVENTS_DISTINCT_USERS_SQL)
register("docs_distinct_shingles_kmv", docs_distinct_shingles_kmv, sql=DOCS_KMV_SQL)
register("events_value_quantiles", events_value_quantiles, sql=EVENTS_QUANTILES_SQL)
register(
    "events_quantiles_by_type",
    events_quantiles_by_type,
    sql=EVENTS_QUANTILES_BY_TYPE_SQL,
)


# --- grouped KMV distinct sketch --------------------------------------------

def events_distinct_users_kmv(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, estimate, k): per-group KMV distinct-user estimate.

    The mergeable-sketch-per-group shape that replaces
    ``events_distinct_users`` at scale: the exact version must exchange
    every distinct (type, user) pair, while each KMV summary is ≤ k
    hashes per group REGARDLESS of group cardinality — per-block
    summaries stream to a bounded driver fold (#types × k values held),
    the same merge law as the global shingle sketch. As there, the
    sketch VALUE is deterministic (md5-derived k-min), so the oracle is
    exact; only the estimate↔truth relation is approximate.
    """

    def block_sketch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            ids = g["user_id"].drop_duplicates()
            # str(int) pairs with SQL md5(CAST(user_id AS VARCHAR))
            h = np.unique(_kmv_hash([str(int(u)) for u in ids]))[:KMV_K]
            rows.append((et, h.tolist()))
        return pd.DataFrame(rows, columns=["event_type", "min_hashes"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_type", "user_id"]
    ).map_batches(block_sketch, batch_format="pandas")

    merged: dict[str, np.ndarray] = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for et, mh in zip(b["event_type"], b["min_hashes"]):
            prev = merged.get(et, np.empty(0, dtype=np.uint64))
            cat = np.concatenate([prev, np.asarray(mh, dtype=np.uint64)])
            merged[et] = np.unique(cat)[:KMV_K]
    rows = []
    for et in sorted(merged):
        est = kmv_estimate(merged[et])
        rows.append((et, int(np.floor(est + 0.5)), KMV_K))
    out = pd.DataFrame(rows, columns=["event_type", "estimate", "k"])
    return ray.data.from_pandas(
        out.astype({"estimate": "int64", "k": "int64"})
        if len(out)
        else pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "estimate": pd.Series(dtype="int64"),
                "k": pd.Series(dtype="int64"),
            }
        )
    )


EVENTS_KMV_SQL = f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS hv
  FROM d
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
k AS (SELECT event_type, hv FROM r WHERE rn <= {KMV_K}),
agg AS (SELECT event_type, count(*) AS n, max(hv) AS kth FROM k GROUP BY event_type)
SELECT event_type,
       {kmv_estimate_sql()} AS estimate,
       {KMV_K} AS k
FROM agg
"""

register("events_distinct_users_kmv", events_distinct_users_kmv, sql=EVENTS_KMV_SQL)


# --- HyperLogLog distinct sketch --------------------------------------------

HLL_M = 256  # 2^8 registers; bucket = first md5 byte
HLL_RHO_BITS = 48  # rank read from the next 12 hex chars (< 2^53: exact DOUBLE)
#: alpha_m * m^2 for m = 256 (Flajolet et al. 2007) — ONE Python float,
#: inlined into the SQL via repr so both engines multiply the identical
#: constant
HLL_C = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M


def hll_rho(v: int) -> int:
    """Rank of a 48-bit hash slice: leading zeros + 1 (v == 0 → 49).

    SQL twin: ``49 - length(ltrim(bin(v), '0'))`` — ``bin`` drops leading
    zeros, so its length IS the bit length, and ``ltrim`` maps v = 0 to
    length 0 (rho 49) exactly like ``int.bit_length``.
    """
    return HLL_RHO_BITS + 1 - v.bit_length()


def hll_estimate(v_empty: int, s_num: int) -> float:
    """Estimate from (empty-register count, exact integer S·2^49) — THE one
    copy of the estimator chain; ``hll_estimate_sql`` is its SQL twin and
    must stay op-for-op identical (see ``events_distinct_users_hll``)."""
    import math

    e_raw = HLL_C * (float(1 << (HLL_RHO_BITS + 1)) / float(s_num))
    if v_empty > 0 and e_raw <= 2.5 * HLL_M:
        return HLL_M * math.log(HLL_M / v_empty)
    return e_raw


def hll_estimate_sql(v_empty: str = "v_empty", s_num: str = "s_num") -> str:
    """SQL twin of ``hll_estimate`` over a (v_empty BIGINT, s_num DOUBLE)
    pair, rounded to BIGINT — shared by the global and grouped HLL oracles."""
    e_raw = f"{HLL_C!r} * (CAST(1::BIGINT << {HLL_RHO_BITS + 1} AS DOUBLE) / {s_num})"
    return (
        f"CASE WHEN {v_empty} > 0 AND {e_raw} <= {2.5 * HLL_M!r} "
        f"THEN CAST(round({HLL_M} * ln({HLL_M} / {v_empty}), 0) AS BIGINT) "
        f"ELSE CAST(round({e_raw}, 0) AS BIGINT) END"
    )


def events_distinct_users_hll(sf_dir: str) -> "pa.Table":
    """One-row (n_users_hll): HyperLogLog distinct-user estimate.

    The third distinct-count shape next to the exact pair exchange and
    the KMV k-min fold: HLL's summary is a FIXED 256-byte register file
    per block — strictly smaller than KMV's k hashes and mergeable by
    element-wise max, which is what makes it the sketch of choice for
    per-key cardinalities over 10^12 rows. Per block: distinct users →
    md5 → (bucket = first byte, rho = leading-zero rank of the next 48
    bits) → local register max; the ≤ 256-row partials fold on the
    driver (bounded enum — same contract as ``enum_group_agg``).

    Like the KMV ops, the sketch VALUE is deterministic (md5-derived), so
    the oracle is exact; only the estimate↔truth relation is approximate
    (tests assert the error bound). Float parity: the raw estimate is
    ``C · (2^49 / S)`` where S = Σ 2^(49−rho_j) over all 256 registers is
    an EXACT integer (empty register → 2^49) — both engines convert the
    two exact integers to DOUBLE and perform the identical
    divide-multiply-round chain. The small-range branch (V empty
    registers, E ≤ 2.5m) is linear counting ``m·ln(m/V)`` — ln over the
    same exact-integer ratio in both engines (glibc libm on both sides;
    parity pinned by the blanket oracle loop).
    """
    from .exchange import enum_group_agg

    def block_registers(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        regs = np.zeros(HLL_M, dtype=np.int64)
        for u in np.unique(users):
            hx = hashlib.md5(str(int(u)).encode("utf-8")).hexdigest()
            bucket = int(hx[0:2], 16)
            rho = hll_rho(int(hx[2:14], 16))
            if rho > regs[bucket]:
                regs[bucket] = rho
        filled = np.nonzero(regs)[0]
        return pa.table(
            {
                "bucket": pa.array(filled.astype(np.int64)),
                "rho": pa.array(regs[filled]),
            }
        )

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id"]
    ).map_batches(block_registers, batch_format="pyarrow", zero_copy_batch=True)
    regs = enum_group_agg(ds, ["bucket"], {"rho": "max"})

    v_empty = HLL_M - len(regs)
    # S as an exact integer over the 2^-49 grid; then ONE convert-divide-
    # multiply chain — float(S) FIRST, mirroring DuckDB's int→DOUBLE cast
    # before the division (Python's exact-int true division would round
    # differently past 2^53)
    s_num = v_empty * (1 << (HLL_RHO_BITS + 1)) + int(
        np.sum(1 << (HLL_RHO_BITS + 1 - regs["rho"].to_numpy()))
    )
    est = hll_estimate(v_empty, s_num)
    return pa.table(
        {"n_users_hll": pa.array([int(np.floor(est + 0.5))], type=pa.int64())}
    )


EVENTS_HLL_SQL = f"""
WITH h AS (
  SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
),
r AS (
  SELECT ('0x' || substr(hx, 1, 2))::INT AS bucket,
         {HLL_RHO_BITS + 1}
           - length(ltrim(bin(('0x' || substr(hx, 3, 12))::BIGINT), '0')) AS rho
  FROM h
),
regs AS (SELECT bucket, max(rho) AS rho FROM r GROUP BY bucket),
s AS (
  SELECT ({HLL_M} - count(*)) AS v_empty,
         CAST(
           ({HLL_M} - count(*)) * (1::BIGINT << {HLL_RHO_BITS + 1})
           + coalesce(sum(1::BIGINT << ({HLL_RHO_BITS + 1} - rho)), 0)
         AS DOUBLE) AS s_num
  FROM regs
)
SELECT {hll_estimate_sql()} AS n_users_hll
FROM s
"""

register("events_distinct_users_hll", events_distinct_users_hll, sql=EVENTS_HLL_SQL)


def events_distinct_users_hll_by_type(sf_dir: str) -> "pa.Table":
    """(event_type, n_users_hll): the PER-KEY HyperLogLog — the shape that
    wins at 10^12 rows, where the exact pair exchange ships every distinct
    (key, user) pair but each key's HLL summary is a fixed 256-byte
    register file regardless of group cardinality. Per-block register
    files fold by (event_type, bucket) max — bounded partials
    (#types × 256), driver fold, same estimator chain as the global
    sketch (``hll_estimate`` / ``hll_estimate_sql``)."""
    from .exchange import enum_group_agg

    def block_registers(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            regs = np.zeros(HLL_M, dtype=np.int64)
            for u in g["user_id"].drop_duplicates():
                hx = hashlib.md5(str(int(u)).encode("utf-8")).hexdigest()
                bucket = int(hx[0:2], 16)
                rho = hll_rho(int(hx[2:14], 16))
                if rho > regs[bucket]:
                    regs[bucket] = rho
            filled = np.nonzero(regs)[0]
            for b in filled:
                rows.append((et, int(b), int(regs[b])))
        return pd.DataFrame(rows, columns=["event_type", "bucket", "rho"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_type", "user_id"]
    ).map_batches(block_registers, batch_format="pandas")
    regs = enum_group_agg(ds, ["event_type", "bucket"], {"rho": "max"})

    types, ests = [], []
    for et, g in regs.groupby("event_type", sort=True):
        v_empty = HLL_M - len(g)
        s_num = v_empty * (1 << (HLL_RHO_BITS + 1)) + int(
            np.sum(1 << (HLL_RHO_BITS + 1 - g["rho"].to_numpy()))
        )
        est = hll_estimate(v_empty, s_num)
        types.append(et)
        ests.append(int(np.floor(est + 0.5)))
    return pa.table(
        {
            "event_type": pa.array(types, type=pa.string()),
            "n_users_hll": pa.array(ests, type=pa.int64()),
        }
    )


EVENTS_HLL_BY_TYPE_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events
),
r AS (
  SELECT event_type,
         ('0x' || substr(hx, 1, 2))::INT AS bucket,
         {HLL_RHO_BITS + 1}
           - length(ltrim(bin(('0x' || substr(hx, 3, 12))::BIGINT), '0')) AS rho
  FROM h
),
regs AS (
  SELECT event_type, bucket, max(rho) AS rho FROM r GROUP BY event_type, bucket
),
s AS (
  SELECT event_type,
         ({HLL_M} - count(*)) AS v_empty,
         CAST(
           ({HLL_M} - count(*)) * (1::BIGINT << {HLL_RHO_BITS + 1})
           + coalesce(sum(1::BIGINT << ({HLL_RHO_BITS + 1} - rho)), 0)
         AS DOUBLE) AS s_num
  FROM regs GROUP BY event_type
)
SELECT event_type, {hll_estimate_sql()} AS n_users_hll
FROM s
"""

register(
    "events_distinct_users_hll_by_type",
    events_distinct_users_hll_by_type,
    sql=EVENTS_HLL_BY_TYPE_SQL,
)


# --- Count-Min frequency sketch ----------------------------------------------

CM_D = 4  # hash rows
CM_W = 1024  # buckets per row; 2^20-bit md5 slices mod 2^10 stay uniform


def docs_count_min(sf_dir: str) -> "ray.data.Dataset":
    """(row_id, bucket, n): the Count-Min sketch of the corpus token
    stream — d×w integer counters whose point query
    ``min_j counter[j][h_j(t)]`` upper-bounds any token's true count
    (never under), the mergeable frequency summary that answers "how
    often does X appear" without an unbounded term dictionary. Rounds
    out the sketch family: KMV/HLL (distinct), Misra-Gries (top-k),
    Bloom (membership), histogram (quantiles), Count-Min (frequency).

    Per block: tokenize (the ASCII ``\\S+`` contract shared with heavy
    hitters), one ``np.bincount`` per hash row → ≤ d×w partial rows;
    driver fold over the bounded (row_id, bucket) grid. Like every
    sketch here the VALUE is an exact md5 function of the data, so the
    DuckDB oracle reproduces the counter table cell for cell; only the
    estimate↔truth relation is approximate (the ≥-true and ≤-true+εN
    properties are asserted in tests).
    """
    from .exchange import enum_group_sum
    from .heavy import _tokens

    def block_counters(df: pd.DataFrame) -> pd.DataFrame:
        # THE tokenization contract lives in heavy._tokens — reusing it
        # keeps the Count-Min token stream synchronized with the
        # heavy-hitters stream by construction
        toks = _tokens(df["text"])
        if toks.empty:
            return pd.DataFrame(
                {
                    "row_id": pd.Series(dtype="int64"),
                    "bucket": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        uniq, counts = np.unique(toks.to_numpy(), return_counts=True)
        rows_out = []
        digs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in uniq]
        for j in range(CM_D):
            buckets = np.fromiter(
                (int(h[j * 5 : j * 5 + 5], 16) % CM_W for h in digs),
                dtype=np.int64,
                count=len(digs),
            )
            # int64 accumulation (np.add.at): float-weighted bincount sums in
            # float64, which is exact only below 2^53 — a silent-precision
            # hazard against the exact-integer-sum contract (ADVICE r4)
            cnt = np.zeros(CM_W, dtype=np.int64)
            np.add.at(cnt, buckets, counts)
            nz = np.nonzero(cnt)[0]
            rows_out.append(
                pd.DataFrame(
                    {
                        "row_id": np.full(len(nz), j, dtype=np.int64),
                        "bucket": nz.astype(np.int64),
                        "n": cnt[nz],
                    }
                )
            )
        return pd.concat(rows_out, ignore_index=True)

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["text"]
    ).map_batches(block_counters, batch_format="pandas")
    return ray.data.from_pandas(enum_group_sum(ds, ["row_id", "bucket"], ["n"]))


def count_min_lut(sketch) -> dict:
    """(row_id, bucket) → n lookup built ONCE from the sketch frame —
    point queries are O(d) against it instead of rebuilding the O(d·w)
    dict per token."""
    return {(int(r.row_id), int(r.bucket)): int(r.n) for r in sketch.itertuples()}


def count_min_estimate(sketch_or_lut, token: str) -> int:
    """Point query: min over hash rows of the token's counters (0 when a
    bucket row is absent). Accepts the (row_id, bucket, n) frame or a
    prebuilt ``count_min_lut`` dict."""
    lut = (
        sketch_or_lut
        if isinstance(sketch_or_lut, dict)
        else count_min_lut(sketch_or_lut)
    )
    h = hashlib.md5(token.encode("utf-8")).hexdigest()
    return min(
        lut.get((j, int(h[j * 5 : j * 5 + 5], 16) % CM_W), 0) for j in range(CM_D)
    )


DOCS_COUNT_MIN_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents
),
h AS (SELECT md5(token) AS hx FROM toks),
cells AS (
  SELECT j AS row_id,
         ('0x' || substr(hx, 1 + 5 * j, 5))::BIGINT % {CM_W} AS bucket
  FROM h, LATERAL UNNEST(generate_series(0, {CM_D - 1})) u(j)
)
SELECT row_id, bucket, CAST(count(*) AS BIGINT) AS n
FROM cells GROUP BY row_id, bucket
"""

register("docs_count_min", docs_count_min, sql=DOCS_COUNT_MIN_SQL)


# --- KMV join-size estimation (sketch intersection) -------------------------

def _key_kmv_sketch(col: str):
    """Block transform: per-block k-min sketch of a key column's distinct
    values (hashed as decimal strings — the md5 form DuckDB reproduces)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vals = pc.unique(c)
        h = _kmv_hash([str(v) for v in vals.to_pylist()])
        smallest = np.unique(h)[:KMV_K]
        return pa.table(
            {"min_hashes": pa.array([smallest.tolist()], type=pa.list_(pa.uint64()))}
        )

    return f


def _fold_kmv(ds: "ray.data.Dataset") -> np.ndarray:
    """Driver fold of block sketches — ≤ K hashes held at any moment."""
    acc = np.empty(0, dtype=np.uint64)
    for b in ds.iter_batches(batch_size=256, batch_format="pandas"):
        for arr in b["min_hashes"]:
            acc = kmv_merge(acc, np.asarray(arr, dtype=np.uint64))
    return acc


def orders_join_size_kmv(sf_dir: str) -> "pd.DataFrame":
    """(k, rho, union_estimate, intersect_estimate): estimated distinct-key
    overlap |keys(lineitem.l_orderkey) ∩ keys(orders.o_orderkey)| from two
    mergeable KMV sketches — the shuffle-free join-size planner's input.

    The estimator is the standard KMV intersection rule (Beyer et al.,
    "On Synopses for Distinct-Value Estimation", SIGMOD'07 — public):
    union the two k-min sketches, keep the K smallest; ``rho`` = how many
    of those live in BOTH sketches; Jaccard ≈ rho/K̂ and the intersection
    ≈ Jaccard × union-cardinality-estimate. Every step is a deterministic
    function of the md5 hashes, so the VALUE is fully oracle-checkable;
    only its relation to the true overlap is approximate (asserted in
    tests). Each side costs one column scan emitting K-bounded partials —
    nothing is joined, nothing is shuffled.
    """
    a = _fold_kmv(
        ray.data.read_parquet(
            table_path(sf_dir, "lineitem"), columns=["l_orderkey"]
        ).map_batches(
            _key_kmv_sketch("l_orderkey"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    b = _fold_kmv(
        ray.data.read_parquet(
            table_path(sf_dir, "orders"), columns=["o_orderkey"]
        ).map_batches(
            _key_kmv_sketch("o_orderkey"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    u = kmv_merge(a, b)
    n_u = len(u)
    if n_u >= KMV_K:
        union_est = (KMV_K - 1) / (float(u[-1]) / float(2**64))
    else:
        union_est = float(n_u)
    union_est_i = int(np.floor(union_est + 0.5))  # DuckDB round(x, 0)
    rho = int((np.isin(u, a) & np.isin(u, b)).sum())
    if n_u == 0:
        inter_i = 0  # empty input; the SQL twin never evaluates this branch
    else:
        inter_i = int(
            np.floor(float(rho) * float(union_est_i) / float(n_u) + 0.5)
        )
    return pd.DataFrame(
        {
            "k": pd.Series([KMV_K], dtype="int64"),
            "rho": pd.Series([rho], dtype="int64"),
            "union_estimate": pd.Series([union_est_i], dtype="int64"),
            "intersect_estimate": pd.Series([inter_i], dtype="int64"),
        }
    )


ORDERS_JOIN_SIZE_KMV_SQL = f"""
WITH ka AS (
  SELECT hv FROM (
    SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 16))::UBIGINT AS hv
    FROM (SELECT DISTINCT l_orderkey FROM lineitem)
  ) ORDER BY hv LIMIT {KMV_K}
),
kb AS (
  SELECT hv FROM (
    SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16))::UBIGINT AS hv
    FROM (SELECT DISTINCT o_orderkey FROM orders)
  ) ORDER BY hv LIMIT {KMV_K}
),
u AS (
  SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
  ORDER BY hv LIMIT {KMV_K}
),
agg AS (SELECT count(*) AS n, max(hv) AS kth FROM u),
r AS (
  SELECT count(*) AS rho FROM u
  WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb)
),
est AS (SELECT {kmv_estimate_sql()} AS ue FROM agg)
SELECT {KMV_K} AS k,
       rho,
       ue AS union_estimate,
       CAST(round(CAST(rho AS DOUBLE) * ue / n, 0) AS BIGINT) AS intersect_estimate
FROM r, est, agg
"""

register("orders_join_size_kmv", orders_join_size_kmv, sql=ORDERS_JOIN_SIZE_KMV_SQL)


# --- sliding-window HLL (streaming window × sketch composition) -------------

HLL_WINDOW_HOURS = 6


def events_sliding_distinct_hll(sf_dir: str) -> "ray.data.Dataset":
    """(window_start, n_users_hll): HLL distinct-user estimate per sliding
    6-hour window (one window starting at every observed hour) — the
    composition a streaming pipeline runs where the exact sliding distinct
    would re-ship every (window, user) pair 6 times. Register files are
    per-HOUR (each hour's 256-byte sketch folds by max) and windows merge
    REGISTERS, not users: the window pass touches #hours × 256 rows no
    matter how many users exist.

    Driver state: the merged (hour, bucket, rho) frame — time-range-
    bounded (#hours × 256; a month is 185k rows), documented in place of
    an enum fold whose 100k guard this frame can legitimately exceed.
    """
    from .dedup import _hash_partitioned

    def block_registers(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["user_id"])
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "hr": pd.Series([], dtype="datetime64[us]"),
                    "bucket": pd.Series([], dtype="int64"),
                    "rho": pd.Series([], dtype="int64"),
                }
            )
        df = df.assign(hr=df["ts"].dt.floor("h"))
        pairs = df.drop_duplicates(["hr", "user_id"])
        # hash each DISTINCT user once per block, not once per pair
        cache: dict[int, tuple[int, int]] = {}

        def bucket_rho(u: float) -> tuple[int, int]:
            k = int(u)
            if k not in cache:
                hx = hashlib.md5(str(k).encode("utf-8")).hexdigest()
                cache[k] = (int(hx[0:2], 16), hll_rho(int(hx[2:14], 16)))
            return cache[k]

        br = [bucket_rho(u) for u in pairs["user_id"]]
        out = pd.DataFrame(
            {
                "hr": pairs["hr"].to_numpy(),
                "bucket": pd.Series([b for b, _ in br], dtype="int64"),
                "rho": pd.Series([r for _, r in br], dtype="int64"),
            }
        )
        return (
            out.groupby(["hr", "bucket"], sort=False)["rho"].max().reset_index()
        )

    def max_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["hr", "bucket"], sort=False)["rho"].max().reset_index()
        g["bucket"] = g["bucket"].astype("int64")
        g["rho"] = g["rho"].astype("int64")
        return g

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["ts", "user_id"]
    ).map_batches(block_registers, batch_format="pandas")
    parts = _hash_partitioned(ds, "hr", max_partition)
    frames = list(parts.iter_batches(batch_size=65_536, batch_format="pandas"))
    regs = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame({"hr": [], "bucket": [], "rho": []})
    )
    if len(regs) == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "window_start": pd.Series([], dtype="datetime64[us]"),
                    "n_users_hll": pd.Series([], dtype="int64"),
                }
            )
        )
    # sort once; each window is a searchsorted SLICE of the register
    # frame (a full-frame boolean mask per window would be O(#hours²·256))
    regs = regs.sort_values("hr", kind="mergesort").reset_index(drop=True)
    hr_us = regs["hr"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hours = np.unique(hr_us)
    ests = []
    span = HLL_WINDOW_HOURS * 3_600_000_000  # window span in microseconds
    for h_us in hours:
        lo = int(np.searchsorted(hr_us, h_us, side="left"))
        hi = int(np.searchsorted(hr_us, h_us + span, side="left"))
        g = regs.iloc[lo:hi].groupby("bucket")["rho"].max()
        v_empty = HLL_M - len(g)
        s_num = v_empty * (1 << (HLL_RHO_BITS + 1)) + int(
            np.sum(1 << (HLL_RHO_BITS + 1 - g.to_numpy()))
        )
        est = hll_estimate(v_empty, s_num)
        ests.append(int(np.floor(est + 0.5)))
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "window_start": pd.Series(
                    hours.astype("datetime64[us]"), dtype="datetime64[us]"
                ),
                "n_users_hll": pd.Series(ests, dtype="int64"),
            }
        )
    )


EVENTS_SLIDING_HLL_SQL = f"""
WITH h AS (
  SELECT DISTINCT date_trunc('hour', ts) AS hr,
         md5(CAST(user_id AS VARCHAR)) AS hx
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT hr,
         ('0x' || substr(hx, 1, 2))::INT AS bucket,
         {HLL_RHO_BITS + 1}
           - length(ltrim(bin(('0x' || substr(hx, 3, 12))::BIGINT), '0')) AS rho
  FROM h
),
hregs AS (SELECT hr, bucket, max(rho) AS rho FROM r GROUP BY hr, bucket),
w AS (SELECT DISTINCT hr AS window_start FROM hregs),
m AS (
  SELECT w.window_start, hregs.bucket, max(hregs.rho) AS rho
  FROM w JOIN hregs
    ON hregs.hr >= w.window_start
   AND hregs.hr < w.window_start + INTERVAL {HLL_WINDOW_HOURS} HOUR
  GROUP BY 1, 2
),
s AS (
  SELECT window_start,
         ({HLL_M} - count(*)) AS v_empty,
         CAST(
           ({HLL_M} - count(*)) * (1::BIGINT << {HLL_RHO_BITS + 1})
           + coalesce(sum(1::BIGINT << ({HLL_RHO_BITS + 1} - rho)), 0)
         AS DOUBLE) AS s_num
  FROM m GROUP BY window_start
)
SELECT window_start, {hll_estimate_sql()} AS n_users_hll
FROM s
"""

register("events_sliding_distinct_hll", events_sliding_distinct_hll, sql=EVENTS_SLIDING_HLL_SQL)


def source_similarity_kmv(sf_dir: str) -> "pd.DataFrame":
    """(source_a, source_b, rho, jaccard_e6): estimated shingle-set Jaccard
    similarity between every SOURCE pair — the corpus-mixture overlap
    heatmap a curator reads before weighting sources.

    One mergeable KMV sketch per source (bounded enum × K uint64s), folded
    exactly like ``docs_distinct_shingles_kmv``; every pairwise estimate is
    then pure driver arithmetic on the ≤ #sources sketches via the Beyer
    et al. intersection rule (rho of the K-min union in both sketches).
    The sketch VALUE is a deterministic md5 function, so the whole matrix
    is SQL-oracle-checkable; only its relation to the true Jaccard is
    approximate (pinned in tests). Zero shuffles; one text-column scan.
    Enum contract: NULL source excluded both sides; a source whose every
    document yields zero shingles has an empty sketch and joins no pair
    (it never enters the SQL k-min relation either).
    """

    def block_sketch(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.dropna(subset=["source"])
        srcs, sketches = [], []
        for src, g in df.groupby("source", sort=False):
            smallest = np.empty(0, dtype=np.uint64)
            for text in g["text"]:
                doc_hashes = _kmv_hash(sorted(_doc_shingles(text or "")))
                smallest = kmv_merge(smallest, doc_hashes)
            if len(smallest):
                srcs.append(src)
                sketches.append(smallest.tolist())
        return pd.DataFrame({"source": pd.Series(srcs, dtype="object"),
                             "min_hashes": pd.Series(sketches, dtype="object")})

    ds = ray.data.read_parquet(
        table_path(sf_dir, "documents"), columns=["source", "text"]
    ).map_batches(block_sketch, batch_format="pandas")
    merged: dict[str, np.ndarray] = {}
    for b in ds.iter_batches(batch_size=65_536, batch_format="pandas"):
        for src, mh in zip(b["source"], b["min_hashes"]):
            merged[src] = kmv_merge(merged.get(src, np.empty(0, dtype=np.uint64)), mh)

    rows_a, rows_b, rows_rho, rows_j = [], [], [], []
    for sa, sb in ((a, b) for a in sorted(merged) for b in sorted(merged) if a < b):
        u = kmv_merge(merged[sa], merged[sb])
        n_u = len(u)
        rho = int((np.isin(u, merged[sa]) & np.isin(u, merged[sb])).sum())
        rows_a.append(sa)
        rows_b.append(sb)
        rows_rho.append(rho)
        rows_j.append(int(np.floor(float(rho) * 1e6 / float(n_u) + 0.5)))
    return pd.DataFrame(
        {
            "source_a": pd.Series(rows_a, dtype="object"),
            "source_b": pd.Series(rows_b, dtype="object"),
            "rho": pd.Series(rows_rho, dtype="int64"),
            "jaccard_e6": pd.Series(rows_j, dtype="int64"),
        }
    )


SOURCE_SIMILARITY_KMV_SQL = f"""
WITH w AS (
  SELECT source, regexp_extract_all(text, '\\S+') AS ws
  FROM documents WHERE source IS NOT NULL
),
s AS (
  SELECT source,
         CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
              ELSE ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT)+1] || ' ' || ws[CAST(i AS INT)+2]
         END AS sh
  FROM w, LATERAL UNNEST(generate_series(1, greatest(len(ws)-2, CASE WHEN len(ws) > 0 THEN 1 ELSE 0 END))) u(i)
),
d AS (SELECT DISTINCT source, sh FROM s),
h AS (SELECT source, ('0x' || substr(md5(sh), 1, 16))::UBIGINT AS hv FROM d),
r AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM h),
k AS (SELECT source, hv FROM r WHERE rn <= {KMV_K}),
pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM (SELECT DISTINCT source FROM k) a
  JOIN (SELECT DISTINCT source FROM k) b ON a.source < b.source
),
pu AS (
  SELECT p.sa, p.sb, k.hv FROM pairs p
  JOIN k ON k.source = p.sa OR k.source = p.sb
  GROUP BY p.sa, p.sb, k.hv
),
ur AS (
  SELECT sa, sb, hv,
         row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn
  FROM pu
),
u AS (SELECT sa, sb, hv FROM ur WHERE rn <= {KMV_K}),
agg AS (SELECT sa, sb, count(*) AS n FROM u GROUP BY 1, 2),
rh AS (
  SELECT u.sa, u.sb, count(*) AS rho FROM u
  WHERE EXISTS (SELECT 1 FROM k WHERE k.source = u.sa AND k.hv = u.hv)
    AND EXISTS (SELECT 1 FROM k WHERE k.source = u.sb AND k.hv = u.hv)
  GROUP BY 1, 2
)
SELECT agg.sa AS source_a, agg.sb AS source_b,
       coalesce(rh.rho, 0) AS rho,
       CAST(round(coalesce(rh.rho, 0) * 1e6 / agg.n, 0) AS BIGINT) AS jaccard_e6
FROM agg LEFT JOIN rh ON agg.sa = rh.sa AND agg.sb = rh.sb
"""

register("source_similarity_kmv", source_similarity_kmv, sql=SOURCE_SIMILARITY_KMV_SQL)


# --- week-over-week Wasserstein-1 value drift (X145) ---------------------------

W1_BINS = 2048
WEEK_US_W1 = 7 * 86400 * 1_000_000


def events_weekly_value_drift(sf_dir: str) -> "pd.DataFrame":
    """(week_a, week_b, n_a, n_b, w1_e6): the Wasserstein-1 (earth-mover)
    distance between CONSECUTIVE weeks' event-value distributions on a
    fixed 2048-bin grid — the drift TIME SERIES a feed monitor alarms
    on (KS says "different"; W1 says "by how much value mass moved").

    Contract: the grid is the global parquet-footer min/max (Ray fold
    fallback), bin assignment is the shared ``floor((v-lo)/(hi-lo)*B)``
    clamp, weeks are truncating ``epoch_us // week_us``; on that grid
    the statistic is EXACT — Σ_bins |cum_a·n_b − cum_b·n_a| is an
    integer (HUGEINT in SQL, Python ints here), and ``w1_e6`` applies
    one shared IEEE chain ((S/n_a)/n_b · (hi−lo)/B · 1e6, floor+0.5).
    Only the grid itself approximates (error ≤ bin width, asserted in
    tests). Weeks missing from the data break the pair chain on both
    engines; a degenerate global domain (hi ≤ lo) puts all mass in bin
    0, making every W1 exactly 0.

    Scale shape: per-block (week, 2048-int histogram) partial rows —
    #weeks per block regardless of height — folded on the driver into
    #weeks dense vectors (time-span bounded); zero shuffle.
    """
    import ray as ray_core

    from .exchange import footer_min_max

    path = table_path(sf_dir, "events")
    bounds = footer_min_max(path, "value")
    if bounds is None:
        from ray.data.aggregate import Max, Min

        agg = ray.data.read_parquet(path, columns=["value"]).aggregate(
            Min("value"), Max("value")
        )
        if agg is None or agg.get("min(value)") is None:
            bounds = None
        else:
            bounds = (agg["min(value)"], agg["max(value)"])
    empty = pd.DataFrame(
        {
            "week_a": pd.Series(dtype="int64"),
            "week_b": pd.Series(dtype="int64"),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "w1_e6": pd.Series(dtype="int64"),
        }
    )
    if bounds is None:
        return empty
    lo, hi = float(bounds[0]), float(bounds[1])
    span = hi - lo

    def block_hists(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_valid(batch["ts"]), pc.is_valid(batch["value"]))
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pa.table(
                {
                    "week": pa.array([], pa.int64()),
                    "hist": pa.array([], pa.list_(pa.int64())),
                }
            )
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        wk = us // WEEK_US_W1
        wk += ((us < 0) & (us - wk * WEEK_US_W1 != 0)).astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        if span > 0:
            b = np.minimum(
                np.floor((v - lo) / span * W1_BINS).astype(np.int64), W1_BINS - 1
            )
        else:
            b = np.zeros(len(v), dtype=np.int64)
        weeks, hists = [], []
        for w in np.unique(wk):
            weeks.append(int(w))
            hists.append(
                np.bincount(b[wk == w], minlength=W1_BINS).astype(np.int64).tolist()
            )
        return pa.table(
            {
                "week": pa.array(weeks, pa.int64()),
                "hist": pa.array(hists, pa.list_(pa.int64())),
            }
        )

    ds = ray.data.read_parquet(path, columns=["ts", "value"]).map_batches(
        block_hists, batch_format="pyarrow", zero_copy_batch=True
    )
    acc: dict[int, np.ndarray] = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for i in range(b.num_rows):
            w = b["week"][i].as_py()
            h = np.asarray(b["hist"][i].as_py(), dtype=np.int64)
            acc[w] = acc[w] + h if w in acc else h
    weeks = sorted(acc)
    rows = []
    for a, bwk in zip(weeks, weeks[1:]):
        if bwk != a + 1:
            continue  # a gap week breaks the pair chain
        ha, hb = acc[a], acc[bwk]
        na, nb = int(ha.sum()), int(hb.sum())
        ca = np.cumsum(ha)
        cb = np.cumsum(hb)
        s = int(np.abs(ca * nb - cb * na).sum())  # exact: ≤ B·n² (int64 at
        # this scale; the SQL twin carries HUGEINT so the contract is the
        # bound, not the dtype)
        w1 = (
            (float(s) / float(na)) / float(nb) * span / W1_BINS * 1e6
            if na and nb
            else 0.0
        )
        rows.append(
            {
                "week_a": a,
                "week_b": bwk,
                "n_a": na,
                "n_b": nb,
                "w1_e6": int(np.floor(w1 + 0.5)),
            }
        )
    if not rows:
        return empty
    return pd.DataFrame(rows).astype("int64")


EVENTS_WEEKLY_DRIFT_SQL = f"""
WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events
            WHERE value IS NOT NULL),
f AS (
  SELECT epoch_us(ts) // {WEEK_US_W1} AS week,
         CASE WHEN mm.hi > mm.lo
              THEN least(CAST(floor((value - mm.lo) / (mm.hi - mm.lo)
                                    * {W1_BINS}) AS INT), {W1_BINS} - 1)
              ELSE 0 END AS bin
  FROM events, mm WHERE ts IS NOT NULL AND value IS NOT NULL
),
h AS (SELECT week, bin, count(*) AS c FROM f GROUP BY 1, 2),
wk AS (SELECT DISTINCT week FROM h),
dense AS (
  SELECT wk.week, g.bin, coalesce(h.c, 0) AS c
  FROM wk CROSS JOIN (SELECT unnest(range(0, {W1_BINS})) AS bin) g
  LEFT JOIN h ON h.week = wk.week AND h.bin = g.bin
),
cum AS (
  SELECT week, bin,
         CAST(sum(c) OVER (PARTITION BY week ORDER BY bin) AS HUGEINT) AS cum,
         CAST(sum(c) OVER (PARTITION BY week) AS HUGEINT) AS n
  FROM dense
),
s AS (
  SELECT a.week AS week_a, b.week AS week_b,
         sum(abs(a.cum * b.n - b.cum * a.n)) AS s,
         any_value(a.n) AS na, any_value(b.n) AS nb
  FROM cum a JOIN cum b ON b.week = a.week + 1 AND a.bin = b.bin
  GROUP BY 1, 2
)
SELECT CAST(week_a AS BIGINT) AS week_a, CAST(week_b AS BIGINT) AS week_b,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(floor(
         (CAST(s AS DOUBLE) / CAST(na AS DOUBLE)) / CAST(nb AS DOUBLE)
         * ((SELECT hi FROM mm) - (SELECT lo FROM mm)) / {W1_BINS}
         * 1e6 + 0.5) AS BIGINT) AS w1_e6
FROM s
"""

register(
    "events_weekly_value_drift", events_weekly_value_drift,
    sql=EVENTS_WEEKLY_DRIFT_SQL,
)


# --- EXACT grouped quantiles, no global sort (X160) -------------------------------

EXACT_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
#: driver ceiling for crossing-bin candidate values — one bin per (type, q);
#: hitting it means a pathologically tied bin, raise with the reroute named
_EXACT_Q_MAX_CANDIDATES = 2_000_000


def events_value_quantiles_exact(sf_dir: str) -> "pd.DataFrame":
    """(event_type, q, value): EXACT per-type quantiles of the raw value
    column — the smallest value whose cumulative count reaches q·n —
    with NO global sort: the exact upgrade of the histogram-sketch
    ``events_quantiles_by_type`` (error ≤ bin width there, zero here).

    Three column-pruned passes: per-type (n, min, max) fold; a bounded
    (type, bin, count) fold locates each quantile's crossing bin; ONE
    targeted filter pass ships only crossing-bin values to the driver
    (ceiling-guarded), which resolves the exact order statistic.
    Binning is internal (any monotone bucketing yields the same answer),
    so the SQL twin is the plain window rank rule — the quantile VALUE
    is an existing double, bit-identical on both engines. NULL types and
    values are excluded on both sides.
    """
    import ray as ray_core

    from .exchange import enum_group_agg, enum_group_sum

    path = table_path(sf_dir, "events")
    cols = ["event_type", "value"]

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.and_(pc.is_valid(batch["event_type"]), pc.is_valid(batch["value"]))
        )

    def mm_partial(batch: pa.Table) -> pa.Table:
        t = keep(batch)
        g = (
            pa.table(
                {
                    "t": t["event_type"],
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "lo": t["value"],
                    "hi": t["value"],
                }
            )
            .group_by(["t"])
            .aggregate([("n", "sum"), ("lo", "min"), ("hi", "max")])
        )
        return g.rename_columns(["t", "n", "lo", "hi"])

    mm = enum_group_agg(
        ray.data.read_parquet(path, columns=cols).map_batches(
            mm_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["t"],
        {"n": "sum", "lo": "min", "hi": "max"},
    )
    empty = pd.DataFrame(
        {
            "event_type": pd.Series(dtype="object"),
            "q": pd.Series(dtype="float64"),
            "value": pd.Series(dtype="float64"),
        }
    )
    if len(mm) == 0:
        return empty
    types = sorted(mm["t"].astype(str))
    tid = {t: i for i, t in enumerate(types)}
    stat = {
        tid[str(r.t)]: (int(r.n), float(r.lo), float(r.hi))
        for r in mm.itertuples(index=False)
    }
    ref = ray_core.put((pa.array(types, pa.string()), stat))

    def binned(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tset, st = ray_core.get(ref)
        t = keep(batch)
        fid = (
            pc.index_in(t["event_type"], value_set=tset)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.array([st[i][1] for i in range(len(st))])[fid]
        hi = np.array([st[i][2] for i in range(len(st))])[fid]
        span = hi - lo
        b = np.where(
            span > 0,
            np.clip(
                np.floor((v - lo) / np.where(span > 0, span, 1.0) * QUANT_BINS),
                0,
                QUANT_BINS - 1,
            ),
            0,
        ).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(fid * QUANT_BINS + b),
                "v": pa.array(v),
            }
        )

    def bin_counts(batch: pa.Table) -> pa.Table:
        t = binned(batch)
        key = t["key"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(key, minlength=len(types) * QUANT_BINS)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "key": pa.array(nz, pa.int64()),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    bfold = enum_group_sum(
        ray.data.read_parquet(path, columns=cols).map_batches(
            bin_counts, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["key"],
        ["n"],
    ).sort_values("key")
    keys = bfold["key"].to_numpy(dtype=np.int64)
    cnts = bfold["n"].to_numpy(dtype=np.int64)
    # per (type, q): crossing bin + count of rows in bins BELOW it
    need: dict[int, list[tuple[float, int]]] = {}  # key -> [(q, below_cum)]
    for i in range(len(types)):
        sel = keys // QUANT_BINS == i
        k = keys[sel]
        c = cnts[sel]
        cum = np.cumsum(c)
        n = stat[i][0]
        for q in EXACT_QS:
            j = int(np.searchsorted(cum, q * n))
            below = int(cum[j - 1]) if j > 0 else 0
            need.setdefault(int(k[j]), []).append((q, below))
    nref = ray_core.put(set(need))

    def in_crossing(batch: pa.Table) -> pa.Table:
        t = binned(batch)
        wanted = ray_core.get(nref)
        key = t["key"].to_numpy(zero_copy_only=False)
        m = np.isin(key, np.fromiter(wanted, dtype=np.int64, count=len(wanted)))
        return t.filter(pa.array(m))

    members = ray.data.read_parquet(path, columns=cols).map_batches(
        in_crossing, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if len(members) > _EXACT_Q_MAX_CANDIDATES:
        raise ValueError(
            "events_value_quantiles_exact: crossing bins hold "
            f"{len(members):,} rows (> {_EXACT_Q_MAX_CANDIDATES:,}) — a "
            "pathologically tied bin; recurse the bin split instead"
        )
    rows = []
    for key, g in members.groupby("key", sort=True):
        vals = np.sort(g["v"].to_numpy(dtype=np.float64))
        i = int(key) // QUANT_BINS
        n = stat[i][0]
        for q, below in need[int(key)]:
            pos = int(np.ceil(q * n)) - below - 1
            pos = max(pos, 0)
            rows.append(
                {"event_type": types[i], "q": q, "value": float(vals[pos])}
            )
    out = pd.DataFrame(rows).sort_values(["event_type", "q"]).reset_index(drop=True)
    return out.astype({"q": "float64", "value": "float64"})


EVENTS_EXACT_QUANTILES_SQL = f"""
WITH f AS (
  SELECT event_type, value FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
),
c AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM f
),
qs(q) AS (VALUES {", ".join(f"({q})" for q in EXACT_QS)})
SELECT event_type, q, min(value) AS value
FROM c JOIN qs ON rk >= q * n
GROUP BY 1, 2
"""

register(
    "events_value_quantiles_exact", events_value_quantiles_exact,
    sql=EVENTS_EXACT_QUANTILES_SQL,
)


# --- sketch-accuracy audit: exact vs KMV vs HLL (X164) -----------------------------


def distinct_sketch_audit(sf_dir: str) -> "pd.DataFrame":
    """(event_type, exact, kmv_est, hll_est, kmv_err_e6, hll_err_e6):
    the sketch-accuracy dashboard — per event type, the exact distinct
    user count next to both sketch estimates and their SIGNED relative
    errors. The number a platform team reads before choosing which
    sketch backs a 10^12-row dashboard (KMV: unbiased, k-bounded
    variance; HLL-256: ~6.5% σ, 256 bytes).

    Composition of three value-oracled pipelines (exact pair-exchange
    count, per-type KMV, per-type HLL) merged on the driver — the merge
    input is #types rows per side. Errors are one shared IEEE chain
    each; the SQL twin nests the three oracles verbatim, so drift in ANY
    of them fails this audit too.
    """
    exact = events_distinct_users(sf_dir).to_pandas()
    kmv = events_distinct_users_kmv(sf_dir).to_pandas()
    hll = events_distinct_users_hll_by_type(sf_dir).to_pandas()
    m = (
        exact.merge(kmv[["event_type", "estimate"]], on="event_type")
        .merge(hll, on="event_type")
        .rename(
            columns={
                "n_users": "exact",
                "estimate": "kmv_est",
                "n_users_hll": "hll_est",
            }
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    cols = {
        "event_type": "object", "exact": "int64", "kmv_est": "int64",
        "hll_est": "int64", "kmv_err_e6": "int64", "hll_err_e6": "int64",
    }
    if len(m) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    ex = m["exact"].to_numpy(dtype=np.float64)
    m["kmv_err_e6"] = np.floor(
        (m["kmv_est"].to_numpy(dtype=np.float64) - ex) / ex * 1e6 + 0.5
    ).astype(np.int64)
    m["hll_err_e6"] = np.floor(
        (m["hll_est"].to_numpy(dtype=np.float64) - ex) / ex * 1e6 + 0.5
    ).astype(np.int64)
    return m[list(cols)].astype(cols)


DISTINCT_SKETCH_AUDIT_SQL = f"""
WITH exact AS ({EVENTS_DISTINCT_USERS_SQL}),
kmv AS ({EVENTS_KMV_SQL}),
hll AS ({EVENTS_HLL_BY_TYPE_SQL})
SELECT e.event_type,
       CAST(e.n_users AS BIGINT) AS exact,
       CAST(k.estimate AS BIGINT) AS kmv_est,
       CAST(h.n_users_hll AS BIGINT) AS hll_est,
       CAST(floor((CAST(k.estimate AS DOUBLE) - CAST(e.n_users AS DOUBLE))
            / CAST(e.n_users AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS kmv_err_e6,
       CAST(floor((CAST(h.n_users_hll AS DOUBLE) - CAST(e.n_users AS DOUBLE))
            / CAST(e.n_users AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS hll_err_e6
FROM exact e
JOIN kmv k USING (event_type)
JOIN hll h USING (event_type)
"""

register("distinct_sketch_audit", distinct_sketch_audit, sql=DISTINCT_SKETCH_AUDIT_SQL)
