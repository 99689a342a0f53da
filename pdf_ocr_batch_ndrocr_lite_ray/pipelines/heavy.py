"""Distributed heavy hitters over document tokens.

"Which tokens exceed a 1/K share of the corpus?" is the canonical
unknown-cardinality frequency question (stop-phrase discovery, boilerplate
token lists, vocabulary pruning). The exact group-by answer shuffles every
distinct token; this operator never does — it is the standard two-pass
candidates-then-recount shape built from mergeable Misra-Gries summaries
(Agarwal et al., "Mergeable Summaries", PODS 2012):

1. **Candidates**: each input block folds its tokens into a Misra-Gries
   summary of ``_MG_COUNTERS`` counters (compression subtracts the
   (m+1)-th largest count and drops non-positives). Summaries are
   mergeable: the driver folds the ≤ m-row block summaries pairwise with
   the same compression, so any token with true frequency > N/(m+1)
   is guaranteed to survive with a positive counter. With m = 2K and the
   report threshold n·K > N, the surviving set is a strict superset of
   every reportable token. Driver memory: ≤ m rows + one block summary.
2. **Recount**: the ≤ m candidate tokens broadcast via ``ray.put``; a
   second pass counts ONLY candidates exactly per block (bounded key set
   → driver fold), and the strict threshold ``n * K > N`` filters on
   exact counts — so the output is EXACT, not approximate, and the SQL
   oracle is a plain group-by + HAVING.

Wall-clock at 100 TB: two embarrassingly-parallel passes over the text
column, zero all-to-all exchanges; everything that moves is ≤ 2K counter
rows per block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .exchange import enum_group_sum
from .queryset import register, table_path

#: report tokens with count * HH_K > total tokens (a 1/64 corpus share)
HH_K = 64

#: Misra-Gries counters per summary; m = 2K keeps the candidate superset
#: guarantee (error ≤ N/(m+1) < N/K) with margin
_MG_COUNTERS = 2 * HH_K

#: sentinel token carrying each block's EXACT token total through the same
#: partial-row stream ('' cannot collide: tokens match \S+)
_TOTAL_KEY = ""


def _compress(counts: "pd.Series", m: int = _MG_COUNTERS) -> "pd.Series":
    """Misra-Gries reduction to ≤ m counters: subtract the (m+1)-th largest
    count from all, drop non-positives. Undercounts only — never loses a
    token whose remaining share clears the error bound."""
    if len(counts) <= m:
        return counts
    arr = counts.to_numpy()
    # (m+1)-th largest value via partition (O(n), no full sort)
    kth = np.partition(arr, len(arr) - (m + 1))[len(arr) - (m + 1)]
    out = counts - kth
    return out[out > 0]


def _tokens(texts: "pd.Series") -> "pd.Series":
    """Whitespace tokens, exploded; pairs with SQL
    ``regexp_extract_all(text, '\\S+')``. Reuses the dedup family's
    ASCII-pinned ``\\S+`` regex — ``str.split()`` would split on Unicode
    whitespace (NBSP, U+3000) that RE2's ASCII ``\\s`` does not, silently
    desynchronizing counts and the threshold total from the oracle."""
    from .dedup import _WORDS_RE

    return texts.fillna("").str.findall(_WORDS_RE).explode().dropna()


#: pseudo-group key for the global (un-keyed) heavy-hitters pass
_GLOBAL = ""


def _mg_hitters(sf_dir: str, key, k: int) -> "pd.DataFrame":
    """THE two-pass Misra-Gries candidates-then-exact-recount core, shared
    by the global and per-source operators (global = single pseudo-group).

    Pass 1 folds one MG summary per (block, group); the driver merges per
    group (≤ #groups × 2k counter rows, with ``key=None`` exactly one
    group). Pass 2 recounts each group's candidate set exactly under the
    bounded (group, token) fold, and the strict ``n·k > N_group`` filter
    runs on exact counts. Enum contract for keyed calls: NULL group keys
    are excluded on both sides. Returns (gkey, token, n).
    """
    cols = ["text"] if key is None else [key, "text"]
    ds = ray.data.read_parquet(table_path(sf_dir, "documents"), columns=cols)

    def groups(df: "pd.DataFrame"):
        if key is None:
            yield _GLOBAL, df
        else:
            yield from df.dropna(subset=[key]).groupby(key, sort=False)

    def summarize(df: "pd.DataFrame") -> "pd.DataFrame":
        parts = []
        for gkey, g in groups(df):
            toks = _tokens(g["text"])
            total = int(len(toks))
            vc = _compress(toks.value_counts()) if total else pd.Series(dtype="int64")
            parts.append(
                pd.DataFrame(
                    {
                        "gkey": gkey,
                        "token": np.append(vc.index.to_numpy(dtype=object), [_TOTAL_KEY]),
                        "cnt": np.append(vc.to_numpy(dtype=np.int64), [total]),
                    }
                )
            )
        if not parts:
            return _empty_hitters("cnt")
        return pd.concat(parts, ignore_index=True)

    merged: dict = {}
    totals: dict = {}
    for b in ds.map_batches(summarize, batch_format="pandas").iter_batches(
        batch_size=65_536, batch_format="pandas"
    ):
        for gkey, g in b.groupby("gkey", sort=False):
            part = g.groupby("token", sort=False)["cnt"].sum()
            if _TOTAL_KEY in part.index:
                totals[gkey] = totals.get(gkey, 0) + int(part.pop(_TOTAL_KEY))
            prev = merged.get(gkey, pd.Series(dtype="int64"))
            merged[gkey] = _compress(prev.add(part, fill_value=0).astype("int64"))
    merged = {g: c for g, c in merged.items() if not c.empty and totals.get(g)}
    if not merged:
        return _empty_hitters("n")

    cand_ref = ray.put({g: set(c.index) for g, c in merged.items()})

    def recount(df: "pd.DataFrame") -> "pd.DataFrame":
        cands = ray.get(cand_ref)
        parts = []
        for gkey, g in groups(df):
            cs = cands.get(gkey)
            if not cs:
                continue
            toks = _tokens(g["text"])
            vc = toks[toks.isin(cs)].value_counts()
            parts.append(
                pd.DataFrame(
                    {
                        "gkey": gkey,
                        "token": vc.index.to_numpy(dtype=object),
                        "n": vc.to_numpy(dtype=np.int64),
                    }
                )
            )
        if not parts:
            return _empty_hitters("n")
        return pd.concat(parts, ignore_index=True)

    exact = enum_group_sum(
        ds.map_batches(recount, batch_format="pandas"), ["gkey", "token"], ["n"]
    )
    thresh = exact["gkey"].map(totals).astype("int64")
    return exact[exact["n"] * k > thresh].reset_index(drop=True)


def _empty_hitters(count_col: str) -> "pd.DataFrame":
    return pd.DataFrame(
        {
            "gkey": pd.Series([], dtype="object"),
            "token": pd.Series([], dtype="object"),
            count_col: pd.Series([], dtype="int64"),
        }
    )


def docs_heavy_hitters(sf_dir: str, k: int = HH_K) -> "pa.Table":
    """(token, n): tokens whose EXACT corpus count n satisfies n·k > N
    where N = total whitespace tokens. Two streaming passes, no shuffle."""
    out = _mg_hitters(sf_dir, None, k)
    return pa.table(
        {"token": pa.array(out["token"], type=pa.string()),
         "n": pa.array(out["n"], type=pa.int64())}
    )


HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents
),
tot AS (SELECT count(*) AS n_tot FROM toks),
c AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
SELECT token, n FROM c, tot WHERE n * {HH_K} > n_tot
"""

register("docs_heavy_hitters", docs_heavy_hitters, sql=HEAVY_HITTERS_SQL)


def docs_heavy_hitters_by_source(sf_dir: str, k: int = HH_K) -> "pa.Table":
    """(source, token, n): per-SOURCE heavy hitters — tokens whose exact
    within-source count clears a 1/k share of that source's tokens (the
    per-domain boilerplate-term list a mixture curator prunes with).
    Same ``_mg_hitters`` core keyed by the bounded source enum; zero
    all-to-all exchanges at any corpus size."""
    out = _mg_hitters(sf_dir, "source", k)
    return pa.table(
        {
            "source": pa.array(out["gkey"], type=pa.string()),
            "token": pa.array(out["token"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
        }
    )


HEAVY_HITTERS_BY_SOURCE_SQL = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents WHERE source IS NOT NULL
),
tot AS (SELECT source, count(*) AS n_tot FROM toks GROUP BY source),
c AS (SELECT source, token, count(*) AS n FROM toks GROUP BY source, token)
SELECT c.source, c.token, c.n
FROM c JOIN tot ON c.source = tot.source
WHERE c.n * {HH_K} > tot.n_tot
"""

register(
    "docs_heavy_hitters_by_source",
    docs_heavy_hitters_by_source,
    sql=HEAVY_HITTERS_BY_SOURCE_SQL,
)
