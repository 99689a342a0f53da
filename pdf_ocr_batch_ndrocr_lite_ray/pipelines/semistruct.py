"""Schema-on-read extraction from semi-structured payload columns.

The ``events.props`` column is a JSON string — the classic
semi-structured tail every production event table carries. The operator
extracts a typed field at read time (no upfront schema migration) and
folds grouped stats, all inside ``map_batches``:

- extraction is a VECTORIZED regex over the Arrow column
  (``pyarrow.compute.extract_regex``), not a per-row ``json.loads`` —
  the field contract is a scalar at a fixed JSON path, which a regex
  decides in one pass at memory bandwidth; rows that don't match yield
  NULL (SQL semantics: ``count(*)`` counts them, sum/min/max skip them);
- per-block partials carry ≤ #event_types rows, so the fold is the
  bounded enum exchange — the props strings themselves never travel.

A nested/array payload would swap the regex for a real JSON parse in the
same stage shape (actor pool if the parser warms state); the plumbing —
schema-on-read, null-on-mismatch, partial-agg fold — is what this
operator pins.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import enum_group_agg
from .queryset import register, table_path

_K_PATTERN = r'"k":\s*(?P<k>-?\d+)'  # Arrow extract_regex requires NAMED groups


def events_props_stats(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, n, sum_k, min_k, max_k): grouped stats of the integer
    ``$.k`` field extracted schema-on-read from the JSON ``props`` column."""

    def partial(batch: pa.Table) -> pa.Table:
        # typed-event contract (both sides): NULL event_type rows excluded —
        # the pandas fold would drop the NaN key the SQL GROUP BY keeps
        batch = batch.filter(pc.is_valid(batch["event_type"]))
        props = batch["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, pattern=_K_PATTERN)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k})
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        return g.rename_columns(["event_type", "n", "sum_k", "min_k", "max_k"])

    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["event_type", "props"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # sum_k folds with min_count=1 so an all-NULL group stays NULL (SQL
    # sum semantics) instead of pandas' default 0
    out = enum_group_agg(
        ds,
        ["event_type"],
        {
            "n": "sum",
            "sum_k": lambda c: c.sum(min_count=1),
            "min_k": "min",
            "max_k": "max",
        },
    )
    # all-null partials upcast the fold to float; restore int64 when the
    # final column carries no NULL (the dtype DuckDB's df() would produce)
    for c in ("sum_k", "min_k", "max_k"):
        if out[c].notna().all():
            out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


# the oracle uses the SAME RE2 regex as the engine (not json_extract, which
# RAISES on malformed JSON — the regex contract is null-on-mismatch instead)
EVENTS_PROPS_STATS_SQL = r"""
SELECT event_type,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type,
         CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k
  FROM events WHERE event_type IS NOT NULL
)
GROUP BY 1
"""

register("events_props_stats", events_props_stats, sql=EVENTS_PROPS_STATS_SQL)
