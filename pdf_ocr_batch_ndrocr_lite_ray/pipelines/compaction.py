"""Key-compaction operators: latest-record-per-key and grouped mode.

The reference engine processes each file once and has no notion of a
mutable keyed stream (SURVEY.md §2); these are the change-data-capture
shapes a corpus that RECEIVES updates needs — the upsert compaction every
lakehouse MERGE performs, and the per-entity majority label a curator
derives from an event log.

- ``events_latest_per_user`` (X101): last-write-wins compaction. One hash
  exchange on the key co-locates each key's full history; the partition
  sorts by the total order (``ts``, tie ``event_id``) and keeps the last
  row per key — the same vectorized in-partition-order idiom as the
  window family (windows.py), never a global sort. Output is one row per
  key regardless of history depth, so the exchange is the corpus but the
  result is the key set. NULL contract matches the SQL window twin:
  NULL keys form one group; NULL ``ts`` sorts LAST under the descending
  pick (``NULLS LAST``), so a non-null timestamp always beats a null one
  and an all-null-ts key falls back to max ``event_id``.
- ``user_modal_event_type`` (X102): exact grouped mode. Per-block
  (key, value) count partials shrink the exchange to distinct pairs
  BEFORE the shuffle (the partial-aggregate discipline); one hash
  exchange on the key makes in-partition sums the exact global counts,
  and the argmax applies the SQL tie rule (count DESC, value ASC, NULL
  value last) in-partition. Nothing reaches the driver.

Scale: both operators move one exchange of (key, payload) rows and hold
no driver state; outputs are bounded by key cardinality, not history
length. At 100 TB the compaction IS the workload (that's what MERGE
does); the mode's pre-aggregation caps the exchange at
#distinct-(key, value) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .exchange import half_up_int64 as _half_up_int64
from .exchange import hash_partitioned as _hash_partitioned
from .exchange import int64_out as _int64_key_array
from .exchange import round6 as _round6
from .exchange import string_out as _string_array
from .queryset import register, table_path

#: µs sentinel order for NULL timestamps: NaT→int64 min sorts FIRST under
#: ascending, i.e. LAST under the "latest wins" pick — exactly the SQL
#: twin's ``ORDER BY ts DESC NULLS LAST``.
_LATEST_COLUMNS = ["user_id", "ts", "event_id", "event_type", "value"]


#: output blocks are ARROW (nullable int64), never pandas ``Int64`` — the
#: Arrow→pandas conversion then matches DuckDB's exactly (int64 when the
#: column has no nulls, float64+NaN when it does), so the value-hash
#: contract holds at every scale and on the adversarial NULL fixture.
_LATEST_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("last_ts_us", pa.int64()),
        ("last_type", pa.string()),
        ("last_value", pa.float64()),
    ]
)


def _latest_partition(df: pd.DataFrame) -> pa.Table:
    if len(df) == 0:
        return _LATEST_SCHEMA.empty_table()
    # NaT → int64 min: ascending sort puts null timestamps first, so
    # keep='last' picks the max-ts row and never a null-ts row unless the
    # key has ONLY null timestamps (then max event_id wins the tie).
    ts_us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    d = df.assign(_ts_us=ts_us).sort_values(
        ["_ts_us", "event_id"], kind="mergesort"
    )
    # pandas duplicated() treats NaN keys as equal — NULL keys form ONE
    # group, matching the SQL window partition
    sel = d[~d["user_id"].duplicated(keep="last")]
    return pa.table(
        {
            "user_id": _int64_key_array(sel["user_id"]),
            "last_ts_us": pa.array(
                sel["_ts_us"].to_numpy(),
                mask=sel["ts"].isna().to_numpy(),
                type=pa.int64(),
            ),
            "last_type": _string_array(sel["event_type"]),
            "last_value": pa.array(
                _round6(sel["value"].to_numpy(dtype=np.float64)), type=pa.float64()
            ),
        }
    )


def events_latest_per_user(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, last_ts_us, last_type, last_value): each key's latest
    record under the (ts, event_id) total order — the upsert-compaction /
    SCD-1 MERGE result over the event log."""
    ds = ray.data.read_parquet(table_path(sf_dir, "events"), columns=_LATEST_COLUMNS)
    return _hash_partitioned(ds, "user_id", _latest_partition)


EVENTS_LATEST_PER_USER_SQL = """
SELECT user_id, epoch_us(ts) AS last_ts_us, event_type AS last_type,
       round(CAST(value AS DOUBLE), 6) AS last_value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC
) = 1
"""

register("events_latest_per_user", events_latest_per_user, sql=EVENTS_LATEST_PER_USER_SQL)


def _mode_count_partial(batch: pa.Table) -> pa.Table:
    g = (
        batch.select(["user_id", "event_type"])
        .group_by(["user_id", "event_type"])
        .aggregate([([], "count_all")])
    )
    return g.rename_columns(["user_id", "event_type", "n"])


_MODE_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("modal_type", pa.string()),
        ("n_events", pa.int64()),
    ]
)


def _mode_partition(df: pd.DataFrame) -> pa.Table:
    if len(df) == 0:
        return _MODE_SCHEMA.empty_table()
    # partials from different blocks sum to the exact global count here
    # because the exchange routed every row of this key to this partition
    g = (
        df.groupby(["user_id", "event_type"], sort=False, dropna=False)["n"]
        .sum()
        .reset_index()
    )
    # SQL tie rule: highest count, then lexicographically smallest type,
    # NULL type last
    g = g.sort_values(
        ["n", "event_type"], ascending=[False, True], na_position="last",
        kind="mergesort",
    )
    sel = g[~g["user_id"].duplicated(keep="first")]
    return pa.table(
        {
            "user_id": _int64_key_array(sel["user_id"]),
            "modal_type": _string_array(sel["event_type"]),
            "n_events": pa.array(sel["n"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


def user_modal_event_type(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, modal_type, n_events): each key's most frequent value
    with the deterministic SQL tie rule (count DESC, value ASC NULLS
    LAST). Exchange carries distinct (key, value) count partials, not
    rows."""
    ds = ray.data.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id", "event_type"]
    )
    partials = ds.map_batches(
        _mode_count_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _hash_partitioned(partials, "user_id", _mode_partition)


USER_MODAL_EVENT_TYPE_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS modal_type, n AS n_events FROM c
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY n DESC, event_type ASC NULLS LAST
) = 1
"""

register("user_modal_event_type", user_modal_event_type, sql=USER_MODAL_EVENT_TYPE_SQL)


# --- as-of snapshot reconstruction (X105) ------------------------------------

#: snapshot cutoff: the state "as of" this instant is reconstructed from the
#: order change log (inclusive — SQL twin uses <=)
SNAPSHOT_CUTOFF = "1996-12-31"
_SNAPSHOT_COLUMNS = ["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"]

_SNAPSHOT_SCHEMA = pa.schema(
    [
        ("o_custkey", pa.int64()),
        ("last_orderdate_us", pa.int64()),
        ("last_status", pa.string()),
        ("last_price_e2", pa.int64()),
    ]
)


def _snapshot_partition(df: pd.DataFrame) -> pa.Table:
    if len(df) == 0:
        return _SNAPSHOT_SCHEMA.empty_table()
    d_us = df["o_orderdate"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    d = df.assign(_d_us=d_us).sort_values(["_d_us", "o_orderkey"], kind="mergesort")
    # NULL keys form one group (pandas duplicated treats NaN as equal),
    # same contract as the X101 core; a NULL price stays NULL, never a
    # garbage NaN→int cast
    sel = d[~d["o_custkey"].duplicated(keep="last")]
    price = sel["o_totalprice"].to_numpy(dtype=np.float64)
    price_na = np.isnan(price)
    cents = _half_up_int64(np.nan_to_num(price) * 100.0)
    return pa.table(
        {
            "o_custkey": _int64_key_array(sel["o_custkey"]),
            "last_orderdate_us": pa.array(sel["_d_us"].to_numpy(), type=pa.int64()),
            "last_status": _string_array(sel["o_orderstatus"]),
            "last_price_e2": pa.array(cents, mask=price_na, type=pa.int64()),
        }
    )


def orders_snapshot_asof(sf_dir: str) -> "ray.data.Dataset":
    """(o_custkey, last_orderdate_us, last_status, last_price_e2): each
    customer's state reconstructed AS OF ``SNAPSHOT_CUTOFF`` — time-travel
    over the order change log (X105).

    The same latest-per-key compaction core as X101 with the snapshot
    predicate pushed INTO the parquet read (``filter=``): row groups whose
    date statistics exceed the cutoff never leave storage, so the exchange
    carries only the pre-cutoff slice. At 100 TB the cutoff typically
    prunes most of the log — the filter-at-read is the operator's scale
    story, not an optimization detail.
    """
    import pyarrow.dataset as pads

    cutoff = np.datetime64(SNAPSHOT_CUTOFF, "us")
    ds = ray.data.read_parquet(
        table_path(sf_dir, "orders"),
        columns=_SNAPSHOT_COLUMNS,
        filter=(pads.field("o_orderdate") <= pa.scalar(cutoff.item(), type=pa.timestamp("us")))
    )
    return _hash_partitioned(ds, "o_custkey", _snapshot_partition)


ORDERS_SNAPSHOT_ASOF_SQL = f"""
SELECT o_custkey, epoch_us(o_orderdate) AS last_orderdate_us,
       o_orderstatus AS last_status,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS last_price_e2
FROM orders
WHERE o_orderdate <= TIMESTAMP '{SNAPSHOT_CUTOFF}'
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
) = 1
"""

register("orders_snapshot_asof", orders_snapshot_asof, sql=ORDERS_SNAPSHOT_ASOF_SQL)
