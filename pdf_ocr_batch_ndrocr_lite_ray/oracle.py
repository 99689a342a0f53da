"""Single-process oracle: the conformance yardstick for the distributed pipeline.

Runs the exact extraction semantics over a transcript table in one process
with a plain Python loop — no Ray, no batching, no shuffles — and returns the
golden table sorted by (conv_id, turn_idx). Golden-file tests require the
Ray pipeline's output to match this byte-identically per turn (FIXTURES.md;
north_rule "per-turn text equality under stable turn ordering").

The per-turn routine (``extract_turn``) and the sniffer rules are *shared*
with the pipeline: the oracle checks that distribution — batching, actor
pools, ordering restoration, checkpoint/resume — preserves per-row results,
which is precisely what can silently break in a distributed port.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from .stages.extract import SPANS_TYPE, extract_turn
from .stages.sniffer import classify_text_array

GOLDEN_COLUMNS = [
    "conv_id",
    "turn_idx",
    "content_kind",
    "extracted_text",
    "spans",
    "action",
    "error",
]


def oracle_extract_table(table: pa.Table) -> pa.Table:
    """Extract every turn sequentially; output sorted by (conv_id, turn_idx)."""
    kinds = classify_text_array(table["text"])
    if isinstance(kinds, pa.ChunkedArray):
        kinds = kinds.combine_chunks()

    texts = table["text"].to_pylist()
    extracted, spans_col, actions, errors = [], [], [], []
    for text, kind in zip(texts, kinds.to_pylist()):
        ext, spans, action, error = extract_turn(text, kind)
        extracted.append(ext)
        spans_col.append([{"start": s, "end": e, "kind": k} for s, e, k in spans])
        actions.append(action)
        errors.append(error)

    out = pa.table(
        {
            "conv_id": table["conv_id"],
            "turn_idx": table["turn_idx"],
            "content_kind": kinds,
            "extracted_text": pa.array(extracted, type=pa.string()),
            "spans": pa.array(spans_col, type=SPANS_TYPE),
            "action": pa.array(actions, type=pa.string()),
            "error": pa.array(errors, type=pa.string()),
        }
    )
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def oracle_extract_parquet(path: str | Path) -> pa.Table:
    return oracle_extract_table(pq.read_table(path))
