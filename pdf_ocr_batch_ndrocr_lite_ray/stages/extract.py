"""The central per-turn extractor: route by content kind, extract, isolate errors.

This is the engine's analog of the reference's per-file pipeline
(``BatchProcessor.process_one`` → parse → postprocess, app.py:2790-2859 +
1651-1736), collapsed to a per-turn routine:

- routing mirrors the parse **priority order** (structured first, plain-text
  fallback last; "fill only empty pages", app.py:1663-1687) — here each turn
  has exactly one payload, so routing is by the sniffer's ``content_kind``;
- every extracted string passes the normalization kernel exactly as the
  reference normalizes on insertion + postprocess (app.py:1709-1735);
- **per-item error isolation**: a failing turn becomes an
  ``action="error"`` row and never aborts the batch (app.py:2845-2854);
- **idempotent re-run skip**: a plain turn whose payload is already fully
  normalized is marked ``action="skipped_clean"`` — the transcript analog of
  the reference's skip-by-existing-text-layer rule (app.py:1155-1278,
  1306-1323).

``extract_turn`` is pure and shared verbatim by the single-process oracle;
``TurnExtractor`` is the stateful ``map_batches`` actor class (regex tables
and parser state are built once per worker at import/``__init__`` — the
reference's load-once pattern, app.py:2054-2095).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.layout import assemble_layout_text, dedup_blocks, dedup_boxes
from ..functions.textnorm import RowBudgetExceeded, normalize_text, set_row_deadline
from .domstrip import extract_html_main_content
from .paged import PAGE_SEP, extract_paged_turn, infer_page_count
from .payload import parse_pdfish_payload
from .sniffer import (
    KIND_EMPTY,
    KIND_HTML,
    KIND_PDFISH,
    KIND_PLAIN,
    KIND_XML,
    classify_text_array,
)
from .xmltokens import parse_xml_payload

ACTION_EXTRACTED = "extracted"
ACTION_FALLBACK = "extracted_fallback"
ACTION_SKIPPED_CLEAN = "skipped_clean"
ACTION_EMPTY = "empty"
ACTION_ERROR = "error"

SPANS_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
)

_FORM_FEED_RE = re.compile(r"\f+")

Span = tuple[int, int, str]


def _segments_to_text(segments: list[str], kind: str) -> tuple[str, list[Span]]:
    parts: list[str] = []
    spans: list[Span] = []
    pos = 0
    for seg in segments:
        if parts:
            pos += 1
        start = pos
        parts.append(seg)
        pos += len(seg)
        spans.append((start, pos, kind))
    return "\n".join(parts), spans


def extract_plain(text: str) -> tuple[str, list[Span]]:
    """Plain path: CRLF-normalize, split on form feeds, normalize, dedup.

    Mirrors ``_merge_text_file`` segmenting (app.py:1798-1810) followed by the
    postprocess block dedup (app.py:1726-1735).
    """
    cleaned = (text or "").replace("\r\n", "\n").strip()
    if not cleaned:
        return "", []
    segments = [s.strip() for s in _FORM_FEED_RE.split(cleaned) if s.strip()]
    segments = dedup_blocks(segments)
    return _segments_to_text(segments, "block")


def extract_html(text: str) -> tuple[str, list[Span]]:
    """HTML path: DOM strip at one granularity, then order-preserving dedup."""
    paragraphs, used_fallback = extract_html_main_content(text)
    paragraphs = dedup_blocks(paragraphs)
    kind = "block" if used_fallback else "paragraph"
    return _segments_to_text(paragraphs, kind)


def extract_pdfish(text: str) -> tuple[str, list[Span]]:
    """PDF-ish path: parse positioned boxes, dedup, cluster, reading-order join.

    A PAGE-SHAPED payload (multi-page NDLOCR ``{"contents": [[...], ...]}``)
    routes through the full paged document model (``extract_paged_turn``) so
    the flagship applies M7/M11 semantics — per-page token assignment,
    fill-only-empty merge — instead of flattening pages together. Page
    boundaries surface as ``kind="page"`` spans over the form-feed-joined
    document (the same separator the plain path splits on).
    """
    if infer_page_count(text or "") > 1:
        doc, _n_pages, _hits = extract_paged_turn(text)
        if not doc.strip():
            return "", []
        spans: list[Span] = []
        pos = 0
        for i, page in enumerate(doc.split(PAGE_SEP)):
            if i:
                pos += 1
            spans.append((pos, pos + len(page), "page"))
            pos += len(page)
        return doc, spans
    boxes, blocks = parse_pdfish_payload(text)
    boxes = dedup_boxes(boxes)
    blocks = dedup_blocks(blocks)
    return assemble_layout_text(boxes, blocks)


def extract_xml(text: str) -> tuple[str, list[Span]]:
    """XML path: NDLOCR/ALTO/PAGE-XML positioned tokens through the same
    dedup + layout kernel as the pdfish path (reference app.py:1911-2007)."""
    boxes, blocks = parse_xml_payload(text)
    boxes = dedup_boxes(boxes)
    blocks = dedup_blocks(blocks)
    return assemble_layout_text(boxes, blocks)


#: user-extension surface (reference U1/U3: injected pipeline callables,
#: app.py:1540-1565, 2640-2664): map a content kind to its extractor.
#: Register additions at MODULE IMPORT time (e.g. from a plugin module the
#: workers also import) — worker processes build their routing table from
#: this module, not from driver-side mutations made after tasks ship.
EXTRACTOR_REGISTRY: dict = {}


def register_extractor(kind: str, fn) -> None:
    """Register/override the extractor for a content kind.

    ``fn(raw_text) -> (extracted_text, spans)``.
    """
    EXTRACTOR_REGISTRY[kind] = fn


#: structured kinds whose payload falls back to the PLAIN interpretation
#: when structured parsing fails or yields nothing — the per-turn analog of
#: the reference's priority chain that parses structured formats first and
#: fills still-empty pages from lower-priority formats ("fill only empty
#: pages", app.py:1663-1687): in a transcript a turn's raw bytes ARE its
#: lowest-priority text representation.
FALLBACK_KINDS: set = {KIND_PDFISH, KIND_HTML, KIND_XML}

#: per-row straggler guards (SURVEY §4; the reference bounds per-item work
#: with a 3600 s subprocess timeout, app.py:88, 1601-1607). Two layers:
#: a DETERMINISTIC payload-size cap (same verdict on every machine), and a
#: wall-clock deadline armed around each row and checked between kernel
#: fixpoint passes — generous enough that only adversarial rows (quadratic
#: regex bait, multi-GB strings) ever hit it; corpus rows run in µs–ms.
MAX_TURN_CHARS = 16_000_000
TURN_BUDGET_SECONDS: float | None = 30.0

ERROR_BUDGET = "budget_exceeded"


def extract_turn(text: str | None, kind: str) -> tuple[str, list[Span], str, str]:
    """Extract one turn. Returns (extracted_text, spans, action, error).

    Never raises: failures become ``action="error"`` rows. A structured
    kind whose parse fails (truncated JSON, malformed XML) or produces no
    text re-routes through the plain extractor and is tagged
    ``action="extracted_fallback"`` — real payloads are messy, and the
    reference's robustness rule is "lower-priority formats fill what the
    structured parse left empty", not "give up".

    A row larger than ``MAX_TURN_CHARS`` or overrunning
    ``TURN_BUDGET_SECONDS`` becomes ``action="error",
    error="budget_exceeded"`` — one pathological row can never wedge a
    worker; the rest of the batch is unaffected.
    """
    try:
        if kind == KIND_EMPTY:
            return "", [], ACTION_EMPTY, ""
        raw = text or ""
        if len(raw) > MAX_TURN_CHARS:
            return "", [], ACTION_ERROR, (
                f"{ERROR_BUDGET}: payload {len(raw)} chars > {MAX_TURN_CHARS}"
            )
        set_row_deadline(TURN_BUDGET_SECONDS)
        extractor = EXTRACTOR_REGISTRY.get(kind)
        if extractor is None:
            return "", [], ACTION_ERROR, f"unknown content kind: {kind!r}"
        try:
            extracted, spans = extractor(raw)
        except RowBudgetExceeded:
            raise  # over-budget is terminal, never a fallback candidate
        except Exception:
            if kind not in FALLBACK_KINDS:
                raise
            extracted, spans = extract_plain(raw)
            if extracted:
                return extracted, spans, ACTION_FALLBACK, ""
            return "", [], ACTION_EMPTY, ""
        if not extracted:
            if kind in FALLBACK_KINDS:
                extracted, spans = extract_plain(raw)
                if extracted:
                    return extracted, spans, ACTION_FALLBACK, ""
            return "", [], ACTION_EMPTY, ""
        if kind == KIND_PLAIN and extracted == raw:
            return extracted, spans, ACTION_SKIPPED_CLEAN, ""
        return extracted, spans, ACTION_EXTRACTED, ""
    except RowBudgetExceeded:
        return "", [], ACTION_ERROR, ERROR_BUDGET
    except Exception as exc:  # per-item isolation: row-scoped failure
        return "", [], ACTION_ERROR, f"{type(exc).__name__}: {exc}"
    finally:
        set_row_deadline(None)


register_extractor(KIND_PDFISH, extract_pdfish)
register_extractor(KIND_XML, extract_xml)
register_extractor(KIND_HTML, extract_html)
register_extractor(KIND_PLAIN, extract_plain)


_TASK_EXTRACTORS: dict[str, "TurnExtractor"] = {}


def extract_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Task-pool form of the extractor: sniff + route + extract in one pass.

    Stateless from Ray's perspective, so it runs on the shared task worker
    pool (warm processes reused across datasets/stages — no per-dataset
    actor startup). The heavy state (compiled regex tables, parser
    machinery) is module-level, loaded once per worker process: the same
    load-once-per-worker guarantee as the actor path (reference pattern
    app.py:2054-2095), without paying actor spin-up on every pipeline.
    Use the ``TurnExtractor`` actor-pool path instead when per-worker state
    is genuinely expensive (models, large indexes).
    """
    ext = _TASK_EXTRACTORS.get(text_column)
    if ext is None:
        # one logical CPU per Ray task: Arrow kernels otherwise fan out on
        # an internal pool sized to the machine, silently oversubscribing
        # small clusters (and skewing per-CPU accounting)
        pa.set_cpu_count(1)
        ext = _TASK_EXTRACTORS.setdefault(text_column, TurnExtractor(text_column))
    return ext(batch)


class TurnExtractor:
    """Stateful ``map_batches`` callable: extraction over zero-copy Arrow batches.

    Use as::

        ds.map_batches(TurnExtractor, batch_format="pyarrow",
                       batch_size=B, concurrency=(m, n), zero_copy_batch=True)

    All heavy state (compiled regex tables, parser machinery) lives at module
    scope, loaded once per worker process; ``__call__`` does per-row routing
    with per-item error isolation.
    """

    def __init__(self, text_column: str = "text") -> None:
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "content_kind" in batch.column_names:
            kinds_arr = batch["content_kind"]
        else:
            kinds_arr = classify_text_array(batch[self.text_column])
            batch = batch.append_column("content_kind", kinds_arr)

        texts = batch[self.text_column].to_pylist()
        kinds = kinds_arr.to_pylist()

        extracted: list[str] = []
        spans_col: list[list[dict]] = []
        actions: list[str] = []
        errors: list[str] = []
        for text, kind in zip(texts, kinds):
            ext, spans, action, error = extract_turn(text, kind)
            extracted.append(ext)
            spans_col.append([{"start": s, "end": e, "kind": k} for s, e, k in spans])
            actions.append(action)
            errors.append(error)

        return (
            batch.append_column("extracted_text", pa.array(extracted, type=pa.string()))
            .append_column("spans", pa.array(spans_col, type=SPANS_TYPE))
            .append_column("action", pa.array(actions, type=pa.string()))
            .append_column("error", pa.array(errors, type=pa.string()))
        )
