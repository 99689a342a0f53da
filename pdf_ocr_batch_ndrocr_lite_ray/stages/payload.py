"""PDF-ish payload parser: JSON-serialized positioned text → boxes + blocks.

The transcript analog of the reference's dynamic-schema JSON extractor
(``OCRResultParser._parse_json_file``, app.py:1825-1909): a turn's ``text``
holds a JSON document of unknown shape carrying positioned text spans. The
rules carried over verbatim:

- a mapping with probed text AND bbox is a positioned box (visit stops there);
- a mapping with text, no bbox, and scalar-heavy values is a free text leaf
  (``looks_like_text_leaf``, app.py:4169-4182);
- otherwise recurse into values / list items;
- the NDLOCR-style ``{"contents": [[{...}]], "imginfo": ...}`` fast path maps
  to the same visit here because a transcript turn is a single fragment —
  every nested list flattens into the one turn;
- box and block text is normalized on insertion (``add_token``/``add_text``,
  app.py:1838-1851).

Parse errors propagate to the caller; the extractor converts them to
``action="error"`` rows (per-item isolation, app.py:2845-2854).
"""

from __future__ import annotations

import json
from typing import Any

from ..functions.geometry import Box, bbox_from_mapping, text_from_mapping, looks_like_text_leaf
from ..functions.textnorm import normalize_text

# Bounded recursion depth: the reference recurses unboundedly over engine
# output it trusts; transcript payloads are untrusted, so cap nesting to keep
# a pathological row from blowing the stack (analog of the reference's
# bounded page-check scope, app.py:98-100).
_MAX_DEPTH = 64


def parse_pdfish_payload(text: str) -> tuple[list[Box], list[str]]:
    """Parse one turn's JSON payload into (positioned boxes, free text blocks).

    Raises ``ValueError`` on undecodable JSON.
    """
    try:
        data = json.loads(text)
    except Exception as exc:
        raise ValueError(f"payload JSON decode failed: {exc}") from exc

    boxes: list[Box] = []
    blocks: list[str] = []

    def visit(node: Any, depth: int = 0) -> None:
        if depth > _MAX_DEPTH:
            return
        if isinstance(node, dict):
            text_value = text_from_mapping(node)
            bbox = bbox_from_mapping(node)
            if text_value and bbox is not None:
                normalized = normalize_text(text_value)
                if normalized:
                    boxes.append(
                        Box(text=normalized, x1=bbox[0], y1=bbox[1], x2=bbox[2], y2=bbox[3])
                    )
                return
            if text_value and looks_like_text_leaf(node):
                cleaned = normalize_text(text_value)
                if cleaned:
                    blocks.append(cleaned)
                return
            for value in node.values():
                visit(value, depth + 1)
        elif isinstance(node, list):
            for item in node:
                visit(item, depth + 1)
        # scalars carry no structure: ignored, as in the reference visit

    visit(data)
    return boxes, blocks
