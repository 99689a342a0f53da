"""Layout-analysis kernel: cluster positioned text boxes into lines/columns
and join them in reading order (reference L1-L7, app.py:4017-4120, 1705-1736).

Conformance-critical constants (do not tune without re-goldening):

- line clustering tolerance   ``max(4.0, 0.6 * min(avg_h, h))``  (app.py:4076)
- column clustering tolerance ``max(4.0, 0.9 * min(avg_w, w))``  (app.py:4040)
- greedy window: only the last 8 open clusters are candidates    (app.py:4036, 4072)
- vertical-page vote: tall-ratio ≥ 0.70, or ≥ 0.50 with cols ≤ lines (app.py:4050-4060)
- horizontal join: space iff gap/min(h_prev, h_cur) ≥ 0.45 (non-JP lines)
  or ≥ 0.90 between ASCII words on JP lines                      (app.py:4104-4112)
- exact dedup keys: (normalized text, int-rounded bbox), first wins after a
  deterministic (round(y1,1), round(x1,1), round(h,1), text) sort (app.py:1709-1725)

The greedy clustering is order-dependent by design; the defining order is the
pre-sort performed here, including tie-breakers. All functions are pure and run
inside a single ``map_batches`` call per turn — layout analysis never shuffles.
"""

from __future__ import annotations

from .geometry import Box
from .textnorm import (
    collapse_spaces_japanese,
    contains_japanese,
    is_ascii_word_like,
    normalize_text,
    polish_line,
)

_GREEDY_WINDOW = 8
_LINE_TOL_RATIO = 0.6
_COL_TOL_RATIO = 0.9
_MIN_TOLERANCE = 4.0
_TALL_RATIO_STRONG = 0.70
_TALL_RATIO_WEAK = 0.50
_GAP_RATIO_SPACE = 0.45
_GAP_RATIO_SPACE_JP_ASCII = 0.90


def group_into_lines(boxes: list[Box]) -> list[list[Box]]:
    """Greedy y-band clustering into horizontal lines.

    Boxes are pre-sorted by (center_y, x1, x2); each box joins the first of the
    last 8 open lines whose mean center-y is within tolerance, else opens a new
    line. Lines are re-sorted left-to-right on emission.
    """
    if not boxes:
        return []
    ordered = sorted(boxes, key=lambda b: (b.center_y, float(b.x1), float(b.x2)))
    # each cluster record bundles [boxes, Σcenter_y, Σheight]: summing on
    # append adds terms in the same order as sum() over the list, so the
    # means are bit-identical to the recompute-per-probe form (pinned by
    # the reference fuzz tests) while each probe drops to O(1)
    lines: list[list] = []  # [list[Box], float, float]
    for box in ordered:
        placed = False
        cy = box.center_y
        h = box.height
        start = max(0, len(lines) - _GREEDY_WINDOW)
        for i in range(len(lines) - 1, start - 1, -1):
            members, s_cy, s_h = lines[i]
            n = len(members)
            tolerance = max(_MIN_TOLERANCE, min(s_h / n, h) * _LINE_TOL_RATIO)
            if abs(cy - s_cy / n) <= tolerance:
                members.append(box)
                lines[i][1] = s_cy + cy
                lines[i][2] = s_h + h
                placed = True
                break
        if not placed:
            lines.append([[box], cy, h])
    return [
        sorted(members, key=lambda b: (float(b.x1), float(b.x2)))
        for members, _, _ in lines
    ]


def group_into_vertical_columns(boxes: list[Box]) -> list[list[Box]]:
    """Mirror of ``group_into_lines`` over x-centers, right-to-left."""
    if not boxes:
        return []
    ordered = sorted(boxes, key=lambda b: (-b.center_x, float(b.y1), float(b.y2)))
    cols: list[list] = []  # [list[Box], Σcenter_x, Σwidth] per cluster
    for box in ordered:
        placed = False
        cx = box.center_x
        w = box.width
        start = max(0, len(cols) - _GREEDY_WINDOW)
        for i in range(len(cols) - 1, start - 1, -1):
            members, s_cx, s_w = cols[i]
            n = len(members)
            tolerance = max(_MIN_TOLERANCE, min(s_w / n, w) * _COL_TOL_RATIO)
            if abs(cx - s_cx / n) <= tolerance:
                members.append(box)
                cols[i][1] = s_cx + cx
                cols[i][2] = s_w + w
                placed = True
                break
        if not placed:
            cols.append([[box], cx, w])
    return [
        sorted(members, key=lambda b: (float(b.y1), float(b.y2)))
        for members, _, _ in cols
    ]


def is_vertical_layout(boxes: list[Box]) -> bool:
    """Orientation vote: needs ≥ 6 boxes; strong tall-ratio, or weak + col/line count."""
    if len(boxes) < 6:
        return False
    tall_ratio = sum(1 for b in boxes if b.height > b.width * 1.25) / max(1, len(boxes))
    if tall_ratio >= _TALL_RATIO_STRONG:
        return True
    if tall_ratio >= _TALL_RATIO_WEAK:
        h_lines = len(group_into_lines(boxes))
        v_cols = len(group_into_vertical_columns(boxes))
        if v_cols <= max(1, h_lines):
            return True
    return False


def join_line(boxes: list[Box]) -> str:
    """Reading-order join of one horizontal line with gap-aware spacing.

    A space is emitted between adjacent boxes iff the horizontal gap divided by
    the smaller box height crosses the 0.45 threshold (0.90 and ASCII-words-only
    on Japanese-bearing lines); the joined string is then line-polished.
    """
    if not boxes:
        return ""
    pieces: list[str] = []
    prev: Box | None = None
    line_has_japanese = any(contains_japanese(normalize_text(b.text)) for b in boxes)
    for box in boxes:
        cur = normalize_text(box.text)
        if not cur:
            continue
        if prev is None:
            pieces.append(cur)
            prev = box
            continue
        prev_text = normalize_text(prev.text)
        gap = max(0.0, float(box.x1) - float(prev.x2))
        gap_ratio = gap / max(1.0, min(prev.height, box.height))
        need_space = False
        if line_has_japanese:
            if (
                is_ascii_word_like(prev_text)
                and is_ascii_word_like(cur)
                and gap_ratio >= _GAP_RATIO_SPACE_JP_ASCII
            ):
                need_space = True
        else:
            if gap_ratio >= _GAP_RATIO_SPACE:
                need_space = True
        if need_space and pieces:
            pieces.append(" ")
        pieces.append(cur)
        prev = box
    joined = "".join(pieces)
    if line_has_japanese:
        return collapse_spaces_japanese(joined)
    return polish_line(joined)


def join_vertical_column(boxes: list[Box]) -> str:
    """Top-to-bottom join of one vertical column (no intra-column spacing)."""
    if not boxes:
        return ""
    ordered = sorted(boxes, key=lambda b: (b.center_y, -b.center_x, float(b.y1), float(b.x1)))
    parts = [t for t in (normalize_text(b.text) for b in ordered) if t]
    return polish_line("".join(parts))


def dedup_boxes(boxes: list[Box]) -> list[Box]:
    """Exact within-turn dedup of positioned boxes.

    Deterministic sort by (round(y1,1), round(x1,1), round(height,1), text),
    then first-wins on the key (normalized text, int-rounded bbox). Boxes whose
    text normalizes to empty are dropped. Surviving boxes carry normalized text.
    """
    deduped: list[Box] = []
    seen: set[tuple[str, int, int, int, int]] = set()
    for box in sorted(
        boxes,
        key=lambda b: (round(b.y1, 1), round(b.x1, 1), round(b.y2 - b.y1, 1), b.text),
    ):
        text_key = normalize_text(box.text)
        if not text_key:
            continue
        key = (
            text_key,
            int(round(box.x1)),
            int(round(box.y1)),
            int(round(box.x2)),
            int(round(box.y2)),
        )
        if key in seen:
            continue
        seen.add(key)
        deduped.append(Box(text=text_key, x1=box.x1, y1=box.y1, x2=box.x2, y2=box.y2))
    return deduped


def dedup_blocks(blocks: list[str]) -> list[str]:
    """Order-preserving dedup of free text blocks on normalized text."""
    out: list[str] = []
    seen: set[str] = set()
    for block in blocks:
        cleaned = normalize_text(block)
        if not cleaned or cleaned in seen:
            continue
        seen.add(cleaned)
        out.append(cleaned)
    return out


def assemble_layout_text(boxes: list[Box], blocks: list[str]) -> tuple[str, list[tuple[int, int, str]]]:
    """Turn deduped boxes + text blocks into final extracted text with spans.

    Orientation is voted per turn; lines (or vertical columns) become newline-
    joined segments, followed by any free text blocks. Returns
    ``(extracted_text, spans)`` where each span is a ``(start, end, kind)``
    character range into ``extracted_text`` and kind ∈ {"line", "column",
    "block"}.
    """
    segments: list[tuple[str, str]] = []
    if boxes:
        if is_vertical_layout(boxes):
            for col in group_into_vertical_columns(boxes):
                text = join_vertical_column(col)
                if text:
                    segments.append((text, "column"))
        else:
            for line in group_into_lines(boxes):
                text = join_line(line)
                if text:
                    segments.append((text, "line"))
    for block in blocks:
        if block:
            segments.append((block, "block"))

    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for text, kind in segments:
        if parts:
            pos += 1  # the joining "\n"
        start = pos
        parts.append(text)
        pos += len(text)
        spans.append((start, pos, kind))
    return "\n".join(parts), spans
