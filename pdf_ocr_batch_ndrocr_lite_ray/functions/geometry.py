"""Geometry + dynamic-schema coercion kernel (reference M12-M16 helpers).

A positioned text span is the engine's atomic unit for PDF-ish payloads — the
analog of the reference's ``OCRToken`` dataclass (app.py:946-953). Payload
producers spell bounding boxes and text keys in many different ways; this
module centralises the schema-inference rules:

- ``bbox_from_mapping``   ⇔ ``_extract_bbox_from_mapping``  (app.py:4202-4250)
- ``coerce_bbox_value``   ⇔ ``_coerce_bbox_value``          (app.py:4254-4282)
- ``bbox_from_points``    ⇔ ``_bbox_from_points``           (app.py:4286-4292)
- ``parse_points_string`` ⇔ ``_parse_points_string``        (app.py:4296-4306)
- ``text_from_mapping``   ⇔ ``_extract_text_from_mapping``  (app.py:4145-4165)
- ``page_hint``           ⇔ ``_extract_page_hint``          (app.py:4186-4198)
- ``looks_like_text_leaf``⇔ ``_looks_like_text_leaf``       (app.py:4169-4182)

The key-probing orders are part of the conformance contract and must not be
reordered.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Mapping  # typing.Mapping isinstance is ~4x slower
from typing import Any, Iterable, Optional

BBox = tuple[float, float, float, float]


@dataclass(frozen=True)
class Box:
    """A positioned text span: the atomic unit of layout analysis."""

    text: str
    x1: float
    y1: float
    x2: float
    y2: float

    @property
    def height(self) -> float:
        return max(1.0, float(self.y2) - float(self.y1))

    @property
    def width(self) -> float:
        return max(1.0, float(self.x2) - float(self.x1))

    @property
    def center_y(self) -> float:
        return (float(self.y1) + float(self.y2)) / 2.0

    @property
    def center_x(self) -> float:
        return (float(self.x1) + float(self.x2)) / 2.0


# Probing order is part of the contract: named bbox keys first, then the
# four coordinate-spelling families.
_BBOX_KEYS = ("bbox", "box", "rect", "boundingBox", "bounding_box")

_TEXT_KEYS = (
    "text", "TEXT", "content", "CONTENT", "label", "string", "STRING",
    "unicode", "Unicode", "transcription", "recognized_text", "ocr_text",
    "PlainText",
)

_PAGE_KEYS = ("page", "page_no", "page_num", "page_index", "page_id", "pageNumber", "pageIndex")


def _xywh(obj: Mapping[str, Any], kx: str, ky: str, kw: str, kh: str) -> Optional[BBox]:
    try:
        x, y = float(obj[kx]), float(obj[ky])
        w, h = float(obj[kw]), float(obj[kh])
    except Exception:
        return None
    return (x, y, x + w, y + h)


def bbox_from_mapping(obj: Any) -> Optional[BBox]:
    """Infer an (x1, y1, x2, y2) box from any of the known key spellings."""
    if not isinstance(obj, Mapping):
        return None
    for key in _BBOX_KEYS:
        if key in obj:
            bbox = coerce_bbox_value(obj[key])
            if bbox is not None:
                return bbox
    if all(k in obj for k in ("x", "y", "w", "h")):
        bbox = _xywh(obj, "x", "y", "w", "h")
        if bbox is not None:
            return bbox
    if all(k in obj for k in ("X", "Y", "WIDTH", "HEIGHT")):
        bbox = _xywh(obj, "X", "Y", "WIDTH", "HEIGHT")
        if bbox is not None:
            return bbox
    if all(k in obj for k in ("left", "top", "width", "height")):
        bbox = _xywh(obj, "left", "top", "width", "height")
        if bbox is not None:
            return bbox
    if all(k in obj for k in ("xmin", "ymin", "xmax", "ymax")):
        try:
            return (float(obj["xmin"]), float(obj["ymin"]), float(obj["xmax"]), float(obj["ymax"]))
        except Exception:
            pass
    if all(k in obj for k in ("x1", "y1", "x2", "y2")):
        try:
            return (float(obj["x1"]), float(obj["y1"]), float(obj["x2"]), float(obj["y2"]))
        except Exception:
            pass
    return None


def coerce_bbox_value(value: Any) -> Optional[BBox]:
    """Coerce a nested bbox value: mapping, 4-list, or point list."""
    if isinstance(value, Mapping):
        return bbox_from_mapping(value)
    if isinstance(value, (list, tuple)):
        if len(value) == 4 and all(isinstance(v, (int, float, str)) for v in value):
            try:
                a, b, c, d = (float(x) for x in value)
            except Exception:
                return None
            if c > a and d > b:
                return (a, b, c, d)
        points: list[tuple[float, float]] = []
        for item in value:
            if isinstance(item, Mapping):
                x = item.get("x", item.get("X"))
                y = item.get("y", item.get("Y"))
                if x is not None and y is not None:
                    try:
                        points.append((float(x), float(y)))
                    except Exception:
                        pass
            elif isinstance(item, (list, tuple)) and len(item) >= 2:
                try:
                    points.append((float(item[0]), float(item[1])))
                except Exception:
                    pass
        if points:
            return bbox_from_points(points)
    return None


def bbox_from_points(points: Iterable[tuple[float, float]]) -> Optional[BBox]:
    pts = list(points)
    if not pts:
        return None
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


def parse_points_string(value: Optional[str]) -> list[tuple[float, float]]:
    """Parse an ``"x,y x,y ..."`` points string (PAGE-XML style)."""
    pts: list[tuple[float, float]] = []
    for part in (value or "").split():
        if "," not in part:
            continue
        xs, ys = part.split(",", 1)
        try:
            pts.append((float(xs), float(ys)))
        except ValueError:
            continue
    return pts


def text_from_mapping(obj: Any) -> Optional[str]:
    """Probe the 13 known text-key spellings, first non-blank string wins."""
    if not isinstance(obj, Mapping):
        return None
    for key in _TEXT_KEYS:
        value = obj.get(key)
        if isinstance(value, str) and value.strip():
            return value
    return None


def page_hint(obj: Any, inherited: Optional[int], page_count: int) -> Optional[int]:
    """Infer a 0-based page/fragment index, disambiguating 0- vs 1-based."""
    if isinstance(obj, Mapping):
        for key in _PAGE_KEYS:
            if key in obj:
                try:
                    value = int(obj[key])
                except Exception:
                    continue
                if 0 <= value < page_count:
                    return value
                if 1 <= value <= page_count:
                    return value - 1
    return inherited


def looks_like_text_leaf(obj: Any) -> bool:
    """A mapping is a text leaf iff it has text, no bbox, and is scalar-heavy."""
    if not isinstance(obj, Mapping):
        return False
    if bbox_from_mapping(obj) is not None:
        return False
    if not text_from_mapping(obj):
        return False
    scalar_like = 0
    complex_like = 0
    for v in obj.values():
        if isinstance(v, (str, int, float, bool)) or v is None:
            scalar_like += 1
        else:
            complex_like += 1
    return scalar_like >= complex_like
