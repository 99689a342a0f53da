"""Unit + parity tests for geometry coercion (M12-M16) and layout clustering (L1-L7)."""

from __future__ import annotations

import random

from pdf_ocr_batch_ndrocr_lite_ray.functions import geometry as geo
from pdf_ocr_batch_ndrocr_lite_ray.functions import layout as lay
from pdf_ocr_batch_ndrocr_lite_ray.functions.geometry import Box


def _random_boxes(n: int, seed: int, vertical: bool = False) -> list[Box]:
    rng = random.Random(seed)
    words = ["hello", "world", "漢字", "テスト", "ABC", "123", "日本語", "x,y", "€5", ""]
    boxes = []
    for _ in range(n):
        x = rng.uniform(0, 500)
        y = rng.uniform(0, 700)
        if vertical:
            w, h = rng.uniform(8, 14), rng.uniform(30, 80)
        else:
            w, h = rng.uniform(30, 80), rng.uniform(8, 14)
        boxes.append(Box(text=rng.choice(words), x1=x, y1=y, x2=x + w, y2=y + h))
    return boxes


def _to_ref_tokens(refmod, boxes):
    return [refmod.OCRToken(text=b.text, x1=b.x1, y1=b.y1, x2=b.x2, y2=b.y2) for b in boxes]


class TestBboxCoercion:
    def test_named_keys(self):
        for key in ("bbox", "box", "rect", "boundingBox", "bounding_box"):
            assert geo.bbox_from_mapping({key: [1, 2, 3, 4]}) == (1.0, 2.0, 3.0, 4.0)

    def test_xywh_spellings(self):
        assert geo.bbox_from_mapping({"x": 1, "y": 2, "w": 3, "h": 4}) == (1, 2, 4, 6)
        assert geo.bbox_from_mapping({"X": 1, "Y": 2, "WIDTH": 3, "HEIGHT": 4}) == (1, 2, 4, 6)
        assert geo.bbox_from_mapping({"left": 1, "top": 2, "width": 3, "height": 4}) == (1, 2, 4, 6)

    def test_corner_spellings(self):
        assert geo.bbox_from_mapping({"xmin": 1, "ymin": 2, "xmax": 3, "ymax": 4}) == (1, 2, 3, 4)
        assert geo.bbox_from_mapping({"x1": 1, "y1": 2, "x2": 3, "y2": 4}) == (1, 2, 3, 4)

    def test_degenerate_4list_rejected(self):
        assert geo.bbox_from_mapping({"bbox": [3, 4, 1, 2]}) is None

    def test_point_lists(self):
        assert geo.coerce_bbox_value([[0, 0], [5, 2], [3, 7]]) == (0, 0, 5, 7)
        assert geo.coerce_bbox_value([{"x": 1, "y": 2}, {"X": 5, "Y": 9}]) == (1, 2, 5, 9)

    def test_points_string(self):
        assert geo.parse_points_string("1,2 3,4 junk 5,6") == [(1, 2), (3, 4), (5, 6)]

    def test_text_probing_order(self):
        assert geo.text_from_mapping({"content": "b", "text": "a"}) == "a"
        assert geo.text_from_mapping({"text": "  ", "CONTENT": "c"}) == "c"
        assert geo.text_from_mapping({"other": "z"}) is None

    def test_page_hint(self):
        assert geo.page_hint({"page": 2}, None, 5) == 2
        assert geo.page_hint({"page": 5}, None, 5) == 4  # 1-based disambiguation
        assert geo.page_hint({"page": 99}, 1, 5) == 1
        assert geo.page_hint({"pageNumber": "3"}, None, 5) == 3

    def test_text_leaf(self):
        assert geo.looks_like_text_leaf({"text": "hi", "id": 1})
        assert not geo.looks_like_text_leaf({"text": "hi", "bbox": [0, 0, 1, 1]})
        assert not geo.looks_like_text_leaf({"text": "hi", "a": [1], "b": [2], "c": [3]})


class TestClustering:
    def test_two_lines(self):
        boxes = [
            Box("a", 0, 0, 10, 10),
            Box("b", 20, 1, 30, 11),
            Box("c", 0, 50, 10, 60),
        ]
        lines = lay.group_into_lines(boxes)
        assert [[b.text for b in line] for line in lines] == [["a", "b"], ["c"]]

    def test_join_line_gap_spacing(self):
        # gap/min(h) = 6/10 = 0.6 >= 0.45 → space
        spaced = lay.join_line([Box("hello", 0, 0, 30, 10), Box("world", 36, 0, 60, 10)])
        assert spaced == "hello world"
        # gap ratio 0.2 < 0.45 → no space
        tight = lay.join_line([Box("hel", 0, 0, 30, 10), Box("lo", 32, 0, 60, 10)])
        assert tight == "hello"

    def test_join_line_japanese(self):
        # JP line: ASCII pair with huge gap keeps space; JP tokens never spaced
        out = lay.join_line([
            Box("日本", 0, 0, 20, 10),
            Box("語", 25, 0, 35, 10),
            Box("AB", 50, 0, 70, 10),
            Box("CD", 90, 0, 110, 10),
        ])
        assert out == "日本語AB CD"

    def test_vertical_layout_vote(self):
        assert lay.is_vertical_layout(_random_boxes(20, 1, vertical=True))
        assert not lay.is_vertical_layout(_random_boxes(20, 1, vertical=False))
        assert not lay.is_vertical_layout(_random_boxes(5, 1, vertical=True))  # < 6 boxes

    def test_dedup_boxes(self):
        boxes = [
            Box("dup", 10, 10, 20, 20),
            Box("dup", 10.2, 10.3, 20.1, 19.9),  # int-rounds to same key
            Box("dup", 100, 10, 120, 20),  # different place, kept
            Box("  ", 0, 0, 5, 5),  # empty after normalize, dropped
        ]
        out = lay.dedup_boxes(boxes)
        assert [b.text for b in out] == ["dup", "dup"]

    def test_dedup_blocks(self):
        assert lay.dedup_blocks(["a  b", "a b", "c", "", "c"]) == ["a b", "c"]

    def test_assemble_spans(self):
        text, spans = lay.assemble_layout_text(
            [Box("hello", 0, 0, 30, 10), Box("bye", 0, 50, 30, 60)], ["blocky"]
        )
        assert text == "hello\nbye\nblocky"
        assert spans == [(0, 5, "line"), (6, 9, "line"), (10, 16, "block")]
        for start, end, _ in spans:
            assert "\n" not in text[start:end]


class TestReferenceParity:
    def test_group_lines(self, refmod):
        for seed in range(20):
            boxes = _random_boxes(40, seed)
            ours = lay.group_into_lines(boxes)
            theirs = refmod._group_tokens_into_lines(_to_ref_tokens(refmod, boxes))
            assert [[(b.text, b.x1, b.y1) for b in l] for l in ours] == [
                [(t.text, t.x1, t.y1) for t in l] for l in theirs
            ]

    def test_group_columns(self, refmod):
        for seed in range(20):
            boxes = _random_boxes(40, seed, vertical=True)
            ours = lay.group_into_vertical_columns(boxes)
            theirs = refmod._group_tokens_into_vertical_columns(_to_ref_tokens(refmod, boxes))
            assert [[(b.text, b.x1, b.y1) for b in l] for l in ours] == [
                [(t.text, t.x1, t.y1) for t in l] for l in theirs
            ]

    def test_vertical_vote(self, refmod):
        for seed in range(20):
            for vertical in (False, True):
                boxes = _random_boxes(30, seed, vertical=vertical)
                assert lay.is_vertical_layout(boxes) == refmod._is_vertical_page(
                    _to_ref_tokens(refmod, boxes)
                )

    def test_join_line(self, refmod):
        for seed in range(40):
            boxes = sorted(_random_boxes(12, seed), key=lambda b: (b.x1, b.x2))
            assert lay.join_line(boxes) == refmod._join_tokens_for_hidden_line(
                _to_ref_tokens(refmod, boxes)
            )

    def test_join_vertical(self, refmod):
        for seed in range(40):
            boxes = _random_boxes(12, seed, vertical=True)
            assert lay.join_vertical_column(boxes) == refmod._join_tokens_for_vertical_hidden_column(
                _to_ref_tokens(refmod, boxes)
            )

    def test_bbox_mapping_fuzz(self, refmod):
        rng = random.Random(9)
        spellings = [
            lambda: {"bbox": [1, 2, 3, 4]},
            lambda: {"box": {"x": 1, "y": 2, "w": 3, "h": 4}},
            lambda: {"x": rng.random(), "y": rng.random(), "w": 1, "h": 2},
            lambda: {"left": 0, "top": 1, "width": 2, "height": 3},
            lambda: {"xmin": 0, "ymin": 1, "xmax": 2, "ymax": 3},
            lambda: {"x1": 0, "y1": 1, "x2": 2, "y2": 3},
            lambda: {"boundingBox": [[0, 0], [4, 1], [2, 6]]},
            lambda: {"rect": ["a", "b", "c", "d"]},
            lambda: {"bbox": [4, 4, 1, 1]},
            lambda: {"nothing": 1},
        ]
        for _ in range(100):
            obj = rng.choice(spellings)()
            assert geo.bbox_from_mapping(obj) == refmod._extract_bbox_from_mapping(obj)

    def test_text_and_leaf_fuzz(self, refmod):
        rng = random.Random(11)
        keys = ["text", "TEXT", "content", "CONTENT", "label", "string", "STRING",
                "unicode", "Unicode", "transcription", "recognized_text", "ocr_text",
                "PlainText", "junk"]
        for _ in range(200):
            obj = {rng.choice(keys): rng.choice(["hi", "", "  ", 5, None]) for _ in range(rng.randrange(0, 5))}
            assert geo.text_from_mapping(obj) == refmod._extract_text_from_mapping(obj)
            assert geo.looks_like_text_leaf(obj) == refmod._looks_like_text_leaf(obj)

    def test_page_hint_fuzz(self, refmod):
        rng = random.Random(13)
        keys = ["page", "page_no", "page_num", "page_index", "page_id", "pageNumber", "pageIndex", "junk"]
        for _ in range(200):
            obj = {rng.choice(keys): rng.choice([0, 1, 3, 5, 99, "2", "x", None]) for _ in range(rng.randrange(0, 4))}
            inherited = rng.choice([None, 0, 2])
            assert geo.page_hint(obj, inherited, 5) == refmod._extract_page_hint(obj, inherited, 5)
