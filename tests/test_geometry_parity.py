"""Fuzz the dynamic-schema coercers against the reference implementation.

SURVEY.md §7 "Hard parts" #6: the recursive key-probing (bbox spellings,
text keys, page hints — reference app.py:4145-4306) is easy to get subtly
wrong; these tests generate arbitrary mapping shapes and require exact
agreement with the reference functions.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_ocr_batch_ndrocr_lite_ray.functions.geometry import (
    bbox_from_mapping,
    page_hint,
    text_from_mapping,
)

_nums = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.floats(min_value=-1000, max_value=1000, allow_nan=False),
)
_bbox_keys = st.sampled_from(
    ["bbox", "box", "rect", "boundingBox", "bounding_box",
     "x", "y", "w", "h", "X", "Y", "WIDTH", "HEIGHT",
     "left", "top", "width", "height",
     "xmin", "ymin", "xmax", "ymax", "x1", "y1", "x2", "y2"]
)
_text_keys = st.sampled_from(
    ["text", "TEXT", "Text", "content", "CONTENT", "string", "STRING",
     "value", "word", "words", "line", "label", "PlainText", "ocr", "other"]
)
_page_keys = st.sampled_from(
    ["page", "page_num", "page_number", "pageIndex", "page_index",
     "pageNo", "page_no", "index", "n"]
)

_bbox_value = st.one_of(
    _nums,
    st.lists(_nums, min_size=0, max_size=5),
    st.lists(st.tuples(_nums, _nums), min_size=0, max_size=5),
    st.text(
        alphabet="0123456789., -x", max_size=24
    ),
)

_mapping = st.dictionaries(
    st.one_of(_bbox_keys, _text_keys, _page_keys),
    st.one_of(
        _bbox_value,
        st.text(max_size=12),
        st.integers(min_value=-5, max_value=50),
        st.none(),
    ),
    max_size=6,
)


class TestCoercionParity:
    @settings(max_examples=400, deadline=None)
    @given(_mapping)
    def test_bbox_parity(self, refmod, obj):
        ours = bbox_from_mapping(obj)
        theirs = refmod._extract_bbox_from_mapping(obj)
        if ours is None or theirs is None:
            assert ours == theirs
        else:
            assert ours == pytest.approx(theirs)

    @settings(max_examples=400, deadline=None)
    @given(_mapping)
    def test_text_parity(self, refmod, obj):
        assert text_from_mapping(obj) == refmod._extract_text_from_mapping(obj)

    @settings(max_examples=400, deadline=None)
    @given(_mapping, st.one_of(st.none(), st.integers(0, 10)), st.integers(1, 12))
    def test_page_hint_parity(self, refmod, obj, inherited, page_count):
        assert page_hint(obj, inherited, page_count) == refmod._extract_page_hint(
            obj, inherited, page_count
        )

    @settings(max_examples=300, deadline=None)
    @given(_bbox_value)
    def test_coerce_bbox_value_parity(self, refmod, value):
        from pdf_ocr_batch_ndrocr_lite_ray.functions.geometry import coerce_bbox_value

        ours = coerce_bbox_value(value)
        theirs = refmod._coerce_bbox_value(value)
        if ours is None or theirs is None:
            assert ours == theirs
        else:
            assert ours == pytest.approx(theirs)
