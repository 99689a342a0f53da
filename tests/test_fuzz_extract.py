"""Property fuzz of the per-turn extractor's hard contracts.

``extract_turn`` promises to NEVER raise and to keep its action/error/text
fields mutually consistent for ANY payload; the sniffer promises to put
every string into exactly one known kind. Hypothesis drives both with
arbitrary unicode, JSON-ish fragments, HTML-ish fragments, and binary-ish
noise.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_ocr_batch_ndrocr_lite_ray.stages.extract import (
    ACTION_EMPTY,
    ACTION_ERROR,
    ACTION_EXTRACTED,
    ACTION_FALLBACK,
    ACTION_SKIPPED_CLEAN,
    extract_turn,
)
import pyarrow as pa

from pdf_ocr_batch_ndrocr_lite_ray.stages.sniffer import (
    KIND_EMPTY,
    KIND_HTML,
    KIND_PDFISH,
    KIND_PLAIN,
    KIND_XML,
    classify_text_array,
)

KINDS = {KIND_EMPTY, KIND_PDFISH, KIND_XML, KIND_HTML, KIND_PLAIN}


def classify_text(s: str) -> str:
    return classify_text_array(pa.array([s])).to_pylist()[0]

ACTIONS = {
    ACTION_EXTRACTED,
    ACTION_FALLBACK,
    ACTION_SKIPPED_CLEAN,
    ACTION_EMPTY,
    ACTION_ERROR,
}

payloads = st.one_of(
    st.none(),
    st.text(max_size=400),
    st.text(alphabet="{}[]\":,0123456789.eE+- \n\tabc", max_size=400),  # JSON-ish
    st.text(alphabet="<>/= \"'abcdivspan\n", max_size=400),  # HTML-ish
    st.binary(max_size=200).map(lambda b: b.decode("latin-1")),
    st.sampled_from(
        [
            '{"text": "x", "bbox": [0, 0, 1, 1]}',
            '[{"text": "a"}, {"text": "b", "boundingBox": [1,2,3,4]}]',
            "<?xml version='1.0'?><PAGE><LINE X='1' Y='2' WIDTH='3' HEIGHT='4' STRING='s'/></PAGE>",
            "<p>hello</p>" * 40,
            "\f\f\f",
            "text\fmore\ftext",
        ]
    ),
)


@settings(max_examples=300, deadline=None)
@given(text=payloads)
def test_extract_turn_never_raises_and_is_consistent(text):
    kind = classify_text(text or "")
    assert kind in KINDS
    extracted, spans, action, error = extract_turn(text, kind)
    assert action in ACTIONS
    # error text present iff the action is error
    assert (action == ACTION_ERROR) == bool(error)
    # empty/error rows carry no text; extracted-ish rows carry some
    if action in (ACTION_EMPTY, ACTION_ERROR):
        assert extracted == ""
    else:
        assert extracted != ""
    # spans index into the extracted text, tile it in order without
    # overlap, and reconstruct it exactly. Separators are single chars:
    # "\n" between blocks/lines/paragraphs, "\f" between page spans.
    prev_end = None
    for s in spans:
        start, end, k = s
        assert 0 <= start <= end <= len(extracted)
        assert isinstance(k, str)
        if prev_end is not None:
            assert start == prev_end + 1  # single separator char
            assert extracted[prev_end] in ("\n", "\f")
        prev_end = end
    if spans:
        assert spans[0][0] == 0 and spans[-1][1] == len(extracted)
        rebuilt = extracted[spans[0][0] : spans[0][1]]
        for (_, pe, _), (s, e, _) in zip(spans, spans[1:]):
            rebuilt += extracted[pe] + extracted[s:e]
        assert rebuilt == extracted


@settings(max_examples=300, deadline=None)
@given(text=payloads)
def test_extract_turn_deterministic(text):
    kind = classify_text(text or "")
    assert extract_turn(text, kind) == extract_turn(text, kind)


@settings(max_examples=200, deadline=None)
@given(text=payloads, name=st.text(max_size=30))
def test_extract_paged_turn_never_raises(text, name):
    from pdf_ocr_batch_ndrocr_lite_ray.stages.paged import PAGE_SEP, extract_paged_turn

    doc, n_pages, hits = extract_paged_turn(text, src_name=name)
    assert n_pages >= 1 and hits >= 0
    # the document always carries exactly n_pages form-feed-separated pages
    assert len(doc.split(PAGE_SEP)) == n_pages


@settings(max_examples=200, deadline=None)
@given(
    shared=st.text(min_size=12, max_size=60),
    prefix_a=st.text(max_size=20),
    prefix_b=st.text(max_size=20),
)
def test_winnowing_shared_run_guarantee(shared, prefix_a, prefix_b):
    """Two documents sharing a run of ≥ w+k-1 chars MUST share a
    fingerprint — the MOSS guarantee the operator is built on."""
    from pdf_ocr_batch_ndrocr_lite_ray.functions.textstats import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    assert len(shared) >= WINNOW_W + WINNOW_K - 1
    a = winnow_fingerprints(prefix_a + shared)
    b = winnow_fingerprints(prefix_b + shared)
    assert a & b, "shared run produced no common fingerprint"
