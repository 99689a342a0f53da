"""Content-kind sniffer: route each turn's payload to an extractor family.

The reference decides per input file whether OCR can be skipped using **dual
evidence over a bounded scope** — extracted-char count plus raw text-operator
count, checked on at most the first 20 pages (``PdfInspector.has_text_layer``,
app.py:1155-1278, thresholds app.py:98-100). This stage is the transcript
analog: a vectorized classifier over a **bounded prefix** (4 KiB) of each
turn's ``text`` that emits a ``content_kind`` column:

- ``empty``  — whitespace-only payload
- ``pdfish`` — JSON-ish positioned-text payload (first non-space char ``{``/``[``)
- ``xml``    — positioned-token XML: an ``<?xml`` prolog or an NDLOCR /
  ALTO / PAGE-XML signature tag (``<PAGE``, ``<LINE ``, ``<alto``,
  ``<PcGts``) in the prefix — checked BEFORE the html rule so OCR XML never
  degrades to tag-stripping (the reference routes these by ``.xml``
  extension, app.py:1659-1661)
- ``html``   — markup, by dual evidence: ≥1 tag-like match AND (a known tag
  name OR tag density ≥ 3 in the prefix)
- ``plain``  — everything else

The whole stage is Arrow-native (``pyarrow.compute`` regex kernels over a
zero-copy batch); no Python row loop. Final validation happens at parse time
in the extractor — a ``pdfish`` row whose JSON is truncated becomes
``action="error"`` there (per-item error isolation, reference app.py:2845-2854).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SNIFF_PREFIX_BYTES = 4096

KIND_EMPTY = "empty"
KIND_PDFISH = "pdfish"
KIND_XML = "xml"
KIND_HTML = "html"
KIND_PLAIN = "plain"

_JSONISH_RE = r"^\s*[\[{]"
#: case-sensitive: NDLOCR/ALTO/PAGE-XML tag names are uppercase-exact;
#: lowercase html <line> (nonstandard) stays on the html path
XMLISH_RE = r"^\s*<\?xml|<(PAGE|alto|PcGts)[\s>]|<LINE\s"
_TAG_RE = r"</?[A-Za-z][A-Za-z0-9]*(\s[^>]*)?>"
_KNOWN_TAG_RE = (
    r"(?i)<(p|div|html|body|head|br|span|a|li|ul|ol|h[1-6]|nav|footer|header|"
    r"table|td|th|tr|article|section|main|aside|pre|blockquote|script|style|"
    r"img|form|em|strong|b|i|code)\b"
)
_MIN_TAG_DENSITY = 3


def classify_text_array(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized kind classification of a string array (nulls → empty)."""
    text = pc.fill_null(text, "")
    prefix = pc.utf8_slice_codeunits(text, 0, SNIFF_PREFIX_BYTES)
    is_empty = pc.equal(pc.utf8_trim_whitespace(prefix), "")
    jsonish = pc.match_substring_regex(prefix, _JSONISH_RE)
    xmlish = pc.match_substring_regex(prefix, XMLISH_RE)
    tag_count = pc.count_substring_regex(prefix, _TAG_RE)
    has_tag = pc.greater_equal(tag_count, 1)
    known_tag = pc.match_substring_regex(prefix, _KNOWN_TAG_RE)
    dense_tags = pc.greater_equal(tag_count, _MIN_TAG_DENSITY)
    htmlish = pc.and_(has_tag, pc.or_(known_tag, dense_tags))

    kind = pc.if_else(
        is_empty,
        pa.scalar(KIND_EMPTY),
        pc.if_else(
            jsonish,
            pa.scalar(KIND_PDFISH),
            pc.if_else(
                xmlish,
                pa.scalar(KIND_XML),
                pc.if_else(htmlish, pa.scalar(KIND_HTML), pa.scalar(KIND_PLAIN)),
            ),
        ),
    )
    if isinstance(kind, pa.ChunkedArray):
        kind = kind.combine_chunks()
    return kind


def sniff_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """``map_batches`` fn: append a ``content_kind`` column to the batch."""
    kinds = classify_text_array(batch[text_column])
    return batch.append_column("content_kind", kinds)


def classify_one(text: str | None) -> str:
    """Single-string convenience wrapper (used by the oracle)."""
    return classify_text_array(pa.array([text], type=pa.string()))[0].as_py()
