"""Fuzz parity for the page-aware parse + merge kernels (reference M11/M12).

Both kernels are compared DIRECTLY against the reference implementation
(``_parse_json_file`` / ``_merge_assignments``) over randomized paged
payloads and merge states.
"""

from __future__ import annotations

import json
import random
import types
from pathlib import Path

import pytest

from pdf_ocr_batch_ndrocr_lite_ray.functions.geometry import Box
from pdf_ocr_batch_ndrocr_lite_ray.stages import paged


def _prepared(refmod, stems):
    class _Page:
        def __init__(self, index, stem):
            self.index = index
            self.image_path = Path(f"{stem}.png")

    return types.SimpleNamespace(
        pages=[_Page(i, s) for i, s in enumerate(stems)]
    )


def _rand_entry(rng):
    r = rng.random()
    if r < 0.4:
        return {
            "text": rng.choice(["hello world", "図 1", "  ", "line text"]),
            "boundingBox": [rng.randint(0, 50), rng.randint(0, 50),
                            rng.randint(51, 100), rng.randint(51, 100)],
        }
    if r < 0.6:
        return {"text": rng.choice(["plain block", "", "note"]), "conf": 0.9}
    if r < 0.8:
        return {
            "page": rng.randint(0, 4),
            "content": rng.choice(["paged text", "x"]),
            "bbox": {"x": 1, "y": 2, "w": 10, "h": 5},
        }
    return {"meta": {"nested": {"text": "deep", "x1": 0, "y1": 0, "x2": 5, "y2": 5}}}


def _rand_payload(rng):
    shape = rng.random()
    if shape < 0.4:  # NDLOCR-style paged contents
        n_pages = rng.randint(1, 4)
        payload = {
            "contents": [
                [_rand_entry(rng) for _ in range(rng.randint(0, 3))]
                for _ in range(n_pages)
            ]
        }
        if rng.random() < 0.5:
            payload["imginfo"] = {"img_name": rng.choice(
                ["scan_0001.png", "p0002.jpg", "unrelated.png"])}
        return payload
    if shape < 0.7:  # generic nested
        return {
            "pages": [
                {"page_index": i, "lines": [_rand_entry(rng) for _ in range(2)]}
                for i in range(rng.randint(1, 3))
            ]
        }
    return [_rand_entry(rng) for _ in range(rng.randint(0, 4))]


def _ref_maps(refmod, payload, stems, tmp_path, i):
    parser = refmod.OCRResultParser(log=lambda level, msg: None)
    p = tmp_path / f"frag_{i}.json"
    p.write_text(json.dumps(payload), encoding="utf-8")
    return parser._parse_json_file(p, _prepared(refmod, stems))


class TestParsePagesParity:
    def test_fuzz_vs_reference(self, refmod, tmp_path):
        rng = random.Random(202)
        stems_pool = ["scan_0001", "p0002", "page3", "doc-final"]
        for i in range(120):
            stems = rng.sample(stems_pool, rng.randint(1, 4))
            payload = _rand_payload(rng)
            ref_tokens, ref_texts = _ref_maps(refmod, payload, stems, tmp_path, i)
            got_tokens, got_texts = paged.parse_pdfish_pages(
                json.dumps(payload), len(stems), stems
            )
            assert set(got_tokens) == set(ref_tokens), (i, payload)
            for page in ref_tokens:
                ours = [(b.text, b.x1, b.y1, b.x2, b.y2) for b in got_tokens[page]]
                ref = [(t.text, t.x1, t.y1, t.x2, t.y2) for t in ref_tokens[page]]
                assert ours == ref, (i, page, payload)
            assert got_texts == ref_texts, (i, payload)

    def test_ndlocr_fast_path_page_alignment(self):
        payload = {
            "contents": [
                [{"text": "page one", "boundingBox": [0, 0, 10, 10]}],
                [{"text": "page two", "boundingBox": [0, 0, 10, 10]}],
            ]
        }
        tokens, texts = paged.parse_pdfish_pages(json.dumps(payload), 2, ["a", "b"])
        assert sorted(tokens) == [0, 1]
        assert tokens[0][0].text == "page one" and tokens[1][0].text == "page two"

    def test_single_content_uses_imginfo_guess(self):
        payload = {
            "contents": [[{"text": "attributed", "boundingBox": [0, 0, 9, 9]}]],
            "imginfo": {"img_name": "scan_0002.png"},
        }
        tokens, _ = paged.parse_pdfish_pages(
            json.dumps(payload), 3, ["scan_0001", "scan_0002", "scan_0003"]
        )
        assert list(tokens) == [1]


class TestMergeParity:
    def _rand_state(self, rng, refmod, n_pages):
        ours: dict[int, paged.PageOcr] = {}
        theirs = {}
        for i in range(n_pages):
            toks = [
                ("t%d" % rng.randint(0, 5), float(rng.randint(0, 9)), 1.0, 5.0, 2.0)
                for _ in range(rng.randint(0, 2))
            ]
            blocks = rng.sample(["", "existing", "x"], rng.randint(0, 2))
            ours[i] = paged.PageOcr(
                tokens=[Box(text=t, x1=a, y1=b, x2=c, y2=d) for t, a, b, c, d in toks],
                text_blocks=list(blocks),
            )
            theirs[i] = refmod.PageOcrData(
                tokens=[refmod.OCRToken(text=t, x1=a, y1=b, x2=c, y2=d)
                        for t, a, b, c, d in toks],
                text_blocks=list(blocks),
            )
        return ours, theirs

    def test_fuzz_vs_reference(self, refmod):
        rng = random.Random(99)
        stems_pool = ["scan_0001", "p0002", "page3", "doc-final", "img"]
        src_pool = ["frag_p0001", "out_page3", "nothing", "scan_0001_ocr", "doc-final"]
        for trial in range(200):
            n_pages = rng.randint(1, 4)
            stems = rng.sample(stems_pool, n_pages)
            ours, theirs = self._rand_state(rng, refmod, n_pages)
            assignments = {}
            texts = {}
            for page in list(range(-1, n_pages)) + [7]:
                if rng.random() < 0.5:
                    assignments[page] = [
                        Box(text="new", x1=0.0, y1=0.0, x2=1.0, y2=1.0)
                        for _ in range(rng.randint(0, 2))
                    ]
                if rng.random() < 0.5:
                    texts[page] = rng.sample(["", "added", "more"], rng.randint(0, 2))
            only_empty = rng.random() < 0.5
            src = rng.choice(src_pool)

            ref_assign = {
                p: [refmod.OCRToken(text=b.text, x1=b.x1, y1=b.y1, x2=b.x2, y2=b.y2)
                    for b in v]
                for p, v in assignments.items()
            }
            parser = refmod.OCRResultParser(log=lambda level, msg: None)
            ref_hits = parser._merge_assignments(
                theirs, ref_assign, {p: list(v) for p, v in texts.items()},
                Path(src + ".json"), _prepared(refmod, stems),
                only_empty_pages=only_empty,
            )
            got_hits = paged.merge_assignments(
                ours, {p: list(v) for p, v in assignments.items()},
                {p: list(v) for p, v in texts.items()},
                src, stems, only_empty_pages=only_empty,
            )
            assert got_hits == ref_hits, (trial, src, stems, only_empty)
            for i in range(n_pages):
                assert [t.text for t in ours[i].tokens] == [
                    t.text for t in theirs[i].tokens
                ], (trial, i)
                assert ours[i].text_blocks == theirs[i].text_blocks, (trial, i)


class TestExtractPagedTurn:
    def test_paged_document_joins_with_form_feed(self):
        payload = {
            "contents": [
                [{"text": "alpha", "boundingBox": [0, 0, 10, 10]}],
                [{"text": "beta", "boundingBox": [0, 0, 10, 10]}],
                [],
            ]
        }
        text, n_pages, hits = paged.extract_paged_turn(json.dumps(payload))
        assert n_pages == 3
        assert text.split(paged.PAGE_SEP) == ["alpha", "beta", ""]
        assert hits >= 2

    def test_unparseable_payload_falls_back_to_plain(self):
        text, n_pages, hits = paged.extract_paged_turn("{truncated json  here")
        assert n_pages == 1
        assert "truncated" in text and hits == 1

    def test_empty_payload(self):
        text, n_pages, hits = paged.extract_paged_turn("")
        assert (text, n_pages, hits) == ("", 1, 0)

    def test_structured_success_suppresses_fallback(self):
        payload = {"contents": [[{"text": "only page", "boundingBox": [0, 0, 9, 9]}], []]}
        text, n_pages, hits = paged.extract_paged_turn(json.dumps(payload))
        # page 2 stays empty: the raw-JSON fallback must NOT leak into it
        assert text.split(paged.PAGE_SEP) == ["only page", ""]
