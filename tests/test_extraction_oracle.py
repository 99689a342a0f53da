"""Value-level parity between the plain-path SQL oracle and the engine.

The flagship extraction's plain family is SQL-expressible; these tests pin
the DuckDB rewrite (capture groups instead of RE2-less lookarounds, unrolled
fixpoint) against the Python kernel it mirrors:

- ``normalize_text_sql`` ≡ ``textnorm.normalize_text`` on adversarial and
  randomized inputs;
- the unroll depth has ≥2x margin (3 passes reach the fixpoint on every
  generated segment; the oracle uses 6);
- the full CTE chain (sniff → segment → normalize → dedup → join → action)
  matches the engine per turn on a synthesized transcript table.
"""

from __future__ import annotations

import random
import re

import duckdb
import pytest

from pdf_ocr_batch_ndrocr_lite_ray.functions.textnorm import normalize_text
from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction_queries import (
    _plain_turns_cte,
    normalize_text_sql,
)
from pdf_ocr_batch_ndrocr_lite_ray.stages.extract import extract_plain
from pdf_ocr_batch_ndrocr_lite_ray.stages.sniffer import classify_one

_FF = re.compile(r"\f+")

ADVERSARIAL = [
    "",
    "   ",
    "\t\n\f\r ",
    "日 本 語 の 文 章",
    "同 じ 文 字 が 続 く と き の 連 鎖 で す よ ね",
    "alpha 42 beta 7 x",
    "a 1 b 2 c 3 d 4 e 5",
    "¥ 12345 and ￥ 678",
    "（ hello ） [ x ] 【 日 本 】 「 あ 」 『 い 』",
    "● item • another ● 三 つ 目",
    "a , b 。 c ， d ． e : f ; g",
    "Ｆｕｌｌ　ｗｉｄｔｈ ！ ？ ～",
    "mix 日 本 ascii words 漢 字 42 x 7 日",
    "(  deep （ （ nest ) ）",
    "P 12 ペ ー ジ 3 頁",
    "already-clean single token",
]

_CHARS = list("ab1 2（）[]【】「」¥●•、。，．,:;日本語漢字カナあいう ！Ｘ　") + ["  ", "\t"]


def _rand_strings(n: int, seed: int = 99) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(_CHARS) for _ in range(rng.randrange(0, 40))))
    return out


class TestNormalizeSql:
    def test_adversarial_parity(self):
        con = duckdb.connect()
        for s in ADVERSARIAL + _rand_strings(400):
            got = con.execute(f"SELECT {normalize_text_sql('?')}", [s]).fetchone()[0]
            assert got == normalize_text(s), repr(s)

    def test_unroll_margin(self):
        """3 passes reach the fixpoint everywhere the oracle's 6 do."""
        con = duckdb.connect()
        for s in ADVERSARIAL + _rand_strings(400, seed=123):
            lo = con.execute(
                f"SELECT {normalize_text_sql('?', iters=3)}", [s]
            ).fetchone()[0]
            assert lo == normalize_text(s), repr(s)

    def test_idempotent(self):
        con = duckdb.connect()
        for s in ADVERSARIAL:
            once = con.execute(f"SELECT {normalize_text_sql('?')}", [s]).fetchone()[0]
            twice = con.execute(f"SELECT {normalize_text_sql('?')}", [once]).fetchone()[0]
            assert once == twice


class TestPlainTurnsCte:
    @pytest.fixture(scope="class")
    def synth(self, tmp_path_factory):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts

        out = tmp_path_factory.mktemp("oracle") / "synth.parquet"
        write_transcripts(out, n_convs=30, seed=31)
        return str(out)

    def test_full_chain_matches_engine(self, synth):
        import pyarrow.parquet as pq

        sql = (
            _plain_turns_cte(synth)
            + "\nSELECT conv_id, turn_idx, extracted_text, action FROM plain_turns"
        )
        df = duckdb.connect().execute(sql).df()
        oracle = {
            (r.conv_id, r.turn_idx): (r.extracted_text, r.action)
            for r in df.itertuples()
        }

        tbl = pq.read_table(synth, columns=["conv_id", "turn_idx", "text"])
        engine = {}
        for cid, tix, txt in zip(
            tbl["conv_id"].to_pylist(),
            tbl["turn_idx"].to_pylist(),
            tbl["text"].to_pylist(),
        ):
            if classify_one(txt) != "plain":
                continue
            ext, _spans = extract_plain(txt or "")
            action = (
                "empty"
                if not ext
                else ("skipped_clean" if ext == (txt or "") else "extracted")
            )
            engine[(cid, tix)] = (ext, action)

        assert engine and set(engine) == set(oracle)
        for key, val in engine.items():
            assert oracle[key] == val, key

    def test_actions_cover_skip_and_extract(self, synth):
        sql = (
            _plain_turns_cte(synth)
            + "\nSELECT action, count(*) AS n FROM plain_turns GROUP BY 1"
        )
        counts = dict(duckdb.connect().execute(sql).fetchall())
        assert counts.get("extracted", 0) > 0
        assert counts.get("skipped_clean", 0) > 0  # idempotence probes exist


class TestJsonlSource:
    """The NDJSON transcript twin must extract identically to parquet —
    source-format interchangeability of the whole plain path."""

    @pytest.fixture(scope="class")
    def twins(self, tmp_path_factory):
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import (
            write_transcript_jsonl,
            write_transcripts,
        )

        d = tmp_path_factory.mktemp("jsonl")
        pq_path, js_path = str(d / "t.parquet"), str(d / "t.jsonl")
        write_transcripts(pq_path, n_convs=30, seed=31)
        write_transcript_jsonl(js_path, n_convs=30, seed=31)
        return pq_path, js_path

    def test_oracle_cte_identical_across_containers(self, twins):
        pq_path, js_path = twins
        sel = (
            "\nSELECT conv_id, turn_idx, extracted_text, action FROM plain_turns"
            "\nORDER BY conv_id, turn_idx"
        )
        con = duckdb.connect()
        a = con.execute(_plain_turns_cte(pq_path) + sel).df()
        b = con.execute(
            _plain_turns_cte(js_path, reader="read_json_auto") + sel
        ).df()
        assert len(a) == len(b) > 0
        assert a.astype(str).equals(b.astype(str))

    def test_ray_read_json_route_matches_parquet_route(self, ray_session, twins):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import (
            build_extraction,
            extract_transcripts,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction_queries import (
            _plain_filter,
        )

        pq_path, js_path = twins

        def coerce(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "conv_id": t["conv_id"],
                    "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                    "text": t["text"],
                }
            )

        src = ray.data.read_json(js_path).map_batches(coerce, batch_format="pyarrow")
        via_json = (
            build_extraction(src)
            .map_batches(_plain_filter, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        via_parquet = (
            extract_transcripts(pq_path)
            .map_batches(_plain_filter, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(via_json) == len(via_parquet) > 0
        assert via_json.astype(str).equals(via_parquet.astype(str))


class TestAdversarialTranscriptParity:
    """Plain-path / fallback / sniff CTEs on a NASTY transcript table —
    CRLF, form feeds, unicode whitespace, CJK adjacency (fixpoint rules),
    JSON-ish prefixes, truncated JSON — built for a custom path via the
    same CTE builders the registered oracles use."""

    TEXTS = [
        "",
        "   ",
        "plain line\r\nwith crlf",
        "page one\ftwo\f\fthree",
        "ＡＢＣ　日本語 と english 123 mixed",
        "（ quoted ） and ● bullet , punct",
        "a  b   c　d\xa0e",
        "{not json at all",
        '[{"text": "tok", "bbox": [1, 2, 3, 4]}]',
        '{"truncated": ',
        "<p>html-ish</p> body",
        "123 abc 456 def ¥ 100",
        "日本語テキスト" * 40,
        "dup seg\fdup seg\funique",
        # Non-standard JSON constants (ADVICE r2): BOTH Python json.loads and
        # this DuckDB build's json_valid (yyjson) ACCEPT NaN/Infinity, so
        # these sniff pdfish, parse successfully in both systems, and take
        # the structured (non-fallback) route — agreement pinned by
        # test_fallback_cte_matches_engine running over them.
        "[NaN]",
        '{"a": Infinity}',
    ]

    @pytest.fixture(scope="class")
    def nasty_path(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = []
        for i, t in enumerate(self.TEXTS):
            rows.append(
                {
                    "conv_id": f"c{i % 3}",
                    "turn_idx": i,
                    "role": "user",
                    "text": t,
                    "tool": "",
                    "ts": 0,
                }
            )
        d = tmp_path_factory.mktemp("nasty_transcripts")
        p = d / "t.parquet"
        pq.write_table(pa.Table.from_pylist(rows), p)
        return str(p)

    def test_plain_turns_cte_matches_engine(self, ray_session, nasty_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import extract_transcripts
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction_queries import (
            _plain_turns_cte,
        )

        ds = extract_transcripts(nasty_path)
        got = {}
        for r in ds.take_all():
            if r["content_kind"] == "plain":
                got[(r["conv_id"], r["turn_idx"])] = (r["extracted_text"], r["action"])
        sql = (
            _plain_turns_cte(nasty_path)
            + "\nSELECT conv_id, turn_idx, extracted_text, action FROM plain_turns"
        )
        want = {
            (cid, tix): (txt, act)
            for cid, tix, txt, act in duckdb.connect().execute(sql).fetchall()
        }
        assert got == want

    def test_fallback_cte_matches_engine(self, ray_session, nasty_path):
        import duckdb
        import json as _json

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction import extract_transcripts
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction_queries import (
            SNIFF_CASE_SQL,
            _plain_turns_cte,
        )

        ds = extract_transcripts(nasty_path)
        got = {}
        for r in ds.take_all():
            if r["content_kind"] != "pdfish":
                continue
            try:
                _json.loads(r["text"] or "")
            except Exception:
                got[(r["conv_id"], r["turn_idx"])] = (r["extracted_text"], r["action"])
        sql = (
            _plain_turns_cte(
                nasty_path,
                turn_filter=f"{SNIFF_CASE_SQL} = 'pdfish' AND NOT json_valid(text)",
            )
            + """
SELECT conv_id, turn_idx, extracted_text,
       CASE WHEN extracted_text = '' THEN 'empty' ELSE 'extracted_fallback' END AS action
FROM plain_turns"""
        )
        want = {
            (cid, tix): (txt, act)
            for cid, tix, txt, act in duckdb.connect().execute(sql).fetchall()
        }
        assert got == want
        assert len(got) >= 2  # the nasty table plants undecodable pdfish rows

    def test_sniff_case_matches_engine(self, ray_session, nasty_path):
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.stages.sniffer import (
            SNIFF_PREFIX_BYTES,
            classify_text_array,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction_queries import (
            SNIFF_CASE_SQL,
        )
        import pyarrow as pa

        got = classify_text_array(pa.array(self.TEXTS)).to_pylist()
        sql = f"""
WITH p AS (
  SELECT turn_idx, substr(text, 1, {SNIFF_PREFIX_BYTES}) AS pre
  FROM read_parquet('{nasty_path}')
)
SELECT turn_idx, {SNIFF_CASE_SQL} AS kind FROM p ORDER BY turn_idx
"""
        want = [k for _, k in duckdb.connect().execute(sql).fetchall()]
        assert got == want


class TestJsonAcceptParity:
    """The fallback oracle's precondition: the engine's JSON accept set
    (Python ``json.loads`` — the reference's loader, app.py `_parse_json_file`)
    must agree with DuckDB ``json_valid`` on every pdfish payload the corpus
    can produce. The two parsers are NOT equal in general — this DuckDB
    build's yyjson is strictly laxer — so the invariant is pinned two ways:
    the frontier is documented (so a DuckDB upgrade that moves it fails
    loudly) and the synthesized corpus is scanned row-for-row."""

    # Measured divergence frontier (DuckDB 1.0.0 yyjson): every divergence is
    # duckdb-accepts / python-rejects. ADVICE r2 assumed json_valid rejects
    # NaN/Infinity — empirically FALSE in this build (see AGREE_ACCEPT), which
    # is why the engine keeps reference json.loads semantics instead of a
    # parse_constant-strict loader that would diverge from BOTH systems.
    DUCKDB_LAXER = ["[nan]", "[NAN]", "[inf]", "[-inf]", "[infinity]", "[1,]", '{"a":1,}']
    AGREE_ACCEPT = ["[NaN]", "[Infinity]", "[-Infinity]", '{"a": NaN}', "[1e999]"]
    AGREE_REJECT = ["[+1]", "[.5]", "[01]", "['a']", "[0x10]", "{trunc", ""]

    @staticmethod
    def _py_accepts(s: str) -> bool:
        import json as _json

        try:
            _json.loads(s)
            return True
        except Exception:
            return False

    @staticmethod
    def _duck_accepts(con, s: str) -> bool:
        return bool(con.execute("SELECT json_valid(?)", [s]).fetchone()[0])

    def test_divergence_frontier_is_where_we_measured_it(self):
        con = duckdb.connect()
        for s in self.DUCKDB_LAXER:
            assert self._duck_accepts(con, s) and not self._py_accepts(s), s
        for s in self.AGREE_ACCEPT:
            assert self._duck_accepts(con, s) and self._py_accepts(s), s
        for s in self.AGREE_REJECT:
            assert not self._duck_accepts(con, s) and not self._py_accepts(s), s

    def test_corpus_agrees_row_for_row(self, tmp_path_factory):
        """Scan EVERY pdfish turn the generator emits (including the planted
        malformed-JSON fallback rows) and assert json.loads-accept ==
        json_valid — the exact subset-pick the fallback oracle relies on."""
        import pyarrow.parquet as pq

        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts
        from pdf_ocr_batch_ndrocr_lite_ray.stages.sniffer import classify_one

        out = tmp_path_factory.mktemp("jsonparity") / "t.parquet"
        write_transcripts(out, n_convs=120, seed=7)
        texts = pq.read_table(out, columns=["text"])["text"].to_pylist()
        con = duckdb.connect()
        pdfish = [t for t in texts if classify_one(t or "") == "pdfish"]
        assert len(pdfish) > 50
        disagree = [
            t
            for t in pdfish
            if self._py_accepts(t or "") != self._duck_accepts(con, t or "")
        ]
        assert disagree == []
        # both branches of the pick are exercised
        assert any(self._py_accepts(t or "") for t in pdfish)
        assert any(not self._py_accepts(t or "") for t in pdfish)


class TestExpectedActionOracle:
    def test_engine_actions_match_corpus_derived_expectations(self, ray_session):
        """extract_action_counts vs the construction-knowledge expectation
        table: the html/xml/pdfish parse-success decisions (the non-SQL
        part of the action column) are pinned by generator-family labels,
        never by re-running the structured extractors."""
        import duckdb

        from pdf_ocr_batch_ndrocr_lite_ray.pipelines import queryset
        from pdf_ocr_batch_ndrocr_lite_ray.pipelines.extraction_queries import (
            materialize_expected_action_counts,
        )

        sf = "/root/testdata/sf0.001"
        p = materialize_expected_action_counts(sf)
        exp = duckdb.sql(f"SELECT action, n FROM read_parquet('{p}')").df()
        got = queryset.QUERIES["extract_action_counts"](sf).to_pandas()
        assert dict(zip(exp.action, exp.n)) == dict(zip(got.action, got.n))
        # every action class is exercised by the corpus
        assert set(exp.action) == {
            "empty",
            "extracted",
            "extracted_fallback",
            "skipped_clean",
        }

    def test_expected_labels_are_per_turn_correct(self, ray_session):
        """Stronger than counts: the per-turn expected label equals the
        engine's action on every turn of the sf0.001 corpus."""
        from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import (
            expected_action,
            generate_rows,
        )
        from pdf_ocr_batch_ndrocr_lite_ray.stages.extract import extract_turn
        from pdf_ocr_batch_ndrocr_lite_ray.stages.sniffer import classify_one

        for r in generate_rows(n_convs=40, seed=42, with_family=True):
            kind = classify_one(r["text"])
            _, _, action, _ = extract_turn(r["text"], kind)
            want = expected_action(r["text"], r["family"])
            assert action == want, (r["conv_id"], r["turn_idx"], r["family"], kind)
