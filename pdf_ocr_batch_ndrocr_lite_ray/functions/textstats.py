"""Vectorized text-analysis kernels: language-ID, quality, tokens, fingerprints.

These are the training-data-pipeline extensions over the reference's
normalization kernel (the reference only normalizes — app.py:3925-3983; these
add the measurement layer a 100 TB corpus pipeline needs).

Everything here is **column-at-a-time over Arrow arrays** using
``pyarrow.compute`` regex kernels. PyArrow's regex engine is RE2 — the same
engine DuckDB uses — so every pattern below has an exactly-matching DuckDB
oracle expression (see ``pipelines/text_analysis.py``); the per-row Python
fallback is only the md5 fingerprint (no Arrow md5 kernel).

Deterministic by construction: no models, no randomness — n-gram/ratio
heuristics only (the in-container answer to fastText-style language ID).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# --- patterns shared verbatim with the DuckDB oracles (RE2 syntax) ---------

#: one match per whitespace-separated token
WS_TOKEN_RE = r"\S+"
#: BPE-ish word pieces: ascii letter runs | digit runs | any other non-space
#: char (CJK chars tokenize one-per-char, like byte-level BPE granularity)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
#: hiragana / katakana / CJK unified / fullwidth forms
CJK_CHAR_RE = r"[\x{3040}-\x{30ff}\x{4e00}-\x{9fff}\x{ff00}-\x{ffef}]"
#: ascii letters
ALPHA_CHAR_RE = r"[A-Za-z]"
#: ascii punctuation-ish
PUNCT_CHAR_RE = r"[!-/:-@\[-`{-~]"
#: non-space characters
NONSPACE_CHAR_RE = r"\S"
#: tiny English stopword list, whole-word
STOPWORD_RE = r"\b(the|a|an|and|or|of|to|in|is|was|for|on|with|as|at|it)\b"

#: language-ID thresholds (ratios over non-space chars)
JA_CJK_RATIO = 0.15
EN_ALPHA_RATIO = 0.5

LANG_JA = "ja"
LANG_EN = "en"
LANG_OTHER = "other"
LANG_UNKNOWN = "unknown"


def _count(arr: pa.ChunkedArray | pa.Array, pattern: str) -> pa.ChunkedArray:
    return pc.count_substring_regex(arr, pattern)


def _f64(x):
    return pc.cast(x, pa.float64())


def text_stats_columns(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """All stats columns for a text array, computed vectorized in one pass.

    Returns: n_chars, n_tokens_ws, n_tokens_bpe, cjk_chars, lang,
    quality_score (6-dp rounded, in [0,1]), fingerprint (md5 of the
    whitespace-normalized text — the exact-dedup key).
    """
    text = pc.fill_null(text, "")
    n_chars = pc.utf8_length(text)
    nonspace = _count(text, NONSPACE_CHAR_RE)
    n_ws = _count(text, WS_TOKEN_RE)
    n_bpe = _count(text, BPE_TOKEN_RE)
    cjk = _count(text, CJK_CHAR_RE)
    alpha = _count(text, ALPHA_CHAR_RE)
    punct = _count(text, PUNCT_CHAR_RE)
    stop = _count(text, STOPWORD_RE)

    denom = pc.max_element_wise(nonspace, pa.scalar(1, type=nonspace.type))
    cjk_ratio = pc.divide(_f64(cjk), _f64(denom))
    alpha_ratio = pc.divide(_f64(alpha), _f64(denom))
    punct_ratio = pc.divide(_f64(punct), _f64(denom))
    tok_denom = pc.max_element_wise(n_ws, pa.scalar(1, type=n_ws.type))
    stop_ratio = pc.divide(_f64(stop), _f64(tok_denom))

    # language vote: CJK density first, then ascii-letter density
    lang = pc.if_else(
        pc.equal(nonspace, 0),
        pa.scalar(LANG_UNKNOWN),
        pc.if_else(
            pc.greater_equal(cjk_ratio, JA_CJK_RATIO),
            pa.scalar(LANG_JA),
            pc.if_else(
                pc.greater_equal(alpha_ratio, EN_ALPHA_RATIO),
                pa.scalar(LANG_EN),
                pa.scalar(LANG_OTHER),
            ),
        ),
    )

    # quality: length saturation + low punctuation + stopword presence +
    # letter density, equally weighted; 6-dp rounded for cross-engine parity
    length_term = pc.min_element_wise(
        pc.divide(_f64(n_ws), pa.scalar(20.0)), pa.scalar(1.0)
    )
    quality = pc.round(
        pc.multiply(
            pa.scalar(0.25),
            pc.add(
                pc.add(length_term, pc.subtract(pa.scalar(1.0), punct_ratio)),
                pc.add(pc.min_element_wise(pc.multiply(stop_ratio, pa.scalar(4.0)), pa.scalar(1.0)), alpha_ratio),
            ),
        ),
        ndigits=6,
    )

    # fingerprint: md5 over whitespace-collapsed text (the only per-row loop)
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(text, pattern=r"\s+", replacement=" ")
    )
    fingerprint = pa.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()],
        type=pa.string(),
    )

    return {
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens_ws": pc.cast(n_ws, pa.int64()),
        "n_tokens_bpe": pc.cast(n_bpe, pa.int64()),
        "cjk_chars": pc.cast(cjk, pa.int64()),
        "lang": lang,
        "quality_score": quality,
        "fingerprint": fingerprint,
    }


# DuckDB oracle fragments — kept NEXT to the kernels they mirror so drift is
# a one-file review. `t` is the text expression.
def sql_count(t: str, pattern: str) -> str:
    return f"len(regexp_extract_all({t}, '{pattern}'))"


def sql_stats_select(t: str) -> str:
    """SELECT-list SQL computing exactly ``text_stats_columns`` in DuckDB."""
    nonspace = sql_count(t, NONSPACE_CHAR_RE)
    n_ws = sql_count(t, WS_TOKEN_RE)
    n_bpe = sql_count(t, BPE_TOKEN_RE)
    cjk = sql_count(t, CJK_CHAR_RE)
    alpha = sql_count(t, ALPHA_CHAR_RE)
    punct = sql_count(t, PUNCT_CHAR_RE)
    stop = sql_count(t, STOPWORD_RE)
    denom = f"greatest({nonspace}, 1)"
    tok_denom = f"greatest({n_ws}, 1)"
    return f"""
      len({t}) AS n_chars,
      {n_ws} AS n_tokens_ws,
      {n_bpe} AS n_tokens_bpe,
      {cjk} AS cjk_chars,
      CASE
        WHEN {nonspace} = 0 THEN '{LANG_UNKNOWN}'
        WHEN {cjk}::DOUBLE / {denom} >= {JA_CJK_RATIO} THEN '{LANG_JA}'
        WHEN {alpha}::DOUBLE / {denom} >= {EN_ALPHA_RATIO} THEN '{LANG_EN}'
        ELSE '{LANG_OTHER}'
      END AS lang,
      round(0.25 * (
          least({n_ws}::DOUBLE / 20.0, 1.0)
        + (1.0 - {punct}::DOUBLE / {denom})
        + least(4.0 * {stop}::DOUBLE / {tok_denom}, 1.0)
        + {alpha}::DOUBLE / {denom}
      ), 6) AS quality_score,
      md5(trim(regexp_replace({t}, '\\s+', ' ', 'g'))) AS fingerprint
    """


# --- rolling-hash (winnowing) fingerprints ---------------------------------

WINNOW_K = 5  # k-gram length (characters)
WINNOW_W = 4  # winnowing window (hashes per window)
_ROLL_BASE = 257
_ROLL_MOD = (1 << 61) - 1


def rolling_hashes(text: str, k: int = WINNOW_K) -> list[int]:
    """Rabin-Karp rolling hashes of every k-char gram (O(n), exact)."""
    n = len(text)
    if n < k:
        return []
    h = 0
    for ch in text[:k]:
        h = (h * _ROLL_BASE + ord(ch)) % _ROLL_MOD
    out = [h]
    top = pow(_ROLL_BASE, k - 1, _ROLL_MOD)
    for i in range(k, n):
        # python % keeps the value non-negative even after the subtraction
        h = ((h - ord(text[i - k]) * top) * _ROLL_BASE + ord(text[i])) % _ROLL_MOD
        out.append(h)
    return out


def winnow_fingerprints(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[int]:
    """Winnowing (MOSS-style) fingerprint set: the min hash of each window.

    Guarantees at least one fingerprint per w consecutive k-grams, so two
    documents sharing a run of ≥ w+k-1 chars share a fingerprint — the
    rolling-hash document fingerprint of the task brief.
    """
    hs = rolling_hashes(text, k)
    if not hs:
        return set()
    if len(hs) <= w:
        return {min(hs)}
    out: set[int] = set()
    for i in range(len(hs) - w + 1):
        out.add(min(hs[i : i + w]))
    return out
