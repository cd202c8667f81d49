"""Text-analysis kernels for the training-data pipeline operators:
token counting, fingerprinting, quality scoring, language ID.

Where a DuckDB oracle exists, the semantics here are chosen to be exactly
SQL-expressible:
  * tokens        = whitespace split of trimmed text (str.split ==
                    string_split_regex(trim(text), '\\s+') for the data)
  * fingerprint   = md5(lower(single-spaced trimmed text)), hex
  * n_chars       = len(text) in codepoints (== DuckDB length())
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")  # ASCII punctuation
_DIGIT_RE = re.compile(r"[0-9]")

STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "nicht", "mit", "ein", "eine", "einem", "ist", "zu", "den"},
    "es": {"el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "les", "de", "et", "que", "en", "un", "une", "est", "pour", "dans"},
}


def tokens(text: str) -> list[str]:
    return text.split()


def normalize_ws(text: str) -> str:
    return " ".join(text.split())


def fingerprint(text: str) -> str:
    """Rolling content fingerprint: md5 of the whitespace-normalized,
    lowercased text (== DuckDB md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))."""
    return hashlib.md5(normalize_ws(text).lower().encode("utf-8")).hexdigest()


def token_stats_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    n_tokens = np.empty(len(texts), np.int64)
    n_uniq = np.empty(len(texts), np.int64)
    n_chars = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        tk = t.split()
        n_tokens[i] = len(tk)
        n_uniq[i] = len(set(tk))
        n_chars[i] = len(t)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    fps = [fingerprint(t) for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "fp": pa.array(fps, pa.string())})


def _cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    cjk = sum(1 for c in text if 0x4E00 <= ord(c) <= 0x9FFF)
    return cjk / len(text)


def detect_lang(text: str) -> str:
    """Deterministic heuristic language ID: CJK character ratio → zh, else
    highest stopword hit-ratio among the stopword tables; no evidence → en."""
    if _cjk_ratio(text) > 0.05:
        return "zh"
    toks = [t.lower() for t in text.split()]
    if not toks:
        return "en"
    best_lang, best_hits = "en", 0
    for lang in sorted(STOPWORDS):
        hits = sum(1 for t in toks if t in STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def langid_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    preds = [detect_lang(t) for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "lang_pred": pa.array(preds, pa.string())})


def quality_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Heuristic document-quality features + composite score in [0, 1]:
    length band, mean token length band, punctuation/digit ratios, stopword
    ratio (any language table), repetition (unique-token ratio)."""
    texts = batch[text_col].to_pylist()
    all_stops = set().union(*STOPWORDS.values())
    n = len(texts)
    cols = {
        "n_tokens": np.zeros(n, np.int64),
        "mean_token_len": np.zeros(n, np.float64),
        "punct_ratio": np.zeros(n, np.float64),
        "digit_ratio": np.zeros(n, np.float64),
        "stopword_ratio": np.zeros(n, np.float64),
        "uniq_ratio": np.zeros(n, np.float64),
        "quality": np.zeros(n, np.float64),
    }
    for i, t in enumerate(texts):
        tk = t.split()
        nt = len(tk)
        cols["n_tokens"][i] = nt
        if not t:
            continue
        cols["punct_ratio"][i] = len(_PUNCT_RE.findall(t)) / len(t)
        cols["digit_ratio"][i] = len(_DIGIT_RE.findall(t)) / len(t)
        if nt:
            cols["mean_token_len"][i] = sum(len(w) for w in tk) / nt
            cols["stopword_ratio"][i] = sum(1 for w in tk if w.lower() in all_stops) / nt
            cols["uniq_ratio"][i] = len(set(tk)) / nt
        length_band = min(1.0, nt / 50.0)  # reward ≥50 tokens
        tl = cols["mean_token_len"][i]
        tl_band = 1.0 if 3.0 <= tl <= 10.0 else 0.5 if tl > 0 else 0.0
        clean = 1.0 - min(1.0, 4.0 * cols["punct_ratio"][i] + 4.0 * cols["digit_ratio"][i])
        cols["quality"][i] = round(
            0.35 * length_band + 0.2 * tl_band + 0.25 * clean + 0.2 * cols["uniq_ratio"][i], 6
        )
    out = {id_col: batch[id_col]}
    out.update({k: pa.array(v) for k, v in cols.items()})
    return pa.table(out)


_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def bpe_tokens(text: str) -> list[str]:
    """BPE-ish pre-tokenization: letter runs, single digits, single
    punctuation marks (whitespace dropped). The pattern is deliberately
    RE2-compatible so DuckDB's regexp_extract_all is an exact oracle."""
    return _BPE_RE.findall(text)


def bpe_token_stats_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    texts = batch[text_col].to_pylist()
    n_tok = np.empty(len(texts), np.int64)
    n_uniq = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        tk = bpe_tokens(t)
        n_tok[i] = len(tk)
        n_uniq[i] = len(set(tk))
    return pa.table(
        {
            id_col: batch[id_col],
            "n_bpe_tokens": pa.array(n_tok, pa.int64()),
            "n_uniq_bpe_tokens": pa.array(n_uniq, pa.int64()),
        }
    )
