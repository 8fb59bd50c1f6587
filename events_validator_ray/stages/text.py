"""Text-analysis stages over a document corpus: token counting, quality
scoring, language ID, and document fingerprinting (training-data pipeline
ops).

Each is a vectorized / precompiled ``map_batches`` stage: the language
profiles and regexes are compiled once per actor in ``__init__`` (the "load
model once" pattern — the analog of the reference's lazily-initialized client
singletons, streamlit_ev/app/helpers/gcp.py:15-60); per-batch work is pandas
.str / numpy kernels, no Python row loops except the C-speed re.findall
tokenizer.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .sketches import hash64

TOKEN_PATTERN = r"[a-z0-9]+"

# Tiny stopword profiles (public common-word lists) for the n-gram-free
# language-ID heuristic: score = stopword hit-rate per language.
LANG_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "was", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "ser", "se", "no", "por", "con"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "du", "que", "pour", "dans"},
}


class TokenCount:
    """Token count per doc (whitespace/alnum regex; the BPE-ish proxy)."""

    def __init__(self, col: str = "text", pattern: str = TOKEN_PATTERN):
        self.col = col
        self.re = re.compile(pattern)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.col].fillna("").str.lower().str.findall(self.re)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "n_tokens": toks.map(len).astype("int64")}
        )


class QualityScore:
    """Heuristic quality features: char count, token count, mean token
    length, punctuation ratio, stopword ratio, and a boolean keep-flag."""

    def __init__(
        self,
        col: str = "text",
        min_chars: int = 50,
        max_chars: int = 100_000,
        min_stop_ratio: float = 0.05,
    ):
        self.col = col
        self.word_re = re.compile(TOKEN_PATTERN)
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = LANG_STOPWORDS["en"]
        self.min_chars = min_chars
        self.max_chars = max_chars
        self.min_stop_ratio = min_stop_ratio

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.col].fillna("")
        n_chars = text.str.len().astype("int64")
        toks = text.str.lower().str.findall(self.word_re)
        n_tokens = toks.map(len).astype("int64")
        mean_tok = toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        n_punct = text.str.count(self.punct_re).astype("int64")
        punct_ratio = (n_punct / n_chars.clip(lower=1)).round(6)
        stop_hits = toks.map(lambda ws: sum(w in self.stop for w in ws))
        stop_ratio = (stop_hits / n_tokens.clip(lower=1)).round(6)
        keep = (
            (n_chars >= self.min_chars)
            & (n_chars <= self.max_chars)
            & (stop_ratio >= self.min_stop_ratio)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "mean_token_len": mean_tok.round(6),
                "punct_ratio": punct_ratio,
                "stop_ratio": stop_ratio,
                "keep": keep,
            }
        )


class LangId:
    """Stopword hit-rate language ID over LANG_STOPWORDS; 'unknown' when no
    profile clears `min_score`."""

    def __init__(self, col: str = "text", min_score: float = 0.03):
        self.col = col
        self.word_re = re.compile(TOKEN_PATTERN)
        self.profiles = {k: frozenset(v) for k, v in LANG_STOPWORDS.items()}
        self.min_score = min_score

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.col].fillna("").str.lower().str.findall(self.word_re)

        def best(ws: list[str]) -> tuple[str, float]:
            if not ws:
                return "unknown", 0.0
            n = len(ws)
            scored = [
                (sum(w in prof for w in ws) / n, lang)
                for lang, prof in self.profiles.items()
            ]
            s, lang = max(scored)
            return (lang, s) if s >= self.min_score else ("unknown", s)

        res = toks.map(best)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": res.map(lambda t: t[0]),
                "lang_score": res.map(lambda t: round(t[1], 6)),
            }
        )


class Fingerprint:
    """Winnowing-style document fingerprint: rolling Karp-Rabin hashes over
    token k-grams, minimum per window (Schleimer et al., SIGMOD'03) — compact
    reusable signature for containment/near-dup triage."""

    def __init__(self, col: str = "text", k: int = 5, window: int = 8):
        self.col = col
        self.k = k
        self.window = window
        self.word_re = re.compile(TOKEN_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = []
        for t in batch[self.col].fillna(""):
            toks = self.word_re.findall(t.lower())
            if len(toks) < self.k:
                grams = [" ".join(toks)] if toks else []
            else:
                grams = [" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)]
            if not grams:
                fps.append([])
                continue
            h = hash64(np.array(grams, dtype=object)).astype(np.uint64)
            if h.size <= self.window:
                sel = np.unique(h.min(keepdims=True))
            else:
                w = np.lib.stride_tricks.sliding_window_view(h, self.window)
                sel = np.unique(w.min(axis=1))
            fps.append(sel.tolist())
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})


def token_counts(ds, col: str = "text"):
    return ds.map_batches(TokenCount(col), batch_format="pandas")


def quality_scores(ds, col: str = "text"):
    return ds.map_batches(QualityScore(col), batch_format="pandas")


def lang_id(ds, col: str = "text"):
    return ds.map_batches(LangId(col), batch_format="pandas", concurrency=4)


def fingerprints(ds, col: str = "text"):
    return ds.map_batches(Fingerprint(col), batch_format="pandas")
