"""Text analysis stages over a documents table: language-ID, quality
scoring, token counting, fingerprinting.

All stages are callable classes (actor pools — regexes/tables compiled
once per actor in ``__init__``) or pure vectorized batch fns; hot loops
use pyarrow.compute kernels where available and C-speed hashlib loops
otherwise.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# small built-in stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists, truncated)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at"},
    "fr": {"le", "la", "de", "et", "un", "une", "les", "des", "est", "que", "pour", "dans", "sur", "pas"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "auf", "für", "von", "zu"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "es", "los", "las", "por", "con", "para"},
}


class LangId:
    """Stopword-hit language heuristic (actor stage; tables built once).
    Emits ``lang_pred`` and ``lang_hits``; 'und' when nothing matches."""

    def __init__(self, text_col: str = "text", min_hits: int = 1):
        self.text_col = text_col
        self.min_hits = min_hits
        self.word = re.compile(r"[a-zà-ÿ]+")
        self.tables = {lang: frozenset(ws) for lang, ws in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, hits = [], []
        for text in batch[self.text_col].to_pylist():
            words = self.word.findall(text.lower()) if text else []
            best, best_n = "und", 0
            for lang, table in self.tables.items():
                n = sum(1 for w in words if w in table)
                if n > best_n:
                    best, best_n = lang, n
            if best_n < self.min_hits:
                best = "und"
            preds.append(best)
            hits.append(best_n)
        return batch.append_column("lang_pred", pa.array(preds)).append_column(
            "lang_hits", pa.array(hits, type=pa.int32())
        )


class QualityScore:
    """Heuristic quality scoring (length / punctuation / stopword
    ratios — the usual pretraining-filter features), vectorized where
    the kernel exists."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"\w+")
        self.stop = _LANG_STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch[self.text_col]
        n_chars = pc.utf8_length(txt).cast(pa.float64())
        n_words = pc.count_substring_regex(txt, pattern=r"\S+").cast(pa.float64())
        n_punct = pc.count_substring_regex(txt, pattern=r"[.!?,;:]").cast(pa.float64())
        stop_ratio = []
        for text in txt.to_pylist():
            ws = self.word.findall(text.lower()) if text else []
            stop_ratio.append(sum(1 for w in ws if w in self.stop) / max(1, len(ws)))
        mean_wl = pc.divide(n_chars, pc.max_element_wise(n_words, pa.scalar(1.0)))
        punct_ratio = pc.divide(n_punct, pc.max_element_wise(n_chars, pa.scalar(1.0)))
        sr = pa.array(stop_ratio, type=pa.float64())
        # score: in-range word length, some stopwords, low punctuation
        score = pc.subtract(
            pc.add(
                pc.multiply(sr, pa.scalar(2.0)),
                pc.if_else(
                    pc.and_(pc.greater(mean_wl, 2.5), pc.less(mean_wl, 10.0)),
                    pa.scalar(1.0),
                    pa.scalar(0.0),
                ),
            ),
            pc.multiply(punct_ratio, pa.scalar(5.0)),
        )
        return (
            batch.append_column("stop_ratio", sr)
            .append_column("mean_word_len", mean_wl)
            .append_column("punct_ratio", punct_ratio)
            .append_column("quality", score)
        )


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish token counting (vectorized regex counts)."""
    txt = batch[text_col]
    ws = pc.count_substring_regex(txt, pattern=r"\S+").cast(pa.int64())
    # BPE-ish: word pieces + digits + punctuation as separate tokens
    bpe = pc.count_substring_regex(txt, pattern=r"[A-Za-z]+|\d|[^\sA-Za-z\d]").cast(pa.int64())
    return batch.append_column("n_ws_tokens", ws).append_column("n_bpe_tokens", bpe)


_WS = re.compile(r"\s+")


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    plus a 64-bit rolling-hash (Karp-Rabin over word stream)."""
    fps, rolls = [], []
    for text in batch[text_col].to_pylist():
        norm = _WS.sub(" ", (text or "").lower().strip())
        fps.append(hashlib.md5(norm.encode()).hexdigest())
        h = np.uint64(1469598103934665603)
        for w in norm.split(" "):
            wh = np.uint64(int(hashlib.md5(w.encode()).hexdigest()[:16], 16))
            h = np.uint64((int(h) * 1099511628211 + int(wh)) % (1 << 64))
        rolls.append(np.int64(np.uint64(h).astype(np.int64)))
    return batch.append_column("fp", pa.array(fps)).append_column(
        "rolling_fp", pa.array(rolls, type=pa.int64())
    )


def analyze(ds: ray.data.Dataset, text_col: str = "text", concurrency: int = 4,
            batch_size: int = 4096) -> ray.data.Dataset:
    """Full text-analysis pipeline: langid + quality + token counts +
    fingerprints, as chained actor-pool stages."""
    ds = ds.map_batches(LangId, fn_constructor_kwargs={"text_col": text_col},
                        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    ds = ds.map_batches(QualityScore, fn_constructor_kwargs={"text_col": text_col},
                        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    ds = ds.map_batches(lambda t: token_count_batch(t, text_col), batch_format="pyarrow",
                        batch_size=batch_size)
    return ds.map_batches(lambda t: fingerprint_batch(t, text_col), batch_format="pyarrow",
                          batch_size=batch_size)
