"""Text analysis over a documents table — language-ID, quality scoring,
token counting, fingerprinting (task brief training-data operators).

Stateful pieces (compiled regexes, stopword tables) live in actor-pool
__init__; per-batch bodies are vectorized where the kernel allows.

Column-name contract: token_count uses the regex \\w+ so it matches the
DuckDB oracle ``length(regexp_extract_all(text, '\\w+'))`` exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_str_u64, mix64
from ..stages.shuffle import pool_size

_WORD = re.compile(r"\w+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "pas", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "no", "por"},
}


class LanguageId:
    """Heuristic language ID: argmax stopword-hit ratio over profiles,
    'unknown' when nothing matches.  Deterministic."""

    def __init__(self):
        self.word = _WORD
        self.profiles = _PROFILES

    def __call__(self, t: pa.Table) -> pa.Table:
        langs = []
        for txt in t["text"].to_pylist():
            toks = self.word.findall((txt or "").lower())
            if not toks:
                langs.append("unknown")
                continue
            best, best_score = "unknown", 0.0
            for lang, stop in self.profiles.items():
                score = sum(1 for w in toks if w in stop) / len(toks)
                if score > best_score:
                    best, best_score = lang, score
            langs.append(best if best_score > 0.02 else "unknown")
        return pa.table({"doc_id": t["doc_id"], "lang_pred": pa.array(langs, pa.string())})


def token_count_batch(t: pa.Table) -> pa.Table:
    """doc_id, n_tokens (regex \\w+ count — matches the DuckDB oracle)."""
    counts = pa.array(
        [len(_WORD.findall(x or "")) for x in t["text"].to_pylist()], pa.int64()
    )
    return pa.table({"doc_id": t["doc_id"], "n_tokens": counts})


class QualityScorer:
    """Length / punctuation / stopword / digit heuristics -> per-doc
    quality features + a composite score in [0,1]."""

    def __init__(self):
        self.word = _WORD
        self.stop = set().union(*_PROFILES.values())
        self.punct = re.compile(r"[^\w\s]")
        self.digit = re.compile(r"\d")

    def __call__(self, t: pa.Table) -> pa.Table:
        n_chars, n_tokens, punct_ratio, stop_ratio, digit_ratio, score = [], [], [], [], [], []
        for txt in t["text"].to_pylist():
            s = txt or ""
            toks = self.word.findall(s.lower())
            nc, nt = len(s), len(toks)
            pr = len(self.punct.findall(s)) / max(nc, 1)
            sr = (sum(1 for w in toks if w in self.stop) / nt) if nt else 0.0
            dr = len(self.digit.findall(s)) / max(nc, 1)
            # composite: long enough, some stopwords, not punct/digit soup
            sc = (
                min(nt / 50.0, 1.0) * 0.4
                + min(sr / 0.2, 1.0) * 0.3
                + (1.0 - min(pr / 0.3, 1.0)) * 0.2
                + (1.0 - min(dr / 0.3, 1.0)) * 0.1
            )
            n_chars.append(nc)
            n_tokens.append(nt)
            punct_ratio.append(pr)
            stop_ratio.append(sr)
            digit_ratio.append(dr)
            score.append(sc)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "punct_ratio": pa.array(punct_ratio),
            "stop_ratio": pa.array(stop_ratio),
            "digit_ratio": pa.array(digit_ratio),
            "quality": pa.array(score),
        })


def fingerprint_batch(t: pa.Table, window: int = 8) -> pa.Table:
    """64-bit document fingerprint: min-of-rolling-window word-hash
    (winnowing-style), stable under whitespace changes."""
    fps = []
    for txt in t["text"].to_pylist():
        words = _WORD.findall((txt or "").lower())
        if not words:
            fps.append(0)
            continue
        h = hash_str_u64(words)
        if h.size <= window:
            fps.append(int(mix64(h, np.arange(h.size, dtype=np.uint64)).min()))
        else:
            roll = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
            fps.append(int(mix64(roll, np.arange(roll.size, dtype=np.uint64)).min()))
    return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(np.array(fps, dtype=np.uint64), pa.uint64())})


def language_id(docs_ds, sort: bool = True):
    out = docs_ds.map_batches(LanguageId, batch_format="pyarrow", concurrency=pool_size())
    return out.sort("doc_id") if sort else out


def token_counts(docs_ds):
    return docs_ds.map_batches(token_count_batch, batch_format="pyarrow").sort("doc_id")


def quality_scores(docs_ds):
    return docs_ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=pool_size()).sort("doc_id")


def fingerprints(docs_ds):
    return docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow").sort("doc_id")


# ---- PII / link redaction ---------------------------------------------------
# RE2 syntax ONLY (pyarrow.compute's regex engine IS RE2, same as
# DuckDB's regexp_replace — the oracle equality is engine-exact, not
# merely pattern-convention-exact).  ASCII character classes spelled
# out so Python-re unicode semantics never leak in.
URL_RE = r"https?://[A-Za-z0-9._~:/?#@!$&*+,;=%\-]+"
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

# replacement ORDER matters and is part of the contract: URLs first
# (they may embed userinfo/'@'), then emails, then bare IPv4s.
REDACTIONS = (
    ("n_urls", URL_RE, "<URL>"),
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ips", IPV4_RE, "<IP>"),
)


def redact_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id, redacted, n_urls, n_emails, n_ips.  Counts are taken on
    the RAW text (per pattern, before any replacement); `redacted`
    applies the replacements sequentially in REDACTIONS order.  Pure
    Arrow RE2 kernels — vectorized, zero Python-object round trip; the
    per-batch pattern compile is a C++ RE2 construction (microseconds),
    so no actor pool is needed."""
    txt = pc.fill_null(t[text_col], "")
    out = {"doc_id": t["doc_id"]}
    red = txt
    counts = {}
    for name, pat, rep in REDACTIONS:
        counts[name] = pc.cast(pc.count_substring_regex(txt, pattern=pat), pa.int64())
        red = pc.replace_substring_regex(red, pattern=pat, replacement=rep)
    out["redacted"] = red
    out.update(counts)
    return pa.table(out)


def redact(docs_ds, text_col: str = "text"):
    """Scrub URLs / emails / IPv4s from a documents table (standard
    LLM-training-data hygiene stage)."""
    return docs_ds.map_batches(
        lambda t: redact_batch(t, text_col), batch_format="pyarrow"
    ).sort("doc_id")
