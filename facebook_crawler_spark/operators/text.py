"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (regexp, higher-order array functions) — no
Python in the hot path — so each has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small stopword sets for the n-gram/stopword language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pas", "pour"],
}


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization after lowercasing (NULL- and empty-safe:
    NULL text tokenizes to [], so every downstream score treats NULL like
    empty instead of leaking NULL through `least`/`when`)."""
    t = F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(word_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword count: alphanumeric runs + each punctuation mark
    counts as a token (a cheap, deterministic GPT-style pre-tokenizer)."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )


def stopword_ratio(text: Column, lang: str) -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    toks = word_tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(text: Column) -> Column:
    """Heuristic language id: argmax stopword ratio over {en,de,fr};
    'und' (undetermined) when no stopwords hit at all."""
    scores = [(lang, stopword_ratio(text, lang)) for lang in ("en", "de", "fr")]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reversed so earlier languages win ties deterministically (en > de > fr)
    for lang, s in reversed(scores):
        out = F.when((best_score > 0) & (s == best_score), F.lit(lang)).otherwise(out)
    return out


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    total = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = word_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards moderate length and
    word size, penalizes punctuation soup. Deterministic, documented
    weights — a placeholder for a learned classifier with the same plan
    shape (one codegen'd projection)."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    wl = mean_word_len(text)
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    p_score = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    return F.round(0.4 * len_score + 0.3 * wl_score + 0.3 * p_score, 6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over normalized tokens
    (order-sensitive, whitespace-insensitive). Pure Catalyst `aggregate`;
    31-base Horner scheme over per-token crc32 — stable across engines
    that share crc32 (DuckDB oracle does)."""
    toks = word_tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.crc32(t)) % F.lit(9007199254740881).cast("long"),
    )
