"""Text analysis operators: language id, quality scoring, token counting,
document fingerprinting. All pure Column expressions (JVM, codegen) —
these run in the scan stage at corpus scale, no shuffle, no Python."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# compact stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "les", "des", "en"],
}


def tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: count word pieces + digits + punctuation runs
    (a deterministic stand-in for a real tokenizer's token count)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"[a-z]{1,4}|[0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), sw))
    return n_stop / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


def language_id(text: Column) -> Column:
    """Stopword-overlap language heuristic: score each candidate language
    by distinct-stopword hits, return the argmax ('und' if no hits).
    The production shape for a real model is identical — a scan-stage
    expression or Arrow-batched classifier, keyed argmax at the end."""
    toks = F.array_distinct(tokens(text))
    scored = None
    for lang, words in _STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        s = F.struct(
            F.size(F.array_intersect(toks, sw)).alias("score"),
            F.lit(lang).alias("lang"),
        )
        scored = s if scored is None else F.greatest(scored, s)
    best = scored
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: rewards reasonable length and word
    size, penalizes punctuation/digit soup — the standard cheap pre-filter
    before expensive model scoring."""
    n_chars = F.length(text)
    n_toks = token_count(text)
    mean_word = n_chars / F.greatest(n_toks, F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    len_score = F.least(n_toks / F.lit(50.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    return F.round(
        F.greatest(
            len_score * 0.5 + word_score * 0.3 + (1 - punct_ratio) * 0.2
            - F.lit(0.0),
            F.lit(0.0),
        ),
        6,
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip punctuation."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^\w\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The reference idiom would be a rolling hash; md5-of-normalized is the
    content-defined equivalent with a SQL-portable oracle.)"""
    return F.md5(normalize_text(text))
