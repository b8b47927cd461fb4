"""Text-analysis column expressions for the training-data-pipeline surface.

All operators are built-in expression compositions (split/regexp/aggregate) —
JVM-side, codegen-friendly, linear per row, embarrassingly parallel: the
right shape for scoring 100 TB of documents with zero shuffles.

Operators: token counting (whitespace + word/punct regex), quality scoring
(length / stopword-ratio / repetition heuristics), n-gram language ID
(stopword-hit scoring), and document fingerprinting (normalized md5, plus a
positional sample fingerprint as the rolling-hash analogue).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic, alphabetical stopword lists per language. Tiny on purpose:
# the heuristic is hit-count scoring, the lists are data not code.
STOPWORDS = {
    "en": ["a", "and", "in", "is", "of", "the", "to"],
    "es": ["de", "el", "en", "la", "los", "que", "y"],
    "fr": ["de", "et", "la", "le", "les", "que", "un"],
    "de": ["das", "der", "die", "ein", "ist", "und", "zu"],
}

WORD_RE = r"[a-zA-Z0-9_]+"
TOKEN_RE = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"  # BPE-ish: words OR single punct


def normalize_ws(text: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def n_tokens(text: Column) -> Column:
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text)))


def n_words(text: Column) -> Column:
    """Regex word count (the 'BPE-ish' tokenizer's word class)."""
    return F.size(F.regexp_extract_all(text, F.lit(WORD_RE), 0))


def n_bpe_tokens(text: Column) -> Column:
    """Word-or-punctuation token count — approximates BPE pre-tokenization."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("double")
    return F.round(total / F.size(toks), 4)


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: F.array_contains(words, t))
    )


def lang_scores(text: Column) -> Column:
    """Map lang → stopword-hit count (the n-gram-heuristic scoring table)."""
    entries = []
    for lang in sorted(STOPWORDS):
        entries.append(F.lit(lang))
        entries.append(stopword_hits(text, lang).cast("double"))
    return F.create_map(*entries)


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits; alphabetical tiebreak; 'und' when
    no stopword of any language matches."""
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(STOPWORDS):  # alphabetical ⇒ later lang must beat, not tie
        score = stopword_hits(text, lang)
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword ratio +
    vocabulary diversity (distinct/total token ratio)."""
    nt = n_tokens(text).cast("double")
    length_ok = (nt >= 10) & (nt <= 100000)
    sw = sum(
        (stopword_hits(text, lang) for lang in sorted(STOPWORDS)),
        F.lit(0),
    ).cast("double")
    sw_ratio = F.when(nt > 0, sw / nt).otherwise(F.lit(0.0))
    # diversity over LOWERCASED tokens, consistent with stopword_hits —
    # case variants of one word are the same vocabulary item
    distinct_ratio = F.when(
        nt > 0, F.size(F.array_distinct(tokens(F.lower(text)))).cast("double") / nt
    ).otherwise(F.lit(0.0))
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(sw_ratio * F.lit(2.0), F.lit(0.3))
        + F.least(distinct_ratio, F.lit(0.3))
    )
    return F.round(score, 4)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized text."""
    return F.md5(normalize_ws(text))


def prefix_fingerprint(text: Column, n: int = 64) -> Column:
    """Fingerprint of the first ``n`` normalized chars — catches documents
    that share a boilerplate head (cheap near-dup blocking key)."""
    return F.md5(F.substring(normalize_ws(text), 1, n))
