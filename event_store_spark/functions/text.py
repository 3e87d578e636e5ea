"""Text-analysis column helpers for the LLM-data-pipeline operators.

All helpers are Catalyst higher-order-function expressions (split/transform/
filter/aggregate) — JVM-side, no Python row boundary — so they hold up on a
100 TB documents table: per-row work inside whole-stage codegen, shuffles only
where an aggregation/join needs one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish tokenizer regex: letter runs, digit runs, single punctuation marks
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny per-language stopword lists for the n-gram language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def whitespace_tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the Q32 contract)."""
    return F.split(F.trim(text), r"\s+")


def word_ngrams(tokens_col: str = "w", n: int = 3) -> Column:
    """Word n-grams (joined by single spaces) over an existing tokens column.

    Empty array when the doc has < n tokens — guarded with `when` because
    `sequence(0, -1)` generates a DESCENDING range in Spark, not an empty one.
    """
    parts = ", ".join(f"{tokens_col}[i + {j}]" for j in range(n))
    expr = f"transform(sequence(0, size({tokens_col}) - {n}), i -> concat_ws(' ', {parts}))"
    return F.when(F.size(F.col(tokens_col)) >= n, F.expr(expr)).otherwise(
        F.array().cast("array<string>")
    )


def word_ngram_hashes(tokens_col: str = "w", n: int = 3) -> Column:
    """xxhash64 word n-grams over an existing tokens column.

    Same shape as `word_ngrams` but each gram is the 64-bit hash of its
    token slots instead of a concatenated string — for plans where the
    gram is only a JOIN/GROUP key that never reaches the output (equality
    of hashes ⇔ equality of grams up to 2^-64 collisions). Skips the
    per-gram string allocation and shuffles 8-byte longs instead of
    ~40-byte strings. xxhash64 folds its args (each value hashed with the
    previous result as seed), so token boundaries are preserved without
    building the joined string."""
    parts = ", ".join(f"{tokens_col}[i + {j}]" for j in range(n))
    expr = f"transform(sequence(0, size({tokens_col}) - {n}), i -> xxhash64({parts}))"
    return F.when(F.size(F.col(tokens_col)) >= n, F.expr(expr)).otherwise(
        F.array().cast("array<bigint>")
    )


def stopword_hits(tokens: Column, words: list[str]) -> Column:
    """Number of tokens contained in a (tiny, broadcast-as-literal) stopword list."""
    lit_array = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit_array, t)))


def non_ascii_ratio(text: Column | str) -> Column:
    """Fraction of non-ASCII characters — the 'zh' signal in the lang-ID chain."""
    col = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(col, r"[\x00-\x7F]", "")) / F.greatest(
        F.length(col), F.lit(1)
    ).cast("double")


def quality_score(text_col: str = "text", n_chars_col: str = "n_chars") -> Column:
    """The C4-style composite quality score shared by `text_quality`,
    `quality_filter`, and `corpus_curation` (ONE definition — the three
    operators compose the same signal, and their oracles mirror this
    exact arithmetic):

    0.5·len_norm + 0.3·stop_norm + 0.2·(1 − punct_norm), each component
    clamped to [0, 1]; closed-form IEEE arithmetic, identical on both
    engines.
    """
    w = whitespace_tokens(text_col)
    len_norm = F.least(F.col(n_chars_col).cast("double") / 500.0, F.lit(1.0))
    punct_norm = F.least(
        F.size(F.regexp_extract_all(text_col, F.lit(r"[.,;:!?]"), F.lit(0))).cast("double")
        / F.greatest(F.length(text_col), F.lit(1))
        * 10.0,
        F.lit(1.0),
    )
    stop_norm = F.least(
        stopword_hits(w, STOPWORDS["en"]).cast("double")
        / F.greatest(F.size(w), F.lit(1))
        * 5.0,
        F.lit(1.0),
    )
    return 0.5 * len_norm + 0.3 * stop_norm + 0.2 * (1.0 - punct_norm)
