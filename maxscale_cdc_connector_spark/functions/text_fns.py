"""Text expressions: tokenization, shingles, normalization, stopword hits.

All Catalyst built-ins / higher-order functions — the hot path of the
text-analysis and dedup operators stays JVM-side. The only regex engine
involved is Spark's (Java) — patterns are kept to the portable subset
that matches DuckDB's RE2 semantics for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists for the n-gram/stopword language-ID heuristic. Tiny and
# deterministic by design — this is a heuristic operator, not a model.
STOPWORDS = {
    "en": ("the", "a", "of", "to", "and", "is", "in"),
    "es": ("el", "la", "los", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "des", "un", "est"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(text: str | Column) -> Column:
    """Whitespace tokens (the corpus is space-separated lowercase)."""
    return F.split(_c(text), " ")


def normalize(text: str | Column) -> Column:
    """lower + trim + collapse runs of whitespace — canonical form for
    exact dedup and fingerprinting."""
    return F.regexp_replace(F.lower(F.trim(_c(text))), " +", " ")


def top_word_count(tokens: str | Column) -> Column:
    """Max multiplicity of any token in the array, as the max run length
    of the SORTED array — O(n log n) with ONE interpreted lambda eval
    per token (r17, guide §1.2 per-task work).

    The previous form — ``transform(array_distinct(w), x ->
    size(filter(w, y -> y = x)))`` then ``array_max`` — evaluated
    O(n_distinct × n) interpreted lambdas per document (quadratic for
    mostly-distinct text). Equal strings are adjacent after
    ``sort_array``, so the longest run IS the max multiplicity;
    bit-identical output (A/B over the full corpus: zero mismatches,
    0.56 s → 0.20 s per pass at sf0.1). The null-safe ``<=>`` seed
    never matches a real token, and the corpus's space-split tokens
    are never NULL.
    """
    w = _c(tokens)
    return F.aggregate(
        F.sort_array(w),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("cur"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.when(
            acc.prev.eqNullSafe(x),
            F.struct(
                x.alias("prev"),
                (acc.cur + 1).alias("cur"),
                F.greatest(acc.best, acc.cur + 1).alias("best"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).alias("cur"),
                F.greatest(acc.best, F.lit(1)).alias("best"),
            )
        ),
        lambda acc: acc.best,
    )


def word_shingles(text: str | Column, k: int = 5) -> Column:
    """Array of k-word shingles (contiguous k-grams joined by one space).

    Documents with fewer than k words yield an empty array — guarded
    explicitly because Spark's ``sequence(0, n)`` counts *down* when n<0.

    The tokenized array is BOUND ONCE per row through a 1-element
    ``transform`` wrapper before the per-position lambda runs. Spark
    evaluates higher-order functions interpreted (never whole-stage
    codegen) with NO common-subexpression elimination, so the naive
    form — ``split(text)`` referenced inside the per-position lambda —
    re-tokenizes the document once per shingle: ~50 splits × 54-token
    allocations per doc, the hottest CPU path in the engine (jstack of
    a slow ×10 run parked every executor in ``ArrayTransform.eval``).
    A lambda ARGUMENT is evaluated once per row, and references to the
    bound lambda variable are O(1) reads, so the wrapper makes the
    interpreted cost linear in tokens instead of quadratic-ish —
    identical output, same expression family.
    """

    def mk(w: Column) -> Column:
        n = F.size(w)
        idx = F.sequence(F.lit(1), n - (k - 1))
        grams = F.transform(idx, lambda i: F.array_join(F.slice(w, i, k), " "))
        return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(words(text)), mk)[0]


def stopword_hits(text: str | Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    sw = list(STOPWORDS[lang])
    return F.size(F.filter(words(text), lambda x: x.isin(*sw))).cast("bigint")
