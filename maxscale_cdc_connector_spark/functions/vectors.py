"""Vector expressions over ``array<float>`` embedding columns.

All pure Catalyst higher-order functions (``zip_with`` + ``aggregate``):
the arithmetic runs JVM-side inside whole-stage codegen — no UDF, no
Arrow transfer, no per-row Python. Elements are cast to double before
multiply/accumulate so results are bit-identical to the DuckDB oracle
(which computes the same left-to-right double sum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_l2(a: str | Column) -> Column:
    """Euclidean norm, accumulated in double."""
    sq = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity. For pre-normalized embeddings this equals dot();
    keep the full form for general inputs."""
    return dot(a, b) / (norm_l2(a) * norm_l2(b))
