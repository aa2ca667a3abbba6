"""Registration machinery for the driver-facing query inventory.

Each entry pairs a PySpark implementation (``(spark, sf_dir) → DataFrame``)
with an equivalent DuckDB oracle SQL string (or ``None`` for operators that
are not SQL-expressible — streaming, approximate, API-surface checks — for
which the driver records a weaker rows-only check).

Column-name discipline: the driver's comparator sorts columns by name and
hashes values, so every computed column MUST carry the same alias in the
Spark plan and the oracle SQL. Helpers here keep that contract visible.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryEntry] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query implementation under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QueryEntry(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def query_map() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}
