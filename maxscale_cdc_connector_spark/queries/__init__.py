"""Query registry: every implemented operator, with its DuckDB oracle SQL.

Importing this package registers all query packs. ``__spark_entry__.py``
exposes :data:`REGISTRY` to the driver via ``queries()``/``oracle_sql()``.
"""

from maxscale_cdc_connector_spark.queries.registry import REGISTRY, oracle_map, query_map, register


def load_all() -> None:
    """Import every query pack (idempotent) so registration side-effects run."""
    from maxscale_cdc_connector_spark.queries import (  # noqa: F401
        cdc_queries,
        llm_queries,
        relational,
        stream_queries,
    )


__all__ = ["REGISTRY", "register", "query_map", "oracle_map", "load_all"]
