"""Every oracle-able registry key must be in some local parity list.

The driver only emits CORRECTNESS rows for a bounded prefix of the
registry, and ``load_all`` rotates stale keys forward — so the local
parametrized parity tests are the regression net for keys rotated out
of the driver's window. This test fails when a newly registered
oracle-able query is missing from all of the per-pack parity lists,
which would otherwise leave it verified by nothing.
"""

from __future__ import annotations


def test_every_oracle_key_in_a_parity_list():
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    import tests.test_cdc_queries as cdc
    import tests.test_llm_queries as llm
    import tests.test_relational_queries as rel
    import tests.test_stream_queries as stream
    import tests.test_training_queries as training

    load_all()
    covered = (
        set(rel.RELATIONAL)
        | set(cdc.CDC_QUERIES)
        | set(llm.ORACLE_CHECKED)
        | set(stream.ORACLE_CHECKED)
        | set(training.ORACLE_CHECKED)
    )
    oracle_keys = {k for k, e in REGISTRY.items() if e.oracle is not None}
    missing = sorted(oracle_keys - covered)
    assert not missing, (
        f"oracle-able queries missing from local parity tests: {missing}; "
        "add them to the pack's parametrized list"
    )


def test_rotation_preserves_registry_contents():
    """load_all() reorders but never drops or duplicates keys."""
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    first = list(REGISTRY)
    load_all()
    assert list(REGISTRY) == first  # idempotent
    assert len(first) == len(set(first))
