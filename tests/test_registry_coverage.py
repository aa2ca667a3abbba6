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


def test_no_complex_output_columns_on_oracle_keys(spark, sf_dir):
    """Every oracle-bearing key's output schema must be scalar-only.

    The driver canonicalizes results with a pandas DataFrame +
    ``sort_values`` over all columns, which raises ``TypeError:
    unhashable type`` on Array/Map/Struct cells — this is exactly how
    ``fn_higher_order_pack`` became the first red driver row in eight
    rounds (VERDICT r8). Building a DataFrame mostly just analyzes the
    plan, but a few builders run real Spark actions at construction
    (kmeans_fit's Lloyd iterations, the layout key's footer manifest),
    so the sweep costs ~2 min at sf0.001 — dominated by those keys, not
    by the 292 analyses. Any key that wants to emit an array must
    ``array_join`` it to a string (the ``agg_collect_set`` precedent)
    or explode to scalar rows.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    offenders = []
    for key, entry in REGISTRY.items():
        if entry.oracle is None:
            continue
        schema = entry.fn(spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((key, bad))
    assert not offenders, (
        f"oracle-bearing keys emit non-scalar columns the driver cannot "
        f"canonicalize: {offenders}; array_join them to strings or "
        "explode to scalar rows"
    )


def test_harness_norm_rejects_non_scalar_cells():
    """The local harness must be at least as strict as the driver.

    The pre-r9 ``norm()`` converted list cells to tuples, masking the
    ``fn_higher_order_pack`` failure for three rounds of local sweeps.
    Pin the driver-strict behavior: a list-valued cell is a hard error.
    """
    import importlib.util
    import os

    import pytest

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "drive_driver.py",
    )
    spec = importlib.util.spec_from_file_location("drive_driver", path)
    harness = importlib.util.module_from_spec(spec)
    # Executing the module would start Spark via main(); only pull norm()
    # out of the module namespace without running __main__.
    spec.loader.exec_module(harness)

    assert harness.norm([(1, "a"), (2, None)], ["k", "v"]) == [
        (1, "a"),
        (2, None),
    ]
    with pytest.raises(TypeError, match="non-scalar"):
        harness.norm([(1, [1, 2, 3])], ["k", "v"])

    # Bigint precision survives a NULL in the column: pandas' default
    # numeric coercion would round 2^53+1 to float 2^53 and let two
    # DIFFERENT values compare equal (r9 review finding) — object dtype
    # keeps Python ints exact.
    big = 2**53 + 1
    out = harness.norm([(1, big), (2, None)], ["k", "v"])
    assert out[0][1] == big and type(out[0][1]) is int

    # NaN sorts via na_position (not a "NaN" string crashing
    # sort_values on mixed columns) and canonicalizes to None — the
    # driver's float-column path conflates NaN and NULL the same way.
    out = harness.norm(
        [(1, float("nan")), (2, 0.5), (3, None)], ["k", "v"]
    )
    assert out == [(1, None), (2, 0.5), (3, None)]


def test_rotation_preserves_registry_contents():
    """load_all() reorders but never drops or duplicates keys."""
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    first = list(REGISTRY)
    load_all()
    assert list(REGISTRY) == first  # idempotent
    assert len(first) == len(set(first))
