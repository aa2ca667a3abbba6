"""Bounded cache scopes for multi-branch operators.

``persist()`` is the right materialization barrier when one DataFrame
feeds several branches of a single plan (MinHash shingle arrays feed the
candidate join AND both verification sides), but a long-lived session
running many queries — exactly what the driver's 93-query sweep and
``bench.py`` do — must not accumulate cached blocks across calls.

The pattern here: eagerly materialize the operator's (small) RESULT with
``localCheckpoint(eager=True)``, then ``unpersist`` the (large)
intermediates immediately. The barrier still serves the one execution
that needs it; cache lifetime shrinks from "session" to "operator call".
The checkpointed result blocks are O(|result|) (e.g. duplicate pairs,
not the corpus) and are released by Spark's ContextCleaner when the
returned DataFrame is garbage-collected.

Caveats of ``localCheckpoint``: it truncates lineage, so the returned
DataFrame is unrecoverable if an executor holding its blocks is lost —
acceptable on a static local/standalone deployment, but deployments
with dynamic allocation (executors decommission routinely) should use
reliable ``checkpoint()`` to a cluster-visible path instead. It is also
eager: calling an operator that finalizes through here triggers a Spark
job at call time rather than composing lazily into the caller's plan.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def finalize(result: DataFrame, caches: Iterable[DataFrame]) -> DataFrame:
    """Materialize ``result`` now, then release the persisted inputs."""
    out = result.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out
