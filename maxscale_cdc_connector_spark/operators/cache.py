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

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame

# Ceiling for checkpoint_if_small, overridable per deployment. 8 GiB
# of SOURCE parquet easily fits one node's block storage after
# aggregation; a 100 TB table blows past it and takes the recompute
# shape instead.
CKPT_MAX_INPUT_BYTES_ENV = "SPARK_GRAFT_CKPT_MAX_INPUT_BYTES"
_CKPT_MAX_INPUT_BYTES_DEFAULT = 8 << 30


def source_bytes(sf_dir: str, *tables: str) -> int | None:
    """Total on-disk bytes of the named parquet tables under ``sf_dir``
    (file or directory layout). ``None`` when any path is unreadable —
    callers must treat unknown as NOT small."""
    total = 0
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        try:
            if os.path.isdir(path):
                total += sum(
                    os.path.getsize(os.path.join(path, f))
                    for f in os.listdir(path)
                    if not f.startswith((".", "_"))
                )
            else:
                total += os.path.getsize(path)
        except OSError:
            return None
    return total


def input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of ``df``'s file-backed inputs
    (``inputFiles``); ``None`` for non-file-backed or unreadable inputs
    — callers must treat unknown as NOT small."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        total = 0
        for f in files:
            path = f[7:] if f.startswith("file:///") else f
            path = path if path.startswith("/") else "/" + path
            total += os.path.getsize(path)
        return total
    except Exception:
        return None


def eager_barrier(df: DataFrame, src_bytes: int | None) -> DataFrame:
    """Materialization barrier for a multi-branch intermediate, picking
    the cheaper mechanism by PROVEN source size (r17):

    - source provably small (<= the checkpoint_if_small limit): eager
      ``localCheckpoint`` — measured ~0.25 s cheaper per call than a
      persist at sf0.1 (no columnar cache encode, no CacheManager
      entry), and the blocks are bounded by the small input;
    - otherwise: :func:`eager_persist` — recomputable lineage and
      MEMORY_AND_DISK spill, the scale-safe barrier.

    Either result is released correctly by :func:`finalize`/_release.
    Unlike :func:`checkpoint_if_small` the fallback is still a BARRIER:
    use this where multiple branches of one action read the frame (the
    AQE population race — see eager_persist), and checkpoint_if_small
    where a lazy recompute is acceptable.
    """
    limit = int(
        os.environ.get(CKPT_MAX_INPUT_BYTES_ENV, _CKPT_MAX_INPUT_BYTES_DEFAULT)
    )
    if src_bytes is not None and src_bytes <= limit:
        return df.localCheckpoint(eager=True)
    return eager_persist(df)


def checkpoint_if_small(df: DataFrame, src_bytes: int | None) -> DataFrame:
    """Eager ``localCheckpoint`` ONLY when the source input is provably
    small (VERDICT r16 item 3): a checkpoint's blocks are the sole,
    non-recomputable copy, which is fine for a bench-scale intermediate
    but kills the query on executor loss when the frame scales with a
    100 TB corpus — and pins that much block storage. Above the limit
    (or when the size is unknown) the frame is returned UNCHANGED:
    multi-branch readers then recompute the subtree per branch, which
    costs one extra scan at exactly the scale where scans are the cheap,
    fault-tolerant thing and pinned storage is the dangerous one.
    """
    limit = int(
        os.environ.get(CKPT_MAX_INPUT_BYTES_ENV, _CKPT_MAX_INPUT_BYTES_DEFAULT)
    )
    if src_bytes is not None and src_bytes <= limit:
        return df.localCheckpoint(eager=True)
    return df


def _release(caches: Iterable[DataFrame]) -> None:
    """Best-effort release of every cache: one failing ``unpersist``
    (a dead executor's block-manager RPC, a torn-down context) must not
    leak the remaining caches — each release is guarded independently.
    Non-blocking: the caller never needs the blocks gone synchronously,
    only deregistered.

    Handles BOTH barrier kinds (r17): ``unpersist`` deregisters a
    persisted frame's CacheManager entry, and the second guarded call
    frees a localCheckpointed frame's block storage (its analyzed plan
    is a LogicalRDD whose RDD holds the blocks); each is a no-op for
    the other kind."""
    for c in caches:
        try:
            c.unpersist(blocking=False)
        except Exception:
            pass
        try:
            c._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass


def finalize(result: DataFrame, caches: Iterable[DataFrame]) -> DataFrame:
    """Materialize ``result`` now, then release the persisted inputs.

    The inputs are released through the SAME guarded helper on both the
    success and failure paths (the operator's contract is that
    ``caches`` die here either way): a failing ``unpersist`` after a
    successful materialization must neither leak the remaining caches
    nor discard the already-computed result — the result's blocks are
    its own localCheckpoint storage, independent of the input caches.
    """
    try:
        out = result.localCheckpoint(eager=True)
    except Exception:
        _release(caches)
        raise
    _release(caches)
    return out


def eager_persist(df: DataFrame) -> DataFrame:
    """Persist AND materialize now — required when the frame fans out
    into several branches of ONE downstream action.

    A lazily-persisted frame read by multiple branches of a single
    action is a cache-population RACE under AQE: each branch becomes its
    own query stage, independent stages are submitted CONCURRENTLY, and
    every one of them finds the cache unpopulated and computes the full
    uncached plan itself — N× the work, plus block-lock convoy while N
    stages write the same cache blocks. Event-log evidence (sf0.1,
    local[32]): the four branches reading ``jaccard_pairs_prefix``'s
    shingle arrays each ran the whole scan→shingle→sort pipeline as four
    concurrent 32-task stages, EVERY task burning ~20 s CPU against a
    ~1 s single-stage cost — the query swung 20-38 s run-to-run vs 2-4 s
    with the cache pre-populated. One ``count()`` materializes the cache
    once; every later branch is a cache read. The extra job is one pass
    over data the action needed anyway, at any scale — and unlike
    ``localCheckpoint`` the lineage survives executor loss, so this stays
    the scale-safe barrier for 1000-executor deployments.
    """
    df = df.persist()
    try:
        df.count()
    except Exception:
        # The persist is registered before count() runs; a failed
        # materialization (executor loss, OOM, cancelled query) must not
        # leak a session-lifetime cache entry in the long-lived driver
        # sweep. Release the registration and surface the real error.
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
        raise
    return df
