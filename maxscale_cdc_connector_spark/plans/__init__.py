"""Physical-plan inspection: make plan quality testable.

At 100 TB the difference between a good and a bad query is not the
result — it's the plan: did the filter reach the parquet scan, did the
dim join broadcast, did the top-k avoid a global sort, is there an
accidental cartesian product. ``df.explain()`` only prints; these
helpers return the plan as data so tests can pin those properties and
a plan regression fails CI instead of surfacing as a slow bench round.

The reference client has no planner (it streams rows,
cdc_connector.cpp:480-520); this module exists for the engine built on
top — see tests/test_plan_quality.py for the pinned invariants.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["PlanSummary", "explain_string", "plan_summary"]


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` would print, returned as a value.

    Uses the same JVM entry point as :meth:`DataFrame.explain`
    (PythonSQLUtils.explainString) so the output is byte-identical to
    what a user sees.
    """
    sc = df.sparkSession.sparkContext
    assert sc._jvm is not None
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


# Formatted-mode detail headers look like:
#   (3) Filter [codegen id : 1]
#   (1) Scan parquet
_NODE_RE = re.compile(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9 ]*?)(?: \[codegen id : \d+\])?$")
_CODEGEN_RE = re.compile(r"\[codegen id : (\d+)\]")


@dataclass(frozen=True)
class PlanSummary:
    """Parsed view of a formatted physical plan."""

    text: str
    nodes: tuple[str, ...]  # physical operator names, plan order
    pushed_filters: tuple[str, ...]  # one entry per scan: "[IsNotNull(x), ...]"
    read_schemas: tuple[str, ...]  # one entry per scan: "struct<...>"
    codegen_stage_count: int

    def has(self, node_substring: str) -> bool:
        """True when any physical node name contains ``node_substring``."""
        return any(node_substring in n for n in self.nodes)

    def count(self, node_substring: str) -> int:
        return sum(node_substring in n for n in self.nodes)

    def scans_column(self, column: str) -> bool:
        """True when any parquet scan reads ``column`` (pruning check)."""
        return any(column in s for s in self.read_schemas)

    def pushes_filter_on(self, column: str) -> bool:
        """True when some scan's PushedFilters mentions ``column``."""
        return any(column in p for p in self.pushed_filters)


def plan_summary(df: DataFrame) -> PlanSummary:
    """Parse ``df``'s formatted physical plan into a :class:`PlanSummary`.

    Lazy: only compiles the plan, never runs a job — safe to call on
    arbitrarily large inputs.
    """
    text = explain_string(df, "formatted")
    nodes: list[str] = []
    pushed: list[str] = []
    schemas: list[str] = []
    for line in text.splitlines():
        stripped = line.strip()
        m = _NODE_RE.match(stripped)
        if m:
            nodes.append(m.group(2).strip())
        elif stripped.startswith("PushedFilters:"):
            pushed.append(stripped.removeprefix("PushedFilters:").strip())
        elif stripped.startswith("ReadSchema:"):
            schemas.append(stripped.removeprefix("ReadSchema:").strip())
    codegen_ids = {int(x) for x in _CODEGEN_RE.findall(text)}
    return PlanSummary(
        text=text,
        nodes=tuple(nodes),
        pushed_filters=tuple(pushed),
        read_schemas=tuple(schemas),
        codegen_stage_count=len(codegen_ids),
    )
