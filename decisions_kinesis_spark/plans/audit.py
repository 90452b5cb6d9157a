"""Plan auditing: programmatic checks that the physical plan is the one
a 100 TB deployment needs (SURVEY.md §4: everything the reference does
by hand — early filtering, per-shard parallelism — Catalyst must do
natively, and the extensions must not regress it).

Checked properties:
- ``pushed_filters``      — predicates reached the parquet scan;
- ``read_schema_columns`` — column pruning (scan reads only used cols);
- ``broadcast_joins``     — small dims broadcast instead of shuffled;
- ``python_eval``         — row-at-a-time Python in the plan (slow path);
- ``arrow_eval``          — Arrow-batched Python (the sanctioned path);
- ``shuffles``            — exchange count (each is a cluster barrier);
- ``parallelism_guards``  — keyless round-robin repartitions from
  ``ensure_parallelism`` (functions/parallel.py).  Counted separately
  from ``shuffles``: the guard only fires when the input arrives in
  fewer splits than ``defaultParallelism`` (a small-fixture artifact —
  at 100 TB the scan is already multi-split and the guard is a no-op),
  so it is not part of the scale shape these audits assert.
- ``codegen_spans``       — WholeStageCodegen regions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    plan: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schema_columns: dict[int, list[str]] = field(default_factory=dict)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffles: int = 0
    parallelism_guards: int = 0
    codegen_spans: int = 0
    python_eval: bool = False
    arrow_eval: bool = False

    def assert_pushed(self, *fragments: str) -> "PlanAudit":
        for f in fragments:
            assert any(
                f in p for p in self.pushed_filters
            ), f"filter {f!r} not pushed to scan; pushed={self.pushed_filters}"
        return self

    def assert_broadcasts(self, at_least: int) -> "PlanAudit":
        assert (
            self.broadcast_joins >= at_least
        ), f"expected >= {at_least} broadcast joins, saw {self.broadcast_joins}"
        return self

    def assert_no_python(self) -> "PlanAudit":
        assert not self.python_eval, "row-at-a-time Python UDF in plan (slow path)"
        return self

    def assert_max_shuffles(self, n: int) -> "PlanAudit":
        assert (
            self.shuffles <= n
        ), f"expected <= {n} shuffles, saw {self.shuffles}\n{self.plan}"
        return self

    def assert_pruned_to(self, scan_idx: int, max_cols: int) -> "PlanAudit":
        cols = self.read_schema_columns.get(scan_idx, [])
        assert (
            0 < len(cols) <= max_cols
        ), f"scan {scan_idx} reads {len(cols)} cols ({cols}); expected <= {max_cols}"
        return self


def audit_plan(df: DataFrame) -> PlanAudit:
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = {}
    # ReadSchema lines can be TRUNCATED by Spark's field-length cap, so
    # parse to end-of-line, not to the closing '>'.
    for i, m in enumerate(re.finditer(r"ReadSchema: struct<([^\n]*)", plan)):
        body = m.group(1).rstrip().rstrip(">").rstrip(".")
        cols = [c.split(":")[0] for c in body.split(",") if ":" in c]
        schemas[i] = cols
    # codegen regions appear as "WholeStageCodegen (n)" in formatted
    # plans and as "*(n) Op" prefixes in compact toString() output
    span_ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    span_ids |= set(re.findall(r"\*\((\d+)\) ", plan))
    # keyless round-robin repartitions are the ensure_parallelism
    # small-fixture guard (the only keyless repartition in query paths
    # — verified by grep), not a scale-shape shuffle (module doc)
    guards = len(
        re.findall(r"Exchange RoundRobinPartitioning\(\d+\), REPARTITION_BY_NUM", plan)
    )
    return PlanAudit(
        plan=plan,
        pushed_filters=[p for p in pushed if p.strip()],
        read_schema_columns=schemas,
        # BroadcastNestedLoopJoin is the broadcast strategy for
        # non-equi conditions (e.g. the ANN query set × corpus) — it
        # still avoids shuffling the big side, so it counts.
        broadcast_joins=plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        # BroadcastExchange is not a shuffle — only count data shuffles;
        # the keyless round-robin parallelism guard is tracked apart
        shuffles=plan.count("Exchange") - plan.count("BroadcastExchange") - guards,
        parallelism_guards=guards,
        codegen_spans=len(span_ids),
        python_eval="BatchEvalPython" in plan,
        arrow_eval=("ArrowEvalPython" in plan)
        or ("FlatMapGroupsInPandas" in plan)
        or ("MapInPandas" in plan)
        or ("MapInArrow" in plan)
        or ("FlatMapCoGroupsInPandas" in plan),
    )
