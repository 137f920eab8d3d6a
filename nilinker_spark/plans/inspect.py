"""Helpers to assert the physical plan is the one we want.

At 100 TB the difference between a plan with PushedFilters + pruned
ReadSchema + broadcast joins and one without is the difference between
minutes and days; these helpers make the desired plan shape a TESTED
invariant rather than a hope (used in tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown proof)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read from each parquet scan (pruning proof)."""
    text = explain_str(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def has_broadcast_join(df: DataFrame) -> bool:
    text = explain_str(df)
    return "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if at least one WholeStageCodegen subtree exists.  Note:
    higher-order functions (aggregate/zip_with lambdas) are JVM-side but
    NOT codegen-supported — for those paths assert has_python_stage is
    False instead, which is the property that matters at scale."""
    return "Found 0 WholeStageCodegen" not in explain_str(df, "codegen")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange excluded — broadcasts move a dim, not the data).
    Count with AQE off for a deterministic pre-runtime shape: under AQE
    the string carries AQEShuffleRead wrappers and staged re-plans.

    Anchored at tree-node positions: a ReusedExchange node's simple-mode
    line embeds its child's 'Exchange hashpartitioning(...)' string
    (which must NOT count — the shuffle runs once), and
    RoundRobinPartitioning (repartition(n)) must count too."""
    text = explain_str(df, "simple")
    return len(
        re.findall(
            r"(?m)^[\s:+\-*]*Exchange (?:hash|range|Single|RoundRobin)", text
        )
    )


_PYTHON_MARKERS = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
)


def has_python_stage(df: DataFrame) -> bool:
    """True if any Python-worker stage (Arrow or pickled) is in the plan —
    the hot-path operators must keep this False."""
    text = explain_str(df, "extended")
    return any(m in text for m in _PYTHON_MARKERS)


def has_rowwise_python_stage(df: DataFrame) -> bool:
    """True only for row-at-a-time pickled Python UDFs (BatchEvalPython) —
    the slow path that must never appear anywhere.  Arrow-batched stages
    (ArrowEvalPython/MapInPandas) are the sanctioned vectorized crossings."""
    return "BatchEvalPython" in explain_str(df, "extended")
