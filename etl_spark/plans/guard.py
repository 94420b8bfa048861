"""Plan-shape guard: zero per-row Python (BASELINE.json:15).

Walks the executed physical plan and fails on any BatchEvalPython node
(row-at-a-time Python UDF).  Arrow-vectorized nodes (ArrowEvalPython,
MapInPandas, FlatMapGroupsInPandas) are the only Python stages allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

BANNED_NODES = ("BatchEvalPython",)
ALLOWED_PYTHON_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def executed_plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_vectorized(df: DataFrame) -> None:
    plan = executed_plan_str(df)
    for node in BANNED_NODES:
        if node in plan:
            raise AssertionError(
                f"per-row Python UDF node {node!r} found in physical plan "
                f"(banned by BASELINE.json:15):\n{plan}"
            )
