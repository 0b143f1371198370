"""Physical-plan inspection helpers.

The scale contract of this engine is enforced in tests, not prose:
top-k must compile to ``TakeOrderedAndProject`` (per-partition heap,
no global sort), equality filters must reach the Parquet scan as
``PushedFilters``, small joins must be broadcast, and hot expressions
must stay inside whole-stage codegen. These helpers read
``explain("formatted")`` output so tests can assert the plan shape —
the thing that actually survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in simple_plan(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def has_full_sort(df: DataFrame) -> bool:
    """A global (non-topk) sort — the thing top-k queries must avoid."""
    plan = simple_plan(df)
    return "Sort " in plan or "+- Sort" in plan


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of every scan in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)


def partition_filters(df: DataFrame) -> str:
    out = []
    for line in formatted_plan(df).splitlines():
        if "PartitionFilters" in line:
            out.append(line.strip())
    return "\n".join(out)
