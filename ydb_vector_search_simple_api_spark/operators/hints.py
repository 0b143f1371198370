"""Size-gated join hints.

A forced ``F.broadcast`` hint bypasses AQE's
``autoBroadcastJoinThreshold`` check entirely: Spark will collect and
ship the build side no matter how big it turns out to be. That is the
right call for relations that are small BY CONSTRUCTION (a k-row top-k
result, a one-row scalar aggregate) and a driver OOM waiting to happen
for relations that are merely small TODAY (the TPC-H ``customer``
dimension is 15k rows at sf0.1 and 15M at sf100).

``broadcast_if_small`` gates the hint on Catalyst's own pre-runtime
size estimate (``optimizedPlan().stats().sizeInBytes`` — the number
AQE itself consults), so the hint costs no extra Spark job: under the
threshold the dimension is hinted, past it the join falls back to
AQE's runtime choice (which can still broadcast if the *runtime* size
allows — we only stop overriding its judgment). Same conservative
philosophy as the PageRank rank-table gate (graph.py), which gates on
an already-measured row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default gate: well under any sane driver/executor memory, well over
#: every bench-SF dimension table
DEFAULT_MAX_BROADCAST_BYTES = 64 << 20  # 64 MiB


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's pre-runtime size estimate for a DataFrame (bytes).
    For a file scan this is the (compressed) file size scaled by the
    projection; free to compute — no job is triggered."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()  # type: ignore[attr-defined]
    return int(stats.sizeInBytes())


def broadcast_if_small(
    df: DataFrame, max_bytes: int = DEFAULT_MAX_BROADCAST_BYTES
) -> DataFrame:
    """Hint ``df`` for broadcast only when Catalyst's size estimate is
    demonstrably under ``max_bytes``; otherwise return it unhinted so
    AQE keeps its runtime veto. Estimation failure counts as 'not
    demonstrably small'."""
    try:
        small = plan_size_bytes(df) <= max_bytes
    except Exception:
        small = False
    return F.broadcast(df) if small else df
