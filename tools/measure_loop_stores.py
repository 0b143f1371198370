"""Measure the round-11 loop-cost fixes at $SPARK_GRAFT_SF_DIR
(VERDICT r10 #1/#2 SCALING evidence):

1. blocked semantic screen — per-snapshot KMeans refit (the round-10
   form) vs routing off the serving index's persisted centroids
   (cold + warm best-of-3 of the full loop; the delta IS the fit
   pass, everything else in the two plans is identical).
2. production quality gate — corpus-wide C4+KN5 scoring per loop run
   vs probing the persisted verdict store (store pre-built OUTSIDE
   the timed region; cold + warm best-of-3. Note the recompute form's
   warm runs still re-score C4 corpus-wide per run but reuse the
   session-cached KN5 score table — the cold number is the honest
   per-session cost, the warm number the honest per-run floor).

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import time


def timed(fn, n_warm: int = 3) -> dict:
    t0 = time.perf_counter()
    fn()
    cold = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n_warm):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return {"cold": round(cold, 3), "best": round(best, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("loop-stores-measure")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from ydb_vector_search_simple_api_spark.operators import pipeline

    idx = E._ivf_index(spark, sf_dir)
    out = {"sf_dir": sf_dir}

    def loop_fit():
        pipeline.incremental_snapshot_loop(
            spark, sf_dir, semantic_threshold=0.42, semantic_probes=2
        ).count()

    def loop_routed():
        pipeline.incremental_snapshot_loop(
            spark, sf_dir, semantic_threshold=0.42, semantic_probes=2,
            semantic_index=idx,
        ).count()

    out["semantic_blocked_kmeans_refit"] = timed(loop_fit)
    out["semantic_blocked_index_routed"] = timed(loop_routed)

    # pre-build the stores outside the timed region (per-run probe
    # cost is the claim; the build is once-per-corpus by design)
    pipeline.snapshot_loop_production_store(spark, sf_dir).count()

    def loop_recompute():
        pipeline.incremental_snapshot_loop(
            spark, sf_dir, quality_gate="production"
        ).count()

    def loop_store():
        pipeline.snapshot_loop_production_store(spark, sf_dir).count()

    out["production_gate_recompute"] = timed(loop_recompute)
    out["production_gate_verdict_store"] = timed(loop_store)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
