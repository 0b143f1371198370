"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries from ``__spark_entry__.queries()`` plus
scale-path extras (IVF at several search widths) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Per query: one un-timed warmup (JIT, parquet footers), then the best
of 3 timed runs of the full action (plan + execute + collect) — the
reference's own metric is per-query wall time (``app.py:245-247``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("svs-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    def timed(fn, runs: int = 3) -> float:
        fn()  # warmup
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    queries = dict(E.queries())

    # scale-path extras: pruned IVF at several widths, bigger k
    from ydb_vector_search_simple_api_spark.operators import index as ivf
    from ydb_vector_search_simple_api_spark.operators.search import exact_search

    qvec = E._query_vec(spark, sf_dir)
    idx = E._ivf_index(spark, sf_dir)  # built (and cached) before timing
    for width in (1, 4):
        queries[f"ivf_cosine_width{width}"] = (
            lambda s, d, w=width: ivf.ivf_search(
                s, idx, qvec, k=10, strategy="CosineSimilarity", search_top_size=w
            )
        )
    queries["topk_cosine_k100"] = lambda s, d: exact_search(
        s, d, qvec, k=100, strategy="CosineSimilarity"
    )

    results: dict[str, float] = {}
    for name, fn in queries.items():
        results[name] = round(timed(lambda: fn(spark, sf_dir).collect()), 4)
        print(f"  bench {name}: {results[name]:.3f}s", file=sys.stderr, flush=True)

    total = round(sum(results.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum_of_best_query_times",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
