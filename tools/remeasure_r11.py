"""Uncontended re-measure of the five round-10 session drifts
(VERDICT r10 #5): range_search_ivf, bpe_encode,
histogram_store_quantiles, kmv_store_overlap, stream_kmv_ingest —
isolated warm best-of-3 at sf0.1 plus the bench's host calibration
workload, the remeasure_r10 protocol (itself the round-9 closure
protocol). None of the five was touched by round-10 commits.

Usage: python tools/remeasure_r11.py [query ...]
Prints one JSON line {calib_s, queries: {name: {cold, best}}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

TARGETS = [
    "range_search_ivf",
    "bpe_encode",
    "histogram_store_quantiles",
    "kmv_store_overlap",
    "stream_kmv_ingest",
]


def main() -> None:
    targets = sys.argv[1:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("svs-remeasure")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    def calib() -> float:
        def run():
            spark.range(200_000_000).select(
                F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000))).alias("s")
            ).collect()

        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    calib_s = calib()
    qs = E.queries()
    out = {}
    for name in targets:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect() if hasattr(df, "collect") else None
        cold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect() if hasattr(df, "collect") else None
            best = min(best, time.perf_counter() - t0)
        out[name] = {"cold": round(cold, 4), "best": round(best, 4)}
    print(json.dumps({"calib_s": calib_s, "queries": out}))


if __name__ == "__main__":
    main()
