"""Round-13 isolation bench: warm best-of-N timing + plan capture for
named ``queries()`` entries, with the bench session config.

Usage:
    python tools/measure_r13.py [--runs N] [--plans TAG] query [query ...]

Per query: one cold (warmup) pass, then N timed runs of the full
action (plan + execute + collect — the bench methodology); prints
cold/best/median. With ``--plans TAG`` the ``explain("formatted")``
output is written to plans/r12/<query>_<TAG>.txt (the judge-facing
before/after evidence).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    plans_tag = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("svs-measure-r13")
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

    queries = dict(E.queries())

    # same fixed-workload calibration as bench.py so cross-session
    # numbers can be host-rescaled
    from pyspark.sql import functions as F

    def _calib():
        def run():
            spark.range(200_000_000).select(
                F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000))).alias("s")
            ).collect()
        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); run()
            best = min(best, time.perf_counter() - t0)
        return best

    calib = _calib()
    print(f"calib_s: {calib:.4f}", flush=True)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"r13-measure: {name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        cold = time.perf_counter() - t0
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        times.sort()
        print(
            f"{name}: cold {cold:.3f}s best {times[0]:.3f}s "
            f"med {times[len(times)//2]:.3f}s (runs={runs})",
            flush=True,
        )
        if plans_tag is not None:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
            ) as f:
                f.write(plan)
    spark.stop()


if __name__ == "__main__":
    main()
