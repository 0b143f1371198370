"""Round-13 component breakdown for the multimodal consumers:
time each modality pair builder and the two consumers with the noop
sink (guide §1.4), bench session config, warm best-of-N."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("RUNS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("svs-mm-probe-r13")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

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

    print(f"calib_s: {_calib():.4f}", flush=True)

    from ydb_vector_search_simple_api_spark.operators import (
        audiofp, dedup, imagededup, mmcuration, videodedup,
    )
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    docs = load_documents(spark, sf_dir)

    parts = {
        "text_jaccard_pairs": lambda: dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.8
        ),
        "image_phash_dedup": lambda: imagededup.image_phash_dedup(spark, sf_dir),
        "video_sequence_dedup": lambda: videodedup.video_sequence_dedup(
            spark, sf_dir
        ),
        "audio_fingerprint_match": lambda: audiofp.audio_fingerprint_match(
            spark, sf_dir
        ),
        "mm_curation_report": lambda: mmcuration.multimodal_curation_report(
            spark, sf_dir
        ),
        "mm_safe_splits": lambda: mmcuration.multimodal_safe_splits(
            spark, sf_dir
        ),
    }
    for name, fn in parts.items():
        spark.sparkContext.setJobDescription(f"r13-mm-probe: {name}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        times.sort()
        print(
            f"{name}: cold {cold:.3f}s best {times[0]:.3f}s "
            f"med {times[len(times)//2]:.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
