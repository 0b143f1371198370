"""Measure wall + shuffle bytes for line_dedup md5 vs xxhash64 at
$SPARK_GRAFT_SF_DIR (VERDICT r10 #7 SCALING evidence — the
measure_charspans_xx protocol at line grain).

Shuffle bytes come from the Spark UI REST API (one run per hasher in
one session; stage attribution by stage-id watermark between runs).
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import time
import urllib.request


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("line-xx-measure")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    from ydb_vector_search_simple_api_spark.operators import textual

    def stages() -> list[dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.loads(r.read())

    def run(hasher: str) -> dict:
        from pyspark.sql import functions as F

        seen = {s["stageId"] for s in stages()}
        t0 = time.perf_counter()
        # consume EVERY output column (min over the digest forces the
        # per-doc reassembly+md5; count alone would let Catalyst prune)
        row = (
            textual.line_dedup(spark, sf_dir, hasher=hasher)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_lines"),
                F.sum("n_dup_lines"),
                F.min("kept_md5"),
            )
            .collect()[0]
        )
        wall = time.perf_counter() - t0
        new = [s for s in stages() if s["stageId"] not in seen]
        return {
            "wall_s": round(wall, 3),
            "rows": row[0],
            "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in new),
            "shuffle_read_bytes": sum(s["shuffleReadBytes"] for s in new),
            "n_stages": len(new),
        }

    # interleave to cancel warmup asymmetry: cold both, then timed both
    run("md5")
    run("xxhash64")
    out = {"sf_dir": sf_dir, "md5": run("md5"), "xxhash64": run("xxhash64")}
    out["shuffle_write_ratio"] = round(
        out["md5"]["shuffle_write_bytes"]
        / max(1, out["xxhash64"]["shuffle_write_bytes"]),
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
