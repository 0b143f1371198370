"""Serving-path stress probe: amplify documents+embeddings 10-500x and
measure the flagship SERVING paths at a scale where the sf0.1 suite's
sub-second times stop differentiating plans — in particular the
post-top-k metadata join, whose broadcast BUILD side is the round-4
fix (broadcast the k rows, stream the corpus).

The amplified tables are written as a testdata-shaped directory
(documents.parquet + embeddings.parquet), so every production loader
and the engine run on it UNCHANGED. Replica r shifts ids by
r * n_base_docs in BOTH tables (doc_id<->vec_id alignment preserved)
and rotates each embedding by r positions so vectors are distinct.

Measured:
  * exact top-k end-to-end (scan -> codegen score -> TakeOrdered ->
    metadata join), FIXED build side (broadcast top-k)
  * the same query with the round-3 bug re-created inline
    (broadcast(docs) — the corpus on the wire) for before/after
  * filtered top-k end-to-end
  * engine-served IVF at width 1/4/full (index + metadata join)
  * routed-blocked batch ANN join, 256 queries

Usage: python tools/serve_probe.py [reps] [sf_dir]
  reps=200 (default) => 1M docs / 400k vectors from sf0.1.
Output: markdown table (recorded in SCALING.md / README).
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def timed(fn, runs: int = 3) -> float:
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark import api
    from ydb_vector_search_simple_api_spark.config import SearchConfig
    from ydb_vector_search_simple_api_spark.operators import index as ivf_mod
    from ydb_vector_search_simple_api_spark.operators.search import (
        _order_cols,
        exact_search,
    )
    from ydb_vector_search_simple_api_spark.functions.distance import score_expr
    from ydb_vector_search_simple_api_spark.sources.store import (
        load_documents,
        load_embeddings,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("serve-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = load_documents(spark, sf_dir)
    embs0 = load_embeddings(spark, sf_dir)
    n_docs0 = docs0.count()
    dim = len(embs0.first().embedding)

    work = tempfile.mkdtemp(prefix="svs_serve_probe_")
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    (
        docs0.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs0).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{work}/documents.parquet")
    )
    (
        embs0.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("rep") * n_docs0).alias("vec_id"),
            F.concat(
                F.slice(F.col("embedding"), (F.col("rep") % dim) + 1, dim),
                F.slice(F.col("embedding"), 1, F.col("rep") % dim),
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{work}/embeddings.parquet")
    )
    n_docs = load_documents(spark, work).count()
    n_vecs = load_embeddings(spark, work).count()
    qvec = [
        float(x)
        for x in load_embeddings(spark, work).filter(F.col("vec_id") == 0).first().embedding
    ]
    print(
        f"amplified corpus: {n_docs} docs / {n_vecs} vectors, dim {dim} "
        f"({reps}x {sf_dir})",
        file=sys.stderr,
    )

    rows: list[tuple[str, float, str]] = []

    # end-to-end exact serving query, FIXED metadata join
    rows.append(
        (
            "exact top-k end-to-end (broadcast top-k — fixed)",
            timed(lambda: exact_search(spark, work, qvec, k=10).collect()),
            "scan -> codegen score -> TakeOrdered -> k-row broadcast",
        )
    )

    # the round-3 bug, re-created inline: broadcast the CORPUS side
    def old_join():
        embs = load_embeddings(spark, work).select(
            F.col("vec_id").alias("id"), "embedding"
        )
        docs = load_documents(spark, work).select(
            F.col("doc_id").alias("id"),
            F.col("source").alias("title"),
            F.col("lang").alias("vendor"),
            F.col("text").alias("description"),
        )
        topk = (
            embs.withColumn(
                "score", score_expr("CosineSimilarity", F.col("embedding"), qvec)
            )
            .select("id", "score")
            .orderBy(*_order_cols("CosineSimilarity"))
            .limit(10)
        )
        return (
            topk.join(F.broadcast(docs), "id", "inner")
            .select("id", "title", "vendor", "description", "score")
            .orderBy(*_order_cols("CosineSimilarity"))
            .collect()
        )

    try:
        rows.append(
            (
                "exact top-k end-to-end (broadcast DOCS — the r3 bug)",
                timed(old_join, runs=1),
                f"ships all {n_docs} metadata rows to every task",
            )
        )
    except Exception as e:  # the bug's honest failure mode at scale
        rows.append(
            (
                "exact top-k end-to-end (broadcast DOCS — the r3 bug)",
                float("nan"),
                f"FAILED: {type(e).__name__}: {str(e)[:80]}",
            )
        )

    rows.append(
        (
            "filtered top-k end-to-end (vendor=fr)",
            timed(
                lambda: exact_search(
                    spark, work, qvec, k=10, filter={"vendor": "fr"}
                ).collect()
            ),
            "pushed filter -> id semi-join -> score -> TakeOrdered",
        )
    )

    n_clusters = 64
    t0 = time.perf_counter()
    idx = ivf_mod.build_ivf_index(
        spark,
        load_embeddings(spark, work).select(F.col("vec_id").alias("id"), "embedding"),
        f"{work}/ivf",
        n_clusters=n_clusters,
        seed=42,
        fit_sample_rows=16_384,
    )
    t_build = time.perf_counter() - t0
    eng = api.VectorSearchEngine(
        spark, work, config=SearchConfig(index_enabled=True), index=idx
    )
    for width in (1, 4, n_clusters):
        rows.append(
            (
                f"engine IVF serve width={width}/{n_clusters}",
                timed(
                    lambda w=width: eng.search_df(qvec, 10, None, w).collect()
                ),
                "cluster-pruned scan + k-row broadcast metadata join",
            )
        )

    n_q = 256
    queries = (
        load_embeddings(spark, work)
        .filter(F.col("vec_id") < n_q)
        .selectExpr("vec_id AS query_id", "embedding AS query_vec")
    )
    queries.persist().count()
    t_batch = timed(
        lambda: ivf_mod.ivf_knn_join_routed_blocked(
            spark, idx, queries, k=10, search_top_size=4
        ).collect(),
        runs=1,
    )

    print(f"\nserving paths at {n_docs} docs / {n_vecs} vectors (k=10, best-of-3):\n")
    print("| path | wall | notes |")
    print("|---|---|---|")
    for name, t, note in rows:
        cell = f"{t:.2f} s" if t == t else "—"
        print(f"| {name} | {cell} | {note} |")
    print(
        f"| routed-blocked batch join, {n_q} queries width=4 | {t_batch:.2f} s "
        f"({n_q / t_batch:.0f} q/s) | pruned dirs x BLAS blocks |"
    )
    print(f"\nivf build (16k-row fit sample): {t_build:.1f} s")


if __name__ == "__main__":
    main()
