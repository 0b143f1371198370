"""Ingest/export beyond the driver's parquet: CSV/JSON sources, and
partitioned / bucketed parquet sinks.

The reference reads exactly one YDB row table (`FROM {YDB_TABLE}`,
``/root/reference/app.py:223``) and has no export surface at all; this
module is extension scope so the engine is a complete standalone
pipeline citizen:

* **Sources**: CSV / JSON with an EXPLICIT store schema. At 100 TB,
  schema inference means a full extra pass over the data — never
  infer in production paths. Embeddings in text formats arrive as a
  JSON-array string column and are decoded JVM-side (`from_json`),
  not in Python.
* **Sinks**: plain parquet, hive-style partitioned parquet
  (partition pruning for free on the partition column — the layout
  the IVF index path relies on), and bucketed tables
  (``bucketBy(key)`` + sorted within buckets) so repeated large-large
  joins on the bucket key skip their shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the 5-column logical store shape (SURVEY.md §1.1) with the embedding
#: carried as a JSON array string — the only portable text encoding
STORE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("vendor", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("embedding_json", T.StringType()),
    ]
)


def _decode_embedding(df: DataFrame) -> DataFrame:
    """JSON-array string -> array<float>, entirely JVM-side."""
    return df.withColumn(
        "embedding",
        F.from_json("embedding_json", T.ArrayType(T.FloatType())),
    ).drop("embedding_json")


def read_store_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV store ingest with the explicit schema (no inference pass)."""
    raw = spark.read.schema(STORE_TEXT_SCHEMA).option("header", "true").csv(path)
    return _decode_embedding(raw)


def read_store_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines store ingest. The embedding may be carried natively
    as a JSON array (preferred) or as the string encoding."""
    native = T.StructType(
        [f for f in STORE_TEXT_SCHEMA if f.name != "embedding_json"]
        + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    return spark.read.schema(native).json(path)


def write_store_csv(df: DataFrame, path: str, mode: str = "error") -> None:
    """Export the store to CSV, embedding JSON-encoded (to_json)."""
    out = df.withColumn("embedding_json", F.to_json("embedding")).drop("embedding")
    out.write.mode(mode).option("header", "true").csv(path)


def read_store_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC store ingest — ORC carries array<float> natively (no text
    decode step), with the same predicate-pushdown + column-pruning
    properties as parquet. Schema enforced, not inferred from footers,
    so a corrupt/foreign file fails loudly at analysis."""
    native = T.StructType(
        [f for f in STORE_TEXT_SCHEMA if f.name != "embedding_json"]
        + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    return spark.read.schema(native).orc(path)


def write_store_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    """ORC export, embeddings native (round-trips read_store_orc)."""
    df.write.mode(mode).orc(path)


def read_raw_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw text-corpus ingest: one document per line -> (doc_id, text),
    doc_id = xxhash64 of the content (deterministic on any cluster
    layout — a zip-with-index id would depend on file split order).
    Identical lines collapse to one id, which is exactly what a dedup
    pipeline wants from a content-derived key."""
    return (
        spark.read.text(path)
        .select(F.xxhash64("value").alias("doc_id"), F.col("value").alias("text"))
    )


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque media ingest via the binaryFile source: (path, length,
    content) per file — the entry point for the multimodal operators
    (operators/multimodal.py), which treat payloads as binary columns
    plus typed metadata. ``pathGlobFilter`` prunes by extension at
    listing time (no file opened)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "length", "content")
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "error"
) -> None:
    """Hive-style layout: one directory level per partition column.
    Readers filtering on those columns get partition PRUNING (no file
    even opened) — the mechanism the IVF index layout uses for
    cluster_id (operators/index.py)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "error",
) -> None:
    """Bucketed + sorted table: co-locates rows by hash(bucket_col) at
    WRITE time, so every subsequent join/aggregation on that key skips
    its shuffle (plan shows no Exchange on the bucketed side). This is
    the 100 TB answer for a fact table joined repeatedly on one key —
    pay the shuffle once at ingest, never again. Requires a metastore
    table (saveAsTable); plain .parquet(path) cannot carry bucket
    metadata."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def optimize_layout(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "error",
) -> None:
    """Range-clustered parquet rewrite: ``repartitionByRange`` on
    ``sort_cols`` + ``sortWithinPartitions`` before the write, so each
    output file owns a tight, disjoint range of the sort key and every
    row group's parquet min/max statistics become selective.

    Why it matters at 100 TB: predicate pushdown (which this engine
    leans on everywhere) only SKIPS data when the footer statistics
    are tight — on a randomly laid-out table every row group spans the
    whole key domain and min/max filtering skips nothing. One offline
    rewrite turns `ts BETWEEN ...` / `doc_id = ...` scans from
    full-table reads into a handful of files. This is the same lever
    as Delta/Iceberg OPTIMIZE ... ZORDER for the single-key case,
    expressed with stock Spark (range partitioning = 1 exchange with a
    sampled range boundary pass).

    ``n_files`` bounds the output file count (defaults to Spark's
    choice); clustering quality is per-file either way.
    """
    if not sort_cols:
        raise ValueError("sort_cols must name at least one column")
    cols = [F.col(c) for c in sort_cols]
    if n_files is not None:
        shaped = df.repartitionByRange(int(n_files), *cols)
    else:
        shaped = df.repartitionByRange(*cols)
    shaped.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def file_skipping_stats(
    spark: SparkSession, path: str, predicate: str
) -> dict:
    """Measure layout quality: how many files of ``path`` could serve
    rows for ``predicate`` (via per-file min/max of the predicate's
    column read from footers through per-file scans). Returns
    {"n_files": total, "n_candidate_files": matching}. Diagnostic
    only — the real skipping happens inside the parquet reader."""
    import glob as _glob
    import os as _os

    files = sorted(
        _glob.glob(_os.path.join(path, "part-*.parquet"))
        + _glob.glob(_os.path.join(path, "*", "part-*.parquet"))
    )
    n_candidates = 0
    for f in files:
        if spark.read.parquet(f).filter(predicate).head(1):
            n_candidates += 1
    return {"n_files": len(files), "n_candidate_files": n_candidates}


def optimize_layout_zorder(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "error",
) -> None:
    """Two-dimensional layout clustering: interleave the bits of two
    numeric columns' rank positions (Morton / Z-order) and range-write
    on the resulting code, so files are tight in BOTH dimensions at
    once — the multi-column generalization of :func:`optimize_layout`
    (which clusters one key perfectly and leaves the other random).

    This is the lakehouse OPTIMIZE ... ZORDER BY (a, b) pattern on
    stock Spark: per-column ``percent_rank`` (order statistics make
    the interleave robust to skewed value distributions) quantized to
    ``bits`` levels, interleaved JVM-side with shift/or folds (no
    Python in the path), then ``repartitionByRange`` +
    ``sortWithinPartitions`` on the code. Queries filtering either or
    both columns skip ~sqrt-proportionally more files than a single-
    key sort allows on the second column.

    One extra window per column (global rank) — acceptable for an
    offline rewrite; pass pre-quantized integer columns directly via
    ``optimize_layout`` when ranks are not needed.
    """
    from pyspark.sql import Window

    if bits < 1 or bits > 21:
        raise ValueError("bits must be in [1, 21] (2*bits-bit codes)")
    c1, c2 = cols
    levels = (1 << bits) - 1
    q1 = F.floor(
        F.percent_rank().over(Window.orderBy(F.col(c1))) * levels
    ).cast("long")
    q2 = F.floor(
        F.percent_rank().over(Window.orderBy(F.col(c2))) * levels
    ).cast("long")
    # interleave: bit i of q1 -> bit 2i+1, bit i of q2 -> bit 2i
    def spread(col):
        acc = F.lit(0).cast("long")
        for i in range(bits):
            acc = acc.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), 2 * i
                )
            )
        return acc

    z = F.shiftleft(spread(q1), 1).bitwiseOR(spread(q2))
    shaped = df.withColumn("_z", z)
    if n_files is not None:
        shaped = shaped.repartitionByRange(int(n_files), F.col("_z"))
    else:
        shaped = shaped.repartitionByRange(F.col("_z"))
    shaped.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)
