"""Deterministic sampling / dataset splitting for training pipelines.

Extension scope (north star): a 100 TB corpus needs reproducible
train/valid/test assignment that is a pure function of the row key —
no RNG state, no global pass, no coordination. Assignment is a NARROW
per-row map (one md5 over the key), so it composes with any scan,
survives re-partitioning, and re-runs to the identical split on any
cluster size. The hash is md5 (not xxhash64) so the DuckDB oracle can
reproduce the values bit-for-bit.

Mechanism: the first 6 hex digits of ``md5(key)`` are a uniform draw
from [0, 16^6); fraction thresholds become fixed hex strings compared
lexicographically (lowercase hex sorts by value in ASCII — identical
in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.store import load_documents

#: hex digits of the md5 prefix used as the uniform draw; 16^6 ≈ 16.8M
#: buckets keeps fraction granularity ~6e-8 while staying far inside
#: exact-integer range.
PREFIX_HEX = 6


def _threshold_hex(frac: float) -> str:
    """Cumulative fraction -> fixed hex threshold (floor, so a split
    gets at most its exact share of buckets)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction out of [0,1]: {frac}")
    n = int(frac * 16**PREFIX_HEX)
    if n >= 16**PREFIX_HEX:
        # 'g' sorts above every hex digit, so the comparison keeps all
        # rows (a 7-digit "1000000" would sort BELOW most 6-char draws)
        return "g"
    return format(n, f"0{PREFIX_HEX}x")


def _draw(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, PREFIX_HEX)


def split_assign(key: Column, train: float = 0.8, valid: float = 0.1) -> Column:
    """'train' | 'valid' | 'test' as a pure function of the key."""
    d = _draw(key)
    return (
        F.when(d < F.lit(_threshold_hex(train)), F.lit("train"))
        .when(d < F.lit(_threshold_hex(train + valid)), F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def hash_sample(df: DataFrame, key_col: str, frac: float) -> DataFrame:
    """Deterministic ~frac sample: keep rows whose draw falls below the
    threshold. Unlike ``df.sample`` this is stable across runs, plans
    and partitionings — the property a reproducible pipeline needs."""
    return df.filter(_draw(F.col(key_col)) < F.lit(_threshold_hex(frac)))


def document_splits(
    spark: SparkSession, sf_dir: str, train: float = 0.8, valid: float = 0.1
) -> DataFrame:
    """Per-document split assignment over ``documents``."""
    d = load_documents(spark, sf_dir)
    return d.select(
        "doc_id", split_assign(F.col("doc_id"), train, valid).alias("split")
    )


def split_sizes(
    spark: SparkSession, sf_dir: str, train: float = 0.8, valid: float = 0.1
) -> DataFrame:
    """Split cardinalities — the sanity check that the hash draw is
    uniform enough at the corpus's size."""
    return (
        document_splits(spark, sf_dir, train, valid)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def splits_sql(train: float = 0.8, valid: float = 0.1) -> str:
    """DuckDB oracle twin of :func:`document_splits`."""
    t1, t2 = _threshold_hex(train), _threshold_hex(train + valid)
    return f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, {PREFIX_HEX}) < '{t1}'
              THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, {PREFIX_HEX}) < '{t2}'
              THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


def split_sizes_sql(train: float = 0.8, valid: float = 0.1) -> str:
    return f"""
SELECT split, count(*)::BIGINT AS n_docs
FROM ({splits_sql(train, valid)})
GROUP BY split
"""


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by quality: each document is kept with
    probability quality² (squaring sharpens the preference for clean
    docs — the standard quality-weighted mixture move when downsampling
    a web-scale corpus without a hard cutoff's cliff).

    Deterministic and engine-portable: the draw is the md5-prefix
    integer (the splits contract), the rate is the 6-rounded quality
    squared — one double multiply, identical IEEE result in Spark and
    DuckDB — and admission compares integers:
    ``draw < floor(q6 * q6 * 16^6)``.

    Output: (doc_id, quality, admitted) for every doc — the keep-list
    plus the audit trail (admitted=1 rows are the sample)."""
    from pyspark.sql import functions as F

    from ..functions import text as TXT

    d = load_documents(spark, sf_dir)
    q6 = F.round(TXT.quality_score("text"), 6) + F.lit(0.0)
    draw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, PREFIX_HEX), 16, 10
    ).cast("bigint")
    threshold = F.floor(q6 * q6 * F.lit(float(16**PREFIX_HEX))).cast("bigint")
    return d.select(
        "doc_id",
        q6.alias("quality"),
        (draw < threshold).cast("int").alias("admitted"),
    ).orderBy("doc_id")


def epoch_shards(
    spark: SparkSession, sf_dir: str, n_shards: int = 8, epoch: int = 0
) -> DataFrame:
    """Deterministic training-epoch shard assignment: shard =
    md5(doc_id ':' epoch) mod n_shards — a reproducible global
    shuffle whose permutation changes per epoch but never per run.
    The write path is ``df.repartition(n_shards, 'shard')`` straight
    to per-shard files; the gate shape audits the balance: per-shard
    doc count, token total, and distinct-source coverage (a healthy
    shuffle spreads every source across every shard).

    Scale shape: one narrow projection + one groupBy(shard) with
    map-side combine — no joins, no windows; at 100 TB the only
    exchange is |n_shards| aggregation groups. Output (shard, n_docs,
    n_tokens, n_sources)."""
    if n_shards < 1:
        raise ValueError("n_shards must be a positive integer")
    from ..functions import text as TXT

    d = load_documents(spark, sf_dir)
    draw = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(epoch)))),
            1,
            PREFIX_HEX,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        d.select(
            (draw % n_shards).alias("shard"),
            TXT.token_count("text").alias("n_tok"),
            "source",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy("shard")
    )


def per_source_examples(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Deterministic per-group sample: the k docs per source with the
    lowest md5 draw — the corpus-inspection primitive (same k rows
    every run, every engine, every partitioning; ``df.sample`` is
    none of those). One window over (source) ranked by (draw,
    doc_id); sources are bounded, so the partition key is safe at any
    corpus size. Output (source, doc_id, rk)."""
    d = load_documents(spark, sf_dir).select("source", "doc_id")
    draw = _draw(F.col("doc_id"))
    w = Window.partitionBy("source").orderBy(draw.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("source", "doc_id", "rk")
    )
