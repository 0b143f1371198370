"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row-count + column names + sorted values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from ydb_vector_search_simple_api_spark.sources.store import TABLES


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(round(v, 9))
        if isinstance(v, bytes):
            return v.hex()
        return repr(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in os_:
            print(f"  {name:32s} rows-only: {len(srows)} rows  (no oracle)")
            continue
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        ok_vals = sn == dn
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        print(
            f"  {name:32s} {status} spark={len(srows)} duck={len(drows)} "
            f"cols_match={ok_cols} vals_match={ok_vals}"
        )
        if not (ok_cols and ok_vals):
            failures += 1
            if not ok_cols:
                print(f"    spark cols: {scols}\n    duck  cols: {dcols}")
            for a, b in list(zip(sn, dn))[:200]:
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    break
            extra_s = [r for r in sn if r not in dn][:3]
            extra_d = [r for r in dn if r not in sn][:3]
            if extra_s:
                print(f"    only-in-spark: {extra_s}")
            if extra_d:
                print(f"    only-in-duck : {extra_d}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
