"""Codec golden-bytes + round-trip tests (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F, types as T

from ydb_vector_search_simple_api_spark.functions.codec import (
    FLOAT32_TAG,
    bytes_to_vector,
    decode_embedding,
    encode_embedding,
    vector_to_bytes,
)

VEC = [0.5, -1.25, 3.0, 1e-3]


def test_golden_bytes():
    # exact reproduction of /root/reference/app.py:157-162
    expected = struct.pack("f" * len(VEC), *VEC) + b"\x01"
    assert vector_to_bytes(VEC) == expected
    assert vector_to_bytes([]) == b"\x01"


def test_roundtrip():
    back = bytes_to_vector(vector_to_bytes(VEC))
    assert list(back) == pytest.approx(VEC)


def test_bad_tag_rejected():
    with pytest.raises(ValueError):
        bytes_to_vector(struct.pack("f", 1.0) + b"\x02")
    with pytest.raises(ValueError):
        bytes_to_vector(b"")


def test_bulk_udf_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, [float(i), float(i) + 0.5]) for i in range(10)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("vec", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    out = (
        df.withColumn("wire", encode_embedding("vec"))
        .withColumn("back", decode_embedding("wire"))
        .collect()
    )
    for row in out:
        assert row.wire == vector_to_bytes(row.vec)
        assert list(row.back) == pytest.approx(row.vec)
