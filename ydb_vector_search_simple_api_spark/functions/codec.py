"""Vector wire codec: float32-array <-> YDB Knn binary string.

Reproduces ``convert_vector_to_bytes`` (``/root/reference/app.py:157-162``):
little-endian IEEE-754 float32 array + a single trailing format-tag
byte ``0x01`` (the serialization of YDB's ``Knn::ToBinaryStringFloat``,
SURVEY.md §1.2). Canonical in-engine representation is
``ArrayType(FloatType)``; this codec exists for wire-format parity and
bulk import/export of binary-packed embedding columns.

Bulk paths are Arrow-batched pandas UDFs (``binary_to_vector_udf`` /
``vector_to_binary_udf``) — NumPy ``frombuffer``/``tobytes`` per batch,
never per-row Python ``struct`` calls in the hot path.
"""

from __future__ import annotations

import struct
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, FloatType

#: trailing format-tag byte: element type float32 (app.py:161)
FLOAT32_TAG = b"\x01"


def vector_to_bytes(vec: Sequence[float]) -> bytes:
    """Exact reproduction of app.py:157-162:
    ``struct.pack("f" * len(v), *v) + b"\\x01"``."""
    return struct.pack("<" + "f" * len(vec), *vec) + FLOAT32_TAG


def bytes_to_vector(raw: bytes) -> list[float]:
    """Inverse of :func:`vector_to_bytes`; validates the tag byte."""
    if not raw or raw[-1:] != FLOAT32_TAG:
        raise ValueError("not a float32-tagged Knn binary string")
    body = raw[:-1]
    if len(body) % 4:
        raise ValueError("payload length is not a multiple of 4")
    return list(struct.unpack("<" + "f" * (len(body) // 4), body))


@F.pandas_udf(ArrayType(FloatType()))
def binary_to_vector_udf(s: pd.Series) -> pd.Series:
    """BinaryType wire column -> ArrayType(FloatType), Arrow-batched."""

    def decode(raw):
        if raw is None or len(raw) == 0 or raw[-1:] != FLOAT32_TAG:
            return None
        return np.frombuffer(bytes(raw)[:-1], dtype="<f4")

    return s.map(decode)


@F.pandas_udf(BinaryType())
def vector_to_binary_udf(s: pd.Series) -> pd.Series:
    """ArrayType(FloatType) -> BinaryType wire column, Arrow-batched."""

    def encode(vec):
        if vec is None:
            return None
        return np.asarray(vec, dtype="<f4").tobytes() + FLOAT32_TAG

    return s.map(encode)


def decode_embedding(col) -> Column:
    """Column helper: wire-format binary -> float array (O12)."""
    c = F.col(col) if isinstance(col, str) else col
    return binary_to_vector_udf(c)


def encode_embedding(col) -> Column:
    """Column helper: float array -> wire-format binary (O11)."""
    c = F.col(col) if isinstance(col, str) else col
    return vector_to_binary_udf(c)
