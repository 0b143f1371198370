"""WET/WARC-style archive source (sources/warc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from ydb_vector_search_simple_api_spark.sources import warc
from ydb_vector_search_simple_api_spark.sources.store import load_documents


def test_roundtrip_exact(spark, tmp_path):
    docs = load_documents(spark, SF_SMALL).select("doc_id", "text", "lang", "source")
    out = str(tmp_path / "wet")
    warc.write_wet_export(docs, out)
    back = warc.read_wet(spark, out)
    exp = docs.select("doc_id", "lang", "source", F.length("text").alias("n"), "text")
    got = back.select("doc_id", "lang", "source", F.col("n_chars").alias("n"), "text")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_payload_with_newlines_and_header_lookalikes(spark, tmp_path):
    """Content-Length framing must survive payloads containing blank
    lines and header-looking text (only the delimiter itself is
    forbidden)."""
    tricky = spark.createDataFrame(
        [
            (1, "plain", "en", "s"),
            (2, "two\n\nparagraphs\nwith\nbreaks", "fr", "s"),
            (3, "Content-Length: 999\n\nWARC-Type: fake", "de", "s"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    out = str(tmp_path / "wet2")
    warc.write_wet_export(tricky, out)
    got = {r.doc_id: r.text for r in warc.read_wet(spark, out).collect()}
    exp = {r.doc_id: r.text for r in tricky.collect()}
    assert got == exp


def test_writer_refuses_cr(spark, tmp_path):
    bad = spark.createDataFrame(
        [(1, "has\rcarriage", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    with pytest.raises(Exception, match="WET framing|assert"):
        warc.write_wet_export(bad, str(tmp_path / "wet3"))
