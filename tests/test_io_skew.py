"""CSV/JSON sources, partitioned/bucketed sinks, salted skew join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators.skew import salted_join
from ydb_vector_search_simple_api_spark.sources import io as sio
from ydb_vector_search_simple_api_spark.sources.store import load_store_df, load_table

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def store(spark):
    return load_store_df(spark, SF_SMALL)


def _as_map(rows):
    return {r.id: (r.title, r.vendor, r.description, list(r.embedding)) for r in rows}


def test_csv_roundtrip(spark, store, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "store_csv")
    sio.write_store_csv(store, path)
    back = sio.read_store_csv(spark, path)
    assert back.schema["embedding"].dataType.simpleString() == "array<float>"
    a, b = _as_map(store.collect()), _as_map(back.collect())
    assert a.keys() == b.keys()
    for k in a:
        assert a[k][:3] == b[k][:3]
        assert a[k][3] == pytest.approx(b[k][3], rel=1e-6)


def test_json_roundtrip(spark, store, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "store_json")
    store.write.json(path)
    back = sio.read_store_json(spark, path)
    assert _as_map(store.collect()) == _as_map(back.collect())


def test_partitioned_write_prunes(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "docs_part")
    docs = load_table(spark, SF_SMALL, "documents")
    sio.write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path).filter(F.col("lang") == "fr")
    from ydb_vector_search_simple_api_spark.plans.checks import partition_filters

    assert "lang" in partition_filters(back)
    expect = docs.filter(F.col("lang") == "fr").count()
    assert back.count() == expect


def test_bucketed_join_skips_shuffle(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    sio.write_bucketed(docs, "docs_bucketed", "doc_id", n_buckets=8)
    left = spark.table("docs_bucketed")
    right = spark.table("docs_bucketed").withColumnRenamed("lang", "lang2")
    joined = left.join(right, "doc_id")
    from ydb_vector_search_simple_api_spark.plans.checks import simple_plan

    plan = simple_plan(joined)
    # co-located join: sort-merge with no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == docs.count()


def test_salted_join_matches_plain_join(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    profile = (
        load_table(spark, SF_SMALL, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("lang_docs"))
    )
    plain = docs.join(profile, "lang").select("doc_id", "lang", "lang_docs")
    salted = salted_join(docs, profile, on="lang").select("doc_id", "lang", "lang_docs")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    anti_plain = docs.join(profile.filter(F.col("lang") == "fr"), "lang", "left_anti")
    anti_salted = salted_join(
        docs, profile.filter(F.col("lang") == "fr"), on="lang", how="left_anti"
    )
    assert sorted(r.doc_id for r in anti_plain.collect()) == sorted(
        r.doc_id for r in anti_salted.collect()
    )

    with pytest.raises(ValueError):
        salted_join(docs, profile, on="lang", how="full")


def test_orc_roundtrip(spark, store, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "store_orc")
    sio.write_store_orc(store, path)
    back = sio.read_store_orc(spark, path)
    assert back.schema["embedding"].dataType.simpleString() == "array<float>"
    a, b = _as_map(store.collect()), _as_map(back.collect())
    assert a == b  # ORC is binary-exact for float32 (no text decode)


def test_raw_text_ingest(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("io") / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha doc\nbeta doc\nalpha doc\n")
    df = sio.read_raw_text(spark, str(d))
    rows = df.collect()
    assert len(rows) == 3
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, set()).add(r.doc_id)
    # content-derived id: identical lines share the id, distinct differ
    assert len(by_text["alpha doc"]) == 1
    assert by_text["alpha doc"] != by_text["beta doc"]


def test_binary_files_ingest(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("io") / "media"
    d.mkdir()
    (d / "x.bin").write_bytes(b"\x00\x01\x02payload")
    (d / "y.bin").write_bytes(b"\xff" * 16)
    (d / "skip.txt").write_text("not media")
    df = sio.read_binary_files(spark, str(d), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: (r.length, bytes(r.content)) for r in df.collect()}
    assert set(rows) == {"x.bin", "y.bin"}
    assert rows["x.bin"] == (10, b"\x00\x01\x02payload")
    assert rows["y.bin"][0] == 16


def test_optimize_layout_tightens_file_ranges(spark, tmp_path):
    from ydb_vector_search_simple_api_spark.sources.io import (
        file_skipping_stats,
        optimize_layout,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    # random layout: every file spans the whole doc_id domain
    messy = str(tmp_path / "messy")
    docs.orderBy(F.md5(F.col("doc_id").cast("string"))).repartition(8).write.parquet(messy)
    # range-clustered rewrite
    tidy = str(tmp_path / "tidy")
    optimize_layout(spark.read.parquet(messy), tidy, ["doc_id"], n_files=8)

    pred = "doc_id BETWEEN 100 AND 120"
    before = file_skipping_stats(spark, messy, pred)
    after = file_skipping_stats(spark, tidy, pred)
    assert before["n_files"] == 8 and after["n_files"] == 8
    # messy layout: the narrow range hits (almost) every file; tidy
    # layout: it lives in at most 2 range files
    assert before["n_candidate_files"] >= 6
    assert after["n_candidate_files"] <= 2
    # rewrite is lossless
    assert spark.read.parquet(tidy).count() == docs.count()


def test_optimize_layout_validates_cols(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    from ydb_vector_search_simple_api_spark.sources.io import optimize_layout

    with pytest.raises(ValueError):
        optimize_layout(docs, str(tmp_path / "x"), [])


def test_zorder_layout_skips_in_both_dimensions(spark, tmp_path):
    from ydb_vector_search_simple_api_spark.sources.io import (
        file_skipping_stats,
        optimize_layout,
        optimize_layout_zorder,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    n_files = 16
    # single-key sorts: perfect on their key, random on the other
    by_u = str(tmp_path / "by_u")
    optimize_layout(events, by_u, ["user_id"], n_files=n_files)
    by_v = str(tmp_path / "by_v")
    optimize_layout(events, by_v, ["value"], n_files=n_files)
    # z-order on (user_id, value)
    zpath = str(tmp_path / "z")
    optimize_layout_zorder(events, zpath, ("user_id", "value"), n_files=n_files)

    vals = sorted(r.value for r in events.select("value").collect())
    users = sorted(r.user_id for r in events.select("user_id").collect())
    pred_v = f"value BETWEEN {vals[len(vals)//10]} AND {vals[2*len(vals)//10]}"
    pred_u = f"user_id BETWEEN {users[len(users)//10]} AND {users[2*len(users)//10]}"

    # each single-key layout is blind on the OTHER key (touches ~all
    # files); the z-order layout must skip meaningfully on BOTH
    blind_v = file_skipping_stats(spark, by_u, pred_v)["n_candidate_files"]
    blind_u = file_skipping_stats(spark, by_v, pred_u)["n_candidate_files"]
    assert blind_v >= n_files - 2 and blind_u >= n_files - 2
    zv = file_skipping_stats(spark, zpath, pred_v)["n_candidate_files"]
    zu = file_skipping_stats(spark, zpath, pred_u)["n_candidate_files"]
    assert zv < blind_v and zu < blind_u
    assert zv <= n_files * 3 // 4 and zu <= n_files * 3 // 4
    # rewrite is lossless
    assert spark.read.parquet(zpath).count() == events.count()


def test_zorder_validates_bits(spark, tmp_path):
    from ydb_vector_search_simple_api_spark.sources.io import optimize_layout_zorder

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    with pytest.raises(ValueError):
        optimize_layout_zorder(events, str(tmp_path / "x"), ("user_id", "value"), bits=0)


def test_key_skew_report_shares(spark):
    from ydb_vector_search_simple_api_spark.operators import skew as SK
    from conftest import SF_SMALL

    rows = SK.key_skew_report(spark, SF_SMALL, top_n=20).collect()
    assert 0 < len(rows) <= 20
    assert sum(r.share for r in rows) <= 1.0 + 1e-6
    ns = [r.n_events for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_salted_rollup_equals_direct(spark):
    from pyspark.sql import functions as F
    from ydb_vector_search_simple_api_spark.operators import skew as SK
    from ydb_vector_search_simple_api_spark.sources.store import load_events
    from conftest import SF_SMALL

    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in SK.salted_user_rollup(spark, SF_SMALL, n_salt=8).collect()
    }
    direct = (
        load_events(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6) + F.lit(0.0)).alias("v"),
        )
        .collect()
    )
    want = {r.user_id: (r.n, r.v) for r in direct}
    assert got == want
