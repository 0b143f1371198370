"""KMV bottom-k distinct sketches (operators/kmv.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MED
from ydb_vector_search_simple_api_spark.operators import kmv


def _ids(spark, n, offset=0, tag="t"):
    return spark.range(offset, offset + n).select(
        F.lit(tag).alias("g"), F.col("id").alias("key")
    )


def test_unsaturated_is_exact(spark):
    df = _ids(spark, 300)
    est = kmv.kmv_estimate(kmv.kmv_sketch(df, "key", ["g"], k=512), k=512).collect()
    assert len(est) == 1
    assert est[0].exact is True
    assert est[0].est_distinct == 300 == est[0].n_min


def test_saturated_estimator_error(spark):
    """k=256 over 50k distinct keys: the (k-1)·M/h_(k) estimate lands
    within 5σ = 5/sqrt(k-2) ≈ 31% (generous; typical ~6%)."""
    df = _ids(spark, 50_000)
    est = kmv.kmv_estimate(kmv.kmv_sketch(df, "key", ["g"], k=256), k=256).collect()
    assert est[0].exact is False and est[0].n_min == 256
    rel = abs(est[0].est_distinct - 50_000) / 50_000
    assert rel < 0.32, rel


def test_merge_equals_whole(spark):
    """Mergeability: sketch(A ∪ B) == merge(sketch(A), sketch(B)) —
    exact array equality, the property the incremental stores rely on."""
    a = _ids(spark, 5_000, offset=0)
    b = _ids(spark, 5_000, offset=2_500)  # overlapping halves
    whole = kmv.kmv_sketch(a.unionByName(b), "key", ["g"], k=128).collect()[0]
    parts = kmv.kmv_sketch(a, "key", ["g"], k=128).unionByName(
        kmv.kmv_sketch(b, "key", ["g"], k=128)
    )
    merged = kmv.kmv_merge(parts, ["g"], k=128).collect()[0]
    assert merged.sketch == whole.sketch
    assert merged.n_min == whole.n_min


def test_pair_report_exact_regime(spark):
    """Two groups with known overlap, k large: exact Jaccard."""
    a = _ids(spark, 400, offset=0, tag="a")
    b = _ids(spark, 400, offset=300, tag="b")  # overlap 100, union 700
    sk = kmv.kmv_sketch(a.unionByName(b), "key", ["g"], k=1024)
    rep = kmv.kmv_pair_report(sk, "g", k=1024).collect()[0]
    assert rep.union_est == 700
    assert rep.inter_est == 100
    assert abs(rep.jaccard - 100 / 700) < 1e-6


def test_pair_report_saturated_estimates(spark):
    """Saturated regime: 20k ∪ 20k with 10k overlap, k=256 — union and
    intersection estimates within 5σ-ish bounds."""
    a = _ids(spark, 20_000, offset=0, tag="a")
    b = _ids(spark, 20_000, offset=10_000, tag="b")
    sk = kmv.kmv_sketch(a.unionByName(b), "key", ["g"], k=256)
    rep = kmv.kmv_pair_report(sk, "g", k=256).collect()[0]
    assert abs(rep.union_est - 30_000) / 30_000 < 0.32
    # Jaccard true = 10k/30k = 1/3; binomial σ = sqrt(p(1-p)/k) ≈ 0.029
    assert abs(rep.jaccard - 1 / 3) < 0.15


def test_gate_entries_shape(spark):
    by_type = kmv.kmv_distinct_by_type(spark, SF_MED).collect()
    assert len(by_type) == 5 and all(r.exact for r in by_type)
    overlap = kmv.kmv_user_overlap(spark, SF_MED).collect()
    assert len(overlap) == 10
    for r in overlap:
        assert r.inter_est <= r.union_est
        assert 0.0 <= r.jaccard <= 1.0


def test_store_upsert_equals_whole(spark, tmp_path):
    """Store built from half the stream + upsert of the other half ==
    one-shot sketch of everything (exact array equality), and
    replaying the upsert is a no-op (idempotent fold)."""
    import pyspark.sql.functions as SF

    whole = _ids(spark, 4_000).withColumn("half", SF.col("key") % 2)
    store = str(tmp_path / "kmv_store")
    kmv.build_kmv_store(whole.filter("half = 0"), store, "key", ["g"], k=256)
    kmv.kmv_store_upsert(spark, store, whole.filter("half = 1"), "key", ["g"], k=256)
    got = spark.read.parquet(store).collect()[0]
    exp = kmv.kmv_sketch(whole, "key", ["g"], k=256).collect()[0]
    assert got.sketch == exp.sketch and got.n_min == exp.n_min
    kmv.kmv_store_upsert(spark, store, whole.filter("half = 1"), "key", ["g"], k=256)
    again = spark.read.parquet(store).collect()[0]
    assert again.sketch == exp.sketch


def test_filtered_build_equals_salted(spark):
    df = _ids(spark, 30_000)
    a = kmv.kmv_sketch(df, "key", ["g"], k=128).collect()[0]
    b = kmv.kmv_sketch_filtered(df, "key", ["g"], k=128).collect()[0]
    assert a.sketch == b.sketch and a.n_min == b.n_min
