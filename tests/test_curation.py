"""Curation operators: decontamination, packing, stratified sampling,
repetition signals, quantization, kNN labeling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import curation

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_decontaminate_finds_contained_benchmark(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, bench_text, "bench"),
            # training doc containing the full benchmark passage
            (2, "prefix words " + bench_text + " suffix words", "train"),
            # unrelated training doc
            (3, "totally different content with no overlap at all here", "train"),
        ],
        ["doc_id", "text", "kind"],
    )
    out = curation.decontaminate(
        docs, F.col("kind") == "bench", n=8, min_containment=0.5
    ).collect()
    assert len(out) == 1
    row = out[0]
    # the 8-token benchmark has exactly one 8-gram, fully contained
    assert (row.doc_id, row.bench_id, row.n_common) == (2, 1, 1)
    assert row.containment == 1.0


def test_decontaminate_partial_containment(spark):
    bench_text = "a b c d e f g h i"  # two 8-grams
    docs = spark.createDataFrame(
        [
            (1, bench_text, "bench"),
            (2, "x y a b c d e f g h z", "train"),  # contains 1 of 2
        ],
        ["doc_id", "text", "kind"],
    )
    out = curation.decontaminate(
        docs, F.col("kind") == "bench", n=8, min_containment=0.3
    ).collect()
    assert len(out) == 1 and out[0].containment == 0.5


def test_decontaminate_bloom_matches_exact(spark):
    """The Bloom-admission twin is bit-identical to the exact path on
    the real corpus: the sketch has no false negatives and false
    positives die in the exact verify join."""
    exact = sorted(
        curation.decontaminate_documents(spark, SF_SMALL).collect(),
        key=lambda r: (r.doc_id, r.bench_id),
    )
    bloom = sorted(
        curation.decontaminate_bloom_documents(spark, SF_SMALL).collect(),
        key=lambda r: (r.doc_id, r.bench_id),
    )
    assert bloom == exact and len(exact) > 0


def test_decontaminate_bloom_synthetic(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, bench_text, "bench"),
            (2, "prefix words " + bench_text + " suffix words", "train"),
            (3, "totally different content with no overlap at all here", "train"),
        ],
        ["doc_id", "text", "kind"],
    )
    out = curation.decontaminate_bloom(
        docs, F.col("kind") == "bench", n=8, min_containment=0.5
    ).collect()
    assert len(out) == 1
    assert (out[0].doc_id, out[0].bench_id, out[0].containment) == (2, 1, 1.0)


def test_decontaminate_bloom_empty_benchmark(spark):
    docs = spark.createDataFrame(
        [(1, "some training text here only", "train")],
        ["doc_id", "text", "kind"],
    )
    out = curation.decontaminate_bloom(
        docs, F.col("kind") == "bench", n=3, min_containment=0.3
    ).collect()
    assert out == []


def test_pack_chunks_partitions_the_chunk_stream(spark):
    from ydb_vector_search_simple_api_spark.operators.textual import chunk_documents

    bins = curation.pack_chunks(spark, SF_SMALL, budget=256)
    chunks = chunk_documents(spark, SF_SMALL)
    per_doc = (
        bins.groupBy("doc_id")
        .agg(
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_bin_tokens").alias("n_tokens"),
            F.min("bin_id").alias("min_bin"),
            F.max("bin_id").alias("max_bin"),
            F.count(F.lit(1)).alias("n_bins"),
        )
        .collect()
    )
    truth = {
        r.doc_id: (r.n_chunks, r.n_tokens)
        for r in chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("n_tokens"),
        )
        .collect()
    }
    assert len(per_doc) == len(truth)
    for r in per_doc:
        # bins exactly partition the doc's chunks and tokens
        assert (r.n_chunks, r.n_tokens) == truth[r.doc_id]
        # bin ids are contiguous from 0
        assert r.min_bin == 0 and r.max_bin == r.n_bins - 1


def test_stratified_sample_deterministic_and_consistent(spark):
    rates = {"en": 0.5, "fr": 0.8}
    stats = curation.stratified_sample_stats(spark, SF_SMALL, rates).collect()
    again = curation.stratified_sample_stats(spark, SF_SMALL, rates).collect()
    assert sorted(map(tuple, stats)) == sorted(map(tuple, again))
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    d = load_documents(spark, SF_SMALL)
    sampled = curation.stratified_sample(d, "doc_id", "lang", rates)
    by_lang = {
        r.lang: r.n
        for r in sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in stats:
        assert by_lang.get(r.lang, 0) == r.n_sampled
        assert 0 <= r.n_sampled <= r.n_docs
    # the 'en' stratum is actually downsampled
    en = next(r for r in stats if r.lang == "en")
    assert 0 < en.n_sampled < en.n_docs


def test_repetition_signals_crafted(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "q r")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in curation.repetition_signals_df(docs).collect()}
    # "a a a a": mode=4/4, 3-grams = [a a a, a a a] -> dup frac 0.5
    assert rows[1].top_token_frac == 1.0
    assert rows[1].dup_ngram_frac == 0.5
    # all-distinct tokens/grams
    assert rows[2].top_token_frac == 0.25
    assert rows[2].dup_ngram_frac == 0.0
    # shorter than n grams -> 0.0 by contract
    assert rows[3].dup_ngram_frac == 0.0


def test_quantize_crafted(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5]), (2, [0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {r.vec_id: r for r in curation.quantize_df(docs).collect()}
    # maxabs=1: codes 127, -127, floor(63.5+0.5)=64
    assert rows[1].qscale == 1.0
    assert rows[1].codes_md5 == hashlib.md5(b"127,-127,64").hexdigest()
    # zero vector -> zero codes, qscale 0
    assert rows[2].qscale == 0.0
    assert rows[2].codes_md5 == hashlib.md5(b"0,0,0").hexdigest()


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3 (diameter 2, needs >1 round), pair 10-11, isolated
    # vertices never appear in pairs and never appear in the output
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    out = {
        r.doc_id: r.component_id
        for r in curation.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_deep_chain_converges(spark):
    n = 12  # diameter > checkpoint_every exercises the checkpoint path
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    out = curation.connected_components(pairs).collect()
    assert {r.component_id for r in out} == {0}
    assert len(out) == n + 1


def test_source_token_budget_caps_each_source(spark):
    out = curation.source_token_budget(spark, SF_SMALL, budget=500).collect()
    assert len(out) > 0
    for r in out:
        assert 0 < r.n_admitted <= r.n_docs
    # a tiny budget admits exactly one doc per source (first overflows)
    one = curation.source_token_budget(spark, SF_SMALL, budget=1).collect()
    assert all(r.n_admitted == 1 for r in one)


def test_decontaminate_plan_broadcasts_benchmark_side(spark):
    """The corpus side must never shuffle for the probe: both the
    shingle join and the sizes join are broadcasts, and no sort-merge
    join appears."""
    out = curation.decontaminate_documents(spark, SF_SMALL)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_pack_chunks_single_exchange_before_agg(spark):
    """One hash exchange on doc_id serves both the window and the
    groupBy (same key): no second data-wide shuffle."""
    plan = (
        curation.pack_chunks(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_stratified_sample_stats_no_python_boundary(spark):
    """Pure codegen path: the md5 draw and the CASE tree stay
    JVM-side (no ArrowEvalPython / BatchEvalPython)."""
    plan = (
        curation.stratified_sample_stats(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_knn_classify_labels_clusters(spark):
    import numpy as np

    rng = np.random.RandomState(1)
    rows = []
    vid = 0
    centers = [rng.randn(16) for _ in range(2)]
    for label, c in enumerate(centers):
        for _ in range(20):
            v = c + rng.randn(16) * 0.05
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    import tempfile

    sf_dir = tempfile.mkdtemp(prefix="svs_knnc_")
    df.write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    out = curation.knn_classify(spark, sf_dir, k=5, n_queries=6).collect()
    assert len(out) == 6
    for r in out:
        # queries 0..5 are all in cluster 0; tight clusters -> all
        # neighbors agree
        assert r.pred_label == 0 and r.votes == 5


def test_redact_pii_counts_and_order(spark):
    """URL pass runs first, so an address inside a URL is one URL (its
    embedded dots/digits never reach the email/IP passes)."""
    from ydb_vector_search_simple_api_spark.operators.curation import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d@e.org now"),
            (2, "see https://h.example.com/u/1.2.3.4 and 5.6.7.8"),
            (3, "call +1 555 0100 or +44 555 0199"),
            (4, "nothing suspicious here"),
        ],
        ["doc_id", "pii_text"],
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (rows[1].n_emails, rows[1].n_urls) == (2, 0)
    assert rows[1].redacted == "mail <EMAIL> and <EMAIL> now"
    # the URL swallows its embedded dotted quad; the free-standing one counts
    assert (rows[2].n_urls, rows[2].n_ips) == (1, 1)
    assert rows[2].redacted == "see <URL> and <IP>"
    assert rows[3].n_phones == 2
    assert rows[3].redacted == "call <PHONE> or <PHONE>"
    assert (
        rows[4].n_urls, rows[4].n_emails, rows[4].n_ips, rows[4].n_phones
    ) == (0, 0, 0, 0)
    assert rows[4].redacted == "nothing suspicious here"


def test_pii_redaction_stays_jvm_side(spark):
    """Regex scrub is pure codegen: no Python boundary in the plan."""
    plan = (
        curation.pii_redaction(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # narrow map: zero shuffles


def test_label_centroids_match_numpy_mean(spark):
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators.curation import label_centroids
    from ydb_vector_search_simple_api_spark.sources.store import load_embeddings

    sf = "/root/testdata/sf0.001"
    got = {(r.label, r.pos): r.centroid for r in label_centroids(spark, sf).collect()}
    rows = load_embeddings(spark, sf).select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.embedding)
    dim = len(next(iter(by_label.values()))[0])
    assert len(got) == len(by_label) * dim
    for lab, vecs in by_label.items():
        mean = np.mean(np.array(vecs, dtype=np.float64), axis=0)
        for p in range(dim):
            assert abs(got[(lab, p + 1)] - mean[p]) < 5e-7


def test_curate_corpus_respects_stage_constraints(spark):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import curation, dedup, textual
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    sf = "/root/testdata/sf0.001"
    out = {r.doc_id: r.split for r in curation.curate_corpus(spark, sf).collect()}
    assert 0 < len(out) < 500
    assert set(out.values()) <= {"train", "valid", "test"}

    docs = load_documents(spark, sf)
    quality = {r.doc_id for r in textual.quality_filter(spark, sf).collect()}
    canonical = {r.keep_id for r in dedup.exact_dup_groups(docs).collect()}
    bench = {r.doc_id for r in docs.filter(F.col("source") == "src0").collect()}
    contaminated = {
        r.doc_id for r in curation.decontaminate_documents(spark, sf).collect()
    }
    survivors = set(out)
    assert survivors <= quality
    assert survivors <= canonical
    assert not (survivors & bench)
    assert not (survivors & contaminated)


def test_mixture_resample_shares_and_determinism(spark):
    from ydb_vector_search_simple_api_spark.operators import curation

    out = {r.source: r for r in curation.mixture_resample(spark, SF_SMALL).collect()}
    # only weighted sources appear
    assert set(out) == set(curation.MIX_WEIGHTS)
    total = sum(r.tokens_admitted for r in out.values())
    assert total > 0
    # achieved token shares track the target mix (hash-draw noise on a
    # 25-doc/source corpus is large; just require ordering + bounds)
    shares = {s: out[s].tokens_admitted / total for s in out}
    assert shares["src0"] == max(shares.values())
    for s, w in curation.MIX_WEIGHTS.items():
        assert abs(shares[s] - w / 100) < 0.25
    # admitted never exceeds input
    for r in out.values():
        assert 0 <= r.n_admitted <= r.n_docs
        assert 0 <= r.tokens_admitted <= r.tokens_in
    # deterministic: identical on re-run
    again = {r.source: r for r in curation.mixture_resample(spark, SF_SMALL).collect()}
    assert {s: tuple(r) for s, r in out.items()} == {s: tuple(r) for s, r in again.items()}


def test_mixture_resample_validates_weights(spark):
    from ydb_vector_search_simple_api_spark.operators import curation

    with pytest.raises(ValueError):
        curation.mixture_resample(spark, SF_SMALL, weights={"src0": 101})
    with pytest.raises(ValueError):
        curation.mixture_resample(spark, SF_SMALL, weights={"src0": 0})


def test_hard_negatives_exclude_anchor_label(spark):
    from ydb_vector_search_simple_api_spark.operators import curation

    out = curation.hard_negatives(spark, SF_SMALL, k=5, n_queries=6).collect()
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    assert len(out) == 30
    for r in out:
        assert labels[r.id] != labels[r.query_id]
        assert 1 <= r.rank <= 5
    # negatives are the nearest CROSS-label rows: any same-rank exact
    # kNN hit with a different label must appear here too
    from ydb_vector_search_simple_api_spark.operators.search import knn_join
    from pyspark.sql import functions as F

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    c = embs.select(F.col("vec_id").alias("id"), "embedding")
    allk = knn_join(spark, q, c, k=5, round_digits=6).collect()
    neg_ids = {(r.query_id, r.id) for r in out}
    for r in allk:
        if labels[r.id] != labels[r.query_id]:
            assert (r.query_id, r.id) in neg_ids


def test_cdc_merge_latest_version_wins(spark):
    from ydb_vector_search_simple_api_spark.operators import curation as C
    from ydb_vector_search_simple_api_spark.sources.store import load_documents
    from pyspark.sql import functions as F

    snap = C.cdc_merge_snapshot(spark, SF_SMALL, frac=0.2).collect()
    docs = load_documents(spark, SF_SMALL)
    assert len(snap) == docs.count()  # one row per key after merge
    v2 = [r for r in snap if r.version == 2]
    v1 = [r for r in snap if r.version == 1]
    assert v2 and v1
    # ~frac of docs revised (hash-draw noise tolerated)
    assert 0.05 < len(v2) / len(snap) < 0.4
    # a revised doc's digest equals md5(text + marker)
    upd = C.attach_updates(docs, frac=0.2)
    want = {
        r.doc_id: r.m for r in upd.select("doc_id", F.md5("text").alias("m")).collect()
    }
    for r in v2:
        assert want[r.doc_id] == r.text_md5


def test_dataset_card_sanity(spark):
    from ydb_vector_search_simple_api_spark.operators import curation as C
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    r = C.dataset_card(spark, SF_SMALL).collect()[0]
    n = load_documents(spark, SF_SMALL).count()
    assert r.n_docs == n
    assert r.n_tokens > r.n_docs  # multi-token docs
    assert 0.0 <= r.dup_rate < 1.0
    assert 0.0 < r.mean_quality <= 1.0
    assert r.n_langs >= 1 and r.n_sources >= 1


def test_contrastive_pairs_structure(spark):
    from ydb_vector_search_simple_api_spark.operators import curation as C

    rows = C.contrastive_pairs(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.pos_chunk_id == r.chunk_id + 1
        assert (r.neg_doc_id, r.neg_chunk_id) != (r.doc_id, r.chunk_id)
    # negatives overwhelmingly cross-document
    same = sum(1 for r in rows if r.neg_same_doc)
    assert same / len(rows) < 0.05
    # deterministic
    assert rows == C.contrastive_pairs(spark, SF_SMALL).collect()


def test_export_curated_partition_layout(spark, tmp_path):
    import os
    from ydb_vector_search_simple_api_spark.operators import curation as C

    out = str(tmp_path / "export")
    manifest = {
        (r.split, r.source): r.n_docs
        for r in C.export_curated(spark, SF_SMALL, out_dir=out).collect()
    }
    assert manifest
    # hive layout exists and every manifest cell has a directory
    for (split, source) in manifest:
        assert os.path.isdir(os.path.join(out, f"split={split}", f"source={source}"))
    # directory pruning: reading one partition returns exactly its count
    some_split, some_source = next(iter(manifest))
    n = (
        spark.read.parquet(out)
        .filter(f"split = '{some_split}' AND source = '{some_source}'")
        .count()
    )
    assert n == manifest[(some_split, some_source)]


def test_quality_vs_dup_rate_partitions(spark):
    from ydb_vector_search_simple_api_spark.operators import curation as C
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    rows = C.quality_vs_dup_rate(spark, SF_SMALL).collect()
    assert rows
    assert sum(r.n_docs for r in rows) == load_documents(spark, SF_SMALL).count()
    for r in rows:
        assert 0 <= r.q_bucket <= 9
        assert 0.0 <= r.dup_rate <= 1.0


def test_leakage_safe_splits_no_component_straddles(spark):
    """The invariant the operator exists for: every near-dup component
    lands wholly inside one split, and the assignment covers every
    document exactly once."""
    from ydb_vector_search_simple_api_spark.operators import curation as C

    rows = C.leakage_safe_splits(spark, SF_SMALL).collect()
    n_docs = len({r.doc_id for r in rows})
    assert n_docs == len(rows)  # one row per doc

    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_comp.values())

    # and it genuinely uses components: at least one component holds
    # several docs at these thresholds (the synthetic corpus carries
    # planted near-dups)
    from collections import Counter

    sizes = Counter()
    for r in rows:
        sizes[r.component_id] += 1
    assert max(sizes.values()) > 1


def test_semantic_dedup_election(spark):
    """Every vector resolves to one keeper; keepers keep themselves;
    each component's keeper is its minimum id; duplicates exist at
    this threshold on the synthetic corpus."""
    from ydb_vector_search_simple_api_spark.operators import curation as C

    rows = C.semantic_dedup(spark, SF_SMALL, threshold=0.4).collect()
    assert len({r.vec_id for r in rows}) == len(rows)
    by_keep = {}
    for r in rows:
        by_keep.setdefault(r.keep_id, []).append(r)
    for keep_id, members in by_keep.items():
        assert keep_id == min(m.vec_id for m in members)
        assert sum(1 for m in members if m.keep) == 1
    assert any(not r.keep for r in rows)  # threshold 0.4 finds pairs


def test_semantic_dedup_blocked_matches_exact(spark):
    """The IVF-multi-probe blocked form elects the SAME keepers as the
    exact O(n^2) baseline at the gate's corpus/centroid shape (probes=3
    over 8 clusters), and its pair recall vs exact is pinned — the
    contract that lets the gate entry share the exact oracle."""
    from ydb_vector_search_simple_api_spark.operators import curation as C
    from ydb_vector_search_simple_api_spark.operators import dedup
    from ydb_vector_search_simple_api_spark.sources.store import load_embeddings
    import __spark_entry__ as E

    cents = E._ivf_index(spark, SF_SMALL).centroids.tolist()
    exact = {
        (r.vec_id, r.keep_id, r.keep)
        for r in C.semantic_dedup(spark, SF_SMALL, threshold=0.4).collect()
    }
    blocked = {
        (r.vec_id, r.keep_id, r.keep)
        for r in C.semantic_dedup_blocked(
            spark, SF_SMALL, centroids=cents, threshold=0.4, probes=3
        ).collect()
    }
    assert blocked == exact

    embs = load_embeddings(spark, SF_SMALL)
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.neardup_cosine_pairs(embs, threshold=0.4).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in dedup.neardup_cosine_multiprobe(
            embs, cents, threshold=0.4, probes=3
        ).collect()
    }
    assert got <= exact_pairs  # precision 1.0 by construction
    assert len(got) >= 0.95 * len(exact_pairs)  # recall pin


def test_split_leakage_audit_property(spark):
    """The component policy must report ZERO cross-fence near-dup
    pairs (by construction); the per-doc policy's count is >= 0 and
    both see the same pair set."""
    from ydb_vector_search_simple_api_spark.operators import curation as C

    rows = {r.policy: r for r in C.split_leakage_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {"per_doc_hash", "component_keyed"}
    assert rows["component_keyed"].n_cross_split == 0
    assert rows["per_doc_hash"].n_pairs == rows["component_keyed"].n_pairs
    assert rows["per_doc_hash"].n_cross_split >= 0


def test_connected_components_distributed_matches_union_find(spark):
    """small_graph_max=0 forces the label-propagation loop; results
    must be identical to the driver-side union-find fast path on a
    graph with a chain, a clique and islands."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    fast = {
        (r.doc_id, r.component_id)
        for r in curation.connected_components(pairs).collect()
    }
    dist = {
        (r.doc_id, r.component_id)
        for r in curation.connected_components(pairs, small_graph_max=0).collect()
    }
    assert fast == dist
    assert {c for _, c in fast} == {1, 10, 20}


def test_semantic_decontaminate_flags_only_cross_benchmark(spark):
    """Flags are train-vs-benchmark only (never bench-bench or
    train-train), every flagged pair truly clears the threshold, and
    a numpy replay reproduces the pair set exactly."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators.curation import (
        semantic_decontaminate,
    )
    from ydb_vector_search_simple_api_spark.sources.store import (
        load_documents,
        load_embeddings,
    )
    from conftest import SF_SMALL

    got = semantic_decontaminate(spark, SF_SMALL, threshold=0.4).collect()
    src = {
        r.doc_id: r.source
        for r in load_documents(spark, SF_SMALL).select("doc_id", "source").collect()
    }
    for r in got:
        assert src[r.doc_id] != "src0" and src[r.bench_id] == "src0"
        assert r.cos_sim >= 0.4

    embs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_embeddings(spark, SF_SMALL).collect()
        if r.vec_id in src
    }
    want = set()
    for d, vd in embs.items():
        if src[d] == "src0":
            continue
        for b, vb in embs.items():
            if src[b] != "src0":
                continue
            denom = np.linalg.norm(vd) * np.linalg.norm(vb)
            if denom and round(vd @ vb / denom, 6) >= 0.4:
                want.add((d, b))
    assert {(r.doc_id, r.bench_id) for r in got} == want


def test_curation_reasons_consistent_with_curate_corpus(spark):
    """The reasons report's admitted set IS the curate_corpus
    survivor set, splits agree, and every flag is 0/1 with NULL split
    exactly on the rejected rows."""
    from ydb_vector_search_simple_api_spark.operators.curation import (
        curate_corpus,
        curation_reasons,
    )
    from conftest import SF_SMALL

    reasons = curation_reasons(spark, SF_SMALL).collect()
    survivors = {
        r.doc_id: r.split for r in curate_corpus(spark, SF_SMALL).collect()
    }
    admitted = {r.doc_id: r.split for r in reasons if r.admitted == 1}
    assert admitted == survivors
    for r in reasons:
        for f in ("quality_ok", "is_canonical", "is_benchmark",
                  "contaminated", "admitted"):
            assert getattr(r, f) in (0, 1)
        assert (r.split is None) == (r.admitted == 0)


def test_expectations_all_pass_on_clean_corpus(spark):
    """The driver testdata satisfies every declared constraint; the
    report carries one row per declaration."""
    from ydb_vector_search_simple_api_spark.operators.expectations import (
        DOCUMENT_CHECKS,
        expectations_report,
    )

    rows = expectations_report(spark, SF_SMALL).collect()
    assert len(rows) == len(DOCUMENT_CHECKS)
    assert {r.check_name for r in rows} == {c[0] for c in DOCUMENT_CHECKS}
    assert all(r.passed for r in rows)


def test_expectations_catch_planted_violations(spark, tmp_path):
    """Null lang, duplicate doc_id, and an out-of-domain lang each
    trip exactly the constraints that watch them."""
    from ydb_vector_search_simple_api_spark.operators import expectations as X

    bad = spark.createDataFrame(
        [(i, "some text here", "en" if i % 2 else None, "src0", 14) for i in range(150)]
        + [(0, "dup id row", "xx", "src1", 99)],  # wrong n_chars too
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = str(tmp_path / "documents.parquet")
    bad.write.parquet(out)
    verdict = {
        r.check_name: r.passed
        for r in X.expectations_report(spark, str(tmp_path)).collect()
    }
    assert not verdict["complete_lang"]
    assert not verdict["unique_doc_id"]
    assert not verdict["lang_in_domain"]
    assert not verdict["consistent_n_chars"]  # the planted 99 vs len 10
    assert verdict["complete_text"] and verdict["nonempty_text"]


def test_expectations_single_scan_plan(spark):
    """All metrics fuse into ONE aggregate over one scan: exactly one
    parquet scan node in the executed plan, and the bounds side is a
    broadcast of a local relation."""
    from ydb_vector_search_simple_api_spark.operators.expectations import (
        expectations_report,
    )

    plan = (
        expectations_report(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


def test_snapshot_diff_classifies_and_roundtrips(spark):
    """Hand-built snapshots: every change class detected, unchanged
    docs absent, token deltas signed correctly."""
    from ydb_vector_search_simple_api_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "s", "a b c"), (2, "s", "same text"), (3, "s", "to be removed")],
        ["doc_id", "source", "text"],
    )
    new = spark.createDataFrame(
        [(1, "s", "a b c d e"), (2, "s", "same text"), (4, "s", "brand new doc")],
        ["doc_id", "source", "text"],
    )
    got = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    assert set(got) == {1, 3, 4}
    assert got[1].change == "changed" and got[1].token_delta == 2
    assert got[3].change == "removed" and got[3].token_delta == -3
    assert got[4].change == "added" and got[4].token_delta == 3


def test_snapshot_versions_deterministic_fracs(spark):
    """The synthetic snapshot pair is a pure function of doc_id: two
    derivations are identical, and the event fractions land near the
    declared rates."""
    from ydb_vector_search_simple_api_spark.operators.curation import (
        snapshot_diff_documents,
    )

    a = sorted(tuple(r) for r in snapshot_diff_documents(spark, SF_SMALL).collect())
    b = sorted(tuple(r) for r in snapshot_diff_documents(spark, SF_SMALL).collect())
    assert a == b
    by_change = {}
    for _, _, change, _ in a:
        by_change[change] = by_change.get(change, 0) + 1
    # 500-doc corpus, fracs 0.10/0.05/0.20 -> wide sanity windows
    assert 20 <= by_change["added"] <= 90
    assert 10 <= by_change["removed"] <= 60
    assert 50 <= by_change["changed"] <= 160


def test_expectations_events_all_pass(spark):
    from ydb_vector_search_simple_api_spark.operators.expectations import (
        EVENT_CHECKS,
        expectations_report_events,
    )

    rows = expectations_report_events(spark, SF_SMALL).collect()
    assert len(rows) == len(EVENT_CHECKS)
    assert all(r.passed for r in rows)


def test_expectations_embeddings_all_pass_and_catch_planted(spark, tmp_path):
    """The shipped suite passes on the real table; a planted bad table
    (wrong dim, NaN component, zero vector, dup id) fails exactly the
    matching checks."""
    from ydb_vector_search_simple_api_spark.operators.expectations import (
        expectations_report_embeddings,
    )

    rows = expectations_report_embeddings(spark, SF_SMALL).collect()
    assert rows and all(r.passed for r in rows)

    bad = [(i, [0.1] * 64) for i in range(120)]
    bad[0] = (0, [0.1] * 63)                     # wrong dim
    bad[1] = (1, [float("nan")] + [0.1] * 63)    # NaN component
    bad[2] = (2, [0.0] * 64)                     # zero vector
    bad[3] = (3, [0.1] * 64)
    bad.append((3, [0.2] * 64))                  # duplicate vec_id
    spark.createDataFrame(bad, ["vec_id", "embedding"]).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        r.check_name: r.passed
        for r in expectations_report_embeddings(spark, str(tmp_path)).collect()
    }
    assert not got["dim_consistent"]
    assert not got["finite_components"]
    assert not got["norm_nonzero"]
    assert not got["unique_vec_id"]
    assert got["complete_vec_id"]


def test_dedup_cluster_sizes_consistency(spark):
    """Histogram folds back to the component table exactly."""
    from ydb_vector_search_simple_api_spark.operators.curation import (
        dedup_cluster_sizes,
        dedup_components,
    )

    comp = dedup_components(spark, SF_SMALL).collect()
    from collections import Counter

    sizes = Counter(Counter(r.component_id for r in comp).values())
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in dedup_cluster_sizes(spark, SF_SMALL).collect()
    }
    assert got == {s: (n, n * s) for s, n in sizes.items()}
    assert all(s >= 2 for s in got)  # singletons never enter the graph


def test_curation_funnel_matches_curate_corpus(spark):
    """The funnel's final stage IS curate_corpus's admitted set:
    stage-4 doc count == curate_corpus row count; counts are
    monotonically non-increasing; retention fractions reconstruct
    from the counts."""
    rows = {
        r.stage_idx: r
        for r in curation.curation_funnel(spark, SF_SMALL).collect()
    }
    assert [rows[i].stage for i in range(5)] == [
        "raw", "non_benchmark", "quality", "exact_dedup", "decontaminated",
    ]
    admitted = curation.curate_corpus(spark, SF_SMALL).count()
    assert rows[4].n_docs == admitted
    for i in range(1, 5):
        assert rows[i].n_docs <= rows[i - 1].n_docs
        assert rows[i].n_tokens <= rows[i - 1].n_tokens
    # Spark's F.round is HALF_UP over the shortest decimal repr —
    # Python's round is half-even over the exact binary double, so
    # reconstruct with Decimal to stay robust at half-boundary ratios
    from decimal import ROUND_HALF_UP, Decimal

    def spark_round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    for i in range(5):
        assert rows[i].doc_retention == spark_round6(
            rows[i].n_docs / rows[0].n_docs
        )
        assert rows[i].token_retention == spark_round6(
            rows[i].n_tokens / rows[0].n_tokens
        )
    assert rows[0].n_docs > rows[4].n_docs  # the funnel actually funnels


def test_decontamination_sweep_monotone(spark):
    """Sweep sanity: at fixed n, lowering the containment threshold
    can only flag MORE pairs; at fixed threshold, raising n can only
    flag FEWER (an n+1-gram match implies n-gram matches); every row
    agrees with a direct decontaminate run."""
    rows = {
        (r.n, r.min_containment): r
        for r in curation.decontamination_sweep(spark, SF_MED).collect()
    }
    assert (8, 0.1) in rows and (8, 0.3) in rows
    assert rows[(8, 0.1)].n_flagged_pairs >= rows[(8, 0.3)].n_flagged_pairs
    assert rows[(5, 0.3)].n_flagged_pairs >= rows[(8, 0.3)].n_flagged_pairs
    direct = curation.decontaminate_documents(spark, SF_MED, n=8,
                                              min_containment=0.3)
    assert rows[(8, 0.3)].n_flagged_pairs == direct.count()
    assert rows[(8, 0.3)].n_flagged_docs == (
        direct.select("doc_id").distinct().count()
    )


def test_production_funnel_matches_production_admitted(spark):
    """The production funnel's final stage IS
    curate_corpus_production's admitted set (counts equal), stages
    are monotone, and the two quality filters are separately visible
    (the c4 and perplexity stages differ on this corpus)."""
    from ydb_vector_search_simple_api_spark.operators import pipeline

    rows = {
        r.stage_idx: r
        for r in curation.production_funnel(spark, SF_MED).collect()
    }
    assert [rows[i].stage for i in range(6)] == [
        "raw", "non_benchmark", "c4", "perplexity", "exact_dedup",
        "decontaminated",
    ]
    admitted = (
        pipeline.curate_corpus_production(spark, SF_MED)
        .filter("admitted")
        .count()
    )
    assert rows[5].n_docs == admitted
    for i in range(1, 6):
        assert rows[i].n_docs <= rows[i - 1].n_docs
    assert rows[3].n_docs < rows[2].n_docs  # KN5 tiles genuinely cut
