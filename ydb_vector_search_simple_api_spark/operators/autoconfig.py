"""ANN index auto-configuration: turn the measured recall curves into
a recommendation.

The repo ships six index layouts (IVF, two-level tree, PQ/OPQ/IVFADC,
SQ8, BQ, graph-ANN) with measured recall/latency curves (SCALING.md),
but a user must pick layout and serving width by hand. This operator
is the missing "which index do I build?" step: it reads the corpus's
own statistics (n, d, label entropy), MEASURES the recall curve of the
pruned IVF serving path against exact search on the corpus itself
(batch-shaped — the ann_recall_report machinery), and emits one
recommendation row per target recall.

The layout rules codify SCALING.md's measured crossovers rather than
guessing:

- tiny corpora (n < ``exact_cutoff``) at FULL recall target:
  brute-force exact — every blocked method's fixed overhead loses
  below ~10⁵ rows (measured for banding at ~100k images; the IVF
  routing join shows the same fixed-cost floor at gate scale). At
  partial targets even a tiny corpus gets the measured-curve
  selection: the caller asked for a pruned serving path, and the
  curves are what justify one.
- recall target 1.0: IVF at FULL width — identical results to exact
  with partition pruning still available for filtered serving.
- d ≥ ``pq_dim_cutoff`` and target ≤ 0.95: IVF×OPQ — at high
  dimension the ADC scan is memory-bound, codes cut bytes/vector ~16×
  (SCALING.md PQ rows), and the rerank stage restores precision.
- otherwise: the measured layout curves compete — each layout's
  MINIMUM sufficient knob is scored by probe fraction (knob /
  exact-endpoint knob, the share of the corpus the pass touches) and
  the smallest fraction wins, ties to flat IVF. Knob cost is linear
  in probe fraction for every layout here, so the smallest sufficient
  fraction is the latency-optimal point on the measured curves.

Everything is deterministic (fixed query set, fixed seed index, fixed
thresholds), so the recommendation is replay-pinned in pytest; the
recall numbers come from the same semi-join count the recall report
uses, not from a formula.

Reference note: the reference engine (app.py) exposes a single YDB
index type with a ``search_top_size`` knob and no guidance; extension
scope (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import index as ivf
from .search import knn_join
from ..sources.store import load_embeddings

#: rule thresholds — codified SCALING.md crossovers, pinned in pytest
EXACT_CUTOFF = 100_000
PQ_DIM_CUTOFF = 256


def ann_autoconfig(
    spark: SparkSession,
    sf_dir: str,
    idx: "ivf.IvfIndex",
    tree_idx=None,
    bq_idx=None,
    targets: tuple[float, ...] = (0.8, 0.9, 0.95, 1.0),
    k: int = 10,
    n_queries: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """One recommendation row per target recall:
    (target_recall, layout, n_clusters, width, measured_recall,
    est_bytes_per_vec, rationale).

    When the tree/BQ indexes are supplied, the recommendation selects
    ACROSS the measured layout curves (:func:`ann_layout_curves`): for
    each partial target, every (layout, knob) point that clears it
    competes on PROBE FRACTION — knob / exact-endpoint-knob, the
    fraction of the corpus the serving pass touches (width/n_clusters
    for the partitioned layouts, shortlist/n_rows for the sign-bit
    scan) — and the smallest fraction wins (ties prefer ivf_flat, the
    simplest layout). With only the IVF index, the selection reduces
    to the original min-sufficient-width rule.

    Plan shape: ONE exact kNN join + one batch pruned join per
    measured (layout, knob) point; the stats pass is two aggregates.
    Nothing corpus-sized reaches the driver; output is |targets| rows.
    """
    embs = load_embeddings(spark, sf_dir)
    stats = embs.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("embedding")).alias("d"),
        F.countDistinct("label").alias("n_labels"),
    ).first()
    n, d = int(stats["n"]), int(stats["d"])

    curve_rows = ann_layout_curves(
        spark, sf_dir, idx, tree_idx, bq_idx,
        k=k, n_queries=n_queries, round_digits=round_digits,
    ).collect()
    full_knob = {"ivf_flat": int(idx.n_clusters)}
    if tree_idx is not None:
        full_knob["kmeans_tree"] = max(tree_idx.n_l1, tree_idx.n_leaves)
    if bq_idx is not None:
        full_knob["bq_hamming"] = int(bq_idx.n_rows)
    #: candidate points with their probe fraction
    points = [
        (r.layout, int(r.width), float(r.recall),
         int(r.width) / float(full_knob[r.layout]))
        for r in curve_rows
    ]

    def full_for(layout: str) -> int:
        return full_knob[layout]

    rows = []
    for target in targets:
        if n < EXACT_CUTOFF and target >= 1.0:
            # below the measured blocked-method crossover the exact
            # scan wins outright at full recall
            rows.append(
                (
                    float(target), "brute_force_exact", 0, 0,
                    1.0, 4 * d,
                    f"n={n} < {EXACT_CUTOFF}: exact scan beats any "
                    "blocked layout's fixed overhead (SCALING.md "
                    "crossover) and recall must be 1.0",
                )
            )
            continue
        if target >= 1.0:
            rows.append(
                (
                    float(target), "ivf_flat", int(idx.n_clusters),
                    int(idx.n_clusters),
                    max(rc for lo, w, rc, f in points if lo == "ivf_flat"),
                    4 * d,
                    "full width == exact with partition pruning kept "
                    "for filtered serving",
                )
            )
            continue
        # smallest sufficient knob per layout, then min probe fraction
        per_layout = {}
        for lo, w, rc, frac in sorted(points, key=lambda p: p[1]):
            if rc >= target and lo not in per_layout:
                per_layout[lo] = (w, rc, frac)
        if not per_layout:
            lo, w, rc, frac = max(points, key=lambda p: p[2])
            per_layout = {lo: (w, rc, frac)}
        best_layout = min(
            per_layout,
            key=lambda lo: (per_layout[lo][2], lo != "ivf_flat"),
        )
        w, rc, frac = per_layout[best_layout]
        # the OPQ rewrite rides the IVF routing path, so it only
        # applies when ivf_flat itself cleared the target — never
        # borrow another layout's width/recall under the opq label
        if d >= PQ_DIM_CUTOFF and target <= 0.95 and "ivf_flat" in per_layout:
            w_f, rc_f, _ = per_layout["ivf_flat"]
            rows.append(
                (
                    float(target), "ivf_opq", int(idx.n_clusters),
                    int(w_f), rc_f,
                    max(8, d // 16),
                    f"d={d} >= {PQ_DIM_CUTOFF}: ADC scan is memory-"
                    "bound, OPQ codes cut bytes/vec ~16x with rerank "
                    "(SCALING.md PQ rows)",
                )
            )
        else:
            rows.append(
                (
                    float(target), best_layout, full_for(best_layout),
                    int(w), rc,
                    8 if best_layout == "bq_hamming" else 4 * d,
                    f"min probe fraction {round(frac, 4)} among layouts "
                    f"clearing recall >= {target} (measured curves)",
                )
            )
    return spark.createDataFrame(
        rows,
        "target_recall double, layout string, n_clusters int, "
        "width int, measured_recall double, est_bytes_per_vec int, "
        "rationale string",
    ).orderBy("target_recall")


def ann_layout_curves(
    spark: SparkSession,
    sf_dir: str,
    ivf_idx,
    tree_idx,
    bq_idx=None,
    k: int = 10,
    n_queries: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """The measured recall-curve artifact :func:`ann_autoconfig` reads,
    as data: one row per (layout, knob) over the batch-served
    layouts — flat IVF and the two-level k-means tree (width knob),
    plus the sign-bit BQ layout (Hamming-shortlist knob, served
    through the batch ``bq_knn_join``) when its index is supplied —
    against the same exact ground truth. Knob values are powers of
    two up to each layout's exact endpoint (full width / corpus-sized
    shortlist == exact, so every curve provably ends at 1.0 —
    pinned). The ``width`` column carries each layout's serving knob.

    Plan shape: ONE exact kNN join + one batch pruned join per
    (layout, width) — every serving pass is the distributed join form
    (no per-query driver loops); recall is a semi-join count. The
    BQ-shortlist and graph-ANN-beam curves are knob-monotone by the
    shared O3 contract and recall-pinned in their own test files;
    their serving forms are per-query, so they stay out of this
    batch-shaped report.

    Output: (layout, width, recall), sorted.
    """
    from .tree import tree_knn_join_distributed

    embs = load_embeddings(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = embs.select(F.col("vec_id").alias("id"), "embedding")
    exact = (
        knn_join(
            spark, queries_df, corpus, k=k, strategy="CosineSimilarity",
            round_digits=round_digits,
        )
        .select("query_id", "id")
        .localCheckpoint(eager=True)
    )
    denom = float(k * n_queries)

    def widths_up_to(full: int) -> list[int]:
        ws, w = [], 1
        while w < full:
            ws.append(w)
            w *= 2
        ws.append(int(full))
        return ws

    rows = []
    for width in widths_up_to(ivf_idx.n_clusters):
        got = ivf.ivf_knn_join(
            spark, ivf_idx, queries_df, k=k, strategy="CosineSimilarity",
            search_top_size=width, round_digits=round_digits,
        ).select("query_id", "id")
        rows.append(
            ("ivf_flat", int(width),
             round(got.join(exact, ["query_id", "id"], "left_semi").count()
                   / denom, 6))
        )
    # the tree's width knob caps BOTH levels; level 2 counts leaves
    # GLOBALLY (the route contract), so the exact endpoint is
    # n_leaves, not the per-cell fanout
    for width in ([] if tree_idx is None
                  else widths_up_to(max(tree_idx.n_l1, tree_idx.n_leaves))):
        got = tree_knn_join_distributed(
            spark, tree_idx, queries_df, k=k, strategy="CosineSimilarity",
            search_top_size=width, round_digits=round_digits,
        ).select("query_id", "id")
        rows.append(
            ("kmeans_tree", int(width),
             round(got.join(exact, ["query_id", "id"], "left_semi").count()
                   / denom, 6))
        )
    if bq_idx is not None:
        from .bq import bq_knn_join

        shorts, v = [], k
        while v < bq_idx.n_rows:
            shorts.append(v)
            v *= 4
        shorts.append(int(bq_idx.n_rows))
        for shortlist in shorts:
            got = bq_knn_join(
                spark, bq_idx, corpus, queries_df, k=k,
                strategy="CosineSimilarity", shortlist=shortlist,
                round_digits=round_digits,
            ).select("query_id", "id")
            rows.append(
                ("bq_hamming", int(shortlist),
                 round(got.join(exact, ["query_id", "id"], "left_semi")
                       .count() / denom, 6))
            )
    return spark.createDataFrame(
        rows, "layout string, width int, recall double"
    ).orderBy("layout", "width")
