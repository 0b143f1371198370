"""DuckDB oracle twins for :mod:`operators.curation`.

Same portability contract as every other oracle module: md5 for
hashing, ``ROUND(x, 6) + 0.0`` for floats, ``::BIGINT`` on integer
sums (the HUGEINT->float64 pandas trap), ``floor(x + 0.5)`` for
half-up rounding (built-in round() half-even behavior differs between
engines).
"""

from __future__ import annotations

from .oracles import knn_join_sql
from .oracles_text import TOKS, _shingles
from .operators.sampling import _threshold_hex


def decontaminate_sql(n: int = 8, min_containment: float = 0.3) -> str:
    return f"""
WITH toks AS (SELECT doc_id, source, {TOKS} AS t FROM documents),
bsh AS (
  SELECT doc_id AS bench_id, unnest(list_distinct({_shingles(n)})) AS shingle
  FROM toks WHERE source = 'src0'
),
bsz AS (SELECT bench_id, count(*) AS n_bench_sh FROM bsh GROUP BY 1),
tsh AS (
  SELECT doc_id, unnest(list_distinct({_shingles(n)})) AS shingle
  FROM toks WHERE source <> 'src0'
),
common AS (
  SELECT t.doc_id AS doc_id, b.bench_id AS bench_id, count(*) AS n_common
  FROM tsh t JOIN bsh b USING (shingle)
  GROUP BY 1, 2
)
SELECT doc_id, bench_id, n_common::BIGINT AS n_common,
       ROUND(n_common::DOUBLE / n_bench_sh::DOUBLE, 6) + 0.0 AS containment
FROM common JOIN bsz USING (bench_id)
WHERE ROUND(n_common::DOUBLE / n_bench_sh::DOUBLE, 6) + 0.0 >= {min_containment}
"""


def pack_chunks_sql(chunk_sql: str, budget: int = 256) -> str:
    """``chunk_sql`` is the chunk_documents oracle (must expose
    doc_id, chunk_id, n_chunk_tokens)."""
    return f"""
WITH c AS ({chunk_sql}),
b AS (
  SELECT doc_id, chunk_id, n_chunk_tokens,
         (sum(n_chunk_tokens) OVER (
            PARTITION BY doc_id ORDER BY chunk_id
          ) - n_chunk_tokens)::BIGINT AS before
  FROM c
)
SELECT doc_id,
       floor(before::DOUBLE / {budget})::BIGINT AS bin_id,
       count(*)::BIGINT AS n_chunks,
       sum(n_chunk_tokens)::BIGINT AS n_bin_tokens
FROM b GROUP BY 1, 2
"""


def stratified_sample_stats_sql(
    rates: dict[str, float], default_rate: float = 1.0
) -> str:
    arms = " ".join(
        f"WHEN lang = '{lang}' THEN substr(md5(doc_id::VARCHAR), 1, 6) "
        f"< '{_threshold_hex(rate)}'"
        for lang, rate in sorted(rates.items())
    )
    keep = (
        f"CASE {arms} ELSE substr(md5(doc_id::VARCHAR), 1, 6) "
        f"< '{_threshold_hex(default_rate)}' END"
    )
    return f"""
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN {keep} THEN 1 ELSE 0 END)::BIGINT AS n_sampled
FROM documents GROUP BY lang
"""


def repetition_signals_sql(n: int = 3) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
m AS (
  SELECT doc_id, max(c) AS max_cnt, sum(c)::BIGINT AS n_tokens
  FROM cnt GROUP BY 1
),
g AS (
  SELECT doc_id, len(sh)::BIGINT AS n_sh,
         len(list_distinct(sh))::BIGINT AS n_sh_distinct
  FROM (SELECT doc_id, {_shingles(n)} AS sh FROM toks)
)
SELECT m.doc_id AS doc_id, n_tokens,
       ROUND(max_cnt::DOUBLE / n_tokens::DOUBLE, 6) + 0.0 AS top_token_frac,
       CASE WHEN n_sh <= 0 THEN 0.0
            ELSE ROUND(1 - n_sh_distinct::DOUBLE / n_sh::DOUBLE, 6) + 0.0
       END AS dup_ngram_frac
FROM m JOIN g ON m.doc_id = g.doc_id
"""


QUANTIZE = """
WITH m AS (
  SELECT vec_id, embedding AS v,
         list_max(list_transform(embedding, x -> abs(x))) AS maxabs
  FROM embeddings
)
SELECT vec_id,
       len(v) AS dim,
       ROUND(maxabs, 6) + 0.0 AS qscale,
       md5(array_to_string(
         CASE WHEN maxabs = 0
              THEN list_transform(v, x -> 0::BIGINT)
              ELSE list_transform(v, x -> floor(x * 127 / maxabs + 0.5)::BIGINT)
         END, ',')) AS codes_md5
FROM m
"""


def dedup_components_sql(jaccard_pairs_sql: str) -> str:
    """Recursive-CTE twin of ``connected_components`` over the
    n-gram-Jaccard pair graph: transitive closure with UNION
    (set-semantics, so it terminates), then min reachable id.
    Symmetric edges put (src, src) into the closure, but
    least(src, min(dst)) is safe either way."""
    return f"""
WITH RECURSIVE p AS ({jaccard_pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b AS src, id_a AS dst FROM p
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, least(src, min(dst)) AS component_id
FROM reach GROUP BY src
"""


def source_token_budget_sql(budget: int = 20000) -> str:
    return f"""
WITH d AS (SELECT source, doc_id, len({TOKS}) AS n_tok FROM documents),
b AS (
  SELECT source, n_tok,
         (sum(n_tok) OVER (
            PARTITION BY source ORDER BY doc_id
          ) - n_tok)::BIGINT AS before
  FROM d
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN before < {budget} THEN 1 ELSE 0 END)::BIGINT AS n_admitted,
       sum(CASE WHEN before < {budget} THEN n_tok ELSE 0 END)::BIGINT
         AS n_admitted_tokens
FROM b GROUP BY source
"""


def knn_classify_sql(k: int = 10, n_queries: int = 8) -> str:
    return f"""
WITH nn AS ({knn_join_sql("CosineSimilarity", k + 1, n_queries)}),
flt AS (SELECT query_id, id FROM nn WHERE query_id <> id),
v AS (
  SELECT query_id, e.label AS label, count(*) AS votes
  FROM flt JOIN embeddings e ON e.vec_id = flt.id
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, label, votes,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY votes DESC, label ASC
         ) AS rk
  FROM v
)
SELECT query_id, label AS pred_label, votes::BIGINT AS votes
FROM r WHERE rk = 1
"""


def pii_redaction_sql() -> str:
    """Twin of :func:`operators.curation.pii_redaction`: identical
    footer construction, then the same ordered regex passes (patterns
    imported from PII_PASSES — single source of truth). DuckDB's
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all; counts via len(regexp_extract_all)."""
    from .operators.curation import PII_PASSES

    footer = (
        "' Contact user' || CAST(doc_id AS VARCHAR) || '@example.org via "
        "http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p' || "
        "CAST(doc_id AS VARCHAR) || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) "
        "|| '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || "
        "CAST((doc_id * 13) % 256 AS VARCHAR) || CASE WHEN doc_id % 3 = 0 THEN "
        "' or +1 555 ' || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0') "
        "ELSE '' END"
    )
    ctes = [f"aug AS (SELECT doc_id, text || {footer} AS t FROM documents)"]
    prev = "aug"
    carried: list[str] = []
    for i, (cnt_col, pat, token) in enumerate(PII_PASSES, start=1):
        cols = ", ".join(carried + [
            f"len(regexp_extract_all(t, '{pat}'))::BIGINT AS {cnt_col}",
            f"regexp_replace(t, '{pat}', '{token}', 'g') AS t",
        ])
        ctes.append(f"p{i} AS (SELECT doc_id, {cols} FROM {prev})")
        prev = f"p{i}"
        carried.append(cnt_col)
    counts = ", ".join(c for c, _, _ in PII_PASSES)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, {counts}, md5(t) AS clean_md5 FROM {prev}"
    )


def curate_corpus_sql(
    min_quality: float = 0.8,
    min_tokens: int = 16,
    n: int = 8,
    min_containment: float = 0.3,
    train: float = 0.8,
    valid: float = 0.1,
) -> str:
    """End-to-end twin of curation.curate_corpus: the same stage SQL
    the individual gate entries use, chained as CTEs."""
    from .oracles_text import quality_filter_sql, DEDUP_EXACT
    from .operators.sampling import splits_sql

    return f"""
WITH quality AS ({quality_filter_sql(min_quality, min_tokens)}),
canon AS ({DEDUP_EXACT}),
contaminated AS (SELECT DISTINCT doc_id FROM ({decontaminate_sql(n, min_containment)})),
splits AS ({splits_sql(train, valid)})
SELECT s.doc_id, s.split
FROM splits s
JOIN quality q ON s.doc_id = q.doc_id
JOIN canon c ON s.doc_id = c.keep_id
JOIN documents d ON d.doc_id = s.doc_id AND d.source <> 'src0'
LEFT JOIN contaminated x ON s.doc_id = x.doc_id
WHERE x.doc_id IS NULL
"""


def curated_pack_sql(chunk_sql: str, budget: int = 256) -> str:
    """Twin of curation.curated_pack: the pack CTE joined to the
    curated survivor set (bin ids are per-document, so document
    filtering commutes with packing)."""
    return f"""
WITH packed AS ({pack_chunks_sql(chunk_sql, budget)}),
curated AS ({curate_corpus_sql()})
SELECT p.* FROM packed p JOIN curated c ON p.doc_id = c.doc_id
"""


def mixture_resample_sql(weights: dict[str, int] | None = None) -> str:
    """Twin of :func:`operators.curation.mixture_resample` — the same
    exact-integer admission rule; the md5 draw decodes to an int via
    list_transform/list_reduce (DuckDB has no hex-to-int cast)."""
    from .oracles_text import TOKS
    from .operators.curation import MIX_WEIGHTS

    w = weights or MIX_WEIGHTS
    vals = ", ".join(f"('{s}', {int(v)})" for s, v in sorted(w.items()))
    return f"""
WITH wt(source, w) AS (VALUES {vals}),
d AS (
  SELECT doc.source, doc.doc_id, len({TOKS})::BIGINT AS n_tok, wt.w
  FROM documents doc JOIN wt ON doc.source = wt.source
),
tok AS (
  SELECT source, w, sum(n_tok)::BIGINT AS tok_s, count(*)::BIGINT AS n_docs
  FROM d GROUP BY source, w
),
nf AS (SELECT min((100 * tok_s) // w)::BIGINT AS n_total FROM tok),
adm AS (
  SELECT d.source, d.n_tok,
    CASE WHEN
      list_reduce(
        list_transform(generate_series(1, 6),
          i -> strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), i, 1)) - 1),
        (acc, dig) -> acc * 16 + dig)::BIGINT * 100 * t.tok_s
      < d.w::BIGINT * nf.n_total * {16**6}
    THEN 1 ELSE 0 END AS admit
  FROM d JOIN tok t ON d.source = t.source CROSS JOIN nf
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS tokens_in,
       sum(admit)::BIGINT AS n_admitted,
       sum(admit * n_tok)::BIGINT AS tokens_admitted
FROM adm GROUP BY source ORDER BY source
"""


def hard_negatives_sql(k: int = 5, n_queries: int = 8) -> str:
    """Twin of curation.hard_negatives (cosine): label-mismatch filter
    before the ranked window, same score formulation as knn_join_sql."""
    from .oracles import score_sql

    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
  FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, e.vec_id AS id,
         ROUND({score_sql("CosineSimilarity")}, 6) + 0.0 AS score
  FROM embeddings e, q
  WHERE e.label <> q.qlabel
),
ranked AS (
  SELECT query_id, id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC NULLS LAST, id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, id, score, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def cdc_merge_sql(frac: float = 0.2, marker: str = " [rev2]") -> str:
    """Twin of curation.cdc_merge_snapshot."""
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    thr = _threshold_hex(frac)
    draw = f"substr(md5(CAST(doc_id AS VARCHAR)), 1, {PREFIX_HEX})"
    return f"""
WITH merged AS (
  SELECT doc_id, text, 1 AS version FROM documents
  UNION ALL
  SELECT doc_id, text || '{marker}' AS text, 2 AS version
  FROM documents WHERE {draw} < '{thr}'
)
SELECT doc_id, max(version)::BIGINT AS version,
       arg_max(md5(text), version) AS text_md5
FROM merged GROUP BY doc_id
"""


def dataset_card_sql() -> str:
    from .oracles_text import NORM, TOKS, quality_filter_sql  # noqa: F401

    # quality for ALL docs (no filter): reuse the quality expression
    # shape from quality_filter_sql's CTE inline
    from .oracles_text import LANG_STOPWORDS, _stop_count

    return f"""
WITH toks AS (SELECT doc_id, text, lang, source, {TOKS} AS t FROM documents),
m AS (
  SELECT doc_id, lang, source, len(t)::BIGINT AS n_tok,
         ROUND((len(list_distinct(t))::DOUBLE / len(t)::DOUBLE
                + (CASE WHEN len(t)::DOUBLE >= 32.0 THEN 1.0 ELSE len(t)::DOUBLE / 32.0 END)
                + (CASE WHEN {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE > 0.5
                        THEN 0.0
                        ELSE 1.0 - {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE END)
               ) / 3.0, 6) + 0.0 AS q
  FROM toks
),
h AS (SELECT count(DISTINCT md5({NORM})) AS n_distinct FROM documents)
SELECT count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS n_tokens,
       count(DISTINCT lang)::BIGINT AS n_langs,
       count(DISTINCT source)::BIGINT AS n_sources,
       ROUND(1.0 - h.n_distinct::DOUBLE / count(*)::DOUBLE, 6) + 0.0 AS dup_rate,
       ROUND(CAST(sum(q::DECIMAL(18,6)) AS DOUBLE) / count(*)::DOUBLE, 6) + 0.0 AS mean_quality
FROM m CROSS JOIN h
GROUP BY h.n_distinct
"""


def contrastive_pairs_sql(shift: int = 7919) -> str:
    from .oracles_text import chunk_documents_sql

    return f"""
WITH chunks AS (
  SELECT doc_id, chunk_id FROM ({chunk_documents_sql()})
),
ranked AS (
  SELECT doc_id, chunk_id,
         ROW_NUMBER() OVER (ORDER BY doc_id, chunk_id) AS rn
  FROM chunks
),
total AS (SELECT count(*)::BIGINT AS n FROM ranked),
anchors AS (
  SELECT a.doc_id, a.chunk_id, p.chunk_id AS pos_chunk_id, a.rn
  FROM ranked a
  JOIN ranked p ON p.doc_id = a.doc_id AND p.chunk_id = a.chunk_id + 1
)
SELECT a.doc_id, a.chunk_id, a.pos_chunk_id,
       n2.doc_id AS neg_doc_id, n2.chunk_id AS neg_chunk_id,
       (n2.doc_id = a.doc_id) AS neg_same_doc
FROM anchors a
CROSS JOIN total t
JOIN ranked n2 ON n2.rn = ((a.rn - 1 + {shift}) % t.n) + 1
"""


def export_manifest_sql() -> str:
    from .oracles_text import TOKS
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    t1, t2 = _threshold_hex(0.8), _threshold_hex(0.9)
    draw = f"substr(md5(CAST(doc_id AS VARCHAR)), 1, {PREFIX_HEX})"
    return f"""
SELECT CASE WHEN {draw} < '{t1}' THEN 'train'
            WHEN {draw} < '{t2}' THEN 'valid'
            ELSE 'test' END AS split,
       source,
       count(*)::BIGINT AS n_docs,
       sum(len({TOKS}))::BIGINT AS n_tokens
FROM documents
GROUP BY 1, 2
"""


def quality_vs_dup_rate_sql() -> str:
    from .oracles_text import LANG_STOPWORDS, NORM, TOKS, _stop_count

    q_expr = f"""ROUND((len(list_distinct(t))::DOUBLE / len(t)::DOUBLE
        + (CASE WHEN len(t)::DOUBLE >= 32.0 THEN 1.0 ELSE len(t)::DOUBLE / 32.0 END)
        + (CASE WHEN {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE > 0.5
                THEN 0.0
                ELSE 1.0 - {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE END)
       ) / 3.0, 6) + 0.0"""
    return f"""
WITH toks AS (SELECT doc_id, text, {TOKS} AS t FROM documents),
per_doc AS (
  SELECT doc_id,
         least(floor(({q_expr}) * 10)::INT, 9) AS q_bucket,
         md5({NORM}) AS h
  FROM toks
),
counts AS (SELECT h, count(*)::BIGINT AS n_copies FROM per_doc GROUP BY h)
SELECT q_bucket, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dups,
       ROUND(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) + 0.0 AS dup_rate
FROM per_doc JOIN counts USING (h)
GROUP BY q_bucket
"""


def leakage_safe_splits_sql(
    jaccard_pairs_sql: str, train: float = 0.8, valid: float = 0.1
) -> str:
    """Recursive-closure components + component-keyed hash split —
    the twin of ``curation.leakage_safe_splits``."""
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    t1, t2 = _threshold_hex(train), _threshold_hex(train + valid)
    comp = dedup_components_sql(jaccard_pairs_sql)
    return f"""
WITH comp AS ({comp}),
alldocs AS (
  SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS component_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT doc_id, component_id,
       CASE WHEN substr(md5(CAST(component_id AS VARCHAR)), 1, {PREFIX_HEX}) < '{t1}'
              THEN 'train'
            WHEN substr(md5(CAST(component_id AS VARCHAR)), 1, {PREFIX_HEX}) < '{t2}'
              THEN 'valid'
            ELSE 'test' END AS split
FROM alldocs
"""


def semantic_dedup_sql(cosine_pairs_sql: str) -> str:
    """Components of the cosine near-dup graph + min-id election, the
    twin of ``curation.semantic_dedup`` (pairs SQL keys on vec_id)."""
    comp = dedup_components_sql(cosine_pairs_sql)
    return f"""
WITH comp AS ({comp}),
allv AS (
  SELECT e.vec_id, COALESCE(c.component_id, e.vec_id) AS keep_id
  FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.doc_id
)
SELECT vec_id, keep_id, (vec_id = keep_id) AS keep FROM allv
"""


def split_leakage_audit_sql(
    jaccard_pairs_sql: str, train: float = 0.8, valid: float = 0.1
) -> str:
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    t1, t2 = _threshold_hex(train), _threshold_hex(train + valid)

    def assign(key: str) -> str:
        return f"""CASE WHEN substr(md5(CAST({key} AS VARCHAR)), 1, {PREFIX_HEX}) < '{t1}'
              THEN 'train'
            WHEN substr(md5(CAST({key} AS VARCHAR)), 1, {PREFIX_HEX}) < '{t2}'
              THEN 'valid'
            ELSE 'test' END"""

    comp = dedup_components_sql(jaccard_pairs_sql)
    return f"""
WITH pairs AS ({jaccard_pairs_sql}),
comp AS ({comp}),
perdoc AS (
  SELECT doc_id, {assign("doc_id")} AS split FROM documents
),
safe AS (
  SELECT d.doc_id,
         {assign("COALESCE(c.component_id, d.doc_id)")} AS split
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT 'per_doc_hash' AS policy,
       count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END)::BIGINT
         AS n_cross_split
FROM pairs p
JOIN perdoc a ON p.id_a = a.doc_id
JOIN perdoc b ON p.id_b = b.doc_id
UNION ALL
SELECT 'component_keyed' AS policy,
       count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END)::BIGINT
         AS n_cross_split
FROM pairs p
JOIN safe a ON p.id_a = a.doc_id
JOIN safe b ON p.id_b = b.doc_id
"""


def _hexint(expr: str) -> str:
    """md5 6-hex-prefix -> BIGINT (DuckDB has no hex-to-int cast)."""
    return (
        "list_reduce(list_transform(generate_series(1, 6), "
        f"i -> strpos('0123456789abcdef', substr(md5({expr}), i, 1)) - 1), "
        "(acc, dig) -> acc * 16 + dig)::BIGINT"
    )


def _dsir_weights_cte(n_buckets: int, alpha: float) -> str:
    """Shared CTE chain for the DSIR twins: hashed unigram+bigram
    features -> raw/target bucket counts -> ROUND(ln-ratio, 9) decimal
    λ table -> per-doc exact decimal fold."""
    a = float(alpha)
    ab = a * n_buckets
    return f"""
t AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
uni AS (SELECT doc_id, lang, unnest(toks) AS f FROM t),
pairs AS (
  SELECT doc_id, lang,
         unnest(list_slice(toks, 1, len(toks) - 1)) AS prev,
         unnest(list_slice(toks, 2, len(toks))) AS cur
  FROM t WHERE len(toks) >= 2
),
feats AS (
  SELECT doc_id, lang, f FROM uni
  UNION ALL
  SELECT doc_id, lang, prev || ' ' || cur AS f FROM pairs
),
fb AS (SELECT doc_id, lang, {_hexint('f')} % {n_buckets} AS b FROM feats),
raw AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
tgt AS (SELECT b, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY b),
tot AS (
  SELECT (SELECT sum(cr) FROM raw)::DOUBLE AS tr,
         (SELECT sum(ct) FROM tgt)::DOUBLE AS tt
),
lam AS (
  SELECT raw.b,
         CAST(ROUND(
           ln((COALESCE(tgt.ct, 0)::DOUBLE + {a}) / (tot.tt + {ab}))
           - ln((raw.cr::DOUBLE + {a}) / (tot.tr + {ab})), 9)
         AS DECIMAL(18,9)) AS lam
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
),
tf AS (SELECT doc_id, b, count(*) AS tf FROM fb GROUP BY doc_id, b),
w AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_feats,
         ROUND(CAST(sum(lam * CAST(tf AS DECIMAL(10,0))) AS DOUBLE), 6) + 0.0
           AS logw
  FROM tf JOIN lam USING (b) GROUP BY doc_id
)"""


def dsir_weights_sql(n_buckets: int = 1024, alpha: float = 1.0) -> str:
    """Twin of :func:`operators.dsir.dsir_weights`."""
    return f"""
WITH {_dsir_weights_cte(n_buckets, alpha)}
SELECT doc_id, n_feats, logw FROM w ORDER BY doc_id
"""


def dsir_select_sql(
    k: int = 64, n_buckets: int = 1024, alpha: float = 1.0
) -> str:
    """Twin of :func:`operators.dsir.dsir_select` — Gumbel top-k from
    the md5('dsir:'||doc_id) uniform, ROUND(g, 9) then ROUND(key, 6)."""
    g_draw = _hexint("'dsir:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_dsir_weights_cte(n_buckets, alpha)},
sel AS (
  SELECT doc_id, logw,
         ROUND(logw + ROUND(-ln(-ln(({g_draw}::DOUBLE * 2 + 1) / {float(2 * 16**6)})), 9), 6) + 0.0
           AS sel_key
  FROM w
)
SELECT doc_id, logw, sel_key FROM sel
ORDER BY sel_key DESC, doc_id ASC LIMIT {int(k)}
"""


def semantic_decontaminate_sql(threshold: float = 0.4) -> str:
    """Twin of :func:`operators.curation.semantic_decontaminate` —
    same double math and per-row norm factorization as the cosine
    family (oracles.score_sql semantics)."""
    from .oracles import _dot, _norm

    sim = (
        f"CASE WHEN {_norm('t.va')} * {_norm('b.vb')} = 0 THEN NULL "
        f"ELSE {_dot('t.va', 'b.vb')} / ({_norm('t.va')} * {_norm('b.vb')}) END"
    )
    return f"""
WITH j AS (
  SELECT e.vec_id, d.source, e.embedding
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
b AS (SELECT vec_id AS bench_id, embedding AS vb FROM j WHERE source = 'src0'),
t AS (SELECT vec_id AS doc_id, embedding AS va FROM j WHERE source <> 'src0')
SELECT t.doc_id, b.bench_id, ROUND({sim}, 6) + 0.0 AS cos_sim
FROM t CROSS JOIN b
WHERE ROUND({sim}, 6) + 0.0 >= {threshold}
ORDER BY t.doc_id, b.bench_id
"""


def curation_reasons_sql(
    min_quality: float = 0.8,
    min_tokens: int = 16,
    n: int = 8,
    min_containment: float = 0.3,
    train: float = 0.8,
    valid: float = 0.1,
) -> str:
    """Twin of :func:`operators.curation.curation_reasons` — the
    curate_corpus stage CTEs re-chained as per-doc flags."""
    from .oracles_text import quality_filter_sql, DEDUP_EXACT
    from .operators.sampling import splits_sql

    return f"""
WITH quality AS ({quality_filter_sql(min_quality, min_tokens)}),
canon AS ({DEDUP_EXACT}),
contaminated AS (SELECT DISTINCT doc_id FROM ({decontaminate_sql(n, min_containment)})),
splits AS ({splits_sql(train, valid)}),
flags AS (
  SELECT d.doc_id,
         CASE WHEN q.doc_id IS NULL THEN 0 ELSE 1 END AS quality_ok,
         CASE WHEN c.keep_id IS NULL THEN 0 ELSE 1 END AS is_canonical,
         CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS is_benchmark,
         CASE WHEN x.doc_id IS NULL THEN 0 ELSE 1 END AS contaminated,
         s.split AS split
  FROM documents d
  LEFT JOIN quality q ON d.doc_id = q.doc_id
  LEFT JOIN canon c ON d.doc_id = c.keep_id
  LEFT JOIN contaminated x ON d.doc_id = x.doc_id
  LEFT JOIN splits s ON d.doc_id = s.doc_id
)
SELECT doc_id, quality_ok, is_canonical, is_benchmark, contaminated,
       CASE WHEN quality_ok = 1 AND is_canonical = 1
                 AND is_benchmark = 0 AND contaminated = 0
            THEN 1 ELSE 0 END AS admitted,
       CASE WHEN quality_ok = 1 AND is_canonical = 1
                 AND is_benchmark = 0 AND contaminated = 0
            THEN split END AS split
FROM flags ORDER BY doc_id
"""


def expectations_sql() -> str:
    """Twin of :func:`operators.expectations.expectations_report` —
    the bounds come from the SAME declaration table
    (``expectations.DOCUMENT_CHECKS``), so operator and oracle cannot
    drift apart."""
    from .operators.expectations import DOCUMENT_CHECKS, LANG_DOMAIN

    langs = ", ".join(f"'{v}'" for v in LANG_DOMAIN)

    def frac(cond: str) -> str:
        return (
            f"ROUND(sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::DOUBLE"
            " / count(*)::DOUBLE, 6) + 0.0"
        )

    metric_exprs = {
        "size_min": "count(*)::DOUBLE",
        "complete_text": frac("text IS NOT NULL"),
        "complete_lang": frac("lang IS NOT NULL"),
        "complete_source": frac("source IS NOT NULL"),
        "unique_doc_id": (
            "ROUND(count(DISTINCT doc_id)::DOUBLE / count(*)::DOUBLE, 6) + 0.0"
        ),
        "lang_in_domain": frac(f"lang IN ({langs})"),
        "nonempty_text": frac("length(text) > 0"),
        "consistent_n_chars": frac("n_chars = length(text)"),
        "min_n_chars": "min(n_chars)::DOUBLE",
        "max_n_chars": "max(n_chars)::DOUBLE",
        "mean_n_chars": (
            "ROUND(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6) + 0.0"
        ),
    }
    cols = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in metric_exprs.items()
    )

    def bound(v: float) -> str:
        return "'infinity'::DOUBLE" if v == float("inf") else repr(v)

    arms = "\n  UNION ALL\n  ".join(
        f"SELECT '{name}' AS check_name, {name} AS metric,"
        f" {bound(lo)} AS lo, {bound(hi)} AS hi FROM m"
        for name, lo, hi in DOCUMENT_CHECKS
    )
    return f"""
WITH m AS (
  SELECT {cols}
  FROM documents
),
long AS (
  {arms}
)
SELECT check_name, metric, (metric >= lo AND metric <= hi) AS passed
FROM long
"""


def _snapshot_cte(
    add_frac: float = 0.10, rem_frac: float = 0.05, chg_frac: float = 0.20
) -> str:
    """Twin of ``curation.snapshot_versions`` + the narrow digest
    projections of ``curation.snapshot_diff``."""
    add_t = _threshold_hex(add_frac)
    rem_t = _threshold_hex(rem_frac)
    chg_t = _threshold_hex(chg_frac)
    return f"""
old AS (
  SELECT doc_id, source, md5(text) AS h, len({TOKS})::BIGINT AS n
  FROM documents
  WHERE substring(md5('add|' || doc_id), 1, 6) >= '{add_t}'
),
new AS (
  SELECT doc_id, source,
         md5(CASE WHEN substring(md5('chg|' || doc_id), 1, 6) < '{chg_t}'
                  THEN text || ' [rev2]' ELSE text END) AS h,
         len(string_split_regex(trim(lower(
           CASE WHEN substring(md5('chg|' || doc_id), 1, 6) < '{chg_t}'
                THEN text || ' [rev2]' ELSE text END)), '\\s+'))::BIGINT AS n
  FROM documents
  WHERE substring(md5('rem|' || doc_id), 1, 6) >= '{rem_t}'
),
diff AS (
  SELECT coalesce(o.doc_id, nw.doc_id) AS doc_id,
         coalesce(nw.source, o.source) AS source,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN nw.doc_id IS NULL THEN 'removed'
              WHEN o.h <> nw.h THEN 'changed' END AS change,
         (coalesce(nw.n, 0) - coalesce(o.n, 0))::BIGINT AS token_delta
  FROM old o FULL OUTER JOIN new nw ON o.doc_id = nw.doc_id
)"""


def snapshot_diff_sql() -> str:
    return f"""
WITH {_snapshot_cte()}
SELECT doc_id, source, change, token_delta
FROM diff WHERE change IS NOT NULL
"""


def snapshot_diff_summary_sql() -> str:
    return f"""
WITH {_snapshot_cte()}
SELECT source, change, count(*)::BIGINT AS n_docs,
       sum(token_delta)::BIGINT AS token_delta
FROM diff WHERE change IS NOT NULL
GROUP BY source, change
"""


def expectations_events_sql() -> str:
    """Twin of ``operators.expectations.expectations_report_events``
    (same declaration-table import contract)."""
    from .operators.expectations import EVENT_CHECKS, EVENT_TYPE_DOMAIN

    types = ", ".join(f"'{v}'" for v in EVENT_TYPE_DOMAIN)

    def frac(cond: str) -> str:
        return (
            f"ROUND(sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::DOUBLE"
            " / count(*)::DOUBLE, 6) + 0.0"
        )

    metric_exprs = {
        "size_min": "count(*)::DOUBLE",
        "complete_event_id": frac("event_id IS NOT NULL"),
        "complete_ts": frac("ts IS NOT NULL"),
        "complete_user_id": frac("user_id IS NOT NULL"),
        "complete_event_type": frac("event_type IS NOT NULL"),
        "unique_event_id": (
            "ROUND(count(DISTINCT event_id)::DOUBLE / count(*)::DOUBLE, 6) + 0.0"
        ),
        "type_in_domain": frac(f"event_type IN ({types})"),
        "value_non_negative": frac("value IS NULL OR value >= 0"),
        "mean_value_range": (
            "ROUND(CAST(sum(CAST(ROUND(coalesce(value, 0.0), 9) AS DECIMAL(28,9)))"
            " AS DOUBLE) / count(*)::DOUBLE, 6) + 0.0"
        ),
    }
    cols = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in metric_exprs.items()
    )

    def bound(v: float) -> str:
        return "'infinity'::DOUBLE" if v == float("inf") else repr(v)

    arms = "\n  UNION ALL\n  ".join(
        f"SELECT '{name}' AS check_name, {name} AS metric,"
        f" {bound(lo)} AS lo, {bound(hi)} AS hi FROM m"
        for name, lo, hi in EVENT_CHECKS
    )
    return f"""
WITH m AS (
  SELECT {cols}
  FROM events
),
long AS (
  {arms}
)
SELECT check_name, metric, (metric >= lo AND metric <= hi) AS passed
FROM long
"""


# ------------------------------------------------- domain curation

#: the attach_pii footer (same string pii_redaction_sql builds) — the
#: domain oracle extracts the URL host from it with the same regexp
#: the Spark operator uses, so the URL machinery itself is on trial.
_PII_FOOTER = (
    "' Contact user' || CAST(doc_id AS VARCHAR) || '@example.org via "
    "http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p' || "
    "CAST(doc_id AS VARCHAR) || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) "
    "|| '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || "
    "CAST((doc_id * 13) % 256 AS VARCHAR) || CASE WHEN doc_id % 3 = 0 THEN "
    "' or +1 555 ' || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0') "
    "ELSE '' END"
)

_DOMAIN_CTE = rf"""
aug AS (SELECT doc_id, text, text || {_PII_FOOTER} AS pii_text FROM documents),
d AS (
  SELECT doc_id,
         regexp_extract(pii_text, 'https?://([^/ \t\r\n]+)', 1) AS domain,
         len(string_split_regex(trim(lower(text)), '\s+'))::BIGINT AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS draw
  FROM aug
)"""


def _domain_ledger_cte(doc_cap: int, token_budget: int) -> str:
    """Shared admission-ledger CTE: rank by (md5 draw, doc_id) within
    domain, admit the first ``doc_cap``, running token total."""
    return f"""{_DOMAIN_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY domain ORDER BY draw, doc_id)
            AS draw_rank
  FROM d
),
adm AS (SELECT * FROM ranked WHERE draw_rank <= {doc_cap}),
led AS (
  SELECT domain, doc_id, draw_rank::BIGINT AS draw_rank, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY domain ORDER BY draw_rank))::BIGINT
           AS cum_tokens
  FROM adm
)"""


def domain_caps_sql(doc_cap: int = 40, token_budget: int = 4000) -> str:
    """Twin of :func:`operators.web.domain_caps`."""
    return f"""
WITH {_domain_ledger_cte(doc_cap, token_budget)}
SELECT domain, doc_id, draw_rank, n_tokens, cum_tokens,
       cum_tokens <= {token_budget} AS kept
FROM led ORDER BY domain, draw_rank
"""


def domain_profile_sql(doc_cap: int = 40, token_budget: int = 4000) -> str:
    """Twin of :func:`operators.web.domain_profile`."""
    return f"""
WITH {_domain_ledger_cte(doc_cap, token_budget)},
totals AS (
  SELECT domain, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
  FROM d GROUP BY domain
),
caps AS (
  SELECT domain, count(*)::BIGINT AS n_admitted,
         sum(CASE WHEN cum_tokens <= {token_budget} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         sum(CASE WHEN cum_tokens <= {token_budget} THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens
  FROM led GROUP BY domain
)
SELECT totals.domain AS domain, n_docs, total_tokens,
       coalesce(n_admitted, 0) AS n_admitted,
       coalesce(n_kept, 0) AS n_kept,
       coalesce(kept_tokens, 0) AS kept_tokens
FROM totals LEFT JOIN caps ON totals.domain = caps.domain
ORDER BY domain
"""


def url_canonical_dedup_sql() -> str:
    """Twin of :func:`operators.web.url_canonical_dedup`: identical
    messy-URL augmentation and the same ordered canonicalization
    passes (DuckDB regexp_replace with the 'g' flag where Spark
    replaces all)."""
    url = (
        "'HTTP://Ex' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM:80/p' || "
        "CAST(doc_id % 50 AS VARCHAR) || '/item' || '?id=' || "
        "CAST(doc_id % 50 AS VARCHAR) || "
        "CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed&utm_campaign=x' ELSE '' END || "
        "CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END || "
        "CASE WHEN doc_id % 3 = 0 THEN '#section-2' ELSE '' END"
    )
    canon = (
        "lower(regexp_extract(url, '^([a-zA-Z]+://[^/]*)', 1)) || "
        "url[length(regexp_extract(url, '^([a-zA-Z]+://[^/]*)', 1)) + 1:]"
    )
    for pat, repl in (
        (r"#.*$", ""),
        (r"(utm_[a-z]+|fbclid)=[^&]*&", ""),
        (r"[?&](utm_[a-z]+|fbclid)=[^&]*$", ""),
        (r"\?$", ""),
        (r":80/", "/"),
        (r"/$", ""),
    ):
        canon = f"regexp_replace({canon}, '{pat}', '{repl}', 'g')"
    return f"""
WITH aug AS (SELECT doc_id, {url} AS url FROM documents),
c AS (SELECT doc_id, {canon} AS canon_url FROM aug)
SELECT canon_url, count(*)::BIGINT AS n_docs, min(doc_id) AS first_doc
FROM c GROUP BY canon_url ORDER BY canon_url
"""


def expectations_embeddings_sql() -> str:
    """Twin of expectations.expectations_report_embeddings: bounds
    imported from the same EMBEDDING_CHECKS declaration, double-fold
    norms (list_sum/list_transform — the oracles.py convention),
    per-row ROUND(9) decimal-summed mean."""
    from .operators.expectations import EMBEDDING_CHECKS, EMBEDDING_DIM

    def frac(cond: str) -> str:
        return (
            f"ROUND(sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::DOUBLE"
            " / count(*)::DOUBLE, 6) + 0.0"
        )

    norm = (
        "sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))"
    )
    bad = (
        "len(list_filter(embedding, x -> isnan(x::DOUBLE)"
        " OR isinf(x::DOUBLE))) > 0"
    )
    metric_exprs = {
        "size_min": "count(*)::DOUBLE",
        "complete_vec_id": frac("vec_id IS NOT NULL"),
        "complete_embedding": frac("embedding IS NOT NULL"),
        "unique_vec_id": (
            "ROUND(count(DISTINCT vec_id)::DOUBLE / count(*)::DOUBLE, 6) + 0.0"
        ),
        "dim_consistent": frac(f"len(embedding) = {EMBEDDING_DIM}"),
        "finite_components": frac(f"embedding IS NOT NULL AND NOT ({bad})"),
        "norm_nonzero": frac(
            "len(list_filter(embedding, x -> x::DOUBLE != 0.0)) > 0"
        ),
        "mean_norm_range": (
            f"ROUND(CAST(sum(CAST(ROUND({norm}, 9) AS DECIMAL(28,9)))"
            " AS DOUBLE) / count(*)::DOUBLE, 6) + 0.0"
        ),
    }
    cols = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in metric_exprs.items()
    )

    def bound(v: float) -> str:
        return "'infinity'::DOUBLE" if v == float("inf") else repr(v)

    arms = "\n  UNION ALL\n  ".join(
        f"SELECT '{name}' AS check_name, {name} AS metric,"
        f" {bound(lo)} AS lo, {bound(hi)} AS hi FROM m"
        for name, lo, hi in EMBEDDING_CHECKS
    )
    return f"""
WITH m AS (
  SELECT {cols}
  FROM embeddings
),
long AS (
  {arms}
)
SELECT check_name, metric, (metric >= lo AND metric <= hi) AS passed
FROM long
"""


def dedup_cluster_sizes_sql(jaccard_pairs_sql: str) -> str:
    """Twin of :func:`operators.curation.dedup_cluster_sizes`: the
    components CTE rolled up to a size histogram."""
    comp = dedup_components_sql(jaccard_pairs_sql)
    return f"""
WITH comp AS ({comp}),
sizes AS (
  SELECT component_id, count(*)::BIGINT AS cluster_size
  FROM comp GROUP BY component_id
)
SELECT cluster_size,
       count(*)::BIGINT AS n_clusters,
       (count(*) * cluster_size)::BIGINT AS n_docs
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""


def hamming_banded_pairs_sql(
    max_hamming: int = 10, n_bands: int = 4, max_band_df: int = 2000
) -> str:
    """Twin of :func:`operators.imagededup.hamming_banded_pairs`: the
    SAME banded algorithm in SQL — 60-bit md5-prefix hashes, XOR-7
    planted dups, band explode, hot-bucket anti-join, keyed self-join,
    bit_count(xor) verify."""

    def hex15(expr: str) -> str:
        return (
            "list_reduce(list_transform(generate_series(1, 15), "
            f"i -> strpos('0123456789abcdef', substr(md5({expr}), i, 1)) - 1), "
            "(acc, dig) -> acc * 16 + dig)::BIGINT"
        )

    own = hex15("CAST(doc_id AS VARCHAR)")
    base = hex15("CAST(doc_id - 9 AS VARCHAR)")
    width = 64 // n_bands
    return f"""
WITH hashes AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 9 THEN xor({base}, 7) ELSE {own} END AS dhash
  FROM documents
),
bands AS (SELECT unnest(generate_series(0, {n_bands - 1})) AS band),
e AS (
  SELECT doc_id, dhash, band,
         (dhash >> (band * {width})) & {(1 << width) - 1} AS val
  FROM hashes CROSS JOIN bands
),
hot AS (
  SELECT band, val FROM (
    SELECT band, val, count(*) AS c FROM e GROUP BY band, val
  ) WHERE c > {max_band_df}
),
e2 AS (SELECT e.* FROM e ANTI JOIN hot USING (band, val)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                  l.dhash AS h_a, r.dhash AS h_b
  FROM e2 l JOIN e2 r ON l.band = r.band AND l.val = r.val
                      AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, bit_count(xor(h_a, h_b))::INT AS hamming
FROM cand WHERE bit_count(xor(h_a, h_b)) <= {max_hamming}
ORDER BY id_a, id_b
"""


# ------------------------------------ logistic-regression classifier

def _logreg_cte(n_buckets: int, n_iter: int, lr: int) -> str:
    """Shared CTE chain for the logreg twins: hashed-unigram features,
    then the full-batch GD loop UNROLLED (one margins/probs/grads/w
    CTE quartet per iteration) — mirrors
    ``operators/logreg.train_weights`` exactly. Weights live as BIGINT
    nano-units; the only decimal→float crossing is the explicit
    ``u::DOUBLE / 1e9`` division, the same correctly-rounded quotient
    the Spark side computes. The link is the softsign sigmoid — every
    float op in the loop is an exactly-rounded IEEE primitive."""
    softsign = "0.5 + 0.5 * m / (1 + abs(m))"
    parts = [
        f"""
t AS (SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             doc_id % 5 <> 0 AS is_train,
             {TOKS} AS toks
      FROM documents),
toku AS (SELECT doc_id, y, is_train, unnest(toks) AS tok FROM t),
tf AS (
  SELECT doc_id, y, is_train, {_hexint('tok')} % {n_buckets} AS b,
         count(*) AS tf
  FROM toku GROUP BY 1, 2, 3, 4
),
nn AS (SELECT doc_id, sum(tf) AS n FROM tf GROUP BY 1),
fx AS (
  SELECT tf.doc_id, tf.y, tf.is_train, tf.b,
         tf.tf::DOUBLE / nn.n::DOUBLE AS x
  FROM tf JOIN nn USING (doc_id)
),
fxt AS (SELECT * FROM fx WHERE is_train),
w0 AS (SELECT DISTINCT b, 0::BIGINT AS u FROM fxt)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""
m{i} AS (
  SELECT fx.doc_id, fx.y,
         CAST(SUM(CAST(ROUND((w.u::DOUBLE / 1000000000.0) * fx.x, 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS m
  FROM fxt fx JOIN w{i - 1} w USING (b) GROUP BY 1, 2
),
p{i} AS (SELECT doc_id, y, {softsign} AS p FROM m{i}),
g{i} AS (
  SELECT fx.b,
         SUM(CAST(ROUND((p.p - p.y) * fx.x, 9) AS DECIMAL(28,9))) AS g
  FROM fxt fx JOIN p{i} p USING (doc_id, y) GROUP BY 1
),
w{i} AS (
  -- |g| < #docs, so the DECIMAL(28,9) narrowing is exact (int128
  -- internally, so the ×10^9 shift cannot overflow); the BIGINT cast
  -- is of an integral value — the whole step is exact integer math
  SELECT w.b,
         w.u - {int(lr)} * COALESCE(
             CAST(CAST(g.g AS DECIMAL(28,9)) * 1000000000 AS BIGINT),
             0) AS u
  FROM w{i - 1} w LEFT JOIN g{i} g USING (b)
)"""
        )
    parts.append(
        f"""
sm AS (
  SELECT fx.doc_id, fx.y,
         CAST(SUM(CAST(ROUND(COALESCE(
                 (w.u::DOUBLE / 1000000000.0) * fx.x, 0.0), 9)
               AS DECIMAL(28,9))) AS DOUBLE) AS m
  FROM fx LEFT JOIN w{n_iter} w USING (b) GROUP BY 1, 2
),
scored AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 5 <> 0 THEN 'train' ELSE 'holdout' END
           AS split,
         sm.y::BIGINT AS y,
         ROUND({softsign}, 6) + 0.0 AS score,
         CASE WHEN {softsign} >= 0.5 THEN 1 ELSE 0 END::BIGINT AS y_pred
  FROM documents d JOIN sm ON sm.doc_id = d.doc_id
)"""
    )
    return ",".join(parts)


def logreg_score_sql(
    n_buckets: int = 512, n_iter: int = 4, lr: int = 2
) -> str:
    """Twin of :func:`operators.logreg.logreg_score`."""
    return f"""
WITH {_logreg_cte(n_buckets, n_iter, lr)}
SELECT doc_id, split, y, score, y_pred FROM scored
"""


def logreg_report_sql(
    n_buckets: int = 512, n_iter: int = 4, lr: int = 2
) -> str:
    """Twin of :func:`operators.logreg.logreg_report`."""
    return f"""
WITH {_logreg_cte(n_buckets, n_iter, lr)}
SELECT split, count(*)::BIGINT AS n,
       SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       SUM(CASE WHEN y = 1 AND y_pred = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
       SUM(CASE WHEN y = 0 AND y_pred = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
       SUM(CASE WHEN y = 1 AND y_pred = 0 THEN 1 ELSE 0 END)::BIGINT AS fn,
       SUM(CASE WHEN y = 0 AND y_pred = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
       ROUND(SUM(CASE WHEN y = y_pred THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) + 0.0 AS accuracy
FROM scored GROUP BY 1
"""


def packing_efficiency_sql(
    chunk_sql: str, budgets: tuple[int, ...] = (128, 256, 512)
) -> str:
    """Twin of :func:`operators.curation.packing_efficiency` — the
    pack_chunks CTE aggregated per budget."""
    selects = []
    for budget in budgets:
        selects.append(
            f"""
SELECT {budget}::BIGINT AS budget,
       count(*)::BIGINT AS n_bins,
       sum(n_bin_tokens)::BIGINT AS total_tokens,
       sum(GREATEST({budget} - n_bin_tokens, 0))::BIGINT AS pad_tokens,
       sum(GREATEST(n_bin_tokens - {budget}, 0))::BIGINT AS overflow_tokens,
       ROUND(sum(n_bin_tokens)::DOUBLE
             / (count(*) * {budget})::DOUBLE, 6) + 0.0 AS fill_ratio
FROM ({pack_chunks_sql(chunk_sql, budget)})"""
        )
    return " UNION ALL ".join(selects)


def logreg_calibration_sql(
    n_buckets: int = 512, n_iter: int = 4, lr: int = 2
) -> str:
    """Twin of :func:`operators.logreg.logreg_calibration`."""
    return f"""
WITH {_logreg_cte(n_buckets, n_iter, lr)}
SELECT LEAST(floor(score * 10), 9)::BIGINT AS bin,
       count(*)::BIGINT AS n,
       SUM(y)::BIGINT AS n_pos,
       ROUND(SUM(y)::DOUBLE / count(*), 6) + 0.0 AS frac_pos,
       ROUND(SUM(CAST(score AS DECIMAL(28,9)))::DOUBLE / count(*), 6) + 0.0
         AS mean_score
FROM scored WHERE split = 'holdout' GROUP BY 1
"""


def active_learning_batch_sql(
    k: int = 25, n_buckets: int = 512, n_iter: int = 4, lr: int = 2
) -> str:
    """Twin of :func:`operators.logreg.active_learning_batch`."""
    return f"""
WITH {_logreg_cte(n_buckets, n_iter, lr)},
m AS (
  SELECT doc_id, score, ROUND(abs(score - 0.5), 6) + 0.0 AS margin
  FROM scored WHERE split = 'holdout'
),
r AS (
  SELECT doc_id, score, margin,
         ROW_NUMBER() OVER (ORDER BY margin ASC, doc_id ASC)::BIGINT AS rk
  FROM m
)
SELECT doc_id, score, margin, rk FROM r WHERE rk <= {int(k)}
"""


def incremental_snapshot_loop_sql(
    existing_frac: float = 0.9,
    fp_reject_frac: float = 1.0,
    min_quality: float = 0.8,
    min_tokens: int = 16,
    n: int = 8,
    min_containment: float = 0.3,
    train: float = 0.8,
    valid: float = 0.1,
    chunk_size: int = 64,
    stride: int = 48,
    budget: int = 256,
    semantic_threshold: float | None = None,
    quality_gate: str = "generic",
    line_screen: bool = False,
    line_min_occ: int = 2,
) -> str:
    """End-to-end twin of ``pipeline.incremental_snapshot_loop``: the
    same stage SQL the individual gate entries use (incremental
    screen, quality, within-incoming canonical election,
    decontamination, splits, pack rollup, embedding existence),
    chained as CTEs at loop scope — the ``curate_corpus`` pattern for
    the whole snapshot loop. ``semantic_threshold`` mirrors the
    opt-in embedding-cosine screen stage (round 10): per-pair
    ROUND(6)ed cosine vs the existing corpus, max per incoming doc,
    reject at >= threshold (the ``semantic_decontaminate`` double-math
    and norm-factorization semantics). ``line_screen`` mirrors the
    opt-in CCNet boilerplate-line stage (round 11): corpus-wide md5
    line counts (the ``line_dedup`` CTEs), per-incoming-doc hot-line
    occurrence count + boilerplate-stripped digest — evidence +
    transform columns, admission untouched."""
    from .oracles_text import (
        NORM,
        chunk_documents_sql,
        incremental_dedup_sql,
        quality_filter_sql,
        winnowing_flat_sql,
    )
    from .operators.sampling import PREFIX_HEX, splits_sql

    thr = _threshold_hex(existing_frac)
    draw = f"substr(md5(CAST(doc_id AS VARCHAR)), 1, {PREFIX_HEX})"
    # full-coverage threshold compares fp counts in INTEGERS (the
    # ROUND(6)ed ratio would misfire at containment 0.9999996+) —
    # mirrors pipeline.incremental_snapshot_loop exactly
    if fp_reject_frac == 1.0:
        cover = "i.n_shared_fps >= COALESCE(nf.n_fps, 0)"
    else:
        cover = (
            "(CASE WHEN COALESCE(nf.n_fps, 0) > 0"
            " THEN ROUND(i.n_shared_fps::DOUBLE / nf.n_fps::DOUBLE, 6) + 0.0"
            f" ELSE 0.0 END) >= {fp_reject_frac}"
        )
    screened = (
        f"(i.is_exact_dup OR (COALESCE(nf.n_fps, 0) > 0 AND {cover}))"
    )
    sem_cte = sem_join = ""
    sem_cols = sem_out = ""
    if semantic_threshold is not None:
        from .oracles import _dot, _norm

        cos = (
            f"CASE WHEN {_norm('iv.vi')} * {_norm('xv.vx')} = 0 THEN NULL "
            f"ELSE {_dot('iv.vi', 'xv.vx')} / ({_norm('iv.vi')} * {_norm('xv.vx')}) END"
        )
        sem_cte = f"""
sem AS (
  SELECT iv.doc_id,
         max(ROUND({cos}, 6) + 0.0) AS max_cos_existing
  FROM (
    SELECT e.vec_id AS doc_id, e.embedding AS vi
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, {PREFIX_HEX}) >= '{thr}'
  ) iv
  CROSS JOIN (
    SELECT e.embedding AS vx
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, {PREFIX_HEX}) < '{thr}'
  ) xv
  GROUP BY 1
),"""
        sem_join = "  LEFT JOIN sem sm ON sm.doc_id = i.doc_id\n"
        sem_cols = (
            "         sm.max_cos_existing,\n"
            "         COALESCE(sm.max_cos_existing >= "
            f"{semantic_threshold}, FALSE) AS semantic_dup,\n"
        )
        sem_out = "       f.max_cos_existing, f.semantic_dup,\n"
        screened = (
            f"({screened} OR COALESCE(sm.max_cos_existing >= "
            f"{semantic_threshold}, FALSE))"
        )
    line_cte = line_join = ""
    line_cols = line_out = ""
    if line_screen:
        from .oracles_text import built_lines_sql

        nl = "chr(10)"
        keep = (
            "list_filter(l.lines, x -> NOT "
            "list_contains(COALESCE(dh.hot_hs, []::VARCHAR[]), md5(x)))"
        )
        line_cte = f"""
lln AS MATERIALIZED (
  SELECT doc_id, string_split(ltext, {nl}) AS lines
  FROM ({built_lines_sql()})
),
lhx AS MATERIALIZED (
  SELECT doc_id, unnest(list_transform(lines, x -> md5(x))) AS h FROM lln
),
lhot AS (SELECT h FROM lhx GROUP BY h HAVING count(*) >= {line_min_occ}),
ldh AS (
  SELECT lhx.doc_id, list(DISTINCT lhx.h) AS hot_hs
  FROM lhx JOIN lhot USING (h) GROUP BY lhx.doc_id
),
lev AS (
  SELECT l.doc_id,
         (len(l.lines) - len({keep}))::BIGINT AS n_hot_lines,
         md5(COALESCE(array_to_string({keep}, {nl}), ''))
           AS line_kept_md5
  FROM lln l LEFT JOIN ldh dh ON dh.doc_id = l.doc_id
),"""
        line_join = "  LEFT JOIN lev lv ON lv.doc_id = i.doc_id\n"
        line_cols = (
            "         lv.n_hot_lines,\n         lv.line_kept_md5,\n"
        )
        line_out = "       f.n_hot_lines, f.line_kept_md5,\n"
    if quality_gate == "production":
        from .oracles_text import (
            c4_line_filter_sql,
            perplexity_buckets_kn5_sql,
        )

        # the production gate: C4 line rules AND KN5 perplexity tiles
        # (MATERIALIZED — the KN5 chain re-inlines catastrophically
        # otherwise, the kneser_ney5 twin's documented DuckDB rule)
        quality_cte = f"""quality AS MATERIALIZED (
  SELECT c.doc_id
  FROM ({c4_line_filter_sql()}) c
  LEFT JOIN ({perplexity_buckets_kn5_sql()}) p ON p.doc_id = c.doc_id
  WHERE c.c4_keep AND COALESCE(p.keep, FALSE)
)"""
    else:
        quality_cte = f"quality AS ({quality_filter_sql(min_quality, min_tokens)})"
    return f"""
WITH inc AS MATERIALIZED ({incremental_dedup_sql(existing_frac)}),
{quality_cte},
canon AS (
  SELECT min(doc_id) AS doc_id
  FROM (
    SELECT doc_id, md5({NORM}) AS content_hash
    FROM documents WHERE {draw} >= '{thr}'
  ) GROUP BY content_hash
),
contaminated AS (
  SELECT DISTINCT doc_id FROM ({decontaminate_sql(n, min_containment)})
),
splits AS ({splits_sql(train, valid)}),
pk AS (
  SELECT doc_id, count(*)::BIGINT AS n_bins,
         sum(n_chunks)::BIGINT AS n_chunks,
         sum(n_bin_tokens)::BIGINT AS n_pack_tokens
  FROM ({pack_chunks_sql(chunk_documents_sql(chunk_size, stride), budget)})
  GROUP BY doc_id
),
nfps AS (
  SELECT w.doc_id, count(DISTINCT w.fp)::BIGINT AS n_fps
  FROM ({winnowing_flat_sql(8, 4)}) w
  JOIN documents d ON d.doc_id = w.doc_id
  WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, {PREFIX_HEX}) >= '{thr}'
  GROUP BY w.doc_id
),{sem_cte}{line_cte}
flags AS (
  SELECT i.doc_id, i.is_exact_dup, i.n_shared_fps,
         COALESCE(nf.n_fps, 0)::BIGINT AS n_fps,
         CASE WHEN COALESCE(nf.n_fps, 0) > 0
              THEN ROUND(i.n_shared_fps::DOUBLE / nf.n_fps::DOUBLE, 6) + 0.0
              ELSE 0.0 END AS fp_containment,
{sem_cols}{line_cols}         {screened} AS screened_out,
         (q.doc_id IS NOT NULL) AS quality_ok,
         (NOT {screened})
           AND q.doc_id IS NOT NULL
           AND c.doc_id IS NOT NULL
           AND x.doc_id IS NULL
           AND d.source <> 'src0' AS admitted,
         s.split
  FROM inc i
  JOIN documents d ON d.doc_id = i.doc_id
  LEFT JOIN nfps nf ON nf.doc_id = i.doc_id
{sem_join}{line_join}  LEFT JOIN quality q ON q.doc_id = i.doc_id
  LEFT JOIN canon c ON c.doc_id = i.doc_id
  LEFT JOIN contaminated x ON x.doc_id = i.doc_id
  LEFT JOIN splits s ON s.doc_id = i.doc_id
)
SELECT f.doc_id, f.is_exact_dup, f.n_shared_fps, f.n_fps,
       f.fp_containment,
{sem_out}{line_out}       f.screened_out,
       f.quality_ok, f.admitted,
       CASE WHEN f.admitted THEN f.split END AS split,
       COALESCE(CASE WHEN f.admitted THEN p.n_bins END, 0)::BIGINT AS n_bins,
       COALESCE(CASE WHEN f.admitted THEN p.n_chunks END, 0)::BIGINT AS n_chunks,
       COALESCE(CASE WHEN f.admitted THEN p.n_pack_tokens END, 0)::BIGINT
         AS n_pack_tokens,
       (f.admitted AND e.vec_id IS NOT NULL) AS indexed
FROM flags f
LEFT JOIN pk p ON p.doc_id = f.doc_id
LEFT JOIN (SELECT DISTINCT vec_id FROM embeddings) e ON e.vec_id = f.doc_id
"""


def decontamination_sweep_sql(
    configs: tuple = ((5, 0.3), (8, 0.1), (8, 0.3), (13, 0.1)),
) -> str:
    """Twin of ``operators.curation.decontamination_sweep`` — one
    decontaminate pass per distinct n-gram order (at the group's
    loosest threshold), conditional aggregates per threshold over its
    rounded containment column, unioned."""
    by_n: dict[int, list[float]] = {}
    for ng, thr in configs:
        by_n.setdefault(int(ng), []).append(float(thr))
    rows = "\nUNION ALL\n".join(
        f"SELECT {ng} AS n, {thr} + 0.0 AS min_containment,"
        f" count(CASE WHEN containment >= {thr} THEN 1 END)::BIGINT"
        f" AS n_flagged_pairs,"
        f" count(DISTINCT CASE WHEN containment >= {thr} THEN doc_id END)"
        f"::BIGINT AS n_flagged_docs"
        f" FROM d{ng}"
        for ng, thrs in by_n.items()
        for thr in sorted(thrs)
    )
    ctes = ",\n".join(
        f"d{ng} AS MATERIALIZED ({decontaminate_sql(ng, min(thrs))})"
        for ng, thrs in by_n.items()
    )
    return (
        f"WITH {ctes}\nSELECT * FROM ({rows}) "
        "ORDER BY n, min_containment"
    )


def curation_funnel_sql(
    min_quality: float = 0.8,
    min_tokens: int = 16,
    n: int = 8,
    min_containment: float = 0.3,
) -> str:
    """Twin of ``operators.curation.curation_funnel`` — one flags CTE
    (MATERIALIZED: referenced by every stage aggregate), conditional
    sums per cumulative stage, 5-row UNION with ROUND(6) retention."""
    from .oracles_text import DEDUP_EXACT, TOKS, quality_filter_sql

    stage_conds = [
        "TRUE",
        "NOT bench",
        "NOT bench AND q_ok",
        "NOT bench AND q_ok AND canon",
        "NOT bench AND q_ok AND canon AND NOT cont",
    ]
    names = ["raw", "non_benchmark", "quality", "exact_dedup",
             "decontaminated"]
    aggs, rows = _funnel_rows_sql(stage_conds, names)
    return f"""
WITH quality AS ({quality_filter_sql(min_quality, min_tokens)}),
canon AS ({DEDUP_EXACT}),
contaminated AS (
  SELECT DISTINCT doc_id FROM ({decontaminate_sql(n, min_containment)})
),
flags AS MATERIALIZED (
  SELECT d.doc_id,
         (d.source = 'src0') AS bench,
         len({TOKS})::BIGINT AS n_tok,
         (q.doc_id IS NOT NULL) AS q_ok,
         (k.keep_id IS NOT NULL) AS canon,
         (x.doc_id IS NOT NULL) AS cont
  FROM documents d
  LEFT JOIN quality q ON q.doc_id = d.doc_id
  LEFT JOIN canon k ON k.keep_id = d.doc_id
  LEFT JOIN contaminated x ON x.doc_id = d.doc_id
),
tot AS (
  SELECT {aggs}
  FROM flags
)
SELECT * FROM ({rows})
ORDER BY stage_idx
"""


def _funnel_rows_sql(stage_conds, names) -> tuple:
    """Shared SQL builders for the ablation-funnel twins: the
    conditional-sum aggregate list and the per-stage UNION rows with
    ROUND(6) retention (flags CTE must expose n_tok + the condition
    columns)."""
    aggs = ",\n         ".join(
        f"sum(CASE WHEN {c} THEN 1 ELSE 0 END)::BIGINT AS d{i},\n"
        f"         sum(CASE WHEN {c} THEN n_tok ELSE 0 END)::BIGINT AS t{i}"
        for i, c in enumerate(stage_conds)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage_idx, '{nm}' AS stage, d{i} AS n_docs,"
        f" t{i} AS n_tokens,"
        f" ROUND(d{i}::DOUBLE / d0::DOUBLE, 6) + 0.0 AS doc_retention,"
        f" ROUND(t{i}::DOUBLE / t0::DOUBLE, 6) + 0.0 AS token_retention"
        f" FROM tot"
        for i, nm in enumerate(names)
    )
    return aggs, rows


def production_funnel_sql(
    n: int = 8,
    min_containment: float = 0.3,
) -> str:
    """Twin of ``operators.curation.production_funnel`` — the flags
    come from the curate_corpus_production twin's own output (one
    MATERIALIZED CTE), mirroring the operator-side by-construction
    coupling; shared funnel-row builders."""
    from .oracles_text import TOKS

    stage_conds = [
        "TRUE",
        "NOT bench",
        "NOT bench AND c4k",
        "NOT bench AND c4k AND pplk",
        "NOT bench AND c4k AND pplk AND canon",
        "NOT bench AND c4k AND pplk AND canon AND NOT cont",
    ]
    names = ["raw", "non_benchmark", "c4", "perplexity", "exact_dedup",
             "decontaminated"]
    aggs, rows = _funnel_rows_sql(stage_conds, names)
    return f"""
WITH prod AS MATERIALIZED (
  {curate_corpus_production_sql(n=n, min_containment=min_containment)}
),
flags AS MATERIALIZED (
  SELECT p.doc_id,
         (d.source = 'src0') AS bench,
         len({TOKS})::BIGINT AS n_tok,
         p.c4_keep AS c4k,
         p.ppl_keep AS pplk,
         p.canonical AS canon,
         p.contaminated AS cont
  FROM prod p
  JOIN documents d ON d.doc_id = p.doc_id
),
tot AS (
  SELECT {aggs}
  FROM flags
)
SELECT * FROM ({rows})
ORDER BY stage_idx
"""


def curate_corpus_production_sql(
    n: int = 8,
    min_containment: float = 0.3,
    train: float = 0.8,
    valid: float = 0.1,
    enforce_gopher: bool = False,
    gopher_stopwords: tuple | None = None,
    gopher_min_stopwords: int = 2,
) -> str:
    """End-to-end twin of ``pipeline.curate_corpus_production`` — the
    named-filter curation config chained as CTEs: Gopher report, C4
    line filter, KN5 perplexity tiles, exact-dedup canonical,
    decontamination, splits. ``enforce_gopher`` and the stopword
    knobs mirror the operator's round-10 enforced variant."""
    from .oracles_text import (
        DEDUP_EXACT,
        c4_line_filter_sql,
        gopher_quality_sql,
        perplexity_buckets_kn5_sql,
    )
    from .operators.sampling import splits_sql

    gq = (
        gopher_quality_sql()
        if gopher_stopwords is None
        else gopher_quality_sql(gopher_stopwords, gopher_min_stopwords)
    )
    gopher_and = "AND g.gopher_keep" if enforce_gopher else ""
    return f"""
WITH gopher AS ({gq}),
c4 AS ({c4_line_filter_sql()}),
ppl AS MATERIALIZED ({perplexity_buckets_kn5_sql()}),
canon AS ({DEDUP_EXACT}),
contaminated AS (
  SELECT DISTINCT doc_id FROM ({decontaminate_sql(n, min_containment)})
),
splits AS ({splits_sql(train, valid)}),
flags AS (
  SELECT d.doc_id, g.gopher_keep, c.c4_keep,
         COALESCE(p.keep, FALSE) AS ppl_keep,
         (k.keep_id IS NOT NULL) AS canonical,
         (x.doc_id IS NOT NULL) AS contaminated,
         c.c4_keep AND COALESCE(p.keep, FALSE)
           AND k.keep_id IS NOT NULL
           AND x.doc_id IS NULL
           AND d.source <> 'src0' {gopher_and} AS admitted,
         s.split
  FROM documents d
  JOIN gopher g ON g.doc_id = d.doc_id
  JOIN c4 c ON c.doc_id = d.doc_id
  LEFT JOIN ppl p ON p.doc_id = d.doc_id
  LEFT JOIN canon k ON k.keep_id = d.doc_id
  LEFT JOIN contaminated x ON x.doc_id = d.doc_id
  LEFT JOIN splits s ON s.doc_id = d.doc_id
)
SELECT doc_id, gopher_keep, c4_keep, ppl_keep, canonical, contaminated,
       admitted,
       CASE WHEN admitted THEN split END AS split
FROM flags
"""


def production_mix_report_sql() -> str:
    """Twin of ``pipeline.production_mix_report`` — the production
    curation chain + per-(split, source) token rollup and shares."""
    from .oracles_text import TOKS

    return f"""
WITH prod AS MATERIALIZED ({curate_corpus_production_sql()}),
adm AS (SELECT doc_id, split FROM prod WHERE admitted),
toks AS (
  SELECT doc_id, source, len({TOKS})::BIGINT AS n_tok FROM documents
),
cells AS (
  SELECT a.split, t.source,
         count(*)::BIGINT AS n_docs,
         sum(t.n_tok)::BIGINT AS n_tokens
  FROM adm a JOIN toks t ON t.doc_id = a.doc_id
  GROUP BY 1, 2
),
tot AS (SELECT sum(n_tokens)::BIGINT AS tot FROM cells)
SELECT split, source, n_docs, n_tokens,
       ROUND(n_tokens::DOUBLE / tot.tot::DOUBLE, 6) + 0.0 AS token_share
FROM cells CROSS JOIN tot
"""
