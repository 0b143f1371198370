"""DuckDB oracle SQL for the text / dedup / events / multimodal
queries — exact twins of the Spark plans in ``operators/textual.py``,
``operators/dedup.py``, ``operators/multimodal.py`` and
``streaming/events.py``.

Parity rules (same as ``oracles.py``): double math with identical
operation order, ``ROUND(x, 6) + 0.0``, md5 for any hashing (identical
hex in both engines), integer outputs as BIGINT (Spark side casts),
deterministic tie-breaks, DECIMAL sums for floating aggregations
(order-independent, then one cast to DOUBLE).
"""

from __future__ import annotations

from .functions.text import BPE_ISH_PATTERN, LANG_STOPWORDS

#: DuckDB expression for the Spark tokens() helper.
TOKS = r"string_split_regex(trim(lower(text)), '\s+')"
NORM = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"


def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _stop_count(words) -> str:
    return (
        f"list_sum(list_transform(t, x -> CASE WHEN x IN ({_in_list(words)}) "
        f"THEN 1 ELSE 0 END))"
    )


def _shingles(n: int) -> str:
    gram = " || ' ' || ".join(f"t[i+{j + 1}]" for j in range(n))
    return (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_transform(range(0, len(t)-{n}+1), i -> {gram}) "
        f"ELSE [] END"
    )


TEXT_STATS = f"""
WITH toks AS (SELECT doc_id, text, {TOKS} AS t FROM documents),
m AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars_calc,
         len(t)::BIGINT AS n_tokens,
         len(list_distinct(t))::BIGINT AS n_types,
         list_sum(list_transform(t, x -> length(x)::DOUBLE)) AS tot_len,
         len(list_distinct(t))::DOUBLE / len(t)::DOUBLE AS ttr_raw,
         {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE AS stop_raw,
         len(t)::DOUBLE AS n
  FROM toks WHERE len(t) > 0
)
SELECT doc_id, n_chars_calc, n_tokens, n_types,
       ROUND(tot_len / n, 6) + 0.0 AS avg_token_len,
       ROUND(ttr_raw, 6) + 0.0 AS ttr,
       ROUND(stop_raw, 6) + 0.0 AS stop_ratio,
       ROUND((ttr_raw
              + (CASE WHEN n >= 32.0 THEN 1.0 ELSE n / 32.0 END)
              + (CASE WHEN stop_raw > 0.5 THEN 0.0 ELSE 1.0 - stop_raw END)
             ) / 3.0, 6) + 0.0 AS quality
FROM m
"""


LANG_PROFILE = f"""
WITH toks AS (SELECT lang, n_chars, len({TOKS})::BIGINT AS n_tokens FROM documents)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(n_chars)::BIGINT AS total_chars,
       ROUND(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6) + 0.0 AS avg_chars
FROM toks GROUP BY lang
"""


def token_frequencies_sql(top_n: int = 25) -> str:
    return f"""
WITH toks AS (SELECT unnest({TOKS}) AS token FROM documents)
SELECT token, count(*)::BIGINT AS cnt
FROM toks GROUP BY token
ORDER BY cnt DESC, token ASC LIMIT {top_n}
"""


def _lang_id_case() -> str:
    scores = {lang: _stop_count(ws) for lang, ws in LANG_STOPWORDS.items()}
    best = f"greatest({scores['en']}, {scores['es']}, {scores['de']}, {scores['fr']})"
    return (
        f"CASE WHEN {best} <= 0 THEN 'und' "
        f"WHEN {scores['en']} = {best} THEN 'en' "
        f"WHEN {scores['es']} = {best} THEN 'es' "
        f"WHEN {scores['de']} = {best} THEN 'de' "
        f"ELSE 'fr' END"
    )


LANG_ID = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents)
SELECT doc_id, {_lang_id_case()} AS predicted_lang FROM toks
"""


LANG_ID_CONFUSION = f"""
WITH toks AS (SELECT doc_id, lang, {TOKS} AS t FROM documents),
pred AS (SELECT doc_id, lang, {_lang_id_case()} AS predicted_lang FROM toks),
cnt AS (SELECT lang, predicted_lang, count(*)::BIGINT AS n FROM pred GROUP BY 1, 2),
tot AS (SELECT lang, sum(n)::BIGINT AS tot FROM cnt GROUP BY lang)
SELECT lang, predicted_lang, n,
       ROUND(n::DOUBLE / tot::DOUBLE, 6) + 0.0 AS recall
FROM cnt JOIN tot USING (lang)
"""


FINGERPRINTS = f"""
WITH toks AS (SELECT doc_id, text, {TOKS} AS t FROM documents)
SELECT doc_id,
       md5({NORM}) AS content_hash,
       md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS token_set_hash
FROM toks
"""


def quality_filter_sql(min_quality: float = 0.8, min_tokens: int = 16) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
m AS (
  SELECT doc_id, len(t)::BIGINT AS n_tokens,
         len(list_distinct(t))::DOUBLE / len(t)::DOUBLE AS ttr_raw,
         {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE AS stop_raw,
         len(t)::DOUBLE AS n
  FROM toks WHERE len(t) > 0
)
SELECT doc_id, n_tokens,
       ROUND((ttr_raw
              + (CASE WHEN n >= 32.0 THEN 1.0 ELSE n / 32.0 END)
              + (CASE WHEN stop_raw > 0.5 THEN 0.0 ELSE 1.0 - stop_raw END)
             ) / 3.0, 6) + 0.0 AS quality
FROM m
WHERE ROUND((ttr_raw
             + (CASE WHEN n >= 32.0 THEN 1.0 ELSE n / 32.0 END)
             + (CASE WHEN stop_raw > 0.5 THEN 0.0 ELSE 1.0 - stop_raw END)
            ) / 3.0, 6) + 0.0 >= {min_quality}
  AND n_tokens >= {min_tokens}
"""


DEDUP_EXACT = f"""
SELECT md5({NORM}) AS text_hash,
       min(doc_id) AS keep_id,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY 1
"""


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.8) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct({_shingles(n)})) AS shingle FROM toks),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b,
         ROUND(n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common)::DOUBLE, 6) + 0.0 AS jaccard
  FROM inter
  JOIN cnt ca ON ca.doc_id = id_a
  JOIN cnt cb ON cb.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= {threshold}
"""


def ngram_containment_sql(n: int = 3, threshold: float = 0.8) -> str:
    """Twin of ``dedup.ngram_containment_pairs``: overlap coefficient
    |A∩B| / min(|A|,|B|) over distinct word n-grams."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct({_shingles(n)})) AS shingle FROM toks),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b,
         ROUND(n_common::DOUBLE / least(ca.n_sh, cb.n_sh)::DOUBLE, 6) + 0.0 AS containment
  FROM inter
  JOIN cnt ca ON ca.doc_id = id_a
  JOIN cnt cb ON cb.doc_id = id_b
)
SELECT id_a, id_b, containment FROM j WHERE containment >= {threshold}
"""


def tfidf_cosine_sql(n: int = 3, threshold: float = 0.6) -> str:
    """Twin of ``sparse_sim.tfidf_cosine_pairs`` (and, verbatim, of
    the lossless ``tfidf_cosine_prefix_pairs`` at the same threshold):
    word n-gram occurrence counts (NOT distinct — multiplicity is the
    tf), weight quantized once at ROUND(tf*ln(N/df),6)+0.0 so every
    downstream product is IEEE-deterministic, per-term products and
    squares ROUND(.,9) -> DECIMAL(28,9) summed (order-invariant),
    final cosine ROUND(.,6)+0.0. Features in every doc (idf 0) are
    dropped in both engines."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest({_shingles(n)}) AS feat FROM toks),
tf AS (SELECT doc_id, feat, count(*)::BIGINT AS tf FROM sh GROUP BY doc_id, feat),
dfreq AS (SELECT feat, count(*)::BIGINT AS dfreq FROM tf GROUP BY feat),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
w AS (
  SELECT doc_id, feat,
         ROUND(tf::DOUBLE * ln(n_docs / dfreq::DOUBLE), 6) + 0.0 AS w
  FROM tf JOIN dfreq USING (feat) CROSS JOIN n
  WHERE dfreq < n_docs
),
norms AS (
  SELECT doc_id,
         sqrt(CAST(sum(CAST(ROUND(w * w, 9) AS DECIMAL(28,9))) AS DOUBLE)) AS nrm
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(sum(CAST(ROUND(a.w * b.w, 9) AS DECIMAL(28,9))) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.feat = b.feat AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, ROUND(dot / (na.nrm * nb.nrm), 6) + 0.0 AS cosine
  FROM dots
  JOIN norms na ON na.doc_id = id_a
  JOIN norms nb ON nb.doc_id = id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
"""


def minhash_lsh_md5_sql(
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
) -> str:
    """Bit-exact twin of ``minhash_lsh_pairs(..., hasher='md5')``:
    per-seed signature = lexicographic min of salted md5 hex over the
    doc's distinct shingles, band key = md5 of the comma-joined band
    slice, candidates share a (band, key), verification is exact
    Jaccard over the shingle sets. md5 hex is identical across
    engines, so even the banding (the approximate part) matches."""
    rows = num_hashes // bands
    sig_elems = ", ".join(
        f"list_min(list_transform(sh, s -> md5('mh{i}:' || s)))"
        for i in range(num_hashes)
    )
    band_structs = ", ".join(
        "struct_pack(band := {b}, bkey := md5({key}))".format(
            b=b,
            key=" || ',' || ".join(
                f"sig[{b * rows + r + 1}]" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (SELECT doc_id AS id, {TOKS} AS t FROM documents),
sh AS (SELECT id, list_distinct({_shingles(n)}) AS sh FROM toks),
sig AS (SELECT id, sh, [{sig_elems}] AS sig FROM sh),
exploded AS (SELECT id, unnest([{band_structs}]) AS u FROM sig),
banded AS (SELECT id, u.band AS band, u.bkey AS bkey FROM exploded),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
verified AS (
  SELECT id_a, id_b,
         ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
               (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE,
               6) + 0.0 AS jaccard
  FROM cand
  JOIN sh sa ON sa.id = cand.id_a
  JOIN sh sb ON sb.id = cand.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {threshold}
"""


def tfidf_sql(top_n: int = 3) -> str:
    """Twin of ``textual.tfidf_top_terms``: tf * ln(N/df), rounded to
    6 before the (tfidf DESC, token ASC) rank cut."""
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS dfreq FROM toks GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         ROUND(tf.tf::DOUBLE * ln(n.n_docs / dfreq.dfreq::DOUBLE), 6) + 0.0 AS tfidf
  FROM tf JOIN dfreq USING (token), n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
  )::BIGINT AS rk
  FROM scored
)
SELECT doc_id, token, tf, tfidf, rk FROM ranked WHERE rk <= {top_n}
"""


def neardup_cosine_sql(threshold: float = 0.4) -> str:
    dot = (
        "list_sum(list_transform(list_zip(a.embedding, b.embedding), "
        "x -> x[1]::DOUBLE * x[2]::DOUBLE))"
    )
    norm = lambda side: (
        f"sqrt(list_sum(list_transform(list_zip({side}.embedding, {side}.embedding), "
        f"x -> x[1]::DOUBLE * x[2]::DOUBLE)))"
    )
    sim = (
        f"CASE WHEN {norm('a')} * {norm('b')} = 0 THEN NULL "
        f"ELSE {dot} / ({norm('a')} * {norm('b')}) END"
    )
    return f"""
WITH s AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND({sim}, 6) + 0.0 AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM s WHERE cosine >= {threshold}
"""


MULTIMODAL_META = """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS payload_md5,
       'text/plain' AS media_type
FROM documents
"""


EVENTS_HOURLY = """
SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       CAST(sum(value::DECIMAL(18,6)) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# Session semantics: a new session starts when the event-time gap to
# the user's previous event is >= 30 min (Spark session_window's
# half-open [start, last+gap) convention); session_end = last + gap.
# ts is cast TIMESTAMP_NS -> TIMESTAMP (us) to match Spark's precision.
SESSION_ROLLUP = """
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
            THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS sid FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(value::DECIMAL(18,6)) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
"""


# Exact integer micro-unit running sums: ROUND(value*1e6) is the same
# double product + ties-away rounding as the operator's NumPy path, so
# the window cumsum matches the stateful operator bit-for-bit.
RUNNING_TOTALS = """
SELECT user_id, event_id,
       (COUNT(*) OVER w - 1)::BIGINT AS n_prior,
       CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) OVER w AS BIGINT) AS total_micros
FROM (SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
"""


# Identical pattern object as functions.text.BPE_ISH_PATTERN (RE2-safe,
# no lookaround), SQL-escaped; both engines count leftmost matches over
# lowercased text.
_BPE_SQL = BPE_ISH_PATTERN.replace("'", "''")

TOKEN_BUDGET = f"""
SELECT doc_id,
       len({TOKS})::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{_BPE_SQL}'))::BIGINT AS n_bpe_tokens
FROM documents
"""


def winnowing_sql(k: int = 8, window: int = 4) -> str:
    """Winnowing twin: char-k-gram md5s, sliding-window minima,
    sorted distinct list per doc. Mirrors the Spark edge cases:
    len(text) < k -> [], fewer hashes than the window -> [min]."""
    return f"""
WITH h AS (
  SELECT doc_id,
         CASE WHEN length(text) >= {k}
              THEN [md5(substr(text, i, {k})) FOR i IN range(1, length(text) - {k} + 2)]
              ELSE [] END AS hashes
  FROM documents
)
SELECT doc_id,
       list_sort(list_distinct(
         CASE WHEN len(hashes) >= {window}
              THEN [list_aggregate(hashes[j : j + {window} - 1], 'min')
                    FOR j IN range(1, len(hashes) - {window} + 2)]
              WHEN len(hashes) > 0 THEN [list_aggregate(hashes, 'min')]
              ELSE [] END)) AS fps
FROM h
"""


def winnowing_flat_sql(k: int = 8, window: int = 4) -> str:
    """Exploded twin of :func:`winnowing_sql` — one (doc_id, fp) row
    per distinct fingerprint (scalar columns; the driver's canonical
    sort can't order array cells)."""
    return f"SELECT doc_id, unnest(fps) AS fp FROM ({winnowing_sql(k, window)})"


def winnowing_digest_sql(k: int = 8, window: int = 4) -> str:
    """Digest twin: fps is already sorted, so md5 over the bare
    concatenation is deterministic; empty list -> md5('') on both
    engines."""
    return f"""
SELECT doc_id,
       len(fps)::BIGINT AS n_fps,
       md5(array_to_string(fps, '')) AS fps_md5
FROM ({winnowing_sql(k, window)})
"""


# Byte-histogram digest twin: the high nibble of byte i is the hex
# digit at (1-based) position 2*i+1 of hex(blob) — so the 16 bin
# counts of (byte >> 4) are per-digit counts over those positions.
# md5 over the comma-joined integer counts matches the NumPy side
# exactly (integers: no float-formatting ambiguity).
BYTE_HIST_DIGESTS = """
WITH h AS (
  SELECT doc_id, encode(text) AS b FROM documents
), n AS (
  SELECT doc_id,
         octet_length(b)::BIGINT AS n_bytes,
         list_transform(range(0, octet_length(b)::INT),
                        i -> substr(hex(b), 2 * i::INT + 1, 1)) AS nib
  FROM h
)
SELECT doc_id, n_bytes,
       md5(array_to_string(list_transform(
         ['0','1','2','3','4','5','6','7','8','9','A','B','C','D','E','F'],
         d -> CAST(len(list_filter(nib, x -> x = d)) AS VARCHAR)), ',')) AS hist_md5
FROM n
"""


# DuckDB's native ASOF JOIN is the oracle for the hand-built Spark
# as-of join (union+window). ts cast to us precision on BOTH sides
# before the inequality so truncation can't flip the >= comparison.
PURCHASE_ATTRIBUTION = """
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS click_ts, c.value AS click_value
FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
                WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def chunk_documents_sql(chunk_size: int = 64, stride: int = 48) -> str:
    """Twin of ``textual.chunk_documents`` — same start grid
    (0, stride, 2*stride, … while start < n_tokens) and the same
    end-clamped slices."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
exploded AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, (len(t) - 1) // {stride} + 1),
           i -> struct_pack(
             chunk_id := i,
             ch := list_slice(t, i * {stride} + 1, i * {stride} + {chunk_size})
           )
         )) AS u
  FROM toks
)
SELECT doc_id,
       CAST(u.chunk_id AS INT) AS chunk_id,
       array_to_string(u.ch, ' ') AS chunk_text,
       CAST(len(u.ch) AS INT) AS n_chunk_tokens
FROM exploded
"""


def chunk_dedup_sql(chunk_size: int = 32, stride: int = 32) -> str:
    """Twin of ``dedup.chunk_dedup_stats``: same chunk grid, same
    first-occurrence election (row_number over the md5 fingerprint
    ordered by (doc_id, chunk_id)), same in-order rejoin of survivors.
    COALESCE matches Spark's md5('') for a doc whose every chunk was
    dropped (string_agg skips NULLs -> NULL, array_join -> '')."""
    return f"""
WITH chunks AS ({chunk_documents_sql(chunk_size, stride)}),
ranked AS (
  SELECT doc_id, chunk_id, chunk_text,
         row_number() OVER (
           PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_id
         ) AS rn
  FROM chunks
)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       md5(COALESCE(
         string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' ' ORDER BY chunk_id),
         ''
       )) AS clean_md5
FROM ranked
GROUP BY doc_id
"""


UNIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS tok FROM documents
),
freqs AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT count(*)::DOUBLE AS n FROM toks)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       ROUND(
         CAST(sum(CAST(ROUND(ln(cnt::DOUBLE / total.n), 9) AS DECIMAL(28,9))) AS DOUBLE)
         / count(*), 6
       ) + 0.0 AS mean_logprob
FROM toks JOIN freqs USING (tok), total
GROUP BY doc_id, total.n
"""


_AUG_HTML = (
    "'<div class=\"c' || CAST(doc_id % 5 AS VARCHAR) || '\">' || chr(9) || ' <b>' || "
    "upper(substr(text, 1, 10)) || '</b>' || substr(text, 11) || "
    "'  &amp; tail' || CAST(doc_id % 97 AS VARCHAR) || "
    "'&nbsp;&lt;eof&gt;<br/>' || chr(13) || chr(10) || '</div>'"
)


def normalize_markup_sql() -> str:
    """Twin of :func:`operators.textual.normalize_markup`: identical
    deterministic augmentation and the same ordered passes — DuckDB's
    regexp_replace needs the 'g' flag for replace-all (Spark's default)."""
    clean = "lower(raw_html)"
    for pat, repl in (
        (r"<[^>]*>", " "),
        (r"&nbsp;", " "),
        (r"&amp;", "&"),
        (r"&lt;", "<"),
        (r"&gt;", ">"),
        (r"&quot;", '"'),
        (r"[ \t\r\n]+", " "),
    ):
        repl_sql = repl.replace("'", "''").replace('"', '"')
        clean = f"regexp_replace({clean}, '{pat}', '{repl_sql}', 'g')"
    return f"""
WITH aug AS (SELECT doc_id, {_AUG_HTML} AS raw_html FROM documents),
norm AS (SELECT doc_id, raw_html, trim({clean}) AS clean FROM aug)
SELECT doc_id,
       CAST(length(raw_html) AS BIGINT) AS n_chars_raw,
       CAST(length(clean) AS BIGINT) AS n_chars_norm,
       md5(clean) AS clean_md5
FROM norm ORDER BY doc_id
"""


def extract_urls_sql() -> str:
    """Twin of :func:`operators.textual.extract_urls` over the same
    attach_pii augmentation used by pii_redaction_sql."""
    return r"""
WITH aug AS (
  SELECT doc_id,
    text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.org via http://ex'
      || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p' || CAST(doc_id AS VARCHAR)
      || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
      || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
      || CASE WHEN doc_id % 3 = 0
              THEN ' or +1 555 ' || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0')
              ELSE '' END AS pii_text
  FROM documents
)
SELECT doc_id, u.url AS url
FROM aug, LATERAL (
  SELECT unnest(regexp_extract_all(pii_text, 'https?://[^ \t\r\n]+')) AS url
) u
ORDER BY doc_id, url
"""


BIGRAM_LOGPROB = f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
pairs AS (
  SELECT doc_id,
         unnest(list_slice(toks, 1, len(toks) - 1)) AS prev,
         unnest(list_slice(toks, 2, len(toks))) AS cur
  FROM t WHERE len(toks) >= 2
),
c2 AS (SELECT prev, cur, count(*) AS c2 FROM pairs GROUP BY prev, cur),
c1 AS (SELECT prev, count(*) AS c1 FROM pairs GROUP BY prev)
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       ROUND(
         CAST(sum(CAST(ROUND(ln(c2.c2::DOUBLE / c1.c1::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE)
         / count(*), 6
       ) + 0.0 AS mean_bigram_logprob
FROM pairs JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
GROUP BY doc_id
"""


def quality_weighted_sample_sql() -> str:
    """Twin of sampling.quality_weighted_sample: identical quality
    formula, md5-prefix integer draw (list_reduce hex decode), and
    integer admission rule."""
    draw = (
        "list_reduce(list_transform(generate_series(1, 6), "
        "i -> strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1), "
        "(acc, d) -> acc * 16 + d)::BIGINT"
    )
    q = (
        "ROUND((ttr_raw + (CASE WHEN n >= 32.0 THEN 1.0 ELSE n / 32.0 END) "
        "+ (CASE WHEN stop_raw > 0.5 THEN 0.0 ELSE 1.0 - stop_raw END)) / 3.0, 6) + 0.0"
    )
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
m AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE len(list_distinct(t))::DOUBLE / len(t)::DOUBLE END AS ttr_raw,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE END AS stop_raw,
         len(t)::DOUBLE AS n
  FROM toks
),
scored AS (
  SELECT doc_id,
         CASE WHEN n = 0 THEN 0.0 ELSE {q} END AS quality
  FROM m
)
SELECT doc_id, quality,
       CASE WHEN {draw} < CAST(floor(quality * quality * 16777216.0) AS BIGINT)
            THEN 1 ELSE 0 END AS admitted
FROM scored ORDER BY doc_id
"""


READABILITY = f"""
WITH m AS (
  SELECT doc_id,
         len({TOKS})::BIGINT AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(206.835
             - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
             - 84.6  * (n_syllables::DOUBLE / n_words::DOUBLE), 6) + 0.0 AS flesch
FROM m WHERE n_words > 0
"""


def incremental_dedup_sql(
    existing_frac: float = 0.9, k: int = 8, window: int = 4
) -> str:
    """Twin of dedup.incremental_dedup: md5-draw side split, exact
    content-hash membership, shared-winnowing-fp counts."""
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    thr = _threshold_hex(existing_frac)
    draw = f"substr(md5(CAST(doc_id AS VARCHAR)), 1, {PREFIX_HEX})"
    return f"""
WITH tagged AS (
  SELECT doc_id, text,
         CASE WHEN {draw} < '{thr}' THEN 'existing' ELSE 'incoming' END AS side
  FROM documents
),
hashes AS (
  SELECT doc_id, side, md5({NORM}) AS content_hash FROM tagged
),
wfps AS (
  SELECT f.doc_id, t.side, f.fp
  FROM ({winnowing_flat_sql(k, window)}) f
  JOIN tagged t ON f.doc_id = t.doc_id
),
shared AS (
  SELECT i.doc_id, count(DISTINCT i.fp)::BIGINT AS n_shared_fps
  FROM wfps i
  WHERE i.side = 'incoming'
    AND i.fp IN (SELECT fp FROM wfps WHERE side = 'existing')
  GROUP BY i.doc_id
)
SELECT h.doc_id,
       h.content_hash IN (
         SELECT content_hash FROM hashes WHERE side = 'existing'
       ) AS is_exact_dup,
       COALESCE(s.n_shared_fps, 0)::BIGINT AS n_shared_fps
FROM hashes h LEFT JOIN shared s ON h.doc_id = s.doc_id
WHERE h.side = 'incoming'
"""


def epoch_shards_sql(n_shards: int = 8, epoch: int = 0) -> str:
    """Twin of sampling.epoch_shards (md5 hex prefix -> int via the
    list_reduce decode, mod n_shards)."""
    from .operators.sampling import PREFIX_HEX

    decode = (
        f"list_reduce(list_transform(generate_series(1, {PREFIX_HEX}), "
        f"i -> strpos('0123456789abcdef', "
        f"substr(md5(CAST(doc_id AS VARCHAR) || ':' || '{epoch}'), i, 1)) - 1), "
        f"(acc, dig) -> acc * 16 + dig)::BIGINT"
    )
    return f"""
SELECT ({decode} % {n_shards}) AS shard,
       count(*)::BIGINT AS n_docs,
       sum(len({TOKS}))::BIGINT AS n_tokens,
       count(DISTINCT source)::BIGINT AS n_sources
FROM documents
GROUP BY 1
"""


def per_source_examples_sql(k: int = 3) -> str:
    from .operators.sampling import PREFIX_HEX

    return f"""
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, {PREFIX_HEX}) ASC,
                    doc_id ASC
         )::BIGINT AS rk
  FROM documents
) WHERE rk <= {k}
"""


def bpe_pair_counts_sql(top_n: int = 30) -> str:
    return f"""
WITH toks AS (
  SELECT unnest({TOKS}) AS t FROM documents
),
pairs AS (
  SELECT unnest([substr(t, i, 2) FOR i IN range(1, length(t))]) AS pair
  FROM toks WHERE length(t) >= 2
),
counts AS (
  SELECT pair, count(*)::BIGINT AS n FROM pairs GROUP BY pair
)
SELECT pair, n, rk FROM (
  SELECT pair, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC)::BIGINT AS rk
  FROM counts
) WHERE rk <= {top_n}
"""


KEY_SKEW_REPORT = """
WITH counts AS (
  SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id
),
tot AS (SELECT sum(n_events)::BIGINT AS tot FROM counts)
SELECT user_id, n_events,
       ROUND(n_events::DOUBLE / tot::DOUBLE, 6) + 0.0 AS share, rk
FROM (
  SELECT user_id, n_events, tot,
         ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id ASC)::BIGINT AS rk
  FROM counts CROSS JOIN tot
) WHERE rk <= 20
"""


def _bm25_cte(terms, k1: float = 1.2, b: float = 0.75) -> str:
    """Shared BM25 CTE chain ending in ``bm(doc_id, score)``."""
    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs,
         sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM toks WHERE token IN ({tl}) GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id,
         ROUND(
           ln(1.0 + (s.n_docs - d.df::DOUBLE + 0.5) / (d.df::DOUBLE + 0.5))
           * (tf.tf::DOUBLE * {k1 + 1.0}
              / (tf.tf::DOUBLE
                 + {k1} * ({1.0 - b} + {b} * dl.dl::DOUBLE / s.avgdl))),
           9)::DECIMAL(20,9) AS c
  FROM tf
  JOIN dfreq d USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
bm AS (
  SELECT doc_id, ROUND(CAST(sum(c) AS DOUBLE), 6) + 0.0 AS score
  FROM contrib GROUP BY doc_id
)"""


def bm25_topk_sql(terms, k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {_bm25_cte(terms, k1, b)}
SELECT doc_id, score, rk FROM (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rk
  FROM bm
) WHERE rk <= {k}
"""


def hybrid_rrf_sql(
    terms, k: int = 10, pool: int = 50, kk: int = 60,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    from .oracles import QUERY_VEC_ID, score_sql

    return f"""
WITH {_bm25_cte(terms, k1, b)},
bmranked AS (
  SELECT doc_id, rk AS r_bm FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rk
    FROM bm
  ) WHERE rk <= {pool}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
vscored AS (
  SELECT e.vec_id AS doc_id, ROUND({score_sql("CosineSimilarity")}, 9) AS vscore
  FROM embeddings e, q
),
vranked AS (
  SELECT doc_id, rk AS r_vec FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (
             ORDER BY vscore DESC NULLS LAST, doc_id ASC
           )::BIGINT AS rk
    FROM vscored
  ) WHERE rk <= {pool}
),
fused AS (
  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         ROUND(
           COALESCE(1.0 / ({kk}.0 + b.r_bm::DOUBLE), 0.0)
           + COALESCE(1.0 / ({kk}.0 + v.r_vec::DOUBLE), 0.0),
           6) + 0.0 AS rrf
  FROM bmranked b FULL OUTER JOIN vranked v ON b.doc_id = v.doc_id
)
SELECT doc_id, rrf, rk FROM (
  SELECT doc_id, rrf,
         ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC)::BIGINT AS rk
  FROM fused
) WHERE rk <= {k}
"""


def graph_stats_sql(n: int = 3, threshold: float = 0.8) -> str:
    """Twin of graph.graph_stats: triangles via the oriented
    wedge-close join, wedges from degrees."""
    return f"""
WITH pairs AS (
  SELECT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
  FROM ({ngram_jaccard_sql(n, threshold)})
  GROUP BY 1, 2
),
und AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM und GROUP BY src),
nw AS (
  SELECT count(*)::BIGINT AS n_nodes,
         sum(deg * (deg - 1) / 2)::BIGINT AS wedges
  FROM deg
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e1.b = e2.a
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
),
ne AS (SELECT count(*)::BIGINT AS n_edges FROM pairs)
SELECT n_nodes, n_edges, n_triangles,
       CASE WHEN wedges > 0
            THEN ROUND(3.0 * n_triangles::DOUBLE / wedges::DOUBLE, 6) + 0.0
            ELSE 0.0 END AS clustering
FROM nw CROSS JOIN tri CROSS JOIN ne
"""


def weak_labels_sql() -> str:
    from .operators.textual import WEAK_LABEL_RULES

    vote_items = ", ".join(
        f"CASE WHEN regexp_matches(lower(text), '{pat}') THEN '{label}' END"
        for _, pat, label in WEAK_LABEL_RULES
    )
    labels = sorted({label for _, _, label in WEAK_LABEL_RULES})
    count_structs = ", ".join(
        "{'negc': -len(list_filter(cv, x -> x = '%s'))::BIGINT, "
        "'lab': '%s', 'c': len(list_filter(cv, x -> x = '%s'))::BIGINT}"
        % (lab, lab, lab)
        for lab in labels
    )
    return f"""
WITH v AS (
  SELECT doc_id, list_filter([{vote_items}], x -> x IS NOT NULL) AS cv
  FROM documents
),
m AS (
  SELECT doc_id, cv, list_sort([{count_structs}])[1] AS best
  FROM v
)
SELECT doc_id, len(cv)::BIGINT AS n_votes,
       CASE WHEN len(cv) > 0 THEN best.lab END AS label,
       CASE WHEN len(cv) > 0
            THEN ROUND(best.c::DOUBLE / len(cv)::DOUBLE, 6) + 0.0
            ELSE 0.0 END AS agreement
FROM m
"""


def augment_token_dropout_sql(rate: float = 0.15) -> str:
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    thr = _threshold_hex(rate)
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
k AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         [toks[i] FOR i IN range(1, len(toks) + 1)
          IF substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
                    1, {PREFIX_HEX}) >= '{thr}'] AS kept
  FROM t
)
SELECT doc_id, n_tokens, len(kept)::BIGINT AS n_kept,
       md5(array_to_string(kept, ' ')) AS aug_md5
FROM k
"""


def gazetteer_sql() -> str:
    from .operators.textual import GAZETTEER

    vals = ", ".join(f"('{t}', '{e}')" for t, e in GAZETTEER)
    return f"""
WITH gaz(token, entity) AS (VALUES {vals}),
toks AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents)
SELECT doc_id, entity, count(*)::BIGINT AS n_mentions
FROM toks JOIN gaz USING (token)
GROUP BY doc_id, entity
"""


def curation_ingest_sql(min_quality: float = 0.8, min_tokens: int = 16) -> str:
    """Twin of streaming.curation_ingest.stream_curation_ingest:
    first (min-doc_id) quality-passing occurrence per content hash —
    what the in-order drained stream admits."""
    return f"""
WITH passing AS (
  SELECT p.doc_id, md5({NORM.replace('text', 'd.text')}) AS content_hash
  FROM ({quality_filter_sql(min_quality, min_tokens)}) p
  JOIN documents d ON d.doc_id = p.doc_id
)
SELECT min(doc_id)::BIGINT AS doc_id, content_hash
FROM passing GROUP BY content_hash
"""


def entity_cooccurrence_sql() -> str:
    return f"""
WITH ent AS (
  SELECT DISTINCT doc_id, entity FROM ({gazetteer_sql()})
),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
singles AS (SELECT entity, count(*)::BIGINT AS n_ent FROM ent GROUP BY entity),
pairs AS (
  SELECT a.entity AS entity_a, b.entity AS entity_b, count(*)::BIGINT AS n_both
  FROM ent a JOIN ent b ON a.doc_id = b.doc_id AND a.entity < b.entity
  GROUP BY 1, 2
)
SELECT entity_a, entity_b, n_both,
       ROUND(n.n_docs::DOUBLE * n_both::DOUBLE
             / (sa.n_ent::DOUBLE * sb.n_ent::DOUBLE), 6) + 0.0 AS lift
FROM pairs
JOIN singles sa ON sa.entity = entity_a
JOIN singles sb ON sb.entity = entity_b
CROSS JOIN n
"""


SESSION_NUMBERS = """
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
            THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       SUM(new_s) OVER (
         PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
       )::BIGINT AS session_no
FROM flagged
"""


def lang_quality_matrix_sql() -> str:
    from .oracles_text import LANG_STOPWORDS as _LS  # self-import safe

    q_expr = f"""ROUND((len(list_distinct(t))::DOUBLE / len(t)::DOUBLE
        + (CASE WHEN len(t)::DOUBLE >= 32.0 THEN 1.0 ELSE len(t)::DOUBLE / 32.0 END)
        + (CASE WHEN {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE > 0.5
                THEN 0.0
                ELSE 1.0 - {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE / len(t)::DOUBLE END)
       ) / 3.0, 6) + 0.0"""
    return f"""
WITH toks AS (SELECT doc_id, lang, {TOKS} AS t FROM documents),
per AS (
  SELECT lang, least(floor(({q_expr}) * 10)::INT, 9) AS q_bucket FROM toks
),
cells AS (
  SELECT lang, q_bucket, count(*)::BIGINT AS n_docs FROM per GROUP BY lang, q_bucket
),
totals AS (SELECT lang, sum(n_docs)::BIGINT AS n_lang FROM cells GROUP BY lang)
SELECT lang, q_bucket, n_docs,
       ROUND(n_docs::DOUBLE / n_lang::DOUBLE, 6) + 0.0 AS lang_share
FROM cells JOIN totals USING (lang)
"""


def top_tokens_per_lang_sql(top_n: int = 5) -> str:
    return f"""
WITH counts AS (
  SELECT lang, unnest({TOKS}) AS token FROM documents
),
g AS (SELECT lang, token, count(*)::BIGINT AS cnt FROM counts GROUP BY lang, token)
SELECT lang, token, cnt, rk FROM (
  SELECT lang, token, cnt,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY cnt DESC, token ASC
         )::BIGINT AS rk
  FROM g
) WHERE rk <= {top_n}
"""


def best_quality_election_sql() -> str:
    """Oracle for dedup.best_quality_election: per exact-content group
    the max-quality (tie: min doc_id) survivor, with group size.
    Quality mirrors quality_score over ALL docs (empty-token docs
    score 0.0, no filter)."""
    return f"""
WITH toks AS (SELECT doc_id, md5({NORM}) AS content_hash, {TOKS} AS t
              FROM documents),
m AS (
  SELECT doc_id, content_hash,
         CASE WHEN len(t) > 0 THEN
           ROUND((len(list_distinct(t))::DOUBLE / len(t)::DOUBLE
                  + (CASE WHEN len(t)::DOUBLE >= 32.0 THEN 1.0
                          ELSE len(t)::DOUBLE / 32.0 END)
                  + (CASE WHEN {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE
                               / len(t)::DOUBLE > 0.5 THEN 0.0
                          ELSE 1.0 - {_stop_count(LANG_STOPWORDS["en"])}::DOUBLE
                               / len(t)::DOUBLE END)
                 ) / 3.0, 6) + 0.0
         ELSE 0.0 END AS quality
  FROM toks
),
ranked AS (
  SELECT content_hash, doc_id, quality,
         ROW_NUMBER() OVER (
           PARTITION BY content_hash ORDER BY quality DESC, doc_id ASC
         ) AS rn,
         COUNT(*) OVER (PARTITION BY content_hash)::BIGINT AS group_size
  FROM m
)
SELECT content_hash, doc_id::BIGINT AS doc_id, quality, group_size
FROM ranked WHERE rn = 1 ORDER BY content_hash
"""


# Stream-static enrichment: events LEFT JOIN customer->nation on
# user_id = c_custkey, rolled up per (nation, event_type). value is
# rounded per row before the DECIMAL sum — order-independent, so the
# streamed (per-micro-batch) aggregation equals the batch rollup.
EVENTS_ENRICHED_NATION = """
WITH dim AS (
  SELECT c_custkey, n_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT d.n_name, e.event_type,
       count(*)::BIGINT AS n_events,
       ROUND(CAST(sum(ROUND(e.value, 6)::DECIMAL(20,6)) AS DOUBLE), 6) + 0.0
         AS total_value
FROM events e LEFT JOIN dim d ON e.user_id = d.c_custkey
GROUP BY d.n_name, e.event_type
"""


def duplicate_spans_sql(k: int = 8) -> str:
    """Twin of ``dedup.duplicate_spans``: token k-window md5s with
    positions, hot-hash filter (total occurrences ≥ 2), per-doc
    gaps-and-islands merge of overlapping/adjacent [i, i+k) windows,
    per-doc rollup with zero-span docs kept."""
    return f"""
WITH d AS (
  SELECT doc_id, {TOKS} AS toks, len({TOKS})::BIGINT AS total_tokens
  FROM documents
),
sh AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(toks[i : i + {k} - 1], ' ')) AS h
  FROM d, LATERAL unnest(range(1, total_tokens - {k} + 2)) AS t(i)
  WHERE total_tokens >= {k}
),
hot AS (
  SELECT h FROM sh GROUP BY h HAVING count(*) >= 2
),
dup AS (
  SELECT doc_id, start, start + {k} - 1 AS "end"
  FROM sh WHERE h IN (SELECT h FROM hot)
),
marked AS (
  SELECT doc_id, start, "end",
         CASE WHEN max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start > max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM dup
),
islands AS (
  SELECT doc_id,
         sum(new_island) OVER (
           PARTITION BY doc_id ORDER BY start
         ) AS island,
         start, "end"
  FROM marked
),
spans AS (
  SELECT doc_id, island, max("end") - min(start) + 1 AS span_len
  FROM islands GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_spans,
         sum(span_len)::BIGINT AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id, d.total_tokens,
       COALESCE(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
       COALESCE(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       ROUND(COALESCE(p.dup_tokens, 0)::DOUBLE / d.total_tokens::DOUBLE, 6)
         + 0.0 AS dup_frac
FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def remove_duplicate_spans_sql(k: int = 8) -> str:
    """Twin of ``dedup.remove_duplicate_spans``: canonical occurrence
    (min (doc_id, start) per hot hash) survives; islands of the
    remaining hot windows are stripped; kept_md5 digests the surviving
    token stream in order."""
    return f"""
WITH d AS (
  SELECT doc_id, {TOKS} AS toks, len({TOKS})::BIGINT AS total_tokens
  FROM documents
),
sh AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(toks[i : i + {k} - 1], ' ')) AS h
  FROM d, LATERAL unnest(range(1, total_tokens - {k} + 2)) AS t(i)
  WHERE total_tokens >= {k}
),
ranked AS (
  SELECT doc_id, start, h,
         count(*) OVER (PARTITION BY h) AS n_occ,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
  FROM sh
),
removable AS (
  SELECT doc_id, start, start + {k} - 1 AS "end"
  FROM ranked WHERE n_occ >= 2 AND rn > 1
),
marked AS (
  SELECT doc_id, start, "end",
         CASE WHEN max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start > max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM removable
),
spans AS (
  SELECT doc_id,
         min(start) AS s, max("end") AS e
  FROM (
    SELECT doc_id, start, "end",
           sum(new_island) OVER (PARTITION BY doc_id ORDER BY start) AS island
    FROM marked
  ) GROUP BY doc_id, island
),
tok_pos AS (
  SELECT doc_id, i, toks[i] AS tok
  FROM d, LATERAL unnest(range(1, total_tokens + 1)) AS t(i)
),
kept AS (
  SELECT tp.doc_id, tp.i, tp.tok
  FROM tok_pos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM spans r
    WHERE r.doc_id = tp.doc_id AND tp.i BETWEEN r.s AND r.e
  )
),
removed AS (
  SELECT doc_id, sum(e - s + 1)::BIGINT AS removed_tokens
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id, d.total_tokens,
       COALESCE(r.removed_tokens, 0)::BIGINT AS removed_tokens,
       md5(COALESCE(
         (SELECT string_agg(tok, ' ' ORDER BY i)
          FROM kept WHERE kept.doc_id = d.doc_id), '')) AS kept_md5
FROM d LEFT JOIN removed r ON d.doc_id = r.doc_id
"""


def duplicate_char_spans_sql(k: int = 40) -> str:
    """Twin of ``dedup.duplicate_char_spans``: raw-text k-CHAR window
    md5s with positions (no tokenizer, no normalization), hot-hash
    filter (total occurrences ≥ 2), per-doc gaps-and-islands merge,
    per-doc rollup with zero-span docs kept."""
    return f"""
WITH d AS (
  SELECT doc_id, text AS txt, len(text)::BIGINT AS total_chars
  FROM documents
),
sh AS (
  SELECT doc_id, i AS start, md5(substr(txt, i::INT, {k})) AS h
  FROM d, LATERAL unnest(range(1, total_chars - {k} + 2)) AS t(i)
  WHERE total_chars >= {k}
),
hot AS (
  SELECT h FROM sh GROUP BY h HAVING count(*) >= 2
),
dup AS (
  SELECT doc_id, start, start + {k} - 1 AS "end"
  FROM sh WHERE h IN (SELECT h FROM hot)
),
marked AS (
  SELECT doc_id, start, "end",
         CASE WHEN max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start > max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM dup
),
islands AS (
  SELECT doc_id,
         sum(new_island) OVER (
           PARTITION BY doc_id ORDER BY start
         ) AS island,
         start, "end"
  FROM marked
),
spans AS (
  SELECT doc_id, island, max("end") - min(start) + 1 AS span_len
  FROM islands GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_spans,
         sum(span_len)::BIGINT AS dup_chars
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id, d.total_chars,
       COALESCE(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
       COALESCE(p.dup_chars, 0)::BIGINT AS dup_chars,
       ROUND(COALESCE(p.dup_chars, 0)::DOUBLE / d.total_chars::DOUBLE, 6)
         + 0.0 AS dup_frac
FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def remove_duplicate_char_spans_sql(k: int = 40) -> str:
    """Twin of ``dedup.remove_duplicate_char_spans``: canonical
    occurrence (min (doc_id, start) per hot window md5) survives;
    islands of the remaining hot windows are stripped; kept_md5
    digests the surviving CHARACTER stream in order (per-char
    enumeration here — the engine cuts complement segments, the md5
    proves both reassemblies byte-identical)."""
    return f"""
WITH d AS (
  SELECT doc_id, text AS txt, len(text)::BIGINT AS total_chars
  FROM documents
),
sh AS (
  SELECT doc_id, i AS start, md5(substr(txt, i::INT, {k})) AS h
  FROM d, LATERAL unnest(range(1, total_chars - {k} + 2)) AS t(i)
  WHERE total_chars >= {k}
),
ranked AS (
  SELECT doc_id, start, h,
         count(*) OVER (PARTITION BY h) AS n_occ,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
  FROM sh
),
removable AS (
  SELECT doc_id, start, start + {k} - 1 AS "end"
  FROM ranked WHERE n_occ >= 2 AND rn > 1
),
marked AS (
  SELECT doc_id, start, "end",
         CASE WHEN max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start > max("end") OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM removable
),
spans AS (
  SELECT doc_id,
         min(start) AS s, max("end") AS e
  FROM (
    SELECT doc_id, start, "end",
           sum(new_island) OVER (PARTITION BY doc_id ORDER BY start) AS island
    FROM marked
  ) GROUP BY doc_id, island
),
chars AS (
  SELECT doc_id, i, substr(txt, i::INT, 1) AS ch
  FROM d, LATERAL unnest(range(1, total_chars + 1)) AS t(i)
),
kept AS (
  SELECT c.doc_id, c.i, c.ch
  FROM chars c
  WHERE NOT EXISTS (
    SELECT 1 FROM spans r
    WHERE r.doc_id = c.doc_id AND c.i BETWEEN r.s AND r.e
  )
),
removed AS (
  SELECT doc_id, sum(e - s + 1)::BIGINT AS removed_chars
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id, d.total_chars,
       COALESCE(r.removed_chars, 0)::BIGINT AS removed_chars,
       md5(COALESCE(
         (SELECT string_agg(ch, '' ORDER BY i)
          FROM kept WHERE kept.doc_id = d.doc_id), '')) AS kept_md5
FROM d LEFT JOIN removed r ON d.doc_id = r.doc_id
"""


def perplexity_buckets_sql(n_buckets: int = 3) -> str:
    """Twin of ``textual.perplexity_buckets`` over the shared
    BIGRAM_LOGPROB score pipeline."""
    return f"""
WITH lp AS ({BIGRAM_LOGPROB})
SELECT d.doc_id, d.source, lp.mean_bigram_logprob,
       ntile({n_buckets}) OVER (
         PARTITION BY d.source
         ORDER BY lp.mean_bigram_logprob DESC, d.doc_id ASC
       )::BIGINT AS bucket,
       (ntile({n_buckets}) OVER (
         PARTITION BY d.source
         ORDER BY lp.mean_bigram_logprob DESC, d.doc_id ASC
       ) < {n_buckets}) AS keep
FROM documents d JOIN lp ON d.doc_id = lp.doc_id
"""


SOURCE_DIVERGENCE = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS tok FROM documents
),
cnt AS (
  SELECT source, tok, count(*) AS cnt FROM toks GROUP BY source, tok
),
tot AS (
  SELECT source, count(*) AS tot FROM toks GROUP BY source
),
dist AS (
  SELECT c.source, c.tok, c.cnt::DOUBLE / t.tot::DOUBLE AS p
  FROM cnt c JOIN tot t ON c.source = t.source
),
pairs_dim AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM tot a, tot b WHERE a.source < b.source
),
lhs AS (
  SELECT source_a, source_b, tok, p AS pa
  FROM pairs_dim JOIN dist ON dist.source = source_a
),
rhs AS (
  SELECT source_a, source_b, tok, p AS pb
  FROM pairs_dim JOIN dist ON dist.source = source_b
),
merged AS (
  SELECT COALESCE(lhs.source_a, rhs.source_a) AS source_a,
         COALESCE(lhs.source_b, rhs.source_b) AS source_b,
         COALESCE(pa, 0.0) AS pa, COALESCE(pb, 0.0) AS pb
  FROM lhs FULL OUTER JOIN rhs
    ON lhs.source_a = rhs.source_a AND lhs.source_b = rhs.source_b
   AND lhs.tok = rhs.tok
)
SELECT source_a, source_b,
       count(*)::BIGINT AS n_terms,
       ROUND(CAST(sum(ROUND(
         0.5 * (CASE WHEN pa > 0.0 THEN pa * ln(pa / ((pa + pb) / 2.0)) ELSE 0.0 END
              + CASE WHEN pb > 0.0 THEN pb * ln(pb / ((pa + pb) / 2.0)) ELSE 0.0 END),
         9)::DECIMAL(28,9)) AS DOUBLE), 6) + 0.0 AS js_divergence
FROM merged GROUP BY source_a, source_b
"""


def _weak_label_ctes() -> str:
    """Shared CTE prefix: weak-rule labels (NULL-filtered) + token
    stream — the training inputs of ``classify.nb_classify_docs``."""
    from .operators.textual import WEAK_LABEL_RULES

    vote_items = ", ".join(
        f"CASE WHEN regexp_matches(lower(text), '{pat}') THEN '{label}' END"
        for _, pat, label in WEAK_LABEL_RULES
    )
    labels = sorted({label for _, _, label in WEAK_LABEL_RULES})
    count_structs = ", ".join(
        "{'negc': -len(list_filter(cv, x -> x = '%s'))::BIGINT, "
        "'lab': '%s', 'c': len(list_filter(cv, x -> x = '%s'))::BIGINT}"
        % (lab, lab, lab)
        for lab in labels
    )
    return f"""
wv AS (
  SELECT doc_id, list_filter([{vote_items}], x -> x IS NOT NULL) AS cv
  FROM documents
),
lab AS (
  SELECT doc_id, (list_sort([{count_structs}])[1]).lab AS label
  FROM wv WHERE len(cv) > 0
),
toks AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents)
"""


def _nb_scored_ctes(alpha: float) -> str:
    """CTE chain producing ``best`` (argmax row per scored doc) —
    exact twin of the NB train/score plan, decimal-summed."""
    return f"""
train AS (SELECT t.tok, l.label FROM toks t JOIN lab l USING (doc_id)),
model AS (SELECT label, tok, count(*)::BIGINT AS c FROM train GROUP BY 1, 2),
consts0 AS (
  SELECT (SELECT count(DISTINCT tok) FROM model)::DOUBLE AS v_size,
         (SELECT count(*) FROM lab)::DOUBLE AS n_train
),
label_consts AS (
  SELECT m.label,
         ROUND(ln(m.total_c::DOUBLE + {alpha} * c0.v_size), 9) AS ln_z,
         ROUND(ln(d.n_docs_l::DOUBLE / c0.n_train), 9) AS ln_prior
  FROM (SELECT label, sum(c)::BIGINT AS total_c FROM model GROUP BY 1) m
  JOIN (SELECT label, count(*)::BIGINT AS n_docs_l FROM lab GROUP BY 1) d
    USING (label)
  CROSS JOIN consts0 c0
),
grid AS (
  SELECT v.tok, l.label FROM (SELECT DISTINCT tok FROM model) v
  CROSS JOIN (SELECT DISTINCT label FROM lab) l
),
model_full AS (
  SELECT g.tok, g.label,
         CAST(ROUND(ln(COALESCE(m.c, 0)::DOUBLE + {alpha}), 9)
              AS DECIMAL(18,9)) AS ln_num
  FROM grid g LEFT JOIN model m ON m.tok = g.tok AND m.label = g.label
),
doc_tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
evidence AS (
  SELECT d.doc_id, mf.label,
         SUM(mf.ln_num * CAST(d.tf AS DECIMAL(10,0))) AS s_num,
         SUM(d.tf)::BIGINT AS t_d
  FROM doc_tf d JOIN model_full mf USING (tok)
  GROUP BY 1, 2
),
scored AS (
  SELECT e.doc_id, e.label, e.t_d,
         ROUND(e.s_num::DOUBLE - e.t_d::DOUBLE * lc.ln_z + lc.ln_prior, 6)
           + 0.0 AS score
  FROM evidence e JOIN label_consts lc USING (label)
),
best AS (
  SELECT doc_id, label, score, t_d,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rk
  FROM scored
)
"""


def nb_classify_sql(alpha: float = 1.0) -> str:
    return f"""
WITH {_weak_label_ctes()}, {_nb_scored_ctes(alpha)}
SELECT d.doc_id,
       b.label AS predicted_label,
       b.score AS score,
       COALESCE(b.t_d, 0)::BIGINT AS n_evidence_tokens
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
"""


def nb_label_report_sql(alpha: float = 1.0) -> str:
    return f"""
WITH {_weak_label_ctes()}, {_nb_scored_ctes(alpha)},
pred AS (
  SELECT d.doc_id,
         b.label AS predicted_label,
         b.score AS score
  FROM documents d
  LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
),
rules AS (
  SELECT wv.doc_id,
         CASE WHEN len(cv) > 0 THEN l.label END AS rule_label
  FROM wv LEFT JOIN lab l USING (doc_id)
)
SELECT r.rule_label, p.predicted_label,
       count(*)::BIGINT AS n_docs,
       ROUND(SUM(CAST(p.score AS DECIMAL(28,6)))::DOUBLE
             / count(p.score)::DOUBLE, 6) + 0.0 AS mean_score
FROM pred p LEFT JOIN rules r USING (doc_id)
GROUP BY 1, 2
"""


SOURCE_OVERLAP_MATRIX = f"""
WITH sizes AS (
  SELECT md5(array_to_string(list_sort(list_distinct({TOKS})), ' '))
           AS text_hash,
         source AS src, count(*)::BIGINT AS g
  FROM documents GROUP BY 1, 2
),
same AS (
  SELECT src AS source_a, src AS source_b, text_hash,
         (g * (g - 1) // 2)::BIGINT AS pairs
  FROM sizes WHERE g >= 2
),
crossed AS (
  SELECT a.src AS source_a, b.src AS source_b, a.text_hash,
         (a.g * b.g)::BIGINT AS pairs
  FROM sizes a JOIN sizes b
    ON a.text_hash = b.text_hash AND a.src < b.src
)
SELECT source_a, source_b, SUM(pairs)::BIGINT AS n_pairs,
       count(DISTINCT text_hash)::BIGINT AS n_groups
FROM (SELECT * FROM same UNION ALL SELECT * FROM crossed)
GROUP BY 1, 2
"""


def neardup_edit_distance_sql(
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    max_rel_dist: float = 0.2,
) -> str:
    """Twin of ``dedup.neardup_edit_distance``: the md5 banding of
    ``minhash_lsh_md5_sql`` for candidates, then exact integer
    Levenshtein (identical algorithm in both engines) with the
    relative-distance cut against the longer text."""
    rows = num_hashes // bands
    sig_elems = ", ".join(
        f"list_min(list_transform(sh, s -> md5('mh{i}:' || s)))"
        for i in range(num_hashes)
    )
    band_structs = ", ".join(
        "struct_pack(band := {b}, bkey := md5({key}))".format(
            b=b,
            key=" || ',' || ".join(
                f"sig[{b * rows + r + 1}]" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (SELECT doc_id AS id, {TOKS} AS t FROM documents),
sh AS (SELECT id, list_distinct({_shingles(n)}) AS sh FROM toks),
sig AS (SELECT id, sh, [{sig_elems}] AS sig FROM sh),
exploded AS (SELECT id, unnest([{band_structs}]) AS u FROM sig),
banded AS (SELECT id, u.band AS band, u.bkey AS bkey FROM exploded),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
scored AS (
  SELECT id_a, id_b,
         levenshtein(da.text, db.text)::BIGINT AS dist,
         greatest(length(da.text), length(db.text))::BIGINT AS longer
  FROM cand
  JOIN documents da ON da.doc_id = cand.id_a
  JOIN documents db ON db.doc_id = cand.id_b
),
kept AS (
  -- exact integer cut, same predicate as the Spark side:
  -- dist <= max_rel_dist * longer  <=>  raw rel <= max_rel_dist
  SELECT * FROM scored WHERE dist::DOUBLE <= {max_rel_dist} * longer::DOUBLE
)
SELECT id_a, id_b, dist,
       CASE WHEN longer = 0 THEN 0.0
            ELSE ROUND(dist::DOUBLE / longer::DOUBLE, 6) + 0.0
       END AS rel_dist
FROM kept ORDER BY id_a, id_b
"""


def tfidf_related_docs_sql(n: int = 3, k: int = 3) -> str:
    """Twin of ``sparse_sim.tfidf_related_docs``: same weighted dots
    as tfidf_cosine_sql (no threshold), both pair orientations, per-
    source row_number over (cosine DESC, neighbor ASC) after ROUND(6)."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest({_shingles(n)}) AS feat FROM toks),
tf AS (SELECT doc_id, feat, count(*)::BIGINT AS tf FROM sh GROUP BY doc_id, feat),
dfreq AS (SELECT feat, count(*)::BIGINT AS dfreq FROM tf GROUP BY feat),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
w AS (
  SELECT doc_id, feat,
         ROUND(tf::DOUBLE * ln(n_docs / dfreq::DOUBLE), 6) + 0.0 AS w
  FROM tf JOIN dfreq USING (feat) CROSS JOIN n
  WHERE dfreq < n_docs
),
norms AS (
  SELECT doc_id,
         sqrt(CAST(sum(CAST(ROUND(w * w, 9) AS DECIMAL(28,9))) AS DOUBLE)) AS nrm
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(sum(CAST(ROUND(a.w * b.w, 9) AS DECIMAL(28,9))) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.feat = b.feat AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, ROUND(dot / (na.nrm * nb.nrm), 6) + 0.0 AS cosine
  FROM dots
  JOIN norms na ON na.doc_id = id_a
  JOIN norms nb ON nb.doc_id = id_b
),
oriented AS (
  SELECT id_a AS doc_id, id_b AS neighbor_id, cosine FROM scored
  UNION ALL
  SELECT id_b AS doc_id, id_a AS neighbor_id, cosine FROM scored
),
ranked AS (
  SELECT doc_id, neighbor_id, cosine,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY cosine DESC, neighbor_id ASC
         )::BIGINT AS rk
  FROM oriented
)
SELECT doc_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {k}
"""


def _snm_pass_sql(
    text_expr: str, key_len: int, window: int, max_rel_dist: float
) -> str:
    """One sorted-neighborhood pass over ``text_expr``: global
    row_number over (normalized-prefix key, doc_id), pairs within
    window-1 ranks, exact-integer Levenshtein cut."""
    key = (
        f"substr(regexp_replace(lower(trim({text_expr})), '\\s+', ' ', 'g'),"
        f" 1, {key_len})"
    )
    return f"""
  SELECT least(a.doc_id, b.doc_id) AS id_a,
         greatest(a.doc_id, b.doc_id) AS id_b,
         levenshtein(a.t, b.t)::BIGINT AS dist,
         greatest(len(a.t), len(b.t)) AS longer
  FROM (SELECT doc_id, {text_expr} AS t,
               row_number() OVER (ORDER BY {key}, doc_id) AS rnk
        FROM documents) a
  JOIN (SELECT doc_id, {text_expr} AS t,
               row_number() OVER (ORDER BY {key}, doc_id) AS rnk
        FROM documents) b
    ON b.rnk > a.rnk AND b.rnk <= a.rnk + {window - 1}
  WHERE levenshtein(a.t, b.t)::DOUBLE <= {max_rel_dist} * greatest(len(a.t), len(b.t))::DOUBLE
"""


def sorted_neighborhood_sql(
    key_len: int = 24, window: int = 8, max_rel_dist: float = 0.2
) -> str:
    """Twin of ``blocking.sorted_neighborhood_pairs``."""
    return f"""
WITH kept AS ({_snm_pass_sql("text", key_len, window, max_rel_dist)})
SELECT id_a, id_b, dist,
       CASE WHEN longer = 0 THEN 0.0
            ELSE ROUND(dist::DOUBLE / longer::DOUBLE, 6) + 0.0
       END AS rel_dist
FROM kept
"""


def sorted_neighborhood_multi_key_sql(
    key_len: int = 24, window: int = 8, max_rel_dist: float = 0.2
) -> str:
    """Twin of ``blocking.sorted_neighborhood_multi_key``: pass 1 on
    the text, pass 2 on the reversed text (Levenshtein and lengths
    are reverse-invariant, so the union deduplicates exactly)."""
    p1 = _snm_pass_sql("text", key_len, window, max_rel_dist)
    p2 = _snm_pass_sql("reverse(text)", key_len, window, max_rel_dist)
    return f"""
WITH kept AS (SELECT * FROM ({p1}) UNION ALL SELECT * FROM ({p2}))
SELECT DISTINCT id_a, id_b, dist,
       CASE WHEN longer = 0 THEN 0.0
            ELSE ROUND(dist::DOUBLE / longer::DOUBLE, 6) + 0.0
       END AS rel_dist
FROM kept
"""


def script_profile_sql() -> str:
    """Twin of :func:`operators.textual.script_profile` — RE2 script
    classes mirror Java's Is-prefixed ones (same Unicode property)."""
    from .operators.textual import SCRIPT_CLASSES

    cnt = {
        name: (
            f"(length(text) - length(regexp_replace(text, '\\p{{{re2}}}', '', 'g')))::BIGINT"
        )
        for name, _, re2 in SCRIPT_CLASSES
    }
    n = len(SCRIPT_CLASSES)
    # DuckDB's greatest() is scalar-only; list_max over structs gives
    # the same lexicographic (count, reversed-name-rank) argmax
    best = "list_max([" + ", ".join(
        f"struct_pack(c := {cnt[name]}, r := {n - i}, s := '{name}')"
        for i, (name, _, _) in enumerate(SCRIPT_CLASSES)
    ) + "])"
    cols = ", ".join(f"{cnt[name]} AS {name}" for name, _, _ in SCRIPT_CLASSES)
    return f"""
SELECT doc_id, {cols},
       CASE WHEN ({best}).c = 0 THEN 'other'
            ELSE ({best}).s END AS dominant_script
FROM documents ORDER BY doc_id
"""


def kneser_ney_sql(discount: float = 0.75) -> str:
    """Twin of textual.kneser_ney_logprob — same exact-integer
    statistics, same double association order, ROUND(ln,9) decimal
    sum."""
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
pairs AS (
  SELECT doc_id,
         unnest(list_slice(toks, 1, len(toks) - 1)) AS prev,
         unnest(list_slice(toks, 2, len(toks))) AS cur
  FROM t WHERE len(toks) >= 2
),
docpair AS (SELECT doc_id, prev, cur, count(*) AS n FROM pairs GROUP BY 1, 2, 3),
c2 AS (SELECT prev, cur, sum(n)::BIGINT AS c2 FROM docpair GROUP BY prev, cur),
c1 AS (SELECT prev, sum(c2)::BIGINT AS c1, count(*)::BIGINT AS n1p_prev FROM c2 GROUP BY prev),
nc AS (SELECT cur, count(*)::BIGINT AS n1p_cur FROM c2 GROUP BY cur),
tot AS (SELECT count(*)::BIGINT AS n1p_total FROM c2),
scored AS (
  SELECT doc_id, n,
         ROUND(ln(
           (c2.c2::DOUBLE - {discount}) / c1.c1::DOUBLE
           + (({discount} * c1.n1p_prev) / c1.c1::DOUBLE)
             * (nc.n1p_cur::DOUBLE / tot.n1p_total::DOUBLE)
         ), 9) AS lp
  FROM docpair
  JOIN c2 USING (prev, cur) JOIN c1 USING (prev) JOIN nc USING (cur)
  CROSS JOIN tot
)
SELECT doc_id,
       sum(n)::BIGINT AS n_bigrams,
       ROUND(
         CAST(sum(CAST(n AS DECIMAL(12,0)) * CAST(lp AS DECIMAL(20,9))) AS DOUBLE)
         / sum(n), 6
       ) + 0.0 AS mean_kn_logprob
FROM scored
GROUP BY doc_id
"""


def _kn5_body(discount: float = 0.75) -> str:
    """Shared CTE body for the interpolated 5-gram Kneser-Ney model
    (twin of ``textual.kneser_ney5_logprob``): BOS×4/EOS padding, one
    corpus 5-gram aggregate, the Chen-Goodman continuation cascade
    (c5 → kn4 → kn3 → kn2 → kn1, each level = distinct left
    extensions of the level above), and the per-doc decimal-weighted
    mean with the exact Spark association order.

    Every CTE is MATERIALIZED: the cascade references each level
    multiple times (c5 feeds topctx, kn4 AND the scored join), and
    DuckDB's default inlining re-evaluates the whole chain per
    reference — measured minutes at 50 docs vs 0.2 s materialized."""
    D = discount
    return f"""
t AS MATERIALIZED (
  SELECT doc_id,
         ['<s>','<s>','<s>','<s>'] || {TOKS} || ['</s>'] AS p
  FROM documents
),
g AS MATERIALIZED (
  SELECT doc_id,
         p[i::INT] AS g1, p[(i+1)::INT] AS g2, p[(i+2)::INT] AS g3,
         p[(i+3)::INT] AS g4, p[(i+4)::INT] AS g5
  FROM t, LATERAL unnest(range(1, len(p) - 3)) AS r(i)
),
docg AS MATERIALIZED (
  SELECT doc_id, g1, g2, g3, g4, g5, count(*)::BIGINT AS n
  FROM g GROUP BY 1, 2, 3, 4, 5, 6
),
c5 AS MATERIALIZED (
  SELECT g1, g2, g3, g4, g5, sum(n)::BIGINT AS c5
  FROM docg GROUP BY 1, 2, 3, 4, 5
),
topctx AS MATERIALIZED (
  SELECT g1, g2, g3, g4, sum(c5)::BIGINT AS ctx5,
         count(*)::BIGINT AS n1p5
  FROM c5 GROUP BY 1, 2, 3, 4
),
kn4 AS MATERIALIZED (
  SELECT g2, g3, g4, g5, count(*)::BIGINT AS ckn4
  FROM c5 GROUP BY 1, 2, 3, 4
),
kn4ctx AS MATERIALIZED (
  SELECT g2, g3, g4, sum(ckn4)::BIGINT AS ctx4,
         count(*)::BIGINT AS n1p4
  FROM kn4 GROUP BY 1, 2, 3
),
kn3 AS MATERIALIZED (
  SELECT g3, g4, g5, count(*)::BIGINT AS ckn3
  FROM kn4 GROUP BY 1, 2, 3
),
kn3ctx AS MATERIALIZED (
  SELECT g3, g4, sum(ckn3)::BIGINT AS ctx3,
         count(*)::BIGINT AS n1p3
  FROM kn3 GROUP BY 1, 2
),
kn2 AS MATERIALIZED (
  SELECT g4, g5, count(*)::BIGINT AS ckn2
  FROM kn3 GROUP BY 1, 2
),
kn2ctx AS MATERIALIZED (
  SELECT g4, sum(ckn2)::BIGINT AS ctx2,
         count(*)::BIGINT AS n1p2
  FROM kn2 GROUP BY 1
),
kn1 AS MATERIALIZED (
  SELECT g5, count(*)::BIGINT AS ckn1
  FROM kn2 GROUP BY 1
),
tot AS MATERIALIZED (SELECT sum(ckn1)::BIGINT AS tot1 FROM kn1),
scored AS MATERIALIZED (
  SELECT docg.doc_id, docg.n,
         ROUND(ln(
           greatest(c5.c5::DOUBLE - {D}, 0.0) / topctx.ctx5::DOUBLE
           + (({D} * topctx.n1p5) / topctx.ctx5::DOUBLE) * (
             greatest(kn4.ckn4::DOUBLE - {D}, 0.0) / kn4ctx.ctx4::DOUBLE
             + (({D} * kn4ctx.n1p4) / kn4ctx.ctx4::DOUBLE) * (
               greatest(kn3.ckn3::DOUBLE - {D}, 0.0) / kn3ctx.ctx3::DOUBLE
               + (({D} * kn3ctx.n1p3) / kn3ctx.ctx3::DOUBLE) * (
                 greatest(kn2.ckn2::DOUBLE - {D}, 0.0) / kn2ctx.ctx2::DOUBLE
                 + (({D} * kn2ctx.n1p2) / kn2ctx.ctx2::DOUBLE)
                   * (kn1.ckn1::DOUBLE / tot.tot1::DOUBLE)
               )
             )
           )
         ), 9) AS lp
  FROM docg
  JOIN c5 USING (g1, g2, g3, g4, g5)
  JOIN topctx USING (g1, g2, g3, g4)
  JOIN kn4 USING (g2, g3, g4, g5)
  JOIN kn4ctx USING (g2, g3, g4)
  JOIN kn3 USING (g3, g4, g5)
  JOIN kn3ctx USING (g3, g4)
  JOIN kn2 USING (g4, g5)
  JOIN kn2ctx USING (g4)
  JOIN kn1 USING (g5)
  CROSS JOIN tot
),
kn5_per_doc AS MATERIALIZED (
  SELECT doc_id,
         sum(n)::BIGINT AS n_grams,
         ROUND(
           CAST(sum(CAST(n AS DECIMAL(12,0)) * CAST(lp AS DECIMAL(20,9))) AS DOUBLE)
           / sum(n), 6
         ) + 0.0 AS mean_kn5_logprob
  FROM scored GROUP BY doc_id
)"""


def kneser_ney5_modified_sql() -> str:
    """Twin of ``textual.kneser_ney5_modified_logprob`` — modified KN
    (Chen & Goodman 1999): per-level D1/D2/D3+ from count-of-counts,
    count-class discount selection, matching backoff mass; identical
    degenerate fallbacks (D1→0.5, D2→1.0, D3+→1.5) and double
    association order. All CTEs MATERIALIZED (the cascade lesson)."""
    return """
WITH t AS MATERIALIZED (
  SELECT doc_id,
         ['<s>','<s>','<s>','<s>'] || """ + TOKS + """ || ['</s>'] AS p
  FROM documents
),
g AS MATERIALIZED (
  SELECT doc_id,
         p[i::INT] AS g1, p[(i+1)::INT] AS g2, p[(i+2)::INT] AS g3,
         p[(i+3)::INT] AS g4, p[(i+4)::INT] AS g5
  FROM t, LATERAL unnest(range(1, len(p) - 3)) AS r(i)
),
docg AS MATERIALIZED (
  SELECT doc_id, g1, g2, g3, g4, g5, count(*)::BIGINT AS n
  FROM g GROUP BY 1, 2, 3, 4, 5, 6
),
c5 AS MATERIALIZED (
  SELECT g1, g2, g3, g4, g5, sum(n)::BIGINT AS c5
  FROM docg GROUP BY 1, 2, 3, 4, 5
),
kn4 AS MATERIALIZED (
  SELECT g2, g3, g4, g5, count(*)::BIGINT AS c4 FROM c5 GROUP BY 1, 2, 3, 4
),
kn3 AS MATERIALIZED (
  SELECT g3, g4, g5, count(*)::BIGINT AS c3 FROM kn4 GROUP BY 1, 2, 3
),
kn2 AS MATERIALIZED (
  SELECT g4, g5, count(*)::BIGINT AS c2 FROM kn3 GROUP BY 1, 2
),
kn1 AS MATERIALIZED (
  SELECT g5, count(*)::BIGINT AS ckn1 FROM kn2 GROUP BY 1
),
tot AS MATERIALIZED (SELECT sum(ckn1)::BIGINT AS tot1 FROM kn1),
ctx5 AS MATERIALIZED (
  SELECT g1, g2, g3, g4, sum(c5)::BIGINT AS ctx5,
         sum(CASE WHEN c5 = 1 THEN 1 ELSE 0 END)::BIGINT AS nd1_5,
         sum(CASE WHEN c5 = 2 THEN 1 ELSE 0 END)::BIGINT AS nd2_5,
         sum(CASE WHEN c5 >= 3 THEN 1 ELSE 0 END)::BIGINT AS nd3_5
  FROM c5 GROUP BY 1, 2, 3, 4
),
ctx4 AS MATERIALIZED (
  SELECT g2, g3, g4, sum(c4)::BIGINT AS ctx4,
         sum(CASE WHEN c4 = 1 THEN 1 ELSE 0 END)::BIGINT AS nd1_4,
         sum(CASE WHEN c4 = 2 THEN 1 ELSE 0 END)::BIGINT AS nd2_4,
         sum(CASE WHEN c4 >= 3 THEN 1 ELSE 0 END)::BIGINT AS nd3_4
  FROM kn4 GROUP BY 1, 2, 3
),
ctx3 AS MATERIALIZED (
  SELECT g3, g4, sum(c3)::BIGINT AS ctx3,
         sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END)::BIGINT AS nd1_3,
         sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END)::BIGINT AS nd2_3,
         sum(CASE WHEN c3 >= 3 THEN 1 ELSE 0 END)::BIGINT AS nd3_3
  FROM kn3 GROUP BY 1, 2
),
ctx2 AS MATERIALIZED (
  SELECT g4, sum(c2)::BIGINT AS ctx2,
         sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END)::BIGINT AS nd1_2,
         sum(CASE WHEN c2 = 2 THEN 1 ELSE 0 END)::BIGINT AS nd2_2,
         sum(CASE WHEN c2 >= 3 THEN 1 ELSE 0 END)::BIGINT AS nd3_2
  FROM kn2 GROUP BY 1
),
disc5 AS MATERIALIZED (
  SELECT
    CASE WHEN n1 > 0 AND (n1 + 2 * n2) > 0
         THEN greatest(1.0 - 2.0 * y * (n2::DOUBLE / n1::DOUBLE), 0.0)
         ELSE 0.5 END AS d1_5,
    CASE WHEN n2 > 0 AND n1 > 0
         THEN greatest(2.0 - 3.0 * y * (n3::DOUBLE / n2::DOUBLE), 0.0)
         ELSE 1.0 END AS d2_5,
    CASE WHEN n3 > 0 AND n1 > 0
         THEN greatest(3.0 - 4.0 * y * (n4::DOUBLE / n3::DOUBLE), 0.0)
         ELSE 1.5 END AS d3_5
  FROM (
    SELECT n1, n2, n3, n4,
           n1::DOUBLE / (n1::DOUBLE + 2.0 * n2::DOUBLE) AS y
    FROM (
      SELECT sum(CASE WHEN c5 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN c5 = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CASE WHEN c5 = 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
             sum(CASE WHEN c5 = 4 THEN 1 ELSE 0 END)::BIGINT AS n4
      FROM c5
    )
  )
),
disc4 AS MATERIALIZED (
  SELECT
    CASE WHEN n1 > 0 AND (n1 + 2 * n2) > 0
         THEN greatest(1.0 - 2.0 * y * (n2::DOUBLE / n1::DOUBLE), 0.0)
         ELSE 0.5 END AS d1_4,
    CASE WHEN n2 > 0 AND n1 > 0
         THEN greatest(2.0 - 3.0 * y * (n3::DOUBLE / n2::DOUBLE), 0.0)
         ELSE 1.0 END AS d2_4,
    CASE WHEN n3 > 0 AND n1 > 0
         THEN greatest(3.0 - 4.0 * y * (n4::DOUBLE / n3::DOUBLE), 0.0)
         ELSE 1.5 END AS d3_4
  FROM (
    SELECT n1, n2, n3, n4,
           n1::DOUBLE / (n1::DOUBLE + 2.0 * n2::DOUBLE) AS y
    FROM (
      SELECT sum(CASE WHEN c4 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN c4 = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CASE WHEN c4 = 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
             sum(CASE WHEN c4 = 4 THEN 1 ELSE 0 END)::BIGINT AS n4
      FROM kn4
    )
  )
),
disc3 AS MATERIALIZED (
  SELECT
    CASE WHEN n1 > 0 AND (n1 + 2 * n2) > 0
         THEN greatest(1.0 - 2.0 * y * (n2::DOUBLE / n1::DOUBLE), 0.0)
         ELSE 0.5 END AS d1_3,
    CASE WHEN n2 > 0 AND n1 > 0
         THEN greatest(2.0 - 3.0 * y * (n3::DOUBLE / n2::DOUBLE), 0.0)
         ELSE 1.0 END AS d2_3,
    CASE WHEN n3 > 0 AND n1 > 0
         THEN greatest(3.0 - 4.0 * y * (n4::DOUBLE / n3::DOUBLE), 0.0)
         ELSE 1.5 END AS d3_3
  FROM (
    SELECT n1, n2, n3, n4,
           n1::DOUBLE / (n1::DOUBLE + 2.0 * n2::DOUBLE) AS y
    FROM (
      SELECT sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CASE WHEN c3 = 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
             sum(CASE WHEN c3 = 4 THEN 1 ELSE 0 END)::BIGINT AS n4
      FROM kn3
    )
  )
),
disc2 AS MATERIALIZED (
  SELECT
    CASE WHEN n1 > 0 AND (n1 + 2 * n2) > 0
         THEN greatest(1.0 - 2.0 * y * (n2::DOUBLE / n1::DOUBLE), 0.0)
         ELSE 0.5 END AS d1_2,
    CASE WHEN n2 > 0 AND n1 > 0
         THEN greatest(2.0 - 3.0 * y * (n3::DOUBLE / n2::DOUBLE), 0.0)
         ELSE 1.0 END AS d2_2,
    CASE WHEN n3 > 0 AND n1 > 0
         THEN greatest(3.0 - 4.0 * y * (n4::DOUBLE / n3::DOUBLE), 0.0)
         ELSE 1.5 END AS d3_2
  FROM (
    SELECT n1, n2, n3, n4,
           n1::DOUBLE / (n1::DOUBLE + 2.0 * n2::DOUBLE) AS y
    FROM (
      SELECT sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN c2 = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CASE WHEN c2 = 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
             sum(CASE WHEN c2 = 4 THEN 1 ELSE 0 END)::BIGINT AS n4
      FROM kn2
    )
  )
),
scored AS MATERIALIZED (
  SELECT docg.doc_id, docg.n,
         ROUND(ln(
           greatest(c5.c5::DOUBLE - (CASE WHEN c5.c5 = 1 THEN d1_5
                                          WHEN c5.c5 = 2 THEN d2_5
                                          ELSE d3_5 END), 0.0)
             / ctx5.ctx5::DOUBLE
           + ((d1_5 * nd1_5 + d2_5 * nd2_5 + d3_5 * nd3_5)
              / ctx5.ctx5::DOUBLE) * (
             greatest(kn4.c4::DOUBLE - (CASE WHEN kn4.c4 = 1 THEN d1_4
                                             WHEN kn4.c4 = 2 THEN d2_4
                                             ELSE d3_4 END), 0.0)
               / ctx4.ctx4::DOUBLE
             + ((d1_4 * nd1_4 + d2_4 * nd2_4 + d3_4 * nd3_4)
                / ctx4.ctx4::DOUBLE) * (
               greatest(kn3.c3::DOUBLE - (CASE WHEN kn3.c3 = 1 THEN d1_3
                                               WHEN kn3.c3 = 2 THEN d2_3
                                               ELSE d3_3 END), 0.0)
                 / ctx3.ctx3::DOUBLE
               + ((d1_3 * nd1_3 + d2_3 * nd2_3 + d3_3 * nd3_3)
                  / ctx3.ctx3::DOUBLE) * (
                 greatest(kn2.c2::DOUBLE - (CASE WHEN kn2.c2 = 1 THEN d1_2
                                                 WHEN kn2.c2 = 2 THEN d2_2
                                                 ELSE d3_2 END), 0.0)
                   / ctx2.ctx2::DOUBLE
                 + ((d1_2 * nd1_2 + d2_2 * nd2_2 + d3_2 * nd3_2)
                    / ctx2.ctx2::DOUBLE)
                   * (kn1.ckn1::DOUBLE / tot.tot1::DOUBLE)
               )
             )
           )
         ), 9) AS lp
  FROM docg
  JOIN c5 USING (g1, g2, g3, g4, g5)
  JOIN ctx5 USING (g1, g2, g3, g4)
  JOIN kn4 USING (g2, g3, g4, g5)
  JOIN ctx4 USING (g2, g3, g4)
  JOIN kn3 USING (g3, g4, g5)
  JOIN ctx3 USING (g3, g4)
  JOIN kn2 USING (g4, g5)
  JOIN ctx2 USING (g4)
  JOIN kn1 USING (g5)
  CROSS JOIN tot
  CROSS JOIN disc5 CROSS JOIN disc4 CROSS JOIN disc3 CROSS JOIN disc2
)
SELECT doc_id,
       sum(n)::BIGINT AS n_grams,
       ROUND(
         CAST(sum(CAST(n AS DECIMAL(12,0)) * CAST(lp AS DECIMAL(20,9))) AS DOUBLE)
         / sum(n), 6
       ) + 0.0 AS mean_mkn5_logprob
FROM scored
GROUP BY doc_id
"""


def kneser_ney5_sql(discount: float = 0.75) -> str:
    """Twin of ``textual.kneser_ney5_logprob``."""
    return f"""
WITH {_kn5_body(discount)}
SELECT doc_id, n_grams, mean_kn5_logprob FROM kn5_per_doc
"""


def perplexity_buckets_kn5_sql(
    n_buckets: int = 3, discount: float = 0.75
) -> str:
    """Twin of ``textual.perplexity_buckets_kn5`` — the CCNet tiles
    over the 5-gram KN score."""
    return f"""
WITH {_kn5_body(discount)}
SELECT d.doc_id, d.source, lp.mean_kn5_logprob,
       ntile({n_buckets}) OVER (
         PARTITION BY d.source
         ORDER BY lp.mean_kn5_logprob DESC, d.doc_id ASC
       )::BIGINT AS bucket,
       (ntile({n_buckets}) OVER (
         PARTITION BY d.source
         ORDER BY lp.mean_kn5_logprob DESC, d.doc_id ASC
       ) < {n_buckets}) AS keep
FROM documents d JOIN kn5_per_doc lp ON d.doc_id = lp.doc_id
"""


def paragraph_dedup_sql() -> str:
    """Twin of :func:`operators.dedup.paragraph_dedup_docs`: identical
    paragraph augmentation (shared header/footer variants), blank-line
    split with positions (two unnests zip positionally in DuckDB),
    corpus-wide keep-first election by (doc_id, idx), and the
    cleaned-stream md5 over the surviving paragraphs in order."""
    sep = "chr(10) || chr(10)"
    return f"""
WITH aug AS (
  SELECT doc_id,
         'shared header ' || CAST(doc_id % 5 AS VARCHAR) || {sep} ||
         text || {sep} || 'shared footer ' || CAST(doc_id % 3 AS VARCHAR)
           AS ptext
  FROM documents
),
ps AS (SELECT doc_id, string_split(ptext, {sep}) AS paras FROM aug),
ex AS (
  SELECT doc_id,
         unnest(generate_series(0, len(paras) - 1)) AS idx,
         unnest(paras) AS para
  FROM ps
),
h AS (SELECT doc_id, idx, para, md5(para) AS pmd5 FROM ex),
k AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY pmd5 ORDER BY doc_id, idx) AS rn
  FROM h
)
SELECT doc_id,
       count(*)::BIGINT AS n_paras,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       md5(coalesce(
         string_agg(CASE WHEN rn = 1 THEN para END, {sep} ORDER BY idx), ''
       )) AS clean_md5
FROM k GROUP BY doc_id ORDER BY doc_id
"""


def zipf_fit_sql(top_n: int = 500) -> str:
    """Twin of :func:`operators.textual.zipf_fit`: identical rank
    order, ROUND(term,9) decimal sums, the same double association
    order for the closed-form slope/intercept."""
    return f"""
WITH toks AS (
  SELECT unnest({TOKS}) AS token FROM documents
),
tf AS (
  SELECT token, count(*)::BIGINT AS cnt FROM toks
  WHERE token != '' GROUP BY token
),
top AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token) AS rnk
  FROM tf QUALIFY rnk <= {top_n}
),
agg AS (
  SELECT count(*)::BIGINT AS n_fit,
         CAST(sum(CAST(ROUND(ln(rnk::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sx,
         CAST(sum(CAST(ROUND(ln(cnt::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sy,
         CAST(sum(CAST(ROUND(ln(rnk::DOUBLE) * ln(cnt::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(ROUND(ln(rnk::DOUBLE) * ln(rnk::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxx
  FROM top
)
SELECT n_fit,
       ROUND((n_fit::DOUBLE * sxy - sx * sy) / (n_fit::DOUBLE * sxx - sx * sx), 6) + 0.0 AS slope,
       ROUND((sy - ((n_fit::DOUBLE * sxy - sx * sy) / (n_fit::DOUBLE * sxx - sx * sx)) * sx) / n_fit::DOUBLE, 6) + 0.0 AS intercept
FROM agg
"""


def heaps_fit_sql(n_points: int = 10) -> str:
    """Twin of :func:`operators.textual.heaps_fit`: identical integer
    cutoffs (floor division), exact first-doc / token-mass integers,
    the zipf decimal regression contract."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
tok2 AS (SELECT doc_id, token FROM tok WHERE token != ''),
mx AS (SELECT max(doc_id) AS m FROM documents),
cuts AS (
  SELECT pt, (pt * (m + 1)) // {n_points} AS cutoff
  FROM generate_series(1, {n_points}) AS g(pt) CROSS JOIN mx
),
first AS (SELECT token, min(doc_id) AS first_doc FROM tok2 GROUP BY token),
per_doc AS (SELECT doc_id, count(*)::BIGINT AS n_toks FROM tok2 GROUP BY doc_id),
v AS (
  SELECT pt, count(*)::BIGINT AS v
  FROM cuts JOIN first ON first_doc < cutoff GROUP BY pt
),
nmass AS (
  SELECT pt, sum(n_toks)::BIGINT AS n_mass
  FROM cuts JOIN per_doc ON doc_id < cutoff GROUP BY pt
),
pts AS (
  SELECT v.pt, v.v, nmass.n_mass FROM v JOIN nmass ON v.pt = nmass.pt
  WHERE v.v > 0 AND nmass.n_mass > 0
),
agg AS (
  SELECT count(*)::BIGINT AS n_points,
         CAST(sum(CAST(ROUND(ln(n_mass::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sx,
         CAST(sum(CAST(ROUND(ln(v::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sy,
         CAST(sum(CAST(ROUND(ln(n_mass::DOUBLE) * ln(v::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(ROUND(ln(n_mass::DOUBLE) * ln(n_mass::DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxx
  FROM pts
)
SELECT n_points,
       ROUND((n_points::DOUBLE * sxy - sx * sy) / (n_points::DOUBLE * sxx - sx * sx), 6) + 0.0 AS beta,
       ROUND((sy - ((n_points::DOUBLE * sxy - sx * sy) / (n_points::DOUBLE * sxx - sx * sx)) * sx) / n_points::DOUBLE, 6) + 0.0 AS ln_k
FROM agg
"""


def phrase_search_sql(phrase: tuple[str, ...]) -> str:
    """Twin of :func:`operators.ranking.phrase_search` — the same
    per-doc match-position lambda (1-based, consecutive-token
    equality), list_filter over range."""
    m = len(phrase)
    cond = " AND ".join(
        f"t[i+{j}] = '{w}'" for j, w in enumerate(phrase)
    )
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
f AS (
  SELECT doc_id,
         list_filter(range(1, len(t) - {m} + 2), i -> {cond}) AS hits
  FROM toks WHERE len(t) >= {m}
)
SELECT doc_id, len(hits)::BIGINT AS n_matches, hits[1]::BIGINT AS first_pos
FROM f WHERE len(hits) > 0
"""


def lsh_calibration_sql(
    n: int = 3,
    num_hashes: int = 16,
    band_grid: tuple[int, ...] = (2, 4, 8, 16),
    threshold: float = 0.8,
) -> str:
    """Twin of :func:`operators.dedup.lsh_calibration_report` — the
    md5-MinHash signature/banding CTEs of ``minhash_lsh_md5_sql``
    evaluated at every bands setting, plus the exact-Jaccard truth
    count; recall/precision are ratios of exact integers."""
    sig_elems = ", ".join(
        f"list_min(list_transform(sh, s -> md5('mh{i}:' || s)))"
        for i in range(num_hashes)
    )
    jac = (
        "ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
        "(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE, "
        "6) + 0.0"
    )
    parts = [
        f"""
toks AS (SELECT doc_id AS id, {TOKS} AS t FROM documents),
shs AS (SELECT id, list_distinct({_shingles(n)}) AS sh FROM toks),
truth AS (
  SELECT count(*)::BIGINT AS n_truth
  FROM shs sa JOIN shs sb ON sa.id < sb.id
  WHERE len(list_intersect(sa.sh, sb.sh)) > 0 AND {jac} >= {threshold}
),
sig AS (SELECT id, sh, [{sig_elems}] AS sig FROM shs)"""
    ]
    selects = []
    for b in band_grid:
        rows = num_hashes // b
        band_structs = ", ".join(
            "struct_pack(band := {bb}, bkey := md5({key}))".format(
                bb=bb,
                key=" || ',' || ".join(
                    f"sig[{bb * rows + r + 1}]" for r in range(rows)
                ),
            )
            for bb in range(b)
        )
        parts.append(
            f"""
banded{b} AS (
  SELECT id, u.band AS band, u.bkey AS bkey
  FROM (SELECT id, unnest([{band_structs}]) AS u FROM sig)
),
cand{b} AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded{b} a JOIN banded{b} b
    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
agg{b} AS (
  SELECT count(*)::BIGINT AS n_candidates,
         COALESCE(SUM(CASE WHEN {jac} >= {threshold} THEN 1 ELSE 0 END),
                  0)::BIGINT AS n_verified
  FROM cand{b}
  JOIN shs sa ON sa.id = cand{b}.id_a
  JOIN shs sb ON sb.id = cand{b}.id_b
)"""
        )
        selects.append(
            f"""
SELECT {num_hashes}::BIGINT AS num_hashes, {b}::BIGINT AS bands,
       {rows}::BIGINT AS rows_per_band,
       a.n_candidates, a.n_verified, t.n_truth,
       CASE WHEN t.n_truth > 0
            THEN ROUND(a.n_verified::DOUBLE / t.n_truth, 6) END + 0.0
         AS recall,
       CASE WHEN a.n_candidates > 0
            THEN ROUND(a.n_verified::DOUBLE / a.n_candidates, 6) END + 0.0
         AS precision
FROM agg{b} a, truth t"""
        )
    return "WITH " + ",".join(parts) + (" UNION ALL ".join(selects))


def label_model_sql() -> str:
    """Twin of :func:`operators.textual.label_model` — per-rule
    accuracy from majority agreement (Laplace-smoothed exact
    rational), ONE ROUND(ln, 9) per rule (the dsir λ precedent),
    DECIMAL-folded weighted revote, (score DESC, label ASC) argmax."""
    from .operators.textual import WEAK_LABEL_RULES

    vote_structs = ", ".join(
        "{'rule_id': %d, 'vote': CASE WHEN regexp_matches(lower(text), '%s') "
        "THEN '%s' END}" % (i, pat, label)
        for i, (_, pat, label) in enumerate(WEAK_LABEL_RULES)
    )
    vote_items = ", ".join(
        f"CASE WHEN regexp_matches(lower(text), '{pat}') THEN '{label}' END"
        for _, pat, label in WEAK_LABEL_RULES
    )
    labels = sorted({label for _, _, label in WEAK_LABEL_RULES})
    count_structs = ", ".join(
        "{'negc': -len(list_filter(cv, x -> x = '%s'))::BIGINT, "
        "'lab': '%s', 'c': len(list_filter(cv, x -> x = '%s'))::BIGINT}"
        % (lab, lab, lab)
        for lab in labels
    )
    a = "((agree + 1)::DOUBLE / (n_cast + 2)::DOUBLE)"
    return f"""
WITH rv AS (
  SELECT doc_id, u.rule_id AS rule_id, u.vote AS vote
  FROM (SELECT doc_id, unnest([{vote_structs}]) AS u FROM documents)
  WHERE u.vote IS NOT NULL
),
mv AS (
  SELECT doc_id, list_filter([{vote_items}], x -> x IS NOT NULL) AS cv
  FROM documents
),
maj AS (
  SELECT doc_id, list_sort([{count_structs}])[1].lab AS mlabel
  FROM mv WHERE len(cv) > 0
),
acc AS (
  SELECT rule_id,
         ROUND(ln({a} / (1 - {a})), 9) AS w
  FROM (
    SELECT rule_id, count(*) AS n_cast,
           SUM(CASE WHEN vote = mlabel THEN 1 ELSE 0 END) AS agree
    FROM rv JOIN maj USING (doc_id) GROUP BY 1
  )
),
sc AS (
  SELECT doc_id, vote AS label,
         ROUND(SUM(CAST(w AS DECIMAL(28,9)))::DOUBLE, 6) + 0.0 AS score,
         count(*)::BIGINT AS nv
  FROM rv JOIN acc USING (rule_id) GROUP BY 1, 2
),
tot AS (SELECT doc_id, SUM(nv)::BIGINT AS n_votes FROM sc GROUP BY 1),
best AS (
  SELECT doc_id, label, score,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rk
  FROM sc
)
SELECT b.doc_id, b.label, b.score, t.n_votes
FROM best b JOIN tot t USING (doc_id) WHERE b.rk = 1
"""


def neardup_pagerank_sql(
    n: int = 3,
    threshold: float = 0.8,
    iters: int = 10,
    damping: float = 0.85,
) -> str:
    """Twin of :func:`operators.graph.neardup_pagerank` — the
    fixed-iteration loop UNROLLED over the same n-gram-Jaccard edge
    graph. Parity chain: per-edge contributions ROUND(d·r/deg, 12)
    fold in DECIMAL(28,12) (partition/join-order independent on the
    Spark side, plain integer arithmetic here); ranks carry as the
    identical double expression ``(1-d)/n + s`` every round; final
    ROUND(...,6)."""
    d = repr(float(damping))
    parts = [
        f"""
p AS ({ngram_jaccard_sql(n, threshold)}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b AS src, id_a AS dst FROM p
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
edeg AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
s{i} AS (
  SELECT e.dst AS node,
         SUM(CAST(ROUND({d} * r.rank / e.deg, 12) AS DECIMAL(28,12))) AS s
  FROM edeg e JOIN r{i - 1} r ON r.node = e.src GROUP BY 1
),
r{i} AS (
  SELECT nd.node,
         (1.0 - {d}) / nn.n + COALESCE(s.s::DOUBLE, 0.0) AS rank
  FROM nodes nd LEFT JOIN s{i} s USING (node), nn
)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT r.node AS doc_id, ROUND(r.rank, 6) + 0.0 AS rank,
       d.deg::BIGINT AS degree
FROM r{iters} r JOIN deg d ON d.src = r.node
"""
    )


def gopher_quality_sql(
    stopwords: tuple = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
    min_stopwords: int = 2,
) -> str:
    """Twin of ``textual.gopher_quality_report`` (Rae et al. 2021
    rules, ROUND(6) ratios, identical keep conjunction; the
    stopword list/threshold mirror the operator's round-10
    parameterization)."""
    req_sum = "\n          + ".join(
        "CASE WHEN list_contains(toks, '{0}') THEN 1 ELSE 0 END".format(
            w.replace("'", "''")  # SQL-literal escape (engine parity
            # with the operator side, which takes any token via F.lit)
        )
        for w in stopwords
    )
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_words,
         ROUND(list_sum(list_transform(toks, w -> len(w)))::DOUBLE
               / len(toks)::DOUBLE, 6) + 0.0 AS mean_word_len,
         ROUND(len(list_filter(toks, w -> w = '#' OR w = '...'))::DOUBLE
               / len(toks)::DOUBLE, 6) + 0.0 AS symbol_ratio,
         ROUND(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))::DOUBLE
               / len(toks)::DOUBLE, 6) + 0.0 AS frac_alpha_words,
         ({req_sum}
         )::BIGINT AS n_req_stopwords
  FROM t
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, frac_alpha_words,
       n_req_stopwords,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1
        AND frac_alpha_words >= 0.8
        AND n_req_stopwords >= {min_stopwords}) AS gopher_keep
FROM m
"""


def built_lines_sql() -> str:
    """The deterministic line augmentation (``textual.attach_lines``)
    as a standalone SELECT — (doc_id, ltext) — shared by every
    line-grain oracle (C4 rules, corpus-wide line dedup)."""
    nl = "chr(10)"
    return f"""
  SELECT doc_id,
         array_to_string(
           list_concat(
             list_transform(
               range(1, CAST(ceil(len(toks) / 8.0) AS BIGINT) + 1),
               i -> array_to_string(
                      toks[((i-1)*8+1)::INT : ((i-1)*8+8)::INT], ' ')
                    || CASE WHEN (doc_id + i) % 3 = 0 THEN '.'
                            WHEN (doc_id + i) % 3 = 1 THEN '!'
                            ELSE '' END
             ),
             list_filter([
               CASE WHEN doc_id % 17 = 0
                 THEN 'lorem ipsum dolor sit amet consectetur adipiscing elit.' END,
               CASE WHEN doc_id % 23 = 0
                 THEN 'function f() {{ return 0; }}' END,
               CASE WHEN doc_id % 13 = 0
                 THEN 'all rights reserved read our privacy policy here.' END
             ], x -> x IS NOT NULL)
           ), {nl}) AS ltext
  FROM (SELECT doc_id, {TOKS} AS toks FROM documents)"""


def line_dedup_sql(min_occ: int = 2) -> str:
    """Twin of ``textual.line_dedup`` — same line augmentation, same
    corpus-wide md5 line count, same drop-every-occurrence rule, same
    cleaned-stream digest."""
    nl = "chr(10)"
    keep = (
        "list_filter(l.lines, x -> NOT "
        "list_contains(COALESCE(dh.hot_hs, []::VARCHAR[]), md5(x)))"
    )
    return f"""
WITH built AS ({built_lines_sql()}),
l AS MATERIALIZED (SELECT doc_id, string_split(ltext, {nl}) AS lines FROM built),
hx AS MATERIALIZED (
  SELECT doc_id, unnest(list_transform(lines, x -> md5(x))) AS h FROM l
),
hot AS (SELECT h FROM hx GROUP BY h HAVING count(*) >= {min_occ}),
dh AS (
  SELECT hx.doc_id, list(DISTINCT hx.h) AS hot_hs
  FROM hx JOIN hot USING (h) GROUP BY hx.doc_id
)
SELECT l.doc_id,
       len(l.lines)::BIGINT AS n_lines,
       (len(l.lines) - len({keep}))::BIGINT AS n_dup_lines,
       md5(COALESCE(array_to_string({keep}, {nl}), '')) AS kept_md5
FROM l LEFT JOIN dh ON dh.doc_id = l.doc_id
"""


def c4_line_filter_sql() -> str:
    """Twin of ``textual.c4_line_filter`` — rebuilds the IDENTICAL
    line augmentation (8-token lines, (doc_id+i)%3 punctuation,
    deterministic lorem/brace/policy injections), applies the same
    line rules, digests the same surviving stream."""
    nl = "chr(10)"
    return f"""
WITH built AS ({built_lines_sql()}),
r AS (
  SELECT doc_id, ltext,
         string_split(ltext, {nl}) AS lines,
         list_filter(string_split(ltext, {nl}),
           l -> len(string_split(l, ' ')) >= 5
                AND regexp_matches(l, '[.!?"]$')
                AND NOT (contains(l, 'privacy policy')
                         OR contains(l, 'terms of use')
                         OR contains(l, 'cookie policy'))) AS kept
  FROM built
)
SELECT doc_id,
       len(lines)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept,
       contains(ltext, 'lorem ipsum') AS has_lorem_ipsum,
       contains(ltext, '{{') AS has_brace,
       len(list_filter(lines,
         l -> contains(l, 'privacy policy')
              OR contains(l, 'terms of use')
              OR contains(l, 'cookie policy')))::BIGINT AS n_policy_lines,
       (NOT contains(ltext, 'lorem ipsum')
        AND NOT contains(ltext, '{{')
        AND len(kept) >= 3) AS c4_keep,
       md5(COALESCE(array_to_string(kept, {nl}), '')) AS kept_md5
FROM r
"""
