"""BPE tokenizer: the Spark training loop vs a pure-Python replay of
Sennrich's algorithm, and the encode digest vs encode_word."""

from __future__ import annotations

import hashlib
from collections import Counter

from ydb_vector_search_simple_api_spark.operators import bpe as B
from ydb_vector_search_simple_api_spark.sources.store import load_documents

from conftest import SF_SMALL

N_MERGES = 6


def _reference_train(word_freq: dict[str, int], n_merges: int):
    """Classic BPE on a word-frequency dict: merge the max-count
    adjacent pair (ties lexicographic), leftmost-first within words."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            n = word_freq[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((rank, l, r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _word_freq(spark) -> dict[str, int]:
    wf: Counter = Counter()
    for row in load_documents(spark, SF_SMALL).select("text").collect():
        wf.update(w for w in row.text.lower().strip().split() if w)
    return dict(wf)


def test_train_matches_reference_replay(spark):
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in B.bpe_train(spark, SF_SMALL, n_merges=N_MERGES)
        .orderBy("rank")
        .collect()
    ]
    want = _reference_train(_word_freq(spark), N_MERGES)
    assert got == want
    # merges are deterministic across runs
    again = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in B.bpe_train(spark, SF_SMALL, n_merges=N_MERGES)
        .orderBy("rank")
        .collect()
    ]
    assert again == got


def test_encode_word_merge_semantics():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("a", "a"): 2}
    assert B.encode_word("abc", ranks) == ["abc"]
    assert B.encode_word("aab", ranks) == ["a", "ab"]  # rank 0 first
    assert B.encode_word("aaa", ranks) == ["aa", "a"]  # leftmost-first
    assert B.encode_word("xyz", ranks) == ["x", "y", "z"]
    assert B.encode_word("a", ranks) == ["a"]


def test_encode_digest_matches_replay(spark):
    merges = [
        (r.left, r.right)
        for r in B.bpe_train(spark, SF_SMALL, n_merges=N_MERGES)
        .orderBy("rank")
        .collect()
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r.doc_id: r
        for r in B.bpe_encode_digest(
            spark, SF_SMALL, merges=merges
        ).collect()
    }
    docs = load_documents(spark, SF_SMALL).select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for row in docs[:40]:
        words = row.text.lower().strip().split()
        toks = [t for w in words for t in B.encode_word(w, ranks)]
        r = got[row.doc_id]
        assert r.n_words == len(words)
        assert r.n_bpe_tokens == len(toks)
        assert r.tokens_md5 == hashlib.md5(" ".join(toks).encode()).hexdigest()
        # BPE never splits below characters nor merges across words
        assert len(toks) <= sum(len(w) for w in words)
        assert len(toks) >= len(words)


def test_unigram_lm_closure_and_normalization(spark):
    """Single characters never leave the vocab (every word stays
    segmentable); kept-piece probabilities sum to ~1."""
    import math

    from ydb_vector_search_simple_api_spark.operators import sp_unigram as U

    vocab = U.unigram_lm_train(spark, SF_SMALL, vocab_size=128, em_iters=2)
    rows = vocab.collect()
    pieces = {r.piece for r in rows}
    chars = {c for r in rows for c in r.piece}
    assert chars <= pieces  # closure: every char of every piece is a piece
    psum = sum(math.exp(r.logprob) for r in rows if r.logprob is not None)
    assert abs(psum - 1.0) < 1e-3


def test_unigram_lm_loss_nonincreasing_and_deterministic(spark):
    """Hard-EM corpus loss is non-increasing across iterations, and
    training twice yields the identical vocab (integer counts only)."""
    from ydb_vector_search_simple_api_spark.operators import sp_unigram as U
    from ydb_vector_search_simple_api_spark.operators.bpe import _word_table

    words = _word_table(spark, SF_SMALL).collect()
    ws = [r.word for r in words]
    ns = [r.n for r in words]

    losses = []
    for iters in (1, 2, 3):
        v = {
            r.piece: r.logprob
            for r in U.unigram_lm_train(
                spark, SF_SMALL, vocab_size=128, em_iters=iters
            ).collect()
            if r.logprob is not None
        }
        _, loss = U._viterbi_piece_counts(ws, ns, v, max_len=4)
        losses.append(loss)
    assert losses[1] <= losses[0] + 1e-6
    assert losses[2] <= losses[1] + 1e-6

    a = sorted(tuple(r) for r in U.unigram_lm_train(spark, SF_SMALL).collect())
    b = sorted(tuple(r) for r in U.unigram_lm_train(spark, SF_SMALL).collect())
    assert a == b


def test_unigram_lm_encode_roundtrip(spark):
    """Every document's piece count is >= its word count (pieces
    partition words), the digest is deterministic, and a crafted
    corpus segments a frequent compound into one piece."""
    from ydb_vector_search_simple_api_spark.operators import sp_unigram as U

    d1 = U.unigram_lm_encode_digest(spark, SF_SMALL).collect()
    d2 = U.unigram_lm_encode_digest(spark, SF_SMALL).collect()
    assert sorted(map(tuple, d1)) == sorted(map(tuple, d2))
    for r in d1:
        assert r.n_pieces >= r.n_words


def test_unigram_encode_closure_with_zero_count_chars(spark, tmp_path):
    """Regression: zero-count single chars (null logprob, kept in the
    vocab for closure) must be scorable at encode time at the M-step
    floor. A vocab trained where 'ab' absorbs every occurrence leaves
    'a'/'b' at count 0; encoding the UNSEEN word 'ba' must emit the
    in-vocab pieces ['b','a'], never the out-of-vocab whole word."""
    import hashlib
    import math

    from ydb_vector_search_simple_api_spark.operators import sp_unigram as U

    vocab = spark.createDataFrame(
        [("ab", math.log(0.9), 9), ("a", None, 0), ("b", None, 0)],
        "piece string, logprob double, cnt bigint",
    )
    spark.createDataFrame(
        [(1, "ab ba", "en", "s", 5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    row = U.unigram_lm_encode_digest(spark, str(tmp_path), vocab=vocab).head()
    assert row.n_words == 2
    assert row.n_pieces == 3  # 'ab' + 'b' + 'a'
    assert row.pieces_md5 == hashlib.md5(b"ab b a").hexdigest()


def test_bpe_store_encode_equals_in_session(spark, tmp_path):
    """Round 11: encoding from the persisted merge table == encoding
    with in-session training (the merge table is deterministic)."""
    from ydb_vector_search_simple_api_spark.operators import bpe

    path = str(tmp_path / "bpe")
    stats = bpe.bpe_store_build(spark, SF_SMALL, path, n_merges=10)
    assert stats["n_merges"] == 10
    got = {
        r.doc_id: tuple(r)
        for r in bpe.bpe_encode_from_store(spark, SF_SMALL, path).collect()
    }
    want = {
        r.doc_id: tuple(r)
        for r in bpe.bpe_encode_digest(spark, SF_SMALL, n_merges=10).collect()
    }
    assert got == want and len(want) > 0
