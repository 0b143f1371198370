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
