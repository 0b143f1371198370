"""WordPiece trainer/encoder: pure-Python replay of the distributed
training loop, the likelihood-gain (not raw-count) merge choice, and
the greedy longest-match encode contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import wordpiece as W

from conftest import SF_SMALL


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _python_replay(texts, n_merges):
    """The reference trainer: same tokenization, same init, same
    score, same (score desc, l, r) argmax, same merge application."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                wc[w] += 1
    words = {w: (c, ["##" + ch if i else ch for i, ch in enumerate(w)])
             for w, (c) in ((w, c) for w, c in wc.items())}
    merges = []
    for rank in range(1, n_merges + 1):
        sym, pair = Counter(), Counter()
        for w, (c, syms) in words.items():
            for s in syms:
                sym[s] += c
            for a, b in zip(syms, syms[1:]):
                pair[(a, b)] += c
        if not pair:
            break
        best = max(
            pair.items(),
            key=lambda kv: (kv[1] / (sym[kv[0][0]] * sym[kv[0][1]]),),
        )
        # deterministic tie-break on (l, r) ascending among equal scores
        best_score = best[1] / (sym[best[0][0]] * sym[best[0][1]])
        ties = sorted(
            k for k, v in pair.items()
            if v / (sym[k[0]] * sym[k[1]]) == best_score
        )
        l, r = ties[0]
        piece = W._merged_sym(l, r)
        merges.append((rank, l, r, piece))
        for w, (c, syms) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(piece)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (c, out)
    return merges


def test_train_matches_python_replay(spark, tmp_path):
    texts = [
        "hugging face tokenizers hug the hub",
        "the hub hugs hugging tokenizers",
        "face the music the music faces us",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = [
        (r.rank, r.left, r.right, r.piece)
        for r in W.wordpiece_train(spark, sf, n_merges=6).orderBy("rank").collect()
    ]
    assert got == _python_replay(texts, 6)


def test_score_differs_from_bpe_choice(spark, tmp_path):
    """The defining WordPiece property: the raw-count-max pair loses
    to a rarer pair of rare symbols. 'ab' appears 10x but a/b are
    everywhere (score diluted); 'qz' appears 3x and q/z appear ONLY
    there (score 1/count) — WordPiece merges (q, ##z) first, BPE
    would merge (a, ##b)."""
    texts = [" ".join(["ab"] * 10 + ["a"] * 20 + ["b"] * 20 + ["qz"] * 3)]
    sf = _write_docs(spark, tmp_path, texts)
    first = W.wordpiece_train(spark, sf, n_merges=1).head()
    assert (first.left, first.right) == ("q", "##z")

    from ydb_vector_search_simple_api_spark.operators import bpe

    bfirst = bpe.bpe_train(spark, sf, n_merges=1).head()
    assert (bfirst.left, bfirst.right) == ("a", "b")


def test_encode_word_greedy_longest_match():
    vocab = {"un", "##aff", "##able", "##ffa", "aff", "a", "##b"}
    assert W.encode_word("unaffable", vocab) == ["un", "##aff", "##able"]
    # no piece covers the cursor -> whole-word UNK
    assert W.encode_word("xyz", vocab) == [W.UNK]
    # longest match wins over shorter alternatives at each cursor
    assert W.encode_word("a", vocab) == ["a"]
    assert W.encode_word("ab", vocab) == ["a", "##b"]


def test_encode_digest_matches_kernel_replay(spark, tmp_path):
    texts = ["aa ab ba xq", "ab ab aa"]
    sf = _write_docs(spark, tmp_path, texts)
    vocab = W.wordpiece_vocab(spark, sf, n_merges=3)
    vset = {r.piece for r in vocab.collect()}
    got = {r.doc_id: r for r in W.wordpiece_encode_digest(spark, sf, vocab=vocab).collect()}
    for doc_id, text in enumerate(texts):
        toks = []
        for w in text.split():
            toks.extend(W.encode_word(w, vset))
        r = got[doc_id]
        assert r.n_words == len(text.split())
        assert r.n_pieces == len(toks)
        assert r.n_unk == sum(1 for t in toks if t == W.UNK)
        assert r.pieces_md5 == hashlib.md5(" ".join(toks).encode()).hexdigest()


def test_corpus_roundtrip_is_deterministic(spark):
    d1 = sorted(
        tuple(r) for r in W.wordpiece_train(spark, SF_SMALL, n_merges=8).collect()
    )
    d2 = sorted(
        tuple(r) for r in W.wordpiece_train(spark, SF_SMALL, n_merges=8).collect()
    )
    assert d1 == d2
    enc = W.wordpiece_encode_digest(spark, SF_SMALL, n_merges=8).collect()
    assert all(r.n_pieces >= r.n_words for r in enc)


def test_tokenizer_report_consistency(spark):
    """One row per tokenizer; fertility >= 1 everywhere (every word
    emits at least one piece); BPE and unigram are UNK-free by
    construction; the ratios replay from the digests exactly."""
    from ydb_vector_search_simple_api_spark.operators import (
        bpe,
        sp_unigram,
        tokenizers,
    )

    merges = [
        (r.left, r.right)
        for r in bpe.bpe_train(spark, SF_SMALL, n_merges=10).orderBy("rank").collect()
    ]
    uni = sp_unigram.unigram_lm_train(spark, SF_SMALL)
    wp = W.wordpiece_vocab(spark, SF_SMALL, n_merges=10)
    rep = {
        r.tokenizer: r
        for r in tokenizers.tokenizer_report(
            spark, SF_SMALL, bpe_merges=merges, unigram_vocab=uni, wordpiece_vocab=wp
        ).collect()
    }
    assert set(rep) == {"bpe", "unigram_lm", "wordpiece"}
    for r in rep.values():
        assert r.n_pieces >= r.n_words > 0
        assert r.pieces_per_word >= 1.0
    assert rep["bpe"].unk_rate == 0.0
    assert rep["unigram_lm"].unk_rate == 0.0
    # replay the wordpiece row from its own digest
    d = W.wordpiece_encode_digest(spark, SF_SMALL, vocab=wp)
    tot = d.agg(
        F.sum("n_words").alias("w"), F.sum("n_pieces").alias("p"), F.sum("n_unk").alias("u")
    ).head()
    assert rep["wordpiece"].n_words == tot.w
    assert rep["wordpiece"].n_pieces == tot.p
    assert rep["wordpiece"].unk_rate == round(tot.u / tot.w, 6)
