"""Distributed BPE training (functions/bpe.py) — differential-tested
against a pure-Python reference implementation of the same simplified
Sennrich procedure (greedy left-to-right merge, count-desc /
lexicographic tie-break, no end-of-word marker)."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.functions.bpe import (
    bpe_token_counts,
    bpe_vocab,
    learn_bpe,
)


def _ref_bpe(texts: list[str], n_merges: int):
    """Pure-Python reference: vocab of symbol tuples, weighted pair
    counts, same tie-break, same greedy merge application."""
    vocab: dict[tuple, int] = collections.Counter()
    for t in texts:
        for w in " ".join(t.strip().lower().split()).split(" "):
            if w:
                vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = collections.Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, c))
        new_vocab: dict[tuple, int] = collections.Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges, vocab


TEXTS = [
    "the lower newer wider newest lowest",
    "low lower lowest new newer newest",
    "wide wider widest new low " * 3,
    "er er er est est ow ow",
]


def _docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )


def test_learn_bpe_matches_reference(spark):
    merges, _ = learn_bpe(_docs(spark), n_merges=6)
    ref_merges, _ = _ref_bpe(TEXTS, 6)
    got = [(m["left"], m["right"], m["merged"], m["pair_count"]) for m in merges]
    assert got == ref_merges


def test_bpe_token_counts_match_reference(spark):
    out = {
        r["token"]: r["n_tokens"]
        for r in bpe_token_counts(_docs(spark), n_merges=6).collect()
    }
    _, ref_vocab = _ref_bpe(TEXTS, 6)
    ref: dict[str, int] = collections.Counter()
    for syms, cnt in ref_vocab.items():
        for s in syms:
            ref[s] += cnt
    assert out == dict(ref)


def test_bpe_vocab_counts(spark):
    v = {r["word"]: (r["cnt"], r["enc"]) for r in bpe_vocab(_docs(spark)).collect()}
    assert v["low"][0] == 4  # 1 + "low " x3
    assert v["low"][1] == "|l|o|w|"


def test_merge_respects_greedy_overlap(spark):
    # 'aaa' under merge (a,a): greedy left-to-right -> ['aa', 'a'],
    # NOT ['a', 'aa'] — the delimited replace must agree with the
    # reference tokenizer's scan order
    docs = spark.createDataFrame([(1, "aaa aa")], "doc_id long, text string")
    merges, vocab = learn_bpe(docs, n_merges=1)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    enc = {r["word"]: r["enc"] for r in vocab.collect()}
    assert enc["aaa"] == "|aa|a|"
    assert enc["aa"] == "|aa|"


# --------------------------------------------------------------------------
# unigram-LM (quantized-log) segmentation
# --------------------------------------------------------------------------

def test_unigram_prefers_frequent_pieces(spark):
    from pdf_context_extractor_agent_spark.functions.unigram import (
        piece_counts,
        viterbi_segment,
    )

    # 'ing' is extremely frequent; rare words still segment via chars
    docs = spark.createDataFrame(
        [(0, "running singing ring ring ring ing ing ing ing ing")],
        "doc_id int, text string",
    )
    pieces = piece_counts(docs, min_count=2)
    words = spark.createDataFrame([("ring",), ("zq",)], "word string")
    got = {r["word"]: r for r in viterbi_segment(words, pieces).collect()}
    # 'ring' should NOT be split into 4 single chars — 'ring' itself
    # occurs 4+ times (word + substrings) so the whole word is a piece
    assert got["ring"]["n_pieces"] <= 2
    # 'zq' never occurred: no segmentation exists (chars absent) →
    # absent from output rather than wrong
    assert "zq" not in got


def test_unigram_dp_matches_bruteforce(spark):
    """Pure-python brute force over all compositions == the DP."""
    import itertools

    from pdf_context_extractor_agent_spark.functions.unigram import (
        piece_counts,
        viterbi_segment,
    )

    text = "abab banana band ban and anda nab ab ba an na"
    docs = spark.createDataFrame([(0, text)], "doc_id int, text string")
    pieces = piece_counts(docs, min_count=2)
    vocab = {r["piece"]: r["score"] for r in pieces.collect()}

    def brute(word):
        best = None
        n = len(word)
        for cuts in range(2 ** max(n - 1, 0)):
            bounds = [0] + [i + 1 for i in range(n - 1) if cuts >> i & 1] + [n]
            segs = [word[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]
            if any(len(s) > 4 or s not in vocab for s in segs):
                continue
            score = sum(vocab[s] for s in segs)
            mask = sum(1 << b for b in bounds[1:])
            key = (score, -len(segs), mask)
            if best is None or key > best[0]:
                best = (key, " ".join(segs))
        return best

    words = ["banana", "band", "abab", "an", "nab"]
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: (r["score"], r["n_pieces"], r["segmentation"])
           for r in viterbi_segment(wdf, pieces).collect()}
    for w in words:
        b = brute(w)
        assert b is not None
        (score, nnp, _mask), path = b
        assert got[w] == (score, -nnp, path), w
