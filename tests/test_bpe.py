"""learn_bpe vs a straight-line reference BPE (Sennrich-style)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

END = "</w>"


def _ref_bpe(texts, num_merges):
    """Clean-room single-process BPE with the op's exact semantics:
    word-level weighted pair counts (overlapping adjacencies counted),
    top pair by (count desc, pair lex asc), greedy-leftmost merge."""
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(t.split(" "))
    vocab = {w: list(w) + [END] for w in words}
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += words[w]
        if not stats:
            break
        top = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(top)
        a, b = top
        for w, syms in vocab.items():
            i, cur = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    cur.append(a + b)
                    i += 2
                else:
                    cur.append(syms[i])
                    i += 1
            vocab[w] = cur
    return merges, vocab, words


def _corpus():
    rng = np.random.default_rng(53)
    base = ["the cat sat", "the hat fits the cat", "aaaa aab the mat",
            "banana bandana the the", "cats hats mats", "aaaa aaaa"]
    texts = [base[i % len(base)] for i in range(40)]
    rng.shuffle(texts)
    return texts


def test_learn_bpe_matches_reference(ray_session):
    from pregel_ray.ops.bpe import learn_bpe

    texts = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(5)
    merges, vocab = learn_bpe(ds, num_merges=12)
    ref_merges, ref_vocab, ref_words = _ref_bpe(texts, 12)
    assert merges == ref_merges
    got = vocab.to_pandas().set_index("word")
    for w, syms in ref_vocab.items():
        assert list(got.loc[w, "symbols"]) == syms, w
        assert got.loc[w, "cnt"] == ref_words[w]


def test_learn_bpe_layout_independent(ray_session):
    from pregel_ray.ops.bpe import learn_bpe

    texts = _corpus()
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    m1, _ = learn_bpe(rd.from_arrow(t).repartition(2), num_merges=6)
    m2, _ = learn_bpe(rd.from_arrow(t).repartition(11), num_merges=6)
    assert m1 == m2


def test_bpe_segment_consistent_with_vocab(ray_session):
    from pregel_ray.ops.bpe import bpe_segment, learn_bpe

    texts = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    merges, vocab = learn_bpe(ds, num_merges=8)
    got = vocab.to_pandas().set_index("word")
    words = list(got.index)
    for w, syms in zip(words, bpe_segment(words, merges)):
        assert list(got.loc[w, "symbols"]) == syms, w


def test_learn_bpe_empty(ray_session):
    from pregel_ray.ops.bpe import learn_bpe

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    merges, vocab = learn_bpe(empty, num_merges=3)
    assert merges == [] and vocab.count() == 0
