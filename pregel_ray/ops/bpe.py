"""Distributed byte-pair-encoding merge training (Sennrich, Haddow &
Birch 2016 — "Neural Machine Translation of Rare Words with Subword
Units"), the tokenizer-training op of an LLM data pipeline.

Word-level BPE: ONE corpus-wide word count collapses the corpus to a
vocabulary table (word, cnt, symbols) — all later work is
vocabulary-bounded, never corpus-bounded. Each merge round is

  1. pair counts: adjacent symbol pairs weighted by word count — the
     bigram-explode trick (zero-copy shifted Arrow slices + filter)
     applied to the symbol lists, one map pass,
  2. top-1 pair: a tiny bucketed group-sum + sort (deterministic
     tiebreak: count desc, then pair lexicographic asc),
  3. merge: replace every non-overlapping (a, b) adjacency with "ab"
     in one vectorized pass (greedy leftmost for a==b runs — the
     "aaaa" case — via even-offset selection within consecutive match
     runs), then a lineage cut with bounded blocks (ops/walks.py's
     max_blocks rule — every op-level iterative loop must bound block
     counts, not just cut lineage).

Determinism: counts are exact integers and the tiebreak is total, so
the merge list is independent of block layout and cluster size; pinned
by a straight-line reference implementation in tests (no SQL oracle —
iterative re-tokenization is not SQL-expressible, the t-digest
precedent).

The reference engine has no tokenizer surface (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

END = "</w>"  # word terminator symbol (standard BPE: marks word ends)


def _word_vocab(docs: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """(word, cnt): the one corpus-wide reduction."""
    from ..agg import group_count

    def _words(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        return pa.table({"word": pc.list_flatten(toks)})

    return group_count(
        docs.select_columns(["text"]).map_batches(
            _words, batch_format="pyarrow"
        ),
        ["word"], alias="cnt", num_buckets=num_buckets,
    )


def _to_symbols(t: pa.Table) -> pa.Table:
    """word → initial symbol sequence: characters + END terminator."""
    words = t["word"].to_pylist()
    syms = [list(w) + [END] for w in words]
    return pa.table(
        {
            "word": t["word"],
            "cnt": t["cnt"],
            "symbols": pa.array(syms, pa.list_(pa.string())),
        }
    )


def _flat_parents(t: pa.Table):
    syms = t["symbols"].combine_chunks()
    flat = pc.list_flatten(syms)
    parent = pc.list_parent_indices(syms).to_numpy(zero_copy_only=False)
    return flat, parent


def _pair_counts(t: pa.Table) -> pa.Table:
    """(p1, p2, w): adjacent-symbol pair counts weighted by word cnt —
    per-block partial, map-side combined by the caller's group_sum."""
    flat, parent = _flat_parents(t)
    n = len(flat)
    empty = pa.table(
        {"p1": pa.array([], pa.string()), "p2": pa.array([], pa.string()),
         "w": pa.array([], pa.int64())}
    )
    if n < 2:
        return empty
    same = parent[:-1] == parent[1:]
    if not same.any():
        return empty
    cnts = t["cnt"].to_numpy(zero_copy_only=False)
    pairs = pa.table(
        {
            "p1": pc.filter(flat.slice(0, n - 1), pa.array(same)),
            "p2": pc.filter(flat.slice(1, n - 1), pa.array(same)),
            "w": pa.array(cnts[parent[:-1][same]]),
        }
    )
    g = pairs.group_by(["p1", "p2"]).aggregate([("w", "sum")])
    return g.rename_columns(["p1", "p2", "w"])


def _apply_merge(t: pa.Table, a: str, b: str) -> pa.Table:
    """Replace every non-overlapping (a, b) adjacency with a+b, greedy
    leftmost — one vectorized pass, no per-word Python."""
    flat, parent = _flat_parents(t)
    n = len(flat)
    if n >= 2:
        fa = flat.to_numpy(zero_copy_only=False)
        match = (
            (fa[:-1] == a) & (fa[1:] == b) & (parent[:-1] == parent[1:])
        )
        pos = np.flatnonzero(match)
    else:
        fa = flat.to_numpy(zero_copy_only=False)
        pos = np.array([], np.int64)
    if len(pos):
        if a == b:
            # overlapping runs ("aaaa"): keep even offsets within each
            # run of CONSECUTIVE match positions = greedy leftmost
            run_start = np.ones(len(pos), bool)
            run_start[1:] = pos[1:] != pos[:-1] + 1
            run_ids = np.cumsum(run_start) - 1
            offs = np.arange(len(pos)) - np.flatnonzero(run_start)[run_ids]
            pos = pos[offs % 2 == 0]
        new = fa.astype(object).copy()
        new[pos] = a + b
        keep = np.ones(n, bool)
        keep[pos + 1] = False
        new_flat = new[keep]
        new_parent = parent[keep]
    else:
        new_flat = fa.astype(object)
        new_parent = parent
    lens = np.bincount(new_parent, minlength=t.num_rows)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(new_flat, pa.string())
    )
    return pa.table({"word": t["word"], "cnt": t["cnt"], "symbols": lists})


def learn_bpe(
    docs: rd.Dataset,
    num_merges: int = 30,
    num_buckets: int = 32,
    max_blocks: int = 16,
) -> tuple[list[tuple[str, str]], rd.Dataset]:
    """Learn `num_merges` BPE merges from the corpus. Returns
    (merges, vocab) — the ordered merge list and the final vocabulary
    Dataset (word, cnt, symbols) tokenized under those merges.

    Scale shape: one corpus reduction (the word count), then every
    round is vocabulary-bounded: a zero-copy pair explode, a tiny
    group-sum + top-1, one vectorized merge map, and a block-bounded
    lineage cut. A merge round never revisits the corpus."""
    from ..agg import group_sum
    from .walks import _cut

    vocab = _word_vocab(docs, num_buckets).map_batches(
        _to_symbols, batch_format="pyarrow"
    )
    vocab = _cut(vocab, max_blocks=max_blocks)
    if vocab.count() == 0:
        return [], vocab

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = group_sum(
            vocab.map_batches(_pair_counts, batch_format="pyarrow"),
            ["p1", "p2"], "w", num_buckets=min(8, num_buckets),
        )
        top = pairs.sort(
            ["w", "p1", "p2"], descending=[True, False, False]
        ).limit(1).take(1)
        if not top:
            break
        a, b = top[0]["p1"], top[0]["p2"]
        merges.append((a, b))
        vocab = _cut(
            vocab.map_batches(
                _apply_merge, batch_format="pyarrow",
                fn_kwargs={"a": a, "b": b},
            ),
            max_blocks=max_blocks,
        )
    return merges, vocab


def bpe_segment(words: list[str], merges: list[tuple[str, str]]) -> list[list[str]]:
    """Apply a learned merge list to new words (driver-side helper for
    spot checks; the distributed path is tokenizing via the returned
    vocab table). Merges apply in learned order, greedy leftmost."""
    out = []
    for w in words:
        syms = list(w) + [END]
        for a, b in merges:
            i, cur = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    cur.append(a + b)
                    i += 2
                else:
                    cur.append(syms[i])
                    i += 1
            syms = cur
        out.append(syms)
    return out
