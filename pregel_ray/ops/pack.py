"""Training-data export ops: sequence packing and deterministic shuffle.

``pack_sequences`` is the GPT-style concat-and-chunk pack: all documents
are concatenated (in doc_id order) into one virtual token stream, the
stream is chunked into fixed-length training sequences, and each document
emits one span row per sequence it overlaps. ``shuffle_shards`` is the
deterministic global shuffle + sharding step that precedes it in a real
pipeline (md5 order, hash-mod shard assignment, dense position per shard).

Both need a GLOBAL rank / prefix-sum, which Ray Data has no operator for.
The scale-safe shape (same as namemap.build_name_ranks): sort → per-block
partial counts/sums (one scalar per block crosses the driver) → exclusive
scan over the block partials → per-block remote task adds the in-block
cumsum to its base. The driver never holds a data-sized array.

The reference engine has no export surface at all (SURVEY.md §2.9); these
are the last-mile ops a 100 TB training-data pipeline runs after
dedup/quality filtering.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _md5_low64(vals) -> np.ndarray:
    """DuckDB ``md5_number_lower(CAST(v AS VARCHAR))``: little-endian
    uint64 of the last 8 digest bytes — the repo-wide sampling hash."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
            for v in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


@ray.remote
def _block_ntok_sum(t: pa.Table) -> int:
    return int(pc.sum(t["ntok"]).as_py() or 0)


@ray.remote
def _block_spans(t: pa.Table, base: int, seq_len: int) -> pa.Table:
    """Explode one block's docs into (doc, sequence)-span rows.

    ``base`` is the global token offset of the block's first doc; the
    in-block exclusive cumsum gives every doc its stream offset g0. A doc
    covering stream tokens [g0, g0+ntok) overlaps sequences
    g0//L .. (g0+ntok-1)//L; the per-span arithmetic is all integer, so
    it matches the SQL oracle exactly."""
    ntok = t["ntok"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    g0 = base + np.concatenate([[0], np.cumsum(ntok)])[:-1]
    live = ntok > 0
    doc, ntok, g0 = doc[live], ntok[live], g0[live]
    first = g0 // seq_len
    nspan = (g0 + ntok - 1) // seq_len - first + 1
    # concatenated aranges without a Python loop
    tot = int(nspan.sum())
    starts = np.concatenate([[0], np.cumsum(nspan)])[:-1]
    intra = np.arange(tot, dtype=np.int64) - np.repeat(starts, nspan)
    seq_id = np.repeat(first, nspan) + intra
    g0r = np.repeat(g0, nspan)
    endr = np.repeat(g0 + ntok, nspan)
    seq_lo = seq_id * seq_len
    span_lo = np.maximum(g0r, seq_lo)
    span_hi = np.minimum(endr, seq_lo + seq_len)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc, nspan)),
            "seq_id": pa.array(seq_id),
            "doc_start": pa.array(span_lo - g0r),
            "seq_start": pa.array(span_lo - seq_lo),
            "n_tokens": pa.array(span_hi - span_lo),
        }
    )


def pack_sequences(docs: rd.Dataset, seq_len: int = 512) -> rd.Dataset:
    """(doc_id, seq_id, doc_start, seq_start, n_tokens): concat-and-chunk
    sequence packing over whitespace tokens, docs concatenated in doc_id
    order, sequences of ``seq_len`` tokens.

    Invariants (pinned by tests): per-doc spans partition [0, ntok); per-
    sequence spans partition [0, seq_len) for every sequence except the
    last; span count per doc = number of seq_len boundaries it straddles
    + 1. A doc appears in >1 row iff it crosses a sequence boundary."""

    def _counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "ntok": pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    counts = docs.map_batches(_counts, batch_format="pyarrow").sort("doc_id")
    refs = counts.materialize().to_arrow_refs()
    sums = ray.get([_block_ntok_sum.remote(r) for r in refs])  # ≤ #blocks ints
    bases = np.concatenate([[0], np.cumsum(sums)])[:-1]
    return rd.from_arrow_refs(
        [
            _block_spans.remote(r, int(b), seq_len)
            for r, b in zip(refs, bases)
        ]
    )


# ---------------------------------------------------------------------------
# shuffle_shards
# ---------------------------------------------------------------------------


@ray.remote
def _block_shard_counts(t: pa.Table, num_shards: int) -> np.ndarray:
    sh = t["shard"].to_numpy(zero_copy_only=False)
    return np.bincount(sh, minlength=num_shards).astype(np.int64)


@ray.remote
def _block_pos(t: pa.Table, base: np.ndarray) -> pa.Table:
    """Dense position within each shard: the block is a contiguous slice
    of the (shard, hv)-sorted stream, so per-shard in-block cumcounts +
    the shard's base (rows of that shard in earlier blocks) are global."""
    sh = t["shard"].to_numpy(zero_copy_only=False)
    pos = np.empty(len(sh), dtype=np.int64)
    for s in np.unique(sh):
        m = sh == s
        pos[m] = base[s] + np.arange(int(m.sum()), dtype=np.int64)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "shard": pa.array(sh.astype(np.int64)),
            "pos": pa.array(pos),
        }
    )


def shuffle_shards(docs: rd.Dataset, num_shards: int = 8) -> rd.Dataset:
    """(doc_id, shard, pos): deterministic global shuffle + sharding —
    shard = md5-low64(doc_id) % num_shards, pos = dense rank within the
    shard ordered by (md5, doc_id). No RNG state: the same rows land in
    the same shard at the same position on every run and every cluster
    size (the property a resumable 100 TB export needs).

    One global sort is the only shuffle; the rank is per-block offsets
    (blocks × num_shards ints on the driver, never data)."""

    def _hash(t: pa.Table) -> pa.Table:
        hv = _md5_low64(t["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shard": pa.array((hv % np.uint64(num_shards)).astype(np.int32)),
                "hv": pa.array(hv),
            }
        )

    hashed = docs.map_batches(_hash, batch_format="pyarrow").sort(["shard", "hv", "doc_id"])
    refs = hashed.materialize().to_arrow_refs()
    per_block = ray.get(
        [_block_shard_counts.remote(r, num_shards) for r in refs]
    )
    if per_block:
        mat = np.stack(per_block)  # (blocks, shards)
        bases = np.vstack([np.zeros(num_shards, np.int64), np.cumsum(mat, axis=0)[:-1]])
    else:
        bases = np.zeros((0, num_shards), np.int64)
    return rd.from_arrow_refs(
        [_block_pos.remote(r, b) for r, b in zip(refs, bases)]
    )
