"""Deterministic data-mixing ops for training-corpus construction.

The three steps a real pipeline runs between quality filtering and
sequence packing:

- ``split_fractions``: train/val/test assignment by hashed key — a pure
  map, no shuffle, stable under re-runs and re-partitioning (a document
  never migrates between splits when the corpus grows).
- ``group_quota_sample``: at most ``quota`` rows per group (per-language
  / per-source caps), chosen as the quota smallest salted hashes — the
  grouped-topk discipline: each block contributes at most quota rows per
  group it contains, so ≤ quota·blocks rows per group ride the one
  bucketed shuffle and a 10⁹-row hot group never moves whole.
- ``mixture_epochs``: per-source up/down-sampling with fractional epoch
  weights (source A × 2.5 means every A-row appears twice and wins a
  third copy with probability 0.5, decided by its own hash) — the data
  mixture step of LLM training recipes. A pure map: weights are a small
  dict captured in the closure, rows explode locally.

All three hash with the repo-wide convention ``md5_low64(salt ':' key)``
== DuckDB ``md5_number_lower(...)`` (little-endian uint64 of the last 8
digest bytes), each op under its own salt so the split, the quota race
and the epoch coin are mutually independent. No RNG state, no driver
coordination; DuckDB replays every decision exactly (oracles
``x_doc_split_fractions`` / ``x_doc_quota_per_lang`` /
``x_doc_mixture_epochs``).

The reference engine has no mixing surface (SURVEY.md §2.9).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

_PPM = 1_000_000


def _md5_low64(vals, salt: str) -> np.ndarray:
    """``md5_number_lower(salt || ':' || CAST(v AS VARCHAR))``."""
    pre = f"{salt}:".encode()
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(pre + str(v).encode()).digest()[8:], "little"
            )
            for v in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )


def split_fractions(
    ds: rd.Dataset,
    key: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> rd.Dataset:
    """Append a ``split`` column assigning each row to one of
    ``fractions`` (e.g. ``{"train": .9, "val": .05, "test": .05}``) by
    ``md5(salt:key) % 1e6`` against cumulative integer-ppm cutoffs.
    Fractions must sum to 1 (to within ppm rounding)."""
    names = list(fractions)
    ppm = [int(round(f * _PPM)) for f in fractions.values()]
    if any(p <= 0 for p in ppm):
        raise ValueError(f"non-positive split fraction in {fractions}")
    cut = np.cumsum(ppm, dtype=np.int64)
    if cut[-1] != _PPM:
        raise ValueError(
            f"fractions sum to {cut[-1] / _PPM}, expected 1.0 (±ppm)"
        )
    labels = np.asarray(names, dtype=object)

    def _assign(t: pa.Table) -> pa.Table:
        hv = (_md5_low64(t[key].to_pylist(), salt) % np.uint64(_PPM)).astype(
            np.int64
        )
        split = labels[np.searchsorted(cut, hv, side="right")]
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def group_quota_sample(
    ds: rd.Dataset,
    by: list[str],
    key: str,
    quota: int,
    salt: str = "quota",
    num_buckets: int = 128,
) -> rd.Dataset:
    """At most ``quota`` rows per ``by``-group: the quota smallest
    ``md5(salt:key)`` values (ties by ``key``). Per-block Arrow top-k
    partials via grouped_topk — no group ever moves whole."""
    from .text import grouped_topk

    if quota <= 0:
        raise ValueError(f"quota must be positive, got {quota}")

    def _hv(t: pa.Table) -> pa.Table:
        hv = _md5_low64(t[key].to_pylist(), salt)
        return t.append_column("__hv", pa.array(hv))

    picked = grouped_topk(
        ds.map_batches(_hv, batch_format="pyarrow"),
        by,
        "__hv",
        quota,
        tiebreak=key,
        ascending=True,
    )
    return picked.drop_columns(["__hv"])


def mixture_epochs(
    ds: rd.Dataset,
    key: str,
    group_col: str,
    weights: dict[str, float],
    default: float = 1.0,
    salt: str = "mix",
) -> rd.Dataset:
    """Explode each row into ``epoch`` copies (column ``epoch`` =
    0..reps-1) where reps = ⌊w⌋ + [md5(salt:key) % 1e6 < frac(w)·1e6]
    and w is ``weights[group_col]`` (``default`` for unlisted groups).
    w = 0 drops the group; w = 2.5 duplicates every row and adds a
    third copy to a deterministic hash-half of them."""
    wppm = {k: int(round(w * _PPM)) for k, w in weights.items()}
    dppm = int(round(default * _PPM))
    if any(w < 0 for w in wppm.values()) or dppm < 0:
        raise ValueError("mixture weights must be non-negative")

    def _explode(t: pa.Table) -> pa.Table:
        grp = t[group_col].to_pylist()
        w = np.fromiter(
            (wppm.get(g, dppm) for g in grp), dtype=np.int64, count=len(grp)
        )
        hv = (_md5_low64(t[key].to_pylist(), salt) % np.uint64(_PPM)).astype(
            np.int64
        )
        reps = w // _PPM + (hv < w % _PPM)
        take = np.repeat(np.arange(t.num_rows), reps)
        ends = np.cumsum(reps)
        epoch = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - reps, reps
        )
        return t.take(pa.array(take)).append_column(
            "epoch", pa.array(epoch, pa.int64())
        )

    return ds.map_batches(_explode, batch_format="pyarrow")
