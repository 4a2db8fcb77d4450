"""Bucketed high-cardinality aggregation.

Ray Data's ``groupby(keys).aggregate(...)`` folds rows per key in Python
during the sort-reduce, which collapses to ~8k rows/s when the key
cardinality is high (measured: 102s for an 831k-row two-string-key sum;
1.6s with this helper — 64×). The scalable pattern is:

    hash keys → int32 bucket column → groupby(bucket)
      → map_groups(vectorized pandas aggregation within the bucket)

One int-key sort shuffle, all per-key work vectorized. Bucket count
bounds reduce-task granularity (hash of uniform keys → no skew; for
skewed VALUE distributions the per-bucket pandas groupby is still
vectorized, so hot keys cost their row count, not a Python loop).

Used by edge weighting, vertex encoding, symmetrize, degrees, triangle
dedup/credits — everywhere key cardinality scales with the data.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_FNV = np.uint64(1099511628211)


def _hash_cols(t: pa.Table, keys: list[str]) -> np.ndarray:
    from .edges import stable_hash

    h = np.full(t.num_rows, np.uint64(0xCBF29CE484222325))
    for k in keys:
        col = t[k]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            hv = stable_hash(col.to_numpy(zero_copy_only=False))
        else:
            x = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            hv = x ^ (x >> np.uint64(33))
        h = (h * _FNV) ^ hv
    return h


def grouped_apply(
    ds: rd.Dataset,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 128,
) -> rd.Dataset:
    """groupby-by-hash-bucket; ``fn`` gets one BUCKET's frame (many whole
    key-groups — every row of any key lands in exactly one bucket) and must
    aggregate vectorized (e.g. ``g.groupby(keys).sum()``)."""

    def _bk(t: pa.Table) -> pa.Table:
        bk = (_hash_cols(t, keys) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bk", pa.array(bk))

    def _apply(g: pd.DataFrame) -> pa.Table:
        # emit Arrow (metadata-stripped): keeps every block of the stream
        # Arrow-typed, so Ray's schema unification never sees the
        # unhashable pandas block schemas ("Failed to hash the schemas")
        return pa.Table.from_pandas(
            fn(g.drop(columns="__bk")), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(_bk, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(_apply, batch_format="pandas")
    )


def group_sum(
    ds: rd.Dataset, keys: list[str], value: str, alias: str | None = None,
    num_buckets: int = 128,
) -> rd.Dataset:
    alias = alias or value

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, sort=False, as_index=False)[value].sum()
        return out.rename(columns={value: alias})

    return grouped_apply(ds, keys, _sum, num_buckets)


def group_count(
    ds: rd.Dataset, keys: list[str], alias: str = "count", num_buckets: int = 128
) -> rd.Dataset:
    def _cnt(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, sort=False, as_index=False).size()
        return out.rename(columns={"size": alias})

    return grouped_apply(ds, keys, _cnt, num_buckets)


def distinct(ds: rd.Dataset, keys: list[str], num_buckets: int = 128) -> rd.Dataset:
    def _d(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(keys)[keys]

    return grouped_apply(ds, keys, _d, num_buckets)
