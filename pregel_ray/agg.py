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

# Arrow int → pandas NULLABLE int dtype (backed by int64 + mask, never
# float64): used wherever a tagged union's nulls would otherwise widen
# int carriers through float64 and corrupt values above 2^53.
_NULLABLE_INT = {
    pa.int8(): pd.Int8Dtype(),
    pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(),
    pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(),
    pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(),
    pa.uint64(): pd.UInt64Dtype(),
}


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


def arrow_groups(fn):
    """Wrap a pandas-in pandas-out group fn so the STAGE emits
    metadata-free Arrow blocks. A map_groups that returns DataFrames
    makes every downstream arrow conversion re-attach the b'pandas'
    schema metadata, whose unhashable pa.Schema defeats Ray's schema
    dedup in every later shuffle ("Failed to hash the schemas" — the
    io_util.py read-side fix, recurring mid-pipeline)."""

    def _w(g: pd.DataFrame):
        out = fn(g)
        if isinstance(out, pa.Table):
            return out.replace_schema_metadata(None)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return _w


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
        out = fn(g.drop(columns="__bk"))
        if isinstance(out, pa.Table):  # fn may emit Arrow directly
            return out.replace_schema_metadata(None)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(_bk, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(_apply, batch_format="pandas")
    )


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow.Schema. Pipelines are Arrow-block
    end-to-end so this is normally free; pandas-block inputs (e.g.
    ``from_pandas`` in tests) map numpy dtypes, object → string."""
    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s
    fields = []
    for name, dt in zip(s.names, s.types):
        if isinstance(dt, pa.DataType):
            fields.append((name, dt))
        else:
            dt = np.dtype(dt)
            fields.append(
                (name, pa.string() if dt == object else pa.from_numpy_dtype(dt))
            )
    return pa.schema(fields)


def bucketed_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    num_buckets: int = 128,
    rsuffix: str = "_r",
    bloom_bits: int | None = None,
) -> rd.Dataset:
    """Hash-bucketed map-side equi-join: both sides tag into ONE union
    (typed-null carriers for the other side's columns), bucket by key
    hash, and each bucket does a vectorized ``pandas.merge`` — the same
    shape as ``grouped_apply``. Replaces ``Dataset.join``, whose
    hash-shuffle aggregator actors starve/hang when partitions approach
    the core count (hard-hung 2-cpu sf4 build even with the
    num_partitions guard — CLAUDE.md known gap).

    Key columns are never null in the union (each row carries its own
    key), so int64 keys survive the pandas conversion exactly. Non-key
    carriers stay exact: buckets convert to pandas with NULLABLE Int
    dtypes (``_NULLABLE_INT`` types_mapper — no float64 round-trip, so
    64-bit hash/fingerprint columns above 2^53 survive), and every
    bucket emits through ONE explicit Arrow output schema (left fields +
    right value fields), identical across buckets. Output columns:
    left's, then right's value columns (``rsuffix`` on name collisions).

    Scale shape: one shuffle of each side by key hash; a bucket costs
    its row count (both sides of any key land in one bucket — skewed
    keys cost their rows, never all-pairs across buckets).

    ``how="right"`` / ``"outer"`` complete the family: unmatched rows of
    the kept side(s) carry typed nulls in the other side's columns (key
    columns are coalesced by the per-bucket merge — a right-only row's
    key appears under the LEFT key names, cast to the left key types).
    Correct per bucket because both sides of any key hash to the same
    bucket — a bucket sees the key's complete row set from both sides.

    ``how="semi"`` / ``"anti"`` return LEFT rows (left's columns only,
    no duplication) whose key does / does not appear on the right —
    the existence-join pair the checklist lists alongside hash joins;
    per bucket they are one vectorized ``isin`` mask, and only the
    right side's KEY columns ride the shuffle.

    ``bloom_bits`` (inner/semi only): build a Bloom filter over the
    right keys (one extra streaming pass over the right's key columns)
    and drop left rows whose key provably has no match BEFORE they ride
    the shuffle. No false negatives → the result is bit-identical; false
    positives just reach the per-bucket exact merge and drop there. Pays
    off when the left is much larger than its matching subset (the
    selective-join shape); size ≈ 10× right's distinct keys."""
    assert how in ("inner", "left", "right", "outer", "semi", "anti"), how
    right_on = right_on or left_on
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lcols = list(lschema.names)
    existence = how in ("semi", "anti")
    # existence joins emit left rows only — nothing but the right KEYS
    # needs to ride the shuffle
    rvals = [] if existence else [c for c in rschema.names if c not in right_on]
    out_r = {c: (c + rsuffix if c in lcols else c) for c in rvals}

    bloom_ref = None
    if bloom_bits and how in ("inner", "semi"):
        import ray

        from .ops.sketch import bloom_build

        def _rkeys(t: pa.Table) -> pa.Table:
            # right keys cast to the LEFT key types + names so both
            # sides hash identical values
            return pa.table(
                {
                    lc: t[rc].cast(lschema.field(lc).type)
                    for lc, rc in zip(left_on, right_on)
                }
            )

        bloom_ref = ray.put(
            bloom_build(
                right.map_batches(_rkeys, batch_format="pyarrow"),
                left_on, bloom_bits,
            )
        )

    def _tag_left(t: pa.Table) -> pa.Table:
        if bloom_ref is not None:
            import ray

            from .ops.sketch import bloom_contains

            t = t.filter(
                pa.array(bloom_contains(t, left_on, ray.get(bloom_ref), bloom_bits))
            )
        bk = (_hash_cols(t, left_on) % np.uint64(num_buckets)).astype(np.int32)
        for c in rvals:
            t = t.append_column(out_r[c], pa.nulls(t.num_rows, rschema.field(c).type))
        t = t.append_column("__side", pa.array(np.zeros(t.num_rows, np.int8)))
        return t.append_column("__bk", pa.array(bk))

    def _tag_right(t: pa.Table) -> pa.Table:
        bk = (_hash_cols(t, right_on) % np.uint64(num_buckets)).astype(np.int32)
        cols = {}
        for c in lcols:
            if c in left_on:
                cols[c] = t[right_on[left_on.index(c)]].cast(lschema.field(c).type)
            else:
                cols[c] = pa.nulls(t.num_rows, lschema.field(c).type)
        for c in rvals:
            cols[out_r[c]] = t[c]
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["__bk"] = pa.array(bk)
        return pa.table(cols)

    lt = left.map_batches(_tag_left, batch_format="pyarrow")
    rt = right.map_batches(_tag_right, batch_format="pyarrow")
    r_out = [out_r[c] for c in rvals]
    # Explicit output schema: stops a bucket whose right side matched
    # nothing (all-null columns) from inferring `null` type and
    # breaking cross-bucket schema unification.
    out_schema = pa.schema(
        [lschema.field(c) for c in lcols]
        + [pa.field(out_r[c], rschema.field(c).type) for c in rvals]
    )

    def _merge(t: pa.Table) -> pa.Table:
        # Nullable Int dtypes (not float64-with-NaN): the tagged union's
        # nulls would otherwise widen int carriers through float64 and
        # silently corrupt values above 2^53 (64-bit hash / fingerprint
        # columns) on the cast back to out_schema.
        g = t.to_pandas(types_mapper=_NULLABLE_INT.get)
        l = g[g["__side"] == 0][lcols]
        if existence:
            rk = g[g["__side"] == 1][left_on]
            if len(left_on) == 1:
                mask = l[left_on[0]].isin(rk[left_on[0]])
            else:
                mask = pd.MultiIndex.from_frame(l[left_on]).isin(
                    pd.MultiIndex.from_frame(rk)
                )
            out = l[mask] if how == "semi" else l[~mask]
        else:
            r = g[g["__side"] == 1][left_on + r_out]
            out = pd.merge(l, r, on=left_on, how=how)
        return pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        lt.union(rt)
        .groupby("__bk")
        .map_groups(_merge, batch_format="pyarrow")
    )


def group_sum(
    ds: rd.Dataset, keys: list[str], value: str, alias: str | None = None,
    num_buckets: int = 128,
) -> rd.Dataset:
    """Distributed group-sum with MAP-SIDE COMBINING (r5): each block
    pre-aggregates with an Arrow-native group_by before the bucket
    shuffle, so the exchange carries O(distinct keys per block) rows
    instead of O(rows) — the classic combiner, and the lever that matters
    at 100 TB. NB: partial-then-final summing regroups float additions
    (ulp-level order dependence); every in-repo caller sums
    integer-valued columns (edge weights are counts, triangle credits are
    ints), which are exact under any grouping."""
    alias = alias or value

    def _partial(t: pa.Table) -> pa.Table:
        out = (
            t.select(keys + [value])
            .group_by(keys)
            .aggregate([(value, "sum")])
        )
        return out.rename_columns(keys + [alias])

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, as_index=False)[alias].sum()

    return grouped_apply(
        ds.map_batches(_partial, batch_format="pyarrow"), keys, _final,
        num_buckets,
    )


def group_count(
    ds: rd.Dataset, keys: list[str], alias: str = "count", num_buckets: int = 128
) -> rd.Dataset:
    """Distributed group-count with MAP-SIDE COMBINING (r5): per-block
    Arrow-native partial counts, bucketed sum of partials — the shuffle
    carries distinct keys per block, not rows. Counts are integers, so
    partial+final is exact under any grouping."""

    def _partial(t: pa.Table) -> pa.Table:
        out = t.select(keys).group_by(keys).aggregate([([], "count_all")])
        return out.rename_columns(keys + [alias])

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, as_index=False)[alias].sum()

    return grouped_apply(
        ds.map_batches(_partial, batch_format="pyarrow"), keys, _final,
        num_buckets,
    )


def distinct(ds: rd.Dataset, keys: list[str], num_buckets: int = 128) -> rd.Dataset:
    """Distributed distinct with MAP-SIDE COMBINING (r5): per-block
    Arrow-native dedup before the bucket shuffle — only each block's
    distinct keys travel."""

    def _partial(t: pa.Table) -> pa.Table:
        return t.select(keys).group_by(keys).aggregate([])

    def _d(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(keys)[keys]

    return grouped_apply(
        ds.map_batches(_partial, batch_format="pyarrow"), keys, _d, num_buckets
    )


def stratified_hash_sample(
    ds: rd.Dataset,
    key: str,
    strata_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    out_of: int = 1000,
) -> rd.Dataset:
    """Per-stratum deterministic content-hash sampling: row survives iff
    md5-low64(str(key)) % out_of < rate(its stratum). The
    corpus-rebalancing shape (downsample the dominant language, keep the
    long tail) with `hash_sample`'s reproducibility contract — same rows
    on any cluster size / run / block layout, and an exact SQL oracle
    via md5_number_lower + CASE. Pure map: no shuffle."""
    import hashlib

    def _keep(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
                % out_of
                for v in t[key].to_pylist()
            ),
            np.int64, t.num_rows,
        )
        strata = t[strata_col].to_numpy(zero_copy_only=False)
        thr = np.fromiter(
            (rates_permille.get(s, default_permille) for s in strata),
            np.int64, t.num_rows,
        )
        return t.filter(pa.array(h < thr))

    return ds.map_batches(_keep, batch_format="pyarrow")


def weighted_hash_sample(
    ds: rd.Dataset, key: str, weight_col: str, k: int
) -> rd.Dataset:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006 exponential races — public algorithm): row i gets
    ``e_i = -ln(u_i) / w_i`` with ``u_i`` a deterministic md5-uniform of
    its key, and the k SMALLEST e win; inclusion is weight-proportional
    at every draw. No RNG state: the same winners on any cluster size /
    run / block layout (the corpus-mixture-sampling contract of
    `hash_sample`, plus weights), and an exact SQL oracle exists —
    DuckDB rebuilds u via ``md5_number_lower % 2^53`` and replays the
    same ORDER BY e LIMIT k.

    Distributed as per-block top-k partials + one ≤ k·blocks final fold
    (the relational.py top-k pattern): only candidate rows shuffle.
    Ties on e (probability ~0 for continuous u) break by key."""
    import hashlib

    M = 1 << 53  # u from the top 53 bits: exact in float64

    def _key_e(t: pa.Table) -> np.ndarray:
        vals = t[key].to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
                % M
                for v in vals
            ),
            np.int64, len(vals),
        )
        u = (h + 0.5) / M
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(w) and not (w > 0).all():
            # E-S races are defined for strictly positive weights; w=0
            # yields e=inf (can still win under-full) and w<0 always wins
            raise ValueError(
                f"weighted_hash_sample: {weight_col!r} must be strictly "
                f"positive (min={w.min()!r})"
            )
        return -np.log(u) / w

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__e", pa.array([], pa.float64()))
        e = _key_e(t)
        kk = min(k, len(e))
        kid = t[key].to_numpy(zero_copy_only=False)
        idx = np.lexsort((kid, e))[:kk]
        return t.take(pa.array(np.sort(idx))).append_column(
            "__e", pa.array(e[np.sort(idx)])
        )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__e", key], kind="mergesort").head(k)
        return g.drop(columns=["__e", "__g"])

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("__g", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        .groupby("__g")
        .map_groups(arrow_groups(_final), batch_format="pandas")
    )


def hash_sample(
    ds: rd.Dataset, key: str, permille: int, out_of: int = 1000
) -> rd.Dataset:
    """Deterministic content-hash sampling: keep rows whose
    md5-low64(str(key)) % out_of < permille. No RNG state — the SAME rows
    survive on any cluster size, any run, any block layout (the property
    a reproducible training-corpus subsample needs; `Dataset.random_sample`
    is seed+layout dependent). Pure map: no shuffle, prunes at full scan
    speed. The hash convention is DuckDB's `md5_number_lower(CAST(key AS
    VARCHAR))` (same trick the SimHash oracle uses, ops/dedup.py:417), so
    an exact SQL oracle exists."""
    import hashlib

    def _keep(t: pa.Table) -> pa.Table:
        vals = t[key].to_pylist()
        m = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(v).encode()).digest()[8:], "little"
                ) % out_of
                < permille
                for v in vals
            ),
            np.bool_, len(vals),
        )
        return t.filter(pa.array(m))

    return ds.map_batches(_keep, batch_format="pyarrow")
