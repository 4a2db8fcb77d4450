"""Distributed sketches: HyperLogLog distinct-count, Bloom-filter join
pruning, Misra-Gries heavy hitters, and Count-Min point frequencies.

The reference has no sketches at all (SURVEY.md §2.9 "sketches /
approximate aggregates: none"), but a 100 TB training-data pipeline
needs cardinality estimates (how many distinct users/URLs/shingles)
without a full `COUNT(DISTINCT)` shuffle, Bloom pre-filters to keep
non-matching rows out of join shuffles, frequent-item summaries
(heavy_hitters), and mergeable point-frequency estimates
(cms_counters). All follow the published algorithms (Flajolet et al.
2007 HyperLogLog; Bloom 1970; Misra & Gries 1982; Cormode &
Muthukrishnan 2005), and all share one scale shape: the sketch IS the
reduction — per-block partials bounded by the sketch size, map-side
combined, one tiny bucketed merge; the corpus itself never shuffles.

Determinism contract: both sketches are pure functions of the data —
no RNG, no layout dependence — so HLL registers have an EXACT DuckDB
oracle (the hash is the md5-low64 convention DuckDB spells
`md5_number_lower`, same as agg.hash_sample / the SimHash oracle,
ops/dedup.py:417) and Bloom pruning provably never changes a join
result (no false negatives; false positives are dropped by the exact
per-bucket merge that follows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _md5_low64(vals: list) -> np.ndarray:
    """md5-low64 (little-endian low 8 bytes) per value — DuckDB's
    `md5_number_lower(CAST(v AS VARCHAR))`. Per-row md5 is the price of
    SQL-oracle parity; for production scale swap `hash_fn="fnv"` below
    (vectorized, no oracle)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
            for v in vals
        ),
        np.uint64,
        len(vals),
    )


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (0 → 0). Exact for the
    full 64-bit range — float log2 would lose bits past the 53-bit
    mantissa."""
    x = x.copy()
    r = np.zeros(len(x), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        r[big] += s
        x[big] >>= np.uint64(s)
    return r + (x > 0)


def hll_registers(
    ds: rd.Dataset,
    key: str,
    by: list[str] | None = None,
    p: int = 8,
    hash_fn: str = "md5",
) -> rd.Dataset:
    """HyperLogLog register table per `by` group: for each touched
    register (low `p` hash bits), the max rho (1 + leading-zero count of
    the remaining 64-p bits). Untouched registers are absent (= 0).

    Scale shape: the sketch IS the reduction — each block folds its rows
    into ≤ m=2^p (by, register, rho) partials map-side, then one bucketed
    max-merge ships at most groups × m tiny rows through the shuffle;
    the corpus never moves. Sketches merge by elementwise max, so the
    same code serves partial sketches per shard / per day / per source.

    `hash_fn="md5"` matches DuckDB `md5_number_lower` (exact SQL oracle);
    `"fnv"` is the vectorized production hash (edges.stable_hash)."""
    from ..agg import grouped_apply

    by = by or []
    m_mask = np.uint64((1 << p) - 1)
    rem_bits = 64 - p

    def _partial(t: pa.Table) -> pa.Table:
        if hash_fn == "md5":
            h = _md5_low64(t[key].to_pylist())
        else:
            from ..edges import stable_hash

            col = t[key]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                h = stable_hash(col.to_numpy(zero_copy_only=False))
            else:
                h = stable_hash(
                    col.to_numpy(zero_copy_only=False).astype(str).astype(object)
                )
        reg = (h & m_mask).astype(np.int32)
        rem = h >> np.uint64(p)
        rho = (rem_bits - _bit_length_u64(rem) + 1).astype(np.int32)
        cols = {b: t[b] for b in by}
        cols["register"] = pa.array(reg)
        cols["rho"] = pa.array(rho)
        part = pa.table(cols)
        # map-side fold: ≤ m rows per (by-group, block) leave this task
        df = part.to_pandas()
        out = df.groupby(by + ["register"], sort=False, as_index=False)["rho"].max()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(by + ["register"], sort=False, as_index=False)["rho"].max()
        return out.rename(columns={"rho": "max_rho"})

    return grouped_apply(
        ds.map_batches(_partial, batch_format="pyarrow"),
        by + ["register"],
        _merge,
    )


def hll_estimate(registers: pd.DataFrame, p: int = 8, by: list[str] | None = None) -> pd.DataFrame:
    """Distinct-count estimate from an `hll_registers` table (small:
    ≤ groups × 2^p rows — driver-side by design). Standard HLL with the
    small-range linear-counting correction; relative error ≈ 1.04/√m."""
    by = by or []
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def _est(g: pd.DataFrame) -> float:
        rho = np.zeros(m)
        rho[g["register"].to_numpy()] = g["max_rho"].to_numpy()
        e = alpha * m * m / np.sum(np.exp2(-rho))
        zeros = m - len(g)
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        return e

    if not by:
        return pd.DataFrame({"estimate": [_est(registers)]})
    out = registers.groupby(by, sort=False).apply(_est, include_groups=False)
    return out.rename("estimate").reset_index()


# ---------------------------------------------------------------------------
# Bloom filter


def _bloom_hashes(t: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per row for double hashing
    (Kirsch–Mitzenmacher: h_i = h1 + i·h2)."""
    from ..agg import _hash_cols

    h1 = _hash_cols(t, keys)
    x = h1 * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(29)
    h2 = (x * np.uint64(0xBF58476D1CE4E5B9)) | np.uint64(1)  # odd → full cycle
    return h1, h2


def bloom_build(
    ds: rd.Dataset, keys: list[str], num_bits: int = 1 << 20, k: int = 4
) -> np.ndarray:
    """Build a Bloom bitmap (uint64 words) over `keys`. Each block sets
    its bits into a partial bitmap inside the map task; the driver
    OR-folds the streamed partials — driver memory is O(num_bits)
    (one bitmap, 128 KiB at the default), never O(rows). Size num_bits
    ≈ 10× expected distinct keys for ~1% false positives at k=4."""
    words = num_bits // 64

    def _partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, np.uint64)
        h1, h2 = _bloom_hashes(t, keys)
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(bm, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    out = np.zeros(words, np.uint64)
    for b in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b["bm"].to_pylist():
            out |= np.frombuffer(buf, np.uint64)
    return out


def bloom_contains(
    t: pa.Table, keys: list[str], bitmap: np.ndarray, num_bits: int, k: int = 4
) -> np.ndarray:
    """Vectorized membership mask for one Arrow batch (no false
    negatives)."""
    h1, h2 = _bloom_hashes(t, keys)
    mask = np.ones(t.num_rows, bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        bit = (bitmap[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (frequent items)


def heavy_hitters(
    ds: rd.Dataset,
    key: str,
    k: int = 20,
    capacity: int = 4096,
    num_buckets: int = 128,
    return_bound: bool = False,
    by: list[str] | None = None,
) -> rd.Dataset | tuple[rd.Dataset, int]:
    """Top-k most frequent values of `key` via a distributed Misra-Gries
    summary (Misra & Gries 1982; mergeability per Agarwal et al. 2012).
    Returns (key, cnt) rows, ordered (cnt desc, key asc), rank <= k.

    ``by`` makes it per-group (top URLs per language — the canonical
    use): `capacity` then bounds each GROUP's per-block summary, the
    compression threshold is computed within each (block, group), and
    the result is the top-k per group (grouped_topk fold, ≤ k·blocks
    rows per group shuffle). `return_bound` is global-only (a single
    scalar can't bound per-group error honestly) — ValueError with by.

    Scale shape — the sketch IS the reduction, like `hll_registers`:
    each block folds its rows into an exact Arrow value-count, then
    MG-compresses to <= `capacity` counters (subtract the
    (capacity+1)-th largest count, drop non-positives — every survivor
    undercounts by <= that block threshold). Only <= capacity rows per
    block enter the bucketed group-sum (map-side combined), and the
    final top-k ships <= k rows per bucket into one tiny sort. The
    corpus itself never shuffles, and no stage holds more than
    O(capacity) counters.

    Guarantees: for every value, true - sum(block thresholds) <= est
    <= true, so any value with global frequency > N/(capacity+1)
    appears in the summary. With `capacity` >= the GLOBAL distinct
    count no compression ever fires and the result is EXACT — the
    regime the extras SQL oracle pins at gate scale (the same
    exact-regime trick as the IVF nprobe=n_centroids oracle).

    `return_bound=True` additionally returns the summed per-block
    compression thresholds B (materializes the tiny partials once):
    every reported cnt satisfies cnt <= true <= cnt + B.
    """
    import pyarrow.compute as pc

    from ..agg import group_sum

    if by:
        if return_bound:
            raise ValueError("return_bound is global-only; unsupported with by")
        return _heavy_hitters_by(ds, key, k, capacity, num_buckets, list(by))

    def _partial(t: pa.Table) -> pa.Table:
        vc = (
            t.select([key])
            .group_by([key])
            .aggregate([([], "count_all")])
            .rename_columns([key, "cnt"])
        )
        thr = 0
        n = vc.num_rows
        if n > capacity:
            cnts = vc["cnt"].to_numpy()
            # (capacity+1)-th largest = ascending index n-capacity-1
            thr = int(np.partition(cnts, n - capacity - 1)[n - capacity - 1])
            vc = vc.filter(pa.array(cnts > thr))
            vc = pa.table(
                {key: vc[key], "cnt": pa.array(vc["cnt"].to_numpy() - thr)}
            )
        if return_bound:
            # per-block threshold rides a sidecar row (null key, cnt=0)
            # so one pass yields both the counters and the error bound
            vc = vc.append_column("thr", pa.array(np.zeros(vc.num_rows, np.int64)))
            if thr:
                vc = pa.concat_tables(
                    [
                        vc,
                        pa.table(
                            {
                                key: pa.array([None], vc[key].type),
                                "cnt": pa.array([0], pa.int64()),
                                "thr": pa.array([thr], pa.int64()),
                            }
                        ),
                    ]
                )
        return vc

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    bound = 0
    if return_bound:
        parts = parts.materialize()  # tiny: <= capacity(+1) rows per block
        bound = int(parts.sum("thr") or 0)
        parts = parts.map_batches(
            lambda t: t.filter(pc.is_valid(t[key])).drop_columns(["thr"]),
            batch_format="pyarrow",
        )

    sums = group_sum(parts, [key], "cnt", num_buckets=num_buckets)

    def _block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), (key, "ascending")]
        )
        return t.take(idx[:k])

    out = (
        sums.map_batches(_block_topk, batch_format="pyarrow")
        .sort(["cnt", key], descending=[True, False])
        .limit(k)
    )
    return (out, bound) if return_bound else out


def _heavy_hitters_by(
    ds: rd.Dataset, key: str, k: int, capacity: int, num_buckets: int,
    by: list[str],
) -> rd.Dataset:
    """Per-group Misra-Gries: per-block exact (by, key) value-count,
    MG compression WITHIN each (block, group) — vectorized via a
    per-group rank (sort + group-run cumcount, no Python per group) —
    then one bucketed group-sum and a grouped_topk fold."""
    import pyarrow.compute as pc

    cols = list(by) + [key]

    def _partial(t: pa.Table) -> pa.Table:
        vc = (
            t.select(cols)
            .group_by(cols)
            .aggregate([([], "count_all")])
            .rename_columns(cols + ["cnt"])
        )
        if vc.num_rows == 0:
            return vc
        # rank of each counter within its group, by cnt desc: sort by
        # (by..., cnt desc) then cumcount along group runs
        keys_sort = [(c, "ascending") for c in by] + [("cnt", "descending")]
        vs = vc.take(pc.sort_indices(vc, sort_keys=keys_sort))
        boundary = np.zeros(vs.num_rows, bool)
        boundary[0] = True
        for c in by:
            a = vs[c].to_numpy(zero_copy_only=False)
            boundary[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(boundary)
        rank = np.arange(vs.num_rows) - np.repeat(
            starts, np.diff(np.append(starts, vs.num_rows))
        )
        cnts = vs["cnt"].to_numpy()
        # per-group threshold = the (capacity+1)-th largest (rank
        # `capacity` after the desc sort), 0 when the group is small
        thr_g = np.zeros(len(starts), np.int64)
        at = starts + capacity
        ok = at < np.append(starts[1:], vs.num_rows)
        thr_g[ok] = cnts[(at[ok])]
        thr = np.repeat(thr_g, np.diff(np.append(starts, vs.num_rows)))
        keep = (rank < capacity) & (cnts > thr)
        out = vs.filter(pa.array(keep))
        return pa.table(
            {
                **{c: out[c] for c in by},
                key: out[key],
                "cnt": pa.array(out["cnt"].to_numpy() - thr[keep]),
            }
        )

    from ..agg import group_sum
    from .text import grouped_topk

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    sums = group_sum(parts, cols, "cnt", num_buckets=num_buckets)
    return grouped_topk(sums, by, "cnt", k, tiebreak=key)


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimates)


def cms_counters(
    ds: rd.Dataset,
    key: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "md5",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Count-Min sketch counter table for `key` (Cormode & Muthukrishnan
    2005): rows (d, cell, cnt) where cnt = total count of values whose
    row-d hash lands in `cell`. Complements `heavy_hitters` (top-k) with
    mergeable POINT estimates: `cms_estimate` answers "how often did X
    occur" for any X, always >= true, <= true + 2N/width per row with
    probability 1 - 2^-depth overall.

    Scale shape — the sketch IS the reduction (same as `hll_registers`):
    each block folds to an exact Arrow value-count, hashes the <= D
    distinct values into depth rows of width cells, combines map-side,
    and ships <= depth*width tiny rows into a bucketed group-sum. The
    corpus never shuffles. Counter tables from different shards/days
    merge by cellwise addition (`cms_merge`) — sums commute, so the
    merged table is bit-identical to a single-pass build.

    `hash_fn="md5"`: row-d hash = md5-low64 of f"{d}:{value}" — DuckDB
    `md5_number_lower(CONCAT(d, ':', CAST(v AS VARCHAR))) % width`, so
    the whole counter table has an EXACT SQL oracle (the HLL
    register-rebuild trick). `"fnv"` = vectorized production hash.
    """
    from ..agg import group_sum

    def _partial(t: pa.Table) -> pa.Table:
        vc = (
            t.select([key])
            .group_by([key])
            .aggregate([([], "count_all")])
            .rename_columns([key, "cnt"])
        )
        vals = vc[key].to_pylist()
        cnts = vc["cnt"].to_numpy().astype(np.int64)
        outs = []
        for d in range(depth):
            cell = _cms_cells(vals, d, width, hash_fn)
            outs.append(
                pa.table(
                    {
                        "d": pa.array(np.full(len(vals), d, np.int32)),
                        "cell": pa.array(cell),
                        "cnt": pa.array(cnts),
                    }
                )
            )
        merged = pa.concat_tables(outs)
        g = merged.group_by(["d", "cell"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["d", "cell", "cnt"])

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return group_sum(parts, ["d", "cell"], "cnt", num_buckets=num_buckets)


def _cms_cells(vals: list, d: int, width: int, hash_fn: str) -> np.ndarray:
    """Row-d cell index per value (int32)."""
    if hash_fn == "md5":
        h = _md5_low64([f"{d}:{v}" for v in vals])
    else:
        from ..edges import stable_hash

        h = stable_hash(np.array([f"{d}:{v}" for v in vals], object))
    return (h % np.uint64(width)).astype(np.int32)


def cms_merge(tables: list[pa.Table]) -> pa.Table:
    """Cellwise-sum partial counter tables (per shard / day / source)
    into one. Input/output are the TINY materialized counter tables
    (<= depth*width rows each), never data-sized."""
    t = pa.concat_tables(tables)
    g = t.group_by(["d", "cell"]).aggregate([("cnt", "sum")])
    return g.rename_columns(["d", "cell", "cnt"])


def cms_estimate(
    counters: rd.Dataset | pa.Table,
    values: list,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "md5",
) -> np.ndarray:
    """Point-frequency estimates: min over depth rows of the value's
    cell counters. Materializes only the counter table (bounded at
    depth*width rows — never data-sized)."""
    if isinstance(counters, rd.Dataset):
        tabs = list(_iter_tables(counters))
        counters = (
            pa.concat_tables(tabs)
            if tabs
            else pa.table(
                {
                    "d": pa.array([], pa.int32()),
                    "cell": pa.array([], pa.int32()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        )
    dense = np.zeros((depth, width), np.int64)
    dense[counters["d"].to_numpy(), counters["cell"].to_numpy()] = (
        counters["cnt"].to_numpy()
    )
    est = np.full(len(values), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        cells = _cms_cells(values, d, width, hash_fn)
        est = np.minimum(est, dense[d, cells])
    return est


def _iter_tables(ds: rd.Dataset):
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        yield b
