"""t-digest approximate quantiles for UNBOUNDED domains.

The scale path SURVEY.md §2 names next to the exact histogram
(bounded domains) and the deterministic hash sample (DKW bound):
mergeable centroid sketches that ride the shuffle exactly like the
HyperLogLog registers — each input block folds to ≤ ``delta`` (mean,
weight) centroids, partial digests merge associatively-enough
(error bound preserved under merging), and the final digest answers any
quantile with a rank error that SHRINKS toward the tails.

Public algorithm: Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests" (arXiv:1902.04023). This implementation uses
the MERGING digest with the k1 scale function

    k(q) = (delta / 2π) · asin(2q − 1)

and a VECTORIZED cluster assignment: after sorting by value, a point at
cumulative-rank midpoint q joins cluster ``floor(k(q))`` — one
np.floor over the whole array instead of the paper's sequential greedy
pass. Each cluster's q-span is ≤ k⁻¹ of a unit step, which keeps the
classic t-digest bound: rank error ≤ O(q(1−q)/delta) — relatively
tighter at the tails, the property samples and histograms lack.

Determinism: cluster assignment depends only on the sorted value
multiset, so a digest built from a fixed multiset is unique; merges
re-sort and re-bin, so merge results depend only on the centroid
multisets being merged. The distributed pipeline sorts partial digests
by (min, n) before folding — same input blocks → bit-identical output.

The reference has no sketches at all (SURVEY.md §2.9); this is a
checklist extension like ops/sketch.py's HLL/Bloom.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


class TDigest:
    """Immutable centroid sketch: means ascending, weights ≥ 1 aligned,
    exact min/max/n carried for tail interpolation."""

    __slots__ = ("means", "weights", "vmin", "vmax", "n", "delta")

    def __init__(self, means, weights, vmin, vmax, n, delta):
        self.means = np.asarray(means, np.float64)
        self.weights = np.asarray(weights, np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self.n = float(n)
        self.delta = int(delta)

    # -- construction --------------------------------------------------------

    @staticmethod
    def _compress(vals: np.ndarray, wts: np.ndarray, delta: int):
        """Vectorized k-space binning of (value, weight) pairs sorted by
        value → centroid (mean, weight) arrays."""
        order = np.argsort(vals, kind="stable")
        v, w = vals[order], wts[order]
        n = w.sum()
        # midpoint cumulative rank of each point, in (0, 1)
        q = (np.cumsum(w) - 0.5 * w) / n
        k = (delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)
        cluster = np.floor(k).astype(np.int64)
        # segment-reduce by cluster id (contiguous because q is sorted)
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(cluster)) + 1))
        cw = np.add.reduceat(w, bounds)
        cm = np.add.reduceat(v * w, bounds) / cw
        return cm, cw

    @classmethod
    def from_values(cls, values, delta: int = 200) -> "TDigest":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return cls([], [], np.nan, np.nan, 0, delta)
        means, weights = cls._compress(v, np.ones(len(v)), delta)
        return cls(means, weights, v.min(), v.max(), len(v), delta)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.n == 0:
            return other
        if other.n == 0:
            return self
        assert self.delta == other.delta
        vals = np.concatenate([self.means, other.means])
        wts = np.concatenate([self.weights, other.weights])
        means, weights = self._compress(vals, wts, self.delta)
        return TDigest(
            means, weights,
            min(self.vmin, other.vmin), max(self.vmax, other.vmax),
            self.n + other.n, self.delta,
        )

    @staticmethod
    def merge_all(digests: list["TDigest"], delta: int = 200) -> "TDigest":
        """Deterministic fold: sort partials by (vmin, n, mean-sum) first so
        the result is independent of arrival order."""
        live = [d for d in digests if d.n > 0]
        if not live:
            return TDigest([], [], np.nan, np.nan, 0, delta)
        live.sort(key=lambda d: (d.vmin, d.n, float(d.means.sum())))
        # one concat + one compress (cheaper and MORE accurate than a
        # pairwise fold chain; total centroids ≤ len(digests)·delta)
        vals = np.concatenate([d.means for d in live])
        wts = np.concatenate([d.weights for d in live])
        means, weights = TDigest._compress(vals, wts, live[0].delta)
        return TDigest(
            means, weights,
            min(d.vmin for d in live), max(d.vmax for d in live),
            sum(d.n for d in live), live[0].delta,
        )

    # -- queries ---------------------------------------------------------------

    def quantile(self, q: float) -> float:
        """Standard t-digest interpolation: centroids act as point masses at
        their means with half-weight on each side; min/max anchor the tails."""
        if self.n == 0:
            return float("nan")
        q = min(max(float(q), 0.0), 1.0)
        target = q * self.n
        m, w = self.means, self.weights
        if len(m) == 1:
            return float(m[0])
        # cumulative weight up to each centroid's CENTER
        cum = np.cumsum(w) - 0.5 * w
        if target <= cum[0]:
            # interpolate min → first centroid center
            span = cum[0]
            frac = target / span if span > 0 else 0.0
            return float(self.vmin + frac * (m[0] - self.vmin))
        if target >= cum[-1]:
            span = self.n - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 1.0
            return float(m[-1] + frac * (self.vmax - m[-1]))
        i = int(np.searchsorted(cum, target, side="right"))
        lo, hi = cum[i - 1], cum[i]
        frac = (target - lo) / (hi - lo) if hi > lo else 0.0
        return float(m[i - 1] + frac * (m[i] - m[i - 1]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    # -- (de)serialization for the shuffle --------------------------------------

    def to_row(self) -> dict:
        return {
            "means": self.means.tolist(),
            "weights": self.weights.tolist(),
            "vmin": self.vmin,
            "vmax": self.vmax,
            "n": self.n,
        }

    @classmethod
    def from_row(cls, row: dict, delta: int) -> "TDigest":
        return cls(row["means"], row["weights"], row["vmin"], row["vmax"],
                   row["n"], delta)


_PARTIAL_SCHEMA = pa.schema(
    [
        ("means", pa.list_(pa.float64())),
        ("weights", pa.list_(pa.float64())),
        ("vmin", pa.float64()),
        ("vmax", pa.float64()),
        ("n", pa.float64()),
    ]
)


def tdigest_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    delta: int = 200,
    by: list[str] | None = None,
) -> rd.Dataset:
    """Distributed quantiles of ``ds[col]`` via t-digest: each block folds
    map-side to ONE ≤ delta-centroid partial row per (block × group) —
    the sketch IS the shuffle payload, the same shape as
    ops/sketch.hll_registers — then one bucketed groupby folds each
    group's partials in deterministic order and emits its (q, value)
    rows. Nothing data-sized ever reaches the driver; with ``by=None``
    the shuffle carries ≤ #blocks rows of ≤ delta centroids each.

    Returns a Dataset of (by..., q_ppm, value, n) rows."""
    import pandas as pd

    from ..agg import grouped_apply

    keys = list(by) if by else []

    def _partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False)
        out_rows = []
        if keys:
            df = pd.DataFrame({k: t[k].to_pylist() for k in keys})
            df["__v"] = vals
            for kv, g in df.groupby(keys, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                r = TDigest.from_values(g["__v"].to_numpy(), delta).to_row()
                out_rows.append(dict(zip(keys, kv)) | r)
        else:
            out_rows.append(TDigest.from_values(vals, delta).to_row())
        schema = pa.schema(
            [(k, t.schema.field(k).type) for k in keys]
            + list(zip(_PARTIAL_SCHEMA.names, _PARTIAL_SCHEMA.types))
        )
        return pa.table(
            {f.name: pa.array([r[f.name] for r in out_rows], f.type)
             for f in schema},
            schema=schema,
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    if not keys:
        partials = partials.map_batches(
            lambda t: t.append_column(
                "__g", pa.array(np.zeros(t.num_rows, np.int8))
            ),
            batch_format="pyarrow",
        )
    gkeys = keys or ["__g"]
    q_ppm = [int(round(q * 1e6)) for q in qs]

    def _merge_group(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for kv, gg in g.groupby(gkeys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            final = TDigest.merge_all(
                [TDigest.from_row(r, delta) for _, r in gg.iterrows()], delta
            )
            base = dict(zip(gkeys, kv)) if keys else {}
            for q, qp in zip(qs, q_ppm):
                out.append(base | {"q_ppm": qp, "value": final.quantile(q),
                                   "n": int(final.n)})
        return pd.DataFrame(out)

    return grouped_apply(partials, gkeys, _merge_group)
