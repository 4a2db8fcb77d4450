"""t-digest: rank-error bound, merge law, determinism, Ray pipeline."""

import numpy as np
import pytest

from pregel_ray.ops.tdigest import TDigest, tdigest_quantiles

DELTA = 200
QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(sample_sorted: np.ndarray, est: float, q: float) -> float:
    """|empirical CDF(est) − q| with the CDF interval for ties."""
    n = len(sample_sorted)
    lo = np.searchsorted(sample_sorted, est, side="left") / n
    hi = np.searchsorted(sample_sorted, est, side="right") / n
    if lo <= q <= hi:
        return 0.0
    return min(abs(lo - q), abs(hi - q))


def _bound(q: float, n: int) -> float:
    # k1 scale: cluster q-width ≈ 2π·sqrt(q(1−q))/δ; allow a full width
    # (interpolation typically does ~10× better) plus discretization
    return 2 * np.pi * np.sqrt(q * (1 - q)) / DELTA + 2.0 / n


@pytest.mark.parametrize(
    "dist",
    ["uniform", "normal", "lognormal", "exponential"],
)
def test_rank_error_bound(dist):
    rng = np.random.default_rng(7)
    n = 200_000
    v = {
        "uniform": rng.random(n),
        "normal": rng.standard_normal(n),
        "lognormal": rng.lognormal(0, 2, n),  # heavy tail
        "exponential": rng.exponential(1.0, n),
    }[dist]
    d = TDigest.from_values(v, DELTA)
    assert len(d.means) <= DELTA + 2
    s = np.sort(v)
    for q in QS:
        err = _rank_error(s, d.quantile(q), q)
        assert err <= _bound(q, n), (dist, q, err, _bound(q, n))


def test_merge_law_and_accuracy():
    """Digest of chunk-merges obeys the same bound as one whole-data
    digest, and stays close to it."""
    rng = np.random.default_rng(11)
    n = 120_000
    v = rng.lognormal(0, 1.5, n)
    whole = TDigest.from_values(v, DELTA)
    parts = [TDigest.from_values(c, DELTA) for c in np.array_split(v, 13)]
    merged = TDigest.merge_all(parts, DELTA)
    assert merged.n == whole.n == n
    assert merged.vmin == whole.vmin and merged.vmax == whole.vmax
    s = np.sort(v)
    for q in QS:
        assert _rank_error(s, merged.quantile(q), q) <= 2 * _bound(q, n), q
        # merged vs whole agree to within the combined bound in rank space
        dq = abs(
            np.searchsorted(s, merged.quantile(q)) -
            np.searchsorted(s, whole.quantile(q))
        ) / n
        assert dq <= 2 * _bound(q, n), q

    # pairwise merge path agrees with merge_all within the bound too
    pair = parts[0]
    for p in parts[1:]:
        pair = pair.merge(p)
    for q in QS:
        assert _rank_error(s, pair.quantile(q), q) <= 3 * _bound(q, n), q


def test_merge_all_order_invariant_and_deterministic():
    rng = np.random.default_rng(3)
    chunks = [rng.standard_normal(10_000) * (i + 1) for i in range(7)]
    parts = [TDigest.from_values(c, DELTA) for c in chunks]
    a = TDigest.merge_all(list(parts), DELTA)
    b = TDigest.merge_all(list(reversed(parts)), DELTA)
    np.testing.assert_array_equal(a.means, b.means)
    np.testing.assert_array_equal(a.weights, b.weights)
    # rebuilding from the same values is bit-identical
    c = TDigest.from_values(np.concatenate(chunks), DELTA)
    d = TDigest.from_values(np.concatenate(chunks), DELTA)
    np.testing.assert_array_equal(c.means, d.means)


def test_edges_and_ties():
    # constant column
    d = TDigest.from_values(np.full(1000, 5.0), DELTA)
    for q in (0.0, 0.3, 1.0):
        assert d.quantile(q) == 5.0
    # empty
    e = TDigest.from_values([], DELTA)
    assert np.isnan(e.quantile(0.5)) and e.n == 0
    # heavy ties: estimates stay within [min, max] and are monotone in q
    rng = np.random.default_rng(5)
    v = rng.integers(0, 10, 50_000).astype(float)
    d = TDigest.from_values(v, DELTA)
    est = d.quantiles(np.linspace(0, 1, 21))
    assert est.min() >= 0.0 and est.max() <= 9.0
    assert (np.diff(est) >= -1e-12).all()
    # exact extremes
    assert d.quantile(0.0) == v.min() and d.quantile(1.0) == v.max()


def test_ray_pipeline_vs_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(17)
    n = 160_000
    v = rng.lognormal(1.0, 1.0, n)
    ds = rd.from_arrow(pa.table({"value": pa.array(v)})).repartition(8)
    out = tdigest_quantiles(ds, "value", QS, DELTA).to_pandas()
    assert out["n"].tolist() == [n] * len(QS)
    s = np.sort(v)
    got = out.set_index("q_ppm")
    for q in QS:
        est = got.loc[int(round(q * 1e6)), "value"]
        assert _rank_error(s, est, q) <= 2 * _bound(q, n), q


def test_ray_pipeline_grouped(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(23)
    n = 90_000
    grp = rng.integers(0, 3, n)
    v = rng.exponential(1.0, n) * (grp + 1)  # per-group scale differs
    ds = rd.from_arrow(
        pa.table({"g": pa.array([f"g{i}" for i in grp]), "value": pa.array(v)})
    ).repartition(6)
    out = tdigest_quantiles(ds, "value", QS, DELTA, by=["g"]).to_pandas()
    assert len(out) == 3 * len(QS)
    for gi in range(3):
        sub = v[grp == gi]
        s = np.sort(sub)
        rows = out[out["g"] == f"g{gi}"].set_index("q_ppm")
        assert rows["n"].iloc[0] == len(sub)
        for q in QS:
            est = rows.loc[int(round(q * 1e6)), "value"]
            assert _rank_error(s, est, q) <= 2 * _bound(q, len(sub)), (gi, q)


def test_tdigest_agrees_with_sampled_quantiles(ray_session):
    """Two independent estimators of the same distribution (t-digest
    centroids vs the md5 hash-sample + rank pick) must land within their
    combined rank bounds of each other."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import approx_quantiles

    rng = np.random.default_rng(29)
    n = 120_000
    v = rng.lognormal(0.5, 1.2, n)
    ds = rd.from_arrow(
        pa.table({"event_id": pa.array(np.arange(n)), "value": pa.array(v)})
    ).repartition(6)
    qs = [0.25, 0.5, 0.75, 0.9]
    td = tdigest_quantiles(ds, "value", qs, DELTA).to_pandas().set_index("q_ppm")
    samp = (
        approx_quantiles(ds, "value", [int(q * 1000) for q in qs], key="event_id")
        .to_pandas().set_index("q_permille")
    )
    s = np.sort(v)
    for q in qs:
        a = td.loc[int(q * 1e6), "value"]
        b = samp.loc[int(q * 1000), "value"]
        ra = np.searchsorted(s, a) / n
        rb = np.searchsorted(s, b) / n
        # t-digest bound + DKW 10%-sample bound, generous 2x
        assert abs(ra - rb) <= 2 * (_bound(q, n) + 0.015), (q, ra, rb)
