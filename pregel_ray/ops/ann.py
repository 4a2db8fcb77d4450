"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(`ray.put`), every batch does one numpy matmul against it, per-batch
top-k partials are folded in a tiny final stage (map-side combine: only
k rows per (query, batch) ever shuffle).

Scale path: IVF — k-means-ish coarse centroids (seeded, fit on a
sample), vectors bucketed by nearest centroid via ONE groupby; queries
probe the `nprobe` nearest centroid buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..agg import arrow_groups


def _stack(col) -> np.ndarray:
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)


def brute_topk(
    embeddings: rd.Dataset, queries: np.ndarray, query_ids: np.ndarray, k: int = 10
) -> rd.Dataset:
    """→ (query_id, vec_id, cos, rank 1..k) exact top-k by cosine.

    Ties broken by vec_id ascending (deterministic; matches the SQL
    oracle's ORDER BY cos DESC, vec_id ASC)."""
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put({"q": qn, "ids": np.asarray(query_ids, np.int64)})

    def _partials(t: pa.Table) -> pa.Table:
        lut = ray.get(q_ref)
        vecs = _stack(t["embedding"])
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = lut["q"] @ vn.T  # (Q, B)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        rows = {"query_id": [], "vec_id": [], "cos": []}
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            s = sims[qi]
            idx = np.argpartition(-s, kk - 1)[:kk]
            rows["query_id"].extend([int(lut["ids"][qi])] * kk)
            rows["vec_id"].extend(vid[idx].tolist())
            rows["cos"].extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "cos": pa.array(rows["cos"], pa.float64()),
            }
        )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        # sort on the ROUNDED similarity (ties → vec_id) so ordering matches
        # the SQL oracle bit-for-bit
        g = g.copy()
        g["cos"] = g["cos"].round(6)
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        embeddings.map_batches(_partials, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(arrow_groups(_final), batch_format="pandas")
    )


@ray.remote
def _gather_normed_matrix(block_refs: list) -> dict:
    """Assemble the broadcast {normed matrix, ids} in a remote task — the
    result lives in plasma; the driver only ever holds the ObjectRef."""
    tables = [b if isinstance(b, pa.Table) else ray.get(b) for b in block_refs]
    tables = [t for t in tables if t.num_rows]
    mat = np.concatenate([_stack(t["embedding"]) for t in tables])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids = np.concatenate(
        [t["vec_id"].to_numpy(zero_copy_only=False) for t in tables]
    ).astype(np.int64)
    return {"m": mat, "ids": ids}


def neardup_exact(embeddings: rd.Dataset, threshold: float = 0.95) -> rd.Dataset:
    """(a, b, cos) exact all-pairs cosine near-dup pairs (a < b).

    The normalized matrix is assembled in a remote task and broadcast from
    plasma (N×d floats — fine up to a few GB, never on the driver); each
    batch does one matmul against it and keeps only pairs where its own
    vec_id is the smaller (no duplicates, no self-pairs). O(N²) compares:
    the documented exactness baseline — `neardup` below gates to the
    LSH-bucketed sub-quadratic path once N×d outgrows a worker."""
    ref = _gather_normed_matrix.remote(embeddings.to_arrow_refs())

    def _pairs(t: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        vecs = _stack(t["embedding"])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        mine = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = vecs @ lut["m"].T  # (B, N)
        bi, oj = np.nonzero(sims >= threshold)
        a = mine[bi]
        b = lut["ids"][oj]
        keep = a < b
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "cos": pa.array(np.round(sims[bi, oj][keep], 6)),
            }
        )

    return embeddings.map_batches(_pairs, batch_format="pyarrow")


def neardup(
    embeddings: rd.Dataset, threshold: float = 0.95,
    exact_max_vectors: int = 2_000_000,
) -> rd.Dataset:
    """Near-dup pairs with a scale gate: the exact O(N²) broadcast-matmul
    baseline below `exact_max_vectors` (where the N×d matrix comfortably
    fits a worker and exactness is free), the LSH-bucketed sub-quadratic
    path (ops.dedup.embedding_near_dups: hyperplane codes, within-bucket
    exact verify) above it — the 100 TB shape."""
    if embeddings.count() <= exact_max_vectors:
        return neardup_exact(embeddings, threshold)
    from .dedup import embedding_near_dups

    return embedding_near_dups(embeddings, threshold)


def _fit_centroids(
    embeddings: rd.Dataset, n_centroids: int, sample_size: int, seed: int
) -> np.ndarray:
    """Unit-norm coarse centroids fit driver-side on a bounded seeded
    sample (mini k-means, 10 iterations, spherical) — the shared coarse
    quantizer of ivf_topk / knn_graph_ivf / kmeans_clusters. Driver
    memory is sample_size×d regardless of dataset size."""
    sample = embeddings.random_sample(
        min(1.0, sample_size / max(1, embeddings.count())), seed=seed
    ).to_pandas()
    x = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), min(n_centroids, len(x)), replace=False)]
    for _ in range(10):  # mini k-means on the sample
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def kmeans_clusters(
    embeddings: rd.Dataset,
    n_clusters: int = 16,
    sample_size: int = 2048,
    seed: int = 13,
) -> rd.Dataset:
    """(vec_id, cluster_id, cos): spherical k-means cluster assignment —
    the semantic-bucketing primitive (topic balancing, diversity
    sampling, per-cluster quota caps via ops.mix.group_quota_sample).
    Centroids fit on a bounded sample driver-side; assignment is one
    broadcast-matmul map pass (`ray.put` once, zero-copy read per task).
    ``cos`` is the similarity to the assigned centroid (rounded 1e-6) —
    low values flag outlier/junk embeddings."""
    cent_ref = ray.put(_fit_centroids(embeddings, n_clusters, sample_size, seed))

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vecs = _stack(t["embedding"])
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = vn @ c.T
        cluster = np.argmax(sims, axis=1)
        cos = np.round(sims[np.arange(len(cluster)), cluster], 6)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster_id": pa.array(cluster.astype(np.int64)),
                "cos": pa.array(cos),
            }
        )

    return embeddings.map_batches(_assign, batch_format="pyarrow")


def ivf_topk(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    seed: int = 13,
) -> rd.Dataset:
    """Approximate top-k: IVF coarse quantizer. Centroids fit driver-side
    on a bounded sample (seeded k-means, few iterations), then assignment
    and per-bucket search run distributed. Recall < 1 for
    nprobe < n_centroids; with nprobe == n_centroids every bucket is
    probed, so the search is exhaustive and exactly equals brute_topk
    (the mode the driver query uses so its SQL oracle is exact, while the
    recall pytest covers the approximate regime)."""
    cent = _fit_centroids(embeddings, n_centroids, sample_size, seed)
    cent_ref = ray.put(cent)

    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    q_sims = qn @ cent.T
    probes = np.argsort(-q_sims, axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_of_bucket: dict[int, list[int]] = {}
    for qi, bs in enumerate(probes):
        for b in bs:
            probe_of_bucket.setdefault(int(b), []).append(qi)
    q_ref = ray.put({"q": qn, "ids": np.asarray(query_ids, np.int64),
                     "probe_of_bucket": probe_of_bucket})

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vecs = _stack(t["embedding"])
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        bucket = np.argmax(vn @ c.T, axis=1).astype(np.int32)
        return pa.table(
            {"vec_id": t["vec_id"], "bucket": pa.array(bucket), "v": pa.array(list(vn))}
        )

    def _search(g: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(q_ref)
        b = int(g["bucket"].iloc[0])
        qis = lut["probe_of_bucket"].get(b, [])
        if not qis:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "vec_id": pd.Series([], dtype=np.int64),
                                 "cos": pd.Series([], dtype=np.float64)})
        vecs = np.stack(g["v"].to_numpy())
        vid = g["vec_id"].to_numpy()
        sims = lut["q"][qis] @ vecs.T
        out = {"query_id": [], "vec_id": [], "cos": []}
        kk = min(k, sims.shape[1])
        for row, qi in enumerate(qis):
            idx = np.argpartition(-sims[row], kk - 1)[:kk]
            out["query_id"].extend([int(lut["ids"][qi])] * kk)
            out["vec_id"].extend(vid[idx].tolist())
            out["cos"].extend(sims[row][idx].tolist())
        return pd.DataFrame(out).astype({"query_id": np.int64, "vec_id": np.int64})

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        # sort on the ROUNDED similarity (ties → vec_id) so ordering matches
        # the SQL oracle bit-for-bit
        g = g.copy()
        g["cos"] = g["cos"].round(6)
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        embeddings.map_batches(_assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(arrow_groups(_search), batch_format="pandas")
        .groupby("query_id")
        .map_groups(arrow_groups(_final), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# k-NN graph (every vector's top-k neighbors)
# ---------------------------------------------------------------------------


def knn_graph_exact(embeddings: rd.Dataset, k: int = 5) -> rd.Dataset:
    """(vec_id, nbr_id, cos, rank 1..k): exact k-NN graph by cosine,
    self excluded, ties broken by nbr_id ascending on the ROUNDED(6)
    similarity (matches the SQL oracle's ORDER BY).

    The normalized matrix is assembled in a remote task and broadcast
    from plasma once (`ray.put`-equivalent, never per batch); each batch
    is a slice of QUERY rows doing one matmul against the full matrix,
    so its per-row top-k is already final — no fold stage. O(N²/batch)
    work spread across batches; the documented exactness baseline below
    the `knn_graph` gate."""
    ref = _gather_normed_matrix.remote(embeddings.to_arrow_refs())

    def _topk(t: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        vecs = _stack(t["embedding"])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        mine = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = np.round(vecs @ lut["m"].T, 6)  # (B, N), oracle-rounded
        out = {"vec_id": [], "nbr_id": [], "cos": [], "rank": []}
        ids = lut["ids"]
        for row in range(sims.shape[0]):
            s = sims[row].copy()
            s[ids == mine[row]] = -np.inf  # drop self
            kk = min(k, len(s) - 1)
            if kk <= 0:
                continue
            # top-kk by value, then widen to all boundary ties before the
            # deterministic (−cos, nbr_id) lexsort of the small candidate set
            part = np.argpartition(-s, kk - 1)[:kk]
            kth = s[part].min()
            cand = np.flatnonzero(s >= kth)
            order = np.lexsort((ids[cand], -s[cand]))[:kk]
            sel = cand[order]
            out["vec_id"].extend([int(mine[row])] * kk)
            out["nbr_id"].extend(ids[sel].tolist())
            out["cos"].extend(s[sel].tolist())
            out["rank"].extend(range(1, kk + 1))
        return pa.table(
            {
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "nbr_id": pa.array(out["nbr_id"], pa.int64()),
                "cos": pa.array(out["cos"], pa.float64()),
                "rank": pa.array(out["rank"], pa.int64()),
            }
        )

    return embeddings.map_batches(_topk, batch_format="pyarrow")


def knn_graph_ivf(
    embeddings: rd.Dataset,
    k: int = 5,
    n_centroids: int = 16,
    sample_size: int = 2048,
    seed: int = 13,
) -> rd.Dataset:
    """Approximate k-NN graph: IVF-bucketed — vectors are assigned to
    their nearest coarse centroid (same sampled k-means as ivf_topk) and
    each bucket computes an EXACT local k-NN among its own members. Sub-
    quadratic (Σ|bucket|² « N²); recall < 1 only for neighbors that land
    in a different bucket — the recall pytest pins the regime. The
    100 TB shape: one groupby moves each vector once; per-bucket memory
    is |bucket|×d (raise n_centroids for hot buckets)."""
    cent_ref = ray.put(_fit_centroids(embeddings, n_centroids, sample_size, seed))

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vecs = _stack(t["embedding"])
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        bucket = np.argmax(vn @ c.T, axis=1).astype(np.int32)
        return pa.table(
            {"vec_id": t["vec_id"], "bucket": pa.array(bucket), "v": pa.array(list(vn))}
        )

    def _local_knn(g: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(g["v"].to_numpy())
        vid = g["vec_id"].to_numpy().astype(np.int64)
        sims = np.round(vecs @ vecs.T, 6)
        np.fill_diagonal(sims, -np.inf)
        out = {"vec_id": [], "nbr_id": [], "cos": [], "rank": []}
        kk = min(k, len(vid) - 1)
        if kk <= 0:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype=np.int64),
                 "nbr_id": pd.Series([], dtype=np.int64),
                 "cos": pd.Series([], dtype=np.float64),
                 "rank": pd.Series([], dtype=np.int64)}
            )
        for row in range(len(vid)):
            s = sims[row]
            part = np.argpartition(-s, kk - 1)[:kk]
            kth = s[part].min()
            cand = np.flatnonzero(s >= kth)
            order = np.lexsort((vid[cand], -s[cand]))[:kk]
            sel = cand[order]
            out["vec_id"].extend([int(vid[row])] * kk)
            out["nbr_id"].extend(vid[sel].tolist())
            out["cos"].extend(s[sel].tolist())
            out["rank"].extend(range(1, kk + 1))
        return pd.DataFrame(out).astype(
            {"vec_id": np.int64, "nbr_id": np.int64, "rank": np.int64}
        )

    return (
        embeddings.map_batches(_assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(arrow_groups(_local_knn), batch_format="pandas")
    )


def knn_graph(
    embeddings: rd.Dataset, k: int = 5, exact_max_vectors: int = 2_000_000
) -> rd.Dataset:
    """k-NN graph with the repo's standard scale gate: exact broadcast-
    matmul baseline while the N×d matrix fits a worker, IVF-bucketed
    sub-quadratic approximation above (the 100 TB shape)."""
    if embeddings.count() <= exact_max_vectors:
        return knn_graph_exact(embeddings, k)
    return knn_graph_ivf(embeddings, k)
