"""Triangle counting — a Ray Data join pipeline, not a BSP loop.

Classic two-round distributed algorithm (degree-ordered wedge join;
SURVEY.md §7.3 step 5):

  1. simple undirected edge set: canonical (lo,hi) pairs, dedup, no
     self-loops;
  2. orient each edge from the lower-rank endpoint to the higher, where
     rank = (degree, vid) — bounds oriented out-degree by ~√E, so the
     wedge explosion below is O(Σ d_oriented²) ≤ O(E^1.5);
  3. wedges: for every vertex u, all ordered pairs (v1 < v2) of its
     oriented neighbors → rows (a=v1, b=v2, center=u);
  4. join wedges against the oriented edge set on (a, b) — one
     groupby; a wedge whose (a,b) is an edge closes a triangle
     {center, a, b};
  5. per-vertex counts: each closed triangle credits all three corners
     → groupby(vid).sum.

Everything is map_batches + two groupby shuffles; no driver-side loops.
The reference has no triangle implementation (SURVEY.md §2.9); the
north rule requires exact per-vertex counts, tested against a dense
A²∘A oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _canonical(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    return pa.table({"a": pa.array(lo[keep]), "b": pa.array(hi[keep])})


def _orient_uv(a, b, da, db) -> pa.Table:
    """(a,b) → directed low-rank → high-rank, rank = (deg, vid)."""
    a_first = (da < db) | ((da == db) & (a < b))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    return pa.table({"u": pa.array(u), "v": pa.array(v)})


def triangle_counts(
    edges: rd.Dataset,
    num_buckets: int = 64,
    broadcast_vertex_threshold: int = 32_000_000,
    return_degrees: bool = False,
) -> rd.Dataset:
    """edges (src,dst,w; any orientation/dups) → Dataset (vid, triangles).

    Vertices with zero triangles are omitted (join with the vertex table
    to densify if needed).

    Degree attach is gated on `broadcast_vertex_threshold` (the
    namemap.py pattern): at or below it the degree table becomes a plasma
    LUT (one `ray.put`, read zero-copy per orient batch); above it —
    where a |V|-sized LUT would drag tens of GB through the driver heap —
    degrees are bucketed-joined onto each endpoint and the edge never
    leaves the distributed plane."""
    from ..agg import bucketed_join, distinct, group_count

    simple = distinct(
        edges.map_batches(_canonical, batch_format="pyarrow"), ["a", "b"],
        num_buckets=num_buckets,
    ).materialize()  # reused by degrees, wedges and the closing join

    # degree per endpoint (of the simple undirected graph)
    def _endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.int64()), t["b"].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"vid": v})

    degrees = group_count(
        simple.map_batches(_endpoints, batch_format="pyarrow"), ["vid"],
        alias="count()", num_buckets=num_buckets,
    ).materialize()
    n_vertices = degrees.count()
    if n_vertices == 0:
        empty = rd.from_arrow(
            pa.table({"vid": pa.array([], pa.int64()), "triangles": pa.array([], pa.int64())})
        )
        return (empty, degrees) if return_degrees else empty

    import ray

    if n_vertices <= broadcast_vertex_threshold:
        # broadcast path: degree LUT in plasma, vectorized searchsorted
        deg_tbl = pa.concat_tables(
            [b for b in ray.get(degrees.to_arrow_refs()) if b.num_rows]
        )
        dvid = deg_tbl["vid"].to_numpy(zero_copy_only=False)
        dcnt = deg_tbl["count()"].to_numpy(zero_copy_only=False)
        order = np.argsort(dvid)
        deg_ref = ray.put({"vid": dvid[order], "deg": dcnt[order]})

        def _deg_of(vids, lut):
            idx = np.searchsorted(lut["vid"], vids)
            if not np.array_equal(lut["vid"][idx], vids):
                raise KeyError("edge endpoint missing from degree table")
            return lut["deg"][idx]

        def _orient(t: pa.Table) -> pa.Table:
            lut = ray.get(deg_ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return _orient_uv(a, b, _deg_of(a, lut), _deg_of(b, lut))

        oriented = simple.map_batches(_orient, batch_format="pyarrow")
    else:
        # distributed path: attach each endpoint's degree with a bucketed
        # map-side join (no driver-side O(|V|) materialization anywhere)
        with_da = bucketed_join(
            simple, degrees.rename_columns({"count()": "deg_a"}),
            ["a"], ["vid"], num_buckets=num_buckets,
        ).select_columns(["a", "b", "deg_a"])
        with_dab = bucketed_join(
            with_da, degrees.rename_columns({"count()": "deg_b"}),
            ["b"], ["vid"], num_buckets=num_buckets,
        ).select_columns(["a", "b", "deg_a", "deg_b"])

        def _orient_joined(t: pa.Table) -> pa.Table:
            return _orient_uv(
                t["a"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False),
                t["deg_a"].to_numpy(zero_copy_only=False),
                t["deg_b"].to_numpy(zero_copy_only=False),
            )

        oriented = with_dab.map_batches(_orient_joined, batch_format="pyarrow")

    # wedges per center u: all ordered neighbor pairs, via a vectorized
    # self-merge on u (C-speed; no per-vertex Python loop)
    def _wedges(g: pd.DataFrame) -> pa.Table:
        m = g.merge(g, on="u", suffixes=("_1", "_2"))
        m = m[m["v_1"] < m["v_2"]]
        # Arrow out: keeps every block of the stream Arrow-typed (pandas
        # block schemas defeat Ray's schema-unification dedup)
        return pa.table(
            {"a": pa.array(m["v_1"].to_numpy()), "b": pa.array(m["v_2"].to_numpy()),
             "center": pa.array(m["u"].to_numpy())}
        )

    def _bucket_u(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bk", pa.array((t["u"].to_numpy(zero_copy_only=False) % num_buckets).astype(np.int32))
        )

    wedges = (
        oriented.map_batches(_bucket_u, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(_wedges, batch_format="pandas")
    )

    # join wedges with edges on (a,b): tag and co-group by hashed bucket
    def _tag_edges(t: pa.Table) -> pa.Table:
        # wedge pairs are vid-sorted (a<b); key edges canonically to match
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.minimum(u, v)),
                "b": pa.array(np.maximum(u, v)),
                "center": pa.array(np.full(t.num_rows, -1, np.int64)),
            }
        )

    tagged = wedges.union(oriented.map_batches(_tag_edges, batch_format="pyarrow"))

    def _bucket_ab(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        bk = (((a * 1000003) ^ b) % num_buckets).astype(np.int32)
        return t.append_column("bk", pa.array(bk))

    _EMPTY_CREDITS = pa.table(
        {"vid": pa.array([], pa.int64()), "t": pa.array([], pa.int64())}
    )

    def _close(g: pd.DataFrame) -> pa.Table:
        """Wedges whose (a,b) is an edge → 3 credit rows per triangle."""
        is_edge = g["center"].to_numpy() == -1
        edges_set = g.loc[is_edge, ["a", "b"]]
        w = g.loc[~is_edge]
        if len(edges_set) == 0 or len(w) == 0:
            return _EMPTY_CREDITS
        closed = w.merge(edges_set, on=["a", "b"], how="inner")
        if len(closed) == 0:
            return _EMPTY_CREDITS
        vids = np.concatenate(
            [closed["a"].to_numpy(), closed["b"].to_numpy(), closed["center"].to_numpy()]
        )
        out = pd.DataFrame({"vid": vids})
        out = out.groupby("vid", as_index=False).size().rename(columns={"size": "t"})
        return pa.table(
            {"vid": pa.array(out["vid"].to_numpy(np.int64)),
             "t": pa.array(out["t"].to_numpy(np.int64))}
        )

    from ..agg import group_sum

    credits = (
        tagged.map_batches(_bucket_ab, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(_close, batch_format="pandas")
    )
    pv = group_sum(credits, ["vid"], "t", alias="triangles", num_buckets=num_buckets)
    # degrees: (vid, count()) of the SIMPLE undirected graph — already
    # materialized above; callers composing metrics (clustering
    # coefficient) reuse it instead of recomputing the distinct+count
    return (pv, degrees) if return_degrees else pv


def triangle_total(per_vertex: rd.Dataset) -> int:
    s = per_vertex.sum("triangles")
    return int(s // 3) if s is not None else 0
