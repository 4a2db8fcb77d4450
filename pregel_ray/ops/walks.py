"""Deterministic random walks over the edge table (node2vec-style corpus
generation for graph embeddings).

The walk is pseudo-random but fully deterministic: at step ``s`` a walker
that started at ``start`` and sits at ``cur`` moves to its neighbor with
adjacency rank ``md5_low64(f"{start}:{s}:{cur}") % out_degree(cur)``
(neighbors ranked by dst name ascending). No RNG state, no driver
coordination — the same corpus on every run, every cluster size, every
block layout, and a DuckDB oracle can replay each step exactly
(``md5_number_lower`` + ``ROW_NUMBER`` over the same ordering).

Scale shape: one grouped pass builds the ranked adjacency (each row also
annotated with its destination's out-degree), then each step is ONE
bucketed map-side join — (cur, pick) × (src, rank) — because the frontier
carries its current vertex's degree forward. A hub with 10⁶ out-edges
costs one adjacency row per INCOMING walker, never a fan-out of the
hub's whole neighbor list per walker.

The reference engine has no walk/sampling surface (SURVEY.md §2.9); this
is the classic graph-ML corpus op a training pipeline runs downstream of
graph build.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..agg import bucketed_join, grouped_apply


@ray.remote
def _concat_blocks(*tabs: pa.Table) -> pa.Table:
    # empty sort partitions emit schema-LESS zero-column blocks (the
    # Ray-internal "new schema: ." RefBundle quirk, io_util/CLAUDE.md);
    # they carry no rows — drop them before the schema-strict concat
    good = [t for t in tabs if t.num_columns]
    return pa.concat_tables(good) if good else tabs[0]


def _cut(ds: rd.Dataset, max_blocks: int | None = None) -> rd.Dataset:
    """Hard lineage cut (the engine's iterative-loop rule, engine.py):
    ``materialize()`` alone still drags the logical plan into every
    consumer — re-planned per union branch, per step — so iterative
    loops re-wrap the materialized blocks as a fresh Dataset.

    ``max_blocks`` enforces the rule's second half — BOUND BLOCK
    COUNTS: each bucketed join emits ~num_buckets blocks, so an
    unbounded loop grows the frontier by that many blocks per step and
    every downstream sort pays for ALL of them (measured quadratic:
    sf0.001 walk steps 4.5 → 8.5 → 13.4 s before this bound, constant
    after). Compaction is remote pa.concat_tables over ref groups —
    the driver touches refs, never rows."""
    refs = ds.materialize().to_arrow_refs()
    if max_blocks and len(refs) > max_blocks:
        groups = np.array_split(np.arange(len(refs)), max_blocks)
        refs = [
            _concat_blocks.remote(*[refs[i] for i in g])
            for g in groups
            if len(g)
        ]
    return rd.from_arrow_refs(refs)


def _md5_pick(start: pd.Series, step: int, cur: pd.Series, deg: pd.Series) -> np.ndarray:
    """DuckDB-replayable neighbor pick: md5-low64 of "start:step:cur"
    modulo the out-degree (both sides unsigned 64-bit, as in SQL)."""
    keys = start.astype(str) + f":{step}:" + cur.astype(str)
    hv = np.fromiter(
        (
            int.from_bytes(hashlib.md5(k.encode()).digest()[8:], "little")
            for k in keys
        ),
        dtype=np.uint64,
        count=len(keys),
    )
    return (hv % deg.to_numpy().astype(np.uint64)).astype(np.int64)


def ranked_adjacency(edges: rd.Dataset, num_buckets: int = 128) -> rd.Dataset:
    """(src, dst, rank, deg): out-adjacency ranked by dst name ascending
    (rank 0..deg-1). One bucketed pass; every src's whole group lands in
    one bucket, so rank/deg are globally correct."""

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src_name", "dst_name"], kind="mergesort")
        out = pd.DataFrame(
            {
                "src": g["src_name"].to_numpy(),
                "dst": g["dst_name"].to_numpy(),
                "rank": g.groupby("src_name", sort=False).cumcount().to_numpy(),
                "deg": g.groupby("src_name", sort=False)["dst_name"]
                .transform("size")
                .to_numpy(),
            }
        )
        return out.astype({"rank": np.int64, "deg": np.int64})

    return grouped_apply(
        edges.select_columns(["src_name", "dst_name"]),
        ["src_name"],
        _rank,
        num_buckets=num_buckets,
    )


def random_walks(
    edges: rd.Dataset, walk_len: int = 3, num_buckets: int = 128
) -> rd.Dataset:
    """(start_name, step, name): one deterministic walk per vertex.

    Every vertex (src ∪ dst of the edge table) starts a walk; step 0 is
    the vertex itself; a walker at a vertex with no out-edges halts (its
    walk simply has fewer rows). ``walk_len`` hops max.

    The frontier CARRIES its current vertex's out-degree (and each
    adjacency row carries its destination's degree, attached once at
    setup), so a step is ONE bucketed join — (cur, pick) against
    (src, rank) — not a degree-attach join plus a move join.
    ``num_buckets`` is a CAP: the effective count is sized from the
    edge table (~1 bucket per 50k edges, floor 8) — near-empty buckets
    cost per-stage sort floor in every hop (the collocations finding)."""
    import pyarrow.compute as pc

    # materialized once: edges feeds ranked_adjacency AND the start-set
    # scan, and its count sizes the bucket count
    edges = edges.materialize()
    num_buckets = int(min(num_buckets, max(8, edges.count() // 50_000 + 8)))

    adj = ranked_adjacency(edges, num_buckets=num_buckets)

    def _deg_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["rank"], 0))
        return pa.table({"name": t["src"], "d": t["deg"]})

    degrees = adj.map_batches(_deg_rows, batch_format="pyarrow")
    # adjacency rows annotated with the DESTINATION's out-degree (null →
    # dst is a sink); walkers landing there halt at the next pick
    adj2 = bucketed_join(
        adj, degrees, left_on=["dst"], right_on=["name"], how="left",
        num_buckets=num_buckets,
    )
    adj2 = _cut(adj2, max_blocks=num_buckets)

    def _starts(t: pa.Table) -> pa.Table:
        names = pa.chunked_array(
            [*t["src_name"].chunks, *t["dst_name"].chunks]
        )
        return pa.table({"name": names.unique()})

    from ..agg import distinct

    verts = distinct(
        edges.map_batches(_starts, batch_format="pyarrow"),
        ["name"],
        num_buckets=num_buckets,
    )

    def _seed(t: pa.Table) -> pa.Table:
        return pa.table({"start_name": t["name"], "name": t["name"], "d": t["d"]})

    # lineage-cut each step (the repo-wide iterative-loop rule): without
    # it every union branch re-executes the whole shared prefix — O(L²)
    frontier = (
        bucketed_join(
            verts, degrees, left_on=["name"], how="left", num_buckets=num_buckets
        )
        .map_batches(_seed, batch_format="pyarrow")
    )
    frontier = _cut(frontier, max_blocks=num_buckets)
    outputs = []

    def _emit(step: int):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "start_name": t["start_name"],
                    "step": pa.array(
                        np.full(t.num_rows, step, dtype=np.int64)
                    ),
                    "name": t["name"],
                }
            )

        return _f

    outputs.append(frontier.map_batches(_emit(0), batch_format="pyarrow"))

    for s in range(walk_len):
        def _pick(df: pd.DataFrame, _s=s) -> pa.Table:
            # sinks (null/0 degree) halt here; emit Arrow (the
            # agg.arrow_groups discipline: pandas block schemas must
            # never re-enter a shuffle)
            live = df[df["d"].notna() & (df["d"] > 0)]
            return pa.table(
                {
                    "start_name": pa.array(live["start_name"], pa.string()),
                    "cur": pa.array(live["name"], pa.string()),
                    "pick": pa.array(
                        _md5_pick(
                            live["start_name"], _s, live["name"],
                            live["d"].astype(np.int64),
                        )
                    ),
                }
            )

        picked = frontier.map_batches(_pick, batch_format="pandas")
        moved = bucketed_join(
            picked, adj2, left_on=["cur", "pick"], right_on=["src", "rank"],
            num_buckets=num_buckets,
        )

        def _advance(t: pa.Table) -> pa.Table:
            return pa.table(
                {"start_name": t["start_name"], "name": t["dst"], "d": t["d"]}
            )

        frontier = _cut(moved.map_batches(_advance, batch_format="pyarrow"),
                        max_blocks=num_buckets)
        outputs.append(frontier.map_batches(_emit(s + 1), batch_format="pyarrow"))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out


# ---------------------------------------------------------------------------
# deterministic neighbor sampling (GNN mini-batch shape)
# ---------------------------------------------------------------------------


def sample_neighbors(
    edges: rd.Dataset, k: int = 3, num_buckets: int = 128
) -> rd.Dataset:
    """(src_name, dst_name, rank): for every vertex, a deterministic
    sample of min(k, out_degree) distinct neighbors — the GNN
    mini-batch fan-out. Neighbors race by ``md5_low64(src + ':' + dst)``
    (ties by dst name): no RNG state, layout-independent, and a DuckDB
    ROW_NUMBER over the same hash replays it exactly.

    Scale shape (the grouped_topk discipline): each block keeps at most
    k candidates per src it contains — ≤ k·blocks rows per vertex ride
    the one bucketed shuffle; a 10⁶-degree hub never moves whole."""
    import pyarrow.compute as pc

    def _hv(t: pa.Table) -> pa.Table:
        src = t["src_name"].to_pylist()
        dst = t["dst_name"].to_pylist()
        hv = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{a}:{b}".encode()).digest()[8:], "little"
                )
                for a, b in zip(src, dst)
            ),
            dtype=np.uint64,
            count=t.num_rows,
        )
        return pa.table(
            {
                "src_name": t["src_name"],
                "dst_name": t["dst_name"],
                "hv": pa.array(hv),
            }
        )

    def _partial(t: pa.Table) -> pa.Table:
        # Arrow-native per-block top-k (smallest hv) per src present
        keys = [("src_name", "ascending"), ("hv", "ascending"),
                ("dst_name", "ascending")]
        ts = t.take(pc.sort_indices(t, sort_keys=keys))
        boundary = np.zeros(ts.num_rows, bool)
        if ts.num_rows:
            boundary[0] = True
            v = ts["src_name"].to_numpy(zero_copy_only=False)
            boundary[1:] |= v[1:] != v[:-1]
        starts = np.flatnonzero(boundary)
        grp = np.cumsum(boundary) - 1
        rank = np.arange(ts.num_rows) - starts[grp]
        return ts.filter(pa.array(rank < k))

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src_name", "hv", "dst_name"], kind="mergesort")
        g = g.assign(rank=g.groupby("src_name", sort=False).cumcount())
        g = g[g["rank"] < k]
        return g.drop(columns="hv").astype({"rank": np.int64})

    withhv = edges.select_columns(["src_name", "dst_name"]).map_batches(
        _hv, batch_format="pyarrow"
    )
    return grouped_apply(
        withhv.map_batches(_partial, batch_format="pyarrow"),
        ["src_name"],
        _final,
        num_buckets=num_buckets,
    )
