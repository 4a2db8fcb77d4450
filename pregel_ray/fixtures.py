"""Deterministic synthetic transcript tables + micro-graph fixtures.

Implements the FIXTURES.md contract: the `transcripts` table
(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string?, ts:timestamp[us]) is synthesized with seed 42, fully
vectorized, shuffled within files (seeded) so consumers must sort by
(conv_id, turn_idx) rather than rely on file order.

`text` is a pure function of (conv_id, turn_idx) so the per-row
invariant "per-turn text equality under stable turn ordering" is
checkable after any repartition/shuffle (BASELINE.json input_hint).

Tool names are Zipf(a=1.5)-distributed over a 32-name vocab: tool
vertices are deliberate skew hubs for the engine's hub-splitting path.

No wall-clock, no external data; pure pyarrow/numpy — callable without
a Ray session (the driver's oracle_sql() path needs that).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42
TOOL_VOCAB = [f"tool-{i:02d}" for i in range(32)]
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)


def _mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of two integer arrays (splitmix-style)."""
    x = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    )
    x ^= x >> np.uint64(31)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(29)
    return x


def synth_transcripts(n_convs: int, seed: int = SEED, conv_offset: int = 0) -> pa.Table:
    """Vectorized deterministic transcript synthesis (FIXTURES.md §1).

    ``conv_offset`` shifts the absolute conversation numbering (names,
    text hashes, timestamps) — the chunked large-scale path synthesizes
    disjoint conv ranges per chunk (transcripts_path)."""
    rng = np.random.default_rng(seed)
    turns_per_conv = rng.integers(3, 41, size=n_convs)  # 3..40 inclusive-ish
    total = int(turns_per_conv.sum())

    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), turns_per_conv)
    # turn_idx = position within conversation
    starts = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    turn_idx = (np.arange(total, dtype=np.int64) - np.repeat(starts, turns_per_conv)).astype(
        np.int32
    )

    # roles: alternate user/assistant; tool turns injected with p=0.25;
    # turn 0 becomes 'system' for ~20% of conversations.
    tool_mask = rng.random(total) < 0.25
    sys_conv = rng.random(n_convs) < 0.20
    system_mask = (turn_idx == 0) & np.repeat(sys_conv, turns_per_conv)
    tool_mask &= ~system_mask

    # Zipf(a=1.5) over the 32-name vocab (normalized finite Zipf).
    ranks = np.arange(1, len(TOOL_VOCAB) + 1, dtype=np.float64)
    p = ranks ** -1.5
    p /= p.sum()
    tool_choice = rng.choice(len(TOOL_VOCAB), size=total, p=p)

    # role via small-vocab take (Arrow C++, not np.char): 0=system 1=tool 2=user 3=assistant
    role_code = np.where(system_mask, 0, np.where(tool_mask, 1, 2 + (turn_idx % 2))).astype(
        np.int32
    )
    role = pc.take(pa.array(["system", "tool", "user", "assistant"]), pa.array(role_code))
    tool = pc.take(
        pa.array(TOOL_VOCAB, pa.string()),
        pa.array(tool_choice.astype(np.int32), mask=~tool_mask),
    )

    # conv_id strings built once per conversation, then gathered per row
    conv_names = np.char.add(
        "conv-",
        np.char.zfill(
            np.arange(conv_offset, conv_offset + n_convs).astype("U7"), 7
        ),
    )
    conv_id = pc.take(pa.array(conv_names), pa.array(conv_num))

    # text = f"{conv_id}:{turn_idx}:tok{h1}:tok{h2}:tok{h3}" — pure fn of (conv_id, turn_idx)
    h = _mix(conv_num + conv_offset, turn_idx.astype(np.int64))

    def _tok(shift: int) -> pa.Array:
        v = ((h >> np.uint64(shift)) % np.uint64(997)).astype(np.int64)
        return pc.binary_join_element_wise("tok", pc.cast(pa.array(v), pa.string()), "")

    text = pc.binary_join_element_wise(
        conv_id,
        pc.cast(pa.array(turn_idx), pa.string()),
        _tok(0),
        _tok(13),
        _tok(29),
        ":",
    )

    ts = (
        _EPOCH_US
        + (conv_num + conv_offset) * 3_600_000_000
        + turn_idx.astype(np.int64) * 7_000_000
    )

    tbl = pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    # shuffle rows (seeded) so nothing may rely on file order
    perm = rng.permutation(total)
    return tbl.take(pa.array(perm))


def n_convs_for_sf(sf: float) -> int:
    """Scale mapping: sf0.001→1k convs (~21k turns), sf0.01→10k, sf0.1→100k."""
    return max(50, int(round(1_000_000 * sf)))


def sf_of_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a `/root/testdata/sf0.01`-style path."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


_FIXTURE_ROOT = os.environ.get(
    "PREGEL_RAY_FIXTURE_DIR", os.path.join(tempfile.gettempdir(), "pregel_ray_fixtures")
)


def transcripts_path(sf_dir_or_sf: str | float) -> str:
    """Path of the deterministic transcripts parquet for a scale; synthesizes
    it on first use (atomic write, cached thereafter).

    Keyed by n_convs so any sf_dir spelling mapping to the same scale
    shares one file; used by queries(), oracle_sql() and bench.py.
    """
    sf = sf_dir_or_sf if isinstance(sf_dir_or_sf, float) else sf_of_dir(str(sf_dir_or_sf))
    n = n_convs_for_sf(sf)
    out = os.path.join(_FIXTURE_ROOT, f"convs={n}", "transcripts.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    CHUNK = 1_000_000
    if n <= CHUNK:
        pq.write_table(synth_transcripts(n), tmp, row_group_size=131072)
    else:
        # chunked synthesis: one Arrow string array per chunk stays under
        # the 2 GiB 32-bit-offset capacity, and peak memory is one chunk.
        # Chunks cover disjoint conv ranges with chunk-derived seeds; the
        # standard scales (n ≤ CHUNK) keep the original single-shot stream
        # so their cached fixtures stay canonical.
        writer = pq.ParquetWriter(tmp, TRANSCRIPT_SCHEMA)
        try:
            for i, off in enumerate(range(0, n, CHUNK)):
                writer.write_table(
                    synth_transcripts(min(CHUNK, n - off), seed=SEED + i,
                                      conv_offset=off),
                    row_group_size=131072,
                )
        finally:
            writer.close()
    os.replace(tmp, out)  # atomic: concurrent writers converge
    return out


# ---------------------------------------------------------------------------
# Micro-graphs (FIXTURES.md §2) — edge tables as pyarrow, golden values in tests
# ---------------------------------------------------------------------------


def edge_table(pairs: list[tuple[int, int]] | list[tuple[int, int, float]]) -> pa.Table:
    src = [p[0] for p in pairs]
    dst = [p[1] for p in pairs]
    w = [float(p[2]) if len(p) > 2 else 1.0 for p in pairs]
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "w": pa.array(w, pa.float64()),
        }
    )


def g_line4() -> pa.Table:
    return edge_table([(0, 1), (1, 2), (2, 3)])


def g_cycle3_isolate() -> pa.Table:
    # vertex 3 is an isolate: represent via a self-loop-free dangling row?
    # Edge tables can't hold isolated vertices; engine takes explicit n_vertices.
    return edge_table([(0, 1), (1, 2), (2, 0)])


def g_triangle_plus_tail() -> pa.Table:
    und = [(0, 1), (1, 2), (2, 0), (2, 3)]
    return edge_table(und + [(b, a) for a, b in und])


def g_two_cliques_bridge() -> pa.Table:
    """Two 4-cliques {0..3} and {4..7} joined by edge 3-4 (undirected)."""
    pairs = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                pairs.append((base + i, base + j))
    pairs.append((3, 4))
    return edge_table(pairs + [(b, a) for a, b in pairs])


def g_hub(n_leaves: int = 200, ring: int = 10) -> pa.Table:
    """Star hub 0 → leaves 1..n plus a disjoint ring — skew-splitting test."""
    pairs = [(0, i) for i in range(1, n_leaves + 1)]
    base = n_leaves + 1
    pairs += [(base + i, base + (i + 1) % ring) for i in range(ring)]
    return edge_table(pairs)
