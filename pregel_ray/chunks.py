"""Binary packing of per-partition numpy column dicts.

The engine moves per-partition vertex state and combined message chunks
through Ray Data shuffles as single `large_binary` cells (one row per
partition / scatter output). The format is a tiny JSON header (column
name → dtype, length) followed by the raw little-endian buffers;
`unpack` returns zero-copy numpy views over the blob.

Only fixed-width dtypes (ints, floats, bool) are supported — engine
state and messages are numeric columns. Arbitrary Python payloads (the
per-vertex compute API's message values) are pickled into a bytes
column by the caller first.

Reference analogue: the row-wise MsgPack tuples of
/root/reference/pregel/queue.lua:234-254 and worker.lua:417-431; here a
whole partition's columns travel as one columnar blob.
"""

from __future__ import annotations

import json

import numpy as np

_MAGIC = b"PRCH1\n"


def pack_obj(objs: list) -> np.ndarray:
    """Arbitrary-Python payload column: pickled list as a uint8 array
    (rides through pack/unpack like any fixed-width column). Column names
    carrying these must end in ``_pkl`` — the engine then concatenates
    the decoded LISTS across message chunks instead of the raw bytes."""
    import pickle

    return np.frombuffer(pickle.dumps(objs, protocol=5), dtype=np.uint8)


def unpack_obj(arr: np.ndarray) -> list:
    import pickle

    if len(arr) == 0:
        return []
    return pickle.loads(arr.tobytes())


def pack(cols: dict[str, np.ndarray]) -> bytes:
    header = {}
    bufs = []
    for name, arr in cols.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype == object:
            raise TypeError(f"column {name!r}: object dtype not packable")
        header[name] = [arr.dtype.str, int(arr.shape[0])]
        bufs.append(arr.tobytes())  # little-endian on all supported platforms
    h = json.dumps(header, sort_keys=False).encode()
    return b"".join([_MAGIC, len(h).to_bytes(8, "little"), h, *bufs])


def unpack(blob: bytes | bytearray | memoryview) -> dict[str, np.ndarray]:
    """Zero-copy views into ``blob`` (read-only arrays)."""
    if blob is None or len(blob) == 0:
        return {}
    mv = memoryview(blob)
    assert mv[: len(_MAGIC)] == _MAGIC, "bad chunk blob"
    off = len(_MAGIC)
    hlen = int.from_bytes(mv[off : off + 8], "little")
    off += 8
    header = json.loads(bytes(mv[off : off + hlen]))
    off += hlen
    out: dict[str, np.ndarray] = {}
    for name, (dtype_str, n) in header.items():
        dt = np.dtype(dtype_str)
        nbytes = dt.itemsize * n
        out[name] = np.frombuffer(mv[off : off + nbytes], dtype=dt)
        off += nbytes
    return out
