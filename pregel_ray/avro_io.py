"""Avro Object Container File source/sink (S10/S11 in SURVEY.md §2.1).

The reference bundles a 1.8 kLoC libavro FFI binding
(/root/reference/pregel/avro/c.lua:1452-1472 reader, 1460-1470 writer) as
its external-data format. Our engine's native format is Parquet per the
north rule, but the Avro surface is closed here with a small pure-Python
codec of the PUBLIC Avro 1.x container spec (no avro/fastavro in this
container):

    header  = magic b"Obj\\x01" + metadata map {avro.schema, avro.codec}
              + 16-byte sync marker
    block   = record count (zigzag long) + byte size (zigzag long)
              + records + sync marker
    values  = zigzag-varint longs/ints, length-prefixed strings/bytes,
              LE IEEE float/double, 1-byte boolean, empty null,
              union = branch index + value, record = fields in order

Supported lattice (what the transcript/graph tables need): null, boolean,
int, long, float, double, string, bytes, records of those, and nullable
unions ["null", T]; timestamps travel as logicalType timestamp-micros
longs. The codec is `null` (uncompressed).

Ray-side shape: `read_avro` parallelizes per FILE (the container format
is record-streamed like the reference's loader; one read task per file),
`write_avro` writes one container file per Arrow batch — both ends
streaming, no driver materialization.
"""

from __future__ import annotations

import io
import json
import os
import struct

import numpy as np
import pyarrow as pa

import ray.data as rd

MAGIC = b"Obj\x01"
SYNC = bytes.fromhex("70726567656c5f7261795f61767231")  # 15 bytes...
SYNC = SYNC + b"\x00"  # deterministic 16-byte sync marker


# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    z = 0
    while True:
        b = buf.read(1)[0]
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag_encode(len(b)) + b


def _dec_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_zigzag_decode(buf))


# ---------------------------------------------------------------------------
# schema mapping (Arrow ↔ Avro)
# ---------------------------------------------------------------------------

_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_int32, "int"),
    (pa.types.is_int64, "long"),
    (pa.types.is_float32, "float"),
    (pa.types.is_float64, "double"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
    (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
]


def _avro_type(t: pa.DataType):
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-micros"}
    for pred, name in _ARROW_TO_AVRO:
        if pred(t):
            return name
    raise TypeError(f"no Avro mapping for Arrow type {t}")


def avro_schema_of(schema: pa.Schema, name: str = "row") -> dict:
    fields = []
    for f in schema:
        at = _avro_type(f.type)
        fields.append({"name": f.name, "type": ["null", at] if f.nullable else at})
    return {"type": "record", "name": name, "fields": fields}


def _arrow_type(avro_t) -> pa.DataType:
    if isinstance(avro_t, dict):
        if avro_t.get("logicalType") == "timestamp-micros":
            return pa.timestamp("us")
        avro_t = avro_t["type"]
    return {
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "bytes": pa.large_binary(),
    }[avro_t]


# ---------------------------------------------------------------------------
# value codecs from an Avro field type
# ---------------------------------------------------------------------------


def _encoder_for(avro_t):
    if isinstance(avro_t, list):  # union ["null", T]
        assert avro_t[0] == "null" and len(avro_t) == 2
        inner = _encoder_for(avro_t[1])
        zero, one = _zigzag_encode(0), _zigzag_encode(1)

        def enc(v):
            return zero if v is None else one + inner(v)

        return enc
    if isinstance(avro_t, dict):
        avro_t = avro_t["type"]
    if avro_t in ("long", "int"):
        return lambda v: _zigzag_encode(int(v))
    if avro_t == "double":
        return lambda v: struct.pack("<d", float(v))
    if avro_t == "float":
        return lambda v: struct.pack("<f", float(v))
    if avro_t == "boolean":
        return lambda v: b"\x01" if v else b"\x00"
    if avro_t == "string":
        return lambda v: _enc_bytes(v.encode())
    if avro_t == "bytes":
        return lambda v: _enc_bytes(bytes(v))
    if avro_t == "null":
        return lambda v: b""
    raise TypeError(f"unsupported Avro type {avro_t}")


def _decoder_for(avro_t):
    if isinstance(avro_t, list):
        assert avro_t[0] == "null" and len(avro_t) == 2
        inner = _decoder_for(avro_t[1])

        def dec(buf):
            return None if _zigzag_decode(buf) == 0 else inner(buf)

        return dec
    if isinstance(avro_t, dict):
        avro_t = avro_t["type"]
    if avro_t in ("long", "int"):
        return _zigzag_decode
    if avro_t == "double":
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if avro_t == "float":
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if avro_t == "boolean":
        return lambda buf: buf.read(1) == b"\x01"
    if avro_t == "string":
        return lambda buf: _dec_bytes(buf).decode()
    if avro_t == "bytes":
        return lambda buf: _dec_bytes(buf)
    if avro_t == "null":
        return lambda buf: None
    raise TypeError(f"unsupported Avro type {avro_t}")


# ---------------------------------------------------------------------------
# container file read / write
# ---------------------------------------------------------------------------


def write_avro_table(table: pa.Table, path: str, block_rows: int = 8192) -> None:
    """One Arrow table → one Avro container file (atomic tmp+rename)."""
    schema = avro_schema_of(table.schema)
    encs = [_encoder_for(f["type"]) for f in schema["fields"]]
    cols = []
    for f, af in zip(table.schema, schema["fields"]):
        col = table[f.name]
        if pa.types.is_timestamp(f.type):  # logical timestamp-micros → long
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        cols.append(col.to_pylist())
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null",
        }
        fh.write(_zigzag_encode(len(meta)))
        for k, v in meta.items():
            fh.write(_enc_bytes(k.encode()) + _enc_bytes(v))
        fh.write(_zigzag_encode(0))
        fh.write(SYNC)
        n = table.num_rows
        for lo in range(0, n, block_rows):
            hi = min(lo + block_rows, n)
            body = b"".join(
                b"".join(enc(col[i]) for enc, col in zip(encs, cols))
                for i in range(lo, hi)
            )
            fh.write(_zigzag_encode(hi - lo))
            fh.write(_zigzag_encode(len(body)))
            fh.write(body)
            fh.write(SYNC)
    os.replace(tmp, path)


def read_avro_table(data: bytes) -> pa.Table:
    """Parse one container file's bytes → Arrow table."""
    buf = io.BytesIO(data)
    assert buf.read(4) == MAGIC, "not an Avro container file"
    meta = {}
    while True:
        cnt = _zigzag_decode(buf)
        if cnt == 0:
            break
        if cnt < 0:  # block with byte size prefix
            _zigzag_decode(buf)
            cnt = -cnt
        for _ in range(cnt):
            k = _dec_bytes(buf).decode()
            meta[k] = _dec_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    assert codec == b"null", f"unsupported codec {codec!r}"
    schema = json.loads(meta["avro.schema"])
    assert schema["type"] == "record"
    sync = buf.read(16)
    decs = [(f["name"], _decoder_for(f["type"])) for f in schema["fields"]]
    out: dict[str, list] = {name: [] for name, _ in decs}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        cnt = _zigzag_decode(buf)
        _zigzag_decode(buf)  # data blocks always carry the byte size
        for _ in range(cnt):
            for name, dec in decs:
                out[name].append(dec(buf))
        assert buf.read(16) == sync, "sync marker mismatch"
    arrow_fields = [
        pa.field(f["name"], _arrow_type(
            f["type"][1] if isinstance(f["type"], list) else f["type"]),
            nullable=isinstance(f["type"], list))
        for f in schema["fields"]
    ]
    arrays = {}
    for (name, _), fld in zip(decs, arrow_fields):
        if pa.types.is_timestamp(fld.type):  # long → logical timestamp-micros
            arrays[name] = pa.array(out[name], pa.int64()).cast(fld.type)
        else:
            arrays[name] = pa.array(out[name], type=fld.type)
    return pa.table(arrays, schema=pa.schema(arrow_fields))


def read_avro(paths: str | list[str]) -> rd.Dataset:
    """Avro container files → Dataset. Parallelism = one task per file
    (record-streamed container; same granularity as the reference's
    per-file loader, avro/c.lua:1452-1472)."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f) for f in os.listdir(paths) if f.endswith(".avro")
        )

    def _parse(t: pa.Table) -> pa.Table:
        tables = [read_avro_table(b.as_py()) for b in t["bytes"]]
        return pa.concat_tables(tables) if tables else pa.table({})

    return rd.read_binary_files(paths).map_batches(
        _parse, batch_format="pyarrow", batch_size=1
    )


def write_avro(ds: rd.Dataset, out_dir: str, block_rows: int = 8192) -> list[str]:
    """Dataset → directory of Avro container files, one per block — written
    inside the map tasks (streaming; the driver only sees file names)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        import uuid

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}-{t.num_rows}.avro")
        write_avro_table(t, path, block_rows)
        return pa.table({"path": pa.array([path])})

    return sorted(
        r["path"] for r in ds.map_batches(_write, batch_format="pyarrow").take_all()
    )
