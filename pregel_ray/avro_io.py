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

Supported lattice (the reference binding's full surface,
/root/reference/pregel/avro/constants.lua:9-25, minus its libavro-specific
LINK pseudo-type): null, boolean, int, long, float, double, string, bytes,
enum, fixed, array, map, nested records, and general unions (encode-side
branch resolution by Python value shape; ["null", T] maps to a nullable
Arrow field, other unions are decoded by branch index). Timestamps travel
as logicalType timestamp-micros longs. Codecs: `null` (uncompressed) and
`deflate` (RFC 1951 raw deflate, per the Avro spec) on both ends.

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
import zlib

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


def _avro_type(t: pa.DataType, name: str = "f"):
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if pa.types.is_fixed_size_binary(t):
        return {"type": "fixed", "name": f"{name}_fixed", "size": t.byte_width}
    if pa.types.is_dictionary(t) and pa.types.is_string(t.value_type):
        # symbols unknown until data time → travels as plain string
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "items": _avro_type(t.value_type, name)}
    if pa.types.is_map(t):
        assert pa.types.is_string(t.key_type), "Avro map keys are strings"
        return {"type": "map", "values": _avro_type(t.item_type, name)}
    if pa.types.is_struct(t):
        return {
            "type": "record",
            "name": f"{name}_rec",
            "fields": [
                {"name": f.name,
                 "type": (["null", _avro_type(f.type, f"{name}_{f.name}")]
                          if f.nullable else _avro_type(f.type, f"{name}_{f.name}"))}
                for f in t
            ],
        }
    for pred, avro_name in _ARROW_TO_AVRO:
        if pred(t):
            return avro_name
    raise TypeError(f"no Avro mapping for Arrow type {t}")


def avro_schema_of(schema: pa.Schema, name: str = "row") -> dict:
    fields = []
    for f in schema:
        at = _avro_type(f.type, f.name)
        fields.append({"name": f.name, "type": ["null", at] if f.nullable else at})
    return {"type": "record", "name": name, "fields": fields}


def _arrow_type(avro_t) -> pa.DataType:
    if isinstance(avro_t, list):
        if avro_t[0] == "null" and len(avro_t) == 2:  # nullable field
            return _arrow_type(avro_t[1])
        raise TypeError(
            f"general union {avro_t} has no static Arrow mapping "
            "(supported at the codec level; project it before read_avro)"
        )
    if isinstance(avro_t, dict):
        if avro_t.get("logicalType") == "timestamp-micros":
            return pa.timestamp("us")
        t = avro_t["type"]
        if t == "enum":
            return pa.string()
        if t == "fixed":
            return pa.binary(int(avro_t["size"]))
        if t == "array":
            return pa.list_(_arrow_type(avro_t["items"]))
        if t == "map":
            return pa.map_(pa.string(), _arrow_type(avro_t["values"]))
        if t == "record":
            return pa.struct([
                pa.field(f["name"], _arrow_type(f["type"]),
                         nullable=isinstance(f["type"], list))
                for f in avro_t["fields"]
            ])
        avro_t = t
    return {
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "bytes": pa.large_binary(),
        "null": pa.null(),
    }[avro_t]


# ---------------------------------------------------------------------------
# value codecs from an Avro field type
# ---------------------------------------------------------------------------


def _branch_of(avro_t) -> str:
    """Coarse shape tag of a union branch, for encode-side resolution."""
    if isinstance(avro_t, dict):
        t = avro_t["type"]
        return t if t in ("enum", "fixed", "array", "map", "record") else t
    return avro_t


_SHAPE = {  # Python value shape → acceptable branch tags, in priority order
    type(None): ("null",),
    bool: ("boolean",),
    int: ("long", "int", "double", "float"),
    float: ("double", "float"),
    str: ("string", "enum"),
    bytes: ("bytes", "fixed", "string"),
    list: ("array",),
    tuple: ("array",),
    dict: ("record", "map"),
}


def _encoder_for(avro_t):
    if isinstance(avro_t, list):  # union
        if avro_t[0] == "null" and len(avro_t) == 2:  # the common nullable
            inner = _encoder_for(avro_t[1])
            zero, one = _zigzag_encode(0), _zigzag_encode(1)
            return lambda v: zero if v is None else one + inner(v)
        tags = [_branch_of(t) for t in avro_t]
        encs = [_encoder_for(t) for t in avro_t]

        def enc_union(v):
            for want in _SHAPE[type(v)]:
                if want in tags:
                    i = tags.index(want)
                    return _zigzag_encode(i) + encs[i](v)
            raise TypeError(f"no union branch in {avro_t} for {type(v)}")

        return enc_union
    if isinstance(avro_t, dict):
        t = avro_t["type"]
        if t == "enum":
            idx = {s: _zigzag_encode(i) for i, s in enumerate(avro_t["symbols"])}
            return lambda v: idx[v]
        if t == "fixed":
            size = int(avro_t["size"])

            def enc_fixed(v):
                b = bytes(v)
                assert len(b) == size, f"fixed({size}) got {len(b)} bytes"
                return b

            return enc_fixed
        if t == "array":
            item = _encoder_for(avro_t["items"])
            end = _zigzag_encode(0)

            def enc_array(v):
                if not v:
                    return end
                return (_zigzag_encode(len(v))
                        + b"".join(item(x) for x in v) + end)

            return enc_array
        if t == "map":
            val = _encoder_for(avro_t["values"])
            end = _zigzag_encode(0)

            def enc_map(v):
                if not v:
                    return end
                pairs = v.items() if isinstance(v, dict) else v  # MapArray → tuples
                body = b"".join(_enc_bytes(k.encode()) + val(x)
                                for k, x in pairs)
                return _zigzag_encode(len(v)) + body + end

            return enc_map
        if t == "record":
            fields = [(f["name"], _encoder_for(f["type"]))
                      for f in avro_t["fields"]]
            return lambda v: b"".join(enc(v[name]) for name, enc in fields)
        avro_t = t  # logicalType wrapper over a primitive
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
    if isinstance(avro_t, list):  # union: branch index then value
        decs = [_decoder_for(t) for t in avro_t]
        return lambda buf: decs[_zigzag_decode(buf)](buf)
    if isinstance(avro_t, dict):
        t = avro_t["type"]
        if t == "enum":
            symbols = list(avro_t["symbols"])
            return lambda buf: symbols[_zigzag_decode(buf)]
        if t == "fixed":
            size = int(avro_t["size"])
            return lambda buf: buf.read(size)
        if t == "array":
            item = _decoder_for(avro_t["items"])

            def dec_array(buf):
                out = []
                while True:
                    cnt = _zigzag_decode(buf)
                    if cnt == 0:
                        return out
                    if cnt < 0:  # block with byte-size prefix
                        _zigzag_decode(buf)
                        cnt = -cnt
                    out.extend(item(buf) for _ in range(cnt))

            return dec_array
        if t == "map":
            val = _decoder_for(avro_t["values"])

            def dec_map(buf):
                out = {}
                while True:
                    cnt = _zigzag_decode(buf)
                    if cnt == 0:
                        return out
                    if cnt < 0:
                        _zigzag_decode(buf)
                        cnt = -cnt
                    for _ in range(cnt):
                        # NB: key must be read before the value — a direct
                        # `out[key_expr] = val(buf)` evaluates the RHS first.
                        k = _dec_bytes(buf).decode()
                        out[k] = val(buf)

            return dec_map
        if t == "record":
            fields = [(f["name"], _decoder_for(f["type"]))
                      for f in avro_t["fields"]]
            return lambda buf: {name: dec(buf) for name, dec in fields}
        avro_t = t  # logicalType wrapper over a primitive
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


def write_avro_table(
    table: pa.Table, path: str, block_rows: int = 8192, codec: str = "null"
) -> None:
    """One Arrow table → one Avro container file (atomic tmp+rename).

    codec: "null" (uncompressed) or "deflate" (RFC 1951 raw deflate —
    the spec strips the zlib header/checksum, hence wbits=-15)."""
    assert codec in ("null", "deflate"), codec
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
            "avro.codec": codec.encode(),
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
            if codec == "deflate":
                c = zlib.compressobj(wbits=-15)  # raw deflate per the spec
                body = c.compress(body) + c.flush()
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
    assert codec in (b"null", b"deflate"), f"unsupported codec {codec!r}"
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
        size = _zigzag_decode(buf)  # data blocks always carry the byte size
        body = buf.read(size)
        if codec == b"deflate":
            body = zlib.decompress(body, wbits=-15)
        bb = io.BytesIO(body)
        for _ in range(cnt):
            for name, dec in decs:
                out[name].append(dec(bb))
        assert buf.read(16) == sync, "sync marker mismatch"
    arrow_fields = [
        pa.field(f["name"], _arrow_type(f["type"]),
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


def write_avro(
    ds: rd.Dataset, out_dir: str, block_rows: int = 8192, codec: str = "null"
) -> list[str]:
    """Dataset → directory of Avro container files, one per block — written
    inside the map tasks (streaming; the driver only sees file names)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        import uuid

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}-{t.num_rows}.avro")
        write_avro_table(t, path, block_rows, codec)
        return pa.table({"path": pa.array([path])})

    return sorted(
        r["path"] for r in ds.map_batches(_write, batch_format="pyarrow").take_all()
    )
