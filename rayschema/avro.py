"""Pure-Python Avro Object Container File (OCF) codec — the streaming-
ingest interchange format (Kafka/Hadoop dumps). Spec: Apache Avro 1.11
specification, "Object Container Files" + binary encoding (public).

Scope: flat records whose fields are long / double / string / bytes /
boolean, each optionally nullable as the union ["null", T] — exactly the
shape of a tabular corpus shard. Container: magic ``Obj\\x01``, a metadata
map carrying the JSON schema and codec (null or deflate via stdlib zlib),
then blocks of (count, byte-size, payload, 16-byte sync marker).

The encoder is deterministic: the sync marker derives from the schema +
first block content, so reruns produce byte-identical files (idempotent
resumable sinks). Like the other codecs (flac.py, jpeg.py, codecs.py) the
per-record work lives at the codec boundary — the Ray stage around it is
one task per file.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"

_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_integer, "long"),
    (pa.types.is_floating, "double"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
    (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
]


def _avro_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TO_AVRO:
        if pred(t):
            return name
    raise ValueError(f"unsupported Arrow type for Avro codec: {t}")


def schema_json_for(table: pa.Table, name: str = "row") -> str:
    fields = [{"name": f.name, "type": ["null", _avro_type(f.type)]}
              for f in table.schema]
    return json.dumps({"type": "record", "name": name, "fields": fields},
                      separators=(",", ":"), sort_keys=True)


# ---------------------------------------------------------------- encoding

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_varint(out: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_long(out: bytearray, n: int) -> None:
    _write_varint(out, _zigzag(int(n)) & 0xFFFFFFFFFFFFFFFF)


def _encode_records(table: pa.Table) -> bytes:
    """Binary-encode every row of the table (each field as the union
    ["null", T]: varint branch index 0/1, then the value)."""
    out = bytearray()
    cols = []
    for f in table.schema:
        at = _avro_type(f.type)
        col = table.column(f.name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols.append((at, col.to_pylist()))
    for i in range(table.num_rows):
        for at, vals in cols:
            v = vals[i]
            if v is None:
                _write_varint(out, _zigzag(0))     # union branch 0: null
                continue
            _write_varint(out, _zigzag(1))         # union branch 1: value
            if at == "long":
                _write_long(out, v)
            elif at == "double":
                out += struct.pack("<d", float(v))
            elif at == "string":
                b = v.encode("utf-8")
                _write_long(out, len(b))
                out += b
            elif at == "bytes":
                b = bytes(v)
                _write_long(out, len(b))
                out += b
            elif at == "boolean":
                out.append(1 if v else 0)
    return bytes(out)


def write_avro(table: pa.Table, path: str, codec: str = "deflate",
               block_rows: int = 65536) -> None:
    """Write one OCF file. codec: 'null' | 'deflate' (stdlib zlib raw)."""
    assert codec in ("null", "deflate")
    schema_json = schema_json_for(table)
    sync = hashlib.sha256(
        schema_json.encode() + str(table.num_rows).encode()).digest()[:16]

    out = bytearray()
    out += MAGIC
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)                            # end of metadata map
    out += sync

    for lo in range(0, max(table.num_rows, 1), block_rows):
        chunk = table.slice(lo, block_rows)
        if chunk.num_rows == 0:
            continue
        payload = _encode_records(chunk)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
        _write_long(out, chunk.num_rows)
        _write_long(out, len(payload))
        out += payload
        out += sync

    with open(path, "wb") as f:
        f.write(bytes(out))


# ---------------------------------------------------------------- decoding

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def varint(self) -> int:
        u, shift = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not (b & 0x80):
                return u
            shift += 7

    def long(self) -> int:
        return _unzigzag(self.varint())

    def raw(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b


def read_avro_file(path_or_bytes) -> pa.Table:
    """Decode one OCF file back to an Arrow table (schema from the
    embedded JSON; every field is the nullable union written above)."""
    if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro OCF (bad magic)")
    r = _Reader(buf, 4)
    meta: Dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:                 # negative count form: size precedes
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode()
            meta[k] = r.raw(r.long())
    sync = r.raw(16)
    schema = json.loads(meta[b"avro.schema"] if isinstance(
        next(iter(meta)), bytes) else meta["avro.schema"])
    codec = (meta.get("avro.codec") or b"null").decode()
    fields: List[Tuple[str, str]] = []
    for f in schema["fields"]:
        t = f["type"]
        base = t[1] if isinstance(t, list) else t
        fields.append((f["name"], base))

    data: Dict[str, List[Any]] = {name: [] for name, _ in fields}
    while r.pos < len(buf):
        count = r.long()
        size = r.long()
        payload = r.raw(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch")
        br = _Reader(payload)
        for _ in range(count):
            for name, base in fields:
                branch = br.long()
                if branch == 0:
                    data[name].append(None)
                    continue
                if base == "long":
                    data[name].append(br.long())
                elif base == "double":
                    data[name].append(
                        struct.unpack("<d", br.raw(8))[0])
                elif base == "string":
                    data[name].append(br.raw(br.long()).decode("utf-8"))
                elif base == "bytes":
                    data[name].append(br.raw(br.long()))
                elif base == "boolean":
                    data[name].append(br.raw(1) != b"\x00")
                else:
                    raise ValueError(f"unsupported avro type {base}")

    arrow_t = {"long": pa.int64(), "double": pa.float64(),
               "string": pa.string(), "bytes": pa.binary(),
               "boolean": pa.bool_()}
    return pa.table({name: pa.array(data[name], type=arrow_t[base])
                     for name, base in fields})
