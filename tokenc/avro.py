"""Minimal Avro Object Container File reader/writer — just enough to walk
Apache Iceberg table metadata (manifest lists and manifests are Avro OCF).

Built from the public Avro 1.11 specification (container file format +
binary encoding): magic 'Obj\\x01', file-metadata map carrying
avro.schema (JSON) and avro.codec, 16-byte sync marker, then data blocks
of (record count, byte length, payload, sync). Binary encoding: int/long
zigzag varint, float/double little-endian IEEE, bytes/string
length-prefixed, arrays/maps in counted blocks (negative count = byte size
follows), unions as branch-index + value, records as fields in order.

The reader is schema-driven from the WRITER's embedded schema, so files
produced by any engine (Spark, Flink, pyiceberg, Java Iceberg) decode
without configuration. Codecs: null + deflate (raw RFC1951, the two
codecs Iceberg metadata uses in practice).

This is metadata-plane code (a manifest is a few thousand records read
once on the driver per query plan) — clarity over vectorization.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# binary primitives
# --------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    """zigzag varint."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("varint truncated")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, v: int) -> None:
    u = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    u &= (1 << 64) - 1
    while True:
        if u < 0x80:
            out.append(u)
            return
        out.append((u & 0x7F) | 0x80)
        u >>= 7


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("bytes truncated")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out += data


# --------------------------------------------------------------------------
# schema-driven decode
# --------------------------------------------------------------------------

def _decode(schema, buf: io.BytesIO, names: dict):
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):  # union
        return _decode(schema[_read_long(buf)], buf, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            if schema.get("name"):
                names[schema["name"]] = schema
                if schema.get("namespace"):
                    names[schema["namespace"] + "." + schema["name"]] = schema
            return {f["name"]: _decode(f["type"], buf, names)
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)  # byte size of block — unused
                    n = -n
                out.extend(_decode(schema["items"], buf, names)
                           for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf, names)
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            if schema.get("name"):
                names[schema["name"]] = schema
            return buf.read(schema["size"])
        return _decode(t, buf, names)  # {"type": "string", ...} wrapper
    # primitive by name
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported avro type {schema!r}")


# --------------------------------------------------------------------------
# schema-driven encode (fixture/writer side)
# --------------------------------------------------------------------------

def _branch_index(schema: list, v) -> int:
    """Union branch for a python value: None → the null branch, else the
    first non-null branch (sufficient for Iceberg metadata schemas, whose
    unions are all [null, X] / [X, null])."""
    for i, s in enumerate(schema):
        if (s == "null") == (v is None):
            return i
    raise ValueError(f"no union branch for {v!r} in {schema!r}")


def _encode(schema, v, out: bytearray, names: dict) -> None:
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):
        i = _branch_index(schema, v)
        _write_long(out, i)
        return _encode(schema[i], v, out, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            if schema.get("name"):
                names[schema["name"]] = schema
            for f in schema["fields"]:
                if f["name"] in v:
                    fv = v[f["name"]]
                elif "default" in f:
                    fv = f["default"]  # schema evolution: re-encode records
                else:                  # decoded under an older writer schema
                    raise KeyError(f"record missing field {f['name']!r} "
                                   "and schema has no default")
                _encode(f["type"], fv, out, names)
            return
        if t == "array":
            if v:
                _write_long(out, len(v))
                for item in v:
                    _encode(schema["items"], item, out, names)
            _write_long(out, 0)
            return
        if t == "map":
            if v:
                _write_long(out, len(v))
                for k, val in v.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(schema["values"], val, out, names)
            _write_long(out, 0)
            return
        if t == "enum":
            return _write_long(out, schema["symbols"].index(v))
        if t == "fixed":
            if len(v) != schema["size"]:
                raise ValueError("fixed size mismatch")
            out += v
            return
        return _encode(t, v, out, names)
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if v else 0)
        return
    if schema in ("int", "long"):
        return _write_long(out, v)
    if schema == "float":
        out += struct.pack("<f", v)
        return
    if schema == "double":
        out += struct.pack("<d", v)
        return
    if schema == "bytes":
        return _write_bytes(out, bytes(v))
    if schema == "string":
        return _write_bytes(out, v.encode("utf-8"))
    raise ValueError(f"unsupported avro type {schema!r}")


# --------------------------------------------------------------------------
# container file
# --------------------------------------------------------------------------

def read_ocf(data: bytes) -> tuple[dict | str | list, list]:
    """Avro OCF bytes → (writer schema, decoded records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        block = buf.read(_read_long(buf))
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        bb = io.BytesIO(block)
        names: dict = {}
        records.extend(_decode(schema, bb, names) for _ in range(n))
    return schema, records


def write_ocf(schema, records, *, codec: str = "null",
              metadata: dict[str, bytes] | None = None,
              sync: bytes = b"\x00" * 16) -> bytes:
    """(schema, records) → Avro OCF bytes. Deterministic (fixed sync
    marker) so fixtures are reproducible."""
    body = bytearray()
    names: dict = {}
    for r in records:
        _encode(schema, r, body, names)
    block = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = c.compress(block) + c.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"), **(metadata or {})}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out += sync
    _write_long(out, len(records))
    _write_long(out, len(block))
    out += block
    out += sync
    return bytes(out)
