"""Pure-python Apache Avro: binary encoding + Object Container Files.

Implements the public Avro 1.x specification (binary encoding, schema
resolution by field name, container files with null/deflate codecs) —
enough to read and write GeoTrellis layer payloads (sources/geotrellis.py)
and interop fixtures.  The generic decoder is validated against the
canonical JVM implementation (``org.apache.avro`` ships in pyspark's jars)
in tests/test_avro.py — container files written by GenericDatumWriter
through py4j must decode byte-identically, breaking the own-writer loop.

Reference parity: the reference reads GeoTrellis layers through
geotrellis.store.avro codecs (datasource/.../geotrellis/
GeoTrellisRelation.scala:60-300); here the same record shapes decode
through this module with the writer schema taken from the layer's
attribute store.
"""
from __future__ import annotations

import json
import struct
import zlib

__all__ = ["parse_schema", "decode_binary", "encode_binary",
           "read_container", "write_container"]

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


def parse_schema(schema) -> dict:
    """Schema JSON (str or parsed) -> normalized dict form.

    Named-type references resolve through a registry built during the
    walk (records/enums/fixed may be referenced by name after first
    definition, per spec)."""
    if isinstance(schema, (str, bytes)):
        try:
            schema = json.loads(schema)
        except UnicodeDecodeError as e:
            raise ValueError(f"avro: schema not UTF-8 ({e})") from None
    names: dict[str, dict] = {}
    try:
        return _norm(schema, names, None)
    except (KeyError, TypeError, AttributeError) as e:
        # untrusted schema JSON: structural surprises surface as the
        # clean parse error, not a raw internal exception
        raise ValueError(f"avro: malformed schema ({e!r})") from None


def _fullname(name: str, namespace: str | None) -> str:
    if "." in name or not namespace:
        return name
    return f"{namespace}.{name}"


def _norm(s, names: dict, namespace: str | None):
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return {"type": s, "_p": True}
        full = _fullname(s, namespace)
        if full in names:
            return names[full]
        if s in names:
            return names[s]
        raise ValueError(f"avro: unknown type name {s!r}")
    if isinstance(s, list):                      # union
        return {"type": "union", "_p": True,
                "branches": [_norm(b, names, namespace) for b in s]}
    if not isinstance(s, dict):
        raise ValueError(f"avro: bad schema node {s!r}")
    t = s["type"]
    if isinstance(t, (dict, list)):              # e.g. {"type": [...]}
        return _norm(t, names, namespace)
    if t in _PRIMITIVES:
        return {"type": t, "_p": True}
    if t == "record" or t == "error":
        ns = s.get("namespace", namespace)
        full = _fullname(s["name"], ns)
        node = {"type": "record", "name": full, "fields": [], "_p": True}
        names[full] = node
        names.setdefault(s["name"], node)
        for f in s["fields"]:
            node["fields"].append(
                (f["name"], _norm(f["type"], names, ns)))
        return node
    if t == "enum":
        ns = s.get("namespace", namespace)
        full = _fullname(s["name"], ns)
        node = {"type": "enum", "name": full, "symbols": list(s["symbols"]), "_p": True}
        names[full] = node
        names.setdefault(s["name"], node)
        return node
    if t == "fixed":
        ns = s.get("namespace", namespace)
        full = _fullname(s["name"], ns)
        node = {"type": "fixed", "name": full, "size": int(s["size"]), "_p": True}
        names[full] = node
        names.setdefault(s["name"], node)
        return node
    if t == "array":
        return {"type": "array", "_p": True,
                "items": _norm(s["items"], names, namespace)}
    if t == "map":
        return {"type": "map", "_p": True,
                "values": _norm(s["values"], names, namespace)}
    raise ValueError(f"avro: unsupported schema type {t!r}")


# ---------------------------------------------------------------------------
# binary decode
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("data", "pos", "tag")

    def __init__(self, data: bytes, pos: int = 0, tag: bool = False):
        self.data = data
        self.pos = pos
        self.tag = tag

    def long(self) -> int:
        """zigzag varint (int and long share the wire format)."""
        data, pos = self.data, self.pos
        try:
            b = data[pos]
            pos += 1
            n = b & 0x7F
            shift = 7
            while b & 0x80:
                if shift > 70:   # >10 continuation bytes can't be a long
                    raise ValueError("avro: varint too long")
                b = data[pos]
                pos += 1
                n |= (b & 0x7F) << shift
                shift += 7
        except IndexError:
            raise ValueError("avro: truncated varint") from None
        self.pos = pos
        return (n >> 1) ^ -(n & 1)

    def raw(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("avro: truncated input")
        self.pos += n
        return b


def _decode(r: _Reader, s: dict):
    t = s["type"]
    if t == "record":
        out = {name: _decode(r, fs) for name, fs in s["fields"]}
        if r.tag:
            # unqualified record name — lets consumers resolve WHICH
            # union branch a value came from (e.g. ShortArrayTile vs
            # IntArrayTile share the array<int> cells wire shape)
            out["_type"] = s["name"].rsplit(".", 1)[-1]
        return out
    if t == "union":
        idx = r.long()
        branches = s["branches"]
        if not 0 <= idx < len(branches):
            raise ValueError(f"avro: union branch {idx} out of range")
        return _decode(r, branches[idx])
    if t == "array":
        out = []
        items = s["items"]
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:            # negative count: block byte size follows
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode(r, items))
        return out
    if t == "map":
        out = {}
        values = s["values"]
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.raw(r.long()).decode("utf-8")
                out[k] = _decode(r, values)
        return out
    if t == "long" or t == "int":
        return r.long()
    if t == "string":
        return r.raw(r.long()).decode("utf-8")
    if t == "bytes":
        return r.raw(r.long())
    if t == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if t == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if t == "boolean":
        return r.raw(1)[0] != 0
    if t == "null":
        return None
    if t == "enum":
        return s["symbols"][r.long()]
    if t == "fixed":
        return r.raw(s["size"])
    raise ValueError(f"avro: cannot decode type {t!r}")


def decode_binary(data: bytes, schema, pos: int = 0, count: int = 1,
                  tag_records: bool = False, exact: bool = False):
    """Raw Avro binary (no container) -> decoded value(s).

    ``count`` > 1 returns a list (consecutive values, as in container
    blocks); ``tag_records`` adds a ``_type`` key (unqualified record
    name) to every decoded record; ``exact`` requires the decode to
    consume the input to the last byte (a cheap wrong-schema /
    wrong-compression detector); truncated input raises ValueError."""
    s = schema if isinstance(schema, dict) and schema.get("_p") \
        else parse_schema(schema)
    try:
        r = _Reader(data, pos, tag=tag_records)
        out = _decode(r, s) if count == 1 \
            else [_decode(r, s) for _ in range(count)]
        if exact and r.pos != len(data):
            raise ValueError(
                f"avro: {len(data) - r.pos} trailing bytes after decode")
        return out
    except (IndexError, struct.error) as e:
        raise ValueError(f"avro: malformed binary: {e}") from e


# ---------------------------------------------------------------------------
# binary encode
# ---------------------------------------------------------------------------


def _enc_long(out: bytearray, v: int):
    # zigzag: arbitrary-precision python XOR gives two's-complement
    # semantics, so (v << 1) ^ (v >> 63) is correct for any 64-bit v
    z = (v << 1) ^ (v >> 63)
    while z > 0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)


def _union_branch(s: dict, v) -> int:
    """Pick the first union branch whose type matches the python value.
    A dict value carrying ``_type`` selects a record branch by name
    (the inverse of ``decode_binary(tag_records=True)``)."""
    if isinstance(v, dict) and "_type" in v:
        want = v["_type"]
        for i, b in enumerate(s["branches"]):
            if b["type"] == "record" and \
                    b["name"].rsplit(".", 1)[-1] == want:
                return i
        raise ValueError(f"avro: no union branch named {want!r}")
    for i, b in enumerate(s["branches"]):
        t = b["type"]
        if v is None and t == "null":
            return i
        if isinstance(v, bool):
            if t == "boolean":
                return i
        elif isinstance(v, int) and t in ("int", "long"):
            return i
        elif isinstance(v, float) and t in ("float", "double"):
            return i
        elif isinstance(v, str) and t in ("string", "enum"):
            return i
        elif isinstance(v, (bytes, bytearray)) and t in ("bytes", "fixed"):
            return i
        elif isinstance(v, dict) and t in ("record", "map"):
            return i
        elif isinstance(v, list) and t == "array":
            return i
    raise ValueError(f"avro: no union branch for {type(v).__name__}")


def _encode(out: bytearray, s: dict, v):
    t = s["type"]
    if t == "record":
        for name, fs in s["fields"]:
            _encode(out, fs, v[name])
        return
    if t == "union":
        i = _union_branch(s, v)
        _enc_long(out, i)
        _encode(out, s["branches"][i], v)
        return
    if t == "array":
        if v:
            _enc_long(out, len(v))
            for item in v:
                _encode(out, s["items"], item)
        _enc_long(out, 0)
        return
    if t == "map":
        if v:
            _enc_long(out, len(v))
            for k, item in v.items():
                kb = k.encode("utf-8")
                _enc_long(out, len(kb))
                out += kb
                _encode(out, s["values"], item)
        _enc_long(out, 0)
        return
    if t == "long" or t == "int":
        _enc_long(out, int(v))
        return
    if t == "string":
        b = v.encode("utf-8")
        _enc_long(out, len(b))
        out += b
        return
    if t == "bytes":
        _enc_long(out, len(v))
        out += bytes(v)
        return
    if t == "double":
        out += struct.pack("<d", float(v))
        return
    if t == "float":
        out += struct.pack("<f", float(v))
        return
    if t == "boolean":
        out.append(1 if v else 0)
        return
    if t == "null":
        return
    if t == "enum":
        _enc_long(out, s["symbols"].index(v))
        return
    if t == "fixed":
        if len(v) != s["size"]:
            raise ValueError("avro: fixed size mismatch")
        out += bytes(v)
        return
    raise ValueError(f"avro: cannot encode type {t!r}")


def encode_binary(value, schema) -> bytes:
    s = schema if isinstance(schema, dict) and schema.get("_p") \
        else parse_schema(schema)
    out = bytearray()
    _encode(out, s, value)
    return bytes(out)


# ---------------------------------------------------------------------------
# Object Container Files (spec: "Obj" 0x01 header, sync-delimited blocks)
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"


def read_container(data: bytes) -> tuple[list, str]:
    """Avro Object Container File bytes -> (records, schema_json_str)."""
    if data[:4] != _MAGIC:
        raise ValueError("avro: not a container file (bad magic)")
    r = _Reader(data, 4)
    meta_schema = {"type": "map", "values": {"type": "bytes"}}
    meta = _decode(r, meta_schema)
    try:
        schema_json = meta["avro.schema"].decode("utf-8")
        codec = meta.get("avro.codec", b"null").decode("utf-8")
    except (KeyError, UnicodeDecodeError) as e:
        raise ValueError(f"avro: bad container metadata ({e})") from None
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: codec {codec!r} not supported")
    sync = r.raw(16)
    schema = parse_schema(schema_json)
    records = []
    while r.pos < len(data):
        n = r.long()
        size = r.long()
        block = r.raw(size)
        if codec == "deflate":
            try:
                block = zlib.decompress(block, -15)   # raw deflate per spec
            except zlib.error as e:
                raise ValueError(f"avro: bad deflate block ({e})") from None
        br = _Reader(block)
        for _ in range(n):
            records.append(_decode(br, schema))
        if r.raw(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return records, schema_json


def write_container(records: list, schema, codec: str = "null",
                    sync: bytes = b"\x00" * 16) -> bytes:
    """Records + schema -> Avro Object Container File bytes (one block)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: codec {codec!r} not supported")
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)
    s = parse_schema(schema_json)
    body = bytearray()
    for rec in records:
        _encode(body, s, rec)
    block = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    out = bytearray(_MAGIC)
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    _encode(out, {"type": "map", "values": {"type": "bytes"}}, meta)
    out += sync
    _enc_long(out, len(records))
    _enc_long(out, len(block))
    out += block
    out += sync
    return bytes(out)
