"""Byte-level KV codec: Avro binary encoding, pure Python, Arrow-batched.

The reference ships its online KV contract as Avro bytes — AvroCodec
(online/src/main/scala/ai/chronon/online/AvroCodec.scala), the Spark<->Avro
schema bridge (online/.../AvroConversions.scala), and the upload writer that
turns IR frames into (key_bytes, value_bytes) rows
(spark/src/main/scala/ai/chronon/spark/KvRdd.scala:77-90 ``toAvroDf``).
This module re-expresses that contract from the PUBLIC Avro 1.11.1
specification (https://avro.apache.org/docs/1.11.1/specification/):

- binary encoding: zigzag varint ints/longs, little-endian IEEE floats,
  length-prefixed utf-8/bytes, block-coded arrays/maps, union branch index;
- Parsing Canonical Form + the CRC-64-AVRO (Rabin) schema fingerprint;
- the single-object encoding frame ``C3 01`` + 8-byte little-endian
  fingerprint + body, so every stored value self-identifies its writer
  schema;
- writer->reader schema resolution (field matching by name, defaults for
  reader-only fields, numeric promotions, string<->bytes, union branch
  re-resolution) — the schema-evolution story AvroCodec gets from the Avro
  library.

No Avro implementation exists in this container (ENVIRONMENT_PROBES.md:
no avro/fastavro, no spark-avro jar, no network), so the codec is written
from the specification and verified by property tests (encode->decode
identity over randomized data and schemas, resolution rules, fingerprint
canonicalization) plus the serving differential: fetch over
encoded->decoded KV frames must be value-identical to the offline engine.

Scale shape: encode/decode run inside ``mapInArrow`` — Arrow batches in,
Arrow batches out, no driver collect, one pass, embarrassingly parallel
per partition. The per-row Python loop is the same per-row cost the
reference pays in AvroCodec's JVM serializer; it sits on the SMALL side of
the pipeline (per-key IR rows, not raw events).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Schema model. Schemas are plain parsed-JSON values (str | list | dict),
# exactly as the Avro spec defines them; ``_named`` environments map
# fullnames to their definitions so named-type references resolve.
# ---------------------------------------------------------------------------

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _fullname(schema: dict, enclosing_ns: str | None) -> str:
    name = schema["name"]
    if "." in name:
        return name
    ns = schema.get("namespace", enclosing_ns)
    return f"{ns}.{name}" if ns else name


def _resolve_names(schema, names: dict, enclosing_ns: str | None = None):
    """Walk a schema, registering named types in ``names`` (fullname -> def)."""
    if isinstance(schema, str):
        return
    if isinstance(schema, list):
        for s in schema:
            if isinstance(s, list):
                # spec: "Unions may not immediately contain other unions"
                raise ValueError(f"union immediately contains a union: {schema!r}")
            _resolve_names(s, names, enclosing_ns)
        return
    t = schema["type"]
    if t in ("record", "enum", "fixed"):
        fn = _fullname(schema, enclosing_ns)
        names[fn] = schema
        ns = fn.rsplit(".", 1)[0] if "." in fn else None
        if t == "record":
            for f in schema["fields"]:
                _resolve_names(f["type"], names, ns)
    elif t == "array":
        _resolve_names(schema["items"], names, enclosing_ns)
    elif t == "map":
        _resolve_names(schema["values"], names, enclosing_ns)


def _deref(schema, names: dict):
    """Resolve a named-type reference string to its definition."""
    if isinstance(schema, str) and schema not in PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise ValueError(f"unresolved Avro type reference: {schema!r}")
    return schema


def _type_of(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


class AvroSchema:
    """A parsed schema plus its name environment and fingerprint."""

    def __init__(self, schema_json: str | dict | list):
        self.schema = (
            json.loads(schema_json) if isinstance(schema_json, str) else schema_json
        )
        self.names: dict = {}
        _resolve_names(self.schema, self.names)
        self.canonical = canonical_form(self.schema)
        self.fingerprint = rabin64(self.canonical.encode("utf-8"))

    def json(self) -> str:
        return json.dumps(self.schema)


# ---------------------------------------------------------------------------
# Parsing Canonical Form (spec: "Transforming into Parsing Canonical Form")
# and the CRC-64-AVRO Rabin fingerprint (spec appendix, ``fingerprint64``).
# ---------------------------------------------------------------------------

_CANONICAL_FIELD_ORDER = ["name", "type", "fields", "symbols", "items", "values", "size"]


def canonical_form(schema, enclosing_ns: str | None = None) -> str:
    if isinstance(schema, str):
        if schema in PRIMITIVES:
            return f'"{schema}"'
        # named reference -> fullname resolved against the enclosing namespace
        fn = schema if "." in schema else (
            f"{enclosing_ns}.{schema}" if enclosing_ns else schema
        )
        return f'"{fn}"'
    if isinstance(schema, list):
        return "[" + ",".join(canonical_form(s, enclosing_ns) for s in schema) + "]"
    t = schema["type"]
    if t in PRIMITIVES:
        # [STRIP]: a primitive wrapped in an object (possibly carrying
        # logicalType or other attributes) canonicalizes to the bare string
        return f'"{t}"'
    out = []
    if t in ("record", "enum", "fixed"):
        fn = _fullname(schema, enclosing_ns)
        ns = fn.rsplit(".", 1)[0] if "." in fn else None
        for key in _CANONICAL_FIELD_ORDER:
            if key == "name":
                out.append(f'"name":{json.dumps(fn)}')
            elif key == "type":
                out.append(f'"type":{json.dumps(t)}')
            elif key == "fields" and t == "record":
                fs = ",".join(
                    '{"name":%s,"type":%s}'
                    % (json.dumps(f["name"]), canonical_form(f["type"], ns))
                    for f in schema["fields"]
                )
                out.append(f'"fields":[{fs}]')
            elif key == "symbols" and t == "enum":
                out.append('"symbols":[%s]' % ",".join(json.dumps(s) for s in schema["symbols"]))
            elif key == "size" and t == "fixed":
                out.append(f'"size":{int(schema["size"])}')
    elif t == "array":
        out.append('"type":"array"')
        out.append(f'"items":{canonical_form(schema["items"], enclosing_ns)}')
        out.sort(key=lambda kv: _CANONICAL_FIELD_ORDER.index(kv.split(":", 1)[0].strip('"')))
    elif t == "map":
        out.append('"type":"map"')
        out.append(f'"values":{canonical_form(schema["values"], enclosing_ns)}')
        out.sort(key=lambda kv: _CANONICAL_FIELD_ORDER.index(kv.split(":", 1)[0].strip('"')))
    else:
        raise ValueError(f"unknown Avro type: {t!r}")
    return "{" + ",".join(out) + "}"


_RABIN_EMPTY = 0xC15D213AA4D7A795
_RABIN_TABLE: list[int] | None = None


def rabin64(data: bytes) -> int:
    """CRC-64-AVRO fingerprint (the spec's ``fingerprint64``). The
    fingerprint of the empty message is the polynomial constant itself."""
    global _RABIN_TABLE
    if _RABIN_TABLE is None:
        table = []
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_RABIN_EMPTY & -(fp & 1))
            table.append(fp & 0xFFFFFFFFFFFFFFFF)
        _RABIN_TABLE = table
    fp = _RABIN_EMPTY
    for b in data:
        fp = (fp >> 8) ^ _RABIN_TABLE[(fp ^ b) & 0xFF]
    return fp


# ---------------------------------------------------------------------------
# Binary encoder / decoder (spec: "Binary Encoding").
# ---------------------------------------------------------------------------

_INT_MIN, _INT_MAX = -(1 << 31), (1 << 31) - 1
_LONG_MIN, _LONG_MAX = -(1 << 63), (1 << 63) - 1


def _write_long(out: bytearray, n: int):
    u = (n << 1) ^ (n >> 63)  # zigzag; Python's arbitrary ints make this exact
    while u > 0x7F:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _norm_long(v) -> int:
    # numpy scalars, pandas Timestamps, datetimes (timestamp-micros logical)
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        v = v.item()
    if isinstance(v, int):
        return v
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        import calendar

        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc)
        return calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    raise TypeError(f"cannot encode {type(v).__name__} as Avro long/int")


def _encode(schema, names: dict, datum, out: bytearray):
    schema = _deref(schema, names)
    t = _type_of(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, names, datum):
                _write_long(out, i)
                _encode(branch, names, datum, out)
                return
        raise TypeError(f"datum {datum!r} matches no union branch of {schema}")
    if datum is None and t != "null":
        raise TypeError(f"None for non-nullable Avro type {t}")
    if t == "null":
        if datum is not None:
            raise TypeError(f"non-None datum {datum!r} for Avro null")
        return
    if t == "boolean":
        out.append(1 if datum else 0)
    elif t == "int":
        n = _norm_long(datum)
        if not _INT_MIN <= n <= _INT_MAX:
            raise ValueError(f"{n} out of Avro int range")
        _write_long(out, n)
    elif t == "long":
        n = _norm_long(datum)
        if not _LONG_MIN <= n <= _LONG_MAX:
            raise ValueError(f"{n} out of Avro long range")
        _write_long(out, n)
    elif t == "float":
        out += struct.pack("<f", float(datum))
    elif t == "double":
        out += struct.pack("<d", float(datum))
    elif t == "string":
        b = datum.encode("utf-8") if isinstance(datum, str) else bytes(datum)
        _write_long(out, len(b))
        out += b
    elif t == "bytes":
        b = bytes(datum)
        _write_long(out, len(b))
        out += b
    elif t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(b)}")
        out += b
    elif t == "enum":
        _write_long(out, schema["symbols"].index(datum))
    elif t == "record":
        for f in schema["fields"]:
            try:
                _encode(f["type"], names, datum[f["name"]] if datum else None, out)
            except (TypeError, ValueError) as e:
                raise type(e)(f"field '{f['name']}': {e}") from None
    elif t == "array":
        items = _as_list(datum)
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(schema["items"], names, it, out)
        _write_long(out, 0)
    elif t == "map":
        pairs = _as_pairs(datum)
        if pairs:
            _write_long(out, len(pairs))
            for k, v in pairs:
                _encode("string", names, k, out)
                _encode(schema["values"], names, v, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"unknown Avro type: {t!r}")


def _as_list(datum) -> list:
    if isinstance(datum, (list, tuple)):
        return list(datum)
    if hasattr(datum, "tolist"):  # numpy array
        return list(datum)
    raise TypeError(f"cannot encode {type(datum).__name__} as Avro array")


def _as_pairs(datum) -> list:
    if isinstance(datum, dict):
        return list(datum.items())
    if isinstance(datum, (list, tuple)):  # Arrow map scalars -> list of pairs
        return [tuple(p) for p in datum]
    raise TypeError(f"cannot encode {type(datum).__name__} as Avro map")


def _matches(branch, names: dict, datum) -> bool:
    branch = _deref(branch, names)
    t = _type_of(branch)
    if t == "null":
        return datum is None
    if datum is None:
        return False
    if t == "boolean":
        return isinstance(datum, bool)
    if t in ("int", "long"):
        if isinstance(datum, bool):
            return False
        try:
            n = _norm_long(datum)
        except TypeError:
            return False
        # range-gate so a union like ["int","long"] falls through to the
        # branch that can actually hold the value
        lo, hi = (_INT_MIN, _INT_MAX) if t == "int" else (_LONG_MIN, _LONG_MAX)
        return lo <= n <= hi
    if t in ("float", "double"):
        return isinstance(datum, float) or (
            hasattr(datum, "item") and isinstance(datum.item(), (float, int))
        ) or isinstance(datum, int)
    if t == "string":
        return isinstance(datum, str)
    if t in ("bytes", "fixed"):
        return isinstance(datum, (bytes, bytearray))
    if t == "enum":
        return isinstance(datum, str) and datum in branch["symbols"]
    if t == "record":
        return isinstance(datum, dict)
    if t == "array":
        return isinstance(datum, (list, tuple)) or hasattr(datum, "tolist")
    if t == "map":
        return isinstance(datum, dict) or isinstance(datum, (list, tuple))
    return False


def encode(schema: AvroSchema, datum) -> bytes:
    out = bytearray()
    _encode(schema.schema, schema.names, datum, out)
    return bytes(out)


# --- decode + writer->reader resolution (spec: "Schema Resolution") --------

_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def _skip(schema, names: dict, buf: bytes, pos: int) -> int:
    schema = _deref(schema, names)
    t = _type_of(schema)
    if t == "union":
        i, pos = _read_long(buf, pos)
        return _skip(schema[i], names, buf, pos)
    if t == "null":
        return pos
    if t == "boolean":
        return pos + 1
    if t in ("int", "long", "enum"):
        _, pos = _read_long(buf, pos)
        return pos
    if t == "float":
        return pos + 4
    if t == "double":
        return pos + 8
    if t in ("string", "bytes"):
        n, pos = _read_long(buf, pos)
        return pos + n
    if t == "fixed":
        return pos + schema["size"]
    if t == "record":
        for f in schema["fields"]:
            pos = _skip(f["type"], names, buf, pos)
        return pos
    if t in ("array", "map"):
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return pos
            if n < 0:  # negative block count: byte size follows — skip wholesale
                size, pos = _read_long(buf, pos)
                pos += size
                continue
            for _ in range(n):
                if t == "map":
                    pos = _skip("string", names, buf, pos)
                    pos = _skip(schema["values"], names, buf, pos)
                else:
                    pos = _skip(schema["items"], names, buf, pos)
    raise ValueError(f"unknown Avro type: {t!r}")


def _default_value(schema, names: dict, default):
    """JSON default -> Python datum (spec: field defaults; union defaults
    correspond to the FIRST branch; bytes defaults are latin-1 strings)."""
    schema = _deref(schema, names)
    t = _type_of(schema)
    if t == "union":
        return _default_value(schema[0], names, default)
    if t == "null":
        return None
    if t in ("bytes", "fixed"):
        return default.encode("latin-1") if isinstance(default, str) else bytes(default)
    if t == "record":
        return {
            f["name"]: _default_value(f["type"], names, default.get(f["name"], f.get("default")))
            for f in schema["fields"]
        }
    if t == "array":
        return [_default_value(schema["items"], names, d) for d in default]
    if t == "map":
        return {k: _default_value(schema["values"], names, v) for k, v in default.items()}
    if t in ("float", "double"):
        return float(default)
    return default


def _decode(writer, wnames: dict, reader, rnames: dict, buf: bytes, pos: int):
    writer = _deref(writer, wnames)
    reader = _deref(reader, rnames)
    wt, rt = _type_of(writer), _type_of(reader)
    if wt == "union":
        i, pos = _read_long(buf, pos)
        return _decode(writer[i], wnames, reader, rnames, buf, pos)
    if rt == "union" and wt != "union":
        for branch in reader:  # first reader branch the writer type resolves to
            try:
                return _decode(writer, wnames, branch, rnames, buf, pos)
            except _Unresolvable:
                continue
        raise _Unresolvable(f"writer {wt} matches no reader union branch")
    if rt != wt and rt not in _PROMOTIONS.get(wt, ()):  # promotion check
        raise _Unresolvable(f"cannot resolve writer {wt} to reader {rt}")
    if wt == "null":
        return None, pos
    if wt == "boolean":
        return buf[pos] != 0, pos + 1
    if wt in ("int", "long"):
        n, pos = _read_long(buf, pos)
        return (float(n) if rt in ("float", "double") else n), pos
    if wt == "float":
        (v,) = struct.unpack_from("<f", buf, pos)
        return v, pos + 4
    if wt == "double":
        (v,) = struct.unpack_from("<d", buf, pos)
        return v, pos + 8
    if wt in ("string", "bytes"):
        n, pos = _read_long(buf, pos)
        raw = bytes(buf[pos : pos + n])
        pos += n
        return (raw.decode("utf-8") if rt == "string" else raw), pos
    if wt == "fixed":
        if reader.get("size") != writer["size"]:
            raise _Unresolvable("fixed size mismatch")
        n = writer["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if wt == "enum":
        i, pos = _read_long(buf, pos)
        sym = writer["symbols"][i]
        if sym not in reader["symbols"]:
            raise _Unresolvable(f"enum symbol {sym} absent from reader")
        return sym, pos
    if wt == "record":
        rfields = {f["name"]: f for f in reader["fields"]}
        out = {}
        for f in writer["fields"]:
            rf = rfields.pop(f["name"], None)
            if rf is None:
                pos = _skip(f["type"], wnames, buf, pos)
            else:
                out[f["name"]], pos = _decode(
                    f["type"], wnames, rf["type"], rnames, buf, pos
                )
        for name, rf in rfields.items():  # reader-only fields take defaults
            if "default" not in rf:
                rtype = _deref(rf["type"], rnames)
                if isinstance(rtype, list) and _type_of(rtype[0]) == "null":
                    out[name] = None  # nullable without explicit default
                else:
                    raise _Unresolvable(
                        f"reader field '{name}' missing from writer and has no default"
                    )
            else:
                out[name] = _default_value(rf["type"], rnames, rf["default"])
        return out, pos
    if wt == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)  # byte size — unused when reading
            for _ in range(n):
                v, pos = _decode(writer["items"], wnames, reader["items"], rnames, buf, pos)
                out.append(v)
    if wt == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                k, pos = _decode("string", wnames, "string", rnames, buf, pos)
                out[k], pos = _decode(writer["values"], wnames, reader["values"], rnames, buf, pos)
    raise ValueError(f"unknown Avro type: {wt!r}")


class _Unresolvable(TypeError):
    """Writer schema cannot be resolved to the reader schema."""


def decode(writer: AvroSchema, data: bytes, reader: AvroSchema | None = None):
    reader = reader or writer
    datum, pos = _decode(writer.schema, writer.names, reader.schema, reader.names, data, 0)
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after decode")
    return datum


# --- single-object framing (spec: "Single-object encoding") ----------------

_SOE_MARKER = b"\xc3\x01"


def frame(schema: AvroSchema, datum) -> bytes:
    return _SOE_MARKER + struct.pack("<Q", schema.fingerprint) + encode(schema, datum)


def unframe(data: bytes, registry: dict[int, AvroSchema], reader: AvroSchema | None = None):
    """Decode a single-object-encoded value, looking the writer schema up by
    its embedded fingerprint — the wire-level schema registry contract
    (reference AvroCodec caches codecs by schema string the same way)."""
    if data[:2] != _SOE_MARKER:
        raise ValueError(f"bad single-object marker {data[:2]!r}")
    (fp,) = struct.unpack_from("<Q", data, 2)
    writer = registry.get(fp)
    if writer is None:
        raise KeyError(f"writer schema fingerprint {fp:#018x} not in registry")
    return decode(writer, data[10:], reader=reader)


# ---------------------------------------------------------------------------
# Object Container Files (Avro spec §"Object Container Files") — the on-disk
# framing Iceberg manifests and manifest lists use. Codec 'null' only (the
# Iceberg default for metadata written without compression jars).
# ---------------------------------------------------------------------------

_OCF_MAGIC = b"Obj\x01"


def _ocf_sync(schema: AvroSchema) -> bytes:
    """Deterministic 16-byte sync marker (the spec only requires it be
    consistent within the file; deterministic keeps our written metadata
    byte-reproducible)."""
    import hashlib

    return hashlib.md5(b"chronon-ocf:" + canonical_form(schema.schema).encode()).digest()


def _encode_meta_map(out: bytearray, meta: dict[str, bytes]):
    if meta:
        _write_long(out, len(meta))
        for k, v in meta.items():
            kb = k.encode()
            _write_long(out, len(kb))
            out.extend(kb)
            _write_long(out, len(v))
            out.extend(v)
    _write_long(out, 0)


def write_ocf(
    path: str,
    schema: AvroSchema,
    records: list,
    metadata: dict[str, bytes] | None = None,
) -> int:
    """Write an Avro Object Container File: magic, file-metadata map
    (avro.schema + avro.codec=null + caller extras, e.g. Iceberg's
    'schema'/'partition-spec' keys), sync marker, then one block holding all
    records. Returns the file length in bytes (manifest_length in Iceberg's
    manifest_file struct)."""
    sync = _ocf_sync(schema)
    out = bytearray(_OCF_MAGIC)
    meta = {"avro.schema": schema.json().encode(), "avro.codec": b"null"}
    meta.update(metadata or {})
    _encode_meta_map(out, meta)
    out.extend(sync)
    payload = bytearray()
    for rec in records:
        payload.extend(encode(schema, rec))
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    data = bytes(out)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def read_ocf(
    path: str, reader: AvroSchema | None = None
) -> tuple[list, dict[str, bytes]]:
    """Read an Avro Object Container File written by any spec-conforming
    writer (codec null): returns (records, file-metadata). The embedded
    writer schema drives decoding; pass ``reader`` to resolve into an
    evolved shape (promotions/defaults/reorder — same rules as decode)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _OCF_MAGIC:
        raise ValueError(f"not an Avro object container file: magic {buf[:4]!r}")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative block count: byte size follows (spec)
            n = -n
            _, pos = _read_long(buf, pos)
        for _ in range(n):
            klen, pos = _read_long(buf, pos)
            k = buf[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _read_long(buf, pos)
            meta[k] = buf[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported OCF codec {codec!r} (null only)")
    writer = AvroSchema(meta["avro.schema"].decode())
    rdr = reader or writer
    sync = buf[pos : pos + 16]
    pos += 16
    records: list = []
    while pos < len(buf):
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        end = pos + size
        for _ in range(count):
            datum, pos = _decode(
                writer.schema, writer.names, rdr.schema, rdr.names, buf, pos
            )
            records.append(datum)
        if pos != end:
            raise ValueError(f"OCF block size mismatch: {end - pos} bytes left")
        if buf[pos : pos + 16] != sync:
            raise ValueError("OCF sync marker mismatch")
        pos += 16
    return records, meta


# ---------------------------------------------------------------------------
# Spark <-> Avro schema bridge (reference AvroConversions.fromChrononSchema /
# toChrononSchema). Nullable fields become ["null", T] unions, Spark
# timestamps ride as long/timestamp-micros, dates as int/date.
# ---------------------------------------------------------------------------


def avro_of_spark(dt: T.DataType, *, name: str = "root", namespace: str = "chronon.kv"):
    def conv(d: T.DataType, nullable: bool, path: str):
        if isinstance(d, T.StructType):
            rec = {
                "type": "record",
                "name": f"{path}_r",
                "namespace": namespace,
                "fields": [
                    {
                        "name": f.name,
                        "type": conv(f.dataType, f.nullable, f"{path}_{f.name}"),
                        **({"default": None} if f.nullable else {}),
                    }
                    for f in d.fields
                ],
            }
            base = rec
        elif isinstance(d, T.ArrayType):
            base = {"type": "array", "items": conv(d.elementType, d.containsNull, f"{path}_i")}
        elif isinstance(d, T.MapType):
            if not isinstance(d.keyType, T.StringType):
                raise ValueError("Avro maps require string keys")
            base = {"type": "map", "values": conv(d.valueType, d.valueContainsNull, f"{path}_v")}
        elif isinstance(d, T.BooleanType):
            base = "boolean"
        elif isinstance(d, (T.ByteType, T.ShortType, T.IntegerType)):
            base = "int"
        elif isinstance(d, T.LongType):
            base = "long"
        elif isinstance(d, T.FloatType):
            base = "float"
        elif isinstance(d, T.DoubleType):
            base = "double"
        elif isinstance(d, T.StringType):
            base = "string"
        elif isinstance(d, T.BinaryType):
            base = "bytes"
        elif isinstance(d, T.TimestampType):
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(d, T.DateType):
            base = {"type": "int", "logicalType": "date"}
        else:
            raise ValueError(f"no Avro mapping for Spark type {d.simpleString()}")
        return ["null", base] if nullable else base

    if not isinstance(dt, T.StructType):
        raise ValueError("top-level Avro KV schema must be a record (StructType)")
    rec = conv(dt, False, name)
    rec["name"] = name
    return rec


def spark_of_avro(schema, names: dict | None = None) -> T.DataType:
    if names is None:
        names = {}
        _resolve_names(schema, names)
    schema = _deref(schema, names)
    t = _type_of(schema)
    if t == "union":
        non_null = [s for s in schema if _type_of(_deref(s, names)) != "null"]
        if len(non_null) != 1:
            raise ValueError("only ['null', T] unions map to Spark types")
        return spark_of_avro(non_null[0], names)
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], spark_of_avro(f["type"], names), _nullable(f["type"], names))
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(spark_of_avro(schema["items"], names), _nullable(schema["items"], names))
    if t == "map":
        return T.MapType(T.StringType(), spark_of_avro(schema["values"], names), _nullable(schema["values"], names))
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "long" and logical == "timestamp-micros":
        return T.TimestampType()
    if t == "int" and logical == "date":
        return T.DateType()
    return {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "enum": T.StringType(),
        "fixed": T.BinaryType(),
    }[t]


def _nullable(schema, names: dict) -> bool:
    schema = _deref(schema, names)
    return isinstance(schema, list) and any(
        _type_of(_deref(s, names)) == "null" for s in schema
    )


# ---------------------------------------------------------------------------
# DataFrame <-> KV-bytes frames (reference KvRdd.toAvroDf / FlatDf round
# trip). mapInArrow keeps nulls exact (no pandas NaN conflation) and nested
# values native; logical columns (timestamp/date) are pre-cast to their
# integer epoch representation at the ARROW level so the Python encoder only
# ever sees ints.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KvSchemas:
    key: str  # key record schema JSON
    value: str  # value record schema JSON
    key_fingerprint: int
    value_fingerprint: int


def _arrow_epoch_cast(batch):
    """Cast timestamp/date columns (at any nesting depth) to int64/int32."""
    import pyarrow as pa

    def fix(t):
        if pa.types.is_timestamp(t):
            return pa.int64()
        if pa.types.is_date32(t):
            return pa.int32()
        if pa.types.is_struct(t):
            return pa.struct([pa.field(f.name, fix(f.type), f.nullable) for f in t])
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return pa.list_(fix(t.value_type))
        if pa.types.is_map(t):
            return pa.map_(t.key_type, fix(t.item_type))
        return t

    cols, fields = [], []
    for i, f in enumerate(batch.schema):
        ft = fix(f.type)
        col = batch.column(i)
        if not ft.equals(f.type):
            col = col.cast(ft)
        cols.append(col)
        fields.append(pa.field(f.name, ft, f.nullable))
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def encode_kv_df(df: DataFrame, key_cols: list[str], *, name: str = "kv") -> tuple[DataFrame, KvSchemas]:
    """(key_bytes, value_bytes) single-object-encoded frames from a typed
    DataFrame: key record = ``key_cols``, value record = the remaining
    columns (KvRdd.toAvroDf's layout). Arrow-batched, no driver collect."""
    value_cols = [c for c in df.columns if c not in key_cols]
    sch = df.schema
    key_avro = avro_of_spark(
        T.StructType([sch[c] for c in key_cols]), name=f"{name}_key"
    )
    val_avro = avro_of_spark(
        T.StructType([sch[c] for c in value_cols]), name=f"{name}_value"
    )
    ks, vs = AvroSchema(key_avro), AvroSchema(val_avro)
    ks_json, vs_json = ks.json(), vs.json()

    def fn(batches):
        import pyarrow as pa

        k_s, v_s = AvroSchema(ks_json), AvroSchema(vs_json)
        for batch in batches:
            batch = _arrow_epoch_cast(batch)
            data = {c: batch.column(batch.schema.get_field_index(c)).to_pylist() for c in batch.schema.names}
            n = batch.num_rows
            keys = [
                frame(k_s, {c: data[c][i] for c in key_cols}) for i in range(n)
            ]
            vals = [
                frame(v_s, {c: data[c][i] for c in value_cols}) for i in range(n)
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(keys, pa.binary()), pa.array(vals, pa.binary())],
                names=["key_bytes", "value_bytes"],
            )

    from chronon_spark.udfship import ship_by_value

    ship_by_value(__name__)  # fn references module-level AvroSchema/frame helpers
    out = df.mapInArrow(fn, "key_bytes binary, value_bytes binary")
    return out, KvSchemas(ks_json, vs_json, ks.fingerprint, vs.fingerprint)


def decode_kv_df(
    kv: DataFrame,
    schemas: KvSchemas,
    *,
    reader_key: str | None = None,
    reader_value: str | None = None,
) -> DataFrame:
    """Typed DataFrame back from (key_bytes, value_bytes) frames. Reader
    schemas default to the writers; passing an evolved reader exercises the
    resolution rules (added-with-default fields appear as columns)."""
    import pyarrow as pa

    rk_json = reader_key or schemas.key
    rv_json = reader_value or schemas.value
    rk, rv = AvroSchema(rk_json), AvroSchema(rv_json)
    out_spark = T.StructType(
        list(spark_of_avro(rk.schema, rk.names).fields)
        + list(spark_of_avro(rv.schema, rv.names).fields)
    )

    def arrow_type(s: T.DataType):
        import pyarrow as pa

        if isinstance(s, T.StructType):
            return pa.struct([pa.field(f.name, arrow_type(f.dataType), True) for f in s.fields])
        if isinstance(s, T.ArrayType):
            return pa.list_(arrow_type(s.elementType))
        if isinstance(s, T.MapType):
            return pa.map_(pa.string(), arrow_type(s.valueType))
        return {
            T.BooleanType(): pa.bool_(),
            T.IntegerType(): pa.int32(),
            T.LongType(): pa.int64(),
            T.FloatType(): pa.float32(),
            T.DoubleType(): pa.float64(),
            T.StringType(): pa.string(),
            T.BinaryType(): pa.binary(),
            T.TimestampType(): pa.timestamp("us", tz="UTC"),
            T.DateType(): pa.date32(),
        }[s]

    def to_cells(datum, s: T.DataType):
        """Decoded python datum -> arrow-buildable value (ints feed
        timestamp/date arrays directly; maps become pair lists)."""
        if datum is None:
            return None
        if isinstance(s, T.StructType):
            return {f.name: to_cells(datum.get(f.name), f.dataType) for f in s.fields}
        if isinstance(s, T.ArrayType):
            return [to_cells(v, s.elementType) for v in datum]
        if isinstance(s, T.MapType):
            return [(k, to_cells(v, s.valueType)) for k, v in datum.items()]
        return datum

    kj, vj = schemas.key, schemas.value

    def fn(batches):
        w_k, w_v = AvroSchema(kj), AvroSchema(vj)
        r_k, r_v = AvroSchema(rk_json), AvroSchema(rv_json)
        reg = {w_k.fingerprint: w_k, w_v.fingerprint: w_v}
        fields = [(f.name, f.dataType, arrow_type(f.dataType)) for f in out_spark.fields]
        for batch in batches:
            kb = batch.column(batch.schema.get_field_index("key_bytes")).to_pylist()
            vb = batch.column(batch.schema.get_field_index("value_bytes")).to_pylist()
            rows = []
            for k_raw, v_raw in zip(kb, vb):
                row = dict(unframe(k_raw, reg, reader=r_k))
                row.update(unframe(v_raw, reg, reader=r_v))
                rows.append(row)
            arrays = [
                pa.array([to_cells(r.get(nm), st) for r in rows], type=at)
                for nm, st, at in fields
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=[nm for nm, _s, _a in fields])

    from chronon_spark.udfship import ship_by_value

    ship_by_value(__name__)  # fn references module-level AvroSchema/frame helpers
    return kv.mapInArrow(fn, out_spark)


# ---------------------------------------------------------------------------
# Serving integration: byte-level upload tables + fetch over decoded bytes
# (GroupByUpload writes Avro KV rows; FetcherBase decodes them before the
# lambda merge — this pair is the offline twin of that byte path).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KvUpload:
    collapsed: DataFrame  # (key_bytes, value_bytes)
    tiles: DataFrame  # (key_bytes, value_bytes); key includes (__res_ms, __tile_ms)
    collapsed_schemas: KvSchemas
    tile_schemas: KvSchemas


def upload_kv_bytes(collapsed: DataFrame, tiles: DataFrame, gb) -> KvUpload:
    from chronon_spark.operators.upload import RES, TILE

    kv_c, cs = encode_kv_df(collapsed, list(gb.keys), name=f"{gb.name}_collapsed")
    kv_t, ts = encode_kv_df(tiles, [*gb.keys, RES, TILE], name=f"{gb.name}_tiles")
    return KvUpload(kv_c, kv_t, cs, ts)


def fetch_features_from_kv(
    requests: DataFrame,
    kvu: KvUpload,
    stream_events: DataFrame,
    gb,
    batch_end_ds: str,
    **kwargs,
) -> DataFrame:
    from chronon_spark.operators.upload import fetch_features

    collapsed = decode_kv_df(kvu.collapsed, kvu.collapsed_schemas)
    tiles = decode_kv_df(kvu.tiles, kvu.tile_schemas)
    return fetch_features(requests, collapsed, tiles, stream_events, gb, batch_end_ds, **kwargs)
