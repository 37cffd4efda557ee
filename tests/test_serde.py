"""Byte-level KV codec: Avro binary encoding from the public spec.

Covers the wire format (zigzag varints, block coding, unions, framing),
Parsing Canonical Form + CRC-64-AVRO fingerprints, writer->reader schema
resolution, the Arrow-batched DataFrame bridges, and the serving
differential: fetch over encoded->decoded KV bytes must be value-identical
to fetch over the typed IR frames (reference AvroCodec / AvroConversions /
KvRdd.toAvroDf byte contract)."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark import serde
from chronon_spark.serde import (
    AvroSchema,
    avro_of_spark,
    canonical_form,
    decode,
    decode_kv_df,
    encode,
    encode_kv_df,
    fetch_features_from_kv,
    frame,
    rabin64,
    spark_of_avro,
    unframe,
    upload_kv_bytes,
)

# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n",
    [0, -1, 1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**62), 2**63 - 1, -(2**63)],
)
def test_zigzag_varint_roundtrip(n):
    out = bytearray()
    serde._write_long(out, n)
    got, pos = serde._read_long(bytes(out), 0)
    assert got == n and pos == len(out)


def test_known_varint_bytes():
    # spec examples: 0 -> 00, -1 -> 01, 1 -> 02, -2 -> 03, 2 -> 04, -64 -> 7f, 64 -> 80 01
    for n, expect in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                      (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        out = bytearray()
        serde._write_long(out, n)
        assert bytes(out) == expect, n


def test_rabin_empty_is_polynomial_constant():
    # CRC-64-AVRO of the empty message is the polynomial seed itself
    assert rabin64(b"") == 0xC15D213AA4D7A795
    assert rabin64(b"a") != rabin64(b"b")


def test_canonical_form_normalizes():
    a = AvroSchema(
        """{"type":"record","namespace":"x.y","name":"R","doc":"hi","fields":[
            {"name":"f","type":{"type":"long","logicalType":"timestamp-micros"},"doc":"t"},
            {"name":"g","type":["null","string"],"default":null}]}"""
    )
    b = AvroSchema(
        {
            "name": "x.y.R",
            "type": "record",
            "aliases": ["Old"],
            "fields": [
                {"name": "f", "type": "long"},
                {"name": "g", "type": ["null", "string"]},
            ],
        }
    )
    assert a.canonical == b.canonical
    assert a.fingerprint == b.fingerprint
    c = AvroSchema({"name": "x.y.R2", "type": "record", "fields": b.schema["fields"]})
    assert c.fingerprint != a.fingerprint


def test_primitive_canonical_form():
    assert canonical_form("long") == '"long"'
    assert canonical_form({"type": "string"}) == '"string"'
    assert canonical_form(["null", "int"]) == '["null","int"]'


# ---------------------------------------------------------------------------
# encode/decode identity — fixed rich schema + randomized schema+datum pairs
# ---------------------------------------------------------------------------

RICH = AvroSchema(
    {
        "type": "record",
        "name": "Rich",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "opt", "type": ["null", "double"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": ["null", "long"]}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {
                "name": "nest",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "Inner",
                        "fields": [
                            {"name": "t", "type": "long"},
                            {"name": "v", "type": ["null", "string"]},
                        ],
                    },
                ],
            },
            {"name": "inners", "type": {"type": "array", "items": "Inner"}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 3}},
        ],
    }
)

RICH_DATUM = {
    "b": True,
    "i": -(2**31),
    "l": 2**63 - 1,
    "f": 1.5,
    "d": -2.25e300,
    "s": "héllo ☃",
    "by": b"\x00\xff",
    "opt": None,
    "arr": [1, None, -(2**62)],
    "m": {"x": 1, "": -1},
    "nest": {"t": 42, "v": None},
    "inners": [{"t": 1, "v": "a"}, {"t": 2, "v": None}],
    "e": "B",
    "fx": b"abc",
}


def test_rich_roundtrip():
    assert decode(RICH, encode(RICH, RICH_DATUM)) == RICH_DATUM


def test_nan_roundtrip():
    s = AvroSchema({"type": "record", "name": "N", "fields": [{"name": "d", "type": "double"}]})
    got = decode(s, encode(s, {"d": float("nan")}))
    assert got["d"] != got["d"]


def test_trailing_bytes_rejected():
    s = AvroSchema({"type": "record", "name": "X", "fields": [{"name": "i", "type": "int"}]})
    with pytest.raises(ValueError, match="trailing"):
        decode(s, encode(s, {"i": 1}) + b"\x00")


def test_negative_block_count_decodes():
    # writers MAY emit a negative block count followed by the byte size;
    # hand-craft one for array<long> [7, 8] and map {"k": 9}
    arr = AvroSchema({"type": "array", "items": "long"})
    body = bytearray()
    serde._write_long(body, -2)
    items = bytearray()
    serde._write_long(items, 7)
    serde._write_long(items, 8)
    serde._write_long(body, len(items))
    body += items
    serde._write_long(body, 0)
    assert decode(arr, bytes(body)) == [7, 8]
    mp = AvroSchema({"type": "map", "values": "long"})
    body = bytearray()
    serde._write_long(body, -1)
    kv = bytearray()
    serde._encode("string", {}, "k", kv)
    serde._write_long(kv, 9)
    serde._write_long(body, len(kv))
    body += kv
    serde._write_long(body, 0)
    assert decode(mp, bytes(body)) == {"k": 9}


# randomized: generate (schema, datum) together, assert identity

_PRIM = {
    "null": st.none(),
    "boolean": st.booleans(),
    "int": st.integers(-(2**31), 2**31 - 1),
    "long": st.integers(-(2**63), 2**63 - 1),
    "float": st.floats(allow_nan=False, width=32),
    "double": st.floats(allow_nan=False),
    "string": st.text(max_size=12),
    "bytes": st.binary(max_size=12),
}


def _datum_for(schema):
    t = serde._type_of(schema)
    if t == "union":
        return st.one_of(*[_datum_for(s) for s in schema])
    if t in _PRIM:
        return _PRIM[t]
    if t == "record":
        return st.fixed_dictionaries({f["name"]: _datum_for(f["type"]) for f in schema["fields"]})
    if t == "array":
        return st.lists(_datum_for(schema["items"]), max_size=4)
    if t == "map":
        return st.dictionaries(st.text(max_size=6), _datum_for(schema["values"]), max_size=4)
    raise AssertionError(t)


@st.composite
def _schema_and_datum(draw):
    counter = [0]

    def sub(depth):
        choices = list(_PRIM)
        if depth > 0:
            choices += ["record", "array", "map", "optional"]
        t = draw(st.sampled_from(choices))
        if t in _PRIM:
            return t
        if t == "optional":
            x = sub(depth - 1)
            # unions may not immediately contain unions (spec); flatten
            if isinstance(x, list):
                return x if "null" in x else ["null", *x]
            return ["null", x] if x != "null" else "null"
        if t == "array":
            return {"type": "array", "items": sub(depth - 1)}
        if t == "map":
            return {"type": "map", "values": sub(depth - 1)}
        counter[0] += 1
        nf = draw(st.integers(1, 3))
        return {
            "type": "record",
            "name": f"R{counter[0]}",
            "fields": [{"name": f"f{i}", "type": sub(depth - 1)} for i in range(nf)],
        }

    schema = {
        "type": "record",
        "name": "Top",
        "fields": [{"name": f"c{i}", "type": sub(2)} for i in range(draw(st.integers(1, 4)))],
    }
    datum = draw(_datum_for(schema))
    return schema, datum


@settings(max_examples=60, deadline=None)
@given(_schema_and_datum())
def test_random_schema_roundtrip(sd):
    schema, datum = sd
    s = AvroSchema(schema)
    assert decode(s, encode(s, datum)) == datum


@settings(max_examples=30, deadline=None)
@given(_schema_and_datum(), st.integers(0, 5))
def test_random_schema_ocf_roundtrip(tmp_path_factory, sd, n_extra):
    """The container-file framing (write_ocf/read_ocf — what Iceberg
    manifests ride) round-trips the same randomized schema space, multiple
    records per block."""
    import os
    import uuid

    from chronon_spark.serde import read_ocf, write_ocf

    schema, datum = sd
    s = AvroSchema(schema)
    recs = [datum] * (1 + n_extra)
    p = os.path.join(str(tmp_path_factory.mktemp("ocf")), f"{uuid.uuid4().hex}.avro")
    write_ocf(p, s, recs, metadata={"k": b"v"})
    out, meta = read_ocf(p)
    assert out == recs and meta["k"] == b"v"


# ---------------------------------------------------------------------------
# schema resolution (writer -> reader)
# ---------------------------------------------------------------------------


def _rec(name, *fields):
    return AvroSchema({"type": "record", "name": name, "fields": list(fields)})


def test_resolution_reorder_promote_default_skip():
    writer = _rec(
        "W",
        {"name": "a", "type": "int"},
        {"name": "gone", "type": {"type": "array", "items": "string"}},
        {"name": "b", "type": "string"},
    )
    reader = _rec(
        "W",
        {"name": "b", "type": "string"},
        {"name": "a", "type": "long"},  # int -> long promotion
        {"name": "c", "type": "double", "default": 1.5},  # reader-only w/ default
        {"name": "d", "type": ["null", "string"]},  # nullable, no default -> None
    )
    raw = encode(writer, {"a": 7, "gone": ["x", "y"], "b": "keep"})
    assert decode(writer, raw, reader=reader) == {"a": 7, "b": "keep", "c": 1.5, "d": None}


def test_resolution_missing_default_raises():
    writer = _rec("W", {"name": "a", "type": "int"})
    reader = _rec("W", {"name": "a", "type": "int"}, {"name": "zz", "type": "double"})
    with pytest.raises(TypeError, match="no default"):
        decode(writer, encode(writer, {"a": 1}), reader=reader)


def test_resolution_string_bytes_and_union():
    writer = _rec("W", {"name": "s", "type": "string"}, {"name": "u", "type": ["null", "int"]})
    reader = _rec("W", {"name": "s", "type": "bytes"}, {"name": "u", "type": ["null", "long", "string"]})
    got = decode(writer, encode(writer, {"s": "hi", "u": 3}), reader=reader)
    assert got == {"s": b"hi", "u": 3}


def test_resolution_incompatible_raises():
    writer = _rec("W", {"name": "a", "type": "string"})
    reader = _rec("W", {"name": "a", "type": "long"})
    with pytest.raises(TypeError):
        decode(writer, encode(writer, {"a": "x"}), reader=reader)


def test_default_record_and_bytes():
    inner = {
        "type": "record",
        "name": "I",
        "fields": [{"name": "x", "type": "long", "default": 4}],
    }
    writer = _rec("W", {"name": "a", "type": "int"})
    reader = _rec(
        "W",
        {"name": "a", "type": "int"},
        {"name": "r", "type": inner, "default": {}},
        {"name": "raw", "type": "bytes", "default": "ÿ"},
    )
    got = decode(writer, encode(writer, {"a": 1}), reader=reader)
    assert got == {"a": 1, "r": {"x": 4}, "raw": b"\xff"}


# ---------------------------------------------------------------------------
# single-object framing
# ---------------------------------------------------------------------------


def test_frame_unframe_registry():
    s = _rec("F", {"name": "v", "type": "long"})
    data = frame(s, {"v": 9})
    assert data[:2] == b"\xc3\x01"
    assert struct.unpack_from("<Q", data, 2)[0] == s.fingerprint
    assert unframe(data, {s.fingerprint: s}) == {"v": 9}
    with pytest.raises(KeyError, match="registry"):
        unframe(data, {})
    with pytest.raises(ValueError, match="marker"):
        unframe(b"\x00\x01" + data[2:], {s.fingerprint: s})


# ---------------------------------------------------------------------------
# Spark schema bridge + DataFrame round trip
# ---------------------------------------------------------------------------

ALL_TYPES = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("bo", T.BooleanType(), True),
        T.StructField("i", T.IntegerType(), True),
        T.StructField("l", T.LongType(), True),
        T.StructField("fl", T.FloatType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("bin", T.BinaryType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("dt", T.DateType(), True),
        T.StructField("arr", T.ArrayType(T.LongType(), True), True),
        T.StructField(
            "arrst",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("t", T.LongType(), True),
                        T.StructField("v", T.StringType(), True),
                    ]
                ),
                True,
            ),
            True,
        ),
        T.StructField("m", T.MapType(T.StringType(), T.LongType(), True), True),
        T.StructField(
            "st",
            T.StructType(
                [
                    T.StructField("x", T.DoubleType(), True),
                    T.StructField("y", T.ArrayType(T.IntegerType(), True), True),
                ]
            ),
            True,
        ),
    ]
)

ROWS = [
    (
        1, True, -5, 2**40, 1.5, 2.25, "a", b"\x01", dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
        dt.date(2024, 3, 1), [1, None, 3], [Row(t=1, v="x"), Row(t=None, v=None)],
        {"a": 1, "b": None}, Row(x=3.5, y=[1, 2]),
    ),
    (2, None, None, None, None, None, None, None, None, None, None, None, None, None),
    (
        3, False, 0, -1, -0.5, float("inf"), "", b"", dt.datetime(1969, 12, 31, 23, 59, 59),
        dt.date(1969, 12, 31), [], [], {}, Row(x=None, y=None),
    ),
]


def _norm(v):
    if isinstance(v, float):
        return round(v, 9) if v == v else "nan"
    if isinstance(v, Row):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _collect(df):
    cols = sorted(df.columns)
    return sorted((tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr)


def test_spark_schema_bridge_roundtrip():
    avro = avro_of_spark(ALL_TYPES, name="all")
    back = spark_of_avro(AvroSchema(avro).schema)
    # value-level typing preserved (nullability of inner fields normalizes to
    # the avro union view, which is what the decode path produces)
    assert [f.dataType.simpleString() for f in back.fields] == [
        f.dataType.simpleString() for f in ALL_TYPES.fields
    ]


def test_kv_df_roundtrip_all_types(spark):
    df = spark.createDataFrame(ROWS, ALL_TYPES)
    kv, schemas = encode_kv_df(df, ["k"], name="allt")
    kvc = kv.cache()
    try:
        assert kvc.count() == 3
        back = decode_kv_df(kvc, schemas)
        assert _collect(back) == _collect(df)
    finally:
        kvc.unpersist()


def test_kv_df_evolution_added_column(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "k long, v double")
    kv, schemas = encode_kv_df(df, ["k"], name="evo")
    import json

    v2 = json.loads(schemas.value)
    v2["fields"].append({"name": "w", "type": ["null", "long"], "default": None})
    v2["fields"].append({"name": "tag", "type": "string", "default": "new"})
    back = decode_kv_df(kv, schemas, reader_value=json.dumps(v2))
    got = {r["k"]: (r["v"], r["w"], r["tag"]) for r in back.collect()}
    assert got == {1: (2.0, None, "new"), 2: (3.0, None, "new")}


def test_kv_df_rejects_unregistered_writer(spark):
    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    kv, schemas = encode_kv_df(df, ["k"], name="bad")
    other = encode_kv_df(spark.createDataFrame([(1, "x")], "k long, s string"), ["k"], name="bad2")[1]
    wrong = serde.KvSchemas(other.key, other.value, other.key_fingerprint, other.value_fingerprint)
    with pytest.raises(Exception, match="registry|fingerprint"):
        decode_kv_df(kv, wrong).collect()


# ---------------------------------------------------------------------------
# serving differential: byte path == typed path (== offline engine, which
# the typed path's own suite already gates against temporal_events)
# ---------------------------------------------------------------------------


def test_fetch_over_kv_bytes_equals_typed_fetch(spark, events):
    from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
    from chronon_spark.operators.upload import fetch_features, upload_batch_irs

    W7D, W1D = Window(7, TimeUnit.DAYS), Window(1, TimeUnit.DAYS)
    gb = GroupBy(
        name="kv_serve",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value", windows=(W7D, W1D)),
            Aggregation(Op.SUM, "value", windows=(W1D,)),
            Aggregation(Op.LAST_K, "event_type", k=3, windows=(W1D,)),
            Aggregation(Op.AVERAGE, "value"),  # lifetime
            Aggregation(Op.APPROX_UNIQUE_COUNT, "event_type", windows=(W7D,)),  # HLL bytes
            # TIME_DECAYED: the halflife-bucket map IR (map<string,long/double>)
            # must survive the Avro byte codec and fetch identically
            Aggregation(
                Op.TIME_DECAYED_COUNT,
                "value",
                windows=(W7D,),
                halflife=Window(1, TimeUnit.DAYS),
            ),
        ],
    )
    days = [
        r["d"]
        for r in events.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct().orderBy("d").collect()
    ]
    batch_end_ds, serve_day = days[7], days[8]
    d = F.date_format("ts", "yyyy-MM-dd")
    batch = events.where(d <= batch_end_ds)
    stream = events.where(d == serve_day)
    requests = (
        events.where((d == serve_day) & (F.col("event_type") == "purchase"))
        .select("user_id", "ts").distinct().limit(40)
    )

    collapsed, tiles = upload_batch_irs(batch, gb, batch_end_ds, tiebreak="event_id")
    kvu = upload_kv_bytes(collapsed, tiles, gb)

    # 1) the decoded frames are value-identical to the typed IR frames
    assert _collect(decode_kv_df(kvu.collapsed, kvu.collapsed_schemas)) == _collect(collapsed)
    assert _collect(decode_kv_df(kvu.tiles, kvu.tile_schemas)) == _collect(tiles)

    # 2) fetch over the byte path == fetch over the typed path
    typed = fetch_features(requests, collapsed, tiles, stream, gb, batch_end_ds, tiebreak="event_id")
    byted = fetch_features_from_kv(requests, kvu, stream, gb, batch_end_ds, tiebreak="event_id")
    assert _collect(byted) == _collect(typed)


def test_streaming_tile_bytes_contract(spark, events):
    """The reference serializes streaming tile IRs as Avro bytes (its
    TileCodec); here the tile IR rows — (keys, tile_start, partial IR
    slots incl. array<struct> LAST_K state) — ride the byte codec keyed by
    (keys, tile_start_ms) and decode bit-identically. Streamed == batch
    tile equality is separately gated in tests/test_streaming_ingest.py,
    so encoding the batch-shaped frame covers the streamed one."""
    from chronon_spark.api import Aggregation, GroupBy, Op
    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    gb = GroupBy(
        name="tc",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value"),
            Aggregation(Op.SUM, "value"),
            Aggregation(Op.LAST_K, "event_type", k=2),
        ],
    )
    exprs = tile_aggregates(gb, "event_id")
    tiles = (
        events.limit(800)
        .withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window("ts", "5 minutes").alias("tile"), "user_id")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select(
            "user_id", F.unix_millis("tile.start").alias("tile_start_ms"), *exprs.keys()
        )
    )
    kv, schemas = encode_kv_df(tiles, ["user_id", "tile_start_ms"], name="tile")
    assert _collect(decode_kv_df(kv, schemas)) == _collect(tiles)


def test_kv_event_rows_bytes_roundtrip(spark, events):
    """Un-aggregated KV event writes as Avro bytes (streaming/GroupBy.scala:
    150-198 through AvroCodec): decoded rows == the typed rows, and
    aggregating the decoded rows == aggregating the originals."""
    from chronon_spark.api import Aggregation, GroupBy, Op
    from chronon_spark.operators.upload import kv_event_rows_bytes

    gb = GroupBy(
        name="kvev",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "value"), Aggregation(Op.COUNT, "event_type")],
    )
    kv, schemas, flat = kv_event_rows_bytes(events.limit(500), gb, tiebreak="event_id")
    back = decode_kv_df(kv, schemas)
    assert _collect(back) == _collect(flat)
    agg = lambda df: df.groupBy("user_id").agg(  # noqa: E731
        F.sum("value").alias("s"), F.count("event_type").alias("n")
    )
    assert _collect(agg(back)) == _collect(agg(flat))
