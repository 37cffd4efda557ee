"""Streaming ingest driven through a REAL Structured Streaming execution
(file source, availableNow drain): decode -> tiles must equal the batch
tile computation (lambda compatibility), and chained enrichment must equal
the batch join."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.streaming.ingest import (
    decode_json_events,
    enrich_stream,
    read_event_stream,
    run_to_completion,
)
from chronon_spark.streaming.tiles import streaming_tiles

SCHEMA = "user_id long, event_id long, event_type string, value double, ts timestamp"


def _write_jsonl(events, path, n=400):
    rows = events.limit(n).select(
        "user_id", "event_id", "event_type", "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
    ).collect()
    with open(f"{path}/part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")


def test_stream_decode_tiles_equal_batch(spark, events, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(events, str(src))

    gb = GroupBy(
        name="s",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value"), Aggregation(Op.SUM, "value")],
    )
    raw = read_event_stream(
        spark, str(src), schema="value string", source_format="text"
    ).withColumnRenamed("value", "payload")
    decoded = decode_json_events(raw, SCHEMA, payload_col="payload")
    tiles = streaming_tiles(decoded, gb, hop="5 minutes", tiebreak="event_id")
    run_to_completion(tiles, str(tmp_path / "ckpt"), query_name="t_stream")
    got = {
        (r["user_id"], r["tile_start_ms"]): (r["a0__n"], round(r["a1__s"], 6))
        for r in spark.table("t_stream").collect()
    }

    # batch equivalent over the same 400 rows
    batch_in = spark.read.schema(SCHEMA).json(str(src))
    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    exprs = tile_aggregates(gb, "event_id")
    want_df = (
        batch_in.withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window(F.col("ts"), "5 minutes").alias("tile"), "user_id")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select("user_id", F.unix_millis("tile.start").alias("tile_start_ms"), "a0__n", "a1__s")
    )
    want = {
        (r["user_id"], r["tile_start_ms"]): (r["a0__n"], round(r["a1__s"], 6))
        for r in want_df.collect()
    }
    assert got == want and len(got) > 0


def test_chained_stream_enrichment(spark, events, tmp_path):
    """JoinSource chaining: streamed events enriched with a parent feature
    snapshot, then aggregated — equals the batch-side join."""
    src = tmp_path / "src2"
    src.mkdir()
    _write_jsonl(events, str(src), n=300)
    parent = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_lifetime_n"))

    raw = read_event_stream(spark, str(src), schema=SCHEMA, source_format="json")
    enriched = enrich_stream(raw, parent, ["user_id"])
    agg = enriched.groupBy("event_type").agg(
        F.sum("user_lifetime_n").alias("sum_parent_n"), F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_chain")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("t_chain").collect()}

    batch_in = spark.read.schema(SCHEMA).json(str(src))
    want_df = (
        batch_in.join(parent, ["user_id"], "left")
        .groupBy("event_type")
        .agg(F.sum("user_lifetime_n").alias("sum_parent_n"), F.count(F.lit(1)).alias("n"))
    )
    want = {tuple(r) for r in want_df.collect()}
    assert got == want and len(got) > 0


def test_late_event_dropped_then_batch_corrects(spark, events, tmp_path):
    """The lambda correction story (reference: watermark/allowedLateness = 0
    on the stream, FlinkJob/Trigger docs; the nightly batch upload overwrites
    tiles, GroupByUpload.scala:44-105):

    1. on-time events stream into KV tiles (update-mode upserts);
    2. a LATE event (behind the checkpointed watermark) arrives on restart —
       the stream DROPS it (state unchanged);
    3. the batch tile build over the full log overwrites the affected tiles;
       end state == batch-computed tiles over everything.
    """
    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    src = tmp_path / "src3"
    src.mkdir()
    sel = events.select(
        "user_id", "event_id", "event_type", "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        F.col("ts").alias("__t"),
    )
    late = sel.orderBy("__t", "event_id").first()  # earliest event arrives LAST
    # on-time events start a full day later, so the checkpointed watermark is
    # far past the late event's tile when it finally shows up
    on_time = (
        sel.where(F.col("__t") >= F.date_add(F.lit(late["__t"]), 1))
        .orderBy("__t", "event_id")
        .limit(199)
        .collect()
    )
    late = {k: v for k, v in late.asDict().items() if k != "__t"}
    on_time = [{k: v for k, v in r.asDict().items() if k != "__t"} for r in on_time]
    with open(f"{src}/part-0.json", "w") as f:
        for r in on_time:
            f.write(json.dumps(r) + "\n")

    gb = GroupBy(
        name="s",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value"), Aggregation(Op.SUM, "value")],
    )
    store = {}

    def kv_upsert(batch_df, batch_id):
        for r in batch_df.collect():
            store[(r["user_id"], r["tile_start_ms"])] = (r["a0__n"], round(r["a1__s"], 6))

    def drain():
        raw = read_event_stream(spark, str(src), schema=SCHEMA, source_format="json")
        tiles = streaming_tiles(raw, gb, hop="5 minutes", tiebreak="event_id")
        run_to_completion(tiles, str(tmp_path / "ckpt3"), sink=kv_upsert)

    drain()
    after_on_time = dict(store)
    assert len(after_on_time) > 0

    # restart with the checkpointed watermark; the late event is behind it
    with open(f"{src}/part-1.json", "w") as f:
        f.write(json.dumps(late) + "\n")
    drain()
    assert store == after_on_time, "late event must be DROPPED by the stream"

    # nightly batch correction: tiles over the FULL log overwrite the store
    full = spark.read.schema(SCHEMA).json(str(src))
    exprs = tile_aggregates(gb, "event_id")
    batch_tiles = (
        full.withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window(F.col("ts"), "5 minutes").alias("tile"), "user_id")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select("user_id", F.unix_millis("tile.start").alias("tile_start_ms"), "a0__n", "a1__s")
    )
    for r in batch_tiles.collect():
        store[(r["user_id"], r["tile_start_ms"])] = (r["a0__n"], round(r["a1__s"], 6))

    want = {
        (r["user_id"], r["tile_start_ms"]): (r["a0__n"], round(r["a1__s"], 6))
        for r in batch_tiles.collect()
    }
    assert store == want, "post-correction state must equal batch-only"
    # and the correction actually changed the late event's tile
    assert store != after_on_time


def _kafka_shaped(events, n=300, redeliver=5):
    """Project events into the exact frame the Spark Kafka source emits
    (KAFKA_RECORD_SCHEMA): JSON payload as binary `value`, key bytes, and
    (topic, partition, offset, timestamp) provenance — plus `redeliver`
    duplicated records (same offset identity) to model at-least-once
    delivery."""
    base = (
        events.orderBy("event_id")
        .limit(n)
        .select(
            F.col("user_id").cast("string").cast("binary").alias("key"),
            F.to_json(
                F.struct(
                    "user_id", "event_id", "event_type", "value",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
                )
            ).cast("binary").alias("value"),
            F.lit("events").alias("topic"),
            F.pmod(F.col("user_id"), F.lit(4)).cast("int").alias("partition"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("topic", "partition").orderBy("value")
    base = base.withColumn("offset", F.row_number().over(w).cast("long") - 1)
    base = base.withColumn("timestamp", F.current_timestamp()).withColumn(
        "timestampType", F.lit(0)
    )
    dupes = base.orderBy("partition", "offset").limit(redeliver)
    return base.unionByName(dupes)


def test_kafka_record_decode_stream_tiles_equal_batch(spark, events, tmp_path):
    """Drive the FULL Kafka ingest pipeline (record schema -> value decode ->
    tiles) through a real streaming execution by synthesizing the Kafka
    source's exact output frame; only `format("kafka").load()` itself is
    substituted (no broker in the sandbox)."""
    from chronon_spark.streaming.ingest import (
        KAFKA_RECORD_SCHEMA,
        decode_kafka_records,
    )

    src = tmp_path / "ksrc"
    src.mkdir()
    kf = _kafka_shaped(events, n=300, redeliver=0)
    kf.coalesce(1).write.mode("overwrite").parquet(str(src))

    gb = GroupBy(
        name="k",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value"), Aggregation(Op.SUM, "value")],
    )
    raw = read_event_stream(
        spark, str(src), schema=KAFKA_RECORD_SCHEMA, source_format="parquet"
    )
    decoded = decode_kafka_records(raw, SCHEMA)
    assert decoded.isStreaming
    tiles = streaming_tiles(decoded, gb, hop="5 minutes", tiebreak="event_id")
    run_to_completion(tiles, str(tmp_path / "kckpt"), query_name="t_kafka")
    got = {
        (r["user_id"], r["tile_start_ms"]): (r["a0__n"], round(r["a1__s"], 6))
        for r in spark.table("t_kafka").collect()
    }

    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    batch_in = decode_kafka_records(spark.read.parquet(str(src)), SCHEMA)
    exprs = tile_aggregates(gb, "event_id")
    want_df = (
        batch_in.withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window(F.col("ts"), "5 minutes").alias("tile"), "user_id")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select("user_id", F.unix_millis("tile.start").alias("tile_start_ms"), "a0__n", "a1__s")
    )
    want = {
        (r["user_id"], r["tile_start_ms"]): (r["a0__n"], round(r["a1__s"], 6))
        for r in want_df.collect()
    }
    assert got == want and len(got) > 0


def test_kafka_offset_identity_dedup(spark, events, tmp_path):
    """At-least-once redelivery: records with the same (topic, partition,
    offset) collapse to one event — batch path via dedupe_on_offset, stream
    path via dropDuplicatesWithinWatermark — and provenance columns survive
    keep_meta=True."""
    from chronon_spark.streaming.ingest import (
        KAFKA_RECORD_SCHEMA,
        decode_kafka_records,
        dedupe_kafka_stream,
    )

    src = tmp_path / "kdup"
    src.mkdir()
    _kafka_shaped(events, n=200, redeliver=7).coalesce(1).write.mode("overwrite").parquet(str(src))
    raw_batch = spark.read.parquet(str(src))
    assert raw_batch.count() == 207

    ded = decode_kafka_records(raw_batch, SCHEMA, keep_meta=True, dedupe_on_offset=True)
    assert ded.count() == 200
    assert {"_kafka_topic", "_kafka_partition", "_kafka_offset", "_kafka_timestamp"} <= set(
        ded.columns
    )
    # dedup keeps whole-record identity: the surviving 200 decoded events
    # equal the original 200
    got_ids = {r["event_id"] for r in ded.select("event_id").collect()}
    want_ids = {r["event_id"] for r in events.orderBy("event_id").limit(200).collect()}
    assert got_ids == want_ids

    # streaming flavor: watermark-bounded dedup state
    raw = read_event_stream(
        spark, str(src), schema=KAFKA_RECORD_SCHEMA, source_format="parquet"
    )
    decoded = decode_kafka_records(raw, SCHEMA, keep_meta=True)
    decoded = decoded.withColumn("__event_time", F.col("ts").cast("timestamp"))
    deduped = dedupe_kafka_stream(decoded, "__event_time", delay="36500 days")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_kdedup")
        .option("checkpointLocation", str(tmp_path / "kdckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t_kdedup")
    assert out.count() == 200
    assert {r["event_id"] for r in out.select("event_id").collect()} == want_ids


def test_kafka_offset_dedup_rejects_streaming_frame(spark, events, tmp_path):
    """dedupe_on_offset is batch-only (unbounded state on a stream) — the
    guard must fire at build time, not OOM a long-running job."""
    import pytest

    from chronon_spark.streaming.ingest import (
        KAFKA_RECORD_SCHEMA,
        decode_kafka_records,
    )

    src = tmp_path / "kguard"
    src.mkdir()
    _kafka_shaped(events, n=20, redeliver=0).coalesce(1).write.mode("overwrite").parquet(str(src))
    raw = read_event_stream(
        spark, str(src), schema=KAFKA_RECORD_SCHEMA, source_format="parquet"
    )
    with pytest.raises(ValueError, match="batch-only"):
        decode_kafka_records(raw, SCHEMA, dedupe_on_offset=True)


def test_random_config_stream_tiles_equal_batch(spark, tmp_path):
    """Randomized lambda-compatibility sweep: for a random hop-mergeable
    GroupBy over the bursty synthetic stream, a REAL streaming execution's
    tiles must equal the batch tile computation slot-for-slot."""
    import random

    from test_random_differential import (
        SWEEP_OPS,
        _assert_rows_close,
        _freeze,
        _random_events,
    )

    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    rng = random.Random(31)
    ev = _random_events(spark, rng)
    src = tmp_path / "rstream"
    src.mkdir()
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))

    aggs = [
        Aggregation(op, col, k=rng.randint(2, 4) if needs_k else None)
        for op, needs_k, col in rng.sample(SWEEP_OPS, k=4)
    ]
    gb = GroupBy(name="rs", keys=["k"], aggregations=aggs)

    raw = read_event_stream(
        spark, str(src),
        schema="k string, value double, etype string, event_id long, ts timestamp",
        source_format="parquet",
    )
    tiles = streaming_tiles(raw, gb, hop="1 hour", tiebreak="event_id")
    run_to_completion(tiles, str(tmp_path / "rsckpt"), query_name="t_rsweep")
    got_df = spark.table("t_rsweep")

    batch_in = spark.read.parquet(str(src))
    exprs = tile_aggregates(gb, "event_id")
    want_df = (
        batch_in.withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window(F.col("ts"), "1 hour").alias("tile"), "k")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select("k", F.unix_millis("tile.start").alias("tile_start_ms"), *exprs.keys())
    )
    cols = ["k", "tile_start_ms", *exprs.keys()]
    key = lambda r: (str(r[0]), str(r[1]))  # noqa: E731
    got = sorted(
        (tuple(_freeze(v) for v in r) for r in got_df.select(*cols).collect()), key=key
    )
    want = sorted(
        (tuple(_freeze(v) for v in r) for r in want_df.select(*cols).collect()), key=key
    )
    assert len(want) > 0
    _assert_rows_close(got, want, "random stream tiles vs batch")


def test_stream_tiles_support_percentile_kmv(spark, events, tmp_path):
    """The KMV percentile IR is streamable: hop tiles maintained by a real
    streaming run equal the batch tile computation, so a fetcher can
    lambda-merge streamed percentile tiles like any other op."""
    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    src = tmp_path / "pqsrc"
    src.mkdir()
    ev = events.orderBy("event_id").limit(400)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))

    gb = GroupBy(
        name="spq", keys=["user_id"],
        aggregations=[
            Aggregation(Op.APPROX_PERCENTILE, "value",
                        percentiles=(0.5,), accuracy=2**31 - 1)
        ],
    )
    raw = read_event_stream(
        spark, str(src),
        schema="user_id long, event_id long, event_type string, value double, ts timestamp",
        source_format="parquet",
    )
    tiles = streaming_tiles(raw, gb, hop="1 hour", tiebreak="event_id")
    run_to_completion(tiles, str(tmp_path / "pqckpt"), query_name="t_pq")
    got_df = spark.table("t_pq")

    batch_in = spark.read.parquet(str(src))
    exprs = tile_aggregates(gb, "event_id")
    want_df = (
        batch_in.withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window(F.col("ts"), "1 hour").alias("tile"), "user_id")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select("user_id", F.unix_millis("tile.start").alias("tile_start_ms"), *exprs.keys())
    )
    key = ["user_id", "tile_start_ms"]
    got = sorted(str(r) for r in got_df.select(*key, "a0__kmv").collect())
    want = sorted(str(r) for r in want_df.select(*key, "a0__kmv").collect())
    assert got == want and len(got) > 0


def test_stream_tiles_support_time_decayed(spark, events, tmp_path):
    """TIME_DECAYED tiles are plain sum/count partials (the weighting lives
    entirely in the fetch-time merge), so streamed tiles equal the batch
    tile computation and lambda-merge like any other op."""
    from chronon_spark.api import TimeUnit, Window
    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    src = tmp_path / "dksrc"
    src.mkdir()
    ev = events.orderBy("event_id").limit(400)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))

    gb = GroupBy(
        name="sdk", keys=["user_id"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM, "value",
                windows=(Window(7, TimeUnit.DAYS),),
                halflife=Window(1, TimeUnit.DAYS),
            )
        ],
    )
    raw = read_event_stream(
        spark, str(src),
        schema="user_id long, event_id long, event_type string, value double, ts timestamp",
        source_format="parquet",
    )
    tiles = streaming_tiles(raw, gb, hop="1 hour", tiebreak="event_id")
    run_to_completion(tiles, str(tmp_path / "dkckpt"), query_name="t_dk")
    got_df = spark.table("t_dk")

    batch_in = spark.read.parquet(str(src))
    exprs = tile_aggregates(gb, "event_id")
    want_df = (
        batch_in.withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window(F.col("ts"), "1 hour").alias("tile"), "user_id")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select("user_id", F.unix_millis("tile.start").alias("tile_start_ms"), *exprs.keys())
    )
    key = ["user_id", "tile_start_ms"]
    got = sorted(str(r) for r in got_df.select(*key, "a0__s").collect())
    want = sorted(str(r) for r in want_df.select(*key, "a0__s").collect())
    assert got == want and len(got) > 0


def test_stream_tiles_support_moments(spark, events, tmp_path):
    """SKEW/KURTOSIS tile state (central moments recovered from Spark's
    stable aggregates) streams: tiles maintained by a real streaming run
    equal the batch tile computation struct-for-struct."""
    from chronon_spark.api import TimeUnit, Window
    from chronon_spark.plans.windows import to_millis
    from chronon_spark.streaming.tiles import tile_aggregates

    src = tmp_path / "momsrc"
    src.mkdir()
    ev = events.orderBy("event_id").limit(400)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))

    gb = GroupBy(
        name="smo", keys=["user_id"],
        aggregations=[Aggregation(Op.KURTOSIS, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    raw = read_event_stream(
        spark, str(src),
        schema="user_id long, event_id long, event_type string, value double, ts timestamp",
        source_format="parquet",
    )
    tiles = streaming_tiles(raw, gb, hop="1 hour", tiebreak="event_id")
    run_to_completion(tiles, str(tmp_path / "momckpt"), query_name="t_mo")
    got_df = spark.table("t_mo")

    batch_in = spark.read.parquet(str(src))
    exprs = tile_aggregates(gb, "event_id")
    want_df = (
        batch_in.withColumn("__ts_ms", to_millis(F.col("ts")))
        .groupBy(F.window(F.col("ts"), "1 hour").alias("tile"), "user_id")
        .agg(*[c.alias(n) for n, c in exprs.items()])
        .select("user_id", F.unix_millis("tile.start").alias("tile_start_ms"), *exprs.keys())
    )
    key = ["user_id", "tile_start_ms"]
    got = sorted(str(r) for r in got_df.select(*key, "a0__mn").collect())
    want = sorted(str(r) for r in want_df.select(*key, "a0__mn").collect())
    assert got == want and len(got) > 0
