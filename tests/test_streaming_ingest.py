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
