"""Streaming ingest: source -> decode -> tile aggregation -> sink.

Reference pipeline (spark/src/main/scala/ai/chronon/spark/streaming/
GroupBy.scala:37-145 + KafkaStreamBuilder.scala:1-57): read a Kafka topic,
decode the payload into flat event rows via the GroupBy's Query selects,
then either write un-aggregated KV rows or (Flink path, FlinkJob.scala:117-
165) maintain hop-tile IRs. Chained streaming (JoinSourceRunner.scala:62-
495) first enriches the stream with a parent join's features, then runs the
downstream GroupBy.

Structured-Streaming re-expression, source-agnostic:

    read_event_stream(...)          # file source here; kafka = same call
                                    # with format="kafka" + options when the
                                    # connector jars are on the classpath
    decode_json_events(raw, schema) # bytes/str payload -> typed columns
    enrich_stream(stream, features) # JoinSource chaining: stream-static join
    streaming_tiles(...)            # tiles.py — tumbling partial-IR tiles
    run_to_completion(...)          # availableNow drain for tests/backfills

The sandbox has no Kafka broker or connector jars, so tests drive the file
source; every stage downstream of the source is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_event_stream(
    spark: SparkSession,
    path_or_topic: str,
    schema: StructType | str | None = None,
    source_format: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Open a streaming source. ``source_format`` "parquet"/"json"/"text"
    reads a directory as a stream (new files = new micro-batches);
    "kafka" passes ``path_or_topic`` as `subscribe` (needs connector jars —
    not present in this environment, the call shape is the contract)."""
    if source_format == "kafka":
        reader = spark.readStream.format("kafka").option("subscribe", path_or_topic)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return reader.load()
    reader = spark.readStream.format(source_format)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path_or_topic)


def decode_json_events(
    raw: DataFrame, schema: StructType | str, payload_col: str = "value"
) -> DataFrame:
    """Decode a bytes/string JSON payload column into typed event columns —
    the Kafka value-decode step (streaming/GroupBy.scala decode; Avro in the
    reference, JSON here: same shape, no schema-registry dependency)."""
    return raw.select(
        F.from_json(F.col(payload_col).cast("string"), schema).alias("__e")
    ).select("__e.*")


def enrich_stream(
    stream: DataFrame, parent_features: DataFrame, keys: list[str]
) -> DataFrame:
    """JoinSource chaining: enrich each streamed event with a parent join's
    (static, batch-computed) feature snapshot via a stream-static left join
    (reference JoinSourceRunner's per-batch fetchJoin enrichment)."""
    return stream.join(F.broadcast(parent_features), keys, "left")


def run_to_completion(
    tiles: DataFrame, checkpoint_dir: str, sink=None, query_name: str = "chronon_tiles"
):
    """Drain everything currently in the source with an availableNow
    trigger. With no ``sink`` the tiles land in an in-memory table named
    ``query_name`` (complete mode); with a sink callable, foreachBatch
    (update mode) — the KV-upsert shape. Blocks until drained."""
    if sink is None:
        q = (
            tiles.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            tiles.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return q
