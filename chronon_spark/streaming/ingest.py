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

#: The exact column layout the Spark Kafka source emits (kafka-010 connector
#: docs): binary key/value plus per-record provenance. Tests synthesize frames
#: of this shape so every stage downstream of ``format("kafka").load()`` runs
#: for real without a broker.
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


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
    not present in this environment). Either way the frame downstream has a
    fixed shape: the kafka branch emits ``KAFKA_RECORD_SCHEMA``, which tests
    reproduce through the file source so ``decode_kafka_records`` and
    everything after it runs for real."""
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


def decode_kafka_records(
    raw: DataFrame,
    schema: StructType | str,
    keep_meta: bool = False,
    dedupe_on_offset: bool = False,
) -> DataFrame:
    """Decode Kafka-record-shaped rows (``KAFKA_RECORD_SCHEMA``) into typed
    event rows — the full value-decode stage of the reference's streaming
    GroupBy (streaming/GroupBy.scala:37-145; Avro there, JSON here — same
    shape, no schema-registry dependency).

    Operates on ANY DataFrame with the Kafka source's columns, batch or
    streaming, which is how the path is exercised without a broker: the
    only line this function cannot cover is ``format("kafka").load()``
    itself.

    ``keep_meta`` carries (topic, partition, offset, kafka timestamp)
    through as ``_kafka_*`` provenance columns. ``dedupe_on_offset`` drops
    redelivered records by their (topic, partition, offset) identity —
    Kafka is at-least-once; offsets are the idempotency key (batch frames
    only; streaming dedup state needs a watermark, see
    ``dedupe_kafka_stream``).
    """
    if dedupe_on_offset:
        if raw.isStreaming:
            raise ValueError(
                "dedupe_on_offset is batch-only (unbounded dedup state on a "
                "stream); use dedupe_kafka_stream (watermark-bounded) instead"
            )
        raw = raw.dropDuplicates(["topic", "partition", "offset"])
    meta_names = (
        ["_kafka_topic", "_kafka_partition", "_kafka_offset", "_kafka_timestamp"]
        if keep_meta
        else []
    )
    meta_cols = [
        F.col(src).alias(dst)
        for src, dst in zip(["topic", "partition", "offset", "timestamp"], meta_names)
    ]
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("__e"), *meta_cols
    ).select("__e.*", *meta_names)


def dedupe_kafka_stream(decoded: DataFrame, event_time_col: str, delay: str = "10 minutes") -> DataFrame:
    """Offset-identity dedup for a STREAMING Kafka-shaped frame: requires the
    ``_kafka_*`` provenance columns (``keep_meta=True``) and a watermark so
    the dedup state is bounded (dropDuplicatesWithinWatermark)."""
    return decoded.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        ["_kafka_topic", "_kafka_partition", "_kafka_offset"]
    )


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


def dedup_stream_exact(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Streaming corpus dedup — the ingest-side twin of
    operators/dedup.dedup_exact: content-hash the incoming documents and
    drop every later arrival of already-seen content with Spark's built-in
    stateful streaming deduplication. The FIRST arrival of any normalized
    content survives (micro-batch arrival order); replays and cross-batch
    duplicates never reach the sink.

    State shape: one state-store row per DISTINCT content md5. With
    ``within`` (+ ``event_time_col``) the state is bounded by a watermark
    via dropDuplicatesWithinWatermark — duplicates are only suppressed
    inside the late window, the right trade for an endless crawler feed;
    without it state grows with distinct content (true global dedup, the
    batch-equivalent semantics)."""
    from chronon_spark.operators.dedup import normalize_text

    keyed = stream.withColumn("content_md5", F.md5(normalize_text(F.col(text_col))))
    if within is not None:
        if event_time_col is None:
            raise ValueError("within= needs event_time_col for the watermark")
        return keyed.withWatermark(event_time_col, within).dropDuplicatesWithinWatermark(
            ["content_md5"]
        )
    return keyed.dropDuplicates(["content_md5"])
