"""Structured Streaming sink committing micro-batches as Iceberg snapshots.

The shape every real Iceberg streaming sink uses (public Iceberg
SparkWrite/StreamingWrite semantics): ``foreachBatch`` appends each
micro-batch as one snapshot commit whose summary carries the streaming
epoch (``spark.query.id`` + batch id). Spark's foreachBatch contract is
at-least-once — after a failure the LAST batch may replay — so the sink is
made effectively exactly-once by an idempotence guard: before committing,
the current table metadata is checked for an already-committed epoch >= the
incoming one for this query, and replays are skipped. The check and the
commit both go through the atomic version-hint pointer, and a single
streaming query commits serially, so the guard cannot race itself.

Reference parity: streaming/GroupBy.scala writes tiles through a KV sink
with the same replayed-offset tolerance (offset-identity dedup); here the
snapshot log IS the offset ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from chronon_spark.sources.iceberg import IcebergTable, append, create_table

_EPOCH_KEY = "streaming-epoch"
_QUERY_KEY = "streaming-query"


def last_committed_epoch(location: str, query_name: str) -> int | None:
    """Highest micro-batch epoch this query has committed to the table —
    read from snapshot summaries (the snapshot log is the offset ledger)."""
    table = IcebergTable(location)
    if not table.exists():
        return None
    best = None
    for s in table.metadata().get("snapshots", []):
        summ = s.get("summary", {})
        if summ.get(_QUERY_KEY) == query_name and _EPOCH_KEY in summ:
            e = int(summ[_EPOCH_KEY])
            best = e if best is None or e > best else best
    return best


def iceberg_sink(location: str, query_name: str, partition_by: list[str] | None = None):
    """Build the ``foreachBatch`` callable: each micro-batch becomes one
    append snapshot stamped with (query, epoch); replayed epochs (the
    at-least-once tail after a restart) are skipped, making the sink
    effectively exactly-once at the table level."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        done = last_committed_epoch(location, query_name)
        if done is not None and epoch_id <= done:
            return  # replayed micro-batch: already a snapshot, skip
        extra = {_QUERY_KEY: query_name, _EPOCH_KEY: str(epoch_id)}
        table = IcebergTable(location)
        if not table.exists():
            from chronon_spark.sources.iceberg import _write_snapshot

            _write_snapshot(
                table, batch, partition_by or [], None, summary_extra=extra
            )
        else:
            md = table.metadata()
            spec = md["partition-specs"][md["default-spec-id"]]
            from chronon_spark.sources.iceberg import _write_snapshot

            _write_snapshot(
                table,
                batch,
                [pf["name"] for pf in spec["fields"]],
                md,
                summary_extra=extra,
            )

    return write_batch


def write_stream_to_iceberg(
    df: DataFrame,
    location: str,
    query_name: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Convenience: append-mode writeStream through the idempotent sink."""
    writer = (
        df.writeStream.outputMode("append")
        .foreachBatch(iceberg_sink(location, query_name, partition_by))
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
