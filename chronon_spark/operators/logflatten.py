"""Log flattening + online/offline consistency job.

Reference pipeline: the Fetcher logs every served request as (join name,
schema hash, Avro-encoded keys, Avro-encoded feature values, ts);
LogFlattenerJob decodes those payloads against the schema each row was
logged WITH and materializes one flat row per request — one column per
feature, schemas unioned across versions (spark/src/main/scala/ai/chronon/
spark/LogFlattenerJob.scala). ConsistencyJob then joins the flattened
online rows with the offline backfill of the same join and emits
CompareMetrics (spark/src/main/scala/ai/chronon/spark/stats/
ConsistencyJob.scala:33; metric math shared with operators/drift.py).

Spark-first: payloads are JSON (no schema registry dependency — the shape
is identical), the per-version decode is `from_json` with that version's
schema, and cross-version union is `unionByName(allowMissingColumns=True)`
— append-only schema evolution, exactly how the reference accretes newly
logged features into the flat table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOG_COLUMNS = ["join_name", "schema_hash", "ts_ms", "key_json", "value_json"]


def flatten_logs(
    logs: DataFrame,
    schemas: dict[str, tuple[str, str]],
    join_name: str | None = None,
) -> DataFrame:
    """Decode logged request rows into one flat row per request.

    ``schemas`` maps schema_hash -> (key_schema_ddl, value_schema_ddl) — the
    registry the reference keeps in table properties. Rows whose hash is not
    registered are dropped (counted nowhere to hide: use the returned frame's
    lineage vs the raw log count). Versions are decoded separately and
    unioned by name with missing columns null — append-only evolution.
    """
    if join_name is not None:
        logs = logs.where(F.col("join_name") == join_name)
    out: DataFrame | None = None
    for schema_hash, (key_ddl, val_ddl) in sorted(schemas.items()):
        version = (
            logs.where(F.col("schema_hash") == schema_hash)
            .select(
                F.col("ts_ms"),
                F.from_json(F.col("key_json"), key_ddl).alias("__k"),
                F.from_json(F.col("value_json"), val_ddl).alias("__v"),
            )
            .select("ts_ms", "__k.*", "__v.*")
        )
        out = version if out is None else out.unionByName(version, allowMissingColumns=True)
    if out is None:
        raise ValueError("no schemas supplied")
    return out


def log_requests(
    features: DataFrame,
    keys: list[str],
    join_name: str,
    time_column: str = "ts",
) -> tuple[DataFrame, str, tuple[str, str]]:
    """Produce fetcher-style log rows FROM a feature frame (the test/backfill
    harness for the flattener — in production the online fetcher writes
    these). Returns (log rows, schema_hash, (key_ddl, value_ddl))."""
    import hashlib

    from chronon_spark.plans.windows import ts_to_millis

    val_cols = [c for c in features.columns if c not in keys and c != time_column]
    key_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in features.schema.fields if f.name in keys
    )
    val_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in features.schema.fields
        if f.name in val_cols
    )
    schema_hash = hashlib.sha256(f"{key_ddl}|{val_ddl}".encode()).hexdigest()[:8]
    rows = features.select(
        F.lit(join_name).alias("join_name"),
        F.lit(schema_hash).alias("schema_hash"),
        ts_to_millis(features, time_column).alias("ts_ms"),
        F.to_json(F.struct(*keys)).alias("key_json"),
        F.to_json(F.struct(*val_cols)).alias("value_json"),
    )
    return rows, schema_hash, (key_ddl, val_ddl)


def consistency_job(
    flattened: DataFrame,
    offline: DataFrame,
    keys: list[str],
    time_column: str = "ts",
    exact_percentiles: bool = False,
) -> DataFrame:
    """Online/offline consistency: join the flattened online log with the
    offline backfill on (keys, request time) and emit one row of
    CompareMetrics per feature column (null splits, mismatches, smape, diff
    percentiles — reference ConsistencyJob semantics)."""
    from chronon_spark.operators.drift import compare_metrics
    from chronon_spark.plans.windows import ts_to_millis

    off = offline.withColumn("ts_ms", ts_to_millis(offline, time_column)).drop(time_column)
    return compare_metrics(
        off, flattened, [*keys, "ts_ms"], exact_percentiles=exact_percentiles
    )
