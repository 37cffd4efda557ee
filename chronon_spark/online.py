"""Online-serving support layer: caches + metrics + a caching Fetcher.

The reference keeps a serving-side support stack the offline engine never
touches: a function-backed TTL cache with a fast post-exception refresh
interval (online/src/main/scala/ai/chronon/online/TTLCache.scala:29-95), a
named bounded LRU cache (LRUCache.scala:19-40), a batch-IR cache keyed
(dataset, keys, batchEndTsMillis) that spares the KV store repeated decode
work (FetcherCache.scala:26-113), and tagged counters/gauges/distributions
(Metrics.scala Context). This module is the Spark-first analog: the "KV
rows" here are the uploaded IR FRAMES (group-by-upload's collapsed + tail
tables), so the batch-IR cache holds verified, persisted DataFrames keyed by
(GroupBy name, semantic hash, batch_end_ds) — one read + one lineage check
per definition per batch day, however many fetch calls a long-lived serving
session makes. Caches are in-process (one serving JVM/driver), deliberately:
cross-process sharing is the KV store's job, not the cache's.
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# generic caches
# ---------------------------------------------------------------------------


class LRUCache:
    """Named, bounded, thread-safe LRU (reference LRUCache.scala: a named
    Caffeine cache with maximumSize). ``get_or_load`` is the single-flight
    read path; hit/miss counts feed Metrics via the owner."""

    def __init__(self, name: str, maximum_size: int = 10_000):
        if maximum_size < 1:
            raise ValueError(f"maximum_size must be >= 1; got {maximum_size}")
        self.name = name
        self.maximum_size = maximum_size
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0
        self.evictions = 0
        self._on_evict = None

    def get(self, key):
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                self.hits += 1
                return self._d[key]
            self.misses += 1
            return None

    def put(self, key, value) -> None:
        with self._lock:
            self._d[key] = value
            self._d.move_to_end(key)
            while len(self._d) > self.maximum_size:
                _k, old = self._d.popitem(last=False)
                self.evictions += 1
                if self._on_evict is not None:
                    self._on_evict(_k, old)

    def get_or_load(self, key, loader):
        hit = self.get(key)
        if hit is not None:
            return hit, True
        value = loader()
        self.put(key, value)
        return value, False

    def __len__(self) -> int:
        with self._lock:
            return len(self._d)


@dataclass
class _TTLEntry:
    value: object
    updated_ms: int
    is_error: bool = False


class TTLCache:
    """Function-backed cache with per-entry TTL and a SHORT refresh interval
    for post-failure retries (reference TTLCache.scala:29-95: ``apply`` uses
    the long TTL; a load that raised is retried after refresh_interval_ms
    instead of being pinned for the full TTL; ``refresh`` forces the short
    interval). ``now`` is injectable so tests control the clock."""

    def __init__(
        self,
        fn,
        ttl_ms: int = 2 * 60 * 60 * 1000,
        refresh_interval_ms: int = 8 * 1000,
        now=None,
    ):
        self._fn = fn
        self.ttl_ms = ttl_ms
        self.refresh_interval_ms = refresh_interval_ms
        self._now = now or (lambda: int(time.time() * 1000))
        self._d: dict = {}
        self._lock = threading.Lock()
        self.loads = 0

    def _get(self, key, interval_ms: int):
        with self._lock:
            e = self._d.get(key)
            now = self._now()
            # a cached FAILURE expires on the short interval regardless of
            # which read path hits it — the reference's "refresh after an
            # exception" behavior without requiring callers to know
            if e is not None and e.is_error:
                interval_ms = min(interval_ms, self.refresh_interval_ms)
            if e is not None and now - e.updated_ms < interval_ms:
                if e.is_error:
                    raise e.value
                return e.value
            self.loads += 1
            try:
                value = self._fn(key)
            except Exception as exc:
                self._d[key] = _TTLEntry(exc, now, is_error=True)
                raise
            self._d[key] = _TTLEntry(value, now)
            return value

    def __call__(self, key):
        return self._get(key, self.ttl_ms)

    def refresh(self, key):
        return self._get(key, self.refresh_interval_ms)

    def invalidate(self, key) -> None:
        with self._lock:
            self._d.pop(key, None)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Context:
    """Metric tag context (reference Metrics.scala Context: environment +
    entity tags prefixed onto every stat)."""

    environment: str
    group_by: str | None = None
    join: str | None = None
    extra: tuple = ()

    def tags(self) -> tuple:
        t = [("environment", self.environment)]
        if self.group_by:
            t.append(("group_by", self.group_by))
        if self.join:
            t.append(("join", self.join))
        t.extend(self.extra)
        return tuple(t)


@dataclass
class _Dist:
    n: int = 0
    total: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")


class Metrics:
    """In-process tagged stats registry (reference Metrics.scala emits to
    statsd; offline there is no daemon, so this keeps the same shape —
    increment/count/gauge/distribution under (metric, tags) — and exposes
    ``snapshot()`` for export/assertion)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict = {}
        self._gauges: dict = {}
        self._dists: dict[tuple, _Dist] = {}

    def increment(self, ctx: Context, metric: str, value: float = 1.0) -> None:
        k = (metric, ctx.tags())
        with self._lock:
            self._counters[k] = self._counters.get(k, 0) + value

    count = increment

    def increment_exception(self, ctx: Context, exc: BaseException) -> None:
        self.increment(ctx, f"exception.{type(exc).__name__}")

    def gauge(self, ctx: Context, metric: str, value: float) -> None:
        with self._lock:
            self._gauges[(metric, ctx.tags())] = value

    def distribution(self, ctx: Context, metric: str, value: float) -> None:
        k = (metric, ctx.tags())
        with self._lock:
            d = self._dists.setdefault(k, _Dist())
            d.n += 1
            d.total += value
            d.min = min(d.min, value)
            d.max = max(d.max, value)

    def counter(self, ctx: Context, metric: str) -> float:
        return self._counters.get((metric, ctx.tags()), 0)

    def snapshot(self) -> dict:
        def render(d):
            return {f"{m}{dict(t)}": v for (m, t), v in d.items()}

        with self._lock:
            return {
                "counters": render(self._counters),
                "gauges": render(self._gauges),
                "distributions": {
                    f"{m}{dict(t)}": {"n": d.n, "sum": d.total, "min": d.min, "max": d.max}
                    for (m, t), d in self._dists.items()
                },
            }


# ---------------------------------------------------------------------------
# caching fetcher
# ---------------------------------------------------------------------------


class StaleUploadError(RuntimeError):
    """Uploaded IRs were computed under a different GroupBy definition —
    lambda-merging them with a fresh stream would silently serve wrong
    features (the same guarantee cmd_fetch enforces via STALE_UPLOAD)."""


class Fetcher:
    """Serving-session fetch front-end over group-by-upload's IR tables
    (reference Fetcher + FetcherCache): reads ``{gb}_upload_collapsed`` /
    ``{gb}_upload_tail`` under ``upload_root``, verifies the upload lineage
    hash ONCE, persists the verified frames, and reuses them for every
    subsequent fetch of that (definition, batch day) — the batch-IR cache,
    with frames in the role of decoded KV bytes. Metrics record requests,
    cache hits/misses, and staleness rejections."""

    def __init__(
        self,
        spark: SparkSession,
        upload_root: str,
        batch_ir_cache_size: int = 128,
        metrics: Metrics | None = None,
    ):
        self.spark = spark
        self.upload_root = upload_root
        self.metrics = metrics or Metrics()
        self._ir_cache = LRUCache("batch_ir", batch_ir_cache_size)
        # evicted frames release their executor memory immediately instead
        # of waiting for GC of the python wrapper
        self._ir_cache._on_evict = lambda _k, frames: [
            f.unpersist() for f in frames
        ]

    def _load_batch_frames(self, gb, batch_end_ds: str) -> tuple[DataFrame, DataFrame]:
        from pyspark.sql import functions as F

        from chronon_spark.sources.tableio import resolve_table

        frames = []
        for suffix in ("upload_collapsed", "upload_tail"):
            t = resolve_table(self.spark, self.upload_root, f"{gb.name}_{suffix}")
            lin = (t.lineage(batch_end_ds) or {}).get("semantic_hash")
            if lin != gb.semantic_hash():
                ctx = Context("group_by.fetching", group_by=gb.name)
                self.metrics.increment(ctx, "fetch.stale_upload")
                raise StaleUploadError(
                    f"{gb.name}_{suffix}@{batch_end_ds}: uploaded hash {lin} "
                    f"!= current definition {gb.semantic_hash()} — re-run "
                    "group-by-upload"
                )
            frames.append(
                t.read(self.spark).where(F.col("ds") == batch_end_ds).drop("ds").persist()
            )
        return tuple(frames)

    def batch_frames(self, gb, batch_end_ds: str) -> tuple[DataFrame, DataFrame]:
        key = (gb.name, gb.semantic_hash(), batch_end_ds)
        ctx = Context("group_by.fetching", group_by=gb.name)
        frames, was_hit = self._ir_cache.get_or_load(
            key, lambda: self._load_batch_frames(gb, batch_end_ds)
        )
        self.metrics.increment(ctx, "cache.hit" if was_hit else "cache.miss")
        return frames

    def fetch_features(
        self,
        requests: DataFrame,
        stream: DataFrame,
        gb,
        batch_end_ds: str,
        **kwargs,
    ) -> DataFrame:
        from chronon_spark.operators.upload import fetch_features

        ctx = Context("group_by.fetching", group_by=gb.name)
        self.metrics.increment(ctx, "fetch.requests")
        t0 = time.time()
        try:
            collapsed, tail = self.batch_frames(gb, batch_end_ds)
            out = fetch_features(
                requests, collapsed, tail, stream, gb, batch_end_ds, **kwargs
            )
        except Exception as exc:
            self.metrics.increment_exception(ctx, exc)
            raise
        self.metrics.distribution(ctx, "fetch.plan_ms", (time.time() - t0) * 1000)
        return out

    def fetch_join(
        self,
        requests: DataFrame,
        streams: dict[str, DataFrame],
        join,
        batch_end_ds: str,
        external_registry: "ExternalSourceRegistry | None" = None,
        **kwargs,
    ) -> DataFrame:
        """Join-level fetch over cached part IRs (aggregating parts only —
        selection parts have no upload-table convention; serve those through
        operators.upload.fetch_join with an explicit snapshot frame).

        With an ``external_registry``, the join's external_parts are fetched
        from their registered handlers and merged into the feature frame
        (reference Fetcher.fetchJoin combining fetchGroupBys with
        fetchExternal); without one, external parts are skipped — the
        offline-padding contract applies only to backfills."""
        from chronon_spark.operators.upload import fetch_join

        ctx = Context("join.fetching", join=join.name)
        self.metrics.increment(ctx, "fetch.requests")
        batch = {}
        for part in join.join_parts:
            gb = part.group_by
            if gb.aggregations is None:
                raise ValueError(
                    f"selection part '{gb.name}' has no uploaded IR tables; "
                    "use operators.upload.fetch_join with a snapshot frame"
                )
            batch[gb.name] = self.batch_frames(gb, batch_end_ds)
        try:
            out = fetch_join(
                requests, batch, streams, join, batch_end_ds, **kwargs
            )
            if external_registry is not None and join.external_parts:
                # serving degrades gracefully: a failing external source
                # surfaces as an ext_{name}_exception value, the rest of the
                # feature vector still serves (reference fetchJoin behavior)
                out = external_registry.enrich(
                    out, join.external_parts, graceful=True
                )
            return out
        except Exception as exc:
            self.metrics.increment_exception(ctx, exc)
            raise


# ---------------------------------------------------------------------------
# external source registry (fetch-time feature services)
# ---------------------------------------------------------------------------


class ExternalSourceHandler:
    """Fetch-time feature service (reference ExternalSourceHandler /
    ExternalSourceRegistry.scala:29-50). The reference hands a handler a
    batch of row requests; the Spark-first analog hands it ONE DataFrame of
    distinct key rows (columns = the source's key fields) and expects back a
    DataFrame carrying those key columns plus the source's value fields —
    the request "batch" is the frame, so a handler backed by a table, a dim
    join, or an mapInPandas RPC adapter all stay distributed."""

    def fetch(self, spark: SparkSession, keys: DataFrame) -> DataFrame:
        raise NotImplementedError


class _ContextualHandler(ExternalSourceHandler):
    """Echoes request keys back as values (reference ContextualHandler,
    ExternalSourceRegistry.scala:30-36): left request columns pass through
    as features."""

    def fetch(self, spark: SparkSession, keys: DataFrame) -> DataFrame:
        return keys


class ExternalSourceRegistry:
    """Named handler registry consulted at fetch time for a Join's
    external_parts (reference ExternalSourceRegistry.scala). Implements the
    validation the reference leaves as a TODO (keys match, missing/extra
    value fields, schema integrity): a handler frame missing a declared key
    or value field raises; extra columns are dropped; declared value types
    are enforced with casts. Requests whose keys the handler returned no row
    for carry typed-null values — exactly the offline padding contract
    (operators/bootstrap.pad_external_parts), so online and backfilled
    feature frames stay schema- and semantics-aligned."""

    def __init__(self, metrics: Metrics | None = None):
        from chronon_spark.api import CONTEXTUAL_SOURCE_NAME

        self.metrics = metrics or Metrics()
        self._handlers: dict[str, ExternalSourceHandler] = {
            CONTEXTUAL_SOURCE_NAME: _ContextualHandler()
        }

    def add(self, name: str, handler: ExternalSourceHandler) -> None:
        if name in self._handlers:
            raise ValueError(
                f"a handler named '{name}' already exists; registered: "
                f"[{', '.join(sorted(self._handlers))}]"
            )
        self._handlers[name] = handler

    def handler(self, name: str) -> ExternalSourceHandler:
        if name not in self._handlers:
            raise ValueError(
                f"'{name}' is not registered among handlers: "
                f"[{', '.join(sorted(self._handlers))}]"
            )
        return self._handlers[name]

    def _fetch_source(
        self,
        requests: DataFrame,
        part,
        source_cache: dict | None,
        eager: bool,
        ctx: "Context",
    ) -> DataFrame:
        """One batched handler fetch per (source, key_mapping) — parts
        attaching the same source under several prefixes share ONE handler
        call (the reference registry groups requests by source name the same
        way). Returns the validated/cast frame: key fields + ``__val_{n}``
        value columns. With ``eager`` the frame is persisted and counted so
        an execution-time handler failure (RPC down at action time) raises
        HERE, where graceful mode can catch it per part."""
        from pyspark.sql import functions as F

        src = part.source
        key_fields = [n for n, _ in src.key_schema]
        left_for = {v: k for k, v in part.key_mapping.items()}  # key -> left
        cache_key = (src.name, tuple(sorted(part.key_mapping.items())))
        if source_cache is not None and cache_key in source_cache:
            return source_cache[cache_key]

        keys = requests.select(
            *[F.col(left_for.get(k, k)).alias(k) for k in key_fields]
        ).distinct()
        t0 = time.time()
        fetched = self.handler(src.name).fetch(requests.sparkSession, keys)
        absent = [
            n for n, _ in [*src.key_schema, *src.value_schema]
            if n not in fetched.columns
        ]
        if absent:
            # failure accounting happens in enrich() (graceful mode) so this
            # raise isn't double-counted
            raise ValueError(
                f"handler '{src.name}' returned a frame missing declared "
                f"fields {absent}; declared keys {key_fields}, values "
                f"{[n for n, _ in src.value_schema]}, got {fetched.columns}"
            )
        # extra columns dropped; declared value types enforced; one row per
        # key (a handler returning duplicates would fan requests out)
        fetched = fetched.select(
            *[F.col(n).cast(t).alias(n) for n, t in src.key_schema],
            *[F.col(n).cast(t).alias(f"__val_{n}") for n, t in src.value_schema],
        ).dropDuplicates(key_fields)
        if eager:
            # force the handler plan now: a lazily-failing handler (RPC
            # adapter dead at action time) must fail inside this part, not
            # at the caller's final action after every part merged
            fetched = fetched.persist()
            try:
                fetched.count()
            except Exception:
                fetched.unpersist(blocking=False)
                raise
            from chronon_spark.plans import cache as _plan_cache

            _plan_cache.register(fetched)
            # honest latency: measured across the executed fetch
            self.metrics.distribution(
                ctx, "response.latency", (time.time() - t0) * 1000
            )
        if source_cache is not None:
            source_cache[cache_key] = fetched
        return fetched

    def _fetch_part(
        self,
        requests: DataFrame,
        part,
        source_cache: dict | None = None,
        eager: bool = False,
    ) -> DataFrame:
        from pyspark.sql import functions as F

        ctx = Context(
            "external.fetching", extra=(("external_source", part.full_name()),)
        )
        t0 = time.time()
        src = part.source
        full = part.full_name()

        if src.is_contextual:
            # contextual: left request columns become ext[_prefix]_contextual_
            # twins (Join.scala:104-120 naming via key_schema_full)
            out = requests
            for left_name, typ in part.key_schema_full():
                out = out.withColumn(
                    f"{full}_{left_name}", F.col(left_name).cast(typ)
                )
            self.metrics.increment(ctx, "response.successes")
            return out

        # left request columns -> source key fields (key_mapping: left -> key)
        key_fields = [n for n, _ in src.key_schema]
        left_for = {v: k for k, v in part.key_mapping.items()}  # key -> left
        missing_left = [
            left_for.get(k, k) for k in key_fields
            if left_for.get(k, k) not in requests.columns
        ]
        if missing_left:
            raise ValueError(
                f"external part '{full}': request frame lacks key columns "
                f"{missing_left} (have {requests.columns})"
            )
        fetched = self._fetch_source(requests, part, source_cache, eager, ctx)
        part_vals = fetched.select(
            *key_fields,
            *[
                F.col(f"__val_{n}").alias(f"{full}_{n}")
                for n, _ in src.value_schema
            ],
        )

        join_cond = [
            F.col(f"__req.{left_for.get(k, k)}").eqNullSafe(F.col(f"__ext.{k}"))
            for k in key_fields
        ]
        # no broadcast hint: point-serving key sets auto-broadcast under the
        # AQE threshold, while a 10^9-row batch-scoring request frame must be
        # allowed to shuffle-join
        out = (
            requests.alias("__req")
            .join(part_vals.alias("__ext"), on=join_cond, how="left")
            .drop(*[F.col(f"__ext.{k}") for k in key_fields])
        )
        self.metrics.increment(ctx, "response.successes")
        # plan-assembly cost only; executed-fetch latency is recorded in
        # _fetch_source when eager forces the handler plan
        self.metrics.distribution(ctx, "response.plan_ms", (time.time() - t0) * 1000)
        return out

    def enrich(
        self, requests: DataFrame, parts: list, graceful: bool = False
    ) -> DataFrame:
        """Apply every external part to a request/feature frame — one
        batched handler call per (source, key_mapping): parts re-attaching
        the same source under different prefixes share a single fetch (the
        reference registry groups requests by source name the same way).

        ``graceful=True`` is the reference's serving behavior
        (ExternalSourcesTest: an always-failing source yields an
        ``ext_{name}_exception`` value while every other part still
        enriches); it also EXECUTES each source's handler plan eagerly
        (persist + count, released via plans.cache) so a handler that only
        fails at action time still degrades to its exception column instead
        of killing the caller's final action. False fails fast and stays
        fully lazy — the right default for pipeline code, where a
        misconfigured part should stop the job."""
        from pyspark.sql import functions as F

        names = [p.full_name() for p in parts]
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            raise ValueError(
                f"external parts produce colliding column namespaces "
                f"{dupes}; attach the same source twice only with distinct "
                f"prefixes"
            )
        source_cache: dict = {}
        out = requests
        for part in parts:
            try:
                out = self._fetch_part(
                    out, part, source_cache=source_cache, eager=graceful
                )
            except Exception as exc:
                if not graceful:
                    raise
                full = part.full_name()
                ctx = Context(
                    "external.fetching", extra=(("external_source", full),)
                )
                self.metrics.increment(ctx, "response.failures")
                self.metrics.increment_exception(ctx, exc)
                out = out.withColumn(f"{full}_exception", F.lit(str(exc)))
        return out
