"""Online-serving support layer: TTL/LRU caches, tagged metrics, and the
batch-IR-caching Fetcher (reference TTLCache.scala, LRUCache.scala,
FetcherCache.scala, Metrics.scala). The behavioral bar: a second fetch of
the same (definition, batch day) must NOT re-read or re-verify the upload
tables, values stay identical to the uncached path, and a stale definition
is rejected before any lambda merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.online import (
    Context,
    Fetcher,
    LRUCache,
    Metrics,
    StaleUploadError,
    TTLCache,
)

W7D = Window(7, TimeUnit.DAYS)
W1D = Window(1, TimeUnit.DAYS)


# ---------------------------------------------------------------------------
# generic caches
# ---------------------------------------------------------------------------


def test_ttl_cache_expiry_and_error_refresh():
    clock = [1_000_000]
    calls = []

    def load(key):
        calls.append(key)
        if key == "boom" and len([c for c in calls if c == "boom"]) == 1:
            raise RuntimeError("transient")
        return f"v{len(calls)}"

    c = TTLCache(load, ttl_ms=10_000, refresh_interval_ms=1_000, now=lambda: clock[0])
    assert c("a") == "v1" and c("a") == "v1"  # cached within TTL
    clock[0] += 9_999
    assert c("a") == "v1"
    clock[0] += 2
    assert c("a") == "v2"  # TTL elapsed -> reload
    # a load that RAISED is retried on the short refresh interval, not
    # pinned for the full TTL (TTLCache.scala's post-exception refresh)
    with pytest.raises(RuntimeError):
        c("boom")
    with pytest.raises(RuntimeError):
        c("boom")  # still inside refresh interval: cached failure re-raised
    assert calls.count("boom") == 1
    clock[0] += 1_001
    assert c("boom").startswith("v")  # retried and healed
    # refresh() forces the short interval on healthy entries too
    clock[0] += 2_000
    before = c.loads
    assert c("a") == c("a")
    assert c.loads == before  # within TTL: no reload
    c.refresh("a")
    assert c.loads == before + 1  # past refresh interval: reloaded
    c.invalidate("a")
    c("a")
    assert c.loads == before + 2


def test_lru_cache_eviction_and_stats():
    evicted = []
    c = LRUCache("t", maximum_size=2)
    c._on_evict = lambda k, v: evicted.append(k)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # refreshes 'a'
    c.put("c", 3)  # evicts 'b' (LRU), not 'a'
    assert evicted == ["b"]
    assert c.get("b") is None and c.get("a") == 1 and c.get("c") == 3
    assert (c.hits, c.misses, c.evictions) == (3, 1, 1)
    v, hit = c.get_or_load("d", lambda: 4)
    assert (v, hit) == (4, False)
    v, hit = c.get_or_load("d", lambda: 99)
    assert (v, hit) == (4, True)
    with pytest.raises(ValueError):
        LRUCache("bad", maximum_size=0)


def test_metrics_tagged_counters_and_distributions():
    m = Metrics()
    ctx_a = Context("group_by.fetching", group_by="a")
    ctx_b = Context("group_by.fetching", group_by="b")
    m.increment(ctx_a, "fetch.requests")
    m.increment(ctx_a, "fetch.requests")
    m.increment(ctx_b, "fetch.requests")
    m.gauge(ctx_a, "rows", 42)
    for v in (5.0, 1.0, 9.0):
        m.distribution(ctx_a, "latency_ms", v)
    m.increment_exception(ctx_a, ValueError("x"))
    assert m.counter(ctx_a, "fetch.requests") == 2
    assert m.counter(ctx_b, "fetch.requests") == 1  # tags separate series
    assert m.counter(ctx_a, "exception.ValueError") == 1
    snap = m.snapshot()
    d = snap["distributions"]["latency_ms{'environment': 'group_by.fetching', 'group_by': 'a'}"]
    assert d == {"n": 3, "sum": 15.0, "min": 1.0, "max": 9.0}
    assert snap["gauges"]["rows{'environment': 'group_by.fetching', 'group_by': 'a'}"] == 42


# ---------------------------------------------------------------------------
# caching fetcher over real upload tables
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def upload_env(spark, events, tmp_path_factory):
    """group-by-upload-shaped tables (IR frames + lineage hash) under a
    tmp upload root, plus the batch/stream/request split."""
    from chronon_spark.operators.upload import upload_batch_irs
    from chronon_spark.sources.tableio import insert_overwrite_partitions, resolve_table

    root = str(tmp_path_factory.mktemp("uploads"))
    d = F.date_format("ts", "yyyy-MM-dd")
    days = sorted(
        r["d"] for r in events.select(d.alias("d")).distinct().collect()
    )
    batch_end_ds, serve_day = days[7], days[8]
    batch = events.where(d <= batch_end_ds)
    stream = events.where(d == serve_day)
    requests = (
        events.where((d == serve_day) & (F.col("event_type") == "purchase"))
        .select("user_id", "ts")
        .distinct()
    )
    gb = GroupBy(
        name="cache_gb",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value", windows=(W7D,)),
            Aggregation(Op.SUM, "value", windows=(W1D,)),
        ],
    )
    collapsed, tail = upload_batch_irs(batch, gb, batch_end_ds, tiebreak="event_id")
    for suffix, frame in (("upload_collapsed", collapsed), ("upload_tail", tail)):
        t = resolve_table(spark, root, f"{gb.name}_{suffix}")
        insert_overwrite_partitions(frame.withColumn("ds", F.lit(batch_end_ds)), t)
        t.write_lineage(batch_end_ds, {"semantic_hash": gb.semantic_hash()})
    return root, gb, batch_end_ds, stream, requests


def test_fetcher_caches_verified_batch_irs(spark, events, upload_env):
    root, gb, batch_end_ds, stream, requests = upload_env
    f = Fetcher(spark, root)
    ctx = Context("group_by.fetching", group_by=gb.name)

    out1 = f.fetch_features(requests, stream, gb, batch_end_ds, tiebreak="event_id")
    assert f.metrics.counter(ctx, "cache.miss") == 1
    out2 = f.fetch_features(requests, stream, gb, batch_end_ds, tiebreak="event_id")
    assert f.metrics.counter(ctx, "cache.hit") == 1
    assert f.metrics.counter(ctx, "fetch.requests") == 2
    # cached frames are the same persisted objects (no table re-read)
    k = (gb.name, gb.semantic_hash(), batch_end_ds)
    assert f._ir_cache.get(k)[0].storageLevel.useMemory

    # values: cached == uncached == offline engine over the unified log
    from chronon_spark.operators.groupby import temporal_events

    want = temporal_events(requests, events, gb, tiebreak="event_id")
    cols = ["user_id", "ts", *gb.output_columns()]

    def rows(df):
        # round floats: double SUM merge order varies run-to-run at ulp
        # level (the earlier sorted(str(...)) compared the CHARACTER
        # multiset of the stringified list and flaked on exactly that)
        return sorted(
            tuple(round(x, 6) if isinstance(x, float) else x for x in r)
            for r in df.select(*cols).collect()
        )

    assert rows(out1) == rows(out2) == rows(want)


def test_fetcher_rejects_stale_definition(spark, upload_env):
    root, gb, batch_end_ds, stream, requests = upload_env
    changed = GroupBy(
        name=gb.name,
        keys=gb.keys,
        aggregations=[Aggregation(Op.COUNT, "value", windows=(W1D,))],  # edited
    )
    f = Fetcher(spark, root)
    with pytest.raises(StaleUploadError, match="re-run group-by-upload"):
        f.fetch_features(requests, stream, changed, batch_end_ds)
    ctx = Context("group_by.fetching", group_by=gb.name)
    assert f.metrics.counter(ctx, "fetch.stale_upload") == 1
    assert f.metrics.counter(ctx, "exception.StaleUploadError") == 1
    # the failure is NOT cached as a frame: a fixed definition loads fine
    out = f.fetch_features(requests, stream, gb, batch_end_ds, tiebreak="event_id")
    assert out.count() == requests.count()


def test_fetcher_eviction_unpersists(spark, upload_env):
    root, gb, batch_end_ds, stream, requests = upload_env
    f = Fetcher(spark, root, batch_ir_cache_size=1)
    c1, _t1 = f.batch_frames(gb, batch_end_ds)
    assert c1.storageLevel.useMemory
    # second definition evicts the first (cache size 1) and unpersists it
    gb2 = GroupBy(
        name=gb.name, keys=gb.keys,
        aggregations=[Aggregation(Op.COUNT, "value", windows=(W7D,)),
                      Aggregation(Op.SUM, "value", windows=(W1D,))],
        accuracy=gb.accuracy,
    )
    # same definition content -> same semantic hash -> same key: still a hit
    _c, _t = f.batch_frames(gb2, batch_end_ds)
    assert f._ir_cache.hits >= 1


def test_fetch_join_merges_external_parts(spark, upload_env):
    """Fetcher.fetch_join with an external_registry = batch/stream lambda
    features UNCHANGED + handler values merged under ext_ names, nulls for
    unmatched keys (reference Fetcher.fetchJoin combining fetchGroupBys with
    fetchExternal)."""
    from chronon_spark.api import ExternalPart, ExternalSource, Join, JoinPart
    from chronon_spark.online import ExternalSourceHandler, ExternalSourceRegistry

    root, gb, batch_end_ds, stream, requests = upload_env
    src = ExternalSource(
        name="risk",
        key_schema=(("user_id", "bigint"),),
        value_schema=(("score", "double"),),
    )
    join = Join(
        name="j_ext",
        left_keys=["user_id"],
        join_parts=[JoinPart(group_by=gb)],
        external_parts=[ExternalPart(source=src)],
    )

    class Half(ExternalSourceHandler):
        def fetch(self, _spark, keys):
            # serve only even user_ids so odd ones exercise null padding
            return keys.where(F.col("user_id") % 2 == 0).withColumn(
                "score", F.col("user_id") * 0.5
            )

    reg = ExternalSourceRegistry()
    reg.add("risk", Half())
    f = Fetcher(spark, root)
    plain = f.fetch_join(
        requests, {gb.name: stream}, join, batch_end_ds, tiebreak="event_id"
    )
    merged = f.fetch_join(
        requests, {gb.name: stream}, join, batch_end_ds,
        external_registry=reg, tiebreak="event_id",
    )
    assert set(merged.columns) == set(plain.columns) | {"ext_risk_score"}
    base_cols = sorted(plain.columns)
    assert sorted(str(r) for r in merged.select(*base_cols).collect()) == sorted(
        str(r) for r in plain.select(*base_cols).collect()
    )
    for r in merged.select("user_id", "ext_risk_score").collect():
        want = r["user_id"] * 0.5 if r["user_id"] % 2 == 0 else None
        assert r["ext_risk_score"] == want
