"""Golden parity on the reference's OWN quickstart fixtures.

Builds the quickstart `training_set` join exactly as the reference declares
it (api/py/test/sample/joins/quickstart/training_set.py over the sample CSVs
in api/py/test/sample/data/): purchases GroupBy (SNAPSHOT accuracy — no
topic, Extensions.scala:472-482), returns GroupBy (TEMPORAL — topic
configured), and the no-aggregation users entity GroupBy
(group_bys/quickstart/{purchases,returns,users}.py). Asserts

1. the exact output feature names the reference documents
   (docs/source/authoring_features/Join.md:36-63 naming convention),
2. every feature value against a DuckDB oracle implementing the documented
   accuracy semantics (midnight as-of for SNAPSHOT, sawtooth tail for
   TEMPORAL, previous-day snapshot for the entity part),
3. left row-count preservation (JoinTest.scala:589-590).

The reference CSVs are read in place (read-only); tests skip if absent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api import Accuracy, Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
from chronon_spark.operators.join import compute_join

DATA = "/root/reference/api/py/test/sample/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference quickstart fixtures not present"
)

DAY_MS = 86_400_000
WINDOWS = tuple(Window(d, TimeUnit.DAYS) for d in (3, 14, 30))


def _purchases_gb():
    return GroupBy(
        name="quickstart_purchases_v1",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.SUM, "purchase_price", windows=WINDOWS),
            Aggregation(Op.COUNT, "purchase_price", windows=WINDOWS),
            Aggregation(Op.AVERAGE, "purchase_price", windows=WINDOWS),
            Aggregation(Op.LAST_K, "purchase_price", k=10),
        ],
        accuracy=Accuracy.SNAPSHOT,  # no topic -> SNAPSHOT
    )


def _returns_gb():
    return GroupBy(
        name="quickstart_returns_v1",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.SUM, "refund_amt", windows=WINDOWS),
            Aggregation(Op.COUNT, "refund_amt", windows=WINDOWS),
            Aggregation(Op.AVERAGE, "refund_amt", windows=WINDOWS),
            Aggregation(Op.LAST_K, "refund_amt", k=10),
        ],
        accuracy=Accuracy.TEMPORAL,  # topic configured -> TEMPORAL
    )


def _users_gb():
    return GroupBy(
        name="quickstart_users_v1",
        keys=["user_id"],
        aggregations=None,  # selection GroupBy: snapshot fields as features
        accuracy=Accuracy.SNAPSHOT,
    )


def _csv(spark, name, cols):
    schema = T.StructType(
        [T.StructField(c, t, True) for c, t in cols]
    )
    return spark.read.csv(f"{DATA}/{name}.csv", header=True, schema=schema)


def _compute(spark):
    purchases = _csv(
        spark,
        "purchases",
        [("ds", T.StringType()), ("ts", T.LongType()), ("purchase_id", T.StringType()),
         ("user_id", T.LongType()), ("product_id", T.LongType()),
         ("purchase_price", T.LongType())],
    ).select("user_id", "ts", "purchase_price")
    returns = _csv(
        spark,
        "returns",
        [("ds", T.StringType()), ("ts", T.LongType()), ("return_id", T.StringType()),
         ("user_id", T.LongType()), ("product_id", T.LongType()),
         ("refund_amt", T.LongType())],
    ).select("user_id", "ts", "refund_amt")
    users = _csv(
        spark,
        "users",
        [("ds", T.StringType()), ("user_id", T.LongType()),
         ("account_created_ds", T.StringType()), ("email_verified", T.LongType())],
    ).select("user_id", "ds", "account_created_ds", "email_verified")
    checkouts = _csv(
        spark,
        "checkouts",
        [("ds", T.StringType()), ("ts", T.LongType()), ("return_id", T.StringType()),
         ("user_id", T.LongType()), ("product_id", T.LongType()),
         ("refund_amt", T.LongType())],
    )
    left = checkouts.select(
        "user_id", F.timestamp_millis(F.col("ts")).alias("ts")
    )
    join = Join(
        name="quickstart_training_set_v1",
        left_keys=["user_id"],
        join_parts=[
            JoinPart(group_by=_purchases_gb()),
            JoinPart(group_by=_returns_gb()),
            JoinPart(group_by=_users_gb()),
        ],
    )
    sources = {
        "quickstart_purchases_v1": purchases,
        "quickstart_returns_v1": returns,
        "quickstart_users_v1": users,
    }
    return left, compute_join(left, sources, join)


def _expected_names():
    names = []
    for gbn, col in (
        ("quickstart_purchases_v1", "purchase_price"),
        ("quickstart_returns_v1", "refund_amt"),
    ):
        for op in ("sum", "count", "average"):
            for d in (3, 14, 30):
                names.append(f"{gbn}_{col}_{op}_{d}d")
        names.append(f"{gbn}_{col}_last10")
    names += [
        "quickstart_users_v1_account_created_ds",
        "quickstart_users_v1_email_verified",
    ]
    return names


def test_quickstart_training_set_columns_and_row_count(spark):
    left, out = _compute(spark)
    for name in _expected_names():
        assert name in out.columns, f"missing reference feature column {name}"
    # left row preservation, reference JoinTest.scala:589-590
    assert out.count() == left.count() == 200


def test_quickstart_training_set_values_vs_oracle(spark):
    import duckdb

    _, out = _compute(spark)
    out = out.withColumn("__ts_ms", F.unix_millis(F.col("ts")))
    got = {(r["user_id"], r["__ts_ms"]): r.asDict() for r in out.collect()}

    con = duckdb.connect()
    for t in ("purchases", "returns", "users", "checkouts"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_csv_auto('{DATA}/{t}.csv')"
        )
    # SNAPSHOT accuracy: midnight as-of — window [day0 - w, day0) where
    # day0 = query day start; TEMPORAL: sawtooth tail —
    # [floor((ts - w)/hop)*hop, ts) with hop 1h (<12d) / 1d (>=12d).
    hop = {3: 3_600_000, 14: DAY_MS, 30: DAY_MS}
    p_cols, r_cols = [], []
    for d in (3, 14, 30):
        w = d * DAY_MS
        p_win = f"p.ts >= (q.ts // {DAY_MS}) * {DAY_MS} - {w} AND p.ts < (q.ts // {DAY_MS}) * {DAY_MS}"
        r_win = f"r.ts >= ((q.ts - {w}) // {hop[d]}) * {hop[d]} AND r.ts < q.ts"
        p_cols += [
            f"(SELECT sum(purchase_price) FROM purchases p WHERE p.user_id = q.user_id AND {p_win}) AS p_sum_{d}",
            f"(SELECT count(purchase_price) FROM purchases p WHERE p.user_id = q.user_id AND {p_win}) AS p_cnt_{d}",
            f"(SELECT avg(purchase_price) FROM purchases p WHERE p.user_id = q.user_id AND {p_win}) AS p_avg_{d}",
        ]
        r_cols += [
            f"(SELECT sum(refund_amt) FROM returns r WHERE r.user_id = q.user_id AND {r_win}) AS r_sum_{d}",
            f"(SELECT count(refund_amt) FROM returns r WHERE r.user_id = q.user_id AND {r_win}) AS r_cnt_{d}",
            f"(SELECT avg(refund_amt) FROM returns r WHERE r.user_id = q.user_id AND {r_win}) AS r_avg_{d}",
        ]
    sql = f"""
    SELECT q.user_id, q.ts,
      {', '.join(p_cols)},
      {', '.join(r_cols)},
      (SELECT list(purchase_price ORDER BY ts DESC) FROM purchases p
        WHERE p.user_id = q.user_id AND p.ts < (q.ts // {DAY_MS}) * {DAY_MS}) AS p_last,
      (SELECT list(refund_amt ORDER BY ts DESC) FROM returns r
        WHERE r.user_id = q.user_id AND r.ts < q.ts) AS r_last,
      CAST(u.account_created_ds AS VARCHAR) AS u_acd, u.email_verified AS u_ev
    FROM checkouts q
    LEFT JOIN users u
      ON u.user_id = q.user_id
     AND date_diff('day', DATE '1970-01-01', CAST(u.ds AS DATE)) + 1 = q.ts // {DAY_MS}
    """
    oracle = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    assert len(oracle) == 200
    n_nontrivial = 0
    for row in oracle:
        o = dict(zip(cols, row))
        g = got[(o["user_id"], o["ts"])]
        for d in (3, 14, 30):
            assert g[f"quickstart_purchases_v1_purchase_price_sum_{d}d"] == o[f"p_sum_{d}"]
            assert (g[f"quickstart_purchases_v1_purchase_price_count_{d}d"] or 0) == o[f"p_cnt_{d}"]
            assert g[f"quickstart_returns_v1_refund_amt_sum_{d}d"] == o[f"r_sum_{d}"]
            assert (g[f"quickstart_returns_v1_refund_amt_count_{d}d"] or 0) == o[f"r_cnt_{d}"]
            for gcol, ocol in (
                (f"quickstart_purchases_v1_purchase_price_average_{d}d", f"p_avg_{d}"),
                (f"quickstart_returns_v1_refund_amt_average_{d}d", f"r_avg_{d}"),
            ):
                if o[ocol] is None:
                    assert g[gcol] is None
                else:
                    assert g[gcol] == pytest.approx(o[ocol], rel=1e-9)
        exp_p_last = (o["p_last"] or [])[:10] or None
        exp_r_last = (o["r_last"] or [])[:10] or None
        assert (list(g["quickstart_purchases_v1_purchase_price_last10"] or []) or None) == exp_p_last
        assert (list(g["quickstart_returns_v1_refund_amt_last10"] or []) or None) == exp_r_last
        assert g["quickstart_users_v1_account_created_ds"] == o["u_acd"]
        assert g["quickstart_users_v1_email_verified"] == o["u_ev"]
        if o["p_sum_30"] is not None and o["r_sum_30"] is not None and o["u_acd"] is not None:
            n_nontrivial += 1
    # the fixtures must actually exercise all three parts
    assert n_nontrivial > 100
