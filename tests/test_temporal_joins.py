"""asof_join / range_join — temporal operators Spark lacks natively.

Correctness oracles: DuckDB's native ASOF JOIN (backward), plain SQL
inequality joins (range), and pandas.merge_asof (forward / nearest /
tolerance — a seeded random sweep, the differential-fuzzer pattern the
suite uses elsewhere).
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pycypher_nmetl_spark.temporal_joins import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def quotes_trades(spark):
    """The canonical asof example: trades pick up the latest quote."""
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(1), 100.0),
            (2, "A", _ts(5), 101.0),
            (3, "B", _ts(2), 50.0),
            (4, "B", _ts(3), 51.0),
            (5, "C", _ts(9), 7.0),  # no quotes at all for C
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 99.5),
            ("A", _ts(5), 100.5),  # equal timestamp: inclusive match
            ("A", _ts(7), 102.5),  # future quote: backward must ignore
            ("B", _ts(2.5), 49.5),
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_semantics(quotes_trades):
    trades, quotes = quotes_trades
    got = {
        r["trade_id"]: r["bid"]
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }
    assert got == {
        1: 99.5,   # latest A quote at/before minute 1
        2: 100.5,  # equal-timestamp quote matches (inclusive)
        3: None,   # B's only quote is later
        4: 49.5,
        5: None,   # no C quotes; how='left' keeps the row
    }


def test_asof_forward_and_nearest(quotes_trades):
    trades, quotes = quotes_trades
    fwd = {
        r["trade_id"]: r["bid"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", direction="forward"
        ).collect()
    }
    assert fwd == {1: 100.5, 2: 100.5, 3: 49.5, 4: None, 5: None}
    near = {
        r["trade_id"]: r["bid"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", direction="nearest"
        ).collect()
    }
    # trade 1 (min 1): A quotes at 0 (d=1) and 5 (d=4) -> 0 wins;
    # trade 4 (min 3): B quote at 2.5 -> nearest regardless of side
    assert near == {1: 99.5, 2: 100.5, 3: 49.5, 4: 49.5, 5: None}


def test_asof_tolerance_and_inner(quotes_trades):
    trades, quotes = quotes_trades
    # 30s tolerance, INCLUSIVE bound (pandas merge_asof convention):
    # trade 2 is 0s from its quote, trade 4 exactly 30s
    got = {
        r["trade_id"]: r["bid"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", tolerance=30.0
        ).collect()
    }
    assert got == {1: None, 2: 100.5, 3: None, 4: 49.5, 5: None}
    inner = asof_join(
        trades, quotes, on="ts", by="sym", tolerance=30.0, how="inner"
    )
    assert sorted(r["trade_id"] for r in inner.collect()) == [2, 4]


def test_asof_right_on_rides_along_and_suffix(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym")
    assert "ts_r" in out.columns  # right timestamp always attached
    row = {r["trade_id"]: r["ts_r"] for r in out.collect()}
    assert row[2] == _ts(5)
    # colliding right column gets the suffix; price is left's own
    quotes2 = quotes.withColumnRenamed("bid", "price")
    out2 = asof_join(trades, quotes2, on="ts", by="sym")
    assert "price_r" in out2.columns and "price" in out2.columns


def test_asof_numeric_on_no_by(spark):
    left = spark.createDataFrame([(i,) for i in (1, 5, 10)], "x long")
    right = spark.createDataFrame(
        [(0, "a"), (4, "b"), (9, "c")], "x long, tag string"
    )
    got = {r["x"]: r["tag"] for r in asof_join(left, right, on="x").collect()}
    assert got == {1: "a", 5: "b", 10: "c"}


def test_asof_matches_duckdb_native_asof(spark, sf_dir="/root/testdata/sf0.001"):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "ts", "user_id", F.col("event_id").alias("err_id")
    )
    got = sorted(
        (r["event_id"], r["err_id"])
        for r in asof_join(clicks, errors, on="ts", by="user_id").collect()
    )
    con = duckdb.connect()
    oracle = sorted(
        tuple(t)
        for t in con.execute(
            f"""
            WITH clicks AS (SELECT event_id, ts, user_id
                            FROM '{sf_dir}/events.parquet'
                            WHERE event_type='click'),
                 errors AS (SELECT ts, user_id, event_id AS err_id
                            FROM '{sf_dir}/events.parquet'
                            WHERE event_type='error')
            SELECT c.event_id, e.err_id
            FROM clicks c ASOF LEFT JOIN errors e
              ON c.user_id = e.user_id AND c.ts >= e.ts
            """
        ).fetchall()
    )
    assert got == oracle


def test_asof_differential_vs_pandas(spark):
    """Seeded random corpora x {direction} x {tolerance} vs merge_asof."""
    rng = random.Random(42)
    for trial in range(4):
        n_l, n_r = rng.randint(5, 60), rng.randint(0, 60)
        lrows = [
            (i, rng.randint(0, 3), _ts(rng.randint(0, 500)))
            for i in range(n_l)
        ]
        rrows = [
            (rng.randint(0, 3), _ts(rng.randint(0, 500)), float(j))
            for j in range(n_r)
        ]
        left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
        right = spark.createDataFrame(rrows, "k long, ts timestamp, v double")
        lp = left.toPandas().sort_values(["ts", "lid"]).reset_index(drop=True)
        rp = right.toPandas().sort_values("ts").reset_index(drop=True)
        for direction in ("backward", "forward", "nearest"):
            tol = rng.choice([None, 60.0 * rng.randint(1, 8)])
            got = {
                r["lid"]: r["v"]
                for r in asof_join(
                    left, right, on="ts", by="k",
                    direction=direction, tolerance=tol,
                ).collect()
            }
            # pandas merge_asof breaks nearest-ties toward backward only
            # when sorted stably; our implementation pins the same rule
            ref_df = pd.merge_asof(
                lp, rp, on="ts", by="k", direction=direction,
                tolerance=pd.Timedelta(seconds=tol) if tol else None,
            )
            ref = {
                int(r.lid): (None if pd.isna(r.v) else float(r.v))
                for r in ref_df.itertuples()
            }
            assert got == ref, (trial, direction, tol)


def test_asof_plan_one_exchange_no_join(quotes_trades):
    """The scale contract: ONE hash exchange, ONE window, ZERO joins."""
    trades, quotes = quotes_trades
    plan = (
        asof_join(trades, quotes, on="ts", by="sym")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_asof_validation(quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="ts", by="sym", direction="up")
    with pytest.raises(ValueError, match="missing from left"):
        asof_join(trades, quotes, on="nope", by="sym")
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(trades, quotes, on="ts", by="sym", right_cols=["nope"])
    with pytest.raises(TypeError, match="unsupported type"):
        asof_join(
            trades.withColumn("s", F.lit("x")),
            quotes.withColumn("s", F.lit("x")),
            on="s",
        )


# --------------------------------------------------------------------- #
@pytest.fixture()
def points_intervals(spark):
    points = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(40)), (3, 2, _ts(10)), (4, 1, _ts(90))],
        "pid long, k long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [
            (100, 1, _ts(0), _ts(15)),
            (101, 1, _ts(5), _ts(12)),   # overlapping interval: 2 matches
            (102, 1, _ts(50), _ts(45)),  # invalid (start > end): ignored
            (103, 2, _ts(10), _ts(10)),  # zero-width, inclusive both ends
        ],
        "iid long, k long, start timestamp, stop timestamp",
    )
    return points, ivals


def test_range_join_inner_and_left(points_intervals):
    points, ivals = points_intervals
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, ivals, "ts", "start", "stop", by="k").collect()
    )
    assert got == [(1, 100), (1, 101), (3, 103)]
    left = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, ivals, "ts", "start", "stop", by="k", how="left"
        ).collect()
    )
    assert left == [(1, 100), (1, 101), (2, None), (3, 103), (4, None)]


def test_range_join_matches_duckdb(spark, sf_dir="/root/testdata/sf0.001"):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    sess = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
        F.col("event_id").alias("w_id"),
    )
    for width in (None, 600.0, 7200.0):  # default + narrower/wider bins
        got = sorted(
            (r["event_id"], r["w_id"])
            for r in range_join(
                clicks, sess, "ts", "w_start", "w_end",
                by="user_id", bin_width=width,
            ).collect()
        )
        con = duckdb.connect()
        oracle = sorted(
            tuple(t)
            for t in con.execute(
                f"""
                WITH clicks AS (SELECT event_id, ts, user_id
                                FROM '{sf_dir}/events.parquet'
                                WHERE event_type='click'),
                     sess AS (SELECT user_id, ts AS w_start,
                                     ts + INTERVAL 30 MINUTE AS w_end,
                                     event_id AS w_id
                              FROM '{sf_dir}/events.parquet'
                              WHERE event_type='view')
                SELECT c.event_id, s.w_id FROM clicks c JOIN sess s
                  ON c.user_id = s.user_id
                 AND c.ts BETWEEN s.w_start AND s.w_end
                """
            ).fetchall()
        )
        assert got == oracle, width


def test_range_join_plan_is_equi_join(points_intervals):
    """The bin bucketing must produce a hash/sort-merge EQUI join — never
    the BroadcastNestedLoopJoin Catalyst plans for raw inequality."""
    points, ivals = points_intervals
    plan = (
        range_join(points, ivals, "ts", "start", "stop", by="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_range_join_validation(points_intervals):
    points, ivals = points_intervals
    with pytest.raises(ValueError, match="missing from left"):
        range_join(points, ivals, "nope", "start", "stop", by="k")
    with pytest.raises(ValueError, match="bin_width"):
        range_join(points, ivals, "ts", "start", "stop", by="k", bin_width=0.0)
    with pytest.raises(ValueError, match="overlapping"):
        range_join(
            points, ivals.withColumnRenamed("iid", "pid"),
            "ts", "start", "stop", by="k",
        )


def test_asof_output_collision_raises(spark, quotes_trades=None):
    left = spark.createDataFrame([(1, 5)], "x long, x_r long")
    right = spark.createDataFrame([(0, 1.0)], "x long, v double")
    with pytest.raises(ValueError, match="collision"):
        # right x rides along as x_r, which left already has
        asof_join(left, right, on="x")


# --------------------------------------------------------------------- #
# round 11: ADVICE fixes — null-safe left anti-join, reserved internal
# names, domain-relative numeric bin floor


def test_range_join_left_with_null_payload_no_phantom(spark):
    """A matched left row carrying a NULL payload column must appear
    exactly once — the old column-list anti-join used null-unsafe
    equality, so the row never matched its own key and was ALSO emitted
    with an all-null right side (ADVICE r10)."""
    left = spark.createDataFrame(
        [(1, 10.0, None), (2, 99.0, "tag"), (3, 10.0, None)],
        "pid long, x double, note string",
    )
    right = spark.createDataFrame(
        [(100, 5.0, 15.0)], "iid long, lo double, hi double"
    )
    rows = sorted(
        (r["pid"], r["iid"])
        for r in range_join(left, right, "x", "lo", "hi", how="left").collect()
    )
    # pid 1 and 3 (null note) match iid 100 ONCE; pid 2 is unmatched
    assert rows == [(1, 100), (2, None), (3, 100)]


def test_range_join_left_duplicate_left_rows(spark):
    """Fully duplicate matched left rows each keep their match (and
    unmatched duplicates each emit one null-right row)."""
    left = spark.createDataFrame(
        [(10.0,), (10.0,), (99.0,), (99.0,)], "x double"
    )
    right = spark.createDataFrame([(1, 5.0, 15.0)], "iid long, lo double, hi double")
    rows = sorted(
        (r["x"], r["iid"])
        for r in range_join(left, right, "x", "lo", "hi", how="left").collect()
    )
    assert rows == [(10.0, 1), (10.0, 1), (99.0, None), (99.0, None)]


def test_reserved_internal_names_raise(spark):
    l1 = spark.createDataFrame([(1.0, 2)], "x double, __bin long")
    r1 = spark.createDataFrame([(0.0, 5.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="reserved"):
        range_join(l1, r1, "x", "lo", "hi")
    l2 = spark.createDataFrame([(1.0,)], "x double")
    r2 = spark.createDataFrame([(0.0, 5.0, 1)], "lo double, hi double, __rj_k int")
    with pytest.raises(ValueError, match="reserved"):
        range_join(l2, r2, "x", "lo", "hi")
    l3 = spark.createDataFrame([(1.0, "p")], "x double, __asof_pay string")
    r3 = spark.createDataFrame([(0.0, 9.9)], "x double, bid double")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(l3, r3, on="x")


def test_range_join_subunit_numeric_bin_floor(spark):
    """[0, 1]-normalized numeric intervals: the auto bin width must be
    domain-relative (old absolute floor 1.0 collapsed the whole domain
    into ONE bin => |left| x |right| join work), and results must match
    the BETWEEN oracle."""
    import random as _rnd

    from pycypher_nmetl_spark.temporal_joins import _auto_bin_width, _ordinal

    rng = _rnd.Random(11)
    ivals = [
        (i, lo := rng.random() * 0.9, lo + rng.random() * 0.05)
        for i in range(200)
    ]
    pts = [(j, rng.random()) for j in range(300)]
    right = spark.createDataFrame(ivals, "iid long, lo double, hi double")
    left = spark.createDataFrame(pts, "pid long, x double")

    width = _auto_bin_width(
        right, left.schema["x"].dataType, _ordinal(right, "lo"), _ordinal(right, "hi")
    )
    # q90 span ~0.045 — far below 1.0; the floor must NOT kick it up
    assert 0.0 < width < 0.2
    # bounded fan-out: each interval explodes to at most span/width + 2 bins
    max_span = max(hi - lo for _, lo, hi in ivals)
    assert max_span / width + 2 < 64

    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(left, right, "x", "lo", "hi").collect()
    )
    oracle = sorted(
        (j, i) for j, x in pts for i, lo, hi in ivals if lo <= x <= hi
    )
    assert got == oracle


def test_range_join_degenerate_point_intervals_numeric(spark):
    """All-zero-span intervals over a sub-unit domain: width falls back
    to domain/4096, not 1.0, and exact matches still come through."""
    from pycypher_nmetl_spark.temporal_joins import _auto_bin_width, _ordinal

    right = spark.createDataFrame(
        [(i, v, v) for i, v in enumerate([0.1, 0.25, 0.25, 0.7])],
        "iid long, lo double, hi double",
    )
    left = spark.createDataFrame(
        [(0, 0.25), (1, 0.5)], "pid long, x double"
    )
    width = _auto_bin_width(
        right, left.schema["x"].dataType, _ordinal(right, "lo"), _ordinal(right, "hi")
    )
    assert width == pytest.approx((0.7 - 0.1) / 4096.0)
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(left, right, "x", "lo", "hi", how="left").collect()
    )
    assert got == [(0, 1), (0, 2), (1, None)]
