"""Hypothesis differential fuzzers: asof_join vs pandas.merge_asof,
range_join vs DuckDB inequality join — random tiny corpora, every
direction/tolerance/how combination.

Right-side (by, on) pairs are generated UNIQUE: with duplicate
timestamps inside a group, "the" latest right row is undefined under
set semantics (pandas picks positional order, which a DataFrame engine
does not have), so equality against merge_asof is only meaningful on
tie-free inputs.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pycypher_nmetl_spark.temporal_joins import asof_join, range_join

# Slow tier (VERDICT r12 #1): bulk campaign — deselected by default,
# runs under SPARK_GRAFT_FULL_SUITE=1 / -m slow.
pytestmark = pytest.mark.slow


_left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 200)),  # (key, t)
    min_size=1, max_size=25,
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 200)),
    min_size=0, max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # tie-free per (key, t)
)


@pytest.fixture(scope="module")
def tspark(spark):
    return spark


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=_left_rows,
    rrows=_right_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.sampled_from([None, 5.0, 40.0]),
    how=st.sampled_from(["left", "inner"]),
)
def test_asof_differential_vs_merge_asof(
    tspark, lrows, rrows, direction, tolerance, how
):
    left = tspark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "lid long, k long, t long",
    )
    right = tspark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in rrows],
        "k long, t long, v double",
    ) if rrows else tspark.createDataFrame([], "k long, t long, v double")

    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="t", by="k",
            direction=direction, tolerance=tolerance, how=how,
        ).collect()
    }

    lp = (
        pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(lrows)],
                     columns=["lid", "k", "t"])
        .sort_values(["t", "lid"]).reset_index(drop=True)
    )
    rp = (
        pd.DataFrame(rrows or [], columns=["k", "t"])
        .astype({"k": "int64", "t": "int64"})  # empty frame: object dtype
        .assign(v=lambda d: (d["k"] * 1000 + d["t"]).astype(float))
        .sort_values("t").reset_index(drop=True)
    )
    ref_df = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        tolerance=int(tolerance) if tolerance is not None else None,
    )
    ref = {
        int(r.lid): (None if pd.isna(r.v) else float(r.v))
        for r in ref_df.itertuples()
    }
    if how == "inner":
        ref = {k: v for k, v in ref.items() if v is not None}
    assert got == ref


_intervals = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 200), st.integers(-5, 60)),
    min_size=0, max_size=20,
)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=_left_rows,
    ivals=_intervals,
    how=st.sampled_from(["inner", "left"]),
    bin_width=st.sampled_from([None, 7.0, 64.0]),
)
def test_range_differential_vs_duckdb(tspark, lrows, ivals, how, bin_width):
    left = tspark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "lid long, k long, t long",
    )
    right = tspark.createDataFrame(
        [(j, k, s, s + d) for j, (k, s, d) in enumerate(ivals)],
        "iid long, k long, lo long, hi long",
    ) if ivals else tspark.createDataFrame([], "iid long, k long, lo long, hi long")

    got = sorted(
        (r["lid"], r["iid"])
        for r in range_join(
            left, right, "t", "lo", "hi", by="k",
            how=how, bin_width=bin_width,
        ).select("lid", "iid").collect()
    )

    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    oracle = sorted(
        (a, b)
        for a, b in con.execute(
            f"SELECT l.lid, r.iid FROM l {join_kw} r "
            "ON l.k = r.k AND l.t BETWEEN r.lo AND r.hi"
        ).fetchall()
    )
    assert got == oracle
