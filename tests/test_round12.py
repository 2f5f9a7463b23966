"""Round-12 fixes: union-mixing syntax error, dyn temporal rank, exact
long ordering, action-time mixed decode, lambda-scope comparisons, and
nondeterministic simple-CASE operand binding.

Reference parity notes:
- union mixing: openCypher mandates a syntax error (reference
  grammar rejects it; compat.py documents the rejection).
- mixed outputs: the reference's pandas engine returns object columns
  (comparison_evaluator.py works on raw Python values); here run()
  decodes per-row at action time while execute() keeps a typed frame.
"""

from __future__ import annotations

import datetime

import pytest

from pycypher_nmetl_spark.cypher.parser import parse
from pycypher_nmetl_spark.cypher.tokenizer import CypherSyntaxError


# ---------------------------------------------------------------------- #
# UNION / UNION ALL mixing is a syntax error (parser-only, no Spark)
# ---------------------------------------------------------------------- #
class TestUnionMixing:
    def test_top_level_mixed_errors(self):
        with pytest.raises(CypherSyntaxError, match="combination of UNION"):
            parse("RETURN 1 AS a UNION ALL RETURN 1 AS a UNION RETURN 2 AS a")

    def test_top_level_mixed_other_order_errors(self):
        with pytest.raises(CypherSyntaxError, match="combination of UNION"):
            parse("RETURN 1 AS a UNION RETURN 1 AS a UNION ALL RETURN 2 AS a")

    def test_homogeneous_unions_parse(self):
        parse("RETURN 1 AS a UNION RETURN 2 AS a UNION RETURN 3 AS a")
        parse("RETURN 1 AS a UNION ALL RETURN 2 AS a UNION ALL RETURN 3 AS a")

    def test_call_subquery_mixed_errors(self):
        with pytest.raises(CypherSyntaxError, match="combination of UNION"):
            parse(
                "MATCH (a) CALL { RETURN 1 AS v UNION ALL RETURN 2 AS v "
                "UNION RETURN 3 AS v } RETURN v"
            )

    def test_call_subquery_homogeneous_parses(self):
        parse(
            "MATCH (a) CALL { RETURN 1 AS v UNION RETURN 2 AS v } RETURN v"
        )


# ---------------------------------------------------------------------- #
# dyn encoding: exact longs + temporal rank (pure-python units)
# ---------------------------------------------------------------------- #
class TestDecodePy:
    def test_decode_py_values(self, spark):
        # (spark fixture: importing dynval builds module-level Columns,
        # which classic-mode pyspark only allows with an active context)
        from pycypher_nmetl_spark.compiler.dynval import (
            RANK_BOOL, RANK_DATE, RANK_DATETIME, RANK_NUMBER, RANK_STRING,
            decode_py,
        )

        assert decode_py(None) is None
        assert decode_py((RANK_STRING, "x", None, None, None, None)) == "x"
        assert decode_py((RANK_BOOL, None, True, None, None, None)) is True
        assert decode_py((RANK_NUMBER, None, None, 2.5, 0, None)) == 2.5
        v = decode_py((RANK_NUMBER, None, None, 9007199254740992.0, 1, None))
        assert v == 9007199254740993 and isinstance(v, int)
        ts = datetime.datetime(2024, 3, 1, 12, 0)
        assert decode_py((RANK_DATETIME, None, None, None, None, ts)) == ts
        assert decode_py(
            (RANK_DATE, None, None, None, None, datetime.datetime(2024, 3, 1))
        ) == datetime.date(2024, 3, 1)


# ---------------------------------------------------------------------- #
# engine-level behavior (golden fixture from conftest)
# ---------------------------------------------------------------------- #
class TestDynTemporalOrder:
    def test_mixed_order_with_dates(self, golden):
        rows = golden.run(
            "UNWIND [1, 'a', date('2024-03-01'), true, date('2020-01-01'), 'b'] "
            "AS x RETURN toString(x) AS s ORDER BY x"
        )
        # openCypher global order: DATE < STRING < BOOLEAN < NUMBER
        assert [r.s for r in rows] == [
            "2020-01-01", "2024-03-01", "a", "b", "true", "1",
        ]

    def test_min_max_over_mixed_temporal(self, golden):
        rows = golden.run(
            "UNWIND ['s', date('2024-03-01'), 3] AS x "
            "RETURN toString(min(x)) AS lo, toString(max(x)) AS hi"
        )
        assert rows[0].lo == "2024-03-01" and rows[0].hi == "3"

    def test_datetime_ranks_before_date(self, golden):
        rows = golden.run(
            "UNWIND [date('2020-01-01'), datetime('2024-06-01T10:00:00'), 'x'] "
            "AS v RETURN toString(v) AS s ORDER BY v"
        )
        s = [r.s for r in rows]
        assert s[-1] == "x"  # strings sort after all temporals
        assert s[0].startswith("2024-06-01")  # datetime rank < date rank

    def test_date_param_in_mixed_list(self, golden):
        rows = golden.run(
            "UNWIND $xs AS x RETURN toString(x) AS s ORDER BY x",
            {"xs": [datetime.date(2021, 5, 4), "zz", 7]},
        )
        assert [r.s for r in rows] == ["2021-05-04", "zz", "7"]

    def test_single_rank_date_decodes_to_date(self, golden):
        rows = golden.run(
            "UNWIND [date('2024-03-01'), 'a'] AS x "
            "WITH x WHERE NOT x = 'a' RETURN x"
        )
        assert rows[0].x == datetime.date(2024, 3, 1)


class TestExactLongOrdering:
    def test_order_beyond_2_53(self, golden):
        rows = golden.run(
            "UNWIND [9007199254740993, 9007199254740992, 'z'] AS x "
            "WITH x WHERE NOT x = 'z' RETURN toString(x) AS s ORDER BY x"
        )
        assert [r.s for r in rows] == [
            "9007199254740992", "9007199254740993",
        ]

    def test_equality_beyond_2_53(self, golden):
        rows = golden.run(
            "RETURN 9007199254740993 IN [9007199254740994, 'q'] AS a, "
            "9007199254740993 IN [9007199254740993, 'q'] AS b, "
            "1 IN [1.0, 'q'] AS c"
        )
        assert (rows[0].a, rows[0].b, rows[0].c) == (False, True, True)

    def test_exact_roundtrip_through_dyn(self, golden):
        rows = golden.run(
            "UNWIND [9007199254740993, 'k'] AS x "
            "WITH x WHERE NOT x = 'k' RETURN x"
        )
        assert rows[0].x == 9007199254740993

    def test_min_max_exact(self, golden):
        rows = golden.run(
            "UNWIND [9007199254740993, 9007199254740992, 'a'] AS x "
            "RETURN toString(min(x)) AS lo, toString(max(x)) AS hi"
        )
        # strings sort before numbers; max is the larger exact long
        assert rows[0].lo == "a" and rows[0].hi == "9007199254740993"


class TestMixedOutputDecode:
    def test_run_decodes_mixed_scalars(self, golden):
        rows = golden.run(
            "UNWIND [1, 'a', true, 2.5, date('2024-03-01')] AS x "
            "RETURN x ORDER BY x"
        )
        assert [r.x for r in rows] == [
            datetime.date(2024, 3, 1), "a", True, 1, 2.5,
        ]
        assert [type(r.x).__name__ for r in rows] == [
            "date", "str", "bool", "int", "float",
        ]

    def test_run_decodes_mixed_collect(self, golden):
        rows = golden.run("UNWIND [1, 'a'] AS x RETURN collect(x) AS xs")
        assert rows[0].xs == [1, "a"]

    def test_execute_still_raises_for_typed_frame(self, golden):
        with pytest.raises(NotImplementedError, match="multiple types"):
            golden.execute("UNWIND [1, 'a'] AS x RETURN x").collect()

    def test_single_rank_still_decodes_in_run(self, golden):
        rows = golden.run(
            "UNWIND [1, 'a', 2] AS x WITH x WHERE NOT x = 'a' "
            "RETURN x ORDER BY x"
        )
        assert [r.x for r in rows] == [1, 2]

    def test_mixed_result_not_cached_for_execute(self, golden):
        q = "UNWIND [1, 'a'] AS x RETURN x"
        assert golden.run(q)  # primes any cache
        with pytest.raises(NotImplementedError, match="multiple types"):
            golden.execute(q).collect()


class TestLambdaScopeComparisons:
    def test_dyn_filter_in_comprehension(self, golden):
        # the round-11 ADVICE repro: struct-vs-int analysis error before
        rows = golden.run("RETURN [x IN [1,'a',2] WHERE x > 0 | x] AS r")
        assert rows[0].r == [1, 2]

    def test_dyn_equality_in_comprehension(self, golden):
        rows = golden.run(
            "RETURN [x IN [1,'a',2] WHERE x = 'a' | toString(x)] AS r"
        )
        assert rows[0].r == ["a"]

    def test_cross_type_in_lambda_is_null(self, golden):
        rows = golden.run("RETURN [x IN ['a','b'] WHERE x > 0] AS r")
        assert rows[0].r == []

    def test_dyn_in_list_inside_lambda(self, golden):
        rows = golden.run(
            "RETURN [x IN [1,'a',2] WHERE x IN [2,'a'] | toString(x)] AS r"
        )
        assert rows[0].r == ["a", "2"]

    def test_quantifier_over_dyn(self, golden):
        rows = golden.run(
            "RETURN any(x IN [1,'a'] WHERE x = 'a') AS a, "
            "all(x IN [1,'a'] WHERE x > 0) AS b"
        )
        assert rows[0].a is True
        # 'a' > 0 is null; all() over {true, null} with no false -> null
        assert rows[0].b is None


class TestNondetCaseOperand:
    def test_case_rand_operand_bound_once(self, golden):
        # before the fix each WHEN drew a FRESH rand(): ~42% of rows
        # matched no branch and fell to ELSE. Bound-once, every row
        # matches exactly one of the four branches.
        rows = golden.run(
            "UNWIND range(1, 200) AS i "
            "WITH CASE toInteger(rand()*4) WHEN 0 THEN 'a' WHEN 1 THEN 'b' "
            "WHEN 2 THEN 'c' WHEN 3 THEN 'd' ELSE 'MISS' END AS v "
            "RETURN v, count(*) AS c ORDER BY v"
        )
        assert "MISS" not in {r.v for r in rows}
        assert sum(r.c for r in rows) == 200

    def test_deterministic_case_unchanged(self, golden):
        rows = golden.run(
            "UNWIND [1,2,3] AS i RETURN CASE i WHEN 1 THEN 'one' "
            "WHEN 2 THEN 'two' ELSE 'many' END AS s ORDER BY i"
        )
        assert [r.s for r in rows] == ["one", "two", "many"]

    def test_nondet_case_with_dyn_whens(self, golden):
        # nondet operand + the full Cmp machinery in the bound chain
        rows = golden.run(
            "WITH CASE toInteger(rand()*2) WHEN 0 THEN 'x' WHEN 1 THEN 'y' "
            "ELSE 'MISS' END AS v RETURN v"
        )
        assert rows[0].v in ("x", "y")


class TestPlanDeterminismFallback:
    def test_no_introspection_keeps_struct_key(self, golden, monkeypatch):
        # Spark Connect deployments have no _jdf: _plan_deterministic
        # falls back to the per-thread AST marker instead of forcing
        # every subquery onto the checkpointed-id path
        import pycypher_nmetl_spark.engine as E

        monkeypatch.setattr(E, "_PLAN_INTROSPECTION_OK", False)
        golden.run(
            "MATCH (p:Person) CALL { WITH p RETURN count(*) AS c12a } "
            "RETURN count(*) AS n"
        )
        assert golden._last_subquery_path == "struct-key"

    def test_prior_rand_clause_forces_checkpoint(self, golden, monkeypatch):
        import pycypher_nmetl_spark.engine as E

        monkeypatch.setattr(E, "_PLAN_INTROSPECTION_OK", False)
        golden.run(
            "MATCH (p:Person) WITH p, rand() AS r12 "
            "CALL { WITH p RETURN count(*) AS c12b } RETURN count(*) AS n"
        )
        assert golden._last_subquery_path == "checkpoint"

    def test_introspection_path_unchanged(self, golden):
        # with introspection available, an outer frame carrying rand()
        # is still caught by the analyzed-plan walk
        golden.run(
            "MATCH (p:Person) WITH p, rand() AS r12c "
            "CALL { WITH p RETURN count(*) AS c12c } RETURN count(*) AS n"
        )
        assert golden._last_subquery_path == "checkpoint"


class TestExplainDynRendering:
    def test_mixed_query_explains_without_raising(self, golden):
        out = golden.explain("UNWIND [1,'a'] AS x RETURN x")
        assert "ANY (mixed" in out
        assert "__cyr" not in out.split("== Spark physical plan ==")[0]

    def test_plain_schema_rendered(self, golden):
        out = golden.explain("MATCH (n:Person) RETURN n.name AS name")
        assert "name: string" in out

    def test_single_rank_dyn_decodes_in_explain(self, golden):
        out = golden.explain(
            "UNWIND [1, 'a', 2] AS x WITH x WHERE NOT x = 'a' RETURN x"
        )
        assert "x: bigint" in out


class TestLocalDatetimeRank:
    """DATETIME < LOCALDATETIME in the global order (dynval rank 5).

    This engine's own datetime() compiles to TIMESTAMP_NTZ (documented
    divergence in functions/scalar.py — year-1 survivability + DuckDB
    oracle parity), so engine-constructed datetimes are LOCAL values;
    the zoned rank applies to TimestampType SOURCE columns and tz-aware
    Python parameters."""

    def test_zoned_column_sorts_before_local(self, spark):
        from pyspark.sql import functions as F

        from pycypher_nmetl_spark import CypherEngine, GraphCatalog

        cat = GraphCatalog(spark)
        df = spark.createDataFrame([(1,)], "id long").withColumn(
            "zts", F.to_timestamp(F.lit("2030-01-01 00:00:00"))
        )
        cat.register_nodes("Q", df)
        eng = CypherEngine(cat)
        rows = eng.run(
            "MATCH (q:Q) UNWIND "
            "[q.zts, localdatetime('1999-01-01T00:00:00'), 'a'] AS x "
            "RETURN x ORDER BY x"
        )
        import datetime as dt

        # zoned 2030 ranks BEFORE local 1999 despite the later instant
        assert rows[0].x == dt.datetime(2030, 1, 1)
        assert rows[1].x == dt.datetime(1999, 1, 1)
        assert rows[2].x == "a"

    def test_aware_param_vs_naive_param_ranks(self, golden):
        import datetime as dt

        rows = golden.run(
            "UNWIND $p AS x RETURN x ORDER BY x",
            {
                "p": [
                    dt.datetime(1999, 1, 1),  # naive -> LOCALDATETIME
                    dt.datetime(
                        2030, 1, 1, tzinfo=dt.timezone.utc
                    ),  # aware -> DATETIME
                    "a",
                ]
            },
        )
        got = [r.x for r in rows]
        assert got[0].year == 2030 and got[1].year == 1999 and got[2] == "a"

    def test_uniform_localdatetime_decodes_ntz(self, golden):
        df = golden.execute(
            "UNWIND [localdatetime('2020-01-02T03:04:05'), 'z'] AS x "
            "WITH x WHERE NOT x = 'z' RETURN x"
        )
        assert "timestamp_ntz" in dict(df.dtypes)["x"]

    def test_lambda_tostring_probes_unknown_item_kind(self, golden):
        # [localdatetime(..), 1]: one item's static kind is unknowable,
        # the compiled literal is dyn-encoded — the lambda kind must come
        # from the analyzer probe, not an optimistic unify over the
        # known items (was: native struct cast printed the encoding)
        rows = golden.run(
            "RETURN [x IN [localdatetime('2020-01-02T03:04:05'), 1] "
            "| toString(x)] AS s"
        )
        assert rows[0].s == ["2020-01-02 03:04:05", "1"]
