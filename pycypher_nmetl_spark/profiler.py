"""Per-query profiler (reference: query_profiler.py:30-250).

The reference interprets clause-by-clause, so its profiler reports
per-clause *execution* wall time. This engine compiles all clauses into
ONE fused Spark plan (that fusion is the optimization story), so the
honest equivalents are:

- per-clause COMPILE wall time (the driver-side cost of each clause,
  from the engine's clause loop instrumentation),
- one fused EXECUTE wall time with the result row count,
- Catalyst's row/size estimates for the optimized plan, and
- the formatted physical-plan excerpt (where the real execution
  structure — joins, exchanges, pushed filters — is visible).

Recommendations combine the reference's timing/structure heuristics
with Spark-plan ones (cartesian products, exchange counts).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

_SLOW_PARSE_MS = 10.0
_SLOW_COMPILE_MS = 200.0
_SLOW_CLAUSE_MS = 100.0
_LARGE_RESULT_ROWS = 10_000
_MANY_EXCHANGES = 4


@dataclass(frozen=True)
class ProfileReport:
    """Profiling result for one query execution."""

    query: str
    total_time_ms: float
    parse_time_ms: float
    compile_time_ms: float
    execute_time_ms: float
    clause_timings: dict[str, float]  # per-clause compile ms
    row_count: int
    estimated_rows: int | None  # Catalyst optimized-plan estimate
    estimated_bytes: int | None
    hotspot: str | None
    recommendations: list[str]
    physical_plan: str = ""

    def __str__(self) -> str:
        lines = [
            f"Query Profile: {self.query[:80]}",
            (
                f"Total: {self.total_time_ms:.1f}ms  "
                f"(parse={self.parse_time_ms:.1f}ms, "
                f"compile={self.compile_time_ms:.1f}ms, "
                f"execute={self.execute_time_ms:.1f}ms)"
            ),
            f"Rows: {self.row_count}"
            + (
                f"  (Catalyst estimate: {self.estimated_rows} rows"
                + (
                    f", {self.estimated_bytes} bytes)"
                    if self.estimated_bytes is not None
                    else ")"
                )
                if self.estimated_rows is not None
                else ""
            ),
            "Clause compile breakdown:",
        ]
        for clause, ms in sorted(
            self.clause_timings.items(), key=lambda x: x[1], reverse=True
        ):
            denom = self.compile_time_ms or 1.0
            marker = " <-- HOTSPOT" if clause == self.hotspot else ""
            lines.append(f"  {clause}: {ms:.1f}ms ({ms / denom * 100:.0f}%){marker}")
        if self.recommendations:
            lines.append("Recommendations:")
            lines.extend(f"  - {r}" for r in self.recommendations)
        if self.physical_plan:
            lines.append("Physical plan:")
            lines.extend("  " + ln for ln in self.physical_plan.splitlines())
        return "\n".join(lines)


@dataclass
class QueryProfiler:
    """Profiles query executions against a CypherEngine
    (reference: query_profiler.py QueryProfiler, minus the
    pandas-backend instrumentation that has no Spark analogue)."""

    engine: Any
    history: list[ProfileReport] = field(default_factory=list)

    def profile(
        self, query: str, *, parameters: dict[str, Any] | None = None
    ) -> ProfileReport:
        from pycypher_nmetl_spark.cypher.parser import parse

        t0 = time.perf_counter()
        parse(query)  # measured separately; execute() re-parses (cached cheap)
        parse_ms = (time.perf_counter() - t0) * 1000.0

        # reset first: a result-cache hit skips _run_clauses entirely, and
        # a stale report from the previous query would be misattributed
        self.engine.last_compile_report = []
        t1 = time.perf_counter()
        df = self.engine.execute(query, parameters)
        compile_ms = (time.perf_counter() - t1) * 1000.0
        clause_timings = {
            name: ms * 1000.0
            for name, ms in getattr(self.engine, "last_compile_report", [])
        }

        est_rows = est_bytes = None
        plan = ""
        try:
            jqe = df._jdf.queryExecution()
            stats = jqe.optimizedPlan().stats()
            if stats.rowCount().isDefined():
                est_rows = int(str(stats.rowCount().get()))
            est_bytes = int(str(stats.sizeInBytes()))
            mode = self.engine.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = jqe.explainString(mode)
        except Exception:  # noqa: BLE001 — empty mutation results have no plan
            pass

        t2 = time.perf_counter()
        row_count = df.count()
        execute_ms = (time.perf_counter() - t2) * 1000.0
        total_ms = (time.perf_counter() - t0) * 1000.0

        hotspot = (
            max(clause_timings, key=clause_timings.get) if clause_timings else None
        )
        recs = _generate_recommendations(
            query=query,
            parse_ms=parse_ms,
            compile_ms=compile_ms,
            clause_timings=clause_timings,
            row_count=row_count,
            hotspot=hotspot,
            physical_plan=plan,
        )
        report = ProfileReport(
            query=query,
            total_time_ms=total_ms,
            parse_time_ms=parse_ms,
            compile_time_ms=compile_ms,
            execute_time_ms=execute_ms,
            clause_timings=clause_timings,
            row_count=row_count,
            estimated_rows=est_rows,
            estimated_bytes=est_bytes,
            hotspot=hotspot,
            recommendations=recs,
            physical_plan=plan,
        )
        self.history.append(report)
        return report

    def metrics_summary(self) -> dict[str, Any]:
        """Aggregate clause-compile totals across profiled queries
        (reference: query_profiler.py:215-248)."""
        clause_totals: dict[str, float] = {}
        for report in self.history:
            for clause, ms in report.clause_timings.items():
                clause_totals[clause] = clause_totals.get(clause, 0.0) + ms
        return {
            "query_count": len(self.history),
            "clause_timings": clause_totals,
            "total_ms": sum(r.total_time_ms for r in self.history),
        }


def _generate_recommendations(
    *,
    query: str,
    parse_ms: float,
    compile_ms: float,
    clause_timings: dict[str, float],
    row_count: int,
    hotspot: str | None,
    physical_plan: str,
) -> list[str]:
    """Timing + structure + Spark-plan heuristics (reference:
    query_profiler.py:251-330, extended with plan-shape checks)."""
    recs: list[str] = []
    query_upper = query.upper()

    if parse_ms > _SLOW_PARSE_MS:
        recs.append(
            f"Parse time ({parse_ms:.0f}ms) is high. "
            "Consider caching parsed ASTs for repeated queries."
        )
    if compile_ms > _SLOW_COMPILE_MS:
        recs.append(
            f"Compile time ({compile_ms:.0f}ms) is high. "
            "Complex query structure may benefit from simplification."
        )
    if hotspot == "Match" and clause_timings.get("Match", 0) > _SLOW_CLAUSE_MS:
        recs.append(
            f"MATCH clause dominates compile ({clause_timings['Match']:.0f}ms). "
            "Consider adding WHERE predicates to reduce scan scope."
        )
    if row_count > _LARGE_RESULT_ROWS:
        recs.append(
            f"Large result set ({row_count} rows). "
            "Consider adding LIMIT or more selective WHERE predicates."
        )
    match_count = query_upper.count("MATCH")
    if match_count > 2:
        recs.append(
            f"Query has {match_count} MATCH clauses. "
            "Multiple MATCH patterns may cause expensive cross-products."
        )
    if "CartesianProduct" in physical_plan or "BroadcastNestedLoopJoin" in physical_plan:
        recs.append(
            "Physical plan contains a cartesian/nested-loop join. "
            "Join the patterns on a shared variable to get a hash join."
        )
    n_exchanges = physical_plan.count("Exchange")
    if n_exchanges > _MANY_EXCHANGES:
        recs.append(
            f"Physical plan has {n_exchanges} exchanges (shuffles). "
            "Reordering predicates or pre-aggregating with WITH may cut them."
        )
    return recs
