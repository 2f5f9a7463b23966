"""Capture .explain("formatted") for bench + declared queries.

Writes plans/r12/<name>_<tag>.txt for every lazily-compilable query:
the 9 bench queries + qpp_reach at $SPARK_GRAFT_SF_DIR (default sf0.1,
materialized graph — the bench footing), and the Cypher/LLM/temporal
gate queries at sf0.01 (the oracle footing).  Gates whose callables
mutate a throwaway catalog or drive a streaming query are skipped —
their "plan" is a sequence of actions, not one tree (they are measured
by wall time in OPTIMIZATION_r12.md instead).

Usage: python tools/capture_plans.py <tag> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# gates that execute eagerly (mutation / streaming) — no single lazy plan
SKIP = {
    "mutation_roundtrip",
    "merge_on_match",
    "stream_window_agg",
    "stream_session_window",
    "stream_static_join",
}


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from bench import BENCH_QUERIES

    from pycypher_nmetl_spark import CypherEngine, GraphCatalog, get_spark

    spark = get_spark(app_name="capture_plans")

    # bench footing: sf0.1 + materialized derived graph
    sf_bench = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    eng = CypherEngine(
        GraphCatalog.from_tpch(spark, sf_bench, materialize_derived=True)
    )
    bench_names = set()
    for name, cypher in list(BENCH_QUERIES) + [
        ("qpp_reach", entry._CYPHER_QUERIES["qpp_reach"])
    ]:
        if only and name not in only:
            continue
        bench_names.add(name)
        df = eng.execute(cypher)
        with open(f"{outdir}/{name}_{tag}.txt", "w") as fh:
            fh.write(f"-- {name} @ {sf_bench} (materialized graph)\n")
            fh.write(f"-- {cypher}\n\n")
            fh.write(explain_str(df))
        print(f"wrote {name}_{tag}.txt")

    # gate footing: sf0.01, raw catalog (same as tools/check_oracle.py)
    sf_gate = "/root/testdata/sf0.01"
    for name, fn in entry.queries().items():
        if name in SKIP or name in bench_names:
            continue
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_gate)
        except Exception as e:  # noqa: BLE001
            print(f"skip {name}: {type(e).__name__}: {e}")
            continue
        with open(f"{outdir}/{name}_{tag}.txt", "w") as fh:
            fh.write(f"-- {name} @ {sf_gate} (gate footing)\n\n")
            fh.write(explain_str(df))
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
