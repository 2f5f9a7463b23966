"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query names mirror the reference's baseline_report.json workload
(BASELINE.md) re-expressed on the TPC-H-ish graph at comparable row
scales; timings include full execution + collect to the driver (same
materialization the pandas reference pays).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# (name, cypher) — shapes matching BASELINE.md's workload
BENCH_QUERIES = [
    ("simple_scan", "MATCH (o:Order) RETURN o.orderpriority AS p, o.totalprice AS t"),
    (
        "filtered_scan",
        "MATCH (o:Order) WHERE o.totalprice > 150000.0 "
        "RETURN o.orderpriority AS p, o.totalprice AS t",
    ),
    (
        "single_hop",
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "RETURN c.name AS cust, o.totalprice AS total",
    ),
    (
        "filtered_hop",
        "MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE c.acctbal > 0.0 "
        "RETURN c.name AS cust, o.totalprice AS total, o.orderstatus AS st",
    ),
    (
        "two_hop",
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN c.name AS cust, r.name AS region",
    ),
    (
        "aggregation_count",
        "MATCH (c:Customer) RETURN c.mktsegment AS seg, count(*) AS cnt",
    ),
    (
        "aggregation_avg",
        "MATCH (c:Customer) RETURN c.mktsegment AS seg, avg(c.acctbal) AS avg_bal",
    ),
    (
        "varlength_path",
        "MATCH (a:Lineitem)-[:NEXT_LINE*1..3]->(b:Lineitem) "
        "WHERE a.linenumber = 1 RETURN a.orderkey AS ok, b.linenumber AS ln",
    ),
    (
        "agg_pricing_summary",
        "MATCH (:Order)-[l:CONTAINS]->(:Part) WHERE l.shipdate.year <= 1997 "
        "RETURN l.returnflag AS rf, l.linestatus AS ls, "
        "round(sum(l.quantity), 2) AS sum_qty, count(*) AS cnt",
    ),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog, get_spark

    spark = get_spark(app_name="bench")
    # materialize_derived: one-time graph-projection build (same warm-graph
    # footing the reference's baseline measures from; see
    # GraphCatalog.materialize docstring for the measured plan effect)
    engine = CypherEngine(
        GraphCatalog.from_tpch(spark, sf_dir, materialize_derived=True)
    )

    # warm the JVM/readers so fixed startup cost isn't billed to query 1
    engine.execute("MATCH (r:Region) RETURN count(*) AS c").collect()

    # Per-query protocol (VERDICT r7 #5 — rep spreads up to 10x made
    # ±10% deltas unreadable): one UNTIMED warm-up execution first (pays
    # compile + codegen + shuffle-file warm for that exact plan), then
    # n>=5 timed reps; report the median (mean alongside). Single-run
    # timings at this scale carry ~±0.1s of JVM/GC/OS noise (the
    # round-2 "uniform +0.08s/query regression" was exactly that).
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    timings: dict[str, float] = {}
    means: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for name, q in BENCH_QUERIES:
        engine.execute(q).toPandas()  # warm-up, untimed
        samples: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            # Arrow-batched materialization to the driver — the same
            # pandas-DataFrame endpoint the reference's pandas backend pays
            out = engine.execute(q).toPandas()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)
        means[name] = round(sum(samples) / len(samples), 4)
        spread[name] = [round(samples[0], 4), round(samples[-1], 4)]
        rows[name] = len(out)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "mean": means,
                "rows": rows,
                "reps": reps,
                "min_max": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
