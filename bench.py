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


def _wait_for_idle() -> tuple[float, bool]:
    """Measurement-protocol guard (VERDICT r11 #2).

    BENCH_r11.json was recorded minutes after a 2-hour 32-thread pytest
    run and read 2.2 s for a 0.77 s-idle engine; the artifact, not the
    engine, was wrong.  To stop that recurring silently: if the 1-minute
    load average exceeds SPARK_GRAFT_BENCH_MAX_LOAD (default 4.0 — a
    32-core box with a few percent background activity sits well under
    that), sleep in 15 s steps for up to SPARK_GRAFT_BENCH_WAIT_S
    (default 600 s) until it drops.  Returns (load_at_start_of_timing,
    degraded_flag); both are stamped into the JSON artifact so a
    reviewer can see the machine state the numbers were taken under.
    """
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_S", "600"))
    waited = 0.0
    load = os.getloadavg()[0]
    while load > max_load and waited < max_wait:
        print(
            f"bench: 1-min load {load:.2f} > {max_load:.2f}; "
            f"waiting for idle ({waited:.0f}/{max_wait:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(15.0)
        waited += 15.0
        load = os.getloadavg()[0]
    return load, load > max_load


def _cpu_calibration() -> float:
    """Fixed-work single-core CPU probe: median wall time (ms) of a
    2M-iteration pure-Python integer loop.  Host-level throttling /
    noisy-neighbor contention that 1-min loadavg cannot see (observed on
    this box: identical code swinging 0.92 -> 1.97 s total in
    back-to-back runs at load < 0.3) shows up directly as a higher probe
    number, so a reviewer can normalize two artifacts taken under
    different machine states.  ~240 ms on the build machine when quiet;
    300+ under the contention that degrades query timings.  Pure Python
    on purpose — BLAS/thread-pool probes measure scheduler luck, not
    core speed."""
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i * i
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return round(samples[len(samples) // 2] * 1000, 2)


def _read_proc_stat() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat line, or
    None where unavailable.  Sampled before/after the timed section;
    the delta-ratio is stamped as steal_pct — hypervisor-level CPU
    steal is the one machine-state signal that loadavg (other guests
    don't raise it) and a single-core probe (steal hits the 32-wide
    Spark stages hardest) both miss."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_1m, degraded = _wait_for_idle()
    calib_ms = _cpu_calibration()
    stat_before = _read_proc_stat()
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
    stat_after = _read_proc_stat()
    steal_pct = None
    if stat_before and stat_after and stat_after[1] > stat_before[1]:
        steal_pct = round(
            100.0
            * (stat_after[0] - stat_before[0])
            / (stat_after[1] - stat_before[1]),
            2,
        )
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
                # machine state at timing start (see _wait_for_idle):
                # load_1m is os.getloadavg()[0]; degraded=True means the
                # idle wait timed out and these numbers were taken under
                # external load — treat them as an upper bound only.
                "load_1m": round(load_1m, 2),
                "degraded": degraded,
                # fixed-work single-core probe (ms); ~240 quiet on the
                # build box.  Scale query times by (240 / calib_ms) to
                # compare artifacts across machine states.
                "calib_ms": calib_ms,
                # hypervisor CPU steal across the timed section (% of
                # all-core ticks); >2-3% explains multi-x degradation
                # that loadavg and calib_ms both miss.
                "steal_pct": steal_pct,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
