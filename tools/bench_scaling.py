"""Scaling measurement: run the bench workload at sf0.1 and at a
synthesized ~sf1 (10x) replica, and report per-query scaling exponents.

The driver ships sf0.001/0.01/0.1 only; the 10x dataset is built once in
/tmp by unioning K key-shifted copies of the sf0.1 tables (keys offset
by copy*stride so joins fan out exactly like independent shards — row
counts scale by K, join selectivity is preserved, no synthetic-data
invention beyond replication).

Usage: python tools/bench_scaling.py [K] [out.json]
Writes SCALING.md + JSON; exponent = log(t_K / t_1) / log(K) per query
(1.0 = linear in data, < 1 = sublinear / overhead-amortized).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402

BASE = "/root/testdata/sf0.1"
KEYED = {
    # table -> columns that must be shifted so copies don't merge
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 10_000_000


def build_replica(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for table, keys in KEYED.items():
        target = f"{out_dir}/{table}.parquet"
        if os.path.exists(target):
            continue
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        parts = []
        for i in range(k):
            c = df
            for key in keys:
                if key in df.columns:
                    c = c.withColumn(key, F.col(key) + F.lit(i * STRIDE))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(target)


def run_bench(spark, sf_dir: str, reps: int = 3) -> dict[str, float]:
    """Median of `reps` warm runs per query (bench.py methodology).

    A full unmeasured warm-up pass runs first: the FIRST dataset
    benched in a JVM otherwise absorbs all one-time codegen/reader
    costs, which inflated the small-scale numbers and produced
    negative scaling exponents (measured: 2.25 s vs 0.40 s for the
    same scan, smaller dataset first)."""
    import statistics

    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    engine = CypherEngine(
        GraphCatalog.from_tpch(spark, sf_dir, materialize_derived=True)
    )
    engine.execute("MATCH (r:Region) RETURN count(*) AS c").collect()
    for _, q in BENCH_QUERIES:  # unmeasured warm-up pass
        engine.execute(q).toPandas()
    samples: dict[str, list[float]] = {name: [] for name, _ in BENCH_QUERIES}
    for _ in range(reps):
        for name, q in BENCH_QUERIES:
            t0 = time.perf_counter()
            engine.execute(q).toPandas()
            samples[name].append(time.perf_counter() - t0)
    return {name: round(statistics.median(ts), 4) for name, ts in samples.items()}


def parse_args(argv: list[str]) -> tuple[list[int], list[int], str]:
    """`N` -> key-shifted replica factor, `genN` -> genuine regenerated
    scale, anything else -> output path. No factor args at all (with or
    without an output path) defaults to a 10x replica."""
    ks = [int(a) for a in argv if a.isdigit()]
    gens = [int(a[3:]) for a in argv if a.startswith("gen") and a[3:].isdigit()]
    if not ks and not gens:
        ks = [10]
    out_path = next(
        (a for a in argv if not a.isdigit() and not (a.startswith("gen") and a[3:].isdigit())),
        "SCALING.json",
    )
    return ks, gens, out_path


def main() -> None:
    # replication factors and/or genuine regenerated scales:
    #   python tools/bench_scaling.py 10 30 gen10
    # `N`    -> key-shifted replica of sf0.1 at Nx (shards, degree preserved)
    # `genN` -> genuine Nx dataset from tools/gen_sf.py (real distribution:
    #           FK fan-out and group cardinalities actually grow with scale)
    ks, gens, out_path = parse_args(sys.argv[1:])
    from pycypher_nmetl_spark import get_spark

    spark = get_spark(app_name="bench-scaling")
    t1 = run_bench(spark, BASE)
    results = {}
    builds = {}
    for k in ks:
        replica = f"/tmp/spark_graft_sf{k}x"
        t0 = time.time()
        build_replica(spark, k, replica)
        builds[k] = round(time.time() - t0, 1)
        results[k] = run_bench(spark, replica)
    for g in gens:
        gen_dir = f"/tmp/spark_graft_gen_sf{g}x"
        t0 = time.time()
        if not os.path.exists(f"{gen_dir}/lineitem.parquet"):
            from gen_sf import generate  # noqa: E402 (same tools dir)

            generate(spark, g, gen_dir)
        builds[f"gen{g}"] = round(time.time() - t0, 1)
        results[f"gen{g}"] = run_bench(spark, gen_dir)
    ks = ks + [f"gen{g}" for g in gens]

    report = {}
    for name in t1:
        row = {"sf0.1_s": t1[name]}
        for k in ks:
            tk = results[k][name]
            factor = int(str(k).removeprefix("gen"))
            exp = math.log(max(tk, 1e-3) / max(t1[name], 1e-3)) / math.log(factor)
            row[f"x{k}_s"] = tk
            row[f"exp{k}"] = round(exp, 3)
        report[name] = row
    payload = {"ks": ks, "build_s": builds, "queries": report}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)

    klabels = " ".join(f"{k}x" for k in ks)
    lines = [
        "# SCALING — bench workload at sf0.1 vs scaled datasets "
        f"({klabels})",
        "",
        "`Nx` columns = key-shifted replicas of sf0.1 (independent shards,",
        "degree distribution preserved). `genNx` columns = genuine Nx data",
        "from tools/gen_sf.py (same recipe/distributions as TESTDATA.md,",
        "FK fan-out and group cardinality actually grow with scale).",
        "",
        "exponent = log(t_big/t_small)/log(k): 1.0 = linear in data,",
        "< 1 = sublinear (fixed overhead amortizing away), > 1 = a plan",
        "that degrades superlinearly and needs attention.",
        "",
        "| query | sf0.1 (s) | "
        + " | ".join(f"{k}x (s) | exp{k}" for k in ks) + " |",
        "|---|---|" + "---|---|" * len(ks),
    ]
    for name, r in report.items():
        cells = [str(r["sf0.1_s"])]
        for k in ks:
            cells += [str(r[f"x{k}_s"]), str(r[f"exp{k}"])]
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
