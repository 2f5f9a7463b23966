"""Measure shared-scan reuse: one batch of queries over a common MATCH
prefix, executed plain vs share_scans=True.

Usage: python tools/bench_share_scans.py [out.json]
Dataset: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

The batch is the multi-output report shape the feature targets: K
aggregations over the same joined pattern. Plain mode scans+joins the
pattern K times; shared mode materializes it once (MEMORY_AND_DISK) and
every aggregation reads the persisted frame.
"""

from __future__ import annotations

import json
import os
import sys
import time

PREFIX = (
    "MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(p:Part) "
    "WHERE l.quantity > 10 "
)
BATCH = [
    PREFIX + "RETURN c.mktsegment AS seg, count(*) AS lines",
    PREFIX + "RETURN c.mktsegment AS seg, round(sum(l.extendedprice), 2) AS revenue",
    PREFIX + "RETURN o.orderstatus AS status, count(*) AS cnt",
    PREFIX + "RETURN c.nationkey AS nation, round(avg(l.discount), 4) AS avg_disc",
    PREFIX + "RETURN p.brand AS brand, max(l.extendedprice) AS max_price",
    PREFIX + "RETURN count(DISTINCT c.custkey) AS active_customers",
]


def run_batch(engine, share: bool) -> float:
    t0 = time.perf_counter()
    dfs = engine.execute_many(BATCH, share_scans=share)
    for df in dfs:
        df.collect()
    elapsed = time.perf_counter() - t0
    engine.release_shared_scans()
    return elapsed


def main() -> None:
    sys.path.insert(0, ".")
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog, get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_share_scans")
    engine = CypherEngine(
        GraphCatalog.from_tpch(spark, sf_dir), cache_results=False
    )

    # warm-up: JVM + parquet footer caches, both paths
    run_batch(engine, share=False)
    run_batch(engine, share=True)

    plain = min(run_batch(engine, share=False) for _ in range(3))
    shared = min(run_batch(engine, share=True) for _ in range(3))
    rec = {
        "metric": "share_scans_batch_sec",
        "queries": len(BATCH),
        "plain_s": round(plain, 4),
        "shared_s": round(shared, 4),
        "speedup": round(plain / shared, 2),
        "sf_dir": sf_dir,
    }
    print(json.dumps(rec))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(rec, f)


if __name__ == "__main__":
    main()
