"""Time one declared gate query with the noop sink (guide §1.4).

Usage: python tools/time_query_noop.py <query_name> [sf_dir] [reps]

Builds the query exactly as the driver does (``__spark_entry__.queries()``),
runs one untimed warm-up, then ``reps`` timed noop writes and prints the
median/mean/min/max — the computation only, no driver collect.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pycypher_nmetl_spark import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark(app_name=f"noop-{name}")
    build = entry.queries()[name]

    def run() -> float:
        df = build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    spark.sparkContext.setJobDescription(f"noop warmup: {name}")
    run()  # warm-up, untimed
    spark.sparkContext.setJobDescription(f"noop timed: {name}")
    samples = sorted(run() for _ in range(reps))
    med = samples[len(samples) // 2]
    print(
        f"NOOP {name} sf={sf_dir} reps={reps} "
        f"median={med:.4f}s mean={sum(samples)/len(samples):.4f}s "
        f"min={samples[0]:.4f}s max={samples[-1]:.4f}s load1={os.getloadavg()[0]:.2f}"
    )


if __name__ == "__main__":
    main()
