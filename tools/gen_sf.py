"""Genuine scale-factor data generator (Spark-native, deterministic).

SCALING.md's 10x/30x rows are key-shifted replicas of sf0.1 — row counts
scale but every copy is an independent shard (no cross-copy edges, same
per-key degree). This tool generates a *genuine* sf dataset with the same
schema and value distributions as the driver's /root/testdata tables
(TESTDATA.md; distributions measured from sf0.1 in round 5):

- keys dense 0..N-1; FKs uniform over the parent key space (so the join
  fan-out ACTUALLY grows with scale, unlike replicas),
- lineitem rows independent (uniform l_orderkey, linenumber 1..7) giving
  the observed Poisson(~4) lines-per-order,
- o_totalprice ~ U[1000, 500000]; l_extendedprice ~ U[900, 105000];
  acctbal ~ U[-1000, 10000]; dates uniform over the observed ranges,
- documents: random words from the observed ~30-token vocab, lang skewed
  to en (~41%), 20 uniform sources; embeddings: 64-dim clustered floats
  with 10 labels.

Everything is generated distributedly with spark.range + column
expressions (F.rand/F.randn with fixed seeds) — no driver-side loops, so
the generator itself holds at arbitrary scale.

Usage: python tools/gen_sf.py <mult> <out_dir>
  mult = multiplier over the sf0.1 row counts (10 -> "sf1").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "small", "red", "green", "shiny", "old"]
PNOUN = ["ring", "bolt", "gear", "cap", "tube", "disk", "pin", "rod"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_WORDS = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream merge data "
    "the join vector customer"
).split()
LANGS = [("en", 0.41), ("zh", 0.1525), ("es", 0.1525), ("fr", 0.1475), ("de", 0.1475)]


def _choice(col, options: list[str]):
    """Uniform pick from options keyed by a [0,1) column (JVM-side)."""
    n = len(options)
    idx = F.least(F.floor(col * n).cast("int"), F.lit(n - 1))
    return F.element_at(F.array(*[F.lit(o) for o in options]), idx + 1)


def _weighted(col, pairs: list[tuple[str, float]]):
    cum = 0.0
    expr = F.lit(pairs[-1][0])
    branches = []
    for val, w in pairs[:-1]:
        cum += w
        branches.append((cum, val))
    for cum_w, val in reversed(branches):
        expr = F.when(col < cum_w, F.lit(val)).otherwise(expr)
    return expr


def generate(spark: SparkSession, mult: int, out: str, parts: int = 32) -> None:
    os.makedirs(out, exist_ok=True)
    n_cust = 15_000 * mult
    n_supp = 1_000 * mult
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_line = 600_000 * mult
    n_evt = 100_000 * mult
    n_doc = 5_000 * mult
    n_emb = 2_000 * mult

    def rng(n, p=parts):
        return spark.range(0, n, 1, p)

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    write(
        rng(5, 1).select(
            F.col("id").cast("int").alias("r_regionkey"),
            _choice(F.col("id") / 5.0, REGIONS).alias("r_name"),
        ),
        "region",
    )
    write(
        rng(25, 1).select(
            F.col("id").cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
            (F.col("id") % 5).cast("int").alias("n_regionkey"),
        ),
        "nation",
    )
    write(
        rng(n_cust).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
            F.floor(F.rand(SEED + 1) * 25).cast("int").alias("c_nationkey"),
            F.round(F.rand(SEED + 2) * 11_000 - 1_000, 2).alias("c_acctbal"),
            _choice(F.rand(SEED + 3), SEGMENTS).alias("c_mktsegment"),
        ),
        "customer",
    )
    write(
        rng(n_supp).select(
            F.col("id").alias("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
            F.floor(F.rand(SEED + 4) * 25).cast("int").alias("s_nationkey"),
            F.round(F.rand(SEED + 5) * 11_000 - 1_000, 2).alias("s_acctbal"),
        ),
        "supplier",
    )
    write(
        rng(n_part).select(
            F.col("id").alias("p_partkey"),
            F.concat_ws(
                " ", _choice(F.rand(SEED + 6), PADJ), _choice(F.rand(SEED + 7), PNOUN)
            ).alias("p_name"),
            F.concat(F.lit("Brand#"), F.floor(F.rand(SEED + 8) * 25).cast("int")).alias(
                "p_brand"
            ),
            _choice(F.rand(SEED + 9), PTYPES).alias("p_type"),
            (F.floor(F.rand(SEED + 10) * 50) + 1).cast("int").alias("p_size"),
            F.round(F.lit(900.0) + (F.col("id") % 1000) / 10.0, 1).alias(
                "p_retailprice"
            ),
        ),
        "part",
    )
    base_date = F.to_timestamp(F.lit("1995-01-01"))
    write(
        rng(n_ord).select(
            F.col("id").alias("o_orderkey"),
            F.floor(F.rand(SEED + 11) * n_cust).alias("o_custkey"),
            _choice(F.rand(SEED + 12), STATUSES).alias("o_orderstatus"),
            F.round(F.rand(SEED + 13) * 499_000 + 1_000, 2).alias("o_totalprice"),
            F.timestamp_add(
                "DAY", F.floor(F.rand(SEED + 14) * 2405).cast("int"), base_date
            ).alias("o_orderdate"),
            _choice(F.rand(SEED + 15), PRIORITIES).alias("o_orderpriority"),
        ),
        "orders",
    )
    write(
        rng(n_line).select(
            F.floor(F.rand(SEED + 16) * n_ord).alias("l_orderkey"),
            F.floor(F.rand(SEED + 17) * n_part).alias("l_partkey"),
            F.floor(F.rand(SEED + 18) * n_supp).alias("l_suppkey"),
            (F.floor(F.rand(SEED + 19) * 7) + 1).cast("int").alias("l_linenumber"),
            (F.floor(F.rand(SEED + 20) * 50) + 1).cast("double").alias("l_quantity"),
            F.round(F.rand(SEED + 21) * 104_100 + 900, 2).alias("l_extendedprice"),
            F.round(F.floor(F.rand(SEED + 22) * 11) / 100.0, 2).alias("l_discount"),
            F.round(F.floor(F.rand(SEED + 23) * 9) / 100.0, 2).alias("l_tax"),
            _choice(F.rand(SEED + 24), ["A", "N", "R"]).alias("l_returnflag"),
            _choice(F.rand(SEED + 25), ["F", "O"]).alias("l_linestatus"),
            F.timestamp_add(
                "DAY", F.floor(F.rand(SEED + 26) * 2499 + 1).cast("int"), base_date
            ).alias("l_shipdate"),
        ),
        "lineitem",
    )
    evt_base = F.to_timestamp(F.lit("2024-01-01"))
    write(
        rng(n_evt).select(
            F.col("id").alias("event_id"),
            F.timestamp_add(
                "SECOND",
                F.floor(F.rand(SEED + 27) * 30 * 86_400).cast("int"),
                evt_base,
            ).alias("ts"),
            F.floor(F.rand(SEED + 28) * (n_cust // 10)).alias("user_id"),
            _choice(F.rand(SEED + 29), EVENT_TYPES).alias("event_type"),
            # exponential with mean ~50 (observed median 34.8, mean 49.9)
            F.round(-F.log(F.rand(SEED + 30)) * 50.0, 2).alias("value"),
            F.format_string(
                '{"k": %d}', F.floor(F.rand(SEED + 31) * 100).cast("int")
            ).alias("props"),
        ),
        "events",
    )
    # documents: length ~ U[8, 70] words from the fixed vocab
    n_words = (F.floor(F.rand(SEED + 32) * 63) + 8).cast("int")
    word_arr = F.array(*[F.lit(w) for w in DOC_WORDS])
    nvoc = len(DOC_WORDS)
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                word_arr,
                (
                    F.pmod(
                        F.hash(F.col("id") * 1_000_003 + i * 7_919 + SEED), F.lit(nvoc)
                    )
                    + 1
                ).cast("int"),
            ),
        ),
    )
    write(
        # u_lang materialized first: referencing one F.rand expression from
        # several CASE branches desynchronizes its per-evaluation RNG state
        rng(n_doc)
        .withColumn("u_lang", F.rand(SEED + 33))
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            _weighted(F.col("u_lang"), LANGS).alias("lang"),
            F.concat(F.lit("src"), F.floor(F.rand(SEED + 34) * 20).cast("int")).alias(
                "source"
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars"),
        "documents",
    )
    # embeddings: 10 clusters, center offset per label + gaussian noise
    label = F.floor(F.rand(SEED + 35) * 10).cast("int")
    emb = rng(n_emb).select(F.col("id").alias("vec_id"), label.alias("label"))
    dims = [
        (
            F.randn(SEED + 100 + d) * 0.3
            + F.when((F.col("label") % 8) == (d % 8), F.lit(2.0)).otherwise(F.lit(0.0))
        ).cast("float")
        for d in range(64)
    ]
    write(
        emb.select("vec_id", F.array(*dims).alias("embedding"), "label"),
        "embeddings",
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_gen_sf{mult}x"
    from pycypher_nmetl_spark import get_spark

    spark = get_spark(app_name="gen-sf")
    generate(spark, mult, out)
    print(f"wrote mult={mult} dataset to {out}")


if __name__ == "__main__":
    main()
