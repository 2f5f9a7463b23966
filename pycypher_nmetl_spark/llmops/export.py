"""Training-data export operators: deterministic splits, stratified
sampling, global shuffle, and sequence packing.

The last mile of a 100 TB curation pipeline: after dedup + quality
filtering, the corpus must be split train/val/test, optionally
down-sampled per stratum (language, source, quality bucket), globally
shuffled so training batches are i.i.d., and packed into fixed-length
token sequences. Reference scope: the pycypher-nmetl pipeline stops at
load/transform (packages/nmetl/src/nmetl/pipeline.py); these operators
are the beyond-reference extension SURVEY.md §7.2 M8 calls for.

Scale notes (the design constraints, in one place):
- split/stratified_sample are pure column expressions on a 64-bit hash
  — no shuffle, no state, reproducible across runs and cluster sizes,
  stable under repartitioning (they depend only on the key value).
- global_shuffle is exactly one shuffle (repartition on a keyed hash)
  plus a partition-local sort; at 100 TB this is the unavoidable
  shuffle and nothing more.
- pack_sequences packs within partitions (mapInPandas, Arrow-batched).
  Cross-partition packing would need a global sort by length — the
  partition-local greedy pack is the standard large-corpus approach
  (waste is bounded by max_tokens per partition tail).
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unit_hash(key: Column, seed: int) -> Column:
    """Deterministic uniform [0, 1) from a key column and a seed.

    xxhash64 is a JVM-side 64-bit avalanche hash; the sign bit is
    cleared so the ratio is over [0, 2^63)."""
    h = F.xxhash64(key.cast("string"), F.lit(seed))
    return (h.bitwiseAND(F.lit((1 << 63) - 1))) / F.lit(float(1 << 63))


def split(
    df: DataFrame,
    weights: dict[str, float],
    key: str,
    seed: int = 0,
    out: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hashing `key`.

    Unlike randomSplit, the assignment is a pure function of
    (key value, seed): re-running on re-partitioned, re-ordered, or
    incrementally-grown data keeps every existing row in its split —
    the property training pipelines need so val/test never leak into
    train between runs. Weights are normalized; splits are disjoint and
    exhaustive.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {name: weight} dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    u = _unit_hash(F.col(key), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key: str,
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    Like DataFrame.sampleBy but reproducible and repartition-stable:
    row keep/drop depends only on (key value, seed), so the same row
    set survives across runs and cluster layouts. Strata missing from
    `fractions` keep `default_fraction` (0.0 = dropped)."""
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    u = _unit_hash(F.col(key), seed)
    frac_expr = None
    for s, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(s)
        branch = F.when(cond, F.lit(float(frac)))
        frac_expr = branch if frac_expr is None else frac_expr.when(cond, F.lit(float(frac)))
    frac_expr = (
        F.lit(float(default_fraction))
        if frac_expr is None
        else frac_expr.otherwise(F.lit(float(default_fraction)))
    )
    return df.where(u < frac_expr)


def global_shuffle(
    df: DataFrame, key: str, seed: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic global shuffle: every row gets a pseudo-random
    rank (hash of key + seed), rows are range-free repartitioned on it
    and sorted within partitions.

    One shuffle total. Reading the output partition files in order
    yields a reproducible permutation of the corpus — what a training
    job needs for i.i.d. batches without a driver-side permutation.

    `key` must be unique per row for the permutation to be fully
    deterministic: duplicate key values hash to identical ranks, and
    the relative order WITHIN such a tie is partition-layout dependent.
    (No deterministic tiebreak exists without reading every column;
    pipelines should pass their document id.)"""
    rank = F.xxhash64(F.col(key).cast("string"), F.lit(seed)).alias("_shuffle_rank")
    out = df.withColumn("_shuffle_rank", rank)
    out = (
        out.repartition(num_partitions, F.col("_shuffle_rank"))
        if num_partitions
        else out.repartition(F.col("_shuffle_rank"))
    )
    return out.sortWithinPartitions("_shuffle_rank").drop("_shuffle_rank")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    max_tokens: int,
    out_ids: str = "doc_ids",
    out_len: str = "seq_len",
) -> DataFrame:
    """Greedy first-fit packing of documents into training sequences of
    at most `max_tokens` tokens (partition-local, Arrow-batched).

    Returns one row per packed sequence: (doc_ids array, seq_len).
    Documents longer than max_tokens become singleton sequences (the
    caller chunks or drops them). Packing is deterministic given the
    partitioning — pair with global_shuffle for reproducible runs."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    import pandas as pd

    schema = f"{out_ids} array<string>, {out_len} long"

    # first-fit over a bounded window of open bins: O(docs * window)
    # per partition, constant memory for the open set — a full
    # first-fit over every bin ever opened would be quadratic in
    # partition size
    window = 64

    # flush threshold for closed bins: memory is bounded by
    # window + flush_at bins regardless of partition size (a
    # partition-lifetime `closed` list would grow with the partition)
    flush_at = 4096

    def _pack(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        open_bins: list[list] = []  # [ids, used]
        closed: list[list] = []

        def _flush() -> pd.DataFrame:
            # explicit dtypes: an empty plain DataFrame defaults its
            # columns to float64 ndarrays, which Arrow refuses to
            # convert to list<string> (empty partitions hit this)
            out = pd.DataFrame(
                {
                    out_ids: pd.Series([b[0] for b in closed], dtype=object),
                    out_len: pd.Series([b[1] for b in closed], dtype="int64"),
                }
            )
            closed.clear()
            return out

        for pdf in batches:
            for doc_id, n in zip(pdf[id_col], pdf[len_col]):
                n = int(n)
                for b in open_bins:
                    if b[1] + n <= max_tokens:
                        b[0].append(str(doc_id))
                        b[1] += n
                        break
                else:
                    open_bins.append([[str(doc_id)], n])
                    if len(open_bins) > window:
                        closed.append(open_bins.pop(0))
                        if len(closed) >= flush_at:
                            yield _flush()
        closed.extend(open_bins)
        yield _flush()

    return df.select(id_col, len_col).mapInPandas(_pack, schema=schema)
