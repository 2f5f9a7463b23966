"""Eval-set decontamination: n-gram overlap between a training corpus
and held-out evaluation/benchmark documents.

The standard training-data hygiene pass (the n-gram collision check
described in the GPT-3 / PaLM / Llama data reports): a training document
is *contaminated* by an eval document when a meaningful fraction of the
eval document's word n-grams also appear in the training document.

Scale design (100 TB train corpus, small eval suite):
  * The eval side is shingled, hashed (xxhash64) and **broadcast** —
    eval suites are thousands-to-millions of n-grams, far under the
    broadcast ceiling — so the join against the exploded train shingles
    is a map-side BroadcastHashJoin: the 100 TB side is never shuffled
    for the join.
  * The only shuffle in the whole pass is the (train_id, eval_id)
    overlap-count aggregation, and it runs on the *matching* rows only
    (post-join), which is tiny unless the corpus genuinely contains the
    eval set.
  * Shingles are distinct per document (``array_distinct`` inside
    :func:`~pycypher_nmetl_spark.llmops.dedup.shingles`), so no
    dedup shuffle is needed before the explode.
  * ``broadcast_eval=False`` falls back to a plain shuffle join for the
    rare giant-eval-suite case; AQE will still broadcast if the built
    side turns out small.

Everything is JVM-side column expressions — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycypher_nmetl_spark.llmops.dedup import shingles


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    n: int = 8,
    min_contamination: float = 0.0,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(train_id, eval_id, shared, eval_ngrams, contamination) for every
    train/eval document pair sharing at least one word ``n``-gram.

    ``contamination`` is the fraction of the eval document's distinct
    n-grams found in the train document — directional on purpose (a
    10-word benchmark prompt quoted inside a 10k-word train document is
    100% contaminated even though the train document barely overlaps in
    the other direction).

    Eval documents shorter than ``n`` tokens have no n-grams and produce
    no pairs (callers should screen those separately with a smaller
    ``n`` if they matter).

    ``min_contamination`` filters pairs below the threshold *after* the
    exact overlap count — it does not change what is counted.
    """
    eid = eval_id_col or id_col
    etx = eval_text_col or text_col

    ev = eval_df.select(
        F.col(eid).alias("eval_id"),
        shingles(F.col(etx), n).alias("_sh"),
    ).select(
        "eval_id",
        F.explode(F.transform("_sh", lambda g: F.xxhash64(g))).alias("_g"),
        F.size("_sh").alias("eval_ngrams"),
    )
    if broadcast_eval:
        ev = F.broadcast(ev)

    tr = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(
            F.transform(shingles(F.col(text_col), n), lambda g: F.xxhash64(g))
        ).alias("_g"),
    )

    pairs = (
        tr.join(ev, on="_g")
        .groupBy("train_id", "eval_id")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first("eval_ngrams").alias("eval_ngrams"),
        )
        .withColumn("contamination", F.col("shared") / F.col("eval_ngrams"))
    )
    if min_contamination > 0.0:
        pairs = pairs.filter(F.col("contamination") >= min_contamination)
    return pairs


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    n: int = 8,
    threshold: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training corpus with contaminated documents removed.

    A train document is dropped when *any* eval document has
    ``contamination >= threshold`` against it. The contaminated-id set
    is the output of one broadcast-join + one aggregation (see
    :func:`contamination_pairs`); the removal itself is a left_anti
    join, which AQE turns into a broadcast anti-join whenever the
    contaminated set is small (the normal case).
    """
    bad = (
        contamination_pairs(
            train,
            eval_df,
            id_col=id_col,
            text_col=text_col,
            eval_id_col=eval_id_col,
            eval_text_col=eval_text_col,
            n=n,
            min_contamination=threshold,
            broadcast_eval=broadcast_eval,
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(bad, on=id_col, how="left_anti")
