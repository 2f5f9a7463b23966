"""N-gram language-model perplexity scoring (the CCNet-style quality
filter: Wenzek et al. 2020 score documents with a KenLM n-gram LM and
keep the low-perplexity head of the corpus).

Spark-first design — both phases are plain DataFrame ops that Catalyst
can push down and AQE can re-plan:

* **Train** (`train_ngram_lm`): one windowed-slice HOF expression per
  order turns each document's token array into its order-k grams
  scan-locally; a single ``groupBy(gram, order).count()`` per order is
  the only exchange. The model IS a DataFrame ``(gram, order, count)``
  — at 100 TB the model itself can be billions of rows, so it is never
  assumed to fit anywhere.
* **Score** (`score_ngram_lm` / `add_lm_perplexity`): per-token stupid
  backoff (Brants et al. 2007 — "Large Language Models in Machine
  Translation"): use the highest-order gram seen in training, else back
  off with a fixed ``alpha`` penalty; the unigram floor is add-one
  smoothed over the training vocabulary so out-of-vocabulary tokens get
  a finite score. Each backoff order is a join from the positions
  frame to the model on the gram string — broadcast when the model is
  small (size-gated the same way mutations gate the id-clash probe),
  shuffle-hash otherwise, and all orders share one exchange of the
  positions frame because the join keys are all derived from the same
  row.

Scores are log10 (KenLM's convention); ``ppl = 10^(-avg_log10)``.

No sentence segmentation: the token stream of a document is scored as
one sequence, and the first ``k-1`` positions of a document use the
longest context that exists (position 0 scores as a plain unigram with
no backoff penalty — there is nothing to back off FROM).

Tokenization is the shared :func:`llmops.textstats.tokens` whitespace
split, so DuckDB's ``regexp_split_to_array(trim(text), '\\s+')``
reproduces it exactly — the correctness gate compares this module
against a full SQL re-implementation of backoff scoring.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pycypher_nmetl_spark.llmops.textstats import tokens

# stupid-backoff discount (Brants et al. 2007 use 0.4)
DEFAULT_ALPHA = 0.4
# model sides at or below this many rows are broadcast into the scoring
# joins; above it the join shuffles (a 100 TB corpus's bigram table does
# not fit in an executor, let alone the driver)
BROADCAST_MODEL_ROWS = 2_000_000


def _toks(text_col: str) -> Column:
    """Whitespace tokens with empty strings removed (split('') yields
    [''] — a phantom token both engines would otherwise count)."""
    return F.filter(tokens(F.col(text_col)), lambda t: t != F.lit(""))


def _grams(t: Column, k: int) -> Column:
    """All order-k grams of token array ``t``, space-joined, as one
    scan-local HOF expression (same shape as substring.py's windows).

    Docs shorter than k tokens yield an EMPTY array — the when() guard
    matters: Spark's sequence(1, 0) is a DESCENDING [1, 0] (not empty),
    whose 0 start would crash slice()."""
    if k == 1:
        return t
    return F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_ngram_lm(
    df: DataFrame, text_col: str, n: int = 2
) -> tuple[DataFrame, int, int]:
    """Count grams of every order 1..n over the corpus.

    Returns ``(model, total_tokens, vocab_size)`` where ``model`` has
    columns ``(gram string, order int, count long)``. The two scalars
    are collected in ONE job over the unigram slice (they are two
    numbers; the model frame itself stays distributed and lazy).

    One groupBy exchange per order — n is 2..5 in practice. The orders
    are unioned into a single frame so scoring can partition the model
    once on ``gram``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    t = _toks(text_col)
    parts = []
    for k in range(1, n + 1):
        parts.append(
            df.select(F.explode(_grams(t, k)).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("count"))
            .select("gram", F.lit(k).alias("order"), "count")
        )
    model = parts[0]
    for p in parts[1:]:
        model = model.unionByName(p)
    uni = parts[0].agg(
        F.sum("count").alias("total"), F.count(F.lit(1)).alias("vocab")
    ).first()
    return model, int(uni["total"] or 0), int(uni["vocab"] or 0)


def _maybe_broadcast(model: DataFrame, model_rows: int | None) -> DataFrame:
    if model_rows is not None and model_rows <= BROADCAST_MODEL_ROWS:
        return F.broadcast(model)
    return model


def score_ngram_lm(
    df: DataFrame,
    text_col: str,
    model: DataFrame,
    total_tokens: int,
    vocab_size: int,
    n: int = 2,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    model_rows: int | None = None,
) -> DataFrame:
    """Per-document stupid-backoff log10 score and perplexity.

    Emits ``(id_col, n_scored, lm_avg_logprob double, ppl double)``.
    ``n_scored`` is the token count (every token gets a score — OOV
    tokens bottom out at the add-one-smoothed unigram floor
    ``alpha^(k_avail) * 1/(total+vocab)``).

    Plan shape: positions explode (narrow) -> one left join per order
    on the gram string (n+n-1 joins: the order-k gram AND its order-k-1
    context prefix both need counts) -> groupBy(id). With a broadcast
    model (``model_rows`` <= BROADCAST_MODEL_ROWS) the whole scoring
    pass is map-side plus the final per-doc aggregation; with a shuffled
    model every join keys on a gram string, so AQE coalesces them
    against the same model exchange.
    """
    if total_tokens <= 0 or vocab_size <= 0:
        raise ValueError("empty model (total_tokens / vocab_size must be > 0)")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    # one row per position, carrying the gram of EVERY order ending at
    # that position (null where the position is too early for the order)
    toks_arr = _toks(text_col)
    wide = df.select(F.col(id_col).alias("__id"), toks_arr.alias("__t")).select(
        "__id",
        F.posexplode("__t").alias("pos", "g1"),
        F.col("__t").alias("__t"),
    )
    for k in range(2, n + 1):
        wide = wide.withColumn(
            f"g{k}",
            F.when(
                F.col("pos") >= k - 1,
                F.concat_ws(
                    " ", F.slice(F.col("__t"), F.col("pos") - (k - 2), k)
                ),
            ),
        )
        # the order-(k-1) CONTEXT gram (tokens i-k+1 .. i-1)
        wide = wide.withColumn(
            f"c{k}",
            F.when(
                F.col("pos") >= k - 1,
                F.concat_ws(
                    " ",
                    F.slice(F.col("__t"), F.col("pos") - (k - 2), k - 1),
                ),
            ),
        )
    wide = wide.drop("__t")

    m = _maybe_broadcast(model, model_rows)
    # join counts: order-k gram count as n_k, order-(k-1) context count
    # as d_k (denominator), unigram count as n_1
    for k in range(1, n + 1):
        mk = m.filter(F.col("order") == k).select(
            F.col("gram").alias(f"__g{k}"), F.col("count").alias(f"n{k}")
        )
        wide = wide.join(mk, wide[f"g{k}"] == mk[f"__g{k}"], "left").drop(
            f"__g{k}"
        )
    for k in range(2, n + 1):
        mk = m.filter(F.col("order") == k - 1).select(
            F.col("gram").alias(f"__c{k}"), F.col("count").alias(f"d{k}")
        )
        wide = wide.join(mk, wide[f"c{k}"] == mk[f"__c{k}"], "left").drop(
            f"__c{k}"
        )

    # stupid backoff, highest order first; unigram floor is add-one
    # smoothed so OOV is finite. Positions too early for order k have
    # g_k null, which the CASE skips WITHOUT an alpha penalty (nothing
    # to back off from — this matches scoring the doc prefix with the
    # longest available context).
    uni = (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(1)) / F.lit(
        float(total_tokens + vocab_size)
    )
    score = uni
    # build from unigram UP: at each order, "use it if present, else
    # alpha * lower". Track the penalty only for orders the position
    # actually has.
    for k in range(2, n + 1):
        have_k = F.col(f"g{k}").isNotNull()
        hit_k = F.col(f"n{k}").isNotNull() & F.col(f"d{k}").isNotNull()
        score = F.when(
            have_k,
            F.when(hit_k, F.col(f"n{k}") / F.col(f"d{k}")).otherwise(
                F.lit(alpha) * score
            ),
        ).otherwise(score)

    wide = wide.withColumn("__s", F.log10(score))
    out = wide.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.avg("__s").alias("lm_avg_logprob"),
    )
    return out.withColumn("ppl", F.pow(F.lit(10.0), -F.col("lm_avg_logprob")))


def add_lm_perplexity(
    df: DataFrame,
    text_col: str,
    n: int = 2,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Convenience: train on ``train_df`` (default: the corpus itself —
    real pipelines pass a clean reference corpus, CCNet-style) and
    attach ``lm_avg_logprob``/``ppl`` to every row of ``df``. Documents
    with zero tokens come back with null scores (nothing to score)."""
    model, total, vocab = train_ngram_lm(
        train_df if train_df is not None else df, text_col, n
    )
    model_rows = None
    # the unigram slice's vocab is a lower bound on model rows; use the
    # cheap exact count only when it can possibly be under the gate
    if vocab <= BROADCAST_MODEL_ROWS:
        model_rows = model.count()
    scores = score_ngram_lm(
        df, text_col, model, total, vocab, n, alpha, id_col, model_rows
    )
    return df.join(scores, id_col, "left")


def score_ngram_lm_local(
    texts: dict,
    train_texts: dict | None = None,
    n: int = 2,
    alpha: float = DEFAULT_ALPHA,
) -> dict:
    """Pure-Python reference implementation (the differential-test
    oracle): same tokenization, same stupid backoff, same add-one
    unigram floor. ``texts`` maps id -> text; returns id ->
    (n_scored, avg_log10, ppl)."""
    train = train_texts if train_texts is not None else texts
    counts: dict[tuple[int, str], int] = {}
    total = 0
    vocab: set[str] = set()
    for txt in train.values():
        toks = [w for w in txt.strip().split() if w]
        total += len(toks)
        vocab.update(toks)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                g = " ".join(toks[i : i + k])
                counts[(k, g)] = counts.get((k, g), 0) + 1
    out = {}
    for did, txt in texts.items():
        toks = [w for w in txt.strip().split() if w]
        logs = []
        for i, w in enumerate(toks):
            s = (counts.get((1, w), 0) + 1) / (total + len(vocab))
            for k in range(2, n + 1):
                if i < k - 1:
                    break
                g = " ".join(toks[i - k + 1 : i + 1])
                c = " ".join(toks[i - k + 1 : i])
                if (k, g) in counts and (k - 1, c) in counts:
                    s = counts[(k, g)] / counts[(k - 1, c)]
                else:
                    s = alpha * s
            logs.append(math.log10(s))
        if logs:
            avg = sum(logs) / len(logs)
            out[did] = (len(logs), avg, 10.0 ** (-avg))
        else:
            out[did] = (0, None, None)
    return out
