"""Quality classifier — the fastText-style linear filter used by the
GPT-3 / CCNet / LLaMA data pipelines: train a logistic-regression
classifier on hashed bag-of-n-gram features to separate a
known-high-quality corpus (positive) from raw crawl (negative), then
keep raw documents the classifier scores as quality.

Built on Spark MLlib's distributed primitives (public PySpark API):

* featurization is :class:`~pyspark.ml.feature.HashingTF` over the
  shared whitespace tokens + bigrams — the same hashing trick as
  fastText, no vocabulary to collect or broadcast;
* :class:`~pyspark.ml.classification.LogisticRegression` trains with
  distributed L-BFGS (treeAggregate gradient passes — each iteration
  is one map-side pass over the corpus, no shuffles of the data);
* scoring is a narrow ``transform`` (hash + dot product per row, no
  exchange at all), so it runs at scan throughput on 100 TB.

The GPT-3 paper additionally RESAMPLES rather than hard-filters:
``keep if score > 1 - beta * random``; :func:`pareto_keep` implements
that with deterministic hash-derived randomness (retry-safe, no
``rand()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pycypher_nmetl_spark.llmops.lm import _grams, _toks

DEFAULT_FEATURES = 1 << 18


def _feature_tokens(text_col: str) -> Column:
    """Unigrams + bigrams (fastText's default wordNgrams=2 shape)."""
    t = _toks(text_col)
    return F.concat(_grams(t, 1), _grams(t, 2))


def train_quality_classifier(
    positive_df: DataFrame,
    negative_df: DataFrame,
    text_col: str,
    num_features: int = DEFAULT_FEATURES,
    max_iter: int = 30,
    reg_param: float = 1e-4,
):
    """Fit hashed-n-gram logistic regression: positive = quality corpus
    (e.g. curated reference text), negative = raw crawl sample.
    Returns a fitted :class:`pyspark.ml.PipelineModel` (save()/load()
    round-trips through the standard MLlib persistence format).

    Class balance is the caller's job (sample the bigger side down, or
    rely on LR's robustness for mild skew)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    if num_features < 2:
        raise ValueError(f"num_features must be >= 2, got {num_features}")
    pos = positive_df.select(
        _feature_tokens(text_col).alias("_ft"), F.lit(1.0).alias("label")
    )
    neg = negative_df.select(
        _feature_tokens(text_col).alias("_ft"), F.lit(0.0).alias("label")
    )
    train = pos.unionByName(neg)
    pipe = Pipeline(
        stages=[
            HashingTF(inputCol="_ft", outputCol="features", numFeatures=num_features),
            LogisticRegression(maxIter=max_iter, regParam=reg_param),
        ]
    )
    return pipe.fit(train)


def score_quality(
    df: DataFrame, text_col: str, model, out: str = "quality_prob"
) -> DataFrame:
    """Attach P(quality) to every row — a narrow map (hash + sigmoid of
    a dot product), zero exchanges. All original columns survive."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df.withColumn("_ft", _feature_tokens(text_col)))
    return scored.withColumn(
        out, vector_to_array(F.col("probability")).getItem(1)
    ).drop("_ft", "features", "rawPrediction", "probability", "prediction")


def pareto_keep(
    df: DataFrame,
    score_col: str = "quality_prob",
    alpha: float = 9.0,
    id_col: str = "doc_id",
    seed: int = 42,
    out: str = "keep",
) -> DataFrame:
    """GPT-3's stochastic keep rule: keep a document iff
    ``alpha * (1 - score) < x`` where ``x ~ Pareto(alpha)`` — i.e.
    ``keep if (1 - score) < pareto_sample / alpha``; low-scoring docs
    still survive occasionally, which preserves tail diversity instead
    of a hard cliff. The Pareto draw is hash-derived from (id, seed):
    deterministic under task retry, reproducible across runs."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    h = F.pmod(
        F.xxhash64(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
        F.lit(1 << 53),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 53))
    # inverse-CDF Pareto(x_m=1, alpha): x = u^(-1/alpha)
    x = F.pow(u, F.lit(-1.0 / alpha))
    return df.withColumn(out, (F.lit(1.0) - F.col(score_col)) < (x - F.lit(1.0)))
