"""Text analysis operators: tokens, quality, language ID, fingerprints.

All pure JVM-side column expressions (whole-stage codegen; zero Python
in the hot path), so they run at scan throughput on any data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# charset heuristics for language ID (script detection first, then
# diacritic frequency; deterministic and SQL-portable)
_CJK = r"[一-鿿]"
_CYRILLIC = r"[Ѐ-ӿ]"
_DE_CHARS = r"[äöüß]"
_FR_CHARS = r"[éèêàçîô]"
_ES_CHARS = r"[ñ¿¡áí]"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def add_token_count(df: DataFrame, text_col: str, out: str = "n_tokens") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (~chars/4 is the common rule of thumb for byte-pair encodings)."""
    return df.withColumn(out, F.size(tokens(F.col(text_col)))).withColumn(
        "n_tokens_bpe_est", F.ceil(F.length(F.col(text_col)) / 4).cast("long")
    )


def add_quality(df: DataFrame, text_col: str) -> DataFrame:
    """Quality-scoring features: length, mean token length, stopword
    ratio, punctuation ratio, uppercase ratio, and a composite score."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    stop_hits = F.size(F.array_intersect(t, F.array(*[F.lit(s) for s in STOPWORDS])))
    text = F.col(text_col)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    df = (
        df.withColumn("n_chars_m", F.length(text))
        .withColumn("n_tokens", n)
        .withColumn(
            "mean_token_len",
            F.round(
                F.aggregate(
                    t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
                )
                / F.greatest(n, F.lit(1)),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio", F.round(stop_hits / F.greatest(n, F.lit(1)), 4)
        )
        .withColumn("punct_ratio", F.round(punct / F.greatest(F.length(text), F.lit(1)), 4))
        .withColumn("upper_ratio", F.round(upper / F.greatest(F.length(text), F.lit(1)), 4))
    )
    # composite: long-enough, mixed-vocabulary, not punctuation soup
    return df.withColumn(
        "quality_score",
        F.round(
            F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
            + (1.0 - F.col("punct_ratio")) * 0.3
            + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2,
            4,
        ),
    )


def add_lang_id(df: DataFrame, text_col: str, out: str = "lang_pred") -> DataFrame:
    """Charset-based language heuristic (script, then diacritics)."""
    text = F.col(text_col)
    return df.withColumn(
        out,
        F.when(text.rlike(_CJK), "zh")
        .when(text.rlike(_CYRILLIC), "ru")
        .when(text.rlike(_DE_CHARS), "de")
        .when(text.rlike(_FR_CHARS), "fr")
        .when(text.rlike(_ES_CHARS), "es")
        .otherwise("en"),
    )


def add_fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint") -> DataFrame:
    """Canonical-form document fingerprint: md5 of the sorted distinct
    token set — robust to token order and duplication (the classic
    'fingerprinting for dedup' normalization)."""
    t = F.array_sort(F.array_distinct(tokens(F.lower(F.col(text_col)))))
    return df.withColumn(out, F.md5(F.array_join(t, " ")))
