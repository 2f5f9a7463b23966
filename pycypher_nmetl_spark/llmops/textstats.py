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


def add_token_count(
    df: DataFrame,
    text_col: str,
    out: str = "n_tokens",
    tokenizer: str = "ws",
    merges_path: str | None = None,
) -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (~chars/4 is the common rule of thumb for byte-pair encodings).

    tokenizer="bpe" additionally computes an EXACT byte-level BPE count
    in ``n_tokens_bpe`` from a standard merges.txt at ``merges_path``
    (GPT-2's published file loads directly) — an Arrow-batched Python
    path, the one textstats op where that's justified (see llmops.bpe).
    The zero-dependency chars/4 estimate stays the default."""
    df = df.withColumn(out, F.size(tokens(F.col(text_col)))).withColumn(
        "n_tokens_bpe_est", F.ceil(F.length(F.col(text_col)) / 4).cast("long")
    )
    if tokenizer == "bpe":
        if not merges_path:
            raise ValueError("tokenizer='bpe' requires merges_path")
        from pycypher_nmetl_spark.llmops.bpe import add_bpe_token_count

        df = add_bpe_token_count(df, text_col, merges_path)
    elif tokenizer != "ws":
        raise ValueError(f"unknown tokenizer {tokenizer!r} (use 'ws' or 'bpe')")
    return df


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


def add_repetition_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals (Rae et al.
    2021, table A1 — public report), as pure column expressions:

      * dup_line_frac      — fraction of lines that are duplicates of an
                             earlier line (boilerplate / nav menus)
      * dup_token_frac     — 1 - distinct/total tokens (low lexical
                             diversity = template or spam)
      * top_token_frac     — share of all tokens taken by the single
                             most frequent token (degenerate repetition)
      * max_line_len       — longest line in characters (minified blobs)

    All computed with array/HOF expressions over one split pass each —
    zero Python, so they run at scan throughput at any corpus size.
    Typical published cuts: drop when dup_line_frac > 0.30 or the
    most-frequent token takes an outsized share of a long document.
    """
    text = F.col(text_col)
    lines = F.split(text, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    toks = tokens(F.lower(text))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    # most-frequent-token share via an O(n) run-length fold over the
    # SORTED token array (a per-distinct-token filter pass would be
    # O(distinct * total) per row — quadratic on long documents)
    distinct_toks = F.array_distinct(toks)
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_count = run["best"]
    return (
        df.withColumn(
            "dup_line_frac",
            F.round(
                (F.size(lines) - F.size(F.array_distinct(lines))) / n_lines, 4
            ),
        )
        .withColumn(
            "dup_token_frac",
            F.round((F.size(toks) - F.size(distinct_toks)) / n_tok, 4),
        )
        .withColumn("top_token_frac", F.round(top_count / n_tok, 4))
        .withColumn(
            "max_line_len",
            F.aggregate(lines, F.lit(0), lambda acc, l: F.greatest(acc, F.length(l))),
        )
    )


#: PII patterns (emails, phone numbers, IPv4, credit-card-shaped digit
#: runs, SSN-shaped) — the standard pre-training scrub list; regexes are
#: conservative and deterministic.
_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"(?:\+?\d{1,3}[-. (])?\d{3}[-. )]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ccn", r"\b(?:\d[ -]?){13,16}\b", "<CCN>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str,
    out: str | None = None,
    count_col: str | None = "pii_hits",
) -> DataFrame:
    """Mask PII spans with typed placeholders (<EMAIL>, <PHONE>, <IP>,
    <CCN>, <SSN>) and optionally count the replacements per document.

    Chained regexp_replace column expressions — JVM regex, zero Python,
    order matters (emails first so their digits never match the phone
    pattern; CCN before generic phone-ish digit runs is handled by the
    word-boundary anchors). The count is computed against the ORIGINAL
    text with regexp_count so masking one class does not hide another.
    """
    text = F.col(text_col)
    masked = text
    for _, pat, repl in _PII_PATTERNS:
        masked = F.regexp_replace(masked, pat, repl)
    hits = None
    for _, pat, _repl in _PII_PATTERNS:
        c = F.regexp_count(text, F.lit(pat))
        hits = c if hits is None else hits + c
    df = df.withColumn(out or text_col, masked)
    if count_col:
        df = df.withColumn(count_col, hits.cast("long"))
    return df


def add_url_canonical(
    df: DataFrame, url_col: str, out: str = "url_canonical"
) -> DataFrame:
    """URL canonicalization for URL-level dedup: lowercase scheme+host,
    strip default ports, fragments, tracking params (utm_*, fbclid,
    gclid), and trailing slashes. parse_url + column expressions."""
    url = F.col(url_col)
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~kv.rlike(r"^(utm_[A-Za-z]+|fbclid|gclid|ref)="),
    )
    qs = F.array_join(F.array_sort(kept), "&")
    return df.withColumn(
        out,
        F.concat(
            scheme, F.lit("://"), host, path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    windows of ``max_tokens`` tokens advancing by ``max_tokens -
    overlap`` (the standard stride trick so no training example loses
    the context that crossed a boundary).

    Emits ``(id_col, chunk_idx, chunk, n_chunk_tokens)`` — one row per
    window, pure column expressions (sequence + slice + concat_ws +
    posexplode): scan throughput, no Python, no shuffle. Documents with
    zero tokens produce no rows; the final window of a document may be
    shorter than ``max_tokens``. Windows starting past the last token
    are never generated (the sequence's upper bound is the last start
    position that still covers a fresh token)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    step = max_tokens - overlap
    t = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    n = F.size(t)
    # last start s.t. the window's END extends past the previous
    # window's end (= contributes >= 1 fresh token): with overlap > 0 a
    # start in (n - max_tokens + step, n] yields a window fully
    # contained in its predecessor — duplicated training data — so the
    # sequence's upper bound is n - max_tokens + step, floored at 1
    starts = F.when(
        n >= 1,
        F.sequence(
            F.lit(1),
            F.greatest(F.lit(1), n - F.lit(max_tokens) + F.lit(step)),
            F.lit(step),
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(t, s, max_tokens)))
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    return out.withColumn(
        "n_chunk_tokens", F.size(F.split(F.col("chunk"), r"\s+"))
    )
