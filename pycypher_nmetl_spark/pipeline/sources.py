"""URI-addressed data sources (reference: ingestion/data_sources.py:436-907).

URI sniffing -> spark.read.{csv,parquet,json,jdbc}; optional schema
hints (cast after load, so header inference still works) and a SQL
transform executed by Spark SQL over a temp view of the raw source —
the Spark-native version of the reference's read-through-DuckDB views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pycypher_nmetl_spark.compiler.bindings import fresh_name

# DuckDB/Arrow-ish hint names -> Spark SQL types
_TYPE_MAP = {
    "integer": "int", "int": "int", "bigint": "bigint", "varchar": "string",
    "string": "string", "text": "string", "double": "double", "float": "float",
    "decimal": "decimal(38,9)", "boolean": "boolean", "bool": "boolean",
    "date": "date", "timestamp": "timestamp",
}

_JDBC_SCHEMES = ("postgresql://", "mysql://", "jdbc:")


def _sniff_format(uri: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    low = uri.lower()
    if low.startswith(_JDBC_SCHEMES):
        return "jdbc"
    for ext, fmt in ((".csv", "csv"), (".tsv", "csv"), (".parquet", "parquet"),
                     (".json", "json"), (".jsonl", "json"), (".ndjson", "json")):
        if low.endswith(ext) or f"{ext}/" in low or low.rstrip("/").endswith(ext):
            return fmt
    if low.endswith((".csv.gz", ".json.gz")):
        return "csv" if ".csv" in low else "json"
    return "parquet"


def read_source(
    spark: SparkSession,
    uri: str,
    fmt: str | None = None,
    schema_hints: dict[str, str] | None = None,
    sql_transform: str | None = None,
    options: dict[str, str] | None = None,
    security_policy=None,
) -> DataFrame:
    # URI validation before Spark touches the source (reference:
    # ingestion/security.py). Pass security_policy=False to skip.
    if security_policy is not False:
        from pycypher_nmetl_spark.pipeline.security import (
            DEFAULT_POLICY, validate_source_uri,
        )

        validate_source_uri(uri, security_policy or DEFAULT_POLICY)
    fmt = _sniff_format(uri, fmt)
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "true")
        if uri.lower().endswith(".tsv"):
            opts.setdefault("sep", "\t")
        df = spark.read.options(**opts).csv(uri)
    elif fmt == "json":
        df = spark.read.options(**opts).json(uri)
    elif fmt == "jdbc":
        # postgresql://host/db?table=x -> spark.read.jdbc
        # (reference reads SQL DBs via DuckDB scanners,
        # ingestion/data_sources.py:687-749; here it is Spark's native
        # partitioned JDBC reader. Live round-trip is tested against
        # Apache Derby's embedded driver — it ships in Spark's own jars —
        # in tests/test_pipeline.py::test_jdbc_source_end_to_end_derby;
        # option plumbing for network drivers (postgres/mysql, jars not
        # in this sandbox) is covered by test_jdbc_source_option_plumbing.)
        table = opts.pop("table", None) or opts.pop("dbtable", None)
        if table is None:
            raise ValueError("jdbc source needs a 'table' option")
        url = uri if uri.startswith("jdbc:") else f"jdbc:{uri}"
        df = spark.read.options(**opts).jdbc(url, table)
    else:
        df = spark.read.options(**opts).parquet(uri)

    if schema_hints:
        # case-insensitive column match: JDBC sources report dialect-
        # cased names (Derby/Oracle uppercase, Postgres lowercase) and a
        # hint keyed the other way would silently not apply
        by_lower = {c.lower(): c for c in df.columns}
        casts = {}
        for col, hint in schema_hints.items():
            actual = by_lower.get(col.lower())
            if actual is not None:
                target = _TYPE_MAP.get(hint.lower(), hint.lower())
                casts[actual] = F.col(actual).cast(target)
        if casts:
            df = df.withColumns(casts)

    if sql_transform:
        view = fresh_name("_src")
        df.createOrReplaceTempView(view)
        # The transform references the source relation as `source` (bare
        # word or `{source}` placeholder).  Substitution is word-bounded so
        # identifiers that merely *contain* the word — `resource_id`,
        # `source_system` — pass through untouched.
        import re

        sql = sql_transform.replace("{source}", view)
        sql = re.sub(r"\bsource\b", view, sql)
        df = spark.sql(sql)
    return df
