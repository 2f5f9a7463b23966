"""Output writer: DataFrame -> csv/parquet/json at a URI
(reference: ingestion/output_writer.py:98-196)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_output(
    df: DataFrame,
    uri: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
    single_file: bool = True,
) -> None:
    low = uri.lower()
    if fmt is None:
        fmt = (
            "csv" if low.endswith(".csv")
            else "json" if low.endswith((".json", ".jsonl", ".ndjson"))
            else "parquet"
        )
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).options(**opts).format(fmt).save(uri)
