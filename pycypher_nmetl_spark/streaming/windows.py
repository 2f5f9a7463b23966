"""Windowed aggregations (reference: streaming/windows.py:63-281).

Each helper takes a (possibly streaming) DataFrame with an event-time
column and returns the windowed aggregation; on a stream, the state
store + watermark handle firing and eviction (WindowManager's job in
the reference — built-in here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed-size aligned windows (streaming/windows.py:63-87)."""
    if watermark:
        df = df.withWatermark(time_col, watermark)
    group = [F.window(F.col(time_col), duration)] + [F.col(k) for k in (keys or [])]
    return df.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()]).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(keys or []),
        *aggs.keys(),
    )


def sliding_window_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    slide: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Size+slide windows — each record lands in ceil(size/slide) windows
    (streaming/windows.py:89-134)."""
    if watermark:
        df = df.withWatermark(time_col, watermark)
    group = [F.window(F.col(time_col), duration, slide)] + [
        F.col(k) for k in (keys or [])
    ]
    return df.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()]).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(keys or []),
        *aggs.keys(),
    )


def session_window_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based merging session windows (streaming/windows.py:137-176)."""
    if watermark:
        df = df.withWatermark(time_col, watermark)
    group = [F.session_window(F.col(time_col), gap)] + [
        F.col(k) for k in (keys or [])
    ]
    return df.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()]).select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *(keys or []),
        *aggs.keys(),
    )
