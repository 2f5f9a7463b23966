"""Stream pipeline builder + metrics (reference: streaming/engine.py:35-267,
core.py:21-239).

StreamPipeline is a thin fluent wrapper that keeps the reference's
engine surface (transforms -> filters -> dedup -> windows -> join ->
sink) while compiling to a single readStream->writeStream query, so
all the heavy lifting (state, watermarks, backpressure, recovery) is
Structured Streaming's.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # listener API lives in pyspark.sql.streaming
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


class StreamMetricsListener(StreamingQueryListener):
    """Throughput/lag metrics (reference: engine.py metrics: records/sec,
    processing lag). Attach with spark.streams.addListener(listener)."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


class StreamPipeline:
    """Fluent stream pipeline (reference: engine.py StreamEngine).

    >>> (StreamPipeline.from_files(spark, path, schema=...)
    ...     .with_event_time("ts", lateness="10 seconds")
    ...     .transform(lambda df: df.filter(...))
    ...     .dedup("event_id")
    ...     .to_memory_sink("out"))
    """

    def __init__(self, df: DataFrame):
        self.df = df
        self._time_col: str | None = None

    # ---- sources ---------------------------------------------------- #
    @classmethod
    def from_files(
        cls,
        spark: SparkSession,
        path: str,
        schema,
        fmt: str = "json",
        max_files_per_trigger: int | None = None,
    ) -> "StreamPipeline":
        reader = spark.readStream.schema(schema).format(fmt)
        if max_files_per_trigger:
            # backpressure (reference: StreamBuffer bounded capacity)
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return cls(reader.load(path))

    @classmethod
    def from_rate(cls, spark: SparkSession, rows_per_second: int = 10) -> "StreamPipeline":
        return cls(
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )

    # ---- transforms ------------------------------------------------- #
    def with_event_time(self, col: str, lateness: str = "0 seconds") -> "StreamPipeline":
        """Watermark = max(event_time) - lateness; late records beyond it
        are dropped by stateful operators (reference: WatermarkTracker,
        core.py:162-203 — built-in here)."""
        self._time_col = col
        return StreamPipeline._wrap(self.df.withWatermark(col, lateness), col)

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "StreamPipeline":
        return StreamPipeline._wrap(fn(self.df), self._time_col)

    def filter(self, cond: Column) -> "StreamPipeline":
        return StreamPipeline._wrap(self.df.filter(cond), self._time_col)

    def dedup(self, *keys: str, within_watermark: bool = True) -> "StreamPipeline":
        """Content dedup (reference: DeduplicationStore LRU, core.py:205-239
        — here the state store bounds memory via the watermark instead of
        an LRU capacity)."""
        if within_watermark and self._time_col is not None:
            out = self.df.dropDuplicatesWithinWatermark(list(keys))
        else:
            out = self.df.dropDuplicates(list(keys))
        return StreamPipeline._wrap(out, self._time_col)

    def join_static(
        self, static_df: DataFrame, on: list[str] | Column, how: str = "inner"
    ) -> "StreamPipeline":
        """Stream enriched against a table snapshot (reference:
        StreamTableJoin, joins.py:19-205). The static side is re-read per
        micro-batch for refreshable formats (Delta); for parquet it's the
        load-time snapshot."""
        return StreamPipeline._wrap(self.df.join(static_df, on, how), self._time_col)

    # ---- sinks ------------------------------------------------------ #
    def to_memory_sink(self, name: str, output_mode: str = "append"):
        """Test/debug sink; returns the StreamingQuery."""
        return (
            self.df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )

    def to_files(self, path: str, checkpoint: str, fmt: str = "parquet"):
        return (
            self.df.writeStream.format(fmt)
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def to_foreach_batch(self, fn: Callable[[DataFrame, int], None],
                         output_mode: str = "update", checkpoint: str | None = None):
        w = self.df.writeStream.foreachBatch(fn).outputMode(output_mode)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.trigger(availableNow=True).start()

    # ----------------------------------------------------------------- #
    @staticmethod
    def _wrap(df: DataFrame, time_col: str | None) -> "StreamPipeline":
        p = StreamPipeline(df)
        p._time_col = time_col
        return p
