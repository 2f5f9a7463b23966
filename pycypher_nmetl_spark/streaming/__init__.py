"""Streaming surface (SURVEY.md §2.11) on Structured Streaming.

The reference's asyncio micro-engine
(reference: packages/fastopendata/src/fastopendata/streaming/) maps
almost 1:1 onto Spark primitives:

  StreamBuffer/backpressure  -> source rate limiting (maxFilesPerTrigger)
  WatermarkTracker           -> withWatermark
  DeduplicationStore         -> dropDuplicatesWithinWatermark
  Tumbling/Sliding windows   -> window()
  SessionWindow              -> session_window()
  WindowManager state        -> the state store (built-in)
  StreamTableJoin            -> stream-static join
  IncrementalView            -> keyed agg in update mode + foreachBatch
  StreamEngine metrics       -> StreamingQueryListener

Use DistributedIncrementalView for materialized views — state and
changelog stay DataFrames on the executors. LocalIncrementalView
(aliased IncrementalView for reference parity) collects each batch to
a driver dict and is for local-mode tests/demos only.
"""

from pycypher_nmetl_spark.streaming.core import StreamPipeline, StreamMetricsListener
from pycypher_nmetl_spark.streaming.views import (
    DistributedIncrementalView, IncrementalView, LocalIncrementalView,
)
from pycypher_nmetl_spark.streaming.windows import (
    session_window_agg, sliding_window_agg, tumbling_window_agg,
)

__all__ = [
    "StreamPipeline", "StreamMetricsListener",
    "DistributedIncrementalView", "LocalIncrementalView", "IncrementalView",
    "tumbling_window_agg", "sliding_window_agg", "session_window_agg",
]
