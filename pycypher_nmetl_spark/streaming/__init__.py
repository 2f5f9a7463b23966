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
"""

from pycypher_nmetl_spark.streaming.core import StreamPipeline, StreamMetricsListener
from pycypher_nmetl_spark.streaming.views import (
    DistributedIncrementalView, IncrementalView,
)
from pycypher_nmetl_spark.streaming.windows import (
    session_window_agg, sliding_window_agg, tumbling_window_agg,
)

__all__ = [
    "StreamPipeline", "StreamMetricsListener", "IncrementalView",
    "DistributedIncrementalView",
    "tumbling_window_agg", "sliding_window_agg", "session_window_agg",
]
