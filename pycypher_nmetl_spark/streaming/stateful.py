"""Custom stateful streaming operators via applyInPandasWithState.

Where built-in windows/dedup don't express the semantics (the escape
hatch SURVEY.md §2.11 anticipates), per-key arbitrary state does. The
running aggregate below mirrors the reference's imperative
WindowManager/IncrementalView state-keeping (streaming/windows.py:178-281)
as a single Arrow-batched stateful map: state is a fixed-size tuple per
key, batches stream through without materializing the group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_AGG_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("minimum", T.DoubleType()),
        T.StructField("maximum", T.DoubleType()),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("minimum", T.DoubleType()),
        T.StructField("maximum", T.DoubleType()),
    ]
)


def running_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running (count, total, min, max) across micro-batches.

    Each update emits the key's new running values — an update-mode
    changelog equivalent to IncrementalView's UPDATE events, but with
    the state held in Spark's state store (fault-tolerant, spillable)
    instead of driver memory.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            count, total, mn, mx = state.get
        else:
            count, total, mn, mx = 0, 0.0, None, None
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                count += int(len(vals))
                total += float(vals.sum())
                mn = float(vals.min()) if mn is None else min(mn, float(vals.min()))
                mx = float(vals.max()) if mx is None else max(mx, float(vals.max()))
        state.update((count, total, mn, mx))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "count": [count],
                "total": [total],
                "minimum": [mn],
                "maximum": [mx],
            }
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=RUNNING_AGG_OUTPUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
