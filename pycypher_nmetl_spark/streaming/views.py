"""Incremental materialized views with changelog emission.

Reference: streaming/views.py:21-185 (IncrementalView) — a keyed
materialized view that emits INSERT/UPDATE/DELETE changes and serves
snapshot queries. Spark re-expression: keyed aggregation in `update`
output mode; each micro-batch's updated rows are diffed against the
driver-held view state inside foreachBatch, producing the same
changelog events and feeding subscriber callbacks.

Scale note: the *view state* here is driver-held (dict) because the
reference serves point queries from process memory. At cluster scale
the same foreachBatch body writes to Delta (MERGE) and the changelog
is Delta Change Data Feed; the class isolates that swap in _apply().
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column, DataFrame


@dataclass
class Change:
    op: str  # INSERT | UPDATE | DELETE
    key: tuple
    row: dict | None
    old: dict | None = None


class IncrementalView:
    def __init__(
        self,
        key_cols: list[str],
        agg_exprs: dict[str, Column],
    ):
        self.key_cols = key_cols
        self.agg_exprs = agg_exprs
        self.state: dict[tuple, dict] = {}
        self.changelog: list[Change] = []
        self.subscribers: list[Callable[[Change], None]] = []

    def subscribe(self, fn: Callable[[Change], None]) -> None:
        self.subscribers.append(fn)

    # ---- wiring ------------------------------------------------------ #
    def attach(self, stream_df: DataFrame, checkpoint: str | None = None):
        """Aggregate the stream by key and maintain the view in update
        mode; returns the StreamingQuery."""
        agged = stream_df.groupBy(*self.key_cols).agg(
            *[c.alias(n) for n, c in self.agg_exprs.items()]
        )
        w = agged.writeStream.foreachBatch(self._apply).outputMode("update")
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.trigger(availableNow=True).start()

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():
            d = row.asDict(recursive=True)
            key = tuple(d[k] for k in self.key_cols)
            old = self.state.get(key)
            if old == d:
                continue
            change = Change(
                op="UPDATE" if old is not None else "INSERT",
                key=key,
                row=d,
                old=old,
            )
            self.state[key] = d
            self._emit(change)

    def delete(self, key: tuple) -> None:
        old = self.state.pop(key, None)
        if old is not None:
            self._emit(Change(op="DELETE", key=key, row=None, old=old))

    def _emit(self, change: Change) -> None:
        self.changelog.append(change)
        for fn in self.subscribers:
            fn(change)

    # ---- snapshot queries (reference: views.py snapshot w/ filter/limit)
    def snapshot(
        self,
        predicate: Callable[[dict], bool] | None = None,
        limit: int | None = None,
    ) -> list[dict]:
        rows = [r for r in self.state.values() if predicate is None or predicate(r)]
        return rows[:limit] if limit is not None else rows
