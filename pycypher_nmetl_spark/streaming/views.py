"""Incremental materialized views with changelog emission.

Reference: streaming/views.py:21-185 (IncrementalView) — a keyed
materialized view that emits INSERT/UPDATE/DELETE changes and serves
snapshot queries.

**Default / cluster-scale implementation: `DistributedIncrementalView`**
— state, per-batch diff, and changelog are all DataFrames; nothing is
collected to the driver. Use it unless you specifically need the
reference's in-process point-query surface.

`LocalIncrementalView` (alias `IncrementalView`, kept for API parity)
is the driver-dict TOY variant: its _apply collects every micro-batch,
so the view is capped by driver memory. It exists to mirror the
reference's process-memory semantics in local mode and for tests; at
cluster scale the same foreachBatch body writes to Delta (MERGE) with
Change Data Feed as the changelog — which is exactly the shape
DistributedIncrementalView already has.
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


class LocalIncrementalView:
    """Driver-dict variant — LOCAL-MODE TOY. State lives in a Python dict
    on the driver and every micro-batch is `.collect()`ed, so capacity is
    bounded by driver memory. Prefer `DistributedIncrementalView` (below)
    for anything beyond tests/demos; it has the same attach/subscribe
    surface with DataFrame-valued state and changelog."""

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


class DistributedIncrementalView:
    """IncrementalView whose state never leaves the executors.

    The driver-dict version above caps the view at driver memory (its
    _apply collects every micro-batch). Here both the snapshot AND the
    per-batch diff are DataFrames:

      * the stream is aggregated per key in `update` output mode
        (Tungsten keeps the agg JVM-side — no re-implementation of the
        aggregation in Python, which applyInPandasWithState would force);
      * foreachBatch diffs the batch against the current snapshot frame
        with a key left-join -> INSERT/UPDATE ops, old values carried in
        an `old` struct column (the changelog a Delta CDF would emit);
      * the new snapshot = old rows not touched by the batch (left_anti)
        union the batch rows, localCheckpoint-ed to truncate lineage —
        at cluster scale this union/checkpoint pair is a Delta MERGE.

    Subscribers receive the *changelog DataFrame* per batch, not rows;
    nothing is collected to the driver unless the caller does so.
    """

    def __init__(self, key_cols: list[str], agg_exprs: dict[str, Column]):
        self.key_cols = key_cols
        self.agg_exprs = agg_exprs
        self._snapshot: DataFrame | None = None
        self.subscribers: list[Callable[[DataFrame], None]] = []

    def subscribe(self, fn: Callable[[DataFrame], None]) -> None:
        self.subscribers.append(fn)

    def attach(self, stream_df: DataFrame, checkpoint: str | None = None):
        agged = stream_df.groupBy(*self.key_cols).agg(
            *[c.alias(n) for n, c in self.agg_exprs.items()]
        )
        w = agged.writeStream.foreachBatch(self._apply).outputMode("update")
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.trigger(availableNow=True).start()

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        batch = batch_df.localCheckpoint()  # stable across the two uses
        val_cols = [c for c in batch.columns if c not in self.key_cols]
        if self._snapshot is None:
            changes = batch.withColumn("op", F.lit("INSERT")).withColumn(
                "old", F.lit(None).cast(
                    "struct<" + ", ".join(f"{c}: {dict(batch.dtypes)[c]}" for c in val_cols) + ">"
                )
            )
            self._snapshot = batch
        else:
            old = self._snapshot
            old_struct = old.select(
                *self.key_cols, F.struct(*val_cols).alias("old")
            )
            changes = (
                batch.join(old_struct, on=self.key_cols, how="left")
                .withColumn(
                    "op",
                    F.when(F.col("old").isNull(), F.lit("INSERT")).otherwise(
                        F.lit("UPDATE")
                    ),
                )
                # drop no-op updates (same values as the snapshot)
                .filter(
                    F.col("old").isNull()
                    | (F.struct(*val_cols) != F.col("old"))
                )
            )
            untouched = old.join(
                batch.select(*self.key_cols), on=self.key_cols, how="left_anti"
            )
            self._snapshot = untouched.unionByName(batch).localCheckpoint()
        for fn in self.subscribers:
            fn(changes)

    def snapshot(self) -> DataFrame:
        """The current view as a DataFrame (filter/limit with Spark ops)."""
        if self._snapshot is None:
            raise ValueError("view has no data yet (stream not started?)")
        return self._snapshot


# Back-compat alias: the reference names this surface IncrementalView.
# The distributed variant is the recommended default at any real scale.
IncrementalView = LocalIncrementalView
