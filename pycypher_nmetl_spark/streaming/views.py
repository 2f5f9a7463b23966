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

    def __init__(
        self,
        key_cols: list[str],
        agg_exprs: dict[str, Column],
        state_path: str | None = None,
        spark=None,
    ):
        self.key_cols = key_cols
        self.agg_exprs = agg_exprs
        self._snapshot: DataFrame | None = None
        self.subscribers: list[Callable[[DataFrame], None]] = []
        #: when set, every applied batch persists the new snapshot with
        #: the same write-then-atomic-pointer-flip protocol as
        #: GraphCatalog.save_durable; pair it with a streaming
        #: checkpointLocation and a restarted view resumes exactly where
        #: the stream left off (processed batches are skipped by the
        #: checkpoint, state comes back from _CURRENT)
        self.state_path = state_path
        if state_path is not None and spark is not None:
            self._load_state(spark)

    def subscribe(self, fn: Callable[[DataFrame], None]) -> None:
        self.subscribers.append(fn)

    # ---- durable state (restart-from-checkpoint recovery) ------------ #
    def _load_state(self, spark) -> None:
        import os

        if self.state_path is None:
            return
        cur = os.path.join(self.state_path, "_CURRENT")
        if os.path.exists(cur):
            with open(cur) as f:
                version = f.read().strip()
            self._snapshot = spark.read.parquet(
                os.path.join(self.state_path, version)
            )

    def _persist_state(self) -> None:
        """Write-then-atomic-pointer-flip, split into steps so a crash
        between any two of them (version written but pointer not
        flipped; pointer flipped but stale versions not pruned) leaves
        a recoverable directory: _load_state only ever trusts _CURRENT,
        orphan version dirs are inert and eventually reclaimed because
        the next write picks max+1 and prunes behind the new pointer."""
        if self.state_path is None or self._snapshot is None:
            return
        version, existing = self._write_version()
        self._flip_pointer(version)
        self._prune(existing)

    def _write_version(self) -> tuple[str, list[int]]:
        import os

        os.makedirs(self.state_path, exist_ok=True)
        existing = sorted(
            int(d[1:])
            for d in os.listdir(self.state_path)
            if d.startswith("v") and d[1:].isdigit()
        )
        version = f"v{(existing[-1] + 1) if existing else 0}"
        self._snapshot.write.mode("overwrite").parquet(
            os.path.join(self.state_path, version)
        )
        return version, existing

    def _flip_pointer(self, version: str) -> None:
        import os

        tmp = os.path.join(self.state_path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(self.state_path, "_CURRENT"))

    def _prune(self, existing: list[int]) -> None:
        import os
        import shutil

        for old in existing[:-1]:  # keep previous + current
            shutil.rmtree(
                os.path.join(self.state_path, f"v{old}"), ignore_errors=True
            )

    def attach(self, stream_df: DataFrame, checkpoint: str | None = None):
        if self.state_path is not None and self._snapshot is None:
            self._load_state(stream_df.sparkSession)
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
        # checkpoint the changelog too: a subscriber may hold the frame
        # past this batch, and with state_path set its lineage can reach
        # a persisted snapshot version that a LATER batch prunes
        # (fuzzer-found: upsert -> restart -> upsert -> upsert read a
        # deleted v0 parquet)
        changes = changes.localCheckpoint()
        self._persist_state()
        for fn in self.subscribers:
            fn(changes)

    def delete(self, keys: "list[tuple] | DataFrame") -> DataFrame:
        """Remove keys from the view; emits (and returns) the DELETE
        changelog DataFrame (op='DELETE', value columns from the removed
        rows in `old`, current value columns null) — the same shape a
        Delta MERGE ... WHEN MATCHED DELETE would put on the change feed.
        Keys absent from the view emit nothing (reference
        streaming/views.py delete: no-op when the key is missing)."""
        from pyspark.sql import functions as F

        if self._snapshot is None:
            raise ValueError("view has no data yet (stream not started?)")
        snap = self._snapshot
        if not isinstance(keys, DataFrame):
            key_df = snap.sparkSession.createDataFrame(
                [tuple(k) for k in keys],
                snap.select(*self.key_cols).schema,
            )
        else:
            key_df = keys.select(*self.key_cols)
        key_df = key_df.dropDuplicates()
        val_cols = [c for c in snap.columns if c not in self.key_cols]
        removed = snap.join(key_df, on=self.key_cols, how="left_semi")
        changes = removed.select(
            *self.key_cols,
            *[F.lit(None).cast(dict(snap.dtypes)[c]).alias(c) for c in val_cols],
            F.lit("DELETE").alias("op"),
            F.struct(*val_cols).alias("old"),
        ).localCheckpoint()
        self._snapshot = snap.join(
            key_df, on=self.key_cols, how="left_anti"
        ).localCheckpoint()
        self._persist_state()
        for fn in self.subscribers:
            fn(changes)
        return changes

    def snapshot(self) -> DataFrame:
        """The current view as a DataFrame (filter/limit with Spark ops)."""
        if self._snapshot is None:
            raise ValueError("view has no data yet (stream not started?)")
        return self._snapshot


# Back-compat alias: the reference names this surface IncrementalView.
# The distributed variant is the recommended default at any real scale.
IncrementalView = LocalIncrementalView
