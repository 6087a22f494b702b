"""Streaming slice tests: stream≡batch for windowed aggregates (Spark's
unified API), expiry sweep state transitions, and change-event emission."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from mcp_synaptic_spark.sources.tables import load_table
from mcp_synaptic_spark.streaming import expiry, windows


def _stream_events(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    return (
        spark.readStream.schema(batch.schema)
        .parquet(os.path.join(sf_dir))  # placeholder; overridden in tests
    )


def test_tumbling_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    # materialize events (post ns→µs conversion) so the file stream reads
    # the same rows the batch plan sees
    batch_events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    batch_events.write.parquet(src)

    stream = spark.readStream.schema(batch_events.schema).parquet(src)
    q = (
        windows.tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windows.tumbling_counts(batch_events).collect()
    }
    assert got == want and len(want) > 0


def test_session_windows_batch_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),  # same session (gap < 30m)
        (1, "2024-01-01 01:00:00", 3.0),  # new session (50m gap)
        (2, "2024-01-01 00:05:00", 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sorted(
        windows.session_windows(ev, gap="30 minutes").collect(),
        key=lambda r: (r.user_id, r.session_start),
    )
    assert len(out) == 3
    s1, s2, s3 = out
    assert s1.user_id == 1 and s1.n_events == 2 and s1.total_value == 3.0
    # session end = last event + gap
    assert s1.session_end == datetime.fromisoformat("2024-01-01 00:40:00")
    assert s2.user_id == 1 and s2.n_events == 1
    assert s3.user_id == 2 and s3.n_events == 1


def test_expiry_sweep_once(spark, tmp_path):
    state_dir = str(tmp_path / "memories")
    events_dir = str(tmp_path / "expiry_events")
    rows = [
        ("id-a", "a", "{}", "short_term", "absolute",
         datetime.fromisoformat("2024-01-14 00:00:00"), datetime.fromisoformat("2024-01-14 00:00:00"),
         None, datetime.fromisoformat("2024-01-14 01:00:00"), 3600, 0, None, None),
        ("id-b", "b", "{}", "permanent", "never",
         datetime.fromisoformat("2024-01-14 00:00:00"), datetime.fromisoformat("2024-01-14 00:00:00"),
         None, None, 0, 0, None, None),
    ]
    schema = (
        "id string, key string, data string, memory_type string, expiration_policy string, "
        "created_at timestamp, updated_at timestamp, last_accessed_at timestamp, "
        "expires_at timestamp, ttl_seconds int, access_count int, "
        "tags map<string,string>, metadata string"
    )
    spark.createDataFrame(rows, schema).write.parquet(state_dir)

    n = expiry.sweep_once(spark, state_dir, events_dir, now=datetime.fromisoformat("2024-01-15 00:00:00"))
    assert n == 1
    survivors = [r.key for r in spark.read.parquet(state_dir).collect()]
    assert survivors == ["b"]
    ev = spark.read.parquet(events_dir).collect()
    assert len(ev) == 1 and ev[0].event_type == "memory_expired" and ev[0].key == "a"

    # idempotent second sweep: nothing left to expire, no new events
    assert expiry.sweep_once(spark, state_dir, events_dir, now=datetime.fromisoformat("2024-01-16 00:00:00")) == 0
    # publish leaves no litter
    assert not os.path.exists(state_dir + "_next") and not os.path.exists(state_dir + "_old")


def test_expiry_sweep_crash_recovery(spark, tmp_path):
    """A sweep killed between the two publish renames (state gone, _next
    complete) must heal on the next sweep: _next is promoted, no rows lost."""
    import shutil

    state_dir = str(tmp_path / "memories")
    events_dir = str(tmp_path / "expiry_events")
    t0 = datetime.fromisoformat("2024-01-14 00:00:00")
    rows = [
        ("id-a", "a", "{}", "short_term", "absolute", t0, t0, None,
         datetime.fromisoformat("2024-01-14 01:00:00"), 3600, 0, None, None),
        ("id-b", "b", "{}", "permanent", "never", t0, t0, None, None, 0, 0, None, None),
    ]
    schema = (
        "id string, key string, data string, memory_type string, expiration_policy string, "
        "created_at timestamp, updated_at timestamp, last_accessed_at timestamp, "
        "expires_at timestamp, ttl_seconds int, access_count int, "
        "tags map<string,string>, metadata string"
    )
    spark.createDataFrame(rows, schema).write.parquet(state_dir)

    # simulate the crash window: survivors fully written to _next, state
    # renamed away to _old, process dies before the second rename
    spark.read.parquet(state_dir).where("key = 'b'").write.parquet(state_dir + "_next")
    os.rename(state_dir, state_dir + "_old")

    n = expiry.sweep_once(spark, state_dir, events_dir, now=datetime.fromisoformat("2024-01-16 00:00:00"))
    assert n == 0  # the promoted snapshot has no expired rows left
    assert [r.key for r in spark.read.parquet(state_dir).collect()] == ["b"]
    assert not os.path.exists(state_dir + "_next") and not os.path.exists(state_dir + "_old")

    # stale litter (crash BEFORE the first rename: state intact, _next stale)
    spark.read.parquet(state_dir).write.parquet(state_dir + "_next")
    shutil.rmtree(events_dir, ignore_errors=True)
    assert expiry.sweep_once(spark, state_dir, events_dir, now=datetime.fromisoformat("2024-01-17 00:00:00")) == 0
    assert [r.key for r in spark.read.parquet(state_dir).collect()] == ["b"]
    assert not os.path.exists(state_dir + "_next")


def test_run_expiry_sweep_streaming_query(spark, tmp_path):
    """End-to-end streaming sweep (rate tick → foreachBatch → sweep_once):
    the query must survive its own first PUBLISH — the publish renames
    state_dir away, so a checkpoint defaulted INSIDE state_dir would be
    destroyed mid-flight (the bug this test pins) — and later ticks must be
    idempotent (no duplicate events)."""
    import time

    state_dir = str(tmp_path / "memories")
    events_dir = str(tmp_path / "expiry_events")
    t0 = datetime.fromisoformat("2024-01-14 00:00:00")
    rows = [
        ("id-a", "a", "{}", "short_term", "absolute", t0, t0, None,
         datetime.fromisoformat("2024-01-14 01:00:00"), 3600, 0, None, None),
        ("id-b", "b", "{}", "permanent", "never", t0, t0, None, None, 0, 0, None, None),
    ]
    schema = (
        "id string, key string, data string, memory_type string, expiration_policy string, "
        "created_at timestamp, updated_at timestamp, last_accessed_at timestamp, "
        "expires_at timestamp, ttl_seconds int, access_count int, "
        "tags map<string,string>, metadata string"
    )
    spark.createDataFrame(rows, schema).write.parquet(state_dir)

    q = expiry.run_expiry_sweep(
        spark, state_dir, events_dir, interval_seconds=1,
        now_fn=lambda: datetime.fromisoformat("2024-01-15 00:00:00"),
    )
    try:
        deadline = time.time() + 90
        ticks_after_publish = 0
        while time.time() < deadline and ticks_after_publish < 3:
            if q.exception() is not None:
                raise AssertionError(f"streaming sweep died: {q.exception()}")
            if os.path.isdir(events_dir) and any(
                f.endswith(".parquet") for f in os.listdir(events_dir)
            ):
                ticks_after_publish += 1  # ~1 extra second per loop pass
            time.sleep(1.0)
        assert ticks_after_publish >= 3, "sweep never published within 90s"
        assert q.isActive  # survived the publish + subsequent idempotent ticks
    finally:
        q.stop()

    assert [r.key for r in spark.read.parquet(state_dir).collect()] == ["b"]
    ev = spark.read.parquet(events_dir).collect()
    assert len(ev) == 1 and ev[0].event_type == "memory_expired" and ev[0].key == "a"


def test_expiry_sweep_events_exactly_once_across_crash(spark, tmp_path):
    """Events are staged inside the published snapshot and drained after the
    publish; a crash in between (state updated, events not yet delivered)
    must deliver each staged event exactly once on the next sweep — never
    re-expire (the state no longer holds the row) and never duplicate (each
    part-file drain is one atomic rename)."""
    state_dir = str(tmp_path / "memories")
    events_dir = str(tmp_path / "expiry_events")
    t0 = datetime.fromisoformat("2024-01-14 00:00:00")
    rows = [
        ("id-a", "a", "{}", "short_term", "absolute", t0, t0, None,
         datetime.fromisoformat("2024-01-14 01:00:00"), 3600, 0, None, None),
        ("id-b", "b", "{}", "permanent", "never", t0, t0, None, None, 0, 0, None, None),
    ]
    schema = (
        "id string, key string, data string, memory_type string, expiration_policy string, "
        "created_at timestamp, updated_at timestamp, last_accessed_at timestamp, "
        "expires_at timestamp, ttl_seconds int, access_count int, "
        "tags map<string,string>, metadata string"
    )
    spark.createDataFrame(rows, schema).write.parquet(state_dir)

    # run a real sweep, then simulate "crash after publish, before drain" by
    # moving the delivered events BACK into the snapshot's staging dir
    n = expiry.sweep_once(spark, state_dir, events_dir, now=datetime.fromisoformat("2024-01-15 00:00:00"))
    assert n == 1
    pending = os.path.join(state_dir, "_pending_events")
    os.makedirs(pending)
    for name in os.listdir(events_dir):
        if name.endswith(".parquet"):
            os.rename(os.path.join(events_dir, name), os.path.join(pending, name))
    # next sweep: drains the staged events exactly once, expires nothing new
    assert expiry.sweep_once(spark, state_dir, events_dir, now=datetime.fromisoformat("2024-01-16 00:00:00")) == 0
    ev = spark.read.parquet(events_dir).collect()
    assert len(ev) == 1 and ev[0].event_type == "memory_expired" and ev[0].key == "a"
    assert not os.path.exists(pending)
    # the staged dir is invisible to state reads (underscore-prefixed)
    assert [r.key for r in spark.read.parquet(state_dir).collect()] == ["b"]


def test_access_log_stream_equals_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState touch aggregation ≡ the batch groupBy twin."""
    from mcp_synaptic_spark.streaming.access_log import touch_updates_stream

    batch_events = load_table(spark, sf_dir, "events")
    access = batch_events.select(
        F.concat(F.lit("mem-"), (F.col("event_id") % 50).cast("string")).alias("key"),
        F.col("ts"),
    )
    src = str(tmp_path / "access_src")
    access.write.parquet(src)

    stream = spark.readStream.schema(access.schema).parquet(src)
    q = (
        touch_updates_stream(stream)
        .writeStream.format("memory")
        .queryName("touch_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode can emit a row per key per micro-batch: keep the last per key
    got_rows = spark.sql(
        "SELECT key, last_accessed_at, n_touches FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_touches DESC) AS rn"
        "  FROM touch_test) WHERE rn = 1"
    ).collect()
    got = {r.key: (r.last_accessed_at, r.n_touches) for r in got_rows}
    want = {
        r.key: (r.last_ts, r.n)
        for r in access.groupBy("key")
        .agg(F.max("ts").alias("last_ts"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(want) == 50


def test_apply_access_log_batch_semantics(spark):
    from datetime import datetime

    from mcp_synaptic_spark.operators.memory import apply_access_log

    schema = (
        "id string, key string, data string, memory_type string, expiration_policy string, "
        "created_at timestamp, updated_at timestamp, last_accessed_at timestamp, "
        "expires_at timestamp, ttl_seconds int, access_count int, "
        "tags map<string,string>, metadata string"
    )
    t0 = datetime.fromisoformat("2024-01-01 00:00:00")
    mem = spark.createDataFrame(
        [
            ("i1", "a", "{}", "ephemeral", "sliding", t0, t0, t0, datetime.fromisoformat("2024-01-01 00:05:00"), 300, 1, None, None),
            ("i2", "b", "{}", "long_term", "absolute", t0, t0, t0, datetime.fromisoformat("2024-01-08 00:00:00"), 604800, 0, None, None),
            ("i3", "c", "{}", "permanent", "never", t0, t0, None, None, 0, 0, None, None),
        ],
        schema,
    )
    log = spark.createDataFrame(
        [
            # each access lands before the (slid) expiry -> a live chain
            ("a", datetime.fromisoformat("2024-01-01 00:02:00")),
            ("a", datetime.fromisoformat("2024-01-01 00:06:00")),
            ("a", datetime.fromisoformat("2024-01-01 00:10:00")),
            ("b", datetime.fromisoformat("2024-01-01 03:00:00")),
        ],
        "key string, ts timestamp",
    )
    out = {r.key: r for r in apply_access_log(mem, log).collect()}
    # sliding: expires_at = latest live access + ttl
    assert out["a"].access_count == 4
    assert out["a"].last_accessed_at == datetime.fromisoformat("2024-01-01 00:10:00")
    assert out["a"].expires_at == datetime.fromisoformat("2024-01-01 00:15:00")
    # absolute: only last_accessed/count advance, expires_at untouched
    assert out["b"].access_count == 1
    assert out["b"].expires_at == datetime.fromisoformat("2024-01-08 00:00:00")
    # untouched key: unchanged
    assert out["c"].access_count == 0 and out["c"].expires_at is None


def test_document_added_feed(spark, tmp_path):
    """S12 doc-side change feed (reference README.md:196-205): snapshot diff
    emits one document_added event per new doc id."""
    from mcp_synaptic_spark.streaming.expiry import emit_document_added

    events_dir = str(tmp_path / "doc_events")
    prev = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    curr = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string")
    n = emit_document_added(prev, curr, events_dir, now=datetime.fromisoformat("2024-01-15 00:00:00"))
    assert n == 2
    ev = spark.read.parquet(events_dir).collect()
    assert sorted((r.event_type, r.key) for r in ev) == [
        ("document_added", "3"),
        ("document_added", "4"),
    ]
    # idempotent when nothing changed
    assert emit_document_added(curr, curr, events_dir) == 0


def test_replay_access_stream_equals_batch(spark, sf_dir, tmp_path):
    """Stateful replay twin ≡ batch apply_access_log on the per-key
    (alive, n_alive, last_alive) projection."""
    from mcp_synaptic_spark.operators import memory as M
    from mcp_synaptic_spark.sources.memories import memories_from_events
    from mcp_synaptic_spark.streaming.access_log import replay_access_stream

    batch_events = load_table(spark, sf_dir, "events")
    mem = memories_from_events(batch_events)
    access = batch_events.select(
        F.concat(F.lit("mem-"), (F.col("event_id") % 50).cast("string")).alias("key"),
        F.col("ts"),
    )
    meta = mem.select(
        "key", "created_at", "expires_at", "expiration_policy", "ttl_seconds"
    )
    joined = access.join(meta, "key").where(F.col("ts") >= F.col("created_at"))
    src = str(tmp_path / "replay_src")
    joined.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(joined.schema).parquet(src)
    q = (
        replay_access_stream(stream)
        .writeStream.format("memory")
        .queryName("replay_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got_rows = spark.sql(
        "SELECT key, alive, n_alive, last_alive_at FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_alive DESC) AS rn"
        "  FROM replay_test) WHERE rn = 1"
    ).collect()
    got = {r.key: (r.alive, r.n_alive, r.last_alive_at) for r in got_rows}

    # batch twin: survivors of apply_access_log carry the same counts
    out = M.apply_access_log(mem, access)
    batch_rows = {r.key: r for r in out.where(F.col("key").isin(list(got))).collect()}
    base = {r.key: r.access_count for r in mem.where(F.col("key").isin(list(got))).collect()}
    checked = 0
    for key, (alive, n_alive, _last) in got.items():
        if key not in base:
            continue  # access key with no memory row
        if alive:
            assert key in batch_rows, key
            assert batch_rows[key].access_count == base[key] + n_alive, key
        else:
            assert key not in batch_rows, key  # deleted by replay in both
        checked += 1
    assert checked > 0


def test_sweep_rejects_cross_filesystem_dirs(spark, tmp_path, monkeypatch):
    # ADVICE r6: the exactly-once drain relies on same-filesystem os.rename;
    # a cross-device pair must fail fast at sweep start, not EXDEV mid-drain.
    import os as _os

    import pytest

    from mcp_synaptic_spark.streaming import expiry as E

    state = str(tmp_path / "state")
    events = str(tmp_path / "events")

    class FakeStatResult:
        def __init__(self, dev):
            self.st_dev = dev

    def stat_with_devs(path, *a, **kw):
        # pretend events_dir sits on a different device than everything else
        dev = 1 if _os.path.abspath(str(path)).startswith(_os.path.abspath(events)) else 0
        return FakeStatResult(dev)

    monkeypatch.setattr(E.os, "stat", stat_with_devs)
    with pytest.raises(ValueError, match="same filesystem"):
        E._require_same_filesystem(state, events)
    # same-device pair passes (restore real stat)
    monkeypatch.undo()
    E._require_same_filesystem(state, events)


def test_run_expiry_sweep_streaming_txn_backend(spark, tmp_path):
    """The streaming driver ticks the ACID sweep: expired rows leave the
    TxnTable as commits and events land exactly-once — same harness as the
    parquet-backend streaming test, different state machinery."""
    from datetime import datetime, timezone

    from mcp_synaptic_spark.state.txn import TxnTable
    from mcp_synaptic_spark.streaming.expiry import run_expiry_sweep

    state, events_dir = str(tmp_path / "t"), str(tmp_path / "events")
    past = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("live", datetime(2025, 1, 1, tzinfo=timezone.utc), None, "1"),
        ("dead", datetime(2025, 1, 1, tzinfo=timezone.utc), past, "2"),
    ]
    TxnTable.create(
        spark,
        state,
        spark.createDataFrame(rows, "key string, updated_at timestamp, expires_at timestamp, payload string"),
    )
    q = run_expiry_sweep(
        spark,
        state,
        events_dir,
        interval_seconds=1,
        now_fn=lambda: datetime(2025, 6, 1, tzinfo=timezone.utc),
        checkpoint_dir=str(tmp_path / "ckpt"),
        backend="txn",
    )
    try:
        import time

        deadline = time.time() + 60
        t = TxnTable(spark, state)
        while time.time() < deadline:
            if t.version() >= 1 and os.path.isdir(events_dir):
                break
            time.sleep(1)
    finally:
        q.stop()
    t = TxnTable(spark, state)
    assert {r.key for r in t.read().collect()} == {"live"}
    assert [r.key for r in spark.read.parquet(events_dir).collect()] == ["dead"]


def test_streaming_exact_dedup_equals_batch(spark, sf_dir, tmp_path):
    """First-seen-wins streaming dedup must agree with the batch exact-dedup
    notion of duplicate (same content digest)."""
    from mcp_synaptic_spark.streaming.dedup_stream import streaming_exact_dedup

    docs = load_table(spark, sf_dir, "documents").limit(100).select("doc_id", "text")
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100_000)  # same text, new ids
    both = docs.unionByName(dup)
    src = str(tmp_path / "src")
    both.write.parquet(src)

    stream = spark.readStream.schema(both.schema).parquet(src)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdedup_plain")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sdedup_plain")
    # limit() without order is nondeterministic across jobs — derive the
    # expected distinct-text count from what was actually WRITTEN
    n_distinct = spark.read.parquet(src).select("text").distinct().count()
    assert got.count() == n_distinct
    assert got.select("text").distinct().count() == n_distinct


def test_streaming_exact_dedup_with_watermark_bounded_state(spark, sf_dir, tmp_path):
    """The production shape: a ts column + watermark bounds the seen-set.
    Duplicates arriving inside the horizon are still dropped."""
    from mcp_synaptic_spark.streaming.dedup_stream import streaming_exact_dedup

    docs = (
        load_table(spark, sf_dir, "documents")
        .limit(50)
        # ts offset from epoch: a record AT exactly epoch 0 collides with the
        # initial watermark boundary and is treated as late on arrival
        .select(
            "doc_id", "text", F.timestamp_seconds(F.lit(3600) + F.col("doc_id") % 100).alias("ts")
        )
    )
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100_000)
    both = docs.unionByName(dup)
    src = str(tmp_path / "src_wm")
    both.write.parquet(src)

    stream = spark.readStream.schema(both.schema).parquet(src)
    q = (
        streaming_exact_dedup(stream, ts_col="ts", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sdedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    expected = spark.read.parquet(src).select("text").distinct().count()
    assert spark.table("sdedup_wm").count() == expected


def test_repetition_stats_streams_unchanged(spark, sf_dir, tmp_path):
    """The narrow pipeline tier composes with Structured Streaming as-is:
    repetition_stats (text_analysis.py) is a stateless projection, so the
    SAME operator code runs under readStream → append mode with no
    modification and yields the batch result. This pins the claim that the
    zero-shuffle text operators are streaming-safe by construction."""
    from mcp_synaptic_spark.operators.text_analysis import repetition_stats

    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_src")
    batch_docs.write.parquet(src)

    stream = spark.readStream.schema(batch_docs.schema).parquet(src)
    q = (
        repetition_stats(stream)
        .writeStream.format("memory")
        .queryName("repetition_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.n_words, r.dup_word_frac, r.top_bigram, r.top_bigram_count)
        for r in spark.sql("SELECT * FROM repetition_stream_test").collect()
    }
    want = {
        r.doc_id: (r.n_words, r.dup_word_frac, r.top_bigram, r.top_bigram_count)
        for r in repetition_stats(batch_docs).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_quality_gate_equals_batch(spark, sf_dir, tmp_path):
    """The on-arrival corpus filter (VERDICT r7 #6): text_analysis.quality_gate
    is a pure projection chain, so it composes with readStream unchanged —
    the gate decisions for documents arriving as a stream must equal the
    batch gate over the same corpus, rule for rule."""
    from mcp_synaptic_spark.operators.text_analysis import quality_gate

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        quality_gate(stream)
        .writeStream.format("memory")
        .queryName("gate_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.keep, r.reasons)
        for r in spark.sql("SELECT * FROM gate_test").collect()
    }
    want = {r.doc_id: (r.keep, r.reasons) for r in quality_gate(docs).collect()}
    assert got == want and len(want) > 0
    # both keep and drop must occur on the real corpus; multiple distinct
    # rules fire even at sf0.001 (the every-rule-fires property holds at
    # sf0.01 and is pinned by the graded quality_gate query there)
    kept = {k for k, (keep, _) in want.items() if keep}
    assert kept and len(kept) < len(want)
    from mcp_synaptic_spark.operators.text_analysis import GATE_RULES

    fired = {name for _, (_, rs) in want.items() for name in rs.split(",") if name}
    assert len(fired) >= 2 and fired <= {name for name, _ in GATE_RULES}


def test_streaming_chunk_documents_equals_batch(spark, sf_dir, tmp_path):
    """chunk_documents is a projection + per-doc explode, so it composes
    with readStream unchanged — chunks for documents arriving as a stream
    must equal the batch chunking of the same corpus."""
    from mcp_synaptic_spark.operators.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_chunk_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        chunk_documents(stream, chunk_words=40, overlap=10)
        .writeStream.format("memory")
        .queryName("chunk_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_words, r.start_word)
        for r in spark.sql("SELECT * FROM chunk_test").collect()
    }
    want = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_words, r.start_word)
        for r in chunk_documents(docs, chunk_words=40, overlap=10).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_incremental_dedup_screen_foreachbatch(spark, sf_dir, tmp_path):
    """On-arrival admission gate: dedup_incremental is a batch-vs-static
    screen, so its streaming form is foreachBatch (one screen per
    micro-batch against the static corpus — multi-aggregation plans don't
    stream directly, and per-micro-batch screening is the semantics an
    ingestion gate wants anyway). Stream verdicts must equal the batch
    screen of the same arrivals."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import dedup_incremental

    corpus = load_table(spark, sf_dir, "documents")
    arrivals = corpus.limit(5).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    ).unionAll(
        spark.createDataFrame(
            [(990_001, "totally novel arrival text here")], "doc_id LONG, text STRING"
        )
    )
    src = str(tmp_path / "arrivals")
    arrivals.write.parquet(src)

    results = []

    def screen(batch_df, _batch_id):
        results.extend(dedup_incremental(corpus, batch_df).collect())

    stream = spark.readStream.schema(arrivals.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(screen)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {r.doc_id: (r.verdict, r.match_id) for r in results}
    want = {
        r.doc_id: (r.verdict, r.match_id)
        for r in dedup_incremental(corpus, arrivals).collect()
    }
    assert got == want and len(want) == 6
    assert got[990_001][0] == "admitted"
    assert sum(1 for v, _ in got.values() if v == "exact_dup") == 5


def test_ingest_pipeline_stream_equals_batch(spark, sf_dir, tmp_path):
    """The composed front door (streaming/ingest.py): gate → exact dedup →
    chunk, one callable, append-mode streaming. The surviving chunk set for
    streamed arrivals must equal the batch run over the same corpus
    (exact-dup copies have identical downstream chunks, so first-seen-wins
    order cannot change the set)."""
    from mcp_synaptic_spark.streaming.ingest import ingest_pipeline

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "ingest_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        ingest_pipeline(stream, chunk_words=40, overlap=10)
        .writeStream.format("memory")
        .queryName("ingest_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in spark.sql("SELECT * FROM ingest_test").collect()
    }
    want = {
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in ingest_pipeline(docs, chunk_words=40, overlap=10).collect()
    }
    assert got == want and len(want) > 0
    # the gate actually dropped something: fewer surviving docs than input
    surviving_docs = {d for d, _, _ in want}
    assert 0 < len(surviving_docs) < docs.count()


def test_quality_gate_keep_cols_passthrough_matches_bare_gate(spark, sf_dir):
    """keep_cols must not perturb the verdicts (pure pass-through)."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.text_analysis import quality_gate

    docs = load_table(spark, sf_dir, "documents")
    bare = {r.doc_id: (r.keep, r.reasons) for r in quality_gate(docs).collect()}
    carried = {
        r.doc_id: (r.keep, r.reasons, r.text)
        for r in quality_gate(docs, keep_cols=("text",)).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert {k: v[:2] for k, v in carried.items()} == bare
    assert all(carried[k][2] == texts[k] for k in carried)


def test_admit_stream_index_append_across_microbatches(spark, sf_dir, tmp_path):
    """The complete incremental service: with index_path + append_admitted,
    a document admitted in micro-batch N must screen exact_dup in batch
    N+1 (the index grew between batches). Uses two parquet files written
    separately with maxFilesPerTrigger=1 to force two micro-batches."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import dedup_index_write
    from mcp_synaptic_spark.streaming.ingest import admit_stream

    corpus = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_write(corpus, index_path)

    novel_text = "entirely fresh arrival that matches nothing in the corpus"
    b1 = spark.createDataFrame([(900_001, novel_text)], "doc_id LONG, text STRING")
    b2 = spark.createDataFrame([(900_002, novel_text)], "doc_id LONG, text STRING")
    src = str(tmp_path / "arrivals")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    results = []
    q = admit_stream(
        spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(src),
        None,
        lambda df, bid: results.extend((bid, r) for r in df.collect()),
        checkpoint=str(tmp_path / "ckpt"),
        index_path=index_path,
        append_admitted=True,
    )
    q.awaitTermination(180)

    by_doc = {r.doc_id: r for _, r in results}
    assert len(by_doc) == 2
    first, second = sorted(by_doc)  # 900_001 arrived in the earlier batch
    # whichever order the two files triggered, exactly one copy was admitted
    # and the other flagged exact_dup against it
    verdicts = sorted(by_doc[d].verdict for d in (first, second))
    assert verdicts == ["admitted", "exact_dup"]
    dup = next(r for r in by_doc.values() if r.verdict == "exact_dup")
    adm = next(r for r in by_doc.values() if r.verdict == "admitted")
    assert dup.match_id == adm.doc_id


def test_ingest_pipeline_threads_non_default_id_col(spark, sf_dir):
    """r9 (ADVICE r8): id_col used to be non-functional — quality_gate
    hard-codes doc_id, so any other name failed at analysis time. The
    rename-at-the-boundary fix must produce the same chunks under the
    caller's column name, and refuse an ambiguous input."""
    import pytest
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.streaming.ingest import ingest_pipeline

    docs = load_table(spark, sf_dir, "documents").limit(50)
    renamed = docs.withColumnRenamed("doc_id", "crawl_id")
    got = {
        (r.crawl_id, r.chunk_idx, r.chunk_text)
        for r in ingest_pipeline(renamed, id_col="crawl_id", chunk_words=40, overlap=10).collect()
    }
    want = {
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in ingest_pipeline(docs, chunk_words=40, overlap=10).collect()
    }
    assert got == want and len(want) > 0
    with pytest.raises(ValueError, match="doc_id"):
        ingest_pipeline(renamed.withColumn("doc_id", F.lit(1)), id_col="crawl_id")


def test_admit_stream_txn_admission_same_service_plus_ledger(spark, sf_dir, tmp_path):
    """txn_admission=True (r9, VERDICT r8 #3): the cross-micro-batch service
    behaves identically (batch-N admit flags exact_dup in batch N+1) while
    every admission also lands in the TxnTable ledger — the arbitration
    that stops racing admitters across queries (the race itself is pinned
    in test_dedup.py::test_index_append_txn_race_exactly_one_admission)."""
    import pytest
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import dedup_index_write
    from mcp_synaptic_spark.state.txn import TxnTable
    from mcp_synaptic_spark.streaming.ingest import admit_stream

    corpus = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_write(corpus, index_path)

    novel_text = "an unprecedented arrival for the txn admission test"
    b1 = spark.createDataFrame([(910_001, novel_text)], "doc_id LONG, text STRING")
    b2 = spark.createDataFrame([(910_002, novel_text)], "doc_id LONG, text STRING")
    src = str(tmp_path / "arrivals")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    results = []
    q = admit_stream(
        spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(src),
        None,
        lambda df, bid: results.extend(df.collect()),
        checkpoint=str(tmp_path / "ckpt"),
        index_path=index_path,
        append_admitted=True,
        txn_admission=True,
    )
    q.awaitTermination(180)

    by_doc = {r.doc_id: r for r in results}
    assert sorted(r.verdict for r in by_doc.values()) == ["admitted", "exact_dup"]
    # exactly one ledger row for the contested content
    ledger = TxnTable(spark, f"{index_path}/_admissions", key_col="ch")
    rows = ledger.read().collect()
    assert len(rows) == 1 and rows[0].id in by_doc
    # misuse guard: arbitration without an append is meaningless
    with pytest.raises(ValueError, match="append_admitted"):
        admit_stream(
            spark.readStream.schema(b1.schema).parquet(src), None, lambda df, bid: None,
            checkpoint=str(tmp_path / "ckpt2"), index_path=index_path, txn_admission=True,
        )


def test_quality_admit_stream_composed_front_door(spark, sf_dir, tmp_path):
    """r12 (VERDICT r11 #7): the COMPLETE streaming admission service —
    gate → prefit-LM perplexity filter → incremental dedup screen. Three
    pinned behaviors: (1) streamed per-doc verdicts equal the batch
    composition (quality_admit_verdicts) against the same static index;
    (2) a gate-failing doc is gate_rejected BEFORE any LM/dedup verdict;
    (3) a byte-copy of an indexed corpus doc that clears both quality
    tiers flags exact_dup, and with append_admitted a doc admitted in
    batch N flags exact_dup in batch N+1."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.dedup import dedup_index_load, dedup_index_write
    from mcp_synaptic_spark.operators.lm import perplexity, train_bigram_lm
    from mcp_synaptic_spark.streaming.ingest import (
        quality_admit_stream,
        quality_admit_verdicts,
    )

    corpus = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_write(corpus, index_path)
    lm_tabs = tuple(t.cache() for t in train_bigram_lm(corpus))

    # pick a corpus doc KNOWN to clear the LM cut so its copy must reach the
    # dedup tier; cutoff = its own logppl + margin
    probe = perplexity(corpus.limit(200), lm=lm_tabs).orderBy("logppl").first()
    ppl_cut = float(probe["logppl"]) + 0.05
    good = corpus.where(F.col("doc_id") == probe["doc_id"]).first()

    novel_text = "entirely fresh arrival that matches nothing in the corpus today"
    b1 = spark.createDataFrame(
        [
            (910_001, good["text"], good["lang"]),   # copy → exact_dup
            (910_002, "zz zz", good["lang"]),        # too short → gate_rejected
            (910_003, novel_text, good["lang"]),     # novel (LM fate data-driven)
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    b2 = spark.createDataFrame(
        [(910_004, good["text"], good["lang"])],     # copy again → exact_dup
        "doc_id LONG, text STRING, lang STRING",
    )
    src = str(tmp_path / "arrivals")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    results = []
    q = quality_admit_stream(
        spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(src),
        lm_tabs,
        lambda df, bid: results.extend(df.collect()),
        checkpoint=str(tmp_path / "ckpt"),
        index_path=index_path,
        ppl_cutoff=ppl_cut,
        append_admitted=True,
    )
    q.awaitTermination(180)
    by_doc = {r.doc_id: r for r in results}
    assert len(by_doc) == 4
    assert by_doc[910_001].verdict == "exact_dup"
    assert by_doc[910_001].match_id == probe["doc_id"]
    assert by_doc[910_002].verdict == "gate_rejected"
    assert "short" in by_doc[910_002].reasons
    assert by_doc[910_004].verdict == "exact_dup"

    # stream == batch composition against the (now grown) index
    static_idx = dedup_index_load(spark, index_path)
    twin = {
        r.doc_id: r
        for r in quality_admit_verdicts(
            b1.unionByName(b2), lm_tabs, index=static_idx, ppl_cutoff=ppl_cut
        ).collect()
    }
    for d in (910_001, 910_002, 910_004):
        assert twin[d].verdict == by_doc[d].verdict, d
    # the novel doc's fate is data-driven (lm_rejected/lm_unscored/admitted)
    # but must agree between stream and the batch twin — UNLESS it was
    # admitted and appended, in which case the twin (probing the grown
    # index) sees exact_dup with the streamed copy as its own match
    if by_doc[910_003].verdict == "admitted":
        assert twin[910_003].verdict == "exact_dup"
    else:
        assert twin[910_003].verdict == by_doc[910_003].verdict
    for t in lm_tabs:
        t.unpersist()


def test_quality_admit_verdicts_text_col_reaches_dedup_screen(spark, sf_dir):
    """ADVICE r12: text_col must be forwarded to the dedup tier too — a
    caller using text_col='body' used to crash in dedup_incremental (or
    silently screen a stray 'text' column while the gate/LM tiers scored
    'body'). Pinned: the renamed-column run equals the default-column run
    verdict-for-verdict, including on a frame that ALSO carries a decoy
    'text' column."""
    from pyspark.sql import functions as F

    from mcp_synaptic_spark.operators.lm import train_bigram_lm
    from mcp_synaptic_spark.streaming.ingest import quality_admit_verdicts

    corpus = load_table(spark, sf_dir, "documents").limit(200)
    lm_tabs = tuple(t.cache() for t in train_bigram_lm(corpus))
    batch = corpus.limit(5).select(
        (F.col("doc_id") + 920_000).alias("doc_id"), "text", "lang"
    )
    base = {
        r.doc_id: (r.verdict, r.match_id)
        for r in quality_admit_verdicts(batch, lm_tabs, corpus=corpus).collect()
    }
    # at least one copy must clear gate+LM and reach the dedup tier — that
    # exact_dup is the witness the screen saw the real text column
    assert "exact_dup" in {v for v, _ in base.values()}

    renamed = batch.withColumnRenamed("text", "body").withColumn(
        "text", F.lit("decoy never matches anything in the corpus at all")
    )
    got = {
        r.doc_id: (r.verdict, r.match_id)
        for r in quality_admit_verdicts(
            renamed, lm_tabs, corpus=corpus, text_col="body", corpus_content_col="text"
        ).collect()
    }
    assert got == base
    for t in lm_tabs:
        t.unpersist()
