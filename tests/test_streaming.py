"""Streaming pipeline tests: session windows + windowed counts via an
availableNow file-stream micro-batch, and the replay-safe counter merge."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.streaming import pipelines


@pytest.fixture(scope="module")
def msg_dir(spark):
    d = tempfile.mkdtemp()
    df = spark.createDataFrame(
        [
            ("m1", "conv1", "2024-01-01 10:00:00"),
            ("m2", "conv1", "2024-01-01 10:05:00"),
            ("m3", "conv1", "2024-01-01 11:30:00"),  # > 30 min gap -> new session
            ("m4", "conv2", "2024-01-01 10:00:00"),
        ],
        "message_id string, conversation_id string, event_time string",
    ).select("message_id", "conversation_id", F.to_timestamp("event_time").alias("event_time"))
    df.write.mode("overwrite").parquet(d + "/in")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sessionized_messages_stream(spark, msg_dir):
    stream = spark.readStream.schema(
        "message_id string, conversation_id string, event_time timestamp"
    ).parquet(msg_dir + "/in")
    sessions = pipelines.sessionized_messages(stream, gap="30 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("select * from sess_out").collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r.conversation_id, []).append(r)
    assert len(by_conv["conv1"]) == 2  # split by the >30min gap
    assert sorted(r.message_count for r in by_conv["conv1"]) == [1, 2]
    assert len(by_conv["conv2"]) == 1


def test_batch_completion_listener(spark, msg_dir):
    """ST7: the webhook-analog listener observes micro-batch completions."""
    events = []
    from memory_opensource_spark.streaming.pipelines import BatchCompletionListener

    listener = BatchCompletionListener(events.append).attach(spark)
    try:
        stream = spark.readStream.schema(
            "message_id string, conversation_id string, event_time timestamp"
        ).parquet(msg_dir + "/in")
        q = (
            stream.groupBy("conversation_id").count()
            .writeStream.format("memory").queryName("listener_out")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        import time

        for _ in range(20):  # listener events arrive asynchronously
            if any(e["num_input_rows"] > 0 for e in events):
                break
            time.sleep(0.5)
        assert any(e["num_input_rows"] > 0 for e in events)
        assert all("batch_id" in e and "timestamp" in e for e in events)
    finally:
        listener.detach(spark)


def test_watermark_drops_too_late_data(spark):
    """Late data inside the 1h watermark merges; data later than the watermark
    is dropped once the window has been finalized (ST2 late-data policy)."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp()
    try:
        def write(name, rows):
            df = spark.createDataFrame(rows, "message_id string, conversation_id string, event_time string").select(
                "message_id", "conversation_id", F.to_timestamp("event_time").alias("event_time")
            )
            df.coalesce(1).write.parquet(f"{d}/in/{name}")

        # batch 1 advances the watermark far ahead; batch 2 arrives 10h late
        write("b0", [("m1", "c1", "2024-01-01 10:00:00"),
                     ("m2", "c1", "2024-01-01 20:00:00")])

        from memory_opensource_spark.streaming import pipelines

        emitted = []

        def sink(batch_df, batch_id):
            emitted.extend(batch_df.collect())

        def run():
            stream = spark.readStream.schema(
                "message_id string, conversation_id string, event_time timestamp"
            ).option("maxFilesPerTrigger", "1").parquet(f"{d}/in/*")
            q = (
                pipelines.sessionized_messages(stream, gap="30 minutes", watermark="1 hour")
                .writeStream.foreachBatch(sink)
                .outputMode("append").trigger(availableNow=True)
                .option("checkpointLocation", f"{d}/ckpt").start()
            )
            q.awaitTermination(120)

        run()
        write("b1", [("m3", "c1", "2024-01-01 10:05:00")])  # 10h behind max ts
        run()
        # the finalized 10:00 session did NOT gain the too-late message
        assert emitted, "expected finalized sessions"
        for r in emitted:
            assert r.message_count == 1  # m3 never merged into m1's session
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_decayed_counter_merge_replay_safe(spark):
    counters = spark.createDataFrame(
        [("k1", 2.0, 10.0, "2024-01-01 00:00:00")],
        "key string, ema double, hit_total double, ema_updated_at string",
    ).select("key", "ema", "hit_total", F.to_timestamp("ema_updated_at").alias("ema_updated_at"))
    batch = spark.createDataFrame(
        [("k1", "2024-01-31 00:00:00"), ("k2", "2024-01-31 00:00:00")], "key string, ts string"
    ).select("key", F.to_timestamp("ts").alias("ts"))
    out = {r.key: r for r in pipelines.decayed_counter_updates(batch, counters, "key").collect()}
    # k1: old ema 2.0 decayed one half-life -> 1.0, plus 1 fresh hit -> 2.0
    assert abs(out["k1"].ema - 2.0) < 1e-9
    assert out["k1"].hit_total == 11.0
    # k2: brand new key
    assert abs(out["k2"].ema - 1.0) < 1e-9 and out["k2"].hit_total == 1.0


def test_windowed_event_counts_stream(spark, msg_dir):
    # reuse the message fixture as an event stream keyed by conversation
    stream = (
        spark.readStream.schema("message_id string, conversation_id string, event_time timestamp")
        .parquet(msg_dir + "/in")
        .select(
            F.col("event_time").alias("ts"),
            F.col("conversation_id").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
    )
    counts = pipelines.windowed_event_counts(stream, width="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("select * from win_out").collect()
    assert sum(r.event_count for r in out) == 4


def test_streaming_dedup_within_watermark(spark):
    """Exactly-once ingest analog (ST1): duplicate message ids arriving across
    micro-batches within the watermark are dropped by
    dropDuplicatesWithinWatermark — the streaming twin of the batch
    dedup_exact_hash / api idempotent-MERGE path."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp()
    try:
        def write(name, rows):
            df = spark.createDataFrame(
                rows, "message_id string, conversation_id string, event_time string"
            ).select("message_id", "conversation_id",
                     F.to_timestamp("event_time").alias("event_time"))
            df.coalesce(1).write.parquet(f"{d}/in/{name}")

        write("b0", [("m1", "c1", "2024-01-01 10:00:00"),
                     ("m2", "c1", "2024-01-01 10:01:00")])
        write("b1", [("m1", "c1", "2024-01-01 10:02:00"),   # duplicate id, in-watermark
                     ("m3", "c1", "2024-01-01 10:03:00")])

        emitted = []

        def sink(batch_df, batch_id):
            emitted.extend(batch_df.collect())

        stream = spark.readStream.schema(
            "message_id string, conversation_id string, event_time timestamp"
        ).option("maxFilesPerTrigger", "1").parquet(f"{d}/in/*")
        q = (
            stream.withWatermark("event_time", "1 hour")
            .dropDuplicatesWithinWatermark(["message_id"])
            .writeStream.foreachBatch(sink)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", f"{d}/ckpt").start()
        )
        q.awaitTermination(120)

        ids = sorted(r.message_id for r in emitted)
        assert ids == ["m1", "m2", "m3"], ids
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_decayed_counter_updates_late_batch_never_inflates(spark):
    """A replayed/late micro-batch whose max ts PRECEDES the stored
    ema_updated_at must decay the batch hits forward — never run the stored
    ema's decay backwards (0.5^negative > 1) or regress the timestamp
    (round-5 review finding, verified live by the reviewer)."""
    from memory_opensource_spark.streaming.pipelines import decayed_counter_updates

    counters = spark.createDataFrame(
        [("m1", 10.0, 100.0, "2024-02-01 00:00:00")],
        "memory_id string, ema double, hit_total double, ema_updated_at string",
    ).withColumn("ema_updated_at", F.to_timestamp("ema_updated_at"))
    late = spark.createDataFrame(
        [("m1", "2024-01-01 00:00:00")], "memory_id string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))

    out = decayed_counter_updates(late, counters, "memory_id").first()
    # stored ema unchanged (decay to its own, newer, timestamp = x1.0);
    # the late hit decays FORWARD 31 days: 0.5^(31/30)
    assert abs(out.ema - (10.0 + 0.5 ** (31 / 30.0))) < 1e-9
    assert out.hit_total == 101.0
    assert str(out.ema_updated_at) == "2024-02-01 00:00:00"  # never regresses


def test_streaming_frontier_ingest_incremental_discovery(spark, tmp_path):
    """r14 foreach_batch_frontier_ingest: fetched-page micro-batches
    grow a frontier queue incrementally — links gate through robots +
    blocklist, URLs ever seen (fetched or queued) never re-queue, and
    a fresh-checkpoint replay leaves state unchanged."""
    import json
    import os

    from memory_opensource_spark.functions.robots import (
        robots_rules_table)
    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_frontier_ingest)

    d = tmp_path / "fetched"
    d.mkdir()
    sd = str(tmp_path / "state")

    def page(url, *links):
        return json.dumps({"url": url, "html": "<html>" + "".join(
            f'<a href="{x}">l</a>' for x in links) + "</html>"})

    A = "https://a.example/start"
    B = "https://a.example/next"
    C = "https://b.example/two"
    # batch 0: page A links B, a robots-blocked URL, a blocklisted URL
    (d / "b0.json").write_text(page(
        A, B, "https://a.example/private/x", "https://blk.example/s"))
    # batch 1: page B (fetched from the queue) links C, A (seen) and B
    (d / "b1.json").write_text(page(B, C, A, B))
    for i in range(2):
        os.utime(d / f"b{i}.json", (1_700_000_000 + i,) * 2)

    rules = robots_rules_table(spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n")],
        "host string, content string")).localCheckpoint(eager=True)

    def run(ckpt):
        stream = (spark.readStream.schema("url string, html string")
                  .option("maxFilesPerTrigger", 1).json(str(d)))
        q = (foreach_batch_frontier_ingest(
                stream, sd, str(tmp_path / ckpt), rules=rules,
                blocklist=["blk.example"])
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run("ck1")
    fr = spark.read.parquet(os.path.join(sd, "frontier"))
    got = {(r.url, r.batch_id) for r in fr.collect()}
    assert got == {(B, 0), (C, 1)}   # blocked/seen/self links never queue
    seen = spark.read.parquet(os.path.join(sd, "seen_urls"))
    assert seen.count() == seen.select("url").distinct().count()
    assert {r.url for r in seen.collect()} == {A, B, C}

    # fresh-checkpoint replay: same batches, state must not grow
    run("ck2-replay")
    fr2 = spark.read.parquet(os.path.join(sd, "frontier"))
    assert {(r.url, r.batch_id) for r in fr2.collect()} == got
    seen2 = spark.read.parquet(os.path.join(sd, "seen_urls"))
    assert seen2.count() == 3


def test_streaming_capture_ingest_cross_batch_revisits(spark, tmp_path):
    """r16 foreach_batch_capture_ingest: revisit flags span micro-batch
    boundaries (batch 2's capture of an unchanged page reads as a
    revisit of batch 1's), identity-idempotent appends, as-of-ingest
    flags."""
    import os

    from pyspark.sql import functions as F

    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_capture_ingest)

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "url string, payload string, ts double"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: two pages
    write_batch("b1", [("https://a.example/p", "body-1", 1.0),
                       ("https://b.example/q", "other", 1.0)])
    seen = []
    stream = (spark.readStream.schema("url string, payload string, ts double")
              .parquet(src))
    q = (foreach_batch_capture_ingest(
            stream, state, ckpt,
            on_batch=lambda df, bid: seen.append((bid, df.collect())))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # batch 2: a revisit (same payload) + a change + a new key
    write_batch("b2", [("https://a.example/p", "body-1", 2.0),
                       ("https://b.example/q", "changed", 2.0),
                       ("https://c.example/r", "new", 2.0)])
    q = (foreach_batch_capture_ingest(
            stream, state, ckpt,
            on_batch=lambda df, bid: seen.append((bid, df.collect())))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    idx = spark.read.parquet(os.path.join(state, "captures"))
    got = {(r["urlkey"], r["ts"]): (r["revisit"], r["first_capture"])
           for r in idx.collect()}
    assert got[("example,a)/p", 1.0)] == (0, 1)
    assert got[("example,a)/p", 2.0)] == (1, 0)   # cross-batch revisit
    assert got[("example,b)/q", 2.0)] == (0, 0)   # changed, not revisit
    assert got[("example,c)/r", 2.0)] == (0, 1)   # new key
    assert idx.count() == 5

    # replay from a fresh checkpoint: state converges (no duplicates)
    import shutil
    shutil.rmtree(ckpt)
    q = (foreach_batch_capture_ingest(stream, state, str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.read.parquet(os.path.join(state, "captures")).count() == 5
