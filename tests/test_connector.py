"""Connector transposition (operators/connector): the reference's
transpose_data_to_memory semantics, including its documented quirks."""

import json

import pytest

from memory_opensource_spark.operators.connector import (
    clean_body_data, flatten_dict, process_metadata, remove_ts_fields,
    transpose_connector_events, transpose_event)


def test_remove_ts_fields_substring_and_recursion():
    """'ts' is a SUBSTRING match (connector_service.py:13): created_ts,
    stats and counts all drop; recursion reaches dicts inside lists."""
    got = remove_ts_fields({
        "ts": 1, "created_ts": 2, "stats": {"x": 1}, "counts": 3,
        "keep": {"ts": 4, "inner": 5},
        "lst": [{"ts": 6, "ok": 7}, 8]})
    assert got == {"keep": {"inner": 5}, "lst": [{"ok": 7}, 8]}


def test_flatten_and_clean_body():
    assert flatten_dict({"a": {"b": {"c": 1}}, "d": [1, 2]}) == \
        {"a_b_c": 1, "d": [1, 2]}
    body = json.dumps({"content": [
        {"content": [{"text": "hello"}, {"noText": 1}]},
        {"content": [{"text": "world"}]}]})
    assert clean_body_data(body) == "hello world"
    assert clean_body_data("not json {") == "not json {"
    assert clean_body_data(json.dumps({"wrong": 1})) == '{"wrong": 1}'


def test_process_metadata_rules():
    """id rename, connector stamp, None drop, flatten-then-exclude,
    str-list passthrough, str() for mixed lists (:40-93)."""
    got = process_metadata({
        "id": "X1", "none": None, "nested": {"k": "v"},
        "strs": ["a", "b"], "mixed": [1, "a"], "num": 3,
        "flag": True, "text": "excluded-by-default"}, "slack")
    assert got == {"slack_id": "X1", "connector": "slack",
                   "nested_k": "v", "strs": ["a", "b"],
                   "mixed": "[1, 'a']", "num": 3, "flag": True}


def test_slack_message_routes_and_block_promotion():
    item = transpose_event(
        {"text": "hi there", "ts": "1", "id": "S1",
         "blocks": [{"block_id": "b9"}], "members": ["U2", "U1", "U2"]},
        "https://h.example/slack/messages", workspace_id="w1")
    assert item["content"] == "hi there"
    assert item["type"] == "text"
    meta = item["metadata"]
    assert meta["sourceType"] == "slack"
    assert meta["hierarchical structures"] == "Slack Message"
    assert meta["acl_object_ids"] == ["U1", "U2"]  # sorted distinct
    assert meta["block_id"] == "b9" and "blocks" not in meta
    assert meta["slack_id"] == "S1" and "ts" not in meta
    with pytest.raises(ValueError, match="No text content"):
        transpose_event({"notext": 1}, "https://h.example/slack/messages")


def test_slack_update_quirk_blocks_message_deleted():
    """The reference promotes block_id into the message dict then deletes
    the WHOLE dict (:252-254) — with blocks, neither message fields nor
    client_msg_id survive; without blocks, client_msg_id is hoisted."""
    with_blocks = transpose_event(
        {"message": {"text": "edit", "blocks": [{"block_id": "b"}],
                     "client_msg_id": "c7"},
         "previous_message": {"blocks": [{"block_id": "o"}], "keep": "y"}},
        "https://h.example/slack/messages", update=True)
    assert with_blocks["content"] == "edit (edited)"
    assert "client_msg_id" not in with_blocks["metadata"]
    assert with_blocks["metadata"]["previous_message_keep"] == "y"
    without = transpose_event(
        {"message": {"text": "edit2", "client_msg_id": "c8"}},
        "https://h.example/slack/messages", update=True)
    assert without["metadata"]["client_msg_id"] == "c8"


def test_message_list_joins_and_collects():
    """Empty texts are skipped in the join but their per-message ids are
    still collected (:196-226); comma-string members split."""
    item = transpose_event(
        {"type": "messageList",
         "messages": [
             {"text": "one", "user": "U1", "client_msg_id": "a",
              "sourceUrl": "s1"},
             {"text": "", "user": "U2", "client_msg_id": "b",
              "sourceUrl": "s2"},
             {"text": "three", "user": "U3", "client_msg_id": "c",
              "sourceUrl": "s3"}],
         "members": "U3,U1"},
        "https://h.example/slack/messages", workspace_id="w2")
    assert item["content"] == "one ||| three"
    meta = item["metadata"]
    assert meta["user_ids"] == ["U1", "U2", "U3"]
    assert meta["client_msg_ids"] == ["a", "b", "c"]
    assert meta["source_urls"] == ["s1", "s2", "s3"]
    assert meta["sourceUrl"] == "s1"
    assert meta["members"] == ["U3", "U1"]
    assert meta["acl_object_ids"] == ["U1", "U3"]


def test_linear_routes():
    issue = transpose_event(
        {"title": "T", "id": "I1", "project": {"name": "P"}},
        "https://h.example/linear/issues")
    assert issue["type"] == "issue" and issue["content"] == "T"
    assert issue["metadata"]["hierarchical structures"] == "P, Issues"
    assert issue["metadata"]["linear_id"] == "I1"
    proj = transpose_event(
        {"name": "N", "projectMilestones": ["m1"], "id": "P1"},
        "https://h.example/linear/projects")
    assert proj["content"] == "Project: N\nMilestones: ['m1']"
    comment = transpose_event(
        {"bodyData": json.dumps({"content": [
            {"content": [{"text": "cmt"}]}]}), "id": "C1"},
        "https://h.example/linear/comments")
    assert comment["content"] == "cmt"
    assert comment["metadata"]["hierarchical structures"] == "Comments"
    user = transpose_event(
        {"displayName": "D", "email": "e@x", "id": "U1"},
        "https://h.example/linear/users")
    assert user["content"] == "User: D (e@x)"


def test_spark_operator_passthrough_and_errors(spark):
    """The Arrow kernel: passthrough keys, canonical metadata JSON, and
    per-row loud errors (a textless Slack message flags, not drops)."""
    rows = [
        (1, "https://h.example/slack/messages",
         json.dumps({"text": "ok", "id": "S1"}), "w1"),
        (2, "https://h.example/slack/messages",
         json.dumps({"neither": 1}), "w1"),
        (3, "https://h.example/custom/events",
         json.dumps({"content": "c3", "project": {"name": "G"}}), None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, payload string, ws string")
    out = {r.doc_id: r for r in transpose_connector_events(
        df, workspace_col="ws",
        passthrough={"doc_id": "long"}).collect()}
    assert out[1].content == "ok" and out[1].connector == "slack"
    meta = json.loads(out[1].metadata_json)
    assert meta["slack_id"] == "S1" and meta["workspace_id"] == "w1"
    assert list(meta) == sorted(meta)  # canonical ordering
    assert out[2].error is not None and "No text content" in out[2].error
    assert out[2].content is None
    assert out[3].content == "c3" and out[3].connector == "custom"
    assert out[3].workspace_id is None
    assert json.loads(out[3].metadata_json)[
        "hierarchical structures"] == "G"


def test_streaming_connector_ingest_replay_exactly_once(spark, tmp_path):
    """r13 ST twin: JSON-line connector events arrive as a file stream;
    two micro-batches transpose + append memories; a full
    checkpoint-reset replay reproduces verdicts and leaves state
    exactly-once (event_id anti-joins)."""
    import os

    from pyspark.sql import functions as F

    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_connector_ingest)

    d = tmp_path / "events"
    d.mkdir()
    sd = str(tmp_path / "state")

    def ev(url, payload):
        return json.dumps({"url": url, "payload": json.dumps(payload)})

    b0 = [ev("https://h.example/slack/messages",
             {"text": "hello", "id": "S1"}),
          ev("https://h.example/slack/messages", {"broken": 1}),  # error
          ev("https://h.example/linear/issues",
             {"title": "T1", "id": "I1", "project": {"name": "P"}})]
    (d / "b0.json").write_text("\n".join(b0))

    got = {"batches": 0, "errors": set()}

    def on_batch(mem, errs, bid):
        got["batches"] += 1
        got["errors"] |= {r.url for r in errs.collect()}

    schema = "url string, payload string"

    def run(ckpt):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).json(str(d)))
        q = (foreach_batch_connector_ingest(
                stream, sd, ckpt, on_batch=on_batch)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run(str(tmp_path / "ck1"))
    assert got["batches"] == 1
    mem = spark.read.parquet(os.path.join(sd, "memories"))
    assert mem.count() == 2
    assert {r.content for r in mem.collect()} == {"hello", "T1"}
    assert got["errors"] == {"https://h.example/slack/messages"}

    # batch 2: one duplicate event (same url+payload -> same event_id,
    # cross-batch drop) + one new event
    b1 = [ev("https://h.example/slack/messages",
             {"text": "hello", "id": "S1"}),          # dup of batch 0
          ev("https://h.example/linear/users",
             {"displayName": "D", "email": "e@x", "id": "U1"})]
    (d / "b1.json").write_text("\n".join(b1))
    run(str(tmp_path / "ck2-resume"))
    mem = spark.read.parquet(os.path.join(sd, "memories"))
    assert mem.count() == 3                     # dup dropped
    assert "User: D (e@x)" in {r.content for r in mem.collect()}

    # full replay from a FRESH checkpoint: state must not grow
    run(str(tmp_path / "ck3-replay"))
    mem = spark.read.parquet(os.path.join(sd, "memories"))
    assert mem.count() == 3
    seen = spark.read.parquet(os.path.join(sd, "seen_events"))
    assert seen.count() == seen.select("event_id").distinct().count()
    # ADVICE r11 state-shape fix: both tables are batch_id-partitioned
    # so the per-batch anti-joins partition-prune instead of rescanning
    # the full directories
    assert any(p.startswith("batch_id=")
               for p in os.listdir(os.path.join(sd, "seen_events")))
    assert any(p.startswith("batch_id=")
               for p in os.listdir(os.path.join(sd, "memories")))


def test_streaming_connector_ingest_bounded_horizon(spark, tmp_path):
    """retain_batches bounds seen_events state: partitions older than
    the horizon are deleted after each commit, within-horizon dedup
    still holds, and the trade (re-delivery AFTER the horizon
    re-appends) behaves as documented."""
    import os

    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_connector_ingest)

    d = tmp_path / "events"
    d.mkdir()
    sd = str(tmp_path / "state")

    def ev(url, payload):
        return json.dumps({"url": url, "payload": json.dumps(payload)})

    dup = ev("https://h.example/slack/messages",
             {"text": "dup", "id": "S1"})
    (d / "b0.json").write_text(dup)
    (d / "b1.json").write_text(ev(
        "https://h.example/slack/messages", {"text": "fresh1", "id": "S2"})
        + "\n" + dup)                        # within-horizon dup: dropped
    (d / "b2.json").write_text(ev(
        "https://h.example/slack/messages", {"text": "fresh2", "id": "S3"}))
    (d / "b3.json").write_text(dup)          # beyond horizon: re-appends
    # FileStreamSource orders by modification time: pin strictly
    # increasing mtimes so file -> batch_id mapping is deterministic
    for i in range(4):
        os.utime(d / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (spark.readStream.schema("url string, payload string")
              .option("maxFilesPerTrigger", 1).json(str(d)))
    q = (foreach_batch_connector_ingest(stream, sd, str(tmp_path / "ck"),
                                        retain_batches=2)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    mem = spark.read.parquet(os.path.join(sd, "memories"))
    assert [r.content for r in mem.collect()].count("dup") == 2
    assert mem.count() == 4                  # 2x dup + fresh1 + fresh2
    # state bounded: only partitions within the horizon survive
    parts = sorted(int(p.split("=")[1])
                   for p in os.listdir(os.path.join(sd, "seen_events"))
                   if p.startswith("batch_id="))
    assert parts == [1, 2, 3]                # batch 3 horizon = 3-2 = 1:
                                             # partition 0 aged out


def test_streaming_connector_ingest_migrates_old_state_layout(spark, tmp_path):
    """ADVICE r12: a stream restarting over PRE-partitioning state (plain
    part-files at the state-dir root) must migrate it to the
    batch_id-partitioned layout on first batch — old seen ids keep
    deduplicating, old memories stay readable, and no root-level part
    files survive.  Old memories lack a batch_id column entirely (they
    land in batch_id=-1); old seen_events carry one as a data column."""
    import os

    from pyspark.sql import functions as F

    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_connector_ingest)

    d = tmp_path / "events"
    d.mkdir()
    sd = str(tmp_path / "state")

    def ev(url, payload):
        return json.dumps({"url": url, "payload": json.dumps(payload)})

    dup_url = "https://h.example/slack/messages"
    dup_payload = json.dumps({"text": "old-hello", "id": "S1"})

    # ---- fabricate the OLD state layout -------------------------------
    eid = spark.createDataFrame([(dup_url, dup_payload)], "u string, p string") \
        .select(F.xxhash64("u", "p").alias("event_id")).collect()[0].event_id
    # seen_events: root-level file WITH a batch_id data column
    spark.createDataFrame([(eid, 0)], "event_id long, batch_id int") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "old_seen"))
    # memories: root-level file WITHOUT batch_id (oldest shape)
    spark.createDataFrame(
        [(eid, "old-hello", "slack")],
        "event_id long, content string, connector string") \
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "old_mem"))
    for src, dst in [("old_seen", "seen_events"), ("old_mem", "memories")]:
        os.makedirs(os.path.join(sd, dst), exist_ok=True)
        for f in os.listdir(tmp_path / src):
            if f.endswith(".parquet"):
                os.replace(os.path.join(tmp_path, src, f),
                           os.path.join(sd, dst, f))
    assert any(f.endswith(".parquet")
               for f in os.listdir(os.path.join(sd, "seen_events")))

    # ---- stream one batch: the dup must be dropped against OLD state --
    b0 = [ev(dup_url, {"text": "old-hello", "id": "S1"}),   # in old seen
          ev("https://h.example/linear/issues",
             {"title": "T-new", "id": "I1", "project": {"name": "P"}})]
    (d / "b0.json").write_text("\n".join(b0))
    stream = (spark.readStream.schema("url string, payload string")
              .json(str(d)))
    q = (foreach_batch_connector_ingest(stream, sd, str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    mem_dir = os.path.join(sd, "memories")
    seen_dir = os.path.join(sd, "seen_events")
    # no root-level part files or staging dirs survive anywhere
    for sdir in (mem_dir, seen_dir):
        assert not any(f.endswith(".parquet") for f in os.listdir(sdir))
        assert "_premigration" not in os.listdir(sdir)
        assert any(p.startswith("batch_id=") for p in os.listdir(sdir))
    # the mixed-layout read works and holds old + new rows exactly once
    mem = spark.read.parquet(mem_dir)
    assert sorted(r.content for r in mem.collect()) == ["T-new", "old-hello"]
    # columnless old memories landed in batch_id=-1
    assert "batch_id=-1" in os.listdir(mem_dir)
    seen = spark.read.parquet(seen_dir)
    assert seen.count() == seen.select("event_id").distinct().count() == 2


def test_unbounded_horizon_warns_once(spark, tmp_path, monkeypatch):
    """VERDICT r12 task 6: retain_batches=None on a long stream warns
    loudly (once) after the threshold; setting a horizon stays silent."""
    import os
    import warnings as W

    from memory_opensource_spark.streaming import pipelines as P

    # unit: the helper itself
    flag = [False]
    with pytest.warns(RuntimeWarning, match="retain_batches=None"):
        P._warn_unbounded_horizon("x", P.UNBOUNDED_STATE_WARN_BATCHES, flag)
    assert flag[0]
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        P._warn_unbounded_horizon("x", 10 ** 6, flag)   # already warned
        P._warn_unbounded_horizon("y", 0, [False])      # below threshold
    assert not rec

    # end-to-end: the connector stream fires it past a patched threshold
    monkeypatch.setattr(P, "UNBOUNDED_STATE_WARN_BATCHES", 1)
    d = tmp_path / "events"
    d.mkdir()
    for i in range(2):
        (d / f"b{i}.json").write_text(json.dumps(
            {"url": "https://h.example/slack/messages",
             "payload": json.dumps({"text": f"t{i}", "id": f"S{i}"})}))
        os.utime(d / f"b{i}.json", (1_700_000_000 + i,) * 2)
    stream = (spark.readStream.schema("url string, payload string")
              .option("maxFilesPerTrigger", 1).json(str(d)))
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        q = (P.foreach_batch_connector_ingest(
                stream, str(tmp_path / "state"), str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    hits = [w for w in rec if issubclass(w.category, RuntimeWarning)
            and "foreach_batch_connector_ingest" in str(w.message)]
    assert len(hits) == 1                     # once, not per batch
