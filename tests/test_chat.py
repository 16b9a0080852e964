"""functions/chat: SFT chat-template rendering with loss-mask spans."""

from pyspark.sql import functions as F

from memory_opensource_spark.functions import chat


def _msgs(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id int, turn int, role string, text string")


def test_spans_index_into_rendered_document(spark):
    msgs = _msgs(spark, [
        (1, 0, "system", "be helpful"),
        (1, 1, "user", "hi"),
        (1, 2, "assistant", "hello there"),
        (1, 3, "user", "thanks"),
        (1, 4, "assistant", "np"),
    ])
    per = chat.render_chat_sft(msgs)
    doc = chat.render_conversations(msgs).collect()[0]
    assert doc.n_turns == 5
    spans = {r.turn: r for r in per.collect()}
    for t, r in spans.items():
        assert doc.rendered[r.span_start:r.span_end] == r.rendered_msg
    assert [t for t, r in sorted(spans.items()) if r.is_target] == [2, 4]
    assert doc.rendered.startswith("<|system|>be helpful<|end|>")


def test_null_text_renders_empty(spark):
    msgs = _msgs(spark, [(1, 0, "user", None), (1, 1, "assistant", "a")])
    per = {r.turn: r for r in chat.render_chat_sft(msgs).collect()}
    assert per[0].rendered_msg == "<|user|><|end|>"
    assert per[1].span_start == len("<|user|><|end|>")


def test_multiple_conversations_independent_offsets(spark):
    msgs = _msgs(spark, [
        (1, 0, "assistant", "aaa"), (2, 0, "assistant", "bbbbbb"),
    ])
    per = {r.conv_id: r for r in chat.render_chat_sft(msgs).collect()}
    assert per[1].span_start == 0 and per[2].span_start == 0
    assert per[1].span_end == len("<|assistant|>aaa<|end|>")


def test_sweep18_duplicate_messages_tile(spark):
    """Exact-duplicate (turn, role, text) rows: the default RANGE window
    frame made them peers sharing one cumulative sum (first dup's span
    pointed past itself) — pinned on the explicit ROWS frame."""
    from memory_opensource_spark.functions import chat
    rows = [(1, 1, "user", "hi"),
            (1, 2, "assistant", "dup"), (1, 2, "assistant", "dup"),
            (1, 3, None, "no role"), (1, 4, "assistant", None),
            (1, 5, "assistant", "astral \U0001F680 ok")]
    msgs = spark.createDataFrame(
        rows, "conv_id long, turn long, role string, text string")
    per = chat.render_chat_sft(msgs).orderBy("span_start").collect()
    doc = chat.render_conversations(msgs).collect()[0]["rendered"]
    spans = []
    for r in per:
        assert doc[r["span_start"]:r["span_end"]] == r["rendered_msg"]
        spans.append((r["span_start"], r["span_end"]))
    spans.sort()
    assert spans[0][0] == 0 and spans[-1][1] == len(doc)
    for (_, b1), (a2, _) in zip(spans, spans[1:]):
        assert b1 == a2            # exact tiling, no overlap from dups
