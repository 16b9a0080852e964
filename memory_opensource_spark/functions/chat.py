"""SFT chat-template rendering with loss-mask spans (r15).

The training-data step between a cleaned conversation corpus and a
trainer: render each conversation's messages through a chat template
into ONE training document, and emit the ASSISTANT spans as character
offsets — the spans a supervised-fine-tuning loss unmasks (everything
else is context and contributes no gradient).  Character offsets are
the tokenizer-agnostic form: any tokenizer with offset mapping
(functions/bpe, HF fast tokenizers) converts them to token masks
losslessly, so the expensive render/mask pass never re-runs per
tokenizer.

Reference analog: none (the memory service stores conversations but
never formats trainer batches) — this is the LLM-data-pipeline family,
downstream of compress_sessions / connector transposition.

Shape for 100 TB: one window per conversation (cumulative rendered
length — group size = conversation turn count, bounded; not the
host-skew hazard class) + one groupBy for the rendered document.  Pure
Column expressions, zero UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default template: <|role|>text<|end|> per message, concatenated in
#: turn order — a neutral stand-in for chatml/llama templates (the
#: template is a parameter; spans track ANY prefix/suffix choice)
ROLE_PREFIX = "<|{role}|>"
TURN_SUFFIX = "<|end|>"


def _rendered_msg(role_col, text_col):
    # coalesce BOTH fields: a NULL role would otherwise null the whole
    # concat and the message would silently vanish from the render while
    # still emitting a row (sweep 18)
    return F.concat(F.lit("<|"), F.coalesce(role_col, F.lit("")),
                    F.lit("|>"),
                    F.coalesce(text_col, F.lit("")), F.lit(TURN_SUFFIX))


def render_chat_sft(messages: DataFrame, *, conv_col: str = "conv_id",
                    turn_col: str = "turn", role_col: str = "role",
                    text_col: str = "text",
                    assistant_role: str = "assistant") -> DataFrame:
    """Per-MESSAGE render with mask offsets: adds ``rendered_msg`` (the
    templated message), ``span_start``/``span_end`` (0-based character
    offsets of the message inside the conversation's rendered
    document) and ``is_target`` (1 for ``assistant_role`` messages —
    the unmasked SFT spans).  Ties on ``turn_col`` break by
    ``role_col`` then ``text_col`` so offsets stay deterministic."""
    msg = _rendered_msg(F.col(role_col), F.col(text_col))
    # sweep 18: (a) explicit ROWS frame — the default RANGE frame makes
    # duplicate (turn, role, text) messages PEERS sharing one cumulative
    # sum, so the first duplicate's span pointed past itself (and the
    # inline SQL oracle already said ROWS); (b) order by the COALESCED
    # role/text so a NULL never hits the engines' opposite ASC-null
    # placement (Spark NULLS FIRST vs DuckDB NULLS LAST)
    w = (Window.partitionBy(conv_col)
         .orderBy(F.col(turn_col).asc(),
                  F.coalesce(F.col(role_col), F.lit("")).asc(),
                  F.coalesce(F.col(text_col), F.lit("")).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.length(msg)).over(w)
    return (messages
            .withColumn("rendered_msg", msg)
            .withColumn("span_end", cum.cast("long"))
            .withColumn("span_start",
                        (cum - F.length(msg)).cast("long"))
            .withColumn("is_target",
                        (F.col(role_col) == assistant_role).cast("int")))


def render_conversations(messages: DataFrame, *, conv_col: str = "conv_id",
                         turn_col: str = "turn", role_col: str = "role",
                         text_col: str = "text") -> DataFrame:
    """Conversation-level render: ``{conv_col, rendered, n_turns}`` —
    the training DOCUMENT the spans from :func:`render_chat_sft` index
    into.  Deterministic order: the per-struct sort key is (turn, role,
    text), matching the per-message window exactly."""
    # coalesced fields: the sort key matches render_chat_sft's window
    # (NULL role/text never hit struct-comparison null placement), and
    # _rendered_msg coalesces identically so the render is unchanged
    key = F.struct(F.col(turn_col),
                   F.coalesce(F.col(role_col), F.lit("")).alias(role_col),
                   F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    return (messages
            .groupBy(conv_col)
            .agg(F.array_sort(F.collect_list(key)).alias("_m"),
                 F.count("*").alias("n_turns"))
            .select(
                conv_col, "n_turns",
                F.aggregate(
                    "_m", F.lit(""),
                    lambda acc, m: F.concat(
                        acc, _rendered_msg(m[role_col], m[text_col]))
                ).alias("rendered")))
