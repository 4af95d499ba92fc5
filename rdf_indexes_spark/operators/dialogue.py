"""Dialogue shaping — turning raw multi-turn transcripts into the
(context, response) pairs an instruction/chat fine-tune consumes.

Transcript contract (the pipeline's input table): (conv_id, turn_idx,
role, text, tool, ts) with stable per-conversation turn ordering —
the same per-turn ordering invariant the KG pipeline preserves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dialogue_pairs(
    transcripts: DataFrame,
    context_turns: int = 3,
    sep: str = "\n",
    response_role: str = "assistant",
) -> DataFrame:
    """(conv_id, turn_idx, context, response): one training pair per
    ``response_role`` turn — the response is that turn's text, the
    context is the previous up-to-``context_turns`` turns rendered as
    ``role: text`` lines in turn order (any role, including tool
    outputs; a conversation-opening response gets an empty context).

    Scale shape: one window over (conv_id, turn_idx) with a bounded
    ``rowsBetween(-N, -1)`` frame — turn text rides the ONE
    conversation-keyed exchange it would ride for any per-conversation
    operation, state per row is bounded by N lines, and conversations
    are small relative to partitions (hash-spread; no hub key). The
    collect_list frame order is the window's ORDER BY — deterministic
    under the stable (conv_id, turn_idx) contract."""
    if context_turns < 1:
        raise ValueError(f"context_turns must be >= 1, got {context_turns}")
    line = F.concat(F.col("role"), F.lit(": "), F.coalesce(F.col("text"), F.lit("")))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    return (
        transcripts.withColumn("_ctx", F.array_join(F.collect_list(line).over(w), sep))
        .filter(F.col("role") == response_role)
        .select(
            "conv_id",
            "turn_idx",
            F.col("_ctx").alias("context"),
            F.coalesce(F.col("text"), F.lit("")).alias("response"),
        )
    )
