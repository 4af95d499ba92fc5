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


def sessionize(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization via the native ``session_window``: events
    of one key belong to one session while each is less than ``gap``
    after the previous (Spark's session merge rule — an event exactly at
    the boundary opens a new session). Returns one row per session:
    (key, session_start_s, session_last_s, n_rows) with epoch-second
    bounds (floored AFTER aggregation — boundaries are decided on full
    timestamp precision).

    session_window is the built-in streaming-capable operator, so the
    same expression sessionizes a live feed under a watermark
    (streaming/stateful.stream_sessions); batch mode compiles to an
    ordinary keyed aggregation — one exchange on the key."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(F.col(key_col), sw)
        .agg(
            F.count("*").alias("n_rows"),
            F.min(ts_col).alias("_first"),
            F.max(ts_col).alias("_last"),
        )
        .select(
            key_col,
            F.unix_timestamp("_first").cast("long").alias("session_start_s"),
            F.unix_timestamp("_last").cast("long").alias("session_last_s"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
    )


def validate_turns(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(conv_id, n_turns, n_idx_dups, n_idx_gaps, first_idx, first_role,
    n_role_repeats, ok) — chat-format hygiene per conversation, the
    pre-training-pack validation a fine-tune pipeline runs on every
    transcript batch: turn indices must start at 0 and be contiguous
    and duplicate-free, and the same role must never speak twice in a
    row. ``ok`` summarizes; the counters localize the violation so a
    repair pass can target it.

    Determinism under dirty data: the role-repeat scan orders by
    (idx, role[, tiebreak]) — with duplicate indices the order is still
    total given a ``tiebreak_col`` (e.g. a message id), so the emitted
    counters are stable run-to-run. All counters are exact integers.

    Scale shape: ONE conversation-keyed exchange feeding a window pass
    (lag + first_value) and the final aggregate — the same shuffle any
    per-conversation op pays; per-row state is O(1). Conversations are
    bounded (≪ partition size) and hash-spread; no hub key.
    """
    conv, idx, role = F.col(conv_col), F.col(idx_col), F.col(role_col)
    tb = [F.col(tiebreak_col).alias("_tb")] if tiebreak_col is not None else []
    order = ["idx", "role"] + (["_tb"] if tiebreak_col is not None else [])
    w = Window.partitionBy("conv_id").orderBy(*order)
    rows = transcripts.select(
        conv.alias("conv_id"),
        idx.cast("long").alias("idx"),
        role.alias("role"),
        *tb,
    ).select(
        "*",
        (F.lag("role").over(w) == F.col("role")).cast("long").alias("_rep"),
        F.first("role").over(w).alias("_first_role"),
    )
    agg = rows.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        (F.count("*") - F.countDistinct("idx")).alias("n_idx_dups"),
        (
            F.max("idx") - F.min("idx") + 1 - F.countDistinct("idx")
        ).alias("n_idx_gaps"),
        F.min("idx").alias("first_idx"),
        F.max("_first_role").alias("first_role"),
        F.coalesce(F.sum("_rep"), F.lit(0)).alias("n_role_repeats"),
    )
    ok = (
        (F.col("n_idx_dups") == 0)
        & (F.col("n_idx_gaps") == 0)
        & (F.col("first_idx") == 0)
        & (F.col("n_role_repeats") == 0)
    )
    return agg.select("*", ok.alias("ok"))


def merge_consecutive_roles(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tiebreak_col: str | None = None,
    sep: str = "\n",
) -> DataFrame:
    """(conv_id, turn_idx, role, text) — the repair pass for the
    role-repeat violations ``validate_turns`` counts: consecutive
    same-role turns merge into ONE turn (texts joined by ``sep`` in turn
    order) and the merged turns reindex contiguously from 0, yielding a
    strictly-alternating-capable transcript for chat-template packing.

    Gaps-and-islands: a role-change flag (lag) and its running sum
    assign each row a block id in one window pass; blocks then aggregate
    with the in-block text order fixed by sort_array over (idx,
    tiebreak) structs — deterministic under duplicate indices given a
    ``tiebreak_col``, never dependent on shuffle order. Scale shape: the
    same single conversation-keyed exchange any per-conversation op
    pays; per-row window state is O(1) and per-block text is bounded by
    the conversation's own size.
    """
    tb = [F.col(tiebreak_col).alias("_tb")] if tiebreak_col is not None else []
    order = ["idx"] + (["_tb"] if tiebreak_col is not None else [])
    w = Window.partitionBy("conv_id").orderBy(*order)
    rows = transcripts.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("long").alias("idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
        *tb,
    ).select(
        "*",
        F.when(F.lag("role").over(w).isNull(), F.lit(1))
        .when(F.lag("role").over(w) != F.col("role"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("_chg"),
    ).select("*", F.sum("_chg").over(w).alias("_blk"))
    sort_key = (
        F.struct("idx", "_tb", "text")
        if tiebreak_col is not None
        else F.struct("idx", "text")
    )
    merged = rows.groupBy("conv_id", "_blk").agg(
        F.min("role").alias("role"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(sort_key)), lambda s: s["text"]
            ),
            sep,
        ).alias("text"),
    )
    return merged.select(
        "conv_id",
        (F.col("_blk") - 1).cast("long").alias("turn_idx"),
        "role",
        "text",
    )


def render_chat(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    start_tag: str = "<|im_start|>",
    end_tag: str = "<|im_end|>\n",
) -> DataFrame:
    """Render each conversation to ONE training string in a
    ChatML-style template — the SFT-export step that turns a validated
    transcript table into tokenizer-ready rows:

        <|im_start|>{role}\\n{text}<|im_end|>\\n   per turn, in turn order

    Returns (conv_id, text, n_turns, n_chars) with n_chars =
    length(text) in CODEPOINTS (the unit ``loss_spans`` offsets use).
    Turn texts are embedded verbatim (no tag escaping — run a hygiene
    filter upstream if the corpus may contain the sentinels).

    Scale shape: pieces are built map-side; ONE conversation-keyed
    aggregation concatenates them with the in-conversation order fixed
    by sort_array over (idx, piece) structs — no window pass, no second
    exchange. Per-group payload is the conversation's own text (the
    contract every per-conversation op here shares).
    """
    piece = F.concat(
        F.lit(start_tag),
        F.col(role_col),
        F.lit("\n"),
        F.col(text_col),
        F.lit(end_tag),
    )
    rows = transcripts.select(
        F.col(conv_col).alias("conv_id"),
        F.struct(F.col(idx_col).cast("long").alias("idx"), piece.alias("piece")).alias("_t"),
    )
    return (
        rows.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("_t")), lambda s: s["piece"]),
                "",
            ).alias("text"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .select(
            "conv_id",
            "text",
            F.col("n_turns").cast("long").alias("n_turns"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )


def loss_spans(
    transcripts: DataFrame,
    response_role: str = "assistant",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    start_tag: str = "<|im_start|>",
    end_tag: str = "<|im_end|>\n",
) -> DataFrame:
    """Loss-mask spans for ``render_chat``'s output: one row per
    ``response_role`` turn with the half-open codepoint interval
    [start, end) of that turn's CONTENT (after the role header, before
    the end tag) inside the rendered conversation string — the
    positions an SFT trainer unmasks.

    Offsets come from an exclusive running sum of rendered piece
    lengths over the (conv, idx) order — one conversation-keyed window
    pass, the same single exchange ``render_chat`` pays, so the two
    operators can share a shuffle when composed. Must be called with
    the SAME template arguments as the render (the contract is checked
    in tests by substring-extracting the spans).
    """
    role, text = F.col(role_col), F.col(text_col)
    piece_len = (
        F.lit(len(start_tag))
        + F.length(role)
        + F.lit(1)
        + F.length(text)
        + F.lit(len(end_tag))
    ).cast("long")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows = transcripts.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("long").alias("turn_idx"),
        role.alias("role"),
        F.length(text).cast("long").alias("_tlen"),
        (F.lit(len(start_tag)) + F.length(role) + F.lit(1)).cast("long").alias("_hdr"),
        piece_len.alias("_plen"),
    ).select(
        "*", F.coalesce(F.sum("_plen").over(w), F.lit(0)).alias("_off")
    )
    return rows.filter(F.col("role") == response_role).select(
        "conv_id",
        "turn_idx",
        (F.col("_off") + F.col("_hdr")).alias("start"),
        (F.col("_off") + F.col("_hdr") + F.col("_tlen")).alias("end"),
    )


def conversation_stats(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation census — the filter features an SFT data
    curation pass thresholds on (too short, tool-spam, monologues,
    stalled sessions), all exact integers from ONE conversation-keyed
    hash aggregate:

      conv_id, n_turns, n_user_turns, n_assistant_turns, n_tool_turns,
      n_tools (distinct non-null tools), total_chars, max_turn_chars,
      duration_s (last ts − first ts, whole seconds)

    Map-side partials absorb long conversations; no window, no second
    exchange. Role counts use the standard user/assistant/tool names —
    other roles still count in n_turns.
    """
    role = F.col(role_col)
    return (
        transcripts.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((role == "user").cast("long")).alias("n_user_turns"),
            F.sum((role == "assistant").cast("long")).alias("n_assistant_turns"),
            F.sum((role == "tool").cast("long")).alias("n_tool_turns"),
            F.countDistinct(F.col(tool_col)).alias("n_tools"),
            F.sum(F.length(F.col(text_col))).alias("total_chars"),
            F.max(F.length(F.col(text_col))).alias("max_turn_chars"),
            (
                F.unix_timestamp(F.max(F.col(ts_col)))
                - F.unix_timestamp(F.min(F.col(ts_col)))
            ).alias("duration_s"),
        )
        .select(
            "conv_id",
            *[
                F.col(c).cast("long").alias(c)
                for c in (
                    "n_turns", "n_user_turns", "n_assistant_turns",
                    "n_tool_turns", "n_tools", "total_chars",
                    "max_turn_chars", "duration_s",
                )
            ],
        )
    )


def tool_stats(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-tool usage census over agent transcripts: call volume,
    conversation reach, and the observed usage span —

      tool, n_calls, n_conversations (distinct), first_epoch, last_epoch

    NULL-tool turns (plain dialogue) are excluded. One tool-keyed hash
    aggregate; the tool key space is tiny so the exchange is trivial —
    skew lives in the map-side partials, which absorb it.
    """
    return (
        transcripts.filter(F.col(tool_col).isNotNull())
        .groupBy(F.col(tool_col).alias("tool"))
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.countDistinct(F.col(conv_col)).alias("n_conversations"),
            F.unix_timestamp(F.min(F.col(ts_col))).alias("first_epoch"),
            F.unix_timestamp(F.max(F.col(ts_col))).alias("last_epoch"),
        )
        .select(
            "tool",
            F.col("n_calls").cast("long").alias("n_calls"),
            F.col("n_conversations").cast("long").alias("n_conversations"),
            "first_epoch",
            "last_epoch",
        )
    )


def dedup_conversations(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    hashed_keys: bool = True,
) -> DataFrame:
    """Conversation-level exact dedup for SFT exports: two conversations
    are duplicates iff their rendered training strings (role sequence +
    turn texts in order, :func:`render_chat`) are byte-identical. The
    lexicographically-first conv_id of each group survives — the
    conversation-granular sibling of operators/dedup.exact_dedup, which
    multi-turn corpora need because turn-level dedup cannot see that two
    whole dialogues repeat.

    Returns (conv_id, n_turns, group_size, keep).

    Shape at scale: the rendered frame is conversation-scale (one row per
    conversation); the dedup keys on xxhash64(render) + codepoint length
    — 12 bytes instead of the rendered string — so the wide exchange
    never carries conversation text; min/count fold in one hash
    aggregate and rejoin on the same key.

    ``hashed_keys=False`` is the byte-exact escape hatch (mirrors the
    decontaminate contract): group on the rendered string itself, so a
    (2^-64-likelihood) hash collision cannot silently mark a unique
    conversation keep=0 in the export. Costs shuffling the rendered
    text; use for audits or when the export is the system of record.
    """
    rendered = render_chat(
        transcripts, conv_col=conv_col, idx_col=idx_col,
        role_col=role_col, text_col=text_col,
    )
    keyed = rendered.select(
        "conv_id",
        "n_turns",
        (F.xxhash64("text") if hashed_keys else F.col("text")).alias("_h"),
        F.col("n_chars").alias("_len"),
    )
    groups = keyed.groupBy("_h", "_len").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("conv_id").alias("_keeper"),
    )
    return (
        keyed.join(groups, ["_h", "_len"])
        .select(
            "conv_id",
            "n_turns",
            F.col("group_size").cast("long").alias("group_size"),
            F.when(F.col("conv_id") == F.col("_keeper"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("keep"),
        )
    )
