"""Custom stateful streaming operators (north-rule incremental path).

Two state-backed operators over the streamed mention/transcript log:

- ``stream_dedup_turns``: watermarked streaming exact dedup via the
  engine's state store (``dropDuplicates`` after ``withWatermark`` —
  state for keys older than the watermark is reclaimed, so the operator
  runs forever on unbounded input).
- ``stream_first_seen``: an ``applyInPandasWithState`` operator that
  emits each surface form ONCE, at its first-observed corpus position —
  the incremental analogue of the batch vocabulary's first-occurrence
  semantics (a streaming operator cannot assign the reference's global
  frequency-rank ids — those need the whole corpus — but it CAN maintain
  the first-seen log that seeds delta vocab builds). State per key is a
  single flag; batches for an already-seen key are drained and dropped.

The reference is strictly batch; these exist for the production feed
the north rule targets (see streaming/extract_stream.py for the
stateless extraction parity path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIRST_SEEN_SCHEMA = "surface string, first_conv string, first_turn int, first_mention int"


def stream_dedup_turns(
    transcripts: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup of turns on (conv_id, turn_idx): engine
    state store + watermark-bounded retention."""
    return transcripts.withWatermark("ts", watermark).dropDuplicates(
        ["conv_id", "turn_idx"]
    )


def stream_first_seen(mentions: DataFrame, key_col: str = "subj") -> DataFrame:
    """(surface, first position) — emitted exactly once per surface,
    across micro-batches, via per-key GroupState."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            for _ in pdfs:  # drain: key already emitted
                pass
            return
        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = (
                pdf.sort_values(["conv_id", "turn_idx", "mention_idx"])
                .iloc[0]
            )
            pos = (cand["conv_id"], int(cand["turn_idx"]), int(cand["mention_idx"]))
            if best is None or pos < best[0]:
                best = (pos, cand)
        if best is None:
            return
        state.update((1,))
        (conv, turn, midx), _ = best
        yield pd.DataFrame(
            {
                "surface": [key[0]],
                "first_conv": [conv],
                "first_turn": [turn],
                "first_mention": [midx],
            }
        )

    return (
        mentions.select(F.col(key_col).alias("surface"), "conv_id", "turn_idx", "mention_idx")
        .groupBy("surface")
        .applyInPandasWithState(
            fn,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType="seen int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_sessions(
    df,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
):
    """Streaming sessionization: the SAME session_window expression as
    the batch operator (operators/dialogue.sessionize), under a
    watermark so closed sessions emit in append mode. State per key is
    one open session — bounded."""
    from pyspark.sql import functions as F

    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), sw)
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
