"""Vectorized mention extraction over transcript turns (SURVEY.md A2 analogue).

The reference's line parser is scripts/rdf_parser.py:75-151 (parse_nq);
our input is transcript text, so the parser is a compiled-regex sweep per
Arrow batch via ``mapInPandas`` — no per-row Python, one regex pass per
pandas batch (input_hint mandate).

Output: one row per mention, (conv_id, turn_idx, mention_idx, subj, pred,
obj) with mention_idx = in-text match order, making (conv_id, turn_idx,
mention_idx) a stable global corpus position (used for vocab tie-breaks,
B2). The per-turn ``text`` column is only read, never mutated — the
per-row invariant holds by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..lexicon import CUE_TO_PRED, MENTION_PATTERN

MENTION_SCHEMA = "conv_id string, turn_idx int, mention_idx int, subj string, pred string, obj string"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cue_map = CUE_TO_PRED  # closure constant; tiny, pickled once per task
    for pdf in batches:
        texts = pdf["text"].fillna("")
        ex = texts.str.extractall(MENTION_PATTERN)
        if ex.empty:
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype="object"),
                    "turn_idx": pd.Series(dtype="int32"),
                    "mention_idx": pd.Series(dtype="int32"),
                    "subj": pd.Series(dtype="object"),
                    "pred": pd.Series(dtype="object"),
                    "obj": pd.Series(dtype="object"),
                }
            )
            continue
        ex = ex.reset_index()  # columns: level_0 (row pos), match, subj, cue, obj
        ex["conv_id"] = pdf["conv_id"].to_numpy()[ex["level_0"].to_numpy()]
        ex["turn_idx"] = pdf["turn_idx"].to_numpy()[ex["level_0"].to_numpy()]
        ex["pred"] = ex["cue"].map(cue_map)
        out = ex.rename(columns={"match": "mention_idx"})[
            ["conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj"]
        ]
        out["turn_idx"] = out["turn_idx"].astype("int32")
        out["mention_idx"] = out["mention_idx"].astype("int32")
        yield out


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts → mention rows (includes sameAs rows, routed later)."""
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        _extract_batches, schema=MENTION_SCHEMA
    )
