"""Deterministic synthetic transcript corpus (FIXTURES.md §1-§2).

Same seed ⇒ byte-identical tables. Plays the role of the reference's
test_data/wordnet31.gz (/root/reference/README.md:100-104): a corpus whose
true triple set is known by construction, so golden-equality tests are
possible (the reference's oracle is its sorted permutation files; ours is
the recorded generation truth + the pandas oracle).

Shape per BASELINE.json input_hint:
  (conv_id string, turn_idx int32, role string, text string,
   tool string, ts timestamp)

Skew: entity mentions are zipf-distributed (top entity appears in >=5% of
turns) to exercise hub salting; predicate vocab is 40 (+sameAs).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .lexicon import PRED_CUES, SAME_AS_CUE

_SYL = ["ka", "re", "vo", "ta", "lin", "mor", "zel", "dun", "fi", "sa", "bru", "nex", "ol", "pra", "qui", "tor"]
_TOOLS = ["search", "calc", "db_lookup", "code_run", "fetch"]
_FILLERS = [
    "Thanks for the update .",
    "Let me check .",
    "Understood .",
    "Could you clarify ?",
    "Here is what I found .",
    "Working on it now .",
]
_BASE_TS = pd.Timestamp("2026-01-01T00:00:00Z")


@dataclass
class Corpus:
    """Transcripts plus generation truth (for tests; pipelines see only transcripts)."""

    transcripts: pd.DataFrame
    true_mentions: pd.DataFrame  # conv_id, turn_idx, mention_idx, subj, pred, obj (incl sameAs rows)
    entity_surfaces: dict[int, list[str]] = field(default_factory=dict)


def _entity_surfaces(i: int, rng: np.random.Generator) -> list[str]:
    """1-4 surface variants per entity; variants share a normalization key.

    Mirrors the coreference model the canonicalizer must resolve — the
    reference's only identity notion is exact-string equality in the vocab
    dicts (/root/reference/scripts/map_dataset.py:16-26); we add true
    coreference on top per the north rule.
    """
    base = "".join(_SYL[j] for j in rng.integers(0, len(_SYL), 2)).capitalize() + str(i)
    variants = [base, base.upper(), base.lower(), f"{base[:-len(str(i))]}-{i}"]
    k = int(rng.integers(1, 5))
    return variants[:k]


def _entity_alias(i: int, base: str) -> str:
    """A genuinely different alias token (no shared normkey): needs a sameAs edge."""
    return f"{base[:2]}{i}q"


def generate(n_turns: int, seed: int = 42) -> Corpus:
    """Generate ~n_turns transcript turns with recorded truth."""
    rng = np.random.default_rng(seed)
    n_entities = max(16, int(3 * math.sqrt(n_turns)))
    n_preds = len(PRED_CUES)

    surfaces: dict[int, list[str]] = {}
    alias: dict[int, str] = {}
    for i in range(n_entities):
        surfaces[i] = _entity_surfaces(i, rng)
        if rng.random() < 0.3:
            alias[i] = _entity_alias(i, surfaces[i][0])

    # zipf(s=1.1) over entity ranks; entity 0 is the hub.
    ent_w = 1.0 / np.power(np.arange(1, n_entities + 1), 1.1)
    ent_p = ent_w / ent_w.sum()
    pred_w = 1.0 / np.power(np.arange(1, n_preds + 1), 0.8)
    pred_p = pred_w / pred_w.sum()

    rows: list[tuple] = []
    truth: list[tuple] = []
    aliases_to_introduce = sorted(alias)  # guarantee >=1 sameAs turn per alias
    conv_i = 0
    turns_made = 0
    while turns_made < n_turns:
        conv_id = f"conv{conv_i:08d}"
        conv_len = int(min(2 + rng.zipf(1.6), 24))
        conv_off = pd.Timedelta(seconds=int(conv_i) * 60)
        for t in range(conv_len):
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
            sents: list[str] = []
            m_idx = 0
            if role == "tool" and rng.random() < 0.7:
                text = ""
            else:
                n_facts = int(rng.integers(0, 5))
                if rng.random() < 0.4:
                    sents.append(_FILLERS[int(rng.integers(0, len(_FILLERS)))])
                for _ in range(n_facts):
                    se, oe = rng.choice(n_entities, size=2, p=ent_p)
                    pk = int(rng.choice(n_preds, p=pred_p))
                    pred, cue = PRED_CUES[pk]
                    s_surf_pool = surfaces[int(se)] + ([alias[int(se)]] if int(se) in alias else [])
                    o_surf_pool = surfaces[int(oe)] + ([alias[int(oe)]] if int(oe) in alias else [])
                    s_surf = s_surf_pool[int(rng.integers(0, len(s_surf_pool)))]
                    o_surf = o_surf_pool[int(rng.integers(0, len(o_surf_pool)))]
                    sents.append(f"{s_surf} {cue} {o_surf} .")
                    truth.append((conv_id, t, m_idx, s_surf, pred, o_surf))
                    m_idx += 1
                # introduce pending aliases occasionally (and drain the queue
                # deterministically so every alias gets at least one statement)
                if aliases_to_introduce and (rng.random() < 0.2 or conv_i > n_turns):
                    ei = aliases_to_introduce.pop(0)
                    sents.append(f"{surfaces[ei][0]} {SAME_AS_CUE} {alias[ei]} .")
                    truth.append((conv_id, t, m_idx, surfaces[ei][0], "sameAs", alias[ei]))
                    m_idx += 1
                text = " ".join(sents)
            ts = _BASE_TS + conv_off + pd.Timedelta(seconds=7 * t)
            rows.append((conv_id, t, role, text, tool, ts))
            turns_made += 1
            if turns_made >= n_turns:
                break
        conv_i += 1

    # drain any aliases never introduced: append a final conversation
    if aliases_to_introduce:
        conv_id = f"conv{conv_i:08d}"
        for t, ei in enumerate(aliases_to_introduce):
            txt = f"{surfaces[ei][0]} {SAME_AS_CUE} {alias[ei]} ."
            truth.append((conv_id, t, 0, surfaces[ei][0], "sameAs", alias[ei]))
            rows.append((conv_id, t, "user", txt, None,
                         _BASE_TS + pd.Timedelta(seconds=conv_i * 60 + 7 * t)))

    transcripts = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    true_mentions = pd.DataFrame(
        truth, columns=["conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj"]
    )
    return Corpus(transcripts=transcripts, true_mentions=true_mentions, entity_surfaces=surfaces)


def n_turns_for_sf(sf: float) -> int:
    """FIXTURES.md scale mapping: sf0.001→1e3, sf0.01→1e4, sf0.1→1e5 turns."""
    return max(100, int(round(sf * 1_000_000)))


# ---------------------------------------------------------------------------
# Distributed generation: the bench corpus at SF>=0.1 is millions of turns —
# a driver-side Python loop would take minutes, so chunks are generated in
# parallel with mapInPandas. Determinism: chunk content is a pure function
# of (seed, chunk_id) and the GLOBAL entity pool is shared across chunks
# (per-entity RNG seeded by (seed, entity_id)), so zipf hubs and sameAs
# aliases span chunk boundaries exactly like the single-process generator's.
# ---------------------------------------------------------------------------


def _entity_pool(n_entities: int, seed: int):
    """Per-entity deterministic surfaces + optional alias (global pool)."""
    surfaces: dict[int, list[str]] = {}
    alias: dict[int, str] = {}
    for i in range(n_entities):
        erng = np.random.default_rng((seed, i))
        surfaces[i] = _entity_surfaces(i, erng)
        if erng.random() < 0.3:
            alias[i] = _entity_alias(i, surfaces[i][0])
    return surfaces, alias


def _generate_chunk(
    chunk_id: int, turns: int, n_entities: int, seed: int
) -> pd.DataFrame:
    """One chunk of transcript turns; conv ids namespaced by chunk."""
    rng = np.random.default_rng((seed, 7919, chunk_id))
    surfaces, alias = _entity_pool(n_entities, seed)
    n_preds = len(PRED_CUES)
    ent_w = 1.0 / np.power(np.arange(1, n_entities + 1), 1.1)
    ent_p = ent_w / ent_w.sum()
    pred_w = 1.0 / np.power(np.arange(1, n_preds + 1), 0.8)
    pred_p = pred_w / pred_w.sum()

    rows: list[tuple] = []
    conv_i = 0
    turns_made = 0
    while turns_made < turns:
        conv_id = f"c{chunk_id:05d}x{conv_i:07d}"
        conv_len = int(min(2 + rng.zipf(1.6), 24))
        # bounded offset (pandas Timedelta is int64 ns, ~292 years): one
        # day per chunk (mod 10k) + one minute per conversation
        conv_off = pd.Timedelta(seconds=(chunk_id % 10_000) * 86_400 + conv_i * 60)
        for t in range(conv_len):
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
            if role == "tool" and rng.random() < 0.7:
                text = ""
            else:
                sents: list[str] = []
                if rng.random() < 0.4:
                    sents.append(_FILLERS[int(rng.integers(0, len(_FILLERS)))])
                n_facts = int(rng.integers(0, 5))
                for _ in range(n_facts):
                    se, oe = rng.choice(n_entities, size=2, p=ent_p)
                    pk = int(rng.choice(n_preds, p=pred_p))
                    _, cue = PRED_CUES[pk]
                    s_pool = surfaces[int(se)] + ([alias[int(se)]] if int(se) in alias else [])
                    o_pool = surfaces[int(oe)] + ([alias[int(oe)]] if int(oe) in alias else [])
                    sents.append(
                        f"{s_pool[int(rng.integers(0, len(s_pool)))]} {cue} "
                        f"{o_pool[int(rng.integers(0, len(o_pool)))]} ."
                    )
                if alias and rng.random() < 0.1:
                    ei = sorted(alias)[int(rng.integers(0, len(alias)))]
                    sents.append(f"{surfaces[ei][0]} {SAME_AS_CUE} {alias[ei]} .")
                text = " ".join(sents)
            ts = _BASE_TS + conv_off + pd.Timedelta(seconds=7 * t)
            rows.append((conv_id, t, role, text, tool, ts))
            turns_made += 1
            if turns_made >= turns:
                break
        conv_i += 1
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def generate_distributed(
    spark,
    n_turns: int,
    seed: int = 42,
    chunk_turns: int = 25_000,
    n_entities: int | None = None,
):
    """Transcripts DataFrame generated in parallel (no recorded truth —
    the bench path; tests use generate() whose truth is exact)."""
    if n_entities is None:
        n_entities = max(16, int(3 * math.sqrt(n_turns)))
    n_chunks = max(1, (n_turns + chunk_turns - 1) // chunk_turns)
    sizes = [chunk_turns] * n_chunks
    sizes[-1] = n_turns - chunk_turns * (n_chunks - 1)

    def gen(batches):
        for pdf in batches:
            for cid in pdf["id"]:
                yield _generate_chunk(int(cid), sizes[int(cid)], n_entities, seed)

    return (
        spark.range(n_chunks)
        .repartition(n_chunks)
        .mapInPandas(
            gen,
            schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
    )
