"""Closed relation lexicon shared by the synthesizer, the extractor and the
pandas oracle.

The reference's "schema" is implicit — N-Quads lines parsed by
scripts/rdf_parser.py (/root/reference/scripts/rdf_parser.py:75-151).
Our input is conversation transcripts (BASELINE.json input_hint), so the
analogue of the NQ grammar is this cue lexicon: each predicate has a
unique lowercase cue phrase; fact sentences have the exact shape

    "<subj_token> <cue> <obj_token> ."

and alias (coreference) statements have the shape

    "<token_a> aka <token_b> ."

Entity tokens always contain a digit ([A-Za-z][A-Za-z0-9-]* with >=1
digit), cue words never do — so extraction is unambiguous. No cue is a
word-prefix of another cue.
"""

from __future__ import annotations

import re

# 40 (predicate, cue-phrase) pairs. Cues are 1-2 words, all lowercase,
# pairwise non-prefix (checked in tests).
PRED_CUES: list[tuple[str, str]] = [
    ("worksAt", "works at"),
    ("reportsTo", "reports to"),
    ("manages", "manages"),
    ("locatedIn", "located in"),
    ("acquired", "acquired"),
    ("dependsOn", "depends on"),
    ("blocks", "blocks"),
    ("owns", "owns"),
    ("uses", "uses"),
    ("mentions", "references"),
    ("partneredWith", "partnered with"),
    ("founded", "founded"),
    ("funds", "funds"),
    ("supplies", "supplies"),
    ("employs", "employs"),
    ("advises", "advises"),
    ("audits", "audits"),
    ("hosts", "hosts"),
    ("maintains", "maintains"),
    ("licenses", "licenses"),
    ("sponsors", "sponsors"),
    ("rents", "rents"),
    ("shipsTo", "ships to"),
    ("resembles", "resembles"),
    ("contains", "contains"),
    ("precedes", "precedes"),
    ("follows", "follows"),
    ("invokes", "invokes"),
    ("deploys", "deploys"),
    ("monitors", "monitors"),
    ("escalatedTo", "escalated to"),
    ("assignedTo", "assigned to"),
    ("duplicates", "duplicates"),
    ("resolves", "resolves"),
    ("reviews", "reviews"),
    ("approves", "approves"),
    ("tests", "validates"),
    ("imports", "imports"),
    ("extends", "extends"),
    ("queries", "consults"),
]

# The coreference cue: "X aka Y" asserts X and Y are the same entity.
# Routed to the entity linker, never emitted as a triple.
SAME_AS = "sameAs"
SAME_AS_CUE = "aka"

CUE_TO_PRED: dict[str, str] = {cue: pred for pred, cue in PRED_CUES}
CUE_TO_PRED[SAME_AS_CUE] = SAME_AS

# Entity tokens: start with a letter, contain at least one digit.
ENTITY_TOKEN = r"[A-Za-z][A-Za-z0-9-]*"

_CUES_BY_LEN = sorted(CUE_TO_PRED, key=len, reverse=True)
MENTION_PATTERN = re.compile(
    rf"(?P<subj>{ENTITY_TOKEN}) (?P<cue>{'|'.join(re.escape(c) for c in _CUES_BY_LEN)}) (?P<obj>{ENTITY_TOKEN})"
)


def normalize_surface(s: str) -> str:
    """Normalization key for candidate generation: lowercase alnum only.

    Variants of one entity ("Velor12", "VELOR12", "velor-12") share a key;
    genuine aliases ("V12q") do not and need an explicit sameAs edge.
    """
    return re.sub(r"[^a-z0-9]", "", s.lower())
