"""Generator invariants (FIXTURES.md §1) + lexicon sanity."""

from __future__ import annotations

import pandas as pd

from rdf_indexes_spark.lexicon import CUE_TO_PRED, MENTION_PATTERN, PRED_CUES
from rdf_indexes_spark.synth import generate


def test_deterministic():
    a = generate(300, seed=42)
    b = generate(300, seed=42)
    pd.testing.assert_frame_equal(a.transcripts, b.transcripts)
    pd.testing.assert_frame_equal(a.true_mentions, b.true_mentions)


def test_schema_and_ordering():
    c = generate(400, seed=42)
    t = c.transcripts
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t["turn_idx"].dtype == "int32"
    # dense turn_idx per conv, strictly increasing ts
    for _, g in t.groupby("conv_id"):
        assert list(g["turn_idx"]) == list(range(len(g)))
        assert g["ts"].is_monotonic_increasing


def test_cues_unique_and_non_word_prefix():
    cues = list(CUE_TO_PRED)
    assert len(cues) == len(set(cues)) == len(PRED_CUES) + 1
    for a in cues:
        for b in cues:
            if a != b:
                # no cue is a word-prefix of another (alternation safety)
                assert not b.startswith(a + " "), (a, b)


def test_regex_recovers_truth_exactly():
    """Extraction grammar is unambiguous: regex over generated text
    reproduces the recorded truth mentions 1:1 (P = R = 1)."""
    c = generate(500, seed=42)
    found = []
    for r in c.transcripts.itertuples():
        if not r.text:
            continue
        for i, m in enumerate(MENTION_PATTERN.finditer(r.text)):
            found.append((r.conv_id, r.turn_idx, i, m.group("subj"),
                          CUE_TO_PRED[m.group("cue")], m.group("obj")))
    truth = list(c.true_mentions.itertuples(index=False, name=None))
    assert sorted(found) == sorted(truth)


def test_zipf_hub():
    c = generate(1000, seed=42)
    facts = c.true_mentions[c.true_mentions["pred"] != "sameAs"]
    # hub entity (id 0) surfaces appear in >= 5% of turns with text
    hub_surfaces = set(c.entity_surfaces[0])
    n_turns = len(c.transcripts)
    hub_turns = facts[(facts["subj"].isin(hub_surfaces)) | (facts["obj"].isin(hub_surfaces))]
    assert len(hub_turns[["conv_id", "turn_idx"]].drop_duplicates()) >= 0.05 * n_turns * 0.5
    assert facts["pred"].nunique() <= len(PRED_CUES)


def test_table_seam_reads_catalog_table(spark, transcripts):
    """The Iceberg seam: `table:<name>` reads through the catalog (a temp
    view stands in for the Iceberg table in this sandbox; the code path —
    spark.read.table — is the same one an Iceberg catalog serves)."""
    from rdf_indexes_spark.sources.transcripts import read_transcripts

    transcripts.createOrReplaceTempView("transcripts_v")
    got = read_transcripts(spark, "table:transcripts_v")
    assert got.count() == transcripts.count()
    assert set(got.columns) == set(transcripts.columns)
