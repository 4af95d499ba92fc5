"""Text analysis + similarity + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest

from rdf_indexes_spark.operators import multimodal as M
from rdf_indexes_spark.operators import similarity as S
from rdf_indexes_spark.operators import textops as X

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_token_count(docs):
    got = got = X.token_count(docs).toPandas().set_index("doc_id")["n_tokens"]
    pdf = docs.toPandas()
    for r in pdf.itertuples():
        want = 0 if not str(r.text).strip() else len(str(r.text).strip().split())
        assert got[r.doc_id] == want, r.doc_id


def test_language_id_deterministic_and_sane(docs):
    out = X.language_id(docs).toPandas()
    assert set(out.columns) == {"doc_id", "lang_pred", "de_hits", "en_hits", "es_hits", "fr_hits"}
    assert out["lang_pred"].isin(["en", "de", "fr", "es", "und"]).all()
    # argmax rule holds row-by-row
    for r in out.itertuples():
        hits = {"de": r.de_hits, "en": r.en_hits, "es": r.es_hits, "fr": r.fr_hits}
        if max(hits.values()) == 0:
            assert r.lang_pred == "und"
        else:
            best = sorted(hits.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            assert r.lang_pred == best


def test_quality_score_bounds_and_formula(docs):
    out = X.quality_score(docs).toPandas()
    assert ((out.quality >= 0) & (out.quality <= 100)).all()
    pdf = docs.toPandas().set_index("doc_id")
    for r in out.sample(30, random_state=0).itertuples():
        text = str(pdf.loc[r.doc_id, "text"])
        toks = text.strip().split() if text.strip() else []
        assert r.n_tokens == len(toks)
        assert r.n_chars == len(text)


def test_doc_fingerprint_matches_python(docs):
    got = X.doc_fingerprint(docs).toPandas().set_index("doc_id")["fingerprint"]
    pdf = docs.toPandas()
    mod, base = (1 << 31) - 1, 31
    for r in pdf.head(50).itertuples():
        acc = 0
        for ch in str(r.text):
            # F.ascii = codepoint of first char (ascii inputs here)
            acc = (acc * base + ord(ch)) % mod
        assert got[r.doc_id] == acc


def test_brute_force_topk_vs_numpy(emb):
    pdf = emb.toPandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    qids = sorted(vecs)[:5]
    queries = emb.filter(emb.vec_id.isin([int(q) for q in qids]))
    got = S.brute_force_topk(emb, queries, k=5).toPandas()
    for q in qids:
        qv = vecs[q]
        scores = {
            n: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for n, v in vecs.items()
            if n != q
        }
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        g = got[got.query_id == q].sort_values("rank")
        assert list(g.neighbor_id) == [n for n, _ in want]
        assert np.allclose(list(g.cosine), [s for _, s in want], atol=1e-9)


def test_lsh_topk_recall(emb):
    pdf = emb.toPandas()
    qids = sorted(pdf.vec_id)[:10]
    queries = emb.filter(emb.vec_id.isin([int(q) for q in qids]))
    exact = S.brute_force_topk(emb, queries, k=5).toPandas()
    approx = S.lsh_topk(emb, queries, k=5, planes=6, tables=8).toPandas()
    hits = tot = 0
    for q in qids:
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.5, f"LSH recall too low: {hits}/{tot}"


def test_multimodal_features_and_stub(spark):
    media = M.synth_media(spark, n=30)
    feats = M.extract_features(media, decode_stub=True).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats.features)
    assert (feats.n_bytes > 0).all()
    # REAL decodes: image dims come from the PPM header and match meta
    meta = media.selectExpr("media_id", "kind", "meta.width w", "meta.height h", "meta.duration_ms d").toPandas().set_index("media_id")
    for r in feats.itertuples():
        if r.kind == "image":
            assert (r.width, r.height) == (meta.loc[r.media_id].w, meta.loc[r.media_id].h)
        elif r.kind == "audio":
            # PCM16 duration from the data chunk; generator rounds to ms
            assert abs(r.duration_ms - meta.loc[r.media_id].d) <= 1
            assert 0.05 < r.rms < 0.7  # sine rms = amp/sqrt(2), amp in [0.2,0.9]
    # deterministic across runs
    feats2 = M.extract_features(media, decode_stub=True).toPandas()
    assert list(feats.sort_values("media_id").sha256) == list(feats2.sort_values("media_id").sha256)
    # codecs without a container-free decoder (h264) still raise in strict mode
    with pytest.raises(Exception):
        M.extract_features(media, decode_stub=False).collect()
    plan = M.frame_sample_plan(media, every_ms=5000).toPandas()
    assert (plan.frame_ts_ms % 5000 == 0).all()


def test_wav_ppm_roundtrip_and_resize():
    import numpy as np

    sr = 8000
    t = np.arange(sr) / sr
    wave = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    sr2, back = M.decode_wav(M.encode_wav_pcm16(wave, sr))
    assert sr2 == sr and np.array_equal(back, wave)

    img = (np.arange(24 * 16 * 3, dtype=np.uint8).reshape(24, 16, 3) * 7) % 256
    assert np.array_equal(M.decode_ppm(M.encode_ppm(img)), img)
    # mean-pool resize: 2x2 block means, exact for integer ratios
    small = M.resize_mean_pool(img.astype(np.uint8), 8, 12)
    want = img.reshape(12, 2, 8, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert np.array_equal(small, want)


def test_token_count_bpe_matches_python_re(spark):
    import re

    from rdf_indexes_spark.operators.textops import token_count_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = token_count_bpe(docs).toPandas().set_index("doc_id")
    pdf = docs.select("doc_id", "text").toPandas()
    for r in pdf.itertuples():
        t = r.text or ""
        w = len(re.findall(r"[A-Za-z]+", t))
        n = len(re.findall(r"[0-9]+", t))
        o = len(re.findall(r"[^A-Za-z0-9\s]", t))
        row = got.loc[r.doc_id]
        assert (row.n_word_tokens, row.n_number_tokens, row.n_other_tokens) == (w, n, o)
        assert row.n_bpe_tokens == w + n + o


def test_repetition_stats_counts(spark):
    """Pandas-free golden check: token/bigram repetition fractions over
    hand-computed documents (Gopher-style repetition signals)."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),  # tokens a:3 b:2; bigrams {a b}x2 {b a}x2
            (2, "x y z"),
            (3, ""),
            (4, "w"),
            (5, "  a   b  "),  # whitespace runs collapse, no empty tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in X.repetition_stats(docs).collect()
    }
    assert got[1] == dict(doc_id=1, n_tokens=5, top_token_count=3,
                          top_token_ratio_x1000=600, n_bigrams=4,
                          top_bigram_count=2, dup_bigram_tokens=4,
                          dup_bigram_ratio_x1000=1000)
    assert got[2] == dict(doc_id=2, n_tokens=3, top_token_count=1,
                          top_token_ratio_x1000=333, n_bigrams=2,
                          top_bigram_count=1, dup_bigram_tokens=0,
                          dup_bigram_ratio_x1000=0)
    assert got[3] == dict(doc_id=3, n_tokens=0, top_token_count=0,
                          top_token_ratio_x1000=0, n_bigrams=0,
                          top_bigram_count=0, dup_bigram_tokens=0,
                          dup_bigram_ratio_x1000=0)
    assert got[4]["n_tokens"] == 1 and got[4]["n_bigrams"] == 0
    assert got[5]["n_tokens"] == 2 and got[5]["n_bigrams"] == 1


def test_repetition_stats_matches_python(spark):
    """Cross-check against a pure-Python recount on real test docs."""
    from collections import Counter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = X.repetition_stats(docs).toPandas().set_index("doc_id")
    pdf = docs.select("doc_id", "text").toPandas()
    for r in pdf.itertuples():
        toks = [t for t in (r.text or "").lower().strip().split() if t]
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tc, bc = Counter(toks), Counter(bgs)
        row = got.loc[r.doc_id]
        assert row.n_tokens == len(toks)
        assert row.top_token_count == (max(tc.values()) if tc else 0)
        assert row.n_bigrams == len(bgs)
        assert row.top_bigram_count == (max(bc.values()) if bc else 0)
        assert row.dup_bigram_tokens == sum(c for c in bc.values() if c > 1)


def test_gopher_filter_golden(spark):
    """Each rule fires on a purpose-built document; a good document
    passes clean; reasons come in the fixed rule order."""
    from rdf_indexes_spark.operators.textops import gopher_filter

    content = [f"word{i:02d}x" for i in range(20)]
    stops = ["the", "and", "of", "in", "to"] * 2
    good = " ".join(w for pair in zip(content, stops + content[:10]) for w in pair)
    docs = spark.createDataFrame(
        [
            (1, good),  # keeps: >30 tokens, stopwords, varied
            (2, "tiny doc"),  # too_short (+ low_stopwords)
            (3, "spam " * 40),  # top_token + dup_bigrams (no stopwords)
            (4, ("verylongsyntheticwordhere " * 35).strip()),  # token_len ...
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.keep, r.reasons) for r in gopher_filter(docs).collect()}
    assert got[1] == (True, "")
    assert got[2][0] is False and "too_short" in got[2][1]
    assert got[3][0] is False
    assert "top_token" in got[3][1] and "dup_bigrams" in got[3][1]
    assert got[4][0] is False and "token_len" in got[4][1]
    # fixed order: reasons never permute
    assert got[3][1].index("top_token") < got[3][1].index("dup_bigrams")


def test_gopher_filter_consistent_with_components(spark, docs):
    """Recompute keep from the component frames directly — the filter
    must agree rule-for-rule on real synthetic documents."""
    from rdf_indexes_spark.operators.textops import (
        gopher_filter,
        quality_score,
        repetition_stats,
    )

    q = quality_score(docs).toPandas().set_index("doc_id")
    r = repetition_stats(docs).toPandas().set_index("doc_id")
    got = gopher_filter(docs).toPandas().set_index("doc_id")
    for d in got.index:
        want_keep = (
            30 <= q.loc[d, "n_tokens"] <= 100_000
            and 300 <= q.loc[d, "mean_token_len_x100"] <= 1000
            and q.loc[d, "stop_ratio_x1000"] >= 10
            and r.loc[d, "top_token_ratio_x1000"] <= 150
            and r.loc[d, "dup_bigram_ratio_x1000"] <= 150
        )
        assert bool(got.loc[d, "keep"]) == want_keep, d
    # the testdata produces a real mix, not a degenerate all-keep/all-drop
    assert 0 < got["keep"].sum() < len(got)


def test_chunk_documents_golden(spark):
    from rdf_indexes_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b"), (3, "   ")],
        "doc_id long, text string",
    )
    # c=4, s=3: starts 1,4,7,10 -> lengths 4,4,4,1
    got = sorted(
        (r.doc_id, r.chunk_idx, r.n_tokens, r.text)
        for r in chunk_documents(df, 4, 3).collect()
    )
    assert got == [
        (1, 0, 4, "t1 t2 t3 t4"),
        (1, 1, 4, "t4 t5 t6 t7"),
        (1, 2, 4, "t7 t8 t9 t10"),
        (1, 3, 1, "t10"),
        (2, 0, 2, "a b"),  # shorter than a chunk: one tail chunk
    ]  # doc 3 (whitespace-only) emits nothing


def test_chunk_documents_reconstruction(spark, docs):
    """stride == chunk_tokens: disjoint chunks concatenate back to the
    original token stream, preserving case and order."""
    from rdf_indexes_spark.operators.textops import chunk_documents

    got = chunk_documents(docs, 16).toPandas()
    orig = {r.doc_id: r.text.strip().split() for r in docs.collect() if r.text.strip()}
    rebuilt = {
        d: [t for _, txt in sorted(zip(g["chunk_idx"], g["text"])) for t in txt.split()]
        for d, g in got.groupby("doc_id")
    }
    assert set(rebuilt) == set(orig)
    for d in orig:
        assert rebuilt[d] == orig[d], d
    # n_tokens column is the actual chunk token count
    assert (got["n_tokens"] == got["text"].str.split().str.len()).all()


def test_redact_pii_golden(spark):
    from rdf_indexes_spark.operators.textops import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@ex-a.co.uk or 10.0.0.255 call +44 20 7946 0958 end"),
            (2, "no pii here at all"),
            (3, "two mails a@b.co c@d.org and ip 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert got[1].text == "mail <EMAIL> or <IP> call <PHONE> end"
    assert (got[1].n_email, got[1].n_ip, got[1].n_phone) == (1, 1, 1)
    assert got[2].text == "no pii here at all"
    assert (got[2].n_email, got[2].n_ip, got[2].n_phone) == (0, 0, 0)
    assert got[3].text == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert (got[3].n_email, got[3].n_ip, got[3].n_phone) == (2, 1, 0)


def test_redact_pii_staged_order(spark):
    """An email's digits must not re-match as a phone: the categories
    see each other's output in fixed order."""
    from rdf_indexes_spark.operators.textops import redact_pii

    df = spark.createDataFrame(
        [(1, "reach 12345678901@numbers-mail.com today")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert r.text == "reach <EMAIL> today"
    assert (r.n_email, r.n_ip, r.n_phone) == (1, 0, 0)


def test_pack_sequences_matches_python_scan(spark, docs):
    """Distributed two-phase prefix sum == a sequential python scan over
    doc_id order, at several partition counts (the partition-offset
    machinery must be invisible); sequences only overrun the budget by
    less than one straddling document."""
    from rdf_indexes_spark.operators.textops import pack_sequences

    pdf = docs.select("doc_id", "text").toPandas().sort_values("doc_id")
    acc, want = 0, []
    for r in pdf.itertuples():
        n = 0 if not r.text.strip() else len(r.text.strip().split())
        want.append((r.doc_id, acc // 300, n, acc % 300))
        acc += n
    for nparts in (1, 3, 8):
        out = pack_sequences(docs, target_tokens=300, num_partitions=nparts).toPandas()
        got = sorted(map(tuple, out[["doc_id", "seq_id", "n_tokens", "start_tok"]].itertuples(index=False)))
        assert got == sorted(want), nparts
    # budget property: every sequence's token start offsets stay < target
    assert (out["start_tok"] < 300).all() and (out["start_tok"] >= 0).all()
    # sequences are contiguous 0..max with no gaps
    seqs = sorted(out["seq_id"].unique())
    assert seqs == list(range(len(seqs)))


def test_top_terms_golden_and_ranking(spark):
    from rdf_indexes_spark.operators.textops import top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple rare the the the"),
            (2, "the banana banana apple"),
            (3, "the cherry"),
        ],
        "doc_id long, text string",
    )
    # N=3; df: the=3, apple=2, banana=1, rare=1, cherry=1
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.score)
           for r in top_terms(df, k=2).collect()}
    # doc1: apple tf2 df2 -> 3; rare tf1 df1 -> 3; the tf3 df3 -> 3
    #   all score 3 -> tie by tf desc: the (tf3), apple (tf2)
    assert got[(1, 1)] == ("the", 3, 3, 3)
    assert got[(1, 2)] == ("apple", 2, 2, 3)
    # doc2: banana tf2 df1 -> 6 beats apple tf1 df2 -> 1 and the -> 1
    assert got[(2, 1)] == ("banana", 2, 1, 6)
    assert got[(2, 2)][0] == "apple"  # score 1 ties with 'the': tf equal, term asc
    # doc3: cherry tf1 df1 -> 3 beats the tf1 df3 -> 1
    assert got[(3, 1)] == ("cherry", 1, 1, 3)


def test_bm25_search_ranking_properties(spark):
    from rdf_indexes_spark.operators.textops import bm25_search

    df = spark.createDataFrame(
        [
            (1, "scan scan scan join filler filler filler filler"),
            (2, "scan join merge"),
            (3, "merge merge merge merge"),
            (4, "nothing relevant here at all whatsoever truly"),
            (5, "scan"),
        ],
        "doc_id long, text string",
    )
    out = bm25_search(df, ["scan", "join", "merge"], k=10).toPandas()
    # only matching docs appear, ranked 1..n with strictly ordered scores
    assert set(out["doc_id"]) == {1, 2, 3, 5}
    assert list(out["rank"]) == list(range(1, 5))
    s = list(out.sort_values("rank")["score_x1e6"])
    assert s == sorted(s, reverse=True)
    # doc 2 matches all three query terms
    assert int(out.set_index("doc_id").loc[2, "n_matched"]) == 3
    # idf: 'merge' (df=2) contributes more than 'scan' (df=3) at equal tf
    one_scan = bm25_search(df, ["scan"], k=10).toPandas().set_index("doc_id")
    one_merge = bm25_search(df, ["merge"], k=10).toPandas().set_index("doc_id")
    assert one_merge.loc[2, "score_x1e6"] > one_scan.loc[2, "score_x1e6"]
    # determinism across runs
    again = bm25_search(df, ["scan", "join", "merge"], k=10).toPandas()
    assert out.sort_values("rank").equals(again.sort_values("rank"))


def test_normalize_text_golden(spark):
    from rdf_indexes_spark.operators.textops import normalize_text

    df = spark.createDataFrame(
        [
            (1, "cafe\u0301  du\tmonde\n"),  # NFC composes e+combining acute
            (2, "a\x00b\x07c\x7fd"),         # controls -> spaces -> collapse
            (3, "  already   clean  "),
            (4, "\u212b vs \u00c5"),          # ANGSTROM SIGN normalizes to A-ring
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in normalize_text(df).collect()}
    assert got[1] == "caf\u00e9 du monde"
    assert got[2] == "a b c d"
    assert got[3] == "already clean"
    assert got[4] == "\u00c5 vs \u00c5"
    assert got[5] is None
    assert got[6] == ""


def test_normalize_text_idempotent(spark, docs):
    from rdf_indexes_spark.operators.textops import normalize_text

    once = normalize_text(docs).toPandas().set_index("doc_id")["text"]
    twice = (
        normalize_text(normalize_text(docs)).toPandas().set_index("doc_id")["text"]
    )
    assert once.sort_index().equals(twice.sort_index())


# ------------------------------------------------------------------- c4

import re


def _c4_python(text: str, min_lines: int = 3):
    """Reference recompute of c4_clean for one document."""
    kept = []
    for line in text.split("\n"):
        t = line.strip()
        if (
            re.search(r'[.!?"]$', t)
            and len(re.split(r"\s+", t)) >= 3
            and "javascript" not in t.lower()
        ):
            kept.append(line)  # the ORIGINAL line, not the trimmed probe
    bad = "lorem ipsum" in text.lower() or "{" in text
    return (len(kept) >= min_lines and not bad, len(kept), "\n".join(kept))


def test_c4_clean_golden(spark):
    from rdf_indexes_spark.operators.textops import c4_clean

    docs = spark.createDataFrame(
        [
            # 3 good lines -> kept verbatim
            (1, "This is a sentence.\nAnother good line!\nIs this kept?"),
            # punct rule kills line 2, word-count rule kills "Short one."
            (2, "This is a sentence.\nno punctuation here\nShort one."),
            # <3 words and javascript rules
            (3, "Too short.\nEnable javascript to view this page.\nA fine closing line.\nAnd one more line.\nKeep me too."),
            # lorem ipsum kills the whole page even with good lines
            (4, "Lorem ipsum dolor sit amet.\nA perfectly good line here.\nAnd another good one.\nThird good line here."),
            # curly brace kills the page
            (5, 'function f() { return 1; }\nA good line is here.\nAnd another one too.\nClosing line here.'),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.keep, r.n_kept_lines, r.clean_text)
        for r in c4_clean(docs).collect()
    }
    assert got[1] == (True, 3, "This is a sentence.\nAnother good line!\nIs this kept?")
    assert got[2][0] is False and got[2][1] == 1
    # doc 3: 'Too short.' (2 words) and the javascript line drop; 3 survive
    assert got[3] == (True, 3, "A fine closing line.\nAnd one more line.\nKeep me too.")
    assert got[4][0] is False and got[4][1] == 4  # lines fine, page killed
    assert got[5][0] is False  # brace
    assert got[6] == (False, 0, "")


def test_c4_clean_matches_python(spark, docs):
    from rdf_indexes_spark.operators.textops import c4_clean

    got = c4_clean(docs).toPandas().set_index("doc_id")
    pdf = docs.select("doc_id", "text").toPandas()
    for r in pdf.itertuples():
        want = _c4_python(str(r.text or ""))
        row = got.loc[r.doc_id]
        assert (bool(row.keep), int(row.n_kept_lines), row.clean_text) == want, r.doc_id


def test_fim_transform_reconstruction(spark, docs):
    """On real documents: every FIM'd row reassembles to its original
    text (PSM: prefix+middle+suffix == original), pass-through rows are
    untouched, and the fim decision is the hash_sample contract."""
    from rdf_indexes_spark.operators.sampling import hash_sample
    from rdf_indexes_spark.operators.textops import fim_transform

    out = fim_transform(docs, rate=0.5).collect()
    orig = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    fim_ids = {r.doc_id for r in hash_sample(docs, 0.5).select("doc_id").collect()}
    assert {r.doc_id for r in out if r.fim} == fim_ids
    for r in out:
        if not r.fim:
            assert r.text == orig[r.doc_id]
            continue
        assert r.text.startswith("<fim_prefix>")
        body = r.text[len("<fim_prefix>"):]
        pre, rest = body.split("<fim_suffix>", 1)
        suf, mid = rest.split("<fim_middle>", 1)
        assert pre + mid + suf == orig[r.doc_id]


def test_fim_transform_spm_and_determinism(spark):
    from rdf_indexes_spark.operators.textops import fim_transform

    df = spark.createDataFrame(
        [(i, "abcdefghij") for i in range(50)], "doc_id long, text string"
    )
    psm1 = {r.doc_id: r.text for r in fim_transform(df, rate=1.0).collect()}
    psm2 = {
        r.doc_id: r.text
        for r in fim_transform(df.repartition(7), rate=1.0).collect()
    }
    assert psm1 == psm2  # layout-independent
    spm = {r.doc_id: r.text for r in fim_transform(df, rate=1.0, fmt="spm").collect()}
    for i in range(50):
        body = psm1[i][len("<fim_prefix>"):]
        pre, rest = body.split("<fim_suffix>", 1)
        suf, mid = rest.split("<fim_middle>", 1)
        assert pre + mid + suf == "abcdefghij"
        assert spm[i] == f"<fim_suffix>{suf}<fim_prefix>{pre}<fim_middle>{mid}"
    # same key → same cut; different keys spread cuts around
    cuts = {psm1[i] for i in range(50)}
    assert len(cuts) > 5


def test_fim_transform_edges(spark):
    from rdf_indexes_spark.operators.textops import fim_transform

    import pytest as _pytest

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = fim_transform(df, rate=1.0).first()
    assert r.fim and r.text == "<fim_prefix><fim_suffix><fim_middle>"
    with _pytest.raises(ValueError):
        fim_transform(df, rate=1.0, fmt="mps")
    with _pytest.raises(ValueError):
        fim_transform(df, rate=1.5)


def test_compression_stats_exact_recount(spark, docs):
    """Exact zlib parity with a direct python recount on real docs,
    plus the ratio arithmetic and the repetitive-vs-random ordering."""
    import zlib

    from rdf_indexes_spark.operators.textops import compression_stats

    got = {r.doc_id: r for r in compression_stats(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        b = row.text.encode("utf-8")
        r = got[row.doc_id]
        assert r.n_bytes == len(b)
        assert r.n_zlib_bytes == len(zlib.compress(b, 6))
        if len(b):
            assert r.ratio_x1e4 == 10_000 * r.n_zlib_bytes // r.n_bytes

    df = spark.createDataFrame(
        [(1, "a" * 5000), (2, "".join(chr(33 + (i * 7919) % 90) for i in range(5000))), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_stats(df).collect()}
    assert out[1].ratio_x1e4 < out[2].ratio_x1e4  # repetition compresses
    assert out[3].ratio_x1e4 is None and out[3].n_bytes == 0


def test_json_field_stats_golden(spark):
    """Missing fields and malformed JSON count toward n but not the
    value aggregates; integers aggregate exactly."""
    import pytest

    from rdf_indexes_spark.operators.textops import json_field_stats

    df = spark.createDataFrame(
        [
            ("a", '{"k": 3}'), ("a", '{"k": 5, "x": 1}'),
            ("a", '{"x": 9}'),          # field missing
            ("b", "not json"),          # malformed
            ("b", '{"k": -2}'),
        ],
        "g string, props string",
    )
    got = {
        r.g: (r.n, r.n_present, r.sum_val, r.min_val, r.max_val)
        for r in json_field_stats(df, "props", "$.k", ["g"]).collect()
    }
    assert got == {"a": (3, 2, 8, 3, 5), "b": (2, 1, -2, -2, -2)}
    with pytest.raises(ValueError):
        json_field_stats(df, "props", "$.k", [])


def _python_bpe(word_counts, n_merges):
    """Reference BPE (Sennrich et al.) with the operator's tie rule."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, n))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_learn_bpe_matches_reference_algorithm(spark):
    """Parity with a pure-python BPE on a corpus with repeated-symbol
    words (the overlap edge: 'aaa'), ties, and multi-round merges."""
    from collections import Counter

    from rdf_indexes_spark.operators.textops import learn_bpe

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "aaa aa aaa banana",
        "low new aaa",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    wc = Counter(w for t in texts for w in t.split())
    want = _python_bpe(wc, 6)
    got = [(r.merge_rank, r.left, r.right, r.merged, r.pair_count)
           for r in learn_bpe(df, n_merges=6).orderBy("merge_rank").collect()]
    assert got == want


def test_learn_bpe_errors(spark):
    import pytest

    from rdf_indexes_spark.operators.textops import learn_bpe

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        learn_bpe(df, n_merges=0)


def test_unigram_rarity_matches_python(docs):
    got = X.unigram_rarity(docs, rare_max_cf=2).toPandas().set_index("doc_id")
    pdf = docs.toPandas()
    from collections import Counter

    per_doc = {}
    cf = Counter()
    for r in pdf.itertuples():
        t = str(r.text).strip().lower()
        if not t:
            continue
        toks = t.split()
        per_doc[r.doc_id] = Counter(toks)
        cf.update(toks)
    assert set(got.index) == set(per_doc)
    for did, c in per_doc.items():
        row = got.loc[did]
        assert row["n_tokens"] == sum(c.values())
        assert row["n_distinct"] == len(c)
        assert row["n_rare_distinct"] == sum(1 for w in c if cf[w] <= 2)
        assert row["n_rare_tokens"] == sum(n for w, n in c.items() if cf[w] <= 2)
        assert row["min_cf"] == min(cf[w] for w in c)


def test_bigram_collocations_matches_python(docs):
    got = X.bigram_collocations(docs, min_count=3).toPandas()
    pdf = docs.toPandas()
    from collections import Counter

    uni, bi = Counter(), Counter()
    n_bi_total = 0
    for r in pdf.itertuples():
        t = str(r.text).strip().lower()
        if not t:
            continue
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        n_bi_total += max(len(toks) - 1, 0)
    n_uni = sum(uni.values())
    want = {k: v for k, v in bi.items() if v >= 3}
    got_idx = {(r.w1, r.w2): r for r in got.itertuples()}
    assert set(got_idx) == set(want)
    for (w1, w2), r in got_idx.items():
        assert r.c_xy == want[(w1, w2)]
        assert r.c_x == uni[w1] and r.c_y == uni[w2]
        assert r.n_uni == n_uni and r.n_bi == n_bi_total
        lift = r.c_xy * float(n_uni) * float(n_uni) / n_bi_total / uni[w1] / uni[w2]
        assert abs(r.lift - lift) < 1e-9 * max(1.0, lift)


def test_bigram_collocations_plan_no_python(docs):
    plan = X.bigram_collocations(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_encode_matches_sequential_application(spark):
    """Encoding must equal the literal sequential rank-order application
    of the learned merges (the learning-time semantics)."""
    from rdf_indexes_spark.operators.textops import bpe_encode, learn_bpe

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "aaa aa aaa banana",
        "low new aaa",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = learn_bpe(df, n_merges=6)
    mrows = [(r.left, r.right) for r in merges.orderBy("merge_rank").collect()]

    def seq_encode_word(w):
        syms = list(w)
        for l, r in mrows:  # sequential, rank order, leftmost non-overlap
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r.doc_id: (r.n_bpe_tokens, list(r.tokens))
           for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        want = [s for w in t.strip().lower().split() for s in seq_encode_word(w)]
        assert got[i] == (len(want), want), (i, got[i], want)


def test_bpe_encode_on_real_docs_roundtrip(docs):
    """Concatenating each doc's tokens reproduces its lowercased
    whitespace-normalized text (BPE is lossless within words)."""
    from rdf_indexes_spark.operators.textops import bpe_encode, learn_bpe

    merges = learn_bpe(docs.limit(50), n_merges=4)
    out = bpe_encode(docs.limit(50), merges).collect()
    pdf = {r.doc_id: str(r.text) for r in docs.limit(50).collect()}
    assert len(out) == len(pdf)
    for r in out:
        want = "".join(pdf[r.doc_id].strip().lower().split())
        assert "".join(r.tokens) == want


def test_lm_bigram_surprisal_ground_truth(spark):
    from rdf_indexes_spark.operators.textops import lm_bigram_surprisal

    train = spark.createDataFrame(
        # uni: a:3 b:2 c:1 (N=6); bigrams: (a,b):2 (b,a):1 (a,c):1
        [(100, "a b a b"), (101, "a c")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "a b"),      # seen: c_x(a)=3 div c_xy(ab)=2 -> 1
            (2, "c a"),      # unseen bigram, w2=a known: 10 * (6 div 3) = 20
            (3, "a z"),      # z OOV: 2 * 10 * 6 = 120
            (4, "b a b"),    # (b,a): 2 div 1 = 2; (a,b): 1 -> sum 3
            (5, "q"),        # < 2 tokens: no row
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_bigrams"], r["n_seen"], r["n_backoff"], r["n_oov"], r["inv_prob_sum"]
        )
        for r in lm_bigram_surprisal(docs, train_docs=train, backoff_penalty=10).collect()
    }
    assert got == {
        1: (1, 1, 0, 0, 1),
        2: (1, 0, 1, 0, 20),
        3: (1, 0, 0, 1, 120),
        4: (2, 2, 0, 0, 3),
    }


def test_lm_bigram_surprisal_self_trained_all_seen(spark):
    """Trained on the scored corpus itself, every bigram is seen and the
    score is >= n_bigrams (inverse probability >= 1)."""
    from rdf_indexes_spark.operators.textops import lm_bigram_surprisal

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = lm_bigram_surprisal(docs).collect()
    assert out
    for r in out:
        assert r["n_backoff"] == 0 and r["n_oov"] == 0
        assert r["n_seen"] == r["n_bigrams"]
        assert r["inv_prob_sum"] >= r["n_bigrams"]


def test_vote_quality_classifier_ground_truth(spark):
    from rdf_indexes_spark.operators.textops import vote_quality_classifier

    pos = spark.createDataFrame([(100, "good good fine")], "doc_id long, text string")
    neg = spark.createDataFrame([(200, "bad bad awful")], "doc_id long, text string")
    # counts: pos {good:2, fine:1} N_pos=3; neg {bad:2, awful:1} N_neg=3
    # V = 4; smoothed vote for w: (c_pos+1)*(3+4) vs (c_neg+1)*(3+4)
    #   good: 3*7 vs 1*7 -> pos; bad: 1*7 vs 3*7 -> neg
    #   fine: 2*7 vs 1*7 -> pos; zzz (OOV): 1*7 vs 1*7 -> tie, no vote
    docs = spark.createDataFrame(
        [
            (1, "good fine zzz"),       # pos 2, neg 0 -> pred 1
            (2, "bad bad good"),        # pos 1, neg 2 -> pred 0
            (3, "zzz zzz"),             # no votes -> pred 0 (tie)
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["votes_pos"], r["votes_neg"], r["pred"])
        for r in vote_quality_classifier(docs, pos, neg).collect()
    }
    assert got == {
        1: (3, 2, 0, 1),
        2: (3, 1, 2, 0),
        3: (2, 0, 0, 0),
    }
