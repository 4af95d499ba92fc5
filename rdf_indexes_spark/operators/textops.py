"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All of these are pure JVM-side column expressions (whole-stage codegen) —
no Python in the hot path. Semantics are deliberately simple + exactly
reproducible in ANSI SQL so the driver's DuckDB oracle can verify them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "de", "que", "y", "en", "los", "se", "del", "las", "por"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens): whitespace tokens; empty text → 0."""
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(_tokens(text_col))
    )
    return docs.select(F.col(id_col).alias("doc_id"), n.cast("long").alias("n_tokens"))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, <lang>_hits...): stopword-overlap heuristic.

    Distinct-token overlap with each language's stopword list; argmax wins,
    ties broken by language code order (deterministic; matches the SQL
    oracle's GREATEST/CASE formulation).
    """
    toks = F.array_distinct(_tokens(text_col))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = sorted(LANG_STOPWORDS)
    best = F.lit(langs[0])
    best_n = hits[langs[0]]
    for lang in langs[1:]:
        better = hits[lang] > best_n
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_n = F.when(better, hits[lang]).otherwise(best_n)
    cols = [F.col(id_col).alias("doc_id"), F.when(best_n > 0, best).otherwise(F.lit("und")).alias("lang_pred")]
    cols += [hits[lang].cast("long").alias(f"{lang}_hits") for lang in langs]
    return docs.select(*cols)


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_alpha_tokens, mean_token_len_x100,
    stop_ratio_x1000, quality): integer-valued features (engine-portable —
    no float drift vs the SQL oracle) + a 0-100 quality score.

    quality = clamp(0,100, 50 + stopword signal + length signal − short-doc
    penalty); heuristics in the spirit of C4/Gopher text-quality filters.
    """
    toks = _tokens(text_col)
    n_chars = F.length(F.col(text_col))
    empty = F.length(F.trim(F.col(text_col))) == 0
    n_tokens = F.when(empty, F.lit(0)).otherwise(F.size(toks))
    alpha = F.filter(toks, lambda t: t.rlike("^[a-z]+$"))
    n_alpha = F.when(empty, F.lit(0)).otherwise(F.size(alpha))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.when(empty, F.lit(0)).otherwise(F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))))
    # explicit floor everywhere a division happens: Spark's cast(double as
    # long) truncates but DuckDB's rounds — floor() agrees in both engines
    # for the non-negative values here.
    mean_tok_x100 = F.when(n_tokens > 0, F.floor(n_chars * 100 / n_tokens)).otherwise(F.lit(0))
    stop_ratio_x1000 = F.when(n_tokens > 0, F.floor(n_stop * 1000 / n_tokens)).otherwise(F.lit(0))
    quality = F.greatest(
        F.lit(0),
        F.least(
            F.lit(100),
            F.lit(50)
            + F.least(F.lit(25), F.floor(stop_ratio_x1000 / 10))
            + F.least(F.lit(25), F.floor(n_tokens / 20))
            - F.when(n_tokens < 5, F.lit(40)).otherwise(F.lit(0)),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_alpha.cast("long").alias("n_alpha_tokens"),
        mean_tok_x100.alias("mean_token_len_x100"),
        stop_ratio_x1000.alias("stop_ratio_x1000"),
        quality.cast("long").alias("quality"),
    )


# polynomial rolling-hash fingerprint: base 31, mod 2^31-1 — every
# intermediate < 2^31·31 + 2^16 ≪ 2^63, ANSI-safe, and expressible in
# DuckDB as list_reduce over unicode codepoints.
_FP_MOD = (1 << 31) - 1
_FP_BASE = 31


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): rolling hash over the text's codepoints.

    JVM-side: aggregate over split(text, '') with ascii(); identical
    arithmetic runs in the DuckDB oracle via list_reduce.
    """
    chars = F.split(F.col(text_col), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(_FP_BASE) + F.ascii(ch), F.lit(_FP_MOD)),
    )
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


# BPE-ish tokenization: letter runs, digit runs, single punctuation marks
# (whitespace dropped) — the pre-merge word/number/symbol split every BPE
# tokenizer starts from. Basic character classes only, so Spark (Java
# regex) and DuckDB (RE2) agree exactly.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_bpe(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_bpe_tokens, n_word_tokens, n_number_tokens, n_other_tokens):
    counts under the BPE-ish pre-tokenization split. Pure JVM regex —
    one regexp_extract_all per class, no Python."""
    def count(pat: str) -> Column:
        return F.coalesce(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))), F.lit(0)
        ).cast("long")

    words = count("[A-Za-z]+")
    nums = count("[0-9]+")
    other = count("[^A-Za-z0-9\\s]")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (words + nums + other).alias("n_bpe_tokens"),
        words.alias("n_word_tokens"),
        nums.alias("n_number_tokens"),
        other.alias("n_other_tokens"),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, top_token_count, top_token_ratio_x1000,
    n_bigrams, top_bigram_count, dup_bigram_tokens, dup_bigram_ratio_x1000):
    Gopher-style repetition signals — the fraction of the document covered
    by its most frequent token, and the fraction of bigram occurrences
    whose bigram appears more than once (Rae et al. 2021 §A1.1 use these
    to drop boilerplate/repetitive pages before LM training).

    Scale shape: explode → hash-aggregate on (doc, token) → re-aggregate
    on doc. Both exchanges key on doc-scale values (no corpus-wide hot
    key: a document's tokens all hash to (doc_id, tok) pairs), map-side
    partial aggregation applies, and the final join is doc-keyed. No
    Python, no windows. Integer-valued outputs (x1000 ratios, explicit
    floor) so the DuckDB oracle matches exactly.
    """
    did = F.col(id_col).alias("doc_id")
    toks = F.filter(_tokens(text_col), lambda t: F.length(t) > 0)
    ex = docs.select(did, F.explode(toks).alias("tok"))
    tok_counts = ex.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_token_count"),
    )
    # bigrams: adjacent-token pairs in order, built array-side (zip of the
    # token array against itself shifted by one) — no positional shuffle
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(toks, F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bex = docs.select(did, F.explode(bigrams).alias("bg"))
    bg_counts = bex.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    bg_stats = bg_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_count"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
            "dup_bigram_tokens"
        ),
    )
    out = (
        docs.select(did)
        .join(tok_stats, "doc_id", "left")
        .join(bg_stats, "doc_id", "left")
    )
    nt = F.coalesce(F.col("n_tokens"), F.lit(0))
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0))
    top_t = F.coalesce(F.col("top_token_count"), F.lit(0))
    top_b = F.coalesce(F.col("top_bigram_count"), F.lit(0))
    dup_b = F.coalesce(F.col("dup_bigram_tokens"), F.lit(0))
    return out.select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        top_t.cast("long").alias("top_token_count"),
        F.when(nt > 0, F.floor(top_t * 1000 / nt)).otherwise(F.lit(0)).cast("long").alias(
            "top_token_ratio_x1000"
        ),
        nb.cast("long").alias("n_bigrams"),
        top_b.cast("long").alias("top_bigram_count"),
        dup_b.cast("long").alias("dup_bigram_tokens"),
        F.when(nb > 0, F.floor(dup_b * 1000 / nb)).otherwise(F.lit(0)).cast("long").alias(
            "dup_bigram_ratio_x1000"
        ),
    )


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mean_token_len_x100: int = 300,
    max_mean_token_len_x100: int = 1000,
    min_stop_ratio_x1000: int = 10,
    max_top_token_ratio_x1000: int = 150,
    max_dup_bigram_ratio_x1000: int = 150,
) -> DataFrame:
    """The composed Gopher-style document filter (Rae et al. 2021 §A1.1):
    join the engine's quality and repetition signal frames and apply the
    published rule set — token-count bounds, mean-token-length band,
    stopword floor, most-common-token ceiling, duplicate-bigram ceiling.
    Returns (doc_id, keep, reasons): ``reasons`` is the comma-joined list
    of failed rules in a FIXED order ('' when kept), so downstream
    ablations can count per-rule kill rates from one pass.

    All thresholds operate on the integer-valued x100/x1000 signals the
    component operators emit (engine-portable, no float drift); the
    composition is two doc-keyed hash aggregates + one doc-keyed join —
    nothing new shuffles."""
    q = quality_score(docs, id_col, text_col).select(
        "doc_id", "n_tokens", "mean_token_len_x100", "stop_ratio_x1000"
    )
    r = repetition_stats(docs, id_col, text_col).select(
        "doc_id", "top_token_ratio_x1000", "dup_bigram_ratio_x1000"
    )
    j = q.join(r, "doc_id")
    rules = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("too_long", F.col("n_tokens") > max_tokens),
        (
            "token_len",
            (F.col("mean_token_len_x100") < min_mean_token_len_x100)
            | (F.col("mean_token_len_x100") > max_mean_token_len_x100),
        ),
        ("low_stopwords", F.col("stop_ratio_x1000") < min_stop_ratio_x1000),
        ("top_token", F.col("top_token_ratio_x1000") > max_top_token_ratio_x1000),
        ("dup_bigrams", F.col("dup_bigram_ratio_x1000") > max_dup_bigram_ratio_x1000),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    return j.select(
        "doc_id",
        (F.length(reasons) == 0).alias("keep"),
        reasons.alias("reasons"),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_lines: int = 3,
) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020 §2.2), line level
    then document level: keep only lines that end in terminal punctuation
    (``. ! ? "``), contain ≥3 whitespace words, and don't mention
    "javascript"; drop whole documents containing "lorem ipsum" or a
    curly brace, or with fewer than ``min_lines`` surviving lines (the
    paper's ≥5-sentence rule, approximated at line granularity).

    Returns (doc_id, keep, n_kept_lines, clean_text) — ``clean_text`` is
    the surviving lines rejoined, so the kept corpus needs no second
    pass. Pure JVM column expressions (one array filter, zero shuffle);
    the same lambda runs in the DuckDB oracle via list_filter.
    """
    lines = F.split(F.col(text_col), "\n")

    def _line_ok(l: Column) -> Column:
        t = F.trim(l)
        return (
            t.rlike('[.!?"]$')
            & (F.size(F.split(t, r"\s+")) >= 3)
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    n_kept = F.size(kept)
    bad_doc = F.lower(F.col(text_col)).contains("lorem ipsum") | F.col(
        text_col
    ).contains("{")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ((n_kept >= min_lines) & ~bad_doc).alias("keep"),
        n_kept.cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token chunks — the sequence-
    packing precursor every LM training pipeline runs. Chunk i starts at
    token ``i * stride`` (0-based; ``stride`` defaults to
    ``chunk_tokens``, i.e. disjoint chunks; a smaller stride overlaps
    them) and carries up to ``chunk_tokens`` whitespace tokens; the tail
    chunk may be short but is never empty, and every token is covered.
    Returns (doc_id, chunk_idx, n_tokens, text).

    Deterministic per document (no partitioning/run dependence) and
    purely map-side: the chunk list is built inside one higher-order
    transform per row and consumed by the posexplode generator — no
    shuffle at all, the ideal scale shape. Empty/whitespace-only
    documents produce no chunks."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    s = stride or chunk_tokens
    if s < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_ts")
    ).withColumn(
        "_n",
        F.when(F.length(F.trim(F.col("_ts").getItem(0))) == 0, F.lit(0)).otherwise(
            F.size("_ts")
        ),
    )
    # chunk starts 1, 1+s, 1+2s, ... <= n  →  count = floor((n-1)/s) + 1
    base = base.filter(F.col("_n") >= 1).withColumn(
        "_k", F.floor((F.col("_n") - 1) / F.lit(s)) + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.greatest(F.col("_k"), F.lit(1))),
        lambda i: F.array_join(
            F.slice(F.col("_ts"), (i - 1) * s + 1, chunk_tokens), " "
        ),
    )
    out = base.select("doc_id", "_n", F.posexplode(chunks).alias("_i0", "text"))
    n_in_chunk = F.least(
        F.lit(chunk_tokens), F.col("_n") - F.col("_i0") * F.lit(s)
    )
    return out.select(
        "doc_id",
        F.col("_i0").cast("long").alias("chunk_idx"),
        n_in_chunk.cast("long").alias("n_tokens"),
        "text",
    )


# PII patterns chosen for identical semantics in Java regex (Spark) and
# RE2 (DuckDB oracle): character classes, bounded repetition, \b and
# non-capturing groups only — no backrefs or lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d[\d -]{7,}\d"),
]


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses, and phone-shaped digit runs —
    the pre-training redaction pass. Categories apply IN ORDER (email,
    ip, phone), each seeing the previous category's output, so an email's
    digits can't be re-matched as a phone; per-category counts reflect
    the same staged view. Returns (doc_id, text, n_email, n_ip, n_phone).
    Pure regexp column expressions — map-side, zero shuffle."""
    cur = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    return docs.select(
        F.col(id_col).alias("doc_id"), cur.alias("text"), *counts
    )


# explicit ASCII control class (not \p{Cntrl}): identical bytes-level
# meaning in Java regex, RE2, and DuckDB — engine-portable by
# construction. \t \n \r are whitespace, handled by the collapse step.
_CTRL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text): canonical text prep — Unicode NFC composition,
    ASCII control characters stripped to spaces, whitespace runs
    collapsed to single spaces, ends trimmed. The normalization every
    downstream tokenizer/dedup/n-gram step should see exactly once.

    NFC is the one step Spark has no built-in for — it runs as an
    Arrow-batched pandas_udf (vectorized transfer; unicodedata.normalize
    is the same Unicode algorithm DuckDB's nfc_normalize implements, so
    the oracle replays it exactly). The control-strip and collapse stay
    JVM-side regexp columns. No shuffle anywhere."""
    from pyspark.sql.functions import pandas_udf

    def _nfc_batch(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    _nfc = pandas_udf(_nfc_batch, "string")

    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(_nfc(F.col(text_col)), _CTRL, " "), r"\s+", " "
        )
    )
    return docs.select(F.col(id_col).alias("doc_id"), cleaned.alias("text"))


def pack_sequences(
    docs: DataFrame,
    target_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sequence packing — assign documents to fixed-token-budget training
    sequences by contiguous prefix sums over the stable corpus order
    (the concat-then-split packing every LM data loader performs):
    ``seq_id = floor(exclusive_prefix_tokens / target_tokens)``. A
    document belongs wholly to the sequence containing its FIRST token
    (a sequence may overrun the budget by less than one document — the
    consumer splits straddlers; exact byte budgets need token-level
    splitting, which ``chunk_documents`` provides upstream). Returns
    (doc_id, seq_id, n_tokens, start_tok): start_tok = the document's
    offset within its sequence.

    The exclusive prefix sum is fully distributed — the classic
    two-phase scan: range-partition on doc_id, partition-local running
    sums via an in-partition window, then one tiny per-partition totals
    table (<= #partitions rows, collected driver-side and re-emitted as
    JVM literals) provides each partition's global offset. No global
    single-task window, no data-scale driver state — the same shape as
    the engine's distributed rank helpers (functions/ranking.py)."""
    if target_tokens < 1:
        raise ValueError(f"target_tokens must be >= 1, got {target_tokens}")
    from pyspark.sql import Window

    from ..functions.ranking import _literal_df

    spark = docs.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    t = (
        docs.select(F.col(id_col).alias("doc_id"), n_tok.cast("long").alias("n_tokens"))
        .repartitionByRange(nparts, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # stable pids across the two consumers
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    psums = [
        (int(r["_pid"]), int(r["_t"]))
        for r in t.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    ]
    off, acc = [], 0
    for pid, tot in sorted(psums):
        off.append((pid, acc))
        acc += tot
    offsets = _literal_df(spark, off, [("_pid", "int"), ("_off", "long")])
    prefix = F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)) + F.col("_off")
    return (
        t.join(F.broadcast(offsets), "_pid")
        .withColumn("_pre", prefix)
        .select(
            "doc_id",
            F.floor(F.col("_pre") / F.lit(target_tokens)).cast("long").alias("seq_id"),
            "n_tokens",
            (F.col("_pre") % F.lit(target_tokens)).cast("long").alias("start_tok"),
        )
    )


def top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction by tf·idf with a LINEAR idf
    (score = tf · N / df, integer-floored): the linear form keeps the
    score exact integer arithmetic — no log(), whose last-ulp libm
    differences would defeat cross-engine verification — while
    preserving the tf-idf ranking property that corpus-ubiquitous terms
    (df → N) score near their bare tf and rare terms are boosted N/df-
    fold. Returns (doc_id, rank, term, tf, df, score): the top ``k``
    terms per document, ties broken by higher tf then codepoint order.

    Scale shape: explode → (doc, term) hash-aggregate for tf; df is a
    second aggregate over the SAME frame (distinct doc-term pairs →
    term counts — term-keyed, bounded by vocabulary size); one join on
    term (dimension-sized, broadcast-eligible) and a doc-keyed top-k
    window. No Python anywhere."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    did = F.col(id_col).alias("doc_id")
    toks = F.filter(_tokens(text_col), lambda t: F.length(t) > 0)
    pairs = docs.select(did, F.explode(toks).alias("term"))
    tf = pairs.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))  # tf rows ARE distinct pairs
    n_docs = docs.count()
    scored = tf.join(df_t, "term").withColumn(
        "score", F.floor(F.col("tf") * F.lit(int(n_docs)) / F.col("df")).cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.desc("tf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 document search with an ORDER-FREE exact scoring contract:
    per matched term the contribution is

        floor(10^6 · idf_rational(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)))

    with the rational idf (N−df+0.5)/(df+0.5) — no log(): last-ulp libm
    drift across engines would break verification — and the FLOOR taken
    PER TERM, so the document score is a sum of integers: exact,
    independent of aggregation order (a raw double sum would differ in
    the last ulp between engines/partitionings). Returns the top ``k``
    documents: (doc_id, rank, score_x1e6, n_matched); ties by doc_id.

    Scale shape: the query term list is a literal IN-filter pushed into
    the (doc, term) tf aggregate (only matching postings survive the
    map side), df/avgdl are two tiny aggregates, and the global top-k
    is a window over the per-doc scores — |q|·N_matched rows at most."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    from pyspark.sql import Window

    qt = [t.lower() for t in query_terms]
    did = F.col(id_col).alias("doc_id")
    toks = F.filter(_tokens(text_col), lambda t: F.length(t) > 0)
    base = docs.select(did, toks.alias("_ts")).withColumn("_dl", F.size("_ts"))
    n_docs = base.count()
    avgdl = base.agg(F.avg("_dl")).first()[0] or 0.0
    pairs = base.select(
        "doc_id", "_dl", F.explode("_ts").alias("term")
    ).filter(F.col("term").isin(qt))
    tf = pairs.groupBy("doc_id", "_dl", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(float(avgdl)))
    )
    per_term = tf.join(df_t, "term").withColumn(
        "_c", F.floor(F.lit(1_000_000.0) * idf * sat).cast("long")
    )
    scored = per_term.groupBy("doc_id").agg(
        F.sum("_c").alias("score_x1e6"), F.count("*").alias("n_matched")
    )
    # global top-k via TakeOrdered (per-partition k + driver merge), NOT a
    # row_number window over everything (Exchange SinglePartition of every
    # matched doc); the rank window then runs over k rows only
    top = scored.orderBy(F.desc("score_x1e6"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_x1e6"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id",
        F.col("rank").cast("long").alias("rank"),
        "score_x1e6",
        F.col("n_matched").cast("long").alias("n_matched"),
    )


def fim_transform(
    docs: DataFrame,
    rate: float = 0.5,
    key_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "psm",
    prefix_tag: str = "<fim_prefix>",
    middle_tag: str = "<fim_middle>",
    suffix_tag: str = "<fim_suffix>",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022): rewrite a
    deterministic ``rate``-share of documents into the FIM training
    format; the rest pass through verbatim.

    Two codepoint cut positions come from the repo's engine-portable
    affine-hash contract (operators/sampling._variate family) chained
    twice over the doc key — lo = h1 mod (n+1), hi = h2 mod (n+1),
    swapped into order — so the SAME document is split the SAME way in
    every run, at every parallelism, on every engine (the DuckDB oracle
    replays the transform string-for-string). Degenerate cuts (empty
    middle when lo == hi, empty prefix/suffix at the boundaries) are
    legitimate FIM samples and kept as-is, matching the paper's uniform
    character-level splitting.

    fmt='psm'  → prefix_tag P suffix_tag S middle_tag M   (the mode
    models train on: the middle comes LAST so loss flows onto it)
    fmt='spm'  → suffix_tag S prefix_tag P middle_tag M

    Pure SELECT-side expressions: the FIM decision is the hash_sample
    predicate, cuts are integer arithmetic, assembly is substring +
    concat — whole-stage codegen, zero shuffle, trivially scale-free.
    """
    from .dedup import _P
    from .sampling import _A, _B, _variate

    if fmt not in ("psm", "spm"):
        raise ValueError(f"fmt must be 'psm' or 'spm', got {fmt!r}")
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    key, text = F.col(key_col), F.col(text_col)
    n = F.length(text).cast("long")
    h = F.pmod(key.cast("long"), F.lit(_P))
    h1 = F.pmod(F.lit(_A) * h + F.lit(_B), F.lit(_P))
    h2 = F.pmod(F.lit(_A) * h1 + F.lit(_B), F.lit(_P))
    c1 = F.pmod(h1, n + 1)
    c2 = F.pmod(h2, n + 1)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    pre = F.substring(text, F.lit(1), lo.cast("int"))
    mid = F.substring(text, (lo + 1).cast("int"), (hi - lo).cast("int"))
    suf = F.substring(text, (hi + 1).cast("int"), (n - hi).cast("int"))
    if fmt == "psm":
        fim_text = F.concat(
            F.lit(prefix_tag), pre, F.lit(suffix_tag), suf, F.lit(middle_tag), mid
        )
    else:
        fim_text = F.concat(
            F.lit(suffix_tag), suf, F.lit(prefix_tag), pre, F.lit(middle_tag), mid
        )
    is_fim = _variate(key) < F.lit(float(rate))
    return docs.select(
        key.alias("doc_id"),
        is_fim.alias("fim"),
        F.when(is_fim, fim_text).otherwise(text).alias("text"),
    )


def compression_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> DataFrame:
    """Compression-ratio quality signal (the CCNet/RedPajama-class
    filter: near-incompressible text is noise/binary junk, extremely
    compressible text is boilerplate/repetition):

      doc_id, n_bytes (UTF-8), n_zlib_bytes (zlib level ``level``),
      ratio_x1e4 = floor(10^4 · compressed/original; NULL for empty)

    All exact integers — zlib output is deterministic for a given level
    and library build, so the operator is rerun- and layout-stable.
    Runs as an Arrow-batched pandas_udf (the right UDF tier: the work
    is real per-row C compute Spark has no expression for, and batching
    amortizes the Python transfer). Zero shuffle — pure map-side; at
    100 TB the cost is the scan plus one zlib pass per document.
    Not DuckDB-replayable (no zlib) — driver-gated rows-only; the exact
    pytest oracle recomputes with the same library.
    """
    from pyspark.sql.functions import pandas_udf

    def _comp_batch(s):
        import zlib

        import pandas as pd

        def one(x):
            if x is None:
                return None
            return len(zlib.compress(x.encode("utf-8"), level))

        return s.map(one).astype("Int64")

    _comp = pandas_udf(_comp_batch, "long")
    nb = F.octet_length(F.col(text_col)).cast("long")
    nz = _comp(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        nb.alias("n_bytes"),
        nz.alias("n_zlib_bytes"),
        F.when(
            nb > 0, F.floor(F.lit(10_000) * nz / nb).cast("long")
        ).alias("ratio_x1e4"),
    )


def json_field_stats(
    df: DataFrame,
    json_col: str,
    path: str,
    key_cols: list[str],
) -> DataFrame:
    """Semi-structured column aggregation: per key, (n, n_present,
    sum_val, min_val, max_val) of the INTEGER field at JSONPath
    ``path`` inside the ``json_col`` string — the typed-metadata
    pattern for opaque payload columns (transcript tool args, event
    props) without a parse UDF.

    Plan: get_json_object runs JVM-side inside the scan's codegen
    stage (Jackson streaming parse — no Python, no schema inference
    job); then ONE hash aggregate. Malformed JSON / missing field →
    null → counted in n, excluded from n_present and the value aggs
    (sum/min/max are 0 when no value is present).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    v = F.get_json_object(F.col(json_col), path).cast("long")
    return (
        df.select(*key_cols, v.alias("_v"))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("_v").alias("n_present"),
            F.coalesce(F.sum("_v"), F.lit(0)).alias("sum_val"),
            F.coalesce(F.min("_v"), F.lit(0)).alias("min_val"),
            F.coalesce(F.max("_v"), F.lit(0)).alias("max_val"),
        )
    )


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus:
    (merge_rank, left, right, merged, pair_count) — Sennrich et al.'s
    algorithm with a DETERMINISTIC tie rule (max pair count, ties to
    the lexicographically smallest (left, right)), so the learned
    merge table is a pure function of the corpus.

    Distributed shape: the corpus collapses ONCE to the distinct-word
    frequency table (corpus-scale aggregate — the only pass over the
    data); every merge round then runs on the VOCABULARY-scale frame:
    one posexplode of per-word symbol arrays into weighted bigrams, one
    hash aggregate, one 1-row driver take for the winner, one map-side
    regexp rewrite of the symbol strings (leftmost non-overlapping =
    BPE's left-to-right application), lineage cut per round. Word
    boundaries are whitespace; words never merge across boundaries.
    """
    import re as _re

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        docs.select(F.explode(_tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # symbols as a space-joined char string: " c1 c2 ... " with
        # sentinel spaces so every symbol has an exact " x y " context
        .select(
            F.concat(F.lit(" "), F.array_join(F.split(F.col("w"), ""), " "),
                     F.lit(" ")).alias("sym"),
            "cnt",
        )
        .localCheckpoint()
    )
    merges = []
    for rank in range(n_merges):
        # split once per row (projection), then zip the array against
        # its own tail — three splits per row was the round's hot cost
        syms = words.select(F.split(F.trim(F.col("sym")), " ").alias("a"), "cnt")
        pairs = (
            syms.select(
                F.explode(
                    F.slice(
                        F.arrays_zip(
                            F.col("a").alias("l"),
                            F.slice(F.col("a"), 2, 1 << 30).alias("r"),
                        ),
                        1,
                        F.greatest(F.size(F.col("a")) - 1, F.lit(0)),
                    )
                ).alias("pr"),
                "cnt",
            )
            .select(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"), "cnt")
            .groupBy("l", "r")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc()).take(1)
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((rank, l, r, l + r, int(n)))
        # zero-width lookarounds keep the shared boundary spaces so
        # " a b a b " merges BOTH pairs in one pass, while consuming
        # "l r" keeps BPE's leftmost-non-overlapping application order
        pat = f"(?<= ){_re.escape(l)} {_re.escape(r)}(?= )"
        rep = (l + r).replace("\\", "\\\\").replace("$", "\\$")
        words = words.select(
            F.regexp_replace(F.col("sym"), pat, rep).alias("sym"), "cnt"
        ).localCheckpoint()

    from ..functions.ranking import _literal_df

    return _literal_df(
        docs.sparkSession,
        merges,
        [
            ("merge_rank", "long"), ("left", "string"), ("right", "string"),
            ("merged", "string"), ("pair_count", "long"),
        ],
    )


def unigram_rarity(
    docs: DataFrame,
    rare_max_cf: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-conditioned rarity profile per document — the unigram-LM
    quality signal data pipelines threshold on (a page whose mass sits in
    hapax/garbage tokens is noise; one with no rare tokens is boilerplate).
    Unlike :func:`quality_score` (document-local), this one conditions on
    the WHOLE corpus: a token is rare when its collection frequency is
    <= ``rare_max_cf``.

    Returns (doc_id, n_tokens, n_distinct, n_rare_distinct, n_rare_tokens,
    min_cf) — integers only, so two engines agree bit-for-bit.

    Shape at scale: ONE explode pass; (doc_id, tok) hash-aggregate absorbs
    in-document repetition map-side (keys carry doc_id, so no hot key);
    collection frequencies come from re-aggregating that deduped frame by
    tok (never re-reading the corpus); the tok-keyed join back is zipf-hot
    on stopwords — AQE skew-join splits those partitions, and the payload
    is 3 longs, not text. Final per-doc aggregate re-uses the doc_id hash.
    """
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("tok"))
    )
    per = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    cf = per.groupBy("tok").agg(F.sum("cnt").alias("cf"))
    rare = F.col("cf") <= F.lit(int(rare_max_cf))
    return (
        per.join(cf, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(rare.cast("long")).cast("long").alias("n_rare_distinct"),
            F.sum(F.when(rare, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("n_rare_tokens"),
            F.min("cf").cast("long").alias("min_cf"),
        )
    )


def bigram_collocations(
    docs: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level collocation mining: adjacent-token bigrams scored by
    PMI lift = P(xy) / (P(x)·P(y)) = c_xy·N_uni²/(N_bi·c_x·c_y) — the
    monotone exp() of pointwise mutual information, kept as an exact
    ratio of counts so no transcendental enters the cross-engine compare
    (log() is the one libm call two engines never match bit-for-bit).

    Returns one row per bigram with c_xy >= min_count:
    (w1, w2, c_xy, c_x, c_y, n_uni, n_bi, lift).

    Shape at scale: bigram formation is a pure codegen array transform
    (no Python, no extra pass over text); bigram + unigram counts are two
    hash aggregates with map-side combine; totals are 1-row frames
    cross-joined (broadcast, free); the c_x/c_y decorations join AFTER the
    min_count filter, so only surviving bigrams (a vocabulary-sized set,
    not a corpus-sized one) ride the two vocab joins.
    """
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        _tokens(text_col).alias("toks")
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks)-1),"
                    " i -> struct(toks[i-1] as w1, toks[i] as w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= F.lit(int(min_count)))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = bi.sparkSession.createDataFrame([(0,)], "z: long").join(
        # total bigram count BEFORE the min_count filter must come from
        # the unfiltered stream: recompute from doc token sizes (exact,
        # one codegen agg, no second explode)
        toks.agg(
            F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("n_bi")
        ),
        how="cross",
    ).select("n_bi")
    cx = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    cy = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    out = (
        bi.join(cx, "w1")
        .join(cy, "w2")
        .join(F.broadcast(n_uni), how="cross")
        .join(F.broadcast(n_bi), how="cross")
    )
    # fixed left-to-right operation order — both engines evaluate
    # ((((c_xy * n_uni) * n_uni) / n_bi) / c_x) / c_y in IEEE doubles
    lift = (
        F.col("c_xy").cast("double")
        * F.col("n_uni").cast("double")
        * F.col("n_uni").cast("double")
        / F.col("n_bi").cast("double")
        / F.col("c_x").cast("double")
        / F.col("c_y").cast("double")
    )
    return out.select(
        "w1",
        "w2",
        F.col("c_xy").cast("long").alias("c_xy"),
        F.col("c_x").cast("long").alias("c_x"),
        F.col("c_y").cast("long").alias("c_y"),
        F.col("n_uni").cast("long").alias("n_uni"),
        F.col("n_bi").cast("long").alias("n_bi"),
        lift.alias("lift"),
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge table (:func:`learn_bpe`'s output) to
    encode documents: (doc_id, n_bpe_tokens, tokens array<string>).

    Same text model as learning: lowercase, whitespace word boundaries,
    char-level start symbols, merges applied leftmost-non-overlapping in
    rank order. The encoder iterates min-rank-present-pair-first, which
    is provably identical to sequential rank-order application (a merge
    of rank k can never create a pair of rank < k, because a pair's
    components must already exist when the pair is learned) — the pytest
    golden checks against the literal sequential model anyway.

    Scale shape: the merge table is tokenizer-sized (32k-100k rows, a
    few MB) — collected once and broadcast, NEVER joined; encoding runs
    map-side in an Arrow-batched mapInPandas with a per-batch distinct-
    word cache (zipf: most words repeat, so each distinct word encodes
    once per batch, not once per occurrence). No shuffle anywhere.
    """
    import pandas as pd

    rank_rows = merges.select("merge_rank", "left", "right").collect()
    ranks = {(r["left"], r["right"]): int(r["merge_rank"]) for r in rank_rows}
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)
    inf = float("inf")

    def _encode_batches(batches):
        rk = b_ranks.value

        def enc_word(w: str, cache: dict) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w)
            while len(syms) > 1:
                best, best_rank = None, inf
                for i in range(len(syms) - 1):
                    r = rk.get((syms[i], syms[i + 1]), inf)
                    if r < best_rank:
                        best, best_rank = (syms[i], syms[i + 1]), r
                if best is None:
                    break
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = syms
            return syms

        for pdf in batches:
            cache: dict = {}
            toks_col, n_col = [], []
            for text in pdf["text"].astype(str):
                toks: list[str] = []
                for w in text.strip().lower().split():
                    toks.extend(enc_word(w, cache))
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bpe_tokens": n_col, "tokens": toks_col}
            )

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    return src.mapInPandas(
        _encode_batches,
        schema="doc_id long, n_bpe_tokens long, tokens array<string>",
    )


def lm_bigram_surprisal(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    backoff_penalty: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality signal: score every document against a
    bigram stupid-backoff language model trained on ``train_docs``
    (default: the corpus itself). High-perplexity documents are noise;
    near-zero-perplexity ones are boilerplate — pipelines threshold on
    both tails (reference workflow analogue: the corpus-conditioned
    ranking that orders vocabularies in scripts/extract_vocabs.py:64-67,
    lifted from term level to sequence level).

    Kept INTEGER-EXACT so two engines agree bit-for-bit (log() is the
    one libm call two engines never match on): the per-bigram surprisal
    contribution is the floored inverse conditional probability
      seen bigram:        c_x div c_xy            (>= 1)
      unigram backoff:    penalty * (N_uni div c_y)
      OOV continuation:   2 * penalty * N_uni
    and the document score is the SUM of contributions — the arithmetic
    mean of inverse probabilities, the monotone exact cousin of
    exp(cross-entropy). Integers sum exactly in any order, so the
    distributed aggregate is deterministic.

    Returns (doc_id, n_bigrams, n_seen, n_backoff, n_oov, inv_prob_sum).

    Shape at scale: LM training is two hash aggregates with map-side
    combine over one explode pass of the training corpus; scoring
    aggregates the scored corpus per (doc_id, w1, w2) first (absorbs
    in-document repetition, keys carry doc_id so no hot key), then makes
    three zipf-hot dimension joins — c_xy on (w1,w2), c_x on w1, c_y on
    w2 — whose payload is counts, never text; AQE skew-join splits the
    stopword keys. N_uni rides in as a broadcast 1-row frame. The final
    per-doc aggregate reuses the doc_id hash distribution.
    """
    train = train_docs if train_docs is not None else docs
    ttoks = train.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        _tokens(text_col).alias("toks")
    )
    uni = (
        ttoks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi_lm = (
        ttoks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks)-1),"
                    " i -> struct(toks[i-1] as w1, toks[i] as w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    n_uni = ttoks.select(F.explode("toks").alias("w")).agg(
        F.count(F.lit(1)).alias("n_uni")
    )

    scored = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .filter(F.size(_tokens(text_col)) >= 2)
        .select(
            F.col(id_col).alias("doc_id"),
            _tokens(text_col).alias("toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks)-1),"
                    " i -> struct(toks[i-1] as w1, toks[i] as w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pen = F.lit(int(backoff_penalty)).cast("long")
    joined = (
        scored.join(bi_lm, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), "w2", "left")
        .crossJoin(F.broadcast(n_uni))
    )
    seen = F.col("c_xy").isNotNull()
    backoff = (~seen) & F.col("c_y").isNotNull()
    # `div` is exact 64-bit integer division (F.floor(a/b) routes through a
    # double and can round up across a ulp at large counts)
    contrib = (
        F.when(seen, F.expr("c_x div c_xy"))
        .when(backoff, pen * F.expr("n_uni div c_y"))
        .otherwise(F.lit(2).cast("long") * pen * F.col("n_uni"))
    )
    return joined.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.sum(F.when(seen, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("n_seen"),
        F.sum(F.when(backoff, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("n_backoff"),
        F.sum(F.when(~seen & ~backoff, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("n_oov"),
        F.sum(F.col("cnt") * contrib).cast("long").alias("inv_prob_sum"),
    )


def vote_quality_classifier(
    docs: DataFrame,
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Binary model-based quality filter (the fasttext-style
    curated-vs-crawl classifier data pipelines gate on), as an
    INTEGER-EXACT token-vote surrogate: every token of a document votes
    for the class where its add-one-smoothed relative frequency is
    higher, and the document is classified by the (multiplicity-
    weighted) majority.

    A token w votes positive iff
        (c_w_pos + 1) * (N_neg + V) > (c_w_neg + 1) * (N_pos + V)
    — the exact cross-multiplied form of the smoothed naive-Bayes
    per-token likelihood ratio, so no log()/exp() enters the compare
    and two engines agree bit-for-bit (same reasoning as
    :func:`lm_bigram_surprisal`). V is the union vocabulary size.

    Returns (doc_id, n_tokens, votes_pos, votes_neg, pred) with
    pred = 1 iff votes_pos > votes_neg.

    Shape at scale: class counts are one hash aggregate per side over an
    explode pass (map-side combine); scoring aggregates the corpus per
    (doc_id, w) first, then two zipf-hot count joins (payload: longs);
    the N/V totals ride in as one broadcast 1-row frame; the final
    per-doc aggregate reuses the doc_id hash distribution. Overflow-safe
    by construction for corpora up to ~2^31 tokens per class (the cross
    product stays under 2^63); beyond that, scale counts down.
    """
    def _counts(d):
        return (
            d.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.explode(_tokens(text_col)).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    cp = _counts(pos_docs)
    cn = _counts(neg_docs)
    totals = F.broadcast(
        cp.agg(F.sum("c").alias("n_pos")).crossJoin(
            cn.agg(F.sum("c").alias("n_neg"))
        ).crossJoin(
            cp.select("w").union(cn.select("w")).distinct().agg(
                F.count(F.lit(1)).alias("v")
            )
        )
    )

    per = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    joined = (
        per.join(cp.select(F.col("w"), F.col("c").alias("c_pos")), "w", "left")
        .join(cn.select(F.col("w"), F.col("c").alias("c_neg")), "w", "left")
        .crossJoin(totals)
    )
    lhs = (F.coalesce("c_pos", F.lit(0)) + 1) * (F.col("n_neg") + F.col("v"))
    rhs = (F.coalesce("c_neg", F.lit(0)) + 1) * (F.col("n_pos") + F.col("v"))
    out = joined.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.when(lhs > rhs, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("votes_pos"),
        F.sum(F.when(lhs < rhs, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("votes_neg"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "votes_pos",
        "votes_neg",
        F.when(F.col("votes_pos") > F.col("votes_neg"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pred"),
    )
