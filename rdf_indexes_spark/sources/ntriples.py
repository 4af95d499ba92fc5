"""N-Triples / N-Quads ingestion (SURVEY.md A2's literal form).

The reference parses its RDF input with hand-rolled scanners
(/root/reference/scripts/rdf_parser.py:12-73 parse_nt, :75-151 parse_nq,
driven by map_dataset.py:3,48 and extract_vocabs.py) whose term semantics
we reproduce exactly so vocabulary terms byte-match:

parse_nt:
  - subject / predicate: the URI between ``<`` ``>`` (brackets stripped);
  - object: URI between ``<`` ``>`` if bracketed, else — "HDT takes
    everything left" — from the opening quote through the end of line
    with the trailing `` .`` terminator removed (quotes, language tags
    and datatype suffixes KEPT, rdf_parser.py:46-51,67-70).

parse_nq:
  - subject / predicate: bracketed URI, or a bare token up to the next
    space (rdf_parser.py:90-106: match_required toggles);
  - object: bracketed URI, or the content BETWEEN quotes (tags dropped,
    rdf_parser.py:131-144), or a bare token;
  - a trailing graph component is ignored (never scanned).

Execution is one compiled-regex pass per Arrow batch over
``spark.read.text`` lines (gzip transparent — the A1 source seam), fully
vectorized via pandas .str.extract: no per-row Python. Lines that do not
match are dropped (the reference exit()s on malformed input; a 100 TB
ingest must not — count them via ``with_malformed=True`` instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# NT: anchored full-line; literal objects keep quotes + tags, lazy up to
# the " ." line terminator.
NT_RE = (
    r'^\s*<(?P<su>[^>]*)>\s+<(?P<pu>[^>]*)>\s+'
    r'(?:<(?P<ou>[^>]*)>|(?P<ol>".*?))\s*\.\s*$'
)
# NQ: bare tokens allowed everywhere; literal objects are the text BETWEEN
# quotes; anything after the object (graph term, terminator) is ignored.
NQ_RE = (
    r'^\s*(?:<(?P<su>[^>]*)>|(?P<sb>[^<\s][^\s]*))\s+'
    r'(?:<(?P<pu>[^>]*)>|(?P<pb>[^<\s][^\s]*))\s+'
    r'(?:<(?P<ou>[^>]*)>|"(?P<ol>[^"]*)"|(?P<ob>[^<"\s][^\s]*))'
)


def parse_rdf_lines(lines: DataFrame, fmt: str = "nq", with_malformed: bool = False) -> DataFrame:
    """(value: string) → (s, p, o string, line_no long[, malformed]).

    line_no is the EXACT corpus-scan line number under the multi-file
    contract "files concatenate in NAME order" (the same contract
    export_text / export_vocab_text write under): line_no = (name,
    block-offset)-ordered prefix-sum of per-split line counts + the
    line's ordinal within its split. monotonically_increasing_id would
    NOT do — Spark packs file splits into partitions by SIZE, so
    partition-ordinal order diverges from name order on multi-file
    corpora, scrambling the reference's first-occurrence frequency
    tie-break.

    Within-SPLIT ordinals come from a per-(file, block_start) running
    counter in the parse UDF: one split is read by exactly one task, its
    lines in byte order, and the line-reader rule (every non-first split
    skips up to and past its first newline, reads past its end to finish
    the last line — so a line starting exactly AT a boundary belongs to
    the PRECEDING split) partitions the lines of a file exactly across
    its splits. Keying the counter by ``_metadata.file_block_start``
    (not just the file) therefore makes the numbering correct even when
    the planner SPLITS a large plain-text file across tasks
    (maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes/parallelism)) — usually far below maxPartitionBytes, so
    splitting is the norm, not the exception). Compressed (.gz/.zst)
    files are one block each and take the same path. Because the
    boundary rule lives in the reader, per-split counts MUST come from a
    scan under the same rule (below), never from byte offsets.

    The per-split line counts intentionally come from a SECOND scan of
    ``lines`` (no regex, count only): the alternative — persisting the
    parsed frame to derive counts from one scan — caches a corpus-sized
    frame during ingest, which inverts at the 100 TB target (storage
    write+read of the whole corpus costs more than a cheap re-scan; for
    .gz it does mean a second gunzip pass, the price of bounded memory).
    """
    import pandas as pd

    pat = NT_RE if fmt == "nt" else NQ_RE

    def parse(iterator):
        import re as _re

        rx = _re.compile(pat)
        seen: dict[tuple, int] = {}  # per-(file, block) running count (this task)
        for pdf in iterator:
            ext = pdf["value"].str.extract(rx)
            s = ext["su"] if "sb" not in ext else ext["su"].fillna(ext["sb"])
            p = ext["pu"] if "pb" not in ext else ext["pu"].fillna(ext["pb"])
            o = ext["ou"].fillna(ext["ol"])
            if "ob" in ext:
                o = o.fillna(ext["ob"])
            out = pd.DataFrame({"s": s, "p": p, "o": o})
            out["malformed"] = out["s"].isna() | out["p"].isna() | out["o"].isna()
            keys = list(zip(pdf["_f"], pdf["_b"]))
            base = {k: seen.get(k, 0) for k in set(keys)}
            kser = pd.Series(keys, index=pdf.index)
            out["_f"] = pdf["_f"]
            out["_b"] = pdf["_b"]
            out["_i"] = kser.groupby(kser).cumcount() + kser.map(base)
            for k, cnt in kser.value_counts().items():
                seen[k] = base[k] + int(cnt)
            yield out

    src = lines.select(
        "value",
        F.input_file_name().alias("_f"),
        F.col("_metadata.file_block_start").alias("_b"),
    )
    parsed = src.mapInPandas(
        parse,
        schema="s string, p string, o string, malformed boolean, _f string, _b long, _i long",
    )
    # (name, block-offset)-ordered per-split offsets (the read_vocab_text
    # pattern): the window runs over ONE row per SPLIT, never data-sized.
    from pyspark.sql import Window

    # counts scan from the SAME projected child as the parse scan (same
    # relation, same conf → same split plan). The two scans still run as
    # separate jobs; if the cluster's parallelism changes between them
    # (dynamic allocation at cloud scale) split boundaries could drift,
    # so the join is LEFT with a runtime assert_true instead of an inner
    # join that would silently DROP rows whose (file, block) key has no
    # offset — numbering must fail loudly, never lose triples.
    counts = src.groupBy("_f", "_b").agg(F.count("*").alias("_n"))
    w = Window.orderBy("_f", "_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w), F.lit(0))).drop("_n")
    parsed = (
        parsed.join(F.broadcast(offs), ["_f", "_b"], "left")
        .withColumn(
            "_drift",
            F.assert_true(
                F.col("_off").isNotNull(),
                F.lit("line_no split-plan drift: parse and count scans disagree on file splits"),
            ),
        )
        .withColumn("line_no", (F.col("_off") + F.col("_i")).cast("long"))
        .drop("_f", "_b", "_i", "_off", "_drift")
    )
    if with_malformed:
        return parsed
    return parsed.filter(~F.col("malformed")).drop("malformed")


def read_ntriples(
    spark: SparkSession, path: str, fmt: str = "nq", with_malformed: bool = False
) -> DataFrame:
    """Read .nt/.nq (plain or .gz) files into (s, p, o, line_no).

    No splittability precondition: line numbering is keyed by
    (file, block_start), so large plain-text files split across tasks
    number correctly (see parse_rdf_lines)."""
    return parse_rdf_lines(spark.read.text(path), fmt=fmt, with_malformed=with_malformed)


def rdf_to_mentions(parsed: DataFrame) -> DataFrame:
    """Adapt parsed RDF triples to the canonical-mention schema the encode
    operators consume (cs, pred, co + the corpus-position columns used for
    the frequency tie-break). RDF corpora skip linking/canonicalization —
    the reference's pipeline is parse → vocab → map with no entity
    resolution (scripts/process.sh) — so parsed terms ARE canonical.

    The line number rides in conv_id as a zero-padded string (lex order
    == numeric order); the vocab builders order corpus positions by the
    (conv_id, turn_idx, mention_idx) struct directly, so any string
    shape/magnitude is fine."""
    return parsed.select(
        F.lpad(F.col("line_no").cast("string"), 20, "0").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit(0).alias("mention_idx"),
        F.col("s").alias("cs"),
        F.col("p").alias("pred"),
        F.col("o").alias("co"),
    )
