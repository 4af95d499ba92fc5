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

import os

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
    export_text / export_vocab_text write under): line_no = name-ordered
    prefix-sum of per-file line counts + the line's ordinal within its
    file. monotonically_increasing_id would NOT do — Spark packs file
    splits into partitions by SIZE, so partition-ordinal order diverges
    from name order on multi-file corpora, scrambling the reference's
    first-occurrence frequency tie-break.

    Within-file ordinals come from a per-(task, file) running counter in
    the parse UDF: a FilePartition reads its files sequentially, so rows
    of one file are contiguous in one task — PROVIDED no single file is
    split across tasks. read_ntriples enforces that precondition
    driver-side (gz is never splittable; plain text must fit
    spark.sql.files.maxPartitionBytes).
    """
    import pandas as pd

    pat = NT_RE if fmt == "nt" else NQ_RE

    def parse(iterator):
        import re as _re

        rx = _re.compile(pat)
        seen: dict[str, int] = {}  # per-file running line count (this task)
        for pdf in iterator:
            ext = pdf["value"].str.extract(rx)
            s = ext["su"] if "sb" not in ext else ext["su"].fillna(ext["sb"])
            p = ext["pu"] if "pb" not in ext else ext["pu"].fillna(ext["pb"])
            o = ext["ou"].fillna(ext["ol"])
            if "ob" in ext:
                o = o.fillna(ext["ob"])
            out = pd.DataFrame({"s": s, "p": p, "o": o})
            out["malformed"] = out["s"].isna() | out["p"].isna() | out["o"].isna()
            fnames = pdf["_f"]
            base = {f: seen.get(f, 0) for f in fnames.unique()}
            out["_f"] = fnames
            out["_i"] = fnames.groupby(fnames).cumcount() + fnames.map(base)
            for f, cnt in fnames.value_counts().items():
                seen[f] = base[f] + int(cnt)
            yield out

    parsed = lines.select("value", F.input_file_name().alias("_f")).mapInPandas(
        parse, schema="s string, p string, o string, malformed boolean, _f string, _i long"
    )
    # name-ordered per-file offsets (the read_vocab_text pattern): the
    # window runs over ONE row per input FILE, never data-sized.
    from pyspark.sql import Window

    counts = lines.groupBy(F.input_file_name().alias("_f")).agg(F.count("*").alias("_n"))
    w = Window.orderBy("_f").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w), F.lit(0))).drop("_n")
    parsed = (
        parsed.join(F.broadcast(offs), "_f")
        .withColumn("line_no", (F.col("_off") + F.col("_i")).cast("long"))
        .drop("_f", "_i", "_off")
    )
    if with_malformed:
        return parsed
    return parsed.filter(~F.col("malformed")).drop("malformed")


# codecs Hadoop cannot split: a .gz/.zst file is always one task, so the
# per-task line counter in parse_rdf_lines is exact for them at any size.
_UNSPLITTABLE = (".gz", ".zst", ".snappy", ".lz4", ".deflate")

_SIZE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    """Spark size-string ('32m', '128mb', '134217728') → bytes."""
    s = str(v).strip().lower().removesuffix("b")
    if s and s[-1] in _SIZE_SUFFIX:
        return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
    return int(s)


def read_ntriples(
    spark: SparkSession, path: str, fmt: str = "nq", with_malformed: bool = False
) -> DataFrame:
    """Read .nt/.nq (plain or .gz) files into (s, p, o, line_no)."""
    lines = spark.read.text(path)
    # line_no precondition (see parse_rdf_lines): no file may be split
    # across tasks. Compressed files never are; a plain-text file is split
    # iff it exceeds maxPartitionBytes — check the listing driver-side
    # (local paths only; remote stores should ingest compressed shards).
    max_bytes = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    for f in lines.inputFiles():
        if f.startswith("file:") and not f.endswith(_UNSPLITTABLE):
            local = f[len("file:"):]
            while local.startswith("//"):
                local = local[1:]
            try:
                size = os.path.getsize(local)
            except OSError:
                continue
            if size > max_bytes:
                raise ValueError(
                    f"{f} ({size}B) exceeds spark.sql.files.maxPartitionBytes "
                    f"({max_bytes}B) and would be split across tasks, breaking "
                    "stable line numbering — raise maxPartitionBytes or ingest "
                    "compressed (.gz) shards"
                )
    return parse_rdf_lines(lines, fmt=fmt, with_malformed=with_malformed)


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
