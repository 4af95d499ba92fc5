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

    line_no is the stable corpus-scan position (partition-ordinal order ==
    byte order of the input splits), carried so downstream vocab building
    reproduces the reference's first-occurrence tie-break.
    """
    import pandas as pd

    pat = NT_RE if fmt == "nt" else NQ_RE

    def parse(iterator):
        import re as _re

        rx = _re.compile(pat)
        for pdf in iterator:
            ext = pdf["value"].str.extract(rx)
            s = ext["su"] if "sb" not in ext else ext["su"].fillna(ext["sb"])
            p = ext["pu"] if "pb" not in ext else ext["pu"].fillna(ext["pb"])
            o = ext["ou"].fillna(ext["ol"])
            if "ob" in ext:
                o = o.fillna(ext["ob"])
            out = pd.DataFrame({"s": s, "p": p, "o": o})
            out["malformed"] = out["s"].isna() | out["p"].isna() | out["o"].isna()
            yield out

    parsed = (
        lines.select("value")
        .mapInPandas(parse, schema="s string, p string, o string, malformed boolean")
        .withColumn("line_no", F.monotonically_increasing_id())
    )
    if with_malformed:
        return parsed
    return parsed.filter(~F.col("malformed")).drop("malformed")


def read_ntriples(
    spark: SparkSession, path: str, fmt: str = "nq", with_malformed: bool = False
) -> DataFrame:
    """Read .nt/.nq (plain or .gz) files into (s, p, o, line_no)."""
    return parse_rdf_lines(spark.read.text(path), fmt=fmt, with_malformed=with_malformed)


def rdf_to_mentions(parsed: DataFrame) -> DataFrame:
    """Adapt parsed RDF triples to the canonical-mention schema the encode
    operators consume (cs, pred, co + the corpus-position columns used for
    the frequency tie-break). RDF corpora skip linking/canonicalization —
    the reference's pipeline is parse → vocab → map with no entity
    resolution (scripts/process.sh) — so parsed terms ARE canonical.

    The line ordinal rides in conv_id as a zero-padded string (lex order
    == numeric order): monotonically_increasing_id values carry partition
    bits far beyond the packed-position widths of encode._attach_pos,
    whereas conv_id is rank-normalized there for ANY string shape."""
    return parsed.select(
        F.lpad(F.col("line_no").cast("string"), 20, "0").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit(0).alias("mention_idx"),
        F.col("s").alias("cs"),
        F.col("p").alias("pred"),
        F.col("o").alias("co"),
    )
