"""SQL-surface catalog: register the engine's tables as temp views so
every operator's inputs — the benchmark testdata tables and a built
index (permutations, stats, vocabularies) — are reachable from plain
``spark.sql(...)``.

The reference is a library + CLI with no SQL surface; this is the
Spark-idiomatic equivalent of its "load index, then query" workflow
(/root/reference/src/queries.cpp:164-227): after
``register_index(spark, "idx/")`` a user writes

    SELECT s, p, o FROM idx_spo WHERE s = 42 AND p = 7

and gets the same partition-pruned, filter-pushed scan the router's
``select()`` builds — Catalyst sees the identical parquet relation, so
the plan quality is the router's, not a degraded copy.

Temp views are session-scoped metadata only: registering costs no scan
and no data movement, and each query still prunes partitions/pushes
filters per its own predicates.
"""

from __future__ import annotations

import os
from operator import index as _as_int

from pyspark.sql import DataFrame, SparkSession

SF_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_testdata(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every ``<sf_dir>/<table>.parquet`` as a temp view
    ``<prefix><table>``. Returns the view names registered (tables whose
    file is absent are skipped, so partial test fixtures work)."""
    out: list[str] = []
    for t in SF_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        name = f"{prefix}{t}"
        spark.read.parquet(path).createOrReplaceTempView(name)
        out.append(name)
    return out


def register_index(spark: SparkSession, index_dir: str, prefix: str = "idx_") -> list[str]:
    """Register a CLI-built index directory as SQL views:

    - ``<prefix><perm>`` (e.g. ``idx_spo``) — one view per materialized
      permutation, columns (s, p, o) in canonical order (the reference's
      triplets_iterator reorder, include/util_types.hpp:80-110);
    - ``<prefix>stats`` — the 7-count stats row (parameters.hpp:13-29);
    - ``<prefix>vocab_{s,p,o}`` — (term, id) from the reference-format
      term-per-line vocab files when present (``vocabs/<role>_vocab``).

    Works on full (5p) and reduced (3t/2tp/2to) variants alike — only
    the permutations actually materialized become views.
    """
    from .operators.permutations import read_permutations_unified

    out: list[str] = []
    perms_dir = os.path.join(index_dir, "perms5")
    if not os.path.isdir(perms_dir):
        perms_dir = os.path.join(index_dir, "perms", "perms5")
    tables = read_permutations_unified(spark, perms_dir)
    for perm, df in tables.items():
        name = f"{prefix}{perm}"
        df.createOrReplaceTempView(name)
        out.append(name)
    stats_dir = os.path.join(index_dir, "stats")
    if os.path.isdir(stats_dir):
        spark.read.parquet(stats_dir).createOrReplaceTempView(f"{prefix}stats")
        out.append(f"{prefix}stats")
    from .operators.permutations import read_vocab_text

    for role in ("s", "p", "o"):
        vdir = os.path.join(index_dir, "vocabs", f"{role}_vocab")
        if os.path.exists(vdir):
            read_vocab_text(spark, vdir).createOrReplaceTempView(f"{prefix}vocab_{role}")
            out.append(f"{prefix}vocab_{role}")
    return out


def sql_pattern(spark: SparkSession, prefix: str, s=None, p=None, o=None) -> DataFrame:
    """The router's pattern-selection contract, phrased as SQL against
    the registered views — demonstrates (and tests) that the SQL surface
    reaches the same partition-pruned plan as plans/router.select."""
    from .plans.router import route

    perm = route(s, p, o).perm
    # bound terms are dictionary-encoded integer ids by contract; enforce
    # it before interpolating into the SQL string (a string-typed term
    # would otherwise break the query or inject SQL into the session).
    # operator.index, not int(): int(5.7) would silently truncate to the
    # WRONG id and return id-5's triples; index() rejects non-integral
    # types outright while accepting int/numpy-int ids.
    conds = [
        f"{c} = {_as_int(v)}" for c, v in (("s", s), ("p", p), ("o", o)) if v is not None
    ]
    if prefix and not prefix.replace("_", "").isalnum():
        raise ValueError(f"prefix must be a bare view-name prefix, got {prefix!r}")
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    return spark.sql(f"SELECT s, p, o FROM {prefix}{perm}{where}")
