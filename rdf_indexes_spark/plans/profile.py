"""Per-level index microbench — the Spark analog of the reference's
`./profile` driver (/root/reference/benchmark/profile.cpp:40-288), which
reports, for every trie level of every permutation: nodes bits-per-triple
and scan / access / find rates, as json lines.

Mapping to our physical layout (one sorted Parquet table per permutation,
columns c1,c2,c3 = the permutation's sort keys):

  trie level k          -> column ck of the sorted table. The trie stores
                           each level-2 node once per distinct (1st,2nd)
                           pair; Parquet's RLE/dictionary encoding of the
                           sorted ck column compresses the same repeats,
                           so per-COLUMN compressed bytes are the honest
                           nodes_bpt analog (footer column-chunk sizes).
  scan  (ns/int)        -> sequential enumeration of that column alone
                           (columnar scan reads just ck), per value.
  access (musec/query)  -> pointer access + range materialization: for n
                           sampled prefixes (level 2: c1; level 3:
                           (c1,c2)) enumerate the prefix's range — the
                           trie's pointers[i] -> contiguous child slice
                           (profile.cpp "access" walks positions obtained
                           the same way).
  find  (musec/query)   -> membership probe of the sampled value inside
                           its prefix range (level 2: (c1,c2); level 3:
                           (c1,c2,c3)) — trie nodes.find
                           (include/trie_level.hpp binary search; here a
                           broadcast semi-join with pushed filters).

One deliberate deviation, stated in the output: the reference times a
driver LOOP of single queries (it measures one in-memory pointer chase);
a Spark job per probe would measure the scheduler, not the engine, so
access/find run all n probes as ONE batched job and report the amortized
per-query rate — the same execution shape the a7 batched querylog uses.
Timings are min-of-`runs` (the reference keeps the min of 5 runs too),
with the reference's ADAPTIVE repetition rule (src/queries.cpp:10-17:
repeat until ~10k query iterations total) applied per run: small probe
sets re-execute the batched job `reps_per_run` times and report the
amortized time, so tiny workloads measure the engine, not jitter.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.permutations import PERM_IDS, PERM_ORDERS

_LEVEL_COLS = {1: ["c1"], 2: ["c1", "c2"], 3: ["c1", "c2", "c3"]}


def _column_bytes(perm_dir: str) -> dict[str, int]:
    """Compressed bytes per column from the Parquet footers (no data read)."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for dirpath, _, files in os.walk(perm_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dirpath, fn)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema.split(".")[0]
                    out[name] = out.get(name, 0) + col.total_compressed_size
    return out


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _num_reps(runs: int, n: int, target: int = 10_000, max_reps: int = 8) -> int:
    """Adaptation of the reference's repetition rule (src/queries.cpp:10-17).
    The reference computes ceil(10000/n) repetitions PER RUN; here the
    ~10k-iteration target is deliberately AMORTIZED across the whole
    min-of-runs loop (reps = target / (n * runs)), so with runs=3 a small
    workload gets ~3x fewer repetitions than the literal per-run rule —
    an intentional deviation, because one repetition here is a whole
    Spark job (~0.5s of scheduler dispatch), not a ~µs in-memory probe.
    CAPPED at max_reps: past a handful of jobs the min-of-runs is already
    jitter-free, while the literal 10k/n rule would turn a 4-probe run
    into 2500 jobs."""
    return min(max_reps, max(1, target // max(1, n * max(1, runs))))


def _timed(runs: int, fn, reps: int = 1) -> float:
    """min-of-runs wall time of fn; with reps>1 each run executes fn
    reps times and reports the amortized single-execution time."""
    best = float("inf")
    for _ in range(max(1, runs)):
        t0 = time.monotonic()
        for _ in range(reps):
            fn()
        best = min(best, (time.monotonic() - t0) / reps)
    return best


def profile_index(
    spark: SparkSession,
    index_dir: str,
    num_queries: int = 1000,
    runs: int = 3,
    perms: tuple[str, ...] | None = None,
) -> list[dict]:
    """json-lines-shaped rows, one per (permutation, level), mirroring
    profile.cpp's stats fields."""
    from ..functions.ranking import _literal_df
    from .querylog import sample_querylog

    perms_dir = os.path.join(index_dir, "perms5")
    raw = spark.read.parquet(perms_dir)  # c1,c2,c3 (+ perm partition col)
    stats_rows: list[dict] = []
    for name in perms or tuple(PERM_ORDERS):
        pid = PERM_IDS[name]
        pdir = os.path.join(perms_dir, f"perm={pid}")
        if not os.path.isdir(pdir):
            continue
        table = raw.filter(F.col("perm") == pid)
        n_rows = table.count()
        if n_rows == 0:
            continue
        col_bytes = _column_bytes(pdir)
        # sampled probe triples come from THIS permutation (already in its
        # component order), like profile.cpp permuting the query file
        probes = sample_querylog(
            table.select(
                F.col("c1").alias("s"), F.col("c2").alias("p"), F.col("c3").alias("o")
            ),
            n=num_queries,
        )
        for level in (2, 3):
            cols = _LEVEL_COLS[level]
            node_col = cols[-1]
            bpt = col_bytes.get(node_col, 0) * 8.0 / n_rows
            scan_sec = _timed(runs, lambda c=node_col: _noop(table.select(c)))
            # access: prefix -> enumerate its contiguous range
            prefix = cols[:-1]
            pk = _literal_df(
                spark,
                sorted({tuple(t[: len(prefix)]) for t in probes}),
                [(c, "long") for c in prefix],
            )
            reps = _num_reps(runs, len(probes))
            acc_sec = _timed(
                runs,
                lambda pk=pk, prefix=prefix: _noop(
                    table.join(
                        F.broadcast(pk),
                        [table[c].cast("long") == pk[c] for c in prefix],
                    ).select(*[table[c] for c in _LEVEL_COLS[level]])
                ),
                reps=reps,
            )
            # find: value membership inside its prefix range
            fk = _literal_df(
                spark,
                sorted({tuple(t[: len(cols)]) for t in probes}),
                [(c, "long") for c in cols],
            )
            find_sec = _timed(
                runs,
                lambda fk=fk, cols=cols: _noop(
                    table.join(
                        F.broadcast(fk),
                        [table[c].cast("long") == fk[c] for c in cols],
                        "left_semi",
                    ).select(F.lit(1))
                ),
                reps=reps,
            )
            stats_rows.append(
                {
                    "trie": str(pid),
                    "perm": name,
                    "level": str(level),
                    "nodes_bpt": round(bpt, 3),
                    "scan_ns_per_int": round(scan_sec * 1e9 / n_rows, 2),
                    "access_musec_per_query": round(acc_sec * 1e6 / max(1, len(probes)), 2),
                    "find_musec_per_query": round(find_sec * 1e6 / max(1, len(probes)), 2),
                    "num_queries": len(probes),
                    "runs": runs,
                    "reps_per_run": reps,
                    "execution": "batched-single-job (amortized per query)",
                }
            )
    return stats_rows
