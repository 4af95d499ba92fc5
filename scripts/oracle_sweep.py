"""Cross-engine oracle sweep at an arbitrary scale factor.

The driver's correctness gate compares every `__spark_entry__.queries()`
entry against its `oracle_sql()` DuckDB twin at sf=0.01. Several
operators switch physical strategy with data size (size-gated broadcast
vs shuffle joins in the dictionary encode, hub salting, downcast
probes), so passing at one size does not exercise the other branch —
this sweep re-runs the full comparison at any sf directory (default
sf0.1, where the large-side branches engage).

Usage: oracle_sweep.py [SF_DIR] [NAME ...]   (no names = all oracles)
Exit 0 iff every compared entry matches rows+columns+values.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from rdf_indexes_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or sorted(entry_mod.oracle_sql())
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(cores=cpus, shuffle_partitions=2 * cpus, driver_memory="8g")
    con = duckdb.connect()
    for t in entry_mod.SF_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for name in names:
        t0 = time.monotonic()
        try:
            got = qs[name](spark, sf_dir).toPandas()
            want = con.execute(osql[name]).df()
            cols = sorted(got.columns)
            ok = cols == sorted(want.columns) and len(got) == len(want)
            if ok:
                a = got[cols].sort_values(cols).reset_index(drop=True)
                b = want[cols].sort_values(cols).reset_index(drop=True)
                for c in cols:
                    if a[c].dtype == object:
                        a[c], b[c] = a[c].astype(str), b[c].astype(str)
                    elif a[c].dtype.kind == "f":
                        a[c] = a[c].round(9)
                        b[c] = b[c].astype("float64").round(9)
                    else:
                        b[c] = b[c].astype(a[c].dtype)
                ok = a.equals(b)
            print(
                f"{name}: rows {len(got)}/{len(want)} "
                f"{'OK' if ok else 'MISMATCH'} ({time.monotonic() - t0:.1f}s)",
                flush=True,
            )
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — sweep must report, not die
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}", flush=True)
            fails.append(name)
    print("FAILS:", fails, flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
