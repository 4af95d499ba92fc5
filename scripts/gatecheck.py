"""Local replica of the driver's oracle gate: run queries() vs oracle_sql()
at a given sf and compare row counts + sorted-by-column-name value sets.
Usage: python scripts/gatecheck.py [sf_dir] [key ...]   (default: all keys)"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    keys = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-gatecheck")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in E.SF_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, osql = E.queries(), E.oracle_sql()
    todo = keys or list(qs)
    fails = 0
    for k in todo:
        if k not in qs:
            print(f"{k}: UNKNOWN KEY"); fails += 1; continue
        sdf = qs[k](spark, sf_dir).toPandas()
        if k not in osql:
            print(f"{k}: rows-only ({len(sdf)} rows)"); continue
        odf = con.execute(osql[k]).fetchdf()
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)} vs {len(odf)}")
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            status.append(f"SCHEMA {scols} vs {ocols}")
        else:
            a = sdf[scols].sort_values(scols).reset_index(drop=True)
            b = odf[ocols].sort_values(ocols).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=True)
            except AssertionError as e:
                status.append("VALUES/DTYPES: " + str(e).split("\n")[0] + " | " + " ".join(str(e).split("\n")[1:3]))
        print(f"{k}: {'OK ' + str(len(sdf)) + ' rows' if not status else 'FAIL ' + '; '.join(status)}")
        fails += bool(status)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
