"""Round-driver simulation: runs __spark_entry__ queries vs DuckDB oracles.

Usage: python /tmp/driver_sim.py [query_name ...]   (default: all)
Env: SIM_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import importlib.util
import os
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")
from kafka_connect_bigquery_storage_write_spark.harness_canon import rowset  # noqa: E402

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = mod.entry(spark)
    erows = e.collect()
    print(f"entry: {len(erows)} rows, cols={e.columns}")
    assert len(erows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    names = sys.argv[1:] or list(qs)
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if name not in oracles:
                print(f"{name}: rows_only {len(srows)} rows")
                n_rows_only += 1
                continue
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
            ok_cols = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            ok_vals = ok_cols and ok_rows and rowset(srows, scols) == rowset(drows, dcols)
            if ok_vals:
                print(f"{name}: OK ({len(srows)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"{name}: FAIL cols_match={ok_cols} rows {len(srows)}/{len(drows)}")
                if ok_cols and ok_rows:
                    s, d = rowset(srows, scols), rowset(drows, dcols)
                    diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
                    for a, b in diffs:
                        print(f"  spark={a}\n  duck ={b}")
                else:
                    print(f"  spark cols {scols}\n  duck cols {dcols}")
        except Exception:
            n_fail += 1
            print(f"{name}: ERROR")
            traceback.print_exc(limit=3)
    print(f"\nsummary: pass={n_pass} rows_only={n_rows_only} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
