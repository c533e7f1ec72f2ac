"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf, compare row count,
column names, and order-insensitive values."""
import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from monocator_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
print(f"{len(qs)} queries, {len(os_)} oracles, sf_dir={SF_DIR}")
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.monotonic()
    try:
        got = fn(spark, SF_DIR).toPandas()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
        continue
    el = time.monotonic() - t0
    if name not in os_:
        print(f"ok?  {name}: rows-only ({len(got)} rows, {el:.1f}s)")
        continue
    try:
        exp = con.execute(os_[name]).df()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: duckdb error {e}")
        continue
    g, x = canon(got), canon(exp)
    if list(g.columns) != list(x.columns):
        fails.append(name)
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
        continue
    if len(g) != len(x):
        fails.append(name)
        print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
        continue
    if not g.equals(x):
        neq = (g != x).any(axis=0)
        # tolerate dtype-only mismatches by comparing as strings
        if g.astype(str).equals(x.astype(str)):
            print(f"ok   {name}: values match (dtype diff) {len(g)} rows {el:.1f}s")
            continue
        fails.append(name)
        bad = [c for c in g.columns if not g[c].astype(str).equals(x[c].astype(str))]
        print(f"FAIL {name}: value mismatch in {bad}")
        for c in bad[:2]:
            m = g[c].astype(str) != x[c].astype(str)
            print("  got:", g.loc[m, bad].head(3).to_dict("records"))
            print("  exp:", x.loc[m, bad].head(3).to_dict("records"))
        continue
    print(f"ok   {name}: {len(g)} rows match exactly ({el:.1f}s)")

print("RESULT:", "ALL PASS" if not fails else f"FAILURES: {fails}")
spark.stop()
sys.exit(1 if fails else 0)
