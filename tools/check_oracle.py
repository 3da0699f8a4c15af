"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf_dir, run its oracle_sql() in DuckDB over the same
parquet, compare row count + column names/dtypes + order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: "<NULL>" if v is None else str(v))
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from etl_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        odf = con.execute(oracles[name]).df()
        a, b = norm(sdf), norm(odf)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs oracle {len(b)}")
            failed.append(name)
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols {list(a.columns)} vs {list(b.columns)}")
            failed.append(name)
            continue
        if not a.equals(b):
            neq = ~((a == b) | (a.isna() & b.isna())).all(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ")
            print("spark:", a[neq].head(3).to_dict("records"))
            print("oracle:", b[neq].head(3).to_dict("records"))
            failed.append(name)
            continue
        print(f"ok   {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
