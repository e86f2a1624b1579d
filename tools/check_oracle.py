#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Dev-only tool (NOT part of the Scala library): after `sbt "runMain
graft.Verify <sfDir> <outDir>"`, this compares each <outDir>/<name>
parquet result against its oracle SQL from oracle_sql.json executed by
DuckDB over the same sf tables. Rows and columns are sorted before
comparison; floats compared with tolerance AND exact-repr both reported,
so we catch fragile queries before the driver does.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: decimals -> float, timestamps -> iso strings
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: float(v) if type(v).__name__ == "Decimal" else v)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL {name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    # exact mismatch — report even if within tolerance,
                    # since the driver may hash exact representations
                    close = math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                    return (f"FAIL {name}: col {c} row {i}: {x!r} vs {y!r}"
                            f" ({'close' if close else 'FAR'})")
            elif str(x) != str(y):
                return f"FAIL {name}: col {c} row {i}: {x!r} vs {y!r}"
    return f"OK   {name}: {len(a)} rows x {len(a.columns)} cols"


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # dev-only third arg mirroring Verify's query filter: check only the
    # named queries (comma-separated) instead of flagging every query
    # absent from a filtered Verify run
    if only:
        names = set(only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in names}
    fails = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            fails += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fails += 1
            continue
        msg = compare(name, spark_df, duck_df)
        if msg.startswith("FAIL"):
            fails += 1
        print(msg)
    print(f"\n{len(oracles) - fails}/{len(oracles)} oracle-checked queries pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
