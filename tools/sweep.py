#!/usr/bin/env python3
"""Sharded 10x oracle sweep with per-oracle timing.

Dev-only tool (NOT part of the Scala library): runs the same
DuckDB-vs-parquet compare as tools/check_oracle.py, but sharded across
N worker processes and recording per-oracle wall seconds, so a full
sf0.1 sweep is one command and its cost is attributable per oracle.

Usage: python3 tools/sweep.py <sfDir> <outDir> [shards=8] [timing.json] [only]

After `sbt "runMain graft.Verify /root/testdata/sf0.1 <outDir>"`:
    python3 tools/sweep.py /root/testdata/sf0.1 /tmp/verify_sf01 8
Prints one OK/FAIL line per oracle (same semantics as check_oracle:
sorted rows/columns, exact value compare) plus the 15 slowest oracles,
and writes per-oracle seconds to timing.json (default
<outDir>/sweep_timing.json). `only` is check_oracle's comma-separated
query filter, for sweeping a filtered Verify dump without flagging
every unselected query as missing.
"""
import json
import multiprocessing as mp
import sys
import time

import check_oracle  # same directory


def run_one(args):
    sf_dir, out_dir, name, sql = args
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    for t in check_oracle.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        return name, f"FAIL {name}: no spark output ({e})", time.time() - t0
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        return (name, f"FAIL {name}: oracle sql error: {e}",
                time.time() - t0)
    msg = check_oracle.compare(name, spark_df, duck_df)
    return name, msg, time.time() - t0


def main(sf_dir, out_dir, shards=8, timing_path=None, only=None):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        names = set(only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in names}
    tasks = [(sf_dir, out_dir, n, s) for n, s in sorted(oracles.items())]
    t0 = time.time()
    with mp.Pool(shards) as pool:
        results = pool.map(run_one, tasks)
    wall = time.time() - t0
    fails = 0
    timings = {}
    for name, msg, secs in results:
        timings[name] = round(secs, 2)
        if msg.startswith("FAIL"):
            fails += 1
        print(msg)
    print(f"\n{len(results) - fails}/{len(results)} oracle-checked "
          f"queries pass — sweep wall {wall:.0f}s on {shards} shards")
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    print("slowest oracles:",
          ", ".join(f"{n}={s}s" for n, s in slow))
    path = timing_path or f"{out_dir}/sweep_timing.json"
    json.dump({"wall_sec": round(wall, 1), "shards": shards,
               "fails": fails, "oracle_sec": timings},
              open(path, "w"), indent=1)
    print(f"timings -> {path}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 8,
                  sys.argv[4] if len(sys.argv) > 4 else None,
                  sys.argv[5] if len(sys.argv) > 5 else None))
