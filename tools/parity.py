#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against DuckDB
on the same sf dir and compares row counts, sorted column names, and exact
values (rows sorted). Usage:

    python3 tools/parity.py <verify_out_dir> <sf_dir>

Exit 0 iff every query matches exactly.
"""
import json
import math
import os
import sys
import time
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def table_to_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(norm(v) for v in row) for row in zip(*data)) \
        if data else []
    return cols, rows


def main():
    args = sys.argv[1:]
    only = None
    if args and args[0] == "--only":
        only = set(args[1].split(","))
        args = args[2:]
    out_dir, sf_dir = Path(args[0]), args[1]
    con = duckdb.connect()
    # Big-sf sweeps: without a limit DuckDB grows until the kernel
    # OOM-kills the whole sweep (the q102 oracle at sf10 reached
    # 129 GB RSS); with a limit + temp_directory it spills where it
    # can. Per-row list folds can't spill — cap threads too for those
    # (PARITY_DUCKDB_THREADS) so fewer vector batches are in flight.
    mem = os.environ.get("PARITY_DUCKDB_MEM", "64GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    threads = os.environ.get("PARITY_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        qdir = out_dir / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_tbl = pq.read_table(qdir)
        t0 = time.time()
        try:
            duck_tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        sc, sr = table_to_rows(spark_tbl)
        dc, dr = table_to_rows(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            failures += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            failures += 1
        elif sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark: {sr[bad]}")
            print(f"  duck:  {dr[bad]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(sr)} rows, cols={sc}"
                  f"  oracle={dt:.1f}s", flush=True)
    # queries without an oracle → rows-only info
    for qdir in sorted(out_dir.iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            n = pq.read_table(qdir).num_rows
            print(f"INFO {qdir.name}: no oracle, {n} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
