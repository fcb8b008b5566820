#!/usr/bin/env python3
"""Scale a graft testdata dir by key-offset cloning (driver-side tool).

Builds an N-times-larger dataset from an existing sf dir while preserving
every invariant the queries rely on:

- dimension tables (region, nation) copy verbatim — TPC-H semantics keep
  them fixed across scale factors, and cloned fact rows keep their
  original dimension foreign keys;
- fact keys offset by `copy * (max_key + 1)` per key domain, and every
  foreign key offsets by ITS domain's stride, so referential integrity
  holds within each clone;
- document text gets a per-copy suffix token (and n_chars recomputed),
  so clones are not trivial near-duplicates of each other;
- embeddings perturb by copy*1e-3 per element (cast back to float32);
- output parquet is cast to the SOURCE schema byte-for-byte (pyarrow),
  so timestamp[ns] events etc. read identically in Spark and DuckDB.

The point is the cross-engine PARITY sweep at larger row counts
(rounding seams only appear with scale — see SCALE.md), not matching
the driver's exact distribution. Usage:

    python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/graft_sf1 10
"""
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS FROM '{src}/{t}.parquet'")

    def stride(table, key):
        return con.execute(
            f"SELECT max({key}) + 1 FROM {table}").fetchone()[0]

    cust = stride("customer", "c_custkey")
    supp = stride("supplier", "s_suppkey")
    part = stride("part", "p_partkey")
    order = stride("orders", "o_orderkey")
    doc = stride("documents", "doc_id")
    vec = stride("embeddings", "vec_id")
    event = stride("events", "event_id")
    user = stride("events", "user_id")

    def clone(table, select_fmt):
        parts = [select_fmt.format(i=i) for i in range(copies)]
        sql = " UNION ALL ".join(parts)
        tbl = con.execute(sql).arrow()
        want = pq.read_schema(f"{src}/{table}.parquet")
        tbl = tbl.cast(want)
        pq.write_table(tbl, f"{dst}/{table}.parquet")
        print(f"[gen_sf] {table}: {tbl.num_rows} rows")

    def clone_dim(table):
        tbl = con.execute(f"SELECT * FROM {table}").arrow()
        tbl = tbl.cast(pq.read_schema(f"{src}/{table}.parquet"))
        pq.write_table(tbl, f"{dst}/{table}.parquet")
        print(f"[gen_sf] {table}: {tbl.num_rows} rows (dim, verbatim)")

    clone_dim("region")
    clone_dim("nation")
    clone("customer",
          "SELECT c_custkey + {i} * " + str(cust) + " AS c_custkey, "
          "c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer")
    clone("supplier",
          "SELECT s_suppkey + {i} * " + str(supp) + " AS s_suppkey, "
          "s_name, s_nationkey, s_acctbal FROM supplier")
    clone("part",
          "SELECT p_partkey + {i} * " + str(part) + " AS p_partkey, "
          "p_name, p_brand, p_type, p_size, p_retailprice FROM part")
    clone("orders",
          "SELECT o_orderkey + {i} * " + str(order) + " AS o_orderkey, "
          "o_custkey + {i} * " + str(cust) + " AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
          "FROM orders")
    clone("lineitem",
          "SELECT l_orderkey + {i} * " + str(order) + " AS l_orderkey, "
          "l_partkey + {i} * " + str(part) + " AS l_partkey, "
          "l_suppkey + {i} * " + str(supp) + " AS l_suppkey, "
          "l_linenumber, l_quantity, l_extendedprice, l_discount, "
          "l_tax, l_returnflag, l_linestatus, l_shipdate FROM lineitem")
    clone("events",
          "SELECT event_id + {i} * " + str(event) + " AS event_id, ts, "
          "user_id + {i} * " + str(user) + " AS user_id, event_type, "
          "value, props FROM events")
    clone("documents",
          "SELECT doc_id + {i} * " + str(doc) + " AS doc_id, "
          "CASE WHEN {i} = 0 THEN text ELSE text || ' c{i}' END AS text, "
          "lang, source, "
          "length(CASE WHEN {i} = 0 THEN text ELSE text || ' c{i}' END) "
          "AS n_chars FROM documents")
    clone("embeddings",
          "SELECT vec_id + {i} * " + str(vec) + " AS vec_id, "
          "CASE WHEN {i} = 0 THEN embedding ELSE "
          "list_transform(embedding, x -> CAST(x + {i} * 0.001 "
          "AS FLOAT)) END AS embedding, label FROM embeddings")


if __name__ == "__main__":
    main()
