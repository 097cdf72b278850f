"""Synthesize an sf1 tier (~6M lineitem rows) by replicating the
driver's sf0.1 tables 10× with disjoint key offsets.

Why replication is a valid stress tier: the oracle gate compares Spark
and DuckDB on the SAME parquet, so correctness checking never depends
on how the data was produced — only that both engines read identical
bytes.  What another decade of volume buys is the failure classes the
sf0.1 audit caught one decade earlier (DECIMAL→DOUBLE ULP past 2^53
quanta, int64 overflow on squares, buffer growth, skew): they trigger
on MAGNITUDE, which replication scales faithfully.  What it does NOT
scale is distinct-value cardinality growth of non-key columns — noted
here so nobody mistakes the tier for real TPC-H sf1.

Key offsets are one stride (max_id + 1) per replica, so every
foreign-key relationship stays consistent within a replica and replica
id-spaces never collide (and stay far below the +1_000_000 synthetic-id
convention the dedup queries use in-query).  region/nation are fixed
dimension tables and copy through unchanged.

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir]
       (defaults: /root/testdata/sf0.1 → /root/repo/.scratch/sf1)
Then:  python tools/verify_local.py /root/repo/.scratch/sf1 <queries...>
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = 10

# table → {column: key-space it belongs to}; key spaces get one shared
# stride so FKs stay aligned across tables.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_THROUGH = ("region", "nation")

# key space → (table, column) that defines its stride
STRIDE_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for space, (tbl, col) in STRIDE_SOURCE.items():
        strides[space] = (
            con.execute(
                f"SELECT max({col}) + 1 FROM '{src}/{tbl}.parquet'"
            ).fetchone()[0]
        )

    for t in COPY_THROUGH:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied through")

    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(REPLICAS):
            exprs = [
                f"{c} + {i * strides[keys[c]]} AS {c}" if c in keys else c
                for c in cols
            ]
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()
        print(f"{t}: {n[0]} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
