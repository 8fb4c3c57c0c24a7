#!/usr/bin/env python3
"""Synthesize an sf1-scale bench corpus as 10 key-shifted copies of the
driver's sf0.1 testdata (read-only; output goes to /tmp/sf1).

Keys are shifted per copy so uniqueness and join fan-out stay realistic
(each order still joins one customer, each lineitem one order/part/
supplier). Dimension tables (region, nation) are shared, as at any TPC-H
scale. Text/embedding payloads are replicated VERBATIM: sf1 carries 10x
the documents at 10x duplicate density, which makes dedup-family OUTPUT
sizes grow ~100x by data construction -- that is a property of this
corpus, not of the operators; SURVEY 5 reads the ratios with that in
mind.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> {column: stride} (key += copy * stride)
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": None},  # None -> max+1 stride
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for table, shifts in SHIFTS.items():
    src = f"{SRC}/{table}.parquet"
    cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    if not shifts:  # shared dimension table
        con.execute(f"COPY (SELECT * FROM '{src}') TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        continue
    strides = {}
    for c, s in shifts.items():
        strides[c] = s if s is not None else \
            con.execute(f"SELECT max({c}) + 1 FROM '{src}'").fetchone()[0]
    sel = ", ".join(
        f"{c} + i.i * {strides[c]} AS {c}" if c in strides else c for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM '{src}', (SELECT unnest(range({COPIES})) AS i) i "
        f"ORDER BY i.i) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")
print(f"done -> {DST}")
