"""Derive a larger benchmark dataset from shipped testdata by keyed
replication — the 10x empirical point for the 100x design claims.

Usage:  python tools/scale_up.py SRC_DIR OUT_DIR [REPLICAS]
        python tools/scale_up.py /root/testdata/sf0.1 /tmp/sf1_derived 10
        SPARK_GRAFT_SF_DIR=/tmp/sf1_derived python bench.py

Each replica i offsets every primary/foreign key by i * (max_key + 1)
of its table, so referential integrity (customer->orders->lineitem,
part/supplier->lineitem, nation FKs) is preserved and join/agg
cardinalities scale linearly. Dimension tables (region, nation) stay
fixed, exactly like TPC-H scaling. Document text gets a per-replica
suffix so fingerprint/minhash dedup keeps realistic (non-degenerate)
duplicate rates; embeddings are replicated verbatim (tie-broken top-k
stays deterministic). Timestamps are unchanged: time-window group
counts stay fixed while rows per group scale — the aggregation-heavy
regime. DuckDB writes TIMESTAMP as micros, which Spark reads natively
(the nanosAsLong shim in workload._t is a no-op on these files).
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> columns offset by that table's own key space; value is the
# table whose max key defines the offset unit.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
PK = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
      "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
      "embeddings": "vec_id", "__events_user": "user_id"}
COPY_AS_IS = ["region", "nation"]


def scale(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    units: dict[str, int] = {}
    for t, col in PK.items():
        f = os.path.join(src, f"{t.lstrip('_') if not t.startswith('__') else 'events'}.parquet")
        units[t] = con.sql(
            f"SELECT MAX({col}) + 1 FROM '{f}'").fetchone()[0]
    for t in COPY_AS_IS:
        con.sql(f"COPY (SELECT * FROM '{os.path.join(src, t)}.parquet') "
                f"TO '{os.path.join(out, t)}.parquet' (FORMAT PARQUET)")
    for t, offsets in KEYED.items():
        f = os.path.join(src, f"{t}.parquet")
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{f}'").fetchall()]
        parts = []
        for i in range(replicas):
            sel = []
            for c in cols:
                if c in offsets:
                    sel.append(f"{c} + {i * units[offsets[c]]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    sel.append(f"text || ' [replica {i}]' AS text")
                elif t == "documents" and c == "n_chars" and i > 0:
                    sel.append(f"n_chars + {len(f' [replica {i}]')} AS n_chars")
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{f}'")
        con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{os.path.join(out, t)}.parquet' (FORMAT PARQUET, "
                f"ROW_GROUP_SIZE 122880)")
        n = con.sql(f"SELECT COUNT(*) FROM '{os.path.join(out, t)}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_derived"
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, out, r)
