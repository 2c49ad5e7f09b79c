"""Generate a ~sf1.0 PERFORMANCE-PROBE dataset (10x sf0.1) under a
writable directory by replicating the sf0.1 tables with key offsets
that preserve the star-schema FK relationships (l_partkey stays inside
part's key range, etc.).  The driver's testdata is read-only and
driver-generated — this probe data is for the round-7 scale check only
(VERDICT r6 stretch task #9): every derived-geometry query and its
DuckDB oracle compute from the SAME parquet, so correctness gates run
unchanged on it; absolute values just differ from any driver sf1.0.

Usage: python scripts/make_sf1_probe.py [out_dir=/root/sf1_probe] [copies=10]

Multi-row-group output: each replica lands in its own row group, so
scans parallelize without the entry-level repartition crutch.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key columns shifted per replica: table -> {col: stride}
# strides = source key-range size (max+1), computed at run time
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# FK columns reuse the stride of the table they reference
STRIDE_OF = {
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "o_custkey": ("customer", "c_custkey"),
}
COPY_ONLY = ["nation", "region"]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_probe"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    strides: dict[tuple[str, str], int] = {}
    tables = {}
    for t in list(KEYED) + COPY_ONLY:
        tables[t] = pq.read_table(f"{SRC}/{t}.parquet")
    for t, cols in KEYED.items():
        for c in cols:
            ref = STRIDE_OF.get(c)
            if ref is None:
                strides[(t, c)] = int(
                    pc.max(tables[t][c]).as_py()
                ) + 1
    for c, (rt, rc) in STRIDE_OF.items():
        strides[(next(t for t, cs in KEYED.items() if c in cs), c)] = int(
            pc.max(tables[rt][rc]).as_py()
        ) + 1
    for t in COPY_ONLY:
        pq.write_table(tables[t], f"{out}/{t}.parquet")
        print(f"{t}: copied {tables[t].num_rows} rows")
    for t, cols in KEYED.items():
        src = tables[t]
        writer = pq.ParquetWriter(f"{out}/{t}.parquet", src.schema)
        for k in range(copies):
            rep = src
            for c in cols:
                shifted = pc.add(rep[c], k * strides[(t, c)])
                rep = rep.set_column(
                    rep.schema.get_field_index(c), c,
                    shifted.cast(src.schema.field(c).type),
                )
            writer.write_table(rep)
        writer.close()
        print(f"{t}: {src.num_rows} x {copies} rows, strides "
              f"{[strides[(t, c)] for c in cols]}")


if __name__ == "__main__":
    main()
