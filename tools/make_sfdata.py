#!/usr/bin/env python3
"""Scale-factor replicator: build an sfN corpus as R offset replicas
of a source sf directory, preserving join semantics.

TPC-H-style scaling: each replica offsets every table's primary key
and the foreign keys that reference it by r * stride(key), so key
CARDINALITY grows R x while per-key group sizes (lines per order,
orders per customer) stay constant -- the same shape dbgen produces at
a higher SF. Non-key columns (dates, prices, text, vectors) are kept
verbatim, so selective predicates select R x the rows at the same
selectivity. nation/region are fixed-size dimensions and are copied
once, unreplicated.

Strides are per-key-domain: 1 + max(key) over every column in the
domain, computed across all tables sharing it (e.g. the order-key
domain spans o_orderkey and l_orderkey), so replicas can never
collide or cross-link.

Usage: make_sfdata.py <srcSfDir> <outDir> <replicas>
e.g.:  python3 tools/make_sfdata.py /root/testdata/sf0.1 sfdata1 10
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, out, R = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)

# key domain -> columns belonging to it, per table
DOMAINS = {
    "order":    {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "cust":     {"customer": ["c_custkey"], "orders": ["o_custkey"]},
    "part":     {"part": ["p_partkey"], "lineitem": ["l_partkey"]},
    "supp":     {"supplier": ["s_suppkey"], "lineitem": ["l_suppkey"]},
    # doc_id and vec_id are ONE id space (embeddings key into
    # documents: rrfHybrid/serveHybrid fuse dense vec_id hits with
    # lexical doc_id hits by equality), so they must share a stride --
    # independent strides silently break the doc<->embedding
    # correspondence in every replica.
    "doc":      {"documents": ["doc_id"], "embeddings": ["vec_id"]},
    "event":    {"events": ["event_id"]},
    "user":     {"events": ["user_id"]},
}
COPY_ONCE = ["nation", "region"]
REPLICATE = ["customer", "documents", "embeddings", "events",
             "lineitem", "orders", "part", "supplier"]

tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet"))
          for t in REPLICATE}

stride = {}
for dom, members in DOMAINS.items():
    mx = 0
    for t, cols in members.items():
        for c in cols:
            mx = max(mx, pc.max(tables[t][c]).as_py() or 0)
    stride[dom] = mx + 1

col_offset = {}  # (table, col) -> stride
for dom, members in DOMAINS.items():
    for t, cols in members.items():
        for c in cols:
            col_offset[(t, c)] = stride[dom]

for t in COPY_ONCE:
    pq.write_table(pq.read_table(os.path.join(src, f"{t}.parquet")),
                   os.path.join(out, f"{t}.parquet"))

for t in REPLICATE:
    base = tables[t]
    parts = []
    for r in range(R):
        tb = base
        if r > 0:
            for ci, name in enumerate(tb.column_names):
                off = col_offset.get((t, name))
                if off:
                    shifted = pc.add(base[name], pa.scalar(
                        r * off, type=base.schema.field(name).type))
                    tb = tb.set_column(ci, tb.schema.field(ci), shifted)
        parts.append(tb)
    pq.write_table(pa.concat_tables(parts), os.path.join(out, f"{t}.parquet"))
    print(f"{t}: {base.num_rows} -> {base.num_rows * R} rows")
print(f"wrote {out} at {R}x {src}")
