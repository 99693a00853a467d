"""Synthesize an sf1-equivalent dataset (10x sf0.1) for the scaling
bench (VERDICT r5 'Next round' #4): each fact table is 10 replicas
with key offsets so referential joins stay valid and keys stay
unique; document TEXT is made replica-unique with a per-replica
consonant rotation (so dedup/span operators see a diverse corpus, not
a pathological 10-way exact-dup blowup); dimension tables
(region/nation) keep TPC-H semantics and do not scale."""
import shutil
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.sfscale/sf1"
N = 10
STRIDE = 100_000_000

OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

CONS = "bcdfghjklmnpqrstvwz"

def rot_text(col: pa.ChunkedArray, i: int) -> pa.Array:
    if i == 0:
        return col
    shifted = CONS[i:] + CONS[:i]
    table = str.maketrans(CONS + CONS.upper(), shifted + shifted.upper())
    return pa.array([t.translate(table) if t is not None else None
                     for t in col.to_pylist()], type=pa.string())

for name in ["region", "nation"]:
    shutil.copy(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")

for name, keys in OFFSETS.items():
    src = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(N):
        t = src
        for k in keys:
            idx = t.schema.get_field_index(k)
            t = t.set_column(idx, t.schema.field(idx),
                             pc.add(t.column(k), i * STRIDE))
        if name == "documents":
            idx = t.schema.get_field_index("text")
            t = t.set_column(idx, t.schema.field(idx), rot_text(src.column("text"), i))
        parts.append(t)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet", row_group_size=200_000)
    print(name, out.num_rows)
