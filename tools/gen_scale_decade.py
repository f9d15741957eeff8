#!/usr/bin/env python3
"""Scale-decade generator: blows /root/testdata/sf0.1 up ~10x (bench-only,
no oracle) so the scaling audit gets a measured decade beyond sf0.1 instead
of extrapolating 100 TB claims from a 17 MB corpus.

Design: copy 0 is the original; copies 1..9 are key-shifted replicas with a
LINEAR-STRUCTURE discipline:
  - every entity key shifts by copy * OFFSET consistently across all tables
    (FK integrity preserved: orders->customer, lineitem->orders/part/
    supplier, events.user_id->customer all keep joining);
  - document TOKENS are renamed per copy (injective rename: within-copy
    shingle/jaccard/minhash structure is IDENTICAL to the original,
    cross-copy similarity is zero);
  - embeddings are cyclically ROTATED per copy (an orthogonal transform:
    within-copy cosine geometry is identical, cross-copy vectors are
    decorrelated).
Naive replication would instead create quadratic cross-copy near-dup pairs
and make every similarity/dedup query look superlinear for DATA reasons,
not plan reasons — exactly what a scaling audit must not conflate.

Fixed-cardinality dims (nation, region) are copied as-is, like a real 10x
growth. Probe sets keyed on literal ids (kNN queries vec_id<10, IVF
centroids vec_id<128) keep their size because shifted copies leave the
low-id range — the realistic scale shape (corpus grows, query set fixed).

Usage: python3 tools/gen_scale_decade.py [SRC] [DST] [COPIES]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# Per-entity key offsets, each far above the sf0.1 max of its key space.
C_OFF = 1_000_000      # customer keys (also events.user_id)
O_OFF = 100_000_000    # order keys
P_OFF = 1_000_000      # part keys
S_OFF = 1_000_000      # supplier keys
E_OFF = 10_000_000     # event ids
D_OFF = 1_000_000      # doc ids
V_OFF = 1_000_000      # vec ids

# table -> {column: offset}; non-listed columns replicate unchanged.
KEY_SHIFTS = {
    "customer": {"c_custkey": C_OFF},
    "supplier": {"s_suppkey": S_OFF},
    "part": {"p_partkey": P_OFF},
    "orders": {"o_orderkey": O_OFF, "o_custkey": C_OFF},
    "lineitem": {"l_orderkey": O_OFF, "l_partkey": P_OFF, "l_suppkey": S_OFF},
    "events": {"event_id": E_OFF, "user_id": C_OFF},
    "documents": {"doc_id": D_OFF},
    "embeddings": {"vec_id": V_OFF},
}
AS_IS = ["nation", "region"]

# Entity NAME columns get a TWO-char per-copy prefix ("11", "22", ...):
# replicated-unchanged names would make every fuzzy/entity-resolution pair
# match its 9 twins (quadratic cross-copy output); a 2-char marker puts
# copies at edit distance 2, beyond the <=1 fuzzy threshold, while
# within-copy name geometry stays identical to the original.
NAME_COLS = {
    "customer": ["c_name"],
    "part": ["p_name"],
    "supplier": ["s_name"],
}


def shifted_copy(table: pa.Table, tname: str, shifts: dict, c: int) -> pa.Table:
    cols = []
    for name in table.column_names:
        col = table.column(name)
        if c > 0 and name in shifts:
            arr = col.combine_chunks().to_numpy(zero_copy_only=False) + shifts[name] * c
            cols.append(pa.array(arr, type=col.type))
        elif c > 0 and name in NAME_COLS.get(tname, []):
            cols.append(pa.array([f"{c}{c}{x}" for x in col.to_pylist()], type=col.type))
        else:
            cols.append(col)
    return pa.table(cols, names=table.column_names)


def rename_tokens(text: str, c: int) -> str:
    # Injective per-copy token rename: within-copy similarity structure is
    # preserved exactly; cross-copy token sets are disjoint. The prefix is
    # FIXED-WIDTH: a variable-width "c{c}" would collide across copies
    # (copy 1 + token "0abc" == "c10abc" == copy 10 + token "abc"),
    # manufacturing cross-copy shingle matches once COPIES > 10.
    return " ".join(f"c{c:03d}{t}" for t in text.split(" "))


def gen_documents(t: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return t
    texts = [rename_tokens(x, c) for x in t.column("text").to_pylist()]
    cols = {
        "doc_id": pa.array(
            t.column("doc_id").combine_chunks().to_numpy() + D_OFF * c, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": t.column("lang"),
        "source": t.column("source"),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    }
    return pa.table([cols[n] for n in t.column_names], names=t.column_names)


def gen_embeddings(t: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return t
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    rolled = np.roll(mat, 7 * c, axis=1)  # orthogonal: within-copy geometry intact
    # Rolls repeat mod the vector dim: copies dim apart would otherwise get
    # IDENTICAL vectors (spurious cross-copy exact dups once COPIES > dim).
    # A global sign flip per roll cycle is also orthogonal, preserves
    # within-copy pairwise cosines, and puts repeat-cycle copies at
    # cosine -1 from their twins — decorrelated, like every other pair.
    dim = mat.shape[1]
    if ((7 * c) // dim) % 2 == 1:
        rolled = -rolled
    emb = pa.array([row for row in rolled], type=t.schema.field("embedding").type)
    vec = pa.array(t.column("vec_id").combine_chunks().to_numpy() + V_OFF * c,
                   type=pa.int64())
    cols = {"vec_id": vec, "embedding": emb, "label": t.column("label")}
    return pa.table([cols[n] for n in t.column_names], names=t.column_names)


def main() -> None:
    import os

    os.makedirs(DST, exist_ok=True)
    for name in AS_IS:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (as-is)")
    for name, shifts in KEY_SHIFTS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        # STREAM one copy per row group instead of concatenating COPIES
        # tables in memory: at the sf100 decade (COPIES=1000) the in-memory
        # concat of lineitem would need tens of GB; streaming needs one
        # copy's worth. Physical types keep the source schema (events.ts
        # stays timestamp[ns]).
        writer = pq.ParquetWriter(f"{DST}/{name}.parquet", t.schema)
        n_out = 0
        for c in range(COPIES):
            if name == "documents":
                part = gen_documents(t, c)
            elif name == "embeddings":
                part = gen_embeddings(t, c)
            else:
                part = shifted_copy(t, name, shifts, c)
            writer.write_table(part.cast(t.schema))
            n_out += part.num_rows
        writer.close()
        print(f"{name}: {t.num_rows} -> {n_out} rows")


if __name__ == "__main__":
    main()
