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


def copy_transform(dim: int, c: int):
    """The per-copy orthogonal transform: a SEEDED signed permutation of the
    dimensions. Signed permutations are orthogonal (each output coordinate
    is ±1 times exactly one input coordinate), so within-copy pairwise
    cosines are preserved EXACTLY; distinct copies draw independent
    permutations+signs from a per-copy-seeded RNG, so no two copies share a
    transform at any replica count. The previous cyclic-roll scheme
    repeated every `dim` copies (roll 7c mod 128 with gcd(7,128)=1), which
    gave every vector ~COPIES/dim exact(-or-negated) twins at the sf100
    decade — meaningless data for embedding dedup, the very family the
    decade exists to audit. Collision probability for two seeded draws is
    1/(2^dim * dim!) ~ 0; the --selfcheck mode asserts distinctness
    outright for any COPIES."""
    rng = np.random.default_rng(10_000_019 + c)
    perm = rng.permutation(dim)
    signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
    return perm, signs


def gen_embeddings(t: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return t
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    perm, signs = copy_transform(mat.shape[1], c)
    rolled = mat[:, perm] * signs
    emb = pa.array([row for row in rolled], type=t.schema.field("embedding").type)
    vec = pa.array(t.column("vec_id").combine_chunks().to_numpy() + V_OFF * c,
                   type=pa.int64())
    cols = {"vec_id": vec, "embedding": emb, "label": t.column("label")}
    return pa.table([cols[n] for n in t.column_names], names=t.column_names)


def selfcheck(copies: int, dim: int = 128, n: int = 50) -> None:
    """Generator spec (runs with --selfcheck COPIES [DIM]): asserts the
    embedding-transform properties the scaling audit depends on —
    (a) every per-copy transform is DISTINCT (no copy shares a signed
    permutation with any other, so no cross-copy exact-or-negated twins),
    (b) each transform is orthogonal in effect: within-copy pairwise dot
    products match the original to float tolerance,
    (c) cross-copy correlation is near zero for generic vectors."""
    seen = set()
    for c in range(copies):
        perm, signs = copy_transform(dim, c)
        key = (tuple(perm.tolist()), tuple(signs.tolist()))
        assert key not in seen, f"copy {c} repeats an earlier transform"
        seen.add(key)
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    g0 = mat @ mat.T
    worst_xcopy = 0.0
    for c in [1, 2, copies // 2, copies - 1]:
        if c < 1:
            continue
        perm, signs = copy_transform(dim, c)
        tc = mat[:, perm] * signs
        gc = tc @ tc.T
        assert np.allclose(g0, gc, atol=1e-5), f"copy {c} broke within-copy geometry"
        worst_xcopy = max(worst_xcopy, float(np.abs(tc @ mat.T).max()))
    # random-normal unit vectors under independent signed permutations:
    # cosines concentrate near 0 at O(1/sqrt(dim)); 6 sigma is a loose bound
    assert worst_xcopy < 6.0 / np.sqrt(dim), f"cross-copy cosine too high: {worst_xcopy}"
    print(f"selfcheck OK: {copies} distinct transforms, within-copy geometry exact, "
          f"max cross-copy |cos| {worst_xcopy:.4f}")


def main() -> None:
    import os

    if len(sys.argv) > 1 and sys.argv[1] == "--selfcheck":
        selfcheck(int(sys.argv[2]) if len(sys.argv) > 2 else 1000,
                  int(sys.argv[3]) if len(sys.argv) > 3 else 128)
        return
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
