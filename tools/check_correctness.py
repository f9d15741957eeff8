#!/usr/bin/env python3
"""Dev-loop mimic of the driver's correctness gate.

Runs each oracle_sql.json query in DuckDB against the sf parquet tables and
compares (schema-insensitively: columns sorted by name, rows sorted, values
compared with exact equality for non-floats and tight tolerance report for
floats) against the Spark parquet dumps produced by graft.Verify.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        files = list(spark_path.glob("*.parquet"))
        tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(spark_path)
        scols = tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL {name}: columns differ duck={dc} spark={sc}")
            n_fail += 1
            continue
        if len(dr) != len(sr):
            print(f"FAIL {name}: rowcount duck={len(dr)} spark={len(sr)}")
            n_fail += 1
            continue
        bad = None
        max_float_delta = 0.0
        for i, (a, b) in enumerate(zip(dr, sr)):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if x != y:
                        if math.isnan(x) and math.isnan(y):
                            continue
                        max_float_delta = max(max_float_delta, abs(x - y))
                        if abs(x - y) > 0:
                            bad = (i, x, y)
                elif x != y:
                    bad = (i, x, y)
                    break
            if bad and not isinstance(bad[1], float):
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}: duck={bad[1]!r} spark={bad[2]!r} (max_float_delta={max_float_delta})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(dr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
