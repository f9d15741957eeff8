#!/usr/bin/env python3
"""Oracle type-discipline gate.

The driver's correctness compare hashes values TYPE-SENSITIVELY, so a DuckDB
oracle whose output column lands outside the hashable lockstep set (e.g. a
HUGEINT from `sum(BIGINT)` propagating through `//`, or an unexpectedly-wide
DECIMAL) hash-mismatches even when every value is numerically identical to the
Spark result. That exact failure took down events_transitions and
events_stream_transitions in round 6 (CORRECTNESS_r06: rows+schema green,
hash red). This tool retires the whole failure class: it runs DuckDB
`DESCRIBE` over EVERY oracle SQL string and fails if any output column's type
is outside the allowed set.

Usage: python3 tools/check_oracle_types.py <sfDir> <oracle_sql.json>
  (oracle_sql.json is what graft.Verify dumps; any sf dir works — DESCRIBE
   only needs the views to bind, it never scans data.)

Run as part of the pre-gate checklist alongside check_correctness.py.
"""
import json
import re
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# The hashable lockstep set: types the driver's compare hashes identically to
# the matching Spark types. Anything else (HUGEINT/UHUGEINT, DECIMAL of any
# precision, unsigned ints, INTERVAL, ...) must be CAST in the oracle SQL.
ALLOWED = {
    "BIGINT", "INTEGER", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "DATE",
}
# Nested types are allowed when the element type is itself allowed
# (e.g. BIGINT[]); the driver compares them as rendered lists.
NESTED_RE = re.compile(r"^(.*)\[\]$")


def type_ok(t: str) -> bool:
    t = t.strip().upper()
    m = NESTED_RE.match(t)
    if m:
        return type_ok(m.group(1))
    # Strip parametrized spellings that are still fine, e.g. VARCHAR(n)
    base = t.split("(")[0].strip()
    return t in ALLOWED or base in ALLOWED


def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(oracle_json).read_text())
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            n_bad += 1
            continue
        bad_cols = [(c, t) for (c, t, *_rest) in desc if not type_ok(t)]
        if bad_cols:
            n_bad += 1
            for c, t in bad_cols:
                print(f"FAIL {name}: column `{c}` has non-hashable type {t} "
                      f"- CAST it in the oracle SQL")
    print(f"checked {len(oracle)} oracle queries, {n_bad} with type violations")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
