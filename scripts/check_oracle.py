#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + oracle_sql.json), then this script runs
each oracle in DuckDB over the sf tables and compares (columns sorted by
name, rows sorted, exact values).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [skip1,skip2,...]

The optional third argument names queries to skip — used by check_sf1.py
for the three queries whose sf1 verification is NOT a plain DuckDB
equality (pack_sequences' recursive-CTE oracle is quadratic; the two
embedding-LSH queries verify against a probabilistic recall bound).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    import os
    for name, sql in sorted(oracles.items()):
        if name in skip:
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # subset verify run — only compare what was dumped
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got.columns
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            fail += 1
            continue
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            fail += 1
            continue
        g = canon(got_rows, [c.lower() for c in got_cols])
        e = canon(exp_rows, [c.lower() for c in exp_cols])
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            fail += 1
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: first diff at row {bad}:\n  got {g[bad]}\n  exp {e[bad]}")
            fail += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return fail  # failure COUNT (callers aggregate); truthy = failed


if __name__ == "__main__":
    skip = frozenset(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()
    sys.exit(1 if main(sys.argv[1], sys.argv[2], skip) else 0)
