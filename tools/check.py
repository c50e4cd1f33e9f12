#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet, executes the oracle SQL in DuckDB against
the same sf tables and compares (columns sorted by name, rows sorted,
values compared exactly; doubles compared to 1e-9 relative with exact-
match reporting so we can tighten).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    # TYPE-STRICT (round 2): the driver hashes typed values, so an int
    # on one side and a float/Decimal on the other must FAIL here even
    # when numerically equal. Only int==int, float==float, etc. pass.
    ta, tb = type(a), type(b)
    if ta is not tb:
        # bool is an int subclass; keep bool vs int distinct anyway.
        return False
    if isinstance(a, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: our determinism recipe should give bit-equality
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b if not isinstance(a, str) else a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = list(got.columns)
        got_types = {c: str(t) for c, t in zip(got.columns, got.types)}
        got_rows = got.fetchall()
        if name not in oracles:
            n_noracle += 1
            print(f"  ~ {name}: no oracle ({len(got_rows)} rows)")
            continue
        try:
            exp = con.sql(oracles[name])
            exp_cols = list(exp.columns)
            exp_types = {c: str(t) for c, t in zip(exp.columns, exp.types)}
            exp_rows = exp.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            n_fail += 1
            print(f"  ✗ {name}: column mismatch got={gc} exp={ec}")
            continue
        # DuckDB-level result-type check: the Spark parquet (read back
        # through DuckDB) and the oracle query must agree on logical
        # type per column (BIGINT vs HUGEINT, BIGINT vs DOUBLE, ...).
        tdiff = [(c, got_types[c], exp_types[c]) for c in gc
                 if got_types[c] != exp_types[c]]
        if tdiff:
            n_fail += 1
            print(f"  ✗ {name}: RESULT TYPE mismatch {tdiff}")
            continue
        if len(gr) != len(er):
            n_fail += 1
            print(f"  ✗ {name}: row count got={len(gr)} exp={len(er)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            n_fail += 1
            print(f"  ✗ {name}: value mismatch at sorted-row {bad[0]}")
            print(f"      cols: {gc}")
            print(f"      got:  {bad[1]}")
            print(f"      exp:  {bad[2]}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(gr)} rows)")
    print(f"PASS={n_pass} FAIL={n_fail} NO-ORACLE={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
