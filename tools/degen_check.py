#!/usr/bin/env python3
"""Cross-engine degenerate-vector gate.

DegenerateVectorSpec pins the Spark side of the VectorKit.normalizable
policy; this script pins the OTHER half — that every similarity oracle
actually executes and agrees on a fixture that contains degenerate
embeddings (the sf fixtures contain none, so tools/check.py never
exercises the oracle guard paths: the NULL-list / null-element
list_inner_product guards would be dead code without this gate).

Writes a fixture with zero-norm, NaN-component, Inf-component, NULL,
and null-element embeddings, runs `graft.Verify` on it (the production
ANSI-off session the driver uses; tools/chaos_check.py covers the
strict-ANSI dialect), then runs each similarity oracle in DuckDB and
compares canonically (columns sorted by name, rows sorted, exact
values) — the tools/check.py compare, scoped to the six similarity
queries.

Usage: python3 tools/degen_check.py   (from /root/repo)
"""
import json
import os
import subprocess
import sys
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon as check_canon  # noqa: E402 — the shared compare

QUERIES = [
    "q_similarity_cosine_topk", "q_dedup_embedding_cosine",
    "q_similarity_ann_lsh", "q_similarity_ivf", "q_dedup_semantic",
    "q_similarity_sq8",
]


def one_hot(axis):
    return [1.0 if i == axis else 0.0 for i in range(64)]


def write_fixture(sf_dir):
    rows = [
        (0, one_hot(0), 0), (1, one_hot(0), 0),  # exact dup pair
        (2, one_hot(1), 0), (3, one_hot(2), 0),
        (4, [0.5] * 64, 1), (5, [0.5] * 64, 1),  # dup pair, other label
        (10, [0.0] * 64, 0),                     # zero norm
        (11, [float("nan")] + one_hot(0)[1:], 0),  # NaN component
        (12, [float("inf")] + one_hot(0)[1:], 0),  # Inf component
        (13, None, 0),                           # NULL embedding
        (14, [0.5, None] + [0.0] * 62, 0),       # NULL element
        (15, one_hot(0)[:32], 0),                # wrong dimension
    ]
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))


def canon(con, query):
    cols = [c[0] for c in con.execute(f"DESCRIBE {query}").fetchall()]
    rows = con.execute(query).fetchall()
    return check_canon(rows, cols)  # tools/check.py's canonical compare


def main():
    work = tempfile.mkdtemp(prefix="graft-degen-")
    sf_dir = os.path.join(work, "sf")
    out_dir = os.path.join(work, "out")
    os.makedirs(sf_dir)
    write_fixture(sf_dir)

    # Verify runs the full registry; non-embeddings queries fail on the
    # missing tables and are skipped by its per-query try/catch — only
    # the similarity dumps (and oracle_sql.json) matter here.
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
        capture_output=True, text=True, timeout=900)
    missing = [q for q in QUERIES
               if not os.path.isdir(os.path.join(out_dir, q))]
    if r.returncode != 0 or missing:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit(f"Verify failed (rc={r.returncode}, missing dumps: {missing})")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')")
    n_fail = 0
    for name in QUERIES:
        spark_q = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        s_cols, s_rows = canon(con, spark_q)
        try:
            o_cols, o_rows = canon(con, oracles[name])
        except Exception as exc:  # an oracle that throws IS the failure mode
            print(f"  FAIL {name}: oracle raised {exc}")
            n_fail += 1
            continue
        if s_cols != o_cols or s_rows != o_rows:
            print(f"  FAIL {name}: spark={len(s_rows)} rows {s_cols} "
                  f"vs oracle={len(o_rows)} rows {o_cols}")
            for a, b in zip(s_rows, o_rows):
                if a != b:
                    print(f"    {a} != {b}")
                    break
            n_fail += 1
        else:
            print(f"  ok {name} ({len(s_rows)} rows)")
    print(f"DEGEN PASS={len(QUERIES) - n_fail} FAIL={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
