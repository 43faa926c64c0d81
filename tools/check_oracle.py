#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

Registers each parquet table by basename, runs every oracle SQL,
and compares against the Spark-written parquet: schema (column names,
sorted), row count, and exact value equality after sorting columns by
name and rows by all columns.

When jsonOut is given, also writes the per-query record in the
driver's CORRECTNESS_r{N}.json schema ({rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err} per query) — the committed
hard correctness record (CORRECTNESS_LOCAL_r{N}.json), so a round's
gate survives even when the driver's own record ships empty (r14).
hash_match here is the dtype-strict + float-bit-exact value compare,
the local implication of the driver's byte hash.
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
record = {}


def rec(qname, rows_match=False, schema_match=False, hash_match=False,
        spark_rows=None, oracle_rows=None, err=None):
    record[qname] = {"rows_match": rows_match, "schema_match": schema_match,
                     "hash_match": hash_match, "spark_rows": spark_rows,
                     "oracle_rows": oracle_rows, "err": err}


def dump_record():
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
            f.write("\n")
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for qname, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{qname}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {qname}: no spark output dir"); fails += 1
        rec(qname, err="no spark output dir"); continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {qname}: {e}"); fails += 1
        rec(qname, err=str(e)[:300]); continue
    g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
    if g_cols != e_cols:
        print(f"FAIL {qname}: cols {g_cols} != {e_cols}"); fails += 1
        rec(qname, spark_rows=len(got), oracle_rows=len(exp),
            err=f"cols {g_cols} != {e_cols}"[:300]); continue
    got = got[g_cols].sort_values(g_cols).reset_index(drop=True)
    exp = exp[e_cols].sort_values(e_cols).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"FAIL {qname}: rows {len(got)} != {len(exp)}"); fails += 1
        rec(qname, schema_match=True, spark_rows=len(got),
            oracle_rows=len(exp),
            err=f"rows {len(got)} != {len(exp)}"); continue
    # dtype-STRICT compare: the driver's hash is type-sensitive (a
    # DuckDB HUGEINT vs Spark BIGINT mismatch hashes differently even
    # when values are equal — that's how q11 slipped in round 1), so
    # local OK must imply driver OK.
    dt_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype))
                   for c in g_cols if str(got[c].dtype) != str(exp[c].dtype)]
    if dt_mismatch:
        print(f"FAIL {qname}: dtypes differ (spark, oracle): {dt_mismatch}")
        fails += 1
        rec(qname, rows_match=True, schema_match=True, spark_rows=len(got),
            oracle_rows=len(exp), err=f"dtypes differ: {dt_mismatch}"[:300])
        continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                      check_exact=True)
    except AssertionError as e:
        print(f"FAIL {qname}: values differ: {str(e)[:400]}")
        fails += 1
        rec(qname, rows_match=True, schema_match=True, spark_rows=len(got),
            oracle_rows=len(exp), err=f"values differ: {str(e)[:250]}")
        continue
    # BIT-exact float compare: the driver hashes raw value bytes, so
    # +0.0 (Spark round, BigDecimal-based) vs -0.0 (DuckDB round,
    # IEEE-preserving) hash-mismatches even though == and
    # assert_frame_equal both pass — that's how emb_pca stayed red
    # through a green local gate in r13. NaNs (none expected) must
    # also match BIT-for-bit: a payload/sign-differing NaN would pass
    # an isnan-escape here and still fail the driver's byte hash —
    # the exact split this check exists to kill, so no escape.
    bit_bad = []
    for c in g_cols:
        if got[c].dtype.kind != "f":
            continue
        g = got[c].to_numpy()
        e = exp[c].to_numpy()
        ib = f"int{g.dtype.itemsize * 8}"
        same = g.view(ib) == e.view(ib)
        if not same.all():
            i = int(np.argmin(same))
            bit_bad.append(f"{c}[{i}]: spark {g[i]!r} vs oracle {e[i]!r}"
                           f" (bits {g.view(ib)[i]:#x} vs {e.view(ib)[i]:#x})")
    if bit_bad:
        print(f"FAIL {qname}: float bits differ: {bit_bad[:4]}")
        fails += 1
        rec(qname, rows_match=True, schema_match=True, spark_rows=len(got),
            oracle_rows=len(exp),
            err=f"float bits differ: {bit_bad[:2]}"[:300])
    else:
        print(f"OK   {qname} ({len(got)} rows)")
        rec(qname, rows_match=True, schema_match=True, hash_match=True,
            spark_rows=len(got), oracle_rows=len(exp))
dump_record()
sys.exit(1 if fails else 0)
