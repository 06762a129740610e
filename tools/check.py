#!/usr/bin/env python3
"""DEV-ONLY local mirror of the driver's t2 duckdb-oracle correctness check.

Not part of the shipped Scala library (the engine has zero Python deps).
Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01

Compares each <outDir>/<name> parquet result against the DuckDB run of
<outDir>/oracle_sql.json's SQL over the same sf tables: schema (column
names + sorted), row count, and exact value equality after sorting rows
by all columns (driver canonicalization per SURVEY.md §4).
"""
import json
import math
import sys

import duckdb


def canon(rows, colnames):
    # sort columns by name, then rows by value tuple (None first)
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(row):
        return tuple(
            (0, "") if row[i] is None else (1, str(row[i])) for i in order
        )

    return [tuple(row[i] for i in order) for row in sorted(rows, key=key)], \
        [colnames[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b  # exact: determinism is the point
        return float(a) == float(b)
    return a == b


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = canon(got_rel.fetchall(), got_rel.columns)
            exp_rel = con.sql(sql)
            exp_rows, exp_cols = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, x) in enumerate(zip(got_rows, exp_rows)):
            if not all(eq(a, b) for a, b in zip(g, x)):
                bad = (i, g, x)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[1]} exp {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
