#!/usr/bin/env python3
"""Dev-loop correctness checker mirroring the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with the
sfDir parquet tables registered as views, and compares against the Spark
result parquet written by graft.Verify — columns sorted by name, rows
sorted by all columns, exact value equality (the driver hash-compares, so
anything non-exact here is a real failure there).

Dev tool only — the Scala library has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly
        return repr(v)
    return str(v)


def frame_key(rows):
    return sorted(tuple(norm_cell(c) for c in r) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = sorted(spark_df.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in s_cols)
                + f" FROM spark_df").fetchall()
            oracle_df = con.sql(sql)
            # HUGEINT (int128) outputs are a driver-environment hazard:
            # some duckdb->pandas/arrow conversion paths render them as
            # float64/decimal, so the driver's hash of "123.0" never
            # matches Spark's LONG "123" even when values agree. Oracles
            # must CAST integer sums to BIGINT (round-8 root cause of the
            # 4 hash-red rows in CORRECTNESS_r07).
            huge = [c for c, t in zip(oracle_df.columns, oracle_df.types)
                    if "HUGEINT" in str(t) or "DECIMAL" in str(t)]
            if huge:
                print(f"FAIL {name}: oracle emits HUGEINT/DECIMAL "
                      f"column(s) {huge} — neither type has a driver-side "
                      "rendering precedent (HUGEINT->float, DECIMAL "
                      "trailing zeros); CAST to BIGINT/DOUBLE in BOTH "
                      "engines")
                n_fail += 1
                continue
            o_cols = sorted(oracle_df.columns)
            if s_cols != o_cols:
                print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
                n_fail += 1
                continue
            oracle_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in o_cols)
                + f" FROM oracle_df").fetchall()
            sk, ok = frame_key(spark_rows), frame_key(oracle_rows)
            if sk == ok:
                print(f"PASS {name} ({len(sk)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: spark {len(sk)} rows vs oracle {len(ok)}")
                ok_set, sk_set = set(ok), set(sk)
                diff_s = [r for r in sk if r not in ok_set][:3]
                diff_o = [r for r in ok if r not in sk_set][:3]
                print(f"  cols: {o_cols}")
                for r in diff_s:
                    print(f"  spark-only:  {r}")
                for r in diff_o:
                    print(f"  oracle-only: {r}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
