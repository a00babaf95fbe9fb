#!/usr/bin/env python3
"""Local oracle cross-check (r7 dev tool; the driver runs its own).

Usage: oracle_check.py <sf_dir> <verify_out_dir> [query_prefix ...]

Registers the sf parquet tables in DuckDB, runs every oracle SQL from
<verify_out_dir>/oracle_sql.json, and compares against the Spark result
parquet dumped by graft.Verify: row count, column names, and the full
sorted row multiset (floats compared exactly, as the driver's hash does).
"""
import json
import sys

import duckdb

TABLES = ["customer", "documents", "embeddings", "events", "lineitem",
          "nation", "orders", "part", "region", "supplier"]


def main():
    sf, vout = sys.argv[1], sys.argv[2]
    prefixes = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sqls = json.load(open(f"{vout}/oracle_sql.json"))
    bad = 0
    for name in sorted(sqls):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            oracle = con.execute(sqls[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{vout}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"{name}: SPARK READ ERROR {e}")
            bad += 1
            continue
        ok_schema = [c.lower() for c in oracle.columns] == \
            [c.lower() for c in spark.columns]
        o = sorted(map(repr, oracle.itertuples(index=False, name=None)))
        s = sorted(map(repr, spark.itertuples(index=False, name=None)))
        ok_rows = o == s
        if not (ok_schema and ok_rows):
            bad += 1
            print(f"{name}: MISMATCH schema_ok={ok_schema} "
                  f"rows {len(o)} vs {len(s)}")
            for a, b in list(zip(o, s))[:200]:
                if a != b:
                    print(f"  oracle: {a}\n  spark : {b}")
                    break
        else:
            print(f"{name}: ok ({len(o)} rows)")
    print(f"{'ALL OK' if bad == 0 else f'{bad} FAILURES'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
