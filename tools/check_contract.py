"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle twin at a given sf,
compare row count + sorted-by-name schema + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact repr: catches any cross-engine double drift
        return repr(v)
    return repr(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from p3_osm_transformer_spark.session import get_spark

    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.sql(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_n = len(srows) == len(orows)
        ok_vals = ok_cols and ok_n and rows_key(srows, scols) == rows_key(orows, ocols)
        status = "OK" if (ok_cols and ok_n and ok_vals) else "FAIL"
        print(f"{name}: {status} spark={len(srows)} duck={len(orows)} "
              f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}")
        if not ok_vals and ok_cols and ok_n:
            sk,ok_ = rows_key(srows, scols), rows_key(orows, ocols)
            diff = [(a, b) for a, b in zip(sk, ok_) if a != b][:3]
            for a, b in diff:
                print(f"   spark={a}\n   duck ={b}")
        if status == "FAIL":
            failures.append(name)
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
