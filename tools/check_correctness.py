"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_value(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .appName("correctness-check")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_secs = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows ({spark_secs:.1f}s, "
                  f"no oracle)")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = table_hash(scols, srows)
        oh = table_hash(ocols, orows)
        ok_hash = sh == oh
        status = "PASS" if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(f"{status}  {name}: spark={len(srows)} duck={len(orows)} "
              f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'} "
              f"hash={'ok' if ok_hash else 'MISMATCH'} ({spark_secs:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and not ok_hash:
                sset = set("|".join(norm_value(v) for v in r) for r in srows)
                # quick diff preview with columns aligned
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = set("|".join(norm_value(r[i]) for i in order)
                           for r in srows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = set("|".join(norm_value(r[i]) for i in oorder)
                           for r in orows)
                for x in list(sset - oset)[:3]:
                    print(f"        spark-only: {x}")
                for x in list(oset - sset)[:3]:
                    print(f"        duck-only:  {x}")
    print("\n" + ("ALL PASS" if not failures else
                  f"FAILURES: {failures}"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
