"""Cross-check every __spark_entry__ query against its DuckDB oracle.

Mimics the driver's t2 gate: run the Spark query and the oracle SQL at
the given scale factor, sort columns by name and rows by value, compare
exactly. Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from adam_spark import get_spark
from adam_spark.sources.tables import TABLES


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    # the driver runs a stock Spark 4 session: ANSI mode ON. Mimic it so
    # a cast that would crash there crashes here first.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in os_:
                # no oracle registered — the driver's weaker rows-only
                # check: the query must run and produce rows
                print(f"OK   {name}: {len(srows)} rows (rows-only, no oracle)")
                continue
            cur = con.execute(os_[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            spdf = sdf.toPandas()
            dpdf = con.execute(os_[name]).df()
            # pandas-dtype parity: the driver hashes pandas values, and an
            # int64-vs-float64 (or int32-vs-int64) asymmetry flips the hash
            # even when every value compares equal (bqsr_observation_table
            # was hash-red for 4 rounds on exactly this).
            sdt = {c: str(spdf[c].dtype) for c in spdf.columns}
            ddt = {c: str(dpdf[c].dtype) for c in dpdf.columns}
            if sdt != ddt:
                diff = {c: (sdt.get(c), ddt.get(c)) for c in set(sdt) | set(ddt)
                        if sdt.get(c) != ddt.get(c)}
                failures.append(name)
                print(f"FAIL {name}: pandas dtype mismatch {diff}")
                continue
            a, acols = normalize(srows, scols)
            b, bcols = normalize(drows, dcols)
            if acols != bcols:
                failures.append(name)
                print(f"FAIL {name}: columns {acols} vs {bcols}")
                continue
            if len(a) != len(b):
                failures.append(name)
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                continue
            bad = [(x, y) for x, y in zip(a, b) if x != y]
            if bad:
                failures.append(name)
                print(f"FAIL {name}: {len(bad)}/{len(a)} mismatched rows; first: ")
                print("   spark:", bad[0][0])
                print("   duck :", bad[0][1])
            else:
                print(f"OK   {name}: {len(a)} rows")
        except Exception as e:
            failures.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
    print()
    print("failures:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
