"""Driver-harness simulation: run every contract query on a VANILLA
Spark session (stock builder, ANSI on by default in Spark 4, non-UTC
timezone) to catch dependencies on adam_spark.get_spark's session
defaults. Usage: python tools/foreign_sim.py [sf_dir] [query ...]

Exit 0 = every query collected cleanly; failures are listed with their
exception class.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TZ", "America/New_York")

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        # the ONE conf the driver also needs: testdata parquet stores
        # TIMESTAMP(NANOS), unreadable without it
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("ansi:", spark.conf.get("spark.sql.ansi.enabled"), flush=True)
    failures = []
    df = entrymod.entry(spark)
    print(f"entry: {df.count()} rows", flush=True)
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            pdf = fn(spark, sf).toPandas()
            print(f"OK   {name}: {len(pdf)} rows", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append((name, exc))
            print(f"FAIL {name}: {type(exc).__name__}: {exc}"[:300], flush=True)
    print(f"\nfailures: {', '.join(n for n, _ in failures) or 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
