#!/usr/bin/env python
"""Drive the driver contract end-to-end, exactly as the driver does:
plain SparkSession, import __spark_entry__, run every query at the given
SF and compare against its DuckDB oracle (columns sorted by name, rows as
canonical strings). Usage:

    python scripts/drive_contract.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries. Exit code 1 on any
mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def name_sorted_rows(cols, rows):
    return sorted(
        tuple(str(x) for _, x in sorted(zip(cols, r), key=lambda p: p[0])) for r in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in q.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        if name not in o:
            n = sdf.count()
            print(f"{name}: rows-only {n}")
            continue
        srows = name_sorted_rows(sdf.columns, sdf.collect())
        cur = con.execute(o[name])
        ocols = [d[0] for d in cur.description]
        orows = name_sorted_rows(ocols, cur.fetchall())
        ok = srows == orows and sorted(sdf.columns) == sorted(ocols)
        print(f"{name}: rows={len(srows)} match={ok}")
        if not ok:
            failures.append(name)
            for a, b in zip(srows, orows):
                if a != b:
                    print(f"  first diff:\n   spark : {a}\n   oracle: {b}")
                    break

    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
