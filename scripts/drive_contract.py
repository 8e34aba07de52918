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

# Same canonicalization as the driver-gate replica (tests/oracle.py) —
# plain str() would report spurious int-vs-float / Decimal / NaN /
# timestamp diffs relative to the real gate.
from tests.oracle import canonical_rows, check_type_alignment  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
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
        srows = canonical_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        cur = con.execute(o[name])
        ocols = [d[0] for d in cur.description]
        orows = canonical_rows(ocols, cur.fetchall())
        otypes = {d[0]: d[1] for d in con.execute("DESCRIBE " + o[name]).fetchall()}
        try:
            check_type_alignment(sdf, otypes, name)
            types_ok = True
        except AssertionError as exc:
            print(f"  type-class: {exc}")
            types_ok = False
        ok = srows == orows and sorted(sdf.columns) == sorted(ocols) and types_ok
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
