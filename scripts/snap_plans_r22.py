"""Snapshot .explain('formatted') for named queries into plans/r22/.

Usage: python scripts/snap_plans_r22.py <before|after> [query ...]
Defaults to the bench HEADLINE set. Output: plans/r22/<query>_<tag>.txt
(the optimization-round evidence files the judge checks plan claims
against). Eager-build Lloyd queries run their training jobs at build
time; that is fine here — we want the serving plan text.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from multithreaded_mapreduce_library_spark.registry import load_all
from multithreaded_mapreduce_library_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r22"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"snap_plans_r22_{tag}")
    specs = load_all()
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
