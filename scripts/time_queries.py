"""Best-of-N builder+noop timing for arbitrary gated queries, with the
bench's canary bracket — the per-query measurement tool for gated-only
queries the HEADLINE bench does not carry (guide §1.4: noop sink so the
computation is timed, not the sink; §1.5: labelled jobs).

The clock starts BEFORE the builder (conservative: eager-build training
collects are inside the timed region, like bench.py's EAGER_BUILD rule),
so numbers here are comparable across builder-restructuring A/Bs even
when a change moves work between build time and execution time.

Usage: python scripts/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_ITERS (default 3).
Prints one JSON line per query plus a trailing canary-bracket line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _canary_pair
from multithreaded_mapreduce_library_spark.registry import load_all
from multithreaded_mapreduce_library_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    spark = get_spark(app_name="time_queries")
    specs = load_all()
    # same warmup as bench.py
    specs["agg_stats"].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    start = _canary_pair()
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        best, runs = float("inf"), []
        for _ in range(iters):
            t0 = time.perf_counter()
            df = specs[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        print(json.dumps({"query": name, "best": round(best, 3), "runs": runs}))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"canary_start": start, "canary_end": _canary_pair()}))
    spark.stop()


if __name__ == "__main__":
    main()
