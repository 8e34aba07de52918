"""Full-registry formatted-plan sweep: per-query physical-plan node
counts (shuffle exchanges, broadcast exchanges, parquet scans, joins by
strategy, Python-boundary nodes) over every BATCH query in the registry.

The optimization rounds' family-audit tool (OPTIMIZATION_r21.md /
OPTIMIZATION_r22.md): static plans overstate cost where AQE reuses
exchanges (CLAUDE.md r17 lesson — the executed plan is the arbiter for
reuse claims), but node-count drift between rounds is exactly how a
silent plan regression (a lost broadcast, a new Expand, a BatchEvalPython
creeping in) becomes visible without running anything.

Streaming queries are excluded (their builders execute the availableNow
replay internally); eager-build Lloyd builders run their training jobs
at plan-build time, which is fine — we want the serving plan text.

Usage: python scripts/plan_sweep.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multithreaded_mapreduce_library_spark.registry import load_all
from multithreaded_mapreduce_library_spark.session import get_spark

# one count per TREE occurrence: formatted explain prints each operator
# in the numbered tree as "<Name> (<id>)" (partitioning/build-side
# detail lives only in the details section, whose headers are the
# reversed "(<id>) <Name>"), so anchoring on the trailing "(<id>)"
# counts tree nodes exactly once.
NODE_PATTERNS = {
    "shuffle_exchange": r"(?<!Broadcast)Exchange \(\d+\)",
    "broadcast_exchange": r"BroadcastExchange \(\d+\)",
    "parquet_scan": r"Scan parquet",
    "rdd_scan": r"Scan ExistingRDD",
    "bhj": r"BroadcastHashJoin[^\n]*\(\d+\)",
    "smj": r"SortMergeJoin[^\n]*\(\d+\)",
    "shj": r"ShuffledHashJoin[^\n]*\(\d+\)",
    "bnlj": r"BroadcastNestedLoopJoin[^\n]*\(\d+\)",
    "cartesian": r"CartesianProduct[^\n]*\(\d+\)",
    "expand": r"Expand \(\d+\)",
    "generate": r"Generate \(\d+\)",
    "python": r"(?:BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|AggregateInPandas|PythonMapInArrow)[^\n]*\(\d+\)",
}


def count_tree_nodes(plan: str) -> dict[str, int]:
    import re

    tree = plan.split("\n\n", 1)[0]  # numbered tree section only
    return {
        key: len(re.findall(pat, tree)) for key, pat in NODE_PATTERNS.items()
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r22/plan_sweep.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan_sweep")
    specs = load_all()
    sweep: dict[str, dict[str, int]] = {}
    skipped: list[str] = []
    for name in sorted(specs):
        if name.startswith("stream_"):
            skipped.append(name)
            continue
        try:
            df = specs[name].builder(spark, sf_dir)
        except Exception as exc:  # env-gated builders (e.g. missing codecs)
            skipped.append(f"{name} ({type(exc).__name__})")
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        sweep[name] = count_tree_nodes(buf.getvalue())
    result = {"sf_dir": sf_dir, "n_swept": len(sweep), "skipped": skipped,
              "queries": sweep}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(sweep)} plans, {len(skipped)} skipped")
    # top offenders, for the round doc
    top = sorted(sweep.items(), key=lambda kv: -kv[1]["shuffle_exchange"])[:12]
    for n, c in top:
        print(f"{n}: shuffles={c['shuffle_exchange']} bcast={c['broadcast_exchange']} "
              f"scans={c['parquet_scan']} expand={c['expand']} python={c['python']}")
    spark.stop()


if __name__ == "__main__":
    main()
