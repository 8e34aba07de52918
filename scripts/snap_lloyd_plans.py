"""Snapshot the executedPlan of every Lloyd-family gated consumer.

Used to prove that threading the default-off ``narrow`` parameter through
the Lloyd core leaves every gated plan byte-identical (modulo plan ids,
which are normalized out).  Run before and after the edit, diff the
outputs.

Usage: python scripts/snap_lloyd_plans.py OUTFILE [sf_dir]
"""

from __future__ import annotations

import re
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

FAMILY = (
    "ivf_train_centroids",
    "sim_topk_ivf_trained",
    "sim_topk_ivf_quantized",
    "sim_topk_ivfpq",
    "dedup_semantic",
    "dedup_semantic_incremental",
    # stream_dedup_semantic builds a streaming query; its batch-side
    # remainder reuses _assign_to_cells, covered via dedup_semantic_incremental
)


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"\[id=#\w+\]", "[id=N]", plan)
    plan = re.sub(r"ivfq_index_\w+", "ivfq_index_X", plan)
    return plan


def main() -> None:
    out, sf_dir = sys.argv[1], (
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("snap_lloyd_plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from multithreaded_mapreduce_library_spark.registry import load_all

    queries = load_all()
    with open(out, "w") as fh:
        for name in FAMILY:
            df = queries[name].builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            fh.write(f"===== {name} =====\n{normalize(plan)}\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
