"""Per-round flatness probe for bpe_train's mid-loop re-checkpoint (r14).

Without the re-checkpoint, merge round k replays k-1 literal-pair fold
layers from the single post-wordcount checkpoint, so per-round wall time
GROWS linearly with k (O(k^2) fold evaluations over a run — the scale
gap a real 30k-merge vocab cannot absorb). With re-checkpointing every
BPE_CHECKPOINT_EVERY rounds, at most CHECKPOINT_EVERY fold layers are
live in any round's plan and per-round time is FLAT.

Runs _bpe_train_rules over the sf0.1 documents corpus for N rounds
(default 12, >= the r13 verdict's "flat in a >=12-round probe") twice —
cadence = BPE_CHECKPOINT_EVERY (the shipped path) and cadence = never
(checkpoint_every > rounds, the pre-r14 behavior) — and prints one JSON
line with both per-round timing vectors plus the flatness ratios:
mean(last 3 rounds) / mean(rounds 2-4). Flat ~= 1 for the shipped path;
the no-checkpoint path grows with N. Round 1 is excluded from the
early window on both sides: it materializes the lazy post-wordcount
checkpoint (the one corpus-scale job), which is shared setup cost, not
per-round fold cost.

Usage: python scripts/probe_bpe_rounds.py [rounds] [sf_dir]
Writes nothing; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def run(spark, sf_dir: str, rounds: int, cadence: int) -> list[float]:
    from multithreaded_mapreduce_library_spark.operators.text import (
        _bpe_train_rules,
    )
    from multithreaded_mapreduce_library_spark.sources import load_table

    times: list[float] = []
    docs = load_table(spark, sf_dir, "documents")
    rules = _bpe_train_rules(
        spark,
        docs,
        rounds=rounds,
        checkpoint_every=cadence,
        on_round=lambda step, s: times.append(round(s, 3)),
    )
    if len(rules) < rounds:
        raise SystemExit(
            f"corpus exhausted after {len(rules)} merges — probe needs all"
            f" {rounds} rounds live; use a larger sf_dir"
        )
    return times


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF
    # ratio() compares rounds 2-4 against the LAST 3 rounds; below 7
    # rounds the two windows overlap and even the no-checkpoint path
    # reports ~1.0 "flatness" — a small-rounds invocation would look
    # like passing evidence while measuring nothing (r14 ADVICE).
    if rounds < 7:
        raise SystemExit(
            f"rounds={rounds} < 7: early (2-4) and late (last-3) windows"
            " overlap and the flatness ratio is meaningless; use >= 7"
            " (default 12)"
        )

    from pyspark.sql import SparkSession

    from multithreaded_mapreduce_library_spark.operators.text import (
        BPE_CHECKPOINT_EVERY,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        # warmup: JVM/codegen/scan caches — otherwise whichever variant
        # runs first absorbs session startup into its early rounds and
        # skews the early-window denominator
        run(spark, sf_dir, min(3, rounds), BPE_CHECKPOINT_EVERY)
        ckpt = run(spark, sf_dir, rounds, BPE_CHECKPOINT_EVERY)
        nockpt = run(spark, sf_dir, rounds, rounds + 1)
    finally:
        spark.stop()

    def ratio(ts: list[float]) -> float:
        early = sum(ts[1:4]) / 3  # rounds 2-4: past the shared setup round
        late = sum(ts[-3:]) / 3
        return round(late / early, 2)

    print(
        json.dumps(
            {
                "rounds": rounds,
                "sf_dir": sf_dir,
                "cadence": BPE_CHECKPOINT_EVERY,
                "per_round_checkpointed": ckpt,
                "per_round_no_checkpoint": nockpt,
                "late_over_early_checkpointed": ratio(ckpt),
                "late_over_early_no_checkpoint": ratio(nockpt),
            }
        )
    )


if __name__ == "__main__":
    main()
