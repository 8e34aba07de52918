"""Known-values and plan-shape pins for lm_bigram_score (landed r17).

The oracle differential itself runs in tests/test_registry_oracle.py like
every registered query; these are the per-query pins that survived the
staging->landing migration (docs/r17_plan.md step 3): the hand-checked
micro-corpus and the plan shape the docstring claims. The two staging
differential tests (checked-in fixture + fresh seed 99) were retired on
landing — they are redundant with the registry-wide harness plus the
env-gated second-seed sweep.
"""

from __future__ import annotations

import re

from multithreaded_mapreduce_library_spark.plans import final_adaptive_plan
from multithreaded_mapreduce_library_spark.registry import load_all
from tests.test_plans import formatted_plan

SPEC = load_all()["lm_bigram_score"]


def test_lm_bigram_score_plan_shape(spark, sf_dir):
    """Docstring claims, pinned: the only nested-loop join is the 1-row
    vocabulary broadcast (BroadcastNestedLoopJoin over a literal-free
    cross of a 1-row aggregate is fine; a CartesianProduct is not), and
    the model-table joins are equi-joins (hash or sort-merge — never a
    nested loop carrying the bigram stream)."""
    plan = formatted_plan(SPEC.builder(spark, sf_dir))
    assert "CartesianProduct" not in plan

    # "formatted" mode names each node twice (tree + numbered detail);
    # count nodes via the numbered detail entries only
    def nodes(kind: str) -> int:
        return len(re.findall(rf"^\(\d+\) {kind}", plan, re.M))

    # the two model joins + the V cross: exactly ONE nested-loop node,
    # and it must be the broadcast variant (the 1-row V attach)
    assert nodes("BroadcastNestedLoopJoin") == 1
    assert (
        nodes("SortMergeJoin") + nodes("ShuffledHashJoin") + nodes("BroadcastHashJoin")
        >= 2
    ), "both model-table joins must be equi-joins"


def test_lm_bigram_score_reuses_model_exchange(spark, sf_dir):
    """The c_ctx re-agg must REUSE the corpus-scale (w1,w2) shuffle
    rather than recompute it: the explicit not-null filter on bg keeps
    the two c2 subtrees canonically equal (inner-join null-filter
    inference would otherwise make them differ and AQE would run the
    corpus aggregation twice). Reuse only materializes in the FINAL
    adaptive plan, so execute first — and assert on the final section
    ONLY (the toString re-prints the initial plan, where a stale
    ReusedExchange or extra scans could mask a recompute regression).
    Scan budget: exactly THREE FileScans of documents — the model-agg
    subtree, the bg scoring side, and the vocabulary agg (the docstring's
    three corpus passes); c_ctx contributes NO fourth scan because its
    subtree is the pinned ReusedExchange."""
    final = final_adaptive_plan(SPEC.builder(spark, sf_dir))
    assert "ReusedExchange" in final, "model exchange must be reused, not recomputed"
    assert final.count("FileScan parquet") == 3, (
        "lm_bigram_score must scan documents exactly three times "
        "(model agg, scoring side, vocab) — a fourth scan means the "
        "c_ctx exchange reuse regressed"
    )


def test_lm_bigram_score_known_values(spark, tmp_path):
    """Hand-checked micro-corpus: 2 docs over a 3-word vocabulary.
    docs: 'a b a b' and 'b c'. Bigrams: (a,b)x2, (b,a)x1, (b,c)x1.
    c_ctx: a->2, b->2. V=3.
    P(b|a)=(2+1)/(2+3)=0.6  P(a|b)=(1+1)/(2+3)=0.4  P(c|b)=(1+1)/(2+3)=0.4
    doc0 mean = (0.6+0.4+0.6)/3 = 0.533333(3) -> fx sum 1600000/3 ->
    floor(533333.33..+0.5)=533333 -> 0.533333; doc1 = 0.4 exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "micro"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": ["a b a b", "b c"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": pa.array([7, 3], type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_bigram_p"])
        for r in SPEC.builder(spark, str(d)).collect()
    }
    assert got == {0: (3, 0.533333), 1: (1, 0.4)}
