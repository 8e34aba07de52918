"""STAGED (unregistered) flagship candidates — the landing queue.

This module is deliberately NOT in registry._OPERATOR_MODULES: importing
it registers nothing, so the driver-gated surface is untouched. It exists
so a new flagship can land the way the r15 Lloyd seeds-CTE alignment and
the r17 ``lm_bigram_score`` did (r15 verdict: "pre-staged with a
validated oracle ... default-off or unregistered prototype first"):
builder + oracle written and oracle-validated one round, registered +
prefix-rotated the next.

Protocol (tests/test_staging.py enforces the evidence automatically for
anything returned by ``staged_specs()``):
- builder + oracle in the registry's own ``QuerySpec`` shape;
- oracle differential green on the checked-in seed-42 fixture AND on a
  freshly generated different-seed fixture (the forcing test; pick a
  seed outside scripts/gen_fixture.py::BURNED_SEEDS — the canonical
  registry — and record it there in the same commit);
- a hand-checked known-values micro-corpus test and plan-shape pins,
  added per-query alongside the staged spec;
- landing = move the pair under ``@register`` in its operator module,
  ``scripts/rotate_prefix.py --apply <name>...``, migrate the per-query
  tests to the registered spec, and empty this queue.

History:
- ``lm_bigram_score`` staged r16, landed r17 in operators/text.py (its
  micro-corpus + plan pins moved to tests/test_text_lm.py).
- ``doc_ngram_novelty`` / ``source_divergence`` staged r17, landed r18
  in operators/text.py (pins in tests/test_text_lm.py);
  ``embedding_outliers`` staged r17, landed r18 in
  operators/similarity.py (pins in tests/test_plans.py's Lloyd
  section); ``stream_lm_score`` (the optional 4th — CORRECTNESS_r17
  was 50/50 green so its slot was free) staged r17, landed r18 in
  streaming/queries.py (known-values + multi-batch settle in
  tests/test_streaming.py).

The queue is currently EMPTY: r19 is the all-refresh round (the r15-green
cohort must lead the prefix with a changed-set cap of 0 — see the
_PRIORITY prose and docs/r19_plan.md), so nothing may land in r19 and
anything staged during r18/r19 lands r20 at the earliest.
"""

from __future__ import annotations

from multithreaded_mapreduce_library_spark.registry import QuerySpec


def staged_specs() -> dict[str, QuerySpec]:
    """The staged (NOT registered) specs, in the registry's own shape so
    tests/oracle.py::compare_query can validate them verbatim. Empty
    right after a landing round."""
    return {}
