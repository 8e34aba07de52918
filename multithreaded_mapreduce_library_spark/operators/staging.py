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
  freshly generated different-seed fixture (the forcing test; burned
  seeds so far: 7/73/307/509/641/99 — pick elsewhere);
- a hand-checked known-values micro-corpus test and plan-shape pins,
  added per-query alongside the staged spec;
- landing = move the pair under ``@register`` in its operator module,
  ``scripts/rotate_prefix.py --apply <name>``, migrate the per-query
  tests to the registered spec, and empty this queue.

History: ``lm_bigram_score`` staged r16 here, landed r17 in
operators/text.py (its micro-corpus + plan pins moved to
tests/test_text_lm.py). Current queue below.
"""

from __future__ import annotations

from multithreaded_mapreduce_library_spark.registry import QuerySpec


def staged_specs() -> dict[str, QuerySpec]:
    """The staged (NOT registered) specs, in the registry's own shape so
    tests/oracle.py::compare_query can validate them verbatim. Empty when
    nothing is queued (r17: lm_bigram_score landed; r19 candidates are
    staged here during r17/r18 per the rotation forecast — r18 is the
    cap-0 all-refresh round, so anything new staged now lands in r19)."""
    return {}
