"""Validation for STAGED (unregistered) flagship candidates.

operators/staging.py is not in registry._OPERATOR_MODULES — nothing here
touches the driver-gated surface. These tests are the pre-landing
evidence the r15 verdict prescribes for new flagships ("pre-staged with a
validated oracle ... the way the seeds alignment was"): the oracle
differential must be green on the checked-in fixture AND on a freshly
generated different-seed fixture (the forcing test — a constant silently
calibrated to one corpus distribution fails on the second). Per-query
known-values and plan-shape pins live alongside each staged spec and
migrate with it on landing (lm_bigram_score's are now in
tests/test_text_lm.py).

Both tests parametrize over whatever staged_specs() returns, so an empty
queue (e.g. right after a landing) costs nothing and a new staged spec
gets the differential evidence automatically.
"""

from __future__ import annotations

import pytest

from multithreaded_mapreduce_library_spark.operators.staging import staged_specs
from tests.oracle import compare_query

SPECS = staged_specs()


def test_staged_specs_not_registered():
    """A staged spec must not leak into the gated surface: landing means
    MOVING it under @register, not double-registering."""
    from multithreaded_mapreduce_library_spark.registry import load_all

    clash = set(SPECS) & set(load_all())
    assert not clash, f"staged specs already registered: {sorted(clash)}"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_staged_matches_oracle(spark, sf_dir, name):
    compare_query(spark, SPECS[name], sf_dir)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_staged_matches_oracle_on_fresh_seed(spark, tmp_path_factory, name):
    """The forcing test: regenerate the fixture at an unburned seed and
    re-run the differential (burned by sweeps/forcing so far:
    7/73/307/509/641/99). Runs unconditionally (unlike the env-gated full
    sweep): one staged query on one 500-doc fixture costs seconds, and
    landing without this evidence would repeat the pre-r15 seeds-CTE
    hazard."""
    from scripts.gen_fixture import generate

    out = str(tmp_path_factory.mktemp("staging_seed1201"))
    generate(out, seed=1201)
    compare_query(spark, SPECS[name], out)
