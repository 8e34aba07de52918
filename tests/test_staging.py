"""Validation for STAGED (unregistered) flagship candidates.

operators/staging.py is not in registry._OPERATOR_MODULES — nothing here
touches the driver-gated surface. These tests are the pre-landing
evidence the r15 verdict prescribes for new flagships ("pre-staged with a
validated oracle ... the way the seeds alignment was"): the oracle
differential must be green on the checked-in fixture AND on a freshly
generated different-seed fixture (the forcing test — a constant silently
calibrated to one corpus distribution fails on the second). Per-query
known-values and plan-shape pins live alongside each staged spec and
migrate with it on landing.

Both oracle tests parametrize over whatever staged_specs() returns, so an
empty queue (e.g. right after a landing round — the r18 state: all four
r17-staged candidates landed, see staging.py's History) costs nothing and
a new staged spec gets the differential evidence automatically.
"""

from __future__ import annotations

import pytest

from multithreaded_mapreduce_library_spark.operators.staging import staged_specs
from tests.oracle import compare_query

SPECS = staged_specs()

# r17's staging cohort burned 1201 as its forcing seed; the NEXT staging
# round must pick a fresh seed outside scripts/gen_fixture.py::BURNED_SEEDS
# and record it there in the same commit.
FORCING_SEED = 1201


def test_staged_specs_not_registered():
    """A staged spec must not leak into the gated surface: landing means
    MOVING it under @register, not double-registering."""
    from multithreaded_mapreduce_library_spark.registry import load_all

    clash = set(SPECS) & set(load_all())
    assert not clash, f"staged specs already registered: {sorted(clash)}"


def test_forcing_seed_is_registered_as_burned():
    """The canonical burned-seed list lives in scripts/gen_fixture.py
    (r16 verdict hygiene item); a forcing seed that isn't recorded there
    could be re-picked later as a 'fresh' sweep seed."""
    from scripts.gen_fixture import BURNED_SEEDS

    assert FORCING_SEED in BURNED_SEEDS


@pytest.mark.parametrize("name", sorted(SPECS))
def test_staged_matches_oracle(spark, sf_dir, name):
    compare_query(spark, SPECS[name], sf_dir)


@pytest.fixture(scope="session")
def fresh_seed_dir(tmp_path_factory):
    """One forcing-seed fixture shared by every staged differential."""
    from scripts.gen_fixture import generate

    out = str(tmp_path_factory.mktemp(f"staging_seed{FORCING_SEED}"))
    generate(out, seed=FORCING_SEED)
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
def test_staged_matches_oracle_on_fresh_seed(spark, fresh_seed_dir, name):
    """The forcing test: regenerate the fixture at an unburned seed and
    re-run the differential. Runs unconditionally (unlike the env-gated
    full sweep): a few staged queries on one 500-doc fixture cost
    seconds, and landing without this evidence would repeat the pre-r15
    seeds-CTE hazard."""
    compare_query(spark, SPECS[name], fresh_seed_dir)
