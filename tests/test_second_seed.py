"""Second-seed oracle sweep (VERDICT r4 'What's missing' #2).

Runs the full oracle-differential suite against a fixture generated at a
DIFFERENT seed than the checked-in seed-42 data — the only check that can
catch a constant silently calibrated to the one fixture (mime arithmetic,
modulo filters, df-cutoff headroom, split buckets). Both engines read the
same regenerated files, so any hash mismatch here is a real
data-dependence bug, not a data change.

Gated behind SPARK_GRAFT_SECOND_SEED=1 (it duplicates the whole oracle
suite, ~3-4 min) so the default `pytest tests/` stays inside its budget:

    SPARK_GRAFT_SECOND_SEED=1 python -m pytest tests/test_second_seed.py -q

Any value > 1 is used as the generator seed itself (=1 keeps the
historical seed 7), so N independent sweeps cost nothing to add:

    SPARK_GRAFT_SECOND_SEED=13 python -m pytest tests/test_second_seed.py -q
"""

from __future__ import annotations

import os

import pytest

from tests.test_registry_oracle import ORACLE_NAMES, SPECS

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SECOND_SEED"),
    reason="second-seed sweep runs only with SPARK_GRAFT_SECOND_SEED=1",
)


@pytest.fixture(scope="session")
def seed7_dir(tmp_path_factory) -> str:
    from scripts.gen_fixture import generate

    raw = os.environ.get("SPARK_GRAFT_SECOND_SEED", "")
    seed = int(raw) if raw.isdigit() and int(raw) > 1 else 7
    out = str(tmp_path_factory.mktemp(f"seed{seed}_fixture"))
    generate(out, seed=seed)
    return out


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle_on_second_seed(spark, seed7_dir, name):
    from tests.oracle import compare_query

    compare_query(spark, SPECS[name], seed7_dir)
