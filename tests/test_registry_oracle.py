"""Oracle-differential test for every registered query with an oracle.

This is a local replica of the driver's CORRECTNESS gate (at sf0.001 for
speed; the driver runs sf0.01).
"""

from __future__ import annotations

import pytest

from multithreaded_mapreduce_library_spark.registry import load_all

SPECS = load_all()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    from tests.oracle import compare_query

    compare_query(spark, SPECS[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = SPECS[name].builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert "wordcount" in q
