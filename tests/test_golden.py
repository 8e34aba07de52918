"""Golden-output test for the flagship entry() smoke (SURVEY.md §5.2:
golden outputs only for the flagship at sf0.001). Pins the exact word
counts so any tokenizer/emit-semantics regression is caught without the
oracle in the loop."""

from __future__ import annotations

GOLDEN_SF = "/root/testdata/sf0.001"

# counts verified against the DuckDB oracle and the reference tokenization
# semantics (split on " \t\n\r", drop empty tokens)
GOLDEN_TOTAL_WORDS = 31


def test_entry_golden(spark):
    import __spark_entry__ as e

    rows = {r["word"]: r["cnt"] for r in e.entry(spark).collect()}
    assert len(rows) == GOLDEN_TOTAL_WORDS
    # spot values pinned from the fixture corpus (seed=42, immutable)
    assert rows["a"] == 931
    assert rows["the"] == 910
    assert sum(rows.values()) == 27939
    assert all(cnt > 0 for cnt in rows.values())
    assert all(w == w.strip() and w for w in rows)
