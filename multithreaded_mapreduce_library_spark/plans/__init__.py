"""Physical-plan audit helpers: assert that the plans Catalyst produces are
the plans we want at scale (pushdown reached the scan, dims broadcast,
aggregates have partial phases, codegen applies)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def final_adaptive_plan(df: DataFrame) -> str:
    """Execute ``df`` and return ONLY the final adaptive plan section.

    Exchange reuse and the true per-table scan count only materialize in
    the EXECUTED plan (AQE re-plans at runtime; the static/formatted plan
    cannot show a silent recompute — the r17 lm_bigram_score lesson,
    CLAUDE.md). ``executedPlan().toString()`` also re-prints the initial
    plan below an ``== Initial Plan ==`` marker, which would double-count
    scans and can show stale ReusedExchange nodes, so callers must assert
    against the final section only — this helper slices it out."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan.split("== Initial Plan ==")[0]


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries from scan nodes."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings from scan nodes (column-pruning evidence)."""
    return re.findall(r"ReadSchema: (.*)", formatted_plan(df))


def has_node(df: DataFrame, node: str) -> bool:
    return node in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (the ``*(n)`` markers in simple
    explain output). Executes the plan first: under AQE the final plan —
    the only one carrying codegen markers — exists only after execution."""
    df.collect()  # count() would spawn a separate QueryExecution
    return len(set(re.findall(r"\*\((\d+)\)", formatted_plan(df, mode="simple"))))
