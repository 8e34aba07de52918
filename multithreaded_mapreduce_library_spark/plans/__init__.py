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
