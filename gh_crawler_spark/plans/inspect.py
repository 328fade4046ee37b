"""Physical-plan inspection helpers.

The engine's scale claims are properties of the *plans*, not just the results:
filters must reach the parquet scan (PushedFilters), small dims must broadcast,
scalar pipelines must stay inside whole-stage codegen (no Python round-trip),
and scans must prune to the projected columns (ReadSchema). These helpers make
those properties assertable in tests (tests/test_plans.py), so a regression
that silently de-optimizes a plan fails CI — the ".explain and iterate"
discipline, mechanized.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain(mode) captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of the scan nodes ('' if none)."""
    return "\n".join(
        line.strip() for line in explain_str(df).splitlines() if "PushedFilters" in line
    )


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan (column-pruning evidence)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in explain_str(df).splitlines()
        if "ReadSchema:" in line
    ]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def python_eval_nodes(df: DataFrame) -> int:
    """Count of Python-evaluation operators in the plan (ArrowEvalPython for
    pandas UDFs, BatchEvalPython for row UDFs — the engine allows the former
    only where documented, and the latter never)."""
    s = explain_str(df)
    return s.count("BatchEvalPython") + s.count("ArrowEvalPython")


def row_python_eval_nodes(df: DataFrame) -> int:
    return explain_str(df).count("BatchEvalPython")
