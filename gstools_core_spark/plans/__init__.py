"""Physical-plan inspection helpers: make "is the plan the one we want?"
an assertable property (broadcasts chosen, filters pushed, columns pruned,
codegen spans present) instead of a guess.  Used by tests/test_plans.py."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame) -> None:
    p = plan_string(df)
    assert "Broadcast" in p, f"expected a broadcast join in plan:\n{p}"


def assert_no_cartesian(df: DataFrame) -> None:
    p = plan_string(df)
    assert "CartesianProduct" not in p, f"unexpected cartesian product:\n{p}"


def assert_pushed_filters(df: DataFrame) -> None:
    p = plan_string(df)
    assert "PushedFilters: [" in p
    pushed = [
        line for line in p.splitlines() if "PushedFilters" in line and "[]" not in line
    ]
    assert pushed, f"no filters pushed into the scan:\n{p}"


def scan_read_schema(df: DataFrame) -> list[str]:
    p = plan_string(df)
    cols: list[str] = []
    for line in p.splitlines():
        if "ReadSchema" in line:
            schema = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in schema.split(",") if ":" in f)
    return cols
