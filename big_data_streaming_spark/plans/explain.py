"""Physical-plan introspection — the engine's "is this the plan I'd want
at 100 TB?" feedback loop.

SURVEY.md §4.2 lists what Catalyst must be giving us for free (pushdown,
pruning, broadcast selection, TakeOrderedAndProject). These helpers parse
``explain("formatted")`` output so tests can ASSERT those properties
instead of trusting them — a filter that silently stops reaching the scan
is a 100× regression at scale with zero correctness signal at sf0.01.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates that reached a datasource scan (PushedFilters)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (ReadSchema) — the check that
    projection pruning reached the parquet reader."""
    plan = formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":", 1)[0].strip() for c in m.group(1).split(",") if ":" in c
        ]
        schemas.append(cols)
    return schemas


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of Window operators with NO partition spec — each one
    collapses its whole input into a single task ("Moving all data to a
    single partition"). Over an aggregate-sized relation that is fine;
    over a fact-sized one it is the 100 TB scale-killer that
    ``plans.rank.global_rank`` exists to avoid. Tests pin the count so a
    refactor cannot silently reintroduce a global sort.

    Detection: in the detail section each Window node prints its
    ``windowspecdefinition(part..., order ASC/DESC ..., frame)``; an
    unpartitioned spec's FIRST argument is already an ordering column
    (carries ``ASC NULLS``/``DESC NULLS``) or, for an order-less frame
    (``partitionBy()``), the frame itself.
    """
    plan = formatted_plan(df)
    count = 0
    for block in re.split(r"^\(\d+\) ", plan, flags=re.MULTILINE):
        if not block.startswith("Window"):
            continue
        specs = re.findall(r"windowspecdefinition\(([^()]*(?:\([^()]*\))?)", block)
        for spec in specs:
            first = spec.split(",", 1)[0].strip()
            if (
                " ASC NULLS" in first
                or " DESC NULLS" in first
                or first.startswith("specifiedwindowframe")
            ):
                count += 1
                break  # one hit per Window node
    return count


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan — the metric to
    minimize; every unit is a full repartition of the data. Counts the
    detail headers (``(N) Exchange``) so each node counts once (the tree
    rendering repeats every operator)."""
    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE))
