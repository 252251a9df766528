"""Source-wide lint for single-partition windows (VERDICT r5 task 3).

An unpartitioned ``Window.orderBy(...)`` (or an empty/constant
``Window.partitionBy()``) moves its whole input into ONE task. Over an
aggregate-sized relation that is fine — but only if the author SAYS so.
This lint enforces: every such window in the package either

* lives in ``plans/rank.py`` (the range-partitioned implementation that
  exists to avoid the collapse — its one offsets window is O(ranges)), or
* carries a ``bounded:`` comment within the preceding 8 lines naming the
  relation and why its cardinality is aggregate-sized (vocab, days,
  deciles, post-``limit`` top-k, ...).

A new fact-sized global window therefore cannot land without either the
``plans.rank`` helper or a reviewable written claim of boundedness —
the prose-not-plan failure mode VERDICT r4/r5 flagged twice.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "big_data_streaming_spark"

PATTERNS = (
    "Window.orderBy(",
    "Window.partitionBy()",
    "Window.partitionBy(F.lit",
)

LOOKBACK = 8


def test_every_unpartitioned_window_is_declared_bounded_or_ranked():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        if path.name == "rank.py" and path.parent.name == "plans":
            continue
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if not any(p in line for p in PATTERNS):
                continue
            ctx = "\n".join(lines[max(0, i - LOOKBACK) : i + 1]).lower()
            if "bounded" not in ctx:
                offenders.append(f"{path.relative_to(PKG.parent)}:{i + 1}")
    assert not offenders, (
        "unpartitioned window without a 'bounded:' declaration "
        "(use plans.rank.global_order/global_rank/global_ntile for "
        f"fact-sized relations): {offenders}"
    )
