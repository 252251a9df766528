"""Source-wide lint for single-partition windows (VERDICT r5 task 3,
hardened per VERDICT r6 task 4).

An unpartitioned ``Window.orderBy(...)`` (or an empty/constant
``Window.partitionBy()``) moves its whole input into ONE task. Over an
aggregate-sized relation that is fine — but only if the author can SHOW
it. This lint enforces three layers; a new fact-sized global window
cannot land without either the ``plans.rank`` helper or passing all of:

1. a ``bounded:`` comment within the preceding 8 lines (the original
   r5 rule — a reviewable written claim exists),
2. the claim must carry RECOGNIZED CARDINALITY EVIDENCE — an ``O(dim)``
   bound over a whitelisted aggregate dimension, an explicit numeric
   row bound, a limit-derived top-k, or a vocabulary-class relation.
   Free prose ("bounded: trust me") fails (r6: "the lint trusts prose"),
3. the per-module occurrence COUNT is pinned. Even a fabricated comment
   with plausible-looking evidence fails the suite until the pin is
   consciously raised in review — additions are loud by construction.
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
PKG = ROOT / "big_data_streaming_spark"

PATTERNS = (
    "Window.orderBy(",
    "Window.partitionBy()",
    "Window.partitionBy(F.lit",
)

LOOKBACK = 8

# Recognized cardinality evidence inside a ``bounded:`` declaration.
# Each class names WHY the windowed relation is aggregate-sized:
EVIDENCE = (
    # explicit numeric bound: "20-row", "10 rows", "<= 9 rows", "5 rows",
    # "≤5 rows", "9 rows", "4 ... keys"
    re.compile(r"(≤|<=)?\s*\d+([- ]row|\s*rows|(\s+[\w-]+){0,3}\s+keys)"),
    # O(dim) over a whitelisted aggregate dimension (days, months, hours,
    # frames, batches, ranges, bands, buckets, sources, types, channels,
    # langs, looks, combos, 1, |...| forms, arithmetic like days²)
    re.compile(
        r"O\(\s*(1|num_ranges|ranges|days|months|hours|frames|batches|"
        r"bands|buckets|looks|\|?\s*(sources|types|channels|langs|"
        r"event_type(s)?|nations?)\s*\|?|max lines per order|"
        r"25 × buckets|days²|days\^2|\|sources\|\^?2|\|sources\|²|"
        r"\|channels\|\^?2|\|channels\|²|\|langs\|·10)\s*\)"
    ),
    # limit-derived: the bound IS the plan (sort+limit above the window)
    re.compile(r"top-k relation|post-limit|sort\+limit|TakeOrdered"),
    # vocabulary-class: Heaps-sublinear token/bigram vocabularies
    re.compile(r"vocab"),
    # aggregate-support classes with a named support set
    re.compile(
        r"(leading-digit|value|k-combo|basket-size|combo|grid|decile|"
        r"quasi-identifier|MV)\s+(support|aggregate|grid)"
        r"|threshold grid|pair grid|release grid|day grid"
    ),
)

# Per-module pins: the number of unpartitioned-window SITES each module
# is allowed. Raising a pin is a conscious review act — state in the
# diff WHY the new window's relation is aggregate-sized (or move it to
# plans/rank.py). plans/rank.py itself is exempt: its single offsets
# window over the O(ranges) size relation is the helper's whole point.
MODULE_PINS = {
    "big_data_streaming_spark/workload/advanced.py": 1,
    # round 7: +2 analytics (q_compaction_advisor O(days),
    # q_quota_apportion O(strata)),
    # +2 relational (q_running_backlog O(days), q_cold_start_suppliers
    # O(months)) — each declared with recognized evidence;
    # +2 late round 7 (q_ransac: 32-row sort+limit seed pairing and the
    # 16-row model-grid consensus rank — both limit-derived bounds)
    # round 8: +2 analytics (q_rescaled_range day index, q_sprt_monitor
    # cumulative look sequence — both O(days) daily aggregates)
    # round 10: +2 analytics (q_pettitt rank + prefix-sum windows — both
    # O(days) day-grid aggregates)
    "big_data_streaming_spark/workload/analytics.py": 51,
    "big_data_streaming_spark/workload/events.py": 1,
    "big_data_streaming_spark/workload/pipeline.py": 3,
    "big_data_streaming_spark/workload/relational.py": 11,
    # round 7: +1 streaming (q_stream_gap_alert, 4 batch keys)
    "big_data_streaming_spark/workload/streaming.py": 6,
    "big_data_streaming_spark/workload/text.py": 10,
}


def _sites() -> dict[str, list[tuple[int, str]]]:
    """(line_no, lookback context) per module for every pattern hit."""
    out: dict[str, list[tuple[int, str]]] = {}
    for path in sorted(PKG.rglob("*.py")):
        if path.name == "rank.py" and path.parent.name == "plans":
            continue
        lines = path.read_text().splitlines()
        rel = path.relative_to(ROOT).as_posix()
        for i, line in enumerate(lines):
            if not any(p in line for p in PATTERNS):
                continue
            ctx = "\n".join(lines[max(0, i - LOOKBACK) : i + 1])
            out.setdefault(rel, []).append((i + 1, ctx))
    return out


def test_every_unpartitioned_window_is_declared_bounded_or_ranked():
    offenders = []
    for rel, sites in _sites().items():
        for lineno, ctx in sites:
            if "bounded" not in ctx.lower():
                offenders.append(f"{rel}:{lineno} (no bounded: declaration)")
    assert not offenders, (
        "unpartitioned window without a 'bounded:' declaration "
        "(use plans.rank.global_order/global_rank/global_ntile for "
        f"fact-sized relations): {offenders}"
    )


def test_bounded_declarations_carry_recognized_evidence():
    """VERDICT r6 task 4: prose alone must not pass. The declaration
    needs an O(dim) bound, a numeric row bound, a limit-derived top-k,
    or a vocabulary/support-class relation — evidence a reviewer can
    check, not a bare adjective."""
    offenders = []
    for rel, sites in _sites().items():
        for lineno, ctx in sites:
            m = re.search(r"bounded:([^\n]*(?:\n#[^\n]*)*)", ctx, re.I)
            if not m:
                continue  # handled by the declaration test above
            # the claim may wrap onto following comment lines up to the
            # window call; take everything from 'bounded:' to the end of
            # the lookback context
            claim = ctx[m.start() :]
            if not any(p.search(claim) for p in EVIDENCE):
                offenders.append(f"{rel}:{lineno} claim={claim[:120]!r}")
    assert not offenders, (
        "bounded: declaration without recognized cardinality evidence "
        "(need O(<whitelisted dim>), an explicit row bound, a "
        f"limit-derived top-k, or a vocabulary-class relation): {offenders}"
    )


def test_unpartitioned_window_site_counts_pinned():
    """Structural backstop: the per-module SITE COUNT is pinned, so any
    new unpartitioned window — even with a plausible-looking bounded:
    comment — fails until the pin is consciously raised in review."""
    counts = {rel: len(sites) for rel, sites in _sites().items()}
    assert counts == MODULE_PINS, {
        "added_or_changed": {
            k: v for k, v in counts.items() if MODULE_PINS.get(k) != v
        },
        "removed": {
            k: v for k, v in MODULE_PINS.items() if k not in counts
        },
    }
