#!/usr/bin/env python
"""Compare two bench JSON files (the one-line `bench.py` output / the
driver's BENCH_r{N}.json) per query and flag regressions.

    python scripts/compare_bench.py BENCH_r01.json BENCH_r02.json [pct]

Prints queries present in both files whose time grew by more than `pct`
(default 25%), queries that disappeared, and new queries — so a round-
over-round slowdown is visible per query instead of hiding inside a
headline total that changes size every round (BENCH_NOTES policy:
totals across rounds are NOT comparable, per-query times are).
Exit code 1 if any regression exceeds the threshold.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        text = fh.read().strip()
    # Three accepted shapes: bench.py's bare one-liner, the driver's
    # BENCH_r{N}.json wrapper (bench stdout inside "tail"), or logs
    # followed by the JSON line.
    try:
        doc = json.loads(text)
        if "queries" in doc:
            return doc["queries"]
        if "tail" in doc:
            text = doc["tail"]
    except json.JSONDecodeError:
        pass
    # bench.py prints TWO lines since round 4 (full per-query detail,
    # then a compact <500-char headline carrying only the 8 slowest
    # queries). When the captured text holds both, the regression
    # compare must use the DETAIL line — otherwise the diff silently
    # shrinks to the shared slowest keys. Pick the candidate line with
    # the LARGEST queries map, not the last one.
    best: dict[str, float] | None = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            try:
                q = json.loads(line)["queries"]
            except (json.JSONDecodeError, KeyError):
                continue
            if best is None or len(q) > len(best):
                best = q
    if best is not None:
        return best
    raise SystemExit(f"no bench JSON with a 'queries' map found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0

    regressions = []
    for name in sorted(old.keys() & new.keys()):
        o, n = old[name], new[name]
        # bench.py rounds to 3 decimals, so 0.000 means "sub-ms"; treat a
        # jump from 0.000 to anything measurable as a regression too
        # instead of silently exempting it
        if (o > 0 and (n - o) / o * 100 > pct) or (o == 0 and n >= 0.05):
            growth = (n - o) / o * 100 if o > 0 else float("inf")
            regressions.append((name, o, n, growth))
    for name, o, n, growth in regressions:
        g = f"+{growth:.0f}%" if growth != float("inf") else "from 0.000s"
        print(f"REGRESSION {name}: {o:.3f}s -> {n:.3f}s ({g})")
    for name in sorted(old.keys() - new.keys()):
        print(f"REMOVED    {name}: was {old[name]:.3f}s")
    for name in sorted(new.keys() - old.keys()):
        print(f"NEW        {name}: {new[name]:.3f}s")
    common = old.keys() & new.keys()
    if common:
        to, tn = sum(old[k] for k in common), sum(new[k] for k in common)
        delta = f" ({(tn - to) / to * 100:+.1f}%)" if to > 0 else ""
        print(
            f"comparable subtotal ({len(common)} queries): "
            f"{to:.2f}s -> {tn:.2f}s{delta}"
        )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
