"""Artifact provenance stamp (VERDICT r10 task 3): every committed
PREFLIGHT/INVARIANCE/BENCH/anchor artifact embeds the tree SHA and a UTC
timestamp AT GENERATION TIME, so closing-tree chronology is provable
from the artifact itself instead of narrated from file mtimes. An
artifact whose recorded SHA differs from the closing HEAD must be
re-run on the final tree."""

from __future__ import annotations

import os
import subprocess
import time


def stamp() -> dict[str, str | bool]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        sha = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "-C", repo, "status", "--porcelain"],
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
        )
    except Exception:
        sha, dirty = "unknown", True
    return {
        "tree_sha": sha or "unknown",
        "tree_dirty": dirty,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
