"""Fingerprint-validated staging cache.

Several queries stage derived copies of the driver's parquet fixtures
under the tempdir (multi-file splits for real multi-micro-batch streams,
mixed-generation directories for schema evolution). Cache validity must
be judged against the SOURCE, not mere existence of the staged files: a
regenerated fixture at the same path would otherwise serve stale rows,
and a crash mid-write would leave a partial dir that "exists" (round-2
review finding). The contract here: the staged dir is valid iff every
wanted file exists AND a ``_source_fingerprint`` marker — written ONLY
after the build completes — records the source's current (size,
mtime_ns). One implementation, shared by every staging site, so the
validity invariant cannot drift between copies (round-3 review
finding)."""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def fingerprint_cached_dir(
    src: str, dst: str, want: list[str], build: Callable[[], None]
) -> str:
    """Return ``dst``, rebuilding it via ``build()`` unless every path in
    ``want`` exists and the marker matches ``src``'s fingerprint."""
    st = os.stat(src)
    fingerprint = f"{st.st_size}:{int(st.st_mtime_ns)}"
    marker = os.path.join(dst, "_source_fingerprint")
    if (
        all(os.path.isfile(p) for p in want)
        and os.path.isfile(marker)
        and open(marker).read() == fingerprint
    ):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    build()
    with open(marker, "w") as fh:
        fh.write(fingerprint)
    return dst
