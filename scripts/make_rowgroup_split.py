"""Write a row-group-split copy of an SF directory (BENCH_NOTES round-2
finding: the driver regenerates sf0.1 parquet as ONE row group per file,
which caps scan+partial-agg parallelism at ~1 task regardless of
local[32] — representative clusters have plentiful row groups).

Usage: python scripts/make_rowgroup_split.py [src_sf_dir] [dst_dir] [rows]

The copy lands (by default) under the repo's gitignored
``.testdata-local/`` so the driver's files stay untouched; bench.py can
then be pointed at it via SPARK_GRAFT_SF_DIR for scan-parallelism-
sensitive timings (q_groupby_agg, q_rollup, q_tpch_q1).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, ".testdata-local", os.path.basename(src.rstrip("/")))
    )
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    os.makedirs(dst, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, fname))
        pq.write_table(t, os.path.join(dst, fname), row_group_size=rows)
        meta = pq.ParquetFile(os.path.join(dst, fname)).metadata
        print(f"{fname}: {t.num_rows} rows -> {meta.num_row_groups} row groups")
    print(dst)


if __name__ == "__main__":
    main()
