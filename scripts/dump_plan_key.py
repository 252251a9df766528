#!/usr/bin/env python
"""Dump `.explain("formatted")` for the given query keys to
plans/r{N}/<key>_<suffix>.txt (N from $SPARK_GRAFT_ROUND, default 12).

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/dump_plan_key.py before q_a q_b
    ... apply the code change ...
    SPARK_GRAFT_CPUS=32 python scripts/dump_plan_key.py after q_a q_b

Both dumps come from the SAME invocation path and session construction
(get_spark + default confs + sf0.1), so before/after files are
condition-identical (VERDICT r11 item 9's dump-condition hygiene): the
only delta between a _before and _after file is the code change itself.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "12")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{rnd}",
    )
    os.makedirs(out_dir, exist_ok=True)

    from big_data_streaming_spark.plans.explain import formatted_plan
    from big_data_streaming_spark.session import get_spark
    from big_data_streaming_spark.workload import QUERIES

    spark = get_spark("plan-dump-key")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
