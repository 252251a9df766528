#!/usr/bin/env python
"""Registry-WIDE partitioning-invariance sweep.

tests/test_partitioning_invariance.py pins bit-identical results under
5 vs 32 shuffle partitions for a 270+-key float-bearing slice. This
script extends the certification to EVERY registry key (including the
rows-only LSH/ANN family — their values are engine-specific but must
still be stable within Spark), and stresses one more axis the test
does not: the INPUT SPLIT. Config B shrinks
``spark.sql.files.maxPartitionBytes`` to 1 MiB so every parquet scan is
carved into many more tasks — a query whose result depends on scan-task
boundaries (sampled range partitioners, first()-style picks, per-task
accumulation order) would differ even if it survives the shuffle axis.

Writes INVARIANCE_r{N}.json (N from $SPARK_GRAFT_ROUND, else "latest")
with per-key status: "invariant", "VARIES", or "ERROR".

Usage: python scripts/invariance_sweep_all.py [sf_dir] [--keys k1,k2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONF_A = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}
CONF_B = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
}

# --axis=aqe swaps the axes: same partitioning both sides, AQE on vs
# OFF. Adaptive execution rewrites plans at runtime (partition
# coalescing, skew-join splits, broadcast demotion) — a result that
# depends on any of those rewrites would differ here even though both
# partitioning axes pass.
CONF_AQE_ON = {"spark.sql.adaptive.enabled": "true"}
CONF_AQE_OFF = {"spark.sql.adaptive.enabled": "false"}

# --axis=ansi: ANSI SQL mode on vs OFF. The modes disagree on
# division-by-zero (error vs NULL), integral overflow (error vs wrap),
# and lossy casts (error vs NULL/truncate) — a query that only works
# because ANSI catches (or silently absorbs) one of those would differ
# or ERROR here. The workload is written to be mode-independent by
# construction (explicit try_cast/try_* where tolerance is the
# semantics, zero-guarded divisions, headroom-checked hash arithmetic);
# this axis proves it holds for every key, so the grading driver's
# session defaults cannot matter.
CONF_ANSI_ON = {"spark.sql.ansi.enabled": "true"}
CONF_ANSI_OFF = {"spark.sql.ansi.enabled": "false"}

# --axis=codegen: whole-stage codegen on vs OFF (fully interpreted
# expression evaluation). Compiled and interpreted paths are separate
# implementations of every expression — the closest available thing to
# a third engine beside Spark-codegen and DuckDB. A kernel whose result
# leaks Janino-specific arithmetic or short-circuit behavior would
# differ here.
CONF_CG_ON = {"spark.sql.codegen.wholeStage": "true"}
CONF_CG_OFF = {
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.codegen.factoryMode": "NO_CODEGEN",
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = None
    axis = "partitioning"
    for a in sys.argv[1:]:
        if a.startswith("--keys"):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--axis"):
            axis = a.split("=", 1)[1]
    conf_a, conf_b = {
        "aqe": (CONF_AQE_ON, CONF_AQE_OFF),
        "ansi": (CONF_ANSI_ON, CONF_ANSI_OFF),
        "codegen": (CONF_CG_ON, CONF_CG_OFF),
        "partitioning": (CONF_A, CONF_B),
    }[axis]

    from pyspark.sql import SparkSession

    from big_data_streaming_spark.workload import QUERIES

    # Explicit heap: at sf0.1 the 1 MiB-split config pushes sort-heavy
    # keys past the default local-mode driver heap (observed
    # java.lang.OutOfMemoryError at key ~451/587, which then cascaded
    # 129 connection-refused ERRORs — NOT variance). Results never
    # depend on heap size, only completion does.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def rows(name: str, conf: dict) -> list[str]:
        prev = {k: spark.conf.get(k) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            return sorted(map(repr, QUERIES[name](spark, sf_dir).collect()))
        finally:
            for k, v in prev.items():
                spark.conf.set(k, v)

    out: dict[str, dict] = {}
    t0 = time.time()
    names = [n for n in QUERIES if only is None or n in only]
    for i, name in enumerate(names):
        try:
            a = rows(name, conf_a)
            b = rows(name, conf_b)
            out[name] = {
                "status": "invariant" if a == b else "VARIES",
                "rows": len(a),
            }
            if a != b:
                diff = [x for x in a if x not in set(b)][:3]
                out[name]["sample_only_in_A"] = diff
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            out[name] = {"status": "ERROR", "error": str(exc)[:400]}
        if (i + 1) % 25 == 0:
            bad = sum(1 for v in out.values() if v["status"] != "invariant")
            print(
                f"[{i + 1}/{len(names)}] {time.time() - t0:.0f}s"
                f" non-invariant-or-error={bad}",
                flush=True,
            )

    n_bad = [k for k, v in out.items() if v["status"] != "invariant"]
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "latest")
    tag = rnd.zfill(2) if rnd.isdigit() else rnd
    if axis != "partitioning":
        tag += f"_{axis}"
    path = os.path.join(REPO, f"INVARIANCE_r{tag}.json")
    with open(path, "w") as fh:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from provenance import stamp

        json.dump(
            {
                **stamp(),  # tree SHA + UTC (VERDICT r10 task 3)
                "sf_dir": sf_dir,
                "axes": {"aqe": "AQE on vs off (fixed partitioning)", "ansi": "ANSI mode on vs off (fixed partitioning)", "codegen": "whole-stage codegen on vs fully interpreted", "partitioning": "shuffle.partitions 5 vs 32 AND maxPartitionBytes 128MiB vs 1MiB"}[axis],
                "n_keys": len(names),
                "invariant": len(names) - len(n_bad),
                "bad": n_bad,
                "elapsed_s": round(time.time() - t0, 1),
                "keys": out,
            },
            fh,
            indent=1,
        )
    print(f"wrote {path}: {len(names) - len(n_bad)}/{len(names)} invariant; bad={n_bad}")


if __name__ == "__main__":
    main()
