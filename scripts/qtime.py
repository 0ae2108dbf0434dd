#!/usr/bin/env python
"""Interleaved wall-time measurement of named contract queries in ONE session.

Usage: python scripts/qtime.py <reps> <query> [<query> ...]

Runs the named queries round-robin (rep 1 of each, rep 2 of each, ...) so
box-weather drift hits all of them equally, then prints per-query medians.
Same session config as bench.py; the timed action is .count() to match the
bench's methodology.  Env: SPARK_GRAFT_SF_DIR (default sf0.1),
SPARK_GRAFT_CPUS (default 32), QTIME_NOOP=1 to time a noop-sink write
instead of count() (guide §1.4 isolation).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    reps, names = int(sys.argv[1]), sys.argv[2:]
    use_noop = os.environ.get("QTIME_NOOP") == "1"

    from pyspark.sql import SparkSession

    from duckdb_age_spark.conf import apply_recommended_conf

    builder = apply_recommended_conf(
        SparkSession.builder.master(f"local[{CPUS}]").appName("qtime"),
        shuffle_partitions=int(CPUS),
    )
    builder = (
        builder
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    try:
        from duckdb_age_spark.jvm import ensure_jar

        jar = ensure_jar()
        builder = (
            builder.config("spark.jars", jar)
            .config("spark.driver.extraClassPath", jar)
            .config("spark.executor.extraClassPath", jar)
        )
    except Exception:
        pass
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from duckdb_age_spark.jvm import register_jvm_crypto

        register_jvm_crypto(spark)
    except Exception:
        pass

    from duckdb_age_spark import contract

    samples: dict[str, list[float]] = {n: [] for n in names}
    rows: dict[str, int] = {}
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = contract.QUERIES[name](spark, SF_DIR)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            samples[name].append(time.time() - t0)
            rows[name] = n
            spark.sparkContext.setJobDescription(None)
    print()
    for name in names:
        s = sorted(samples[name])
        med = s[len(s) // 2]
        print(
            f"{name:36s} median {med:7.3f}  min {s[0]:7.3f}  all "
            + " ".join(f"{x:.2f}" for x in samples[name])
            + f"  rows={rows[name]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
