"""Skewed-key behavior of the events window family at 1M events.

sessionize / rolling_user_features partition their windows by
user_id; AQE's skew handling does not apply to window exchanges, so a
power user concentrates one partition. This probe quantifies that:
1M events under a uniform key distribution (1000 users) vs a skewed
one (ONE user owns 50% of all rows), same totals either way.

The point is an honest bound, not a trick: per-user window state is
O(events-of-that-user), so the skewed run's critical path is the hot
user's partition. The numbers tell operators what a power-key costs
and when to pre-split entities (e.g. bot traffic) upstream.

Usage: python tools/window_skew_probe.py [n_events]   (default 1000000)
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("window-skew-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.workload import rolling_user_features

    out = {"n_events": N, "cpus": int(CPUS)}

    def gen(skewed: bool):
        uid = (
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.pmod(F.col("id"), F.lit(1000)))
            if skewed
            else F.pmod(F.col("id"), F.lit(1000))
        )
        return (
            spark.range(N)
            .select(
                F.col("id").alias("event_id"),
                uid.cast("bigint").alias("user_id"),
                (F.col("id") * F.lit(60_000_000)).cast("bigint").alias("ts_us"),  # 1/min
                (F.pmod(F.col("id"), F.lit(1000)).cast("double") / 10.0).alias("value"),
            )
            .localCheckpoint(eager=True)
        )

    for label, skewed in (("uniform", False), ("skewed_50pct_one_user", True)):
        ev = gen(skewed)
        runs = []
        for _ in range(2):  # best-of-2: first run absorbs codegen/JIT warmup
            t = time.time()
            # consume the window outputs (a bare count() lets Catalyst
            # prune the window away entirely)
            row = (
                rolling_user_features(ev, 7 * 86_400 * 1_000_000)
                .agg(F.count(F.lit(1)).alias("n"), F.sum("n_7d").alias("s"), F.sum("sum_value_7d").alias("v"))
                .collect()[0]
            )
            runs.append(time.time() - t)
            assert row.n == N and row.s > 0
        out[f"rolling_{label}_s"] = round(min(runs), 2)
        ev.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
