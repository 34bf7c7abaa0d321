"""recall_at_k at a scan-dominated scale: two-scan arm vs the r15
single-pass arm (VERDICT r14 #9).

Synthesizes an N x D float32 embeddings.parquet (deterministic
id-seeded pseudo-noise, so it neither compresses away nor drifts
between runs) big enough that Catalyst's size estimate crosses
RECALL_SINGLE_PASS_MIN_BYTES, then times both arms interleaved
(min-of-R) in ONE session and checks their collected rows are equal.

Usage: python tools/recall_scale_probe.py [n_rows] [dim] [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 128
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import sqlite_vector_spark.workload as w
    from sqlite_vector_spark.sources import plan_size_bytes, table

    root = tempfile.mkdtemp(prefix="recall_probe_")
    try:
        # deterministic high-entropy floats in [-1, 1): xxhash64 of
        # (id, j) scaled — uncompressible, reproducible
        dims = ",".join(
            f"cast(cast(xxhash64(id, {j}) as double) / 9.223372036854776e18 as float)"
            for j in range(DIM)
        )
        (
            spark.range(N)
            .selectExpr("id as vec_id", f"array({dims}) as embedding", "cast(id % 7 as int) as label")
            .write.mode("overwrite")
            .parquet(os.path.join(root, "embeddings.parquet"))
        )
        est = plan_size_bytes(table(spark, root, "embeddings"))
        spark.sparkContext.setJobDescription("recall_scale_probe warmup")
        w.recall_at_k(spark, root).count()  # codegen/JIT warm-up (two-scan default? gate decides)
        res = {"two_scan": [], "single_pass": []}
        rows = {}
        for r in range(RUNS):
            for arm, thresh in (("two_scan", 1 << 60), ("single_pass", 0)):
                w.RECALL_SINGLE_PASS_MIN_BYTES = thresh
                spark.sparkContext.setJobDescription(f"recall_at_k {arm} run{r}")
                t0 = time.time()
                got = sorted(map(tuple, w.recall_at_k(spark, root).collect()))
                res[arm].append(round(time.time() - t0, 3))
                rows[arm] = got
        print(json.dumps({
            "n": N, "dim": DIM, "cpus": int(CPUS),
            "plan_size_bytes": est,
            "gate_default_takes_single_pass": bool(est is None or est >= (256 << 20)),
            "two_scan_s": res["two_scan"], "single_pass_s": res["single_pass"],
            "two_scan_min": min(res["two_scan"]), "single_pass_min": min(res["single_pass"]),
            "rows_equal": rows["two_scan"] == rows["single_pass"],
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
