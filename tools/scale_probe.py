"""Scale probe: the reference's headline workload (1M x 768-dim ANN,
API.md:253-255) run on this engine, plus the preload-speedup analog.

Generates a deterministic synthetic corpus IN-PLAN (spark.range +
expression-built vectors — no driver materialization), writes it as
Parquet, then times:
  - exact kNN (vector_full_scan, codegen fold + TakeOrderedAndProject)
  - quantize build (two-pass, EP2)
  - quantized kNN cold (shadow-table scan)
  - quantized kNN preloaded (persist = the reference's preload buffer)
and reports recall@k of quantized-vs-exact — BASELINE.md's >= 0.95 bar.

Usage: python tools/scale_probe.py [n_rows] [dim]   (default 1000000 768)
Prints one JSON line; paste results into SCALE.md.
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
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.quantize import (
        vector_quantize,
        vector_quantize_preload,
        vector_quantize_scan,
    )
    from sqlite_vector_spark.operators.search import full_scan

    root = tempfile.mkdtemp(prefix="svspark_probe_")
    base = os.path.join(root, "base")
    shadow = os.path.join(root, "shadow")
    out = {"n": N, "dim": DIM, "k": K, "cpus": int(CPUS)}

    # deterministic synthetic corpus, built JVM-side: v[j] = sin(id*(j+1) * 1e-5)
    # (dense, mixed-sign, no two rows identical)
    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: F.sin(F.col("id").cast("double") * j.cast("double") * F.lit(1e-5)).cast("float"),
        ).alias("embedding"),
    )
    t0 = time.time()
    gen.write.mode("overwrite").parquet(base)
    out["gen_write_s"] = round(time.time() - t0, 2)
    df = spark.read.parquet(base)

    q = [0.5 * (1 if j % 2 == 0 else -1) * ((j % 97) / 97.0) for j in range(DIM)]

    def timed(name, fn, n=2):
        best = None
        for _ in range(n):
            t = time.time()
            r = fn()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        return r

    exact = timed("exact_knn_s", lambda: full_scan(df, "embedding", q, K, "L2", id_col="vec_id").collect())

    # the "SIMD" analog: Arrow-batched NumPy kernel (reference
    # dispatches SSE2/AVX2/NEON the same way, distance-cpu.c:797-812)
    from sqlite_vector_spark.version import set_backend

    set_backend("arrow-numpy")
    timed("exact_knn_numpy_s", lambda: full_scan(df, "embedding", q, K, "L2", id_col="vec_id").collect())
    set_backend("codegen")

    t0 = time.time()
    params = vector_quantize(df, "embedding", shadow, id_col="vec_id")
    out["quantize_build_s"] = round(time.time() - t0, 2)

    # Arrow/NumPy encode backend: bit-identical codes, vectorized batches
    set_backend("arrow-numpy")
    t0 = time.time()
    vector_quantize(df, "embedding", shadow + "_np", id_col="vec_id")
    out["quantize_build_numpy_s"] = round(time.time() - t0, 2)
    set_backend("codegen")

    codes = spark.read.parquet(shadow)

    timed("quantized_knn_cold_s", lambda: vector_quantize_scan(codes, q, params, K, "L2").collect(), n=1)
    vector_quantize_preload(codes)
    approx = timed("quantized_knn_preloaded_s", lambda: vector_quantize_scan(codes, q, params, K, "L2").collect(), n=3)
    # the same preloaded scan on the Arrow/NumPy backend (what "auto"
    # — the production default — dispatches literal-query scans to):
    # the codegen arm above is COMPUTE-bound (interpreted per-element
    # fold, same element count int8 or f32, so the f32->int8 bytes
    # ratio cannot show); the Arrow arm is bytes->BLAS, where it can
    set_backend("arrow-numpy")
    timed("quantized_knn_preloaded_numpy_s",
          lambda: vector_quantize_scan(codes, q, params, K, "L2").collect(), n=3)
    set_backend("codegen")

    exact_ids = {r.id for r in exact}
    approx_ids = {r.id for r in approx}
    out["recall_at_k"] = round(len(exact_ids & approx_ids) / K, 4)
    out["preload_speedup_x"] = round(out["quantized_knn_cold_s"] / out["quantized_knn_preloaded_s"], 2)
    out["quantized_vs_exact_x"] = round(out["exact_knn_s"] / out["quantized_knn_preloaded_s"], 2)
    out["quantized_vs_exact_numpy_x"] = round(
        out["exact_knn_numpy_s"] / out["quantized_knn_preloaded_numpy_s"], 2
    )

    # IVF at realistic C through the arrow-numpy assignment backend:
    # C=256 x dim literals would bloat codegen (~200k literal plan);
    # "auto" resolves assignment to the Arrow kernel (centroid matrix
    # in the UDF closure, O(1) plan), the store is partitionBy(cluster),
    # and the probe scan must hit PartitionFilters pruning.
    from sqlite_vector_spark.operators.ann import ivf_store, ivf_stored_scan

    set_backend("auto")
    ivf_c = int(os.environ.get("SPARK_GRAFT_IVF_C", "256"))
    nprobe = max(1, ivf_c // 16)
    cent = [[float(x) for x in r.embedding] for r in df.orderBy("vec_id").limit(ivf_c).collect()]
    ivf_dir = os.path.join(root, "ivf")
    t0 = time.time()
    ivf_store(df, "embedding", cent, ivf_dir, id_col="vec_id")
    out["ivf_c"] = ivf_c
    out["ivf_store_s"] = round(time.time() - t0, 2)
    ivf_hits = timed(
        "ivf_scan_s",
        lambda: ivf_stored_scan(spark, ivf_dir, q, cent, K, nprobe=nprobe).collect(),
    )
    out["ivf_recall_at_k"] = round(len(exact_ids & {r.id for r in ivf_hits}) / K, 4)

    # PQ / IVF-PQ at the 100 TB geometry: M=16 subspaces, KSUB=256
    # entries -> 16 bytes/row vs dim*4 (192x at dim=768). Codebooks
    # are kmeans++-seeded and Lloyd-refined on a bounded sample-driven
    # job; encode and ADC run through the Arrow kernels (auto
    # dispatch: m*ksub = 4096 folds >> AUTO_PQ_FOLDS).
    from sqlite_vector_spark.operators.pq import (
        ivf_pq_store,
        ivf_pq_stored_scan,
        pq_encode,
        pq_fit,
        pq_memory_bytes,
        pq_rerank_scan,
        pq_scan,
    )

    pq_m = int(os.environ.get("SPARK_GRAFT_PQ_M", "16"))
    pq_ksub = int(os.environ.get("SPARK_GRAFT_PQ_KSUB", "256"))
    out["pq_m"], out["pq_ksub"] = pq_m, pq_ksub
    t0 = time.time()
    books = pq_fit(df, "embedding", pq_m, pq_ksub, DIM, iters=2, id_col="vec_id", init="kmeans++")
    out["pq_fit_s"] = round(time.time() - t0, 2)
    pq_dir = os.path.join(root, "pq_codes")
    t0 = time.time()
    pq_encode(df, "embedding", books, id_col="vec_id").write.mode("overwrite").parquet(pq_dir)
    out["pq_encode_write_s"] = round(time.time() - t0, 2)
    codes_df = spark.read.parquet(pq_dir)
    pq_hits = timed("pq_scan_adc_s", lambda: pq_scan(codes_df, q, books, K, "L2").collect(), n=3)
    out["pq_recall_at_k"] = round(len(exact_ids & {r.id for r in pq_hits}) / K, 4)
    rr_hits = timed(
        "pq_rerank_s",
        lambda: pq_rerank_scan(df, "embedding", q, books, K, 10 * K, "L2", id_col="vec_id", codes_df=codes_df).collect(),
        n=2,
    )
    out["pq_rerank_recall_at_k"] = round(len(exact_ids & {r.id for r in rr_hits}) / K, 4)
    out["pq_adc_vs_exact_x"] = round(out["exact_knn_s"] / out["pq_scan_adc_s"], 2)
    est = pq_memory_bytes(N, DIM, pq_m, pq_ksub)
    out["pq_compression_x"] = round(est["compression"], 1)

    ivfpq_dir = os.path.join(root, "ivfpq")
    t0 = time.time()
    ivf_pq_store(df, "embedding", cent, books, ivfpq_dir, id_col="vec_id")
    out["ivf_pq_store_s"] = round(time.time() - t0, 2)
    ipq_hits = timed(
        "ivf_pq_scan_s",
        lambda: ivf_pq_stored_scan(spark, ivfpq_dir, q, cent, books, K, nprobe=nprobe).collect(),
        n=3,
    )
    out["ivf_pq_recall_at_k"] = round(len(exact_ids & {r.id for r in ipq_hits}) / K, 4)
    out["ivf_pq_vs_exact_x"] = round(out["exact_knn_s"] / out["ivf_pq_scan_s"], 2)
    # 1-bit binary quantization, PROJECTED form (SimHash planes over
    # mean-centered vectors — the production recipe; axis-aligned sign
    # bits collapse into Hamming ties on this smooth correlated
    # manifold, measured recall 0 at any prefilter below ~2%):
    # p=256 planes -> 32 B/row (96x vs f32), Hamming prefilter + exact
    # rerank
    import numpy as np

    from sqlite_vector_spark.operators.bq import (
        bq_project_encode,
        bq_project_rerank_scan,
        bq_random_planes,
    )

    bq_p = int(os.environ.get("SPARK_GRAFT_BQ_PLANES", "256"))
    out["bq_planes"] = bq_p
    planes = bq_random_planes(DIM, bq_p, seed=7)
    samp = np.array(
        [r.embedding for r in df.orderBy(F.xxhash64("vec_id")).limit(8192).collect()],
        dtype=np.float64,
    )
    mu = [float(x) for x in samp.mean(0)]
    bq_dir = os.path.join(root, "bq_codes")
    t0 = time.time()
    bq_project_encode(df, "embedding", planes, center=mu, id_col="vec_id").write.mode(
        "overwrite"
    ).parquet(bq_dir)
    out["bq_encode_write_s"] = round(time.time() - t0, 2)
    bq_codes = spark.read.parquet(bq_dir)
    bqr_hits = timed(
        "bq_rerank_s",
        lambda: bq_project_rerank_scan(
            df, "embedding", q, planes, K, 50 * K, center=mu, id_col="vec_id", codes_df=bq_codes
        ).collect(),
        n=2,
    )
    out["bq_rerank_recall_at_k"] = round(len(exact_ids & {r.id for r in bqr_hits}) / K, 4)
    set_backend("codegen")

    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
