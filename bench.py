"""Benchmark harness — prints ONE JSON line per driver contract.

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Times include the full Spark action
(optimizer + execution + collect of the small result), not session
startup. Derived targets (BASELINE.md): quantized+cached scan should
beat the exact scan ~4x (the preload-speedup analog); everything
within 2x of the reference's single-node throughput at equal scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sqlite-vector-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark import workload as w
    from sqlite_vector_spark.operators.knn_join import knn_join_blocked
    from sqlite_vector_spark.operators.quantize import (
        vector_quantize,
        vector_quantize_preload,
        vector_quantize_scan,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.count()  # warm FS cache / JIT before timing

    times: dict[str, float] = {}

    def bench(name: str, fn, n: int = 1):
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)

    # exact search family (collect is k rows -> negligible)
    bench("full_scan_l2", lambda: w.full_scan_l2(spark, SF_DIR).collect(), n=2)
    bench("full_scan_cosine", lambda: w.full_scan_cosine(spark, SF_DIR).collect(), n=2)
    bench("full_scan_stream_l2", lambda: w.full_scan_stream_l2(spark, SF_DIR).count(), n=2)

    # quantize build (the EP2 two-pass index build) + approximate scan
    import tempfile

    qdir = tempfile.mkdtemp(prefix="svspark_bench_")
    dest = os.path.join(qdir, "codes")
    t0 = time.time()
    params = vector_quantize(emb, "embedding", dest, id_col="vec_id")
    times["quantize_build"] = round(time.time() - t0, 4)

    codes = spark.read.parquet(dest)
    q = w.Q64
    bench("quantize_scan_cold", lambda: vector_quantize_scan(codes, q, params, 20, "L2").collect())
    vector_quantize_preload(codes)  # persist -> the "preload" path
    bench("quantize_scan_preloaded", lambda: vector_quantize_scan(codes, q, params, 20, "L2").collect(), n=3)

    # kNN similarity join (scale path: blocked local top-k)
    queries_local = [(r.vec_id, list(r.embedding)) for r in emb.where(f"vec_id < {w.NQ}").collect()]
    bench(
        "knn_join_blocked",
        lambda: knn_join_blocked(queries_local, emb, w.KNN_K, "L2", corpus_vec="embedding", corpus_id="vec_id").collect(),
        n=2,
    )
    bench("knn_join_window", lambda: w.knn_join_l2(spark, SF_DIR).collect(), n=2)
    bench("recall_at_k", lambda: w.recall_at_k(spark, SF_DIR).collect(), n=2)

    # relational surface
    bench("pricing_summary", lambda: w.pricing_summary(spark, SF_DIR).collect(), n=2)
    bench("top_customers", lambda: w.top_customers(spark, SF_DIR).collect(), n=2)
    bench("shipping_priority", lambda: w.shipping_priority(spark, SF_DIR).collect(), n=2)
    bench("region_volume", lambda: w.region_volume(spark, SF_DIR).collect(), n=2)
    bench("events_hourly", lambda: w.events_hourly(spark, SF_DIR).count(), n=2)
    bench("sessionize", lambda: w.sessionize(spark, SF_DIR).count(), n=2)

    # LLM-pipeline layer: text analysis, dedup, ANN. Best-of-2 so the
    # numbers reflect steady-state throughput, not the one-time
    # whole-stage-codegen compile of the big fold expressions (at real
    # scale that compile amortizes to zero).
    bench("text_stats", lambda: w.text_stats(spark, SF_DIR).count(), n=2)
    bench("minhash_lsh_pairs", lambda: w.lsh_pairs_q(spark, SF_DIR).count(), n=2)
    bench("simhash", lambda: w.simhash_q(spark, SF_DIR).count(), n=2)
    bench("embedding_neardup", lambda: w.embedding_neardup_q(spark, SF_DIR).count(), n=2)
    bench("embedding_code_dedup", lambda: w.embedding_code_dedup_q(spark, SF_DIR).count(), n=2)
    bench("sample_mix", lambda: w.sample_mix_q(spark, SF_DIR).count(), n=2)
    bench("token_budget_pack", lambda: w.token_budget_pack_q(spark, SF_DIR).count(), n=2)
    bench("ivf_scan_l2", lambda: w.ivf_scan_l2(spark, SF_DIR).collect(), n=2)

    total = round(sum(times.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline operator wall-clock at sf" + sf,
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "cpus": int(CPUS),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
