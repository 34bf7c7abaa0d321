"""Embedding-pipeline probe at 10M x 768 (round 14, VERDICT r13 #6).

Ten times the usual 1M probe scale (~30 GB of float32 vectors — the
largest shape that fits this box's disk beside its own store copy),
aimed at the cliffs sf0.1 and the 1M probes cannot show:

1. the embedding near-dup chain (hyperplane bucket -> candidate
   pairs -> cosine verify -> connected components) at 10M rows, with
   the component solve FORCED onto the distributed label-propagation
   path (fast_path_max=0) at least once — the 1M probes always fit
   the driver union-find;
2. a versioned IVF store at C=10k cells with ZIPF-SKEWED cell sizes
   (hot cells ~100x the median) — write fan-out, manifest width, and
   the write_partitioned skew levers at the cell count a 100 TB
   corpus implies;
3. the routed probe scan + delete + vacuum lifecycle against that
   manifest (pointer-flip at 10k-entry manifest width).

Honesty note on "IVF build": cluster ids are PLANTED at generation
(deterministic hash with a Zipf hot-head), not kmeans-fit — a
brute-force 10M x 10k x 768 assignment is ~8e16 flops and not a
single-box job; assignment compute is map-side embarrassingly
parallel and already measured at 1M/C=256 (tools/scale_probe.py).
What 10M x C=10k uniquely stresses is the LAYOUT: skewed fan-out,
manifest width, pruning economics — exactly what this probe measures.

Vectors are generated IN-PLAN from xxhash64 (the emb_neardup_probe
recipe: product-mixed hash lanes, planted exact copies at
id %% 20 == 1) so the 10M base never needs its own parquet copy; the
store is written float32 to halve its footprint (distance math
upcasts to double in-plan).

Usage: python tools/pipeline10m_probe.py [n_rows] [dim] [C]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 768
C = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
# Planes sized to the corpus (the embedding_neardup_pairs contract:
# 2^P >> N so most buckets are singletons). At P=24 over 10M rows the
# bucket load factor is lambda = N/2^P = 0.6, so ~45% of rows sit in
# collision buckets (1 - e^-lambda) and the collision-only pair join
# still shuffles ~2x28 GB of vectors — measured as a second ENOSPC on
# this box. P=28 restores lambda = 0.037 (~4% collision members), the
# same regime the 1M probes ran at with P=24.
P = int(os.environ.get("SVSPARK_PROBE_PLANES", "28"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
THRESH = 0.2
NPROBE = 10
N_DELETE = 10_000


def _drop_dead_shuffles(spark):
    """Nudge the ContextCleaner so shuffle files whose Python-side
    references are gone actually leave disk BETWEEN stages: the probe's
    stage peaks (pair-join vectors, store-build repartition) each fit
    the box alone but not stacked, and local-mode shuffle files
    otherwise persist until an incidental driver GC."""
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pipeline-10m-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS) * 4, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g"))
        .config("spark.local.dir", os.environ.get("SVSPARK_PROBE_LOCAL", "/tmp"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        embedding_neardup_pairs,
    )
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.sinks import delete_ids, read_store
    from sqlite_vector_spark.versioned import (
        current_manifest,
        read_versioned_pruned,
        vacuum_versioned,
        versioned_store_init,
    )

    from sqlite_vector_spark.operators.dedup import random_hyperplanes

    out = {"n_rows": N, "dim": DIM, "C": C, "planes": P, "cpus": int(CPUS)}
    # i.i.d. Gaussian planes — the family the library itself tells
    # callers to use. The first draft of this probe hand-rolled a
    # linear plane formula and reproduced random_hyperplanes' 64x
    # docstring warning AT SCALE: bit correlations of 0.999 collapsed
    # 10M vectors into ~10k effective buckets (97% of rows in
    # collision buckets at ANY plane count, measured on a 200k numpy
    # replica), i.e. ~7e9 candidate pairs and an unfinishable verify
    # join. Plane quality is a first-order scale lever.
    planes = random_hyperplanes(P, DIM, seed=0)

    is_dup = (F.col("id") % 20) == 1
    src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    BIGP = 2_147_483_647
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(src * F.lit(DIM) + j.cast("bigint")), F.lit(BIGP))
            .cast("double") / F.lit(float(BIGP)) - F.lit(0.5)
        ),
    )
    # Zipf-skewed planted cells: ~5% of rows land in 10 hot cells
    # (hot cell ~ 5000 rows/cell/1000 = ~50x median), rest uniform.
    h = F.pmod(F.xxhash64(F.col("id") + 7), F.lit(100))
    cluster = (
        F.when(h < 5, F.pmod(F.xxhash64(F.col("id") + 13), F.lit(10)))
        .otherwise(F.pmod(F.xxhash64(F.col("id") + 29), F.lit(C)))
        .cast("int")
    )
    emb = spark.range(N).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"), cluster.alias("cluster")
    )

    root = tempfile.mkdtemp(prefix="svspark_10m_")
    try:
        # ---- stage 1: near-dup chain at 10M, distributed components
        t0 = time.time()
        edges = (
            embedding_neardup_pairs(emb, "vec_id", "embedding", planes, THRESH)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        out["neardup_edges"] = edges.count()
        out["neardup_edges_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        labels_fast = connected_components_min_label(edges)
        out["components_driver"] = labels_fast.count()
        out["components_driver_s"] = round(time.time() - t0, 2)

        t0 = time.time()  # FORCE the distributed label-propagation path
        labels_dist = connected_components_min_label(edges, fast_path_max=0)
        out["components_distributed"] = labels_dist.count()
        out["components_distributed_s"] = round(time.time() - t0, 2)
        mism = (
            labels_fast.withColumnRenamed("cluster", "c1")
            .join(labels_dist.withColumnRenamed("cluster", "c2"), "id", "full")
            .where(F.col("c1").isNull() | F.col("c2").isNull() | (F.col("c1") != F.col("c2")))
            .count()
        )
        out["components_path_mismatches"] = mism
        labels_fast = labels_dist = None
        edges.unpersist()
        edges = None
        _drop_dead_shuffles(spark)

        # ---- stage 2: versioned IVF-layout store, C cells, skewed
        store = os.path.join(root, "ivf_versioned")
        t0 = time.time()
        versioned_store_init(
            emb.select(
                F.col("vec_id").alias("id"),
                F.col("embedding").cast("array<float>").alias("vec"),
                "cluster",
            ),
            store,
            partition_col="cluster",
        )
        out["store_build_s"] = round(time.time() - t0, 2)
        _, man = current_manifest(spark, store)
        out["manifest_entries"] = len(man["files"])
        out["manifest_bytes"] = os.path.getsize(
            os.path.join(store, "_sv_manifests", "v000000.json")
        )
        du = 0
        for dp, _dn, fns in os.walk(store):
            du += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
        out["store_bytes"] = du
        _drop_dead_shuffles(spark)  # the 30 GB repartition-by-cell write

        # ---- stage 3: routed probe scan (manifest-pruned)
        q = [0.0] * DIM
        probes = list(range(NPROBE))  # includes hot cells: worst case
        t0 = time.time()
        pruned = read_versioned_pruned(spark, store, "cluster", probes)
        hits = full_scan(pruned, "vec", q, 20, "L2", id_col="id").collect()
        out["routed_probe_scan_s"] = round(time.time() - t0, 2)
        out["probe_rows"] = pruned.count()
        assert len(hits) == 20

        # ---- stage 4: delete 10k scattered ids (pointer flip at
        # 10k-entry manifest width), then vacuum
        victims = list(range(0, N, N // N_DELETE))[:N_DELETE]
        t0 = time.time()
        rep = delete_ids(spark, store, victims, id_col="id")
        out["delete_s"] = round(time.time() - t0, 2)
        out["deleted_rows"] = rep["deleted_rows"]
        t0 = time.time()
        vrep = vacuum_versioned(spark, store, retain=1)
        out["vacuum_s"] = round(time.time() - t0, 2)
        out["vacuum_files"] = vrep["removed_files"]
        t0 = time.time()
        out["rows_after"] = read_store(spark, store).count()
        out["post_lifecycle_scan_s"] = round(time.time() - t0, 2)
        assert out["rows_after"] == N - rep["deleted_rows"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
