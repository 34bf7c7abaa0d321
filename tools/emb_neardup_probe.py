"""Embedding near-dup label maintenance at 1M vectors (round 10).

The embedding twin of incr_neardup_probe + label_takedown_probe in
one run: planted truth (every id % 20 == 1 copies id-1's vector
exactly — cosine 0, same bucket under ANY plane family), a 1% batch
appended through the frozen bucket index, then a 0.1% cluster-member
takedown — both compared against full rebuilds with row-level label
equality. Planes: a deterministic pseudo-random family sized so the
expected random bucket collision count stays bounded (p planes ->
2^p buckets; default 20 -> ~1M buckets at 1M rows).

Usage: python tools/emb_neardup_probe.py [n_vectors] [dim] [planes]
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
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
P = int(sys.argv[3]) if len(sys.argv) > 3 else 20
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
THRESH = 0.2  # exact copies verify at snap-zero 0.0; random pairs ~1.0


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("emb-neardup-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        delete_labels_embedding,
        embedding_bucket_store,
        embedding_neardup_pairs,
        embedding_pair_distances,
        incremental_embedding_pairs,
        incremental_labels,
    )

    out = {"n_vectors": N, "dim": DIM, "planes": P, "cpus": int(CPUS)}
    # i.i.d. Gaussian planes (deterministic per seed, frozen). The
    # earlier hand-rolled linear formula here was the exact correlated
    # family random_hyperplanes() warns about (bit correlations 0.999,
    # corpus collapsing into ~10k effective buckets) — numbers this
    # probe published before r14 were therefore measured under
    # DEGENERATE bucket skew, i.e. they are upper bounds on the
    # well-tuned cost.
    from sqlite_vector_spark.operators.dedup import random_hyperplanes

    planes = random_hyperplanes(P, DIM, seed=0)

    is_dup = (F.col("id") % 20) == 1
    src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    # product mixing, not sum: (src + c1) * (j + c2) mod prime — a
    # sum-form hash makes every vector a SHIFTED copy of one base
    # sequence (cosine ~ 1 corpus-wide); the product decorrelates
    # rows while keeping planted copies exact
    # xxhash64 per (row, lane): any LINEAR lane formula produces
    # sawtooth ramps that correlate corpus-wide (measured: two
    # modulus choices both labeled ~the whole 50k corpus as
    # near-dups); a real hash decorrelates rows while keeping the
    # planted copies exact
    BIGP = 2_147_483_647
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(src * F.lit(DIM) + j.cast("bigint")), F.lit(BIGP))
            .cast("double") / F.lit(float(BIGP)) - F.lit(0.5)
        ),
    )
    emb = (
        spark.range(N)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .localCheckpoint(eager=True)
    )
    indexed = emb.where(F.col("vec_id") % 100 != 0)
    batch = emb.where(F.col("vec_id") % 100 == 0)
    out["batch_vectors"] = batch.count()

    root = tempfile.mkdtemp(prefix="svspark_embnd_")
    store = os.path.join(root, "buckets")
    try:
        def edges_of(d):
            return embedding_neardup_pairs(
                d, "vec_id", "embedding", planes, THRESH
            ).select("a", "b")

        t0 = time.time()
        embedding_bucket_store(indexed, "vec_id", "embedding", planes, store)
        labels0 = connected_components_min_label(edges_of(indexed)).localCheckpoint(eager=True)
        out["state_build_s"] = round(time.time() - t0, 2)
        out["state_labels"] = labels0.count()

        # ---- append: the daily-ingest path ----
        t0 = time.time()
        cand = incremental_embedding_pairs(
            spark, batch, store, "vec_id", "embedding", planes
        ).localCheckpoint(eager=True)
        new_edges = (
            embedding_pair_distances(cand, emb, "vec_id", "embedding")
            .where(F.col("distance") < THRESH)
            .select("a", "b")
        )
        inc = incremental_labels(labels0, new_edges).localCheckpoint(eager=True)
        out["append_s"] = round(time.time() - t0, 2)
        out["labels_after_append"] = inc.count()

        t0 = time.time()
        full = connected_components_min_label(edges_of(emb)).localCheckpoint(eager=True)
        out["full_rebuild_s"] = round(time.time() - t0, 2)
        out["labels_full"] = full.count()
        mism = (
            inc.withColumnRenamed("cluster", "c1")
            .join(full.withColumnRenamed("cluster", "c2"), "id", "full")
            .where(F.col("c1").isNull() | F.col("c2").isNull() | (F.col("c1") != F.col("c2")))
            .count()
        )
        out["append_mismatches"] = mism
        out["append_vs_rebuild_speedup"] = round(
            out["full_rebuild_s"] / max(out["append_s"], 1e-9), 1
        )

        # ---- takedown: every 1000th planted-dup member ----
        victims = emb.where(F.col("vec_id") % 1000 == 1).select(
            F.col("vec_id").cast("bigint")
        )
        out["n_deleted"] = victims.count()
        t0 = time.time()
        after = delete_labels_embedding(
            full, emb, victims, planes, THRESH, id_col="vec_id", vec_col="embedding"
        ).localCheckpoint(eager=True)
        out["takedown_s"] = round(time.time() - t0, 2)
        survivors = emb.where(F.col("vec_id") % 1000 != 1).localCheckpoint(eager=True)
        t0 = time.time()
        rebuilt = connected_components_min_label(edges_of(survivors)).localCheckpoint(eager=True)
        out["recluster_s"] = round(time.time() - t0, 2)
        mism2 = (
            after.withColumnRenamed("cluster", "c1")
            .join(rebuilt.withColumnRenamed("cluster", "c2"), "id", "full")
            .where(F.col("c1").isNull() | F.col("c2").isNull() | (F.col("c1") != F.col("c2")))
            .count()
        )
        out["takedown_mismatches"] = mism2
        out["takedown_vs_recluster_speedup"] = round(
            out["recluster_s"] / max(out["takedown_s"], 1e-9), 1
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
