"""ONE-CALL corpus takedown at 1M: the composite right-to-be-forgotten
probe (round 11).

r10 measured each maintenance verb in isolation (store delete, label
takedown, embedding takedown, stream takedown). This probe measures
what a user actually runs: EVERY tier registered in one catalog —
quantized replica, IVF store, BQ codes, MIH band store, LSH band
store, docs mirror, text label state, hyperplane bucket store,
vectors mirror, embedding label state — then ONE
``sinks.takedown(..., verify=True)`` for a 1k-id batch, timed
end-to-end, with the verify receipt (column-pruned residual counts,
all zeros) included in the same call. Corpus recipes follow
label_takedown_probe (planted word-level near-dups) and
emb_neardup_probe (xxhash64 lanes — linear lane formulas correlate
the corpus and were rejected there; exact-copy planted dups).
Victims are id % 1000 == 1 — every one a planted CLUSTER MEMBER, so
both label re-solves do real component work.

Usage: python tools/takedown_probe.py [n_rows] [max_parallel]
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
MAX_PARALLEL = int(sys.argv[2]) if len(sys.argv) > 2 else 1
TOKENS = 40
DIM = 64
IVF_C = 256
PLANES_P = 16
JACCARD_MIN = 0.8
EMB_T = 0.1
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("takedown-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.ann import ivf_store
    from sqlite_vector_spark.operators.bq import bq_band_store, bq_encode
    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        embedding_bucket_store,
        embedding_neardup_pairs,
        jaccard_pairs,
        lsh_band_store,
        lsh_candidate_pairs,
        write_label_state,
    )
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.sinks import takedown

    root = tempfile.mkdtemp(prefix="svspark_takedown_probe_")
    out: dict = {"n_rows": N, "dim": DIM, "cpus": int(CPUS)}
    try:
        # ---- corpora (planted dups: id % 20 == 1 copies id-1) --------
        MOD = 2_147_483_647
        is_dup = (F.col("id") % 20) == 1
        src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(TOKENS - 1)),
            lambda j: F.concat(
                F.lit("w"),
                ((src * F.lit(2_654_435_761) + j.cast("bigint") * F.lit(40_503)) % F.lit(MOD)).cast("string"),
            ),
        )
        arr2 = F.when(
            is_dup,
            F.concat(
                F.slice(arr, 1, TOKENS - 1),
                F.array(F.concat(F.lit("zz"), (F.col("id") % 997).cast("string"))),
            ),
        ).otherwise(arr)
        docs = (
            spark.range(N)
            .select(F.col("id").alias("doc_id"), F.concat_ws(" ", arr2).alias("content"))
            .localCheckpoint(eager=True)
        )
        BIGP = 1_000_003
        emb = (
            spark.range(N)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda j: (
                        F.pmod(F.xxhash64(src * F.lit(DIM) + j.cast("bigint")), F.lit(BIGP))
                        .cast("double") / F.lit(float(BIGP)) - F.lit(0.5)
                    ).cast("float"),
                ).alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )
        # i.i.d. Gaussian planes — the linear formula used before r14
        # makes plane p+1 an affine shift of plane p (correlated bits,
        # skewed buckets), which inflates the label-rebuild arm
        from sqlite_vector_spark.operators.dedup import random_hyperplanes

        planes = random_hyperplanes(PLANES_P, DIM, seed=0)

        emb.createOrReplaceTempView("probe_t")
        cat = VectorCatalog(os.path.join(root, "cat"))
        cat.vector_init(emb, "probe_t", "embedding", f"type=FLOAT32,dimension={DIM},distance=L2")

        # ---- vector tiers ---------------------------------------------
        t0 = time.time()
        vector_quantize(emb, "embedding", os.path.join(root, "rep"), id_col="vec_id",
                        catalog=cat, table="probe_t")
        cents = [list(r.embedding) for r in
                 emb.where(F.col("vec_id") < IVF_C).orderBy("vec_id").collect()]
        ivf_store(emb, "embedding", cents, os.path.join(root, "ivf"), id_col="vec_id")
        cat.set_ivf_index("probe_t", "embedding", path=os.path.join(root, "ivf"), centroids=cents)
        codes = bq_encode(emb, "embedding", DIM, id_col="vec_id").localCheckpoint(eager=True)
        codes.write.parquet(os.path.join(root, "bq"))
        cat.set_bq_index("probe_t", "embedding", path=os.path.join(root, "bq"))
        bq_band_store(codes, DIM, os.path.join(root, "mih"), band_bits=8)
        cat.set_mih_index("probe_t", "embedding", path=os.path.join(root, "mih"), band_bits=8)
        out["vector_tiers_build_s"] = round(time.time() - t0, 2)

        # ---- text near-dup state --------------------------------------
        t0 = time.time()
        lsh_band_store(docs, "doc_id", "content", os.path.join(root, "bands"))
        docs.write.parquet(os.path.join(root, "docsmirror"))
        tedges = (
            jaccard_pairs(lsh_candidate_pairs(docs, "doc_id", "content"),
                          docs, "doc_id", "content")
            .where(F.col("jaccard") >= F.lit(JACCARD_MIN)).select("a", "b")
        )
        write_label_state(
            connected_components_min_label(tedges), os.path.join(root, "tlabels"),
            {"jaccard_t": JACCARD_MIN, "num_hashes": 8, "bands": 4, "rows_per_band": 2,
             "shingle_n": 3, "id_col": "doc_id", "text_col": "content"},
        )
        cat.set_text_neardup_state(
            "probe_t", "embedding", band_store=os.path.join(root, "bands"),
            docs_mirror=os.path.join(root, "docsmirror"), labels=os.path.join(root, "tlabels"),
        )
        out["text_state_build_s"] = round(time.time() - t0, 2)

        # ---- embedding near-dup state ----------------------------------
        t0 = time.time()
        embedding_bucket_store(emb, "vec_id", "embedding", planes, os.path.join(root, "buckets"))
        emb.write.parquet(os.path.join(root, "vecmirror"))
        eedges = embedding_neardup_pairs(
            emb, "vec_id", "embedding", planes, EMB_T
        ).select("a", "b")
        write_label_state(
            connected_components_min_label(eedges), os.path.join(root, "elabels"),
            {"planes": planes, "threshold": EMB_T, "metric": "COSINE",
             "id_col": "vec_id", "vec_col": "embedding"},
        )
        cat.set_embedding_neardup_state(
            "probe_t", "embedding", bucket_store=os.path.join(root, "buckets"),
            vectors_mirror=os.path.join(root, "vecmirror"), labels=os.path.join(root, "elabels"),
        )
        out["embedding_state_build_s"] = round(time.time() - t0, 2)

        # ---- ONE call -------------------------------------------------
        victims = [int(i) for i in range(1, N, 1000)]
        out["n_deleted"] = len(victims)
        out["max_parallel"] = MAX_PARALLEL
        t0 = time.time()
        reports = takedown(spark, cat, "probe_t", "embedding", victims, verify=True,
                           max_parallel=MAX_PARALLEL)
        out["takedown_one_call_s"] = round(time.time() - t0, 2)
        out["tiers_touched"] = sorted(k for k in reports if k != "verified")
        out["verify_all_zero"] = all(v == 0 for v in reports["verified"].values())
        out["mih_strategy"] = reports["mih"]["strategy"]
        out["ivf_partitions_rewritten"] = reports["ivf"]["partitions_rewritten"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
