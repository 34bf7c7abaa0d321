"""Serial vs parallel one-call takedown (round 11).

A takedown is many SMALL maintenance jobs (per-tier probes, bounded
anti-join rewrites, label re-solves) — at 10 tiers the serial verb is
scheduling-bound, so running the independent dependency chains as
concurrent Spark actions should cut wall-clock without changing any
result. This probe builds the full 10-tier registered state TWICE
(identical content; label states written directly with synthetic but
well-formed (id, cluster) rows + sidecars — the re-solve cost is real
either way, the CLUSTERING build cost is not what this probe
measures), then A/Bs `takedown(max_parallel=1)` vs `max_parallel=8`
in the same session and cross-checks the per-tier reports.

Usage: python tools/takedown_parallel_probe.py [n_rows]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
TOKENS = 30
DIM = 64
IVF_C = 256
PLANES_P = 16
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("takedown-parallel-probe")
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
        embedding_bucket_store,
        lsh_band_store,
        write_label_state,
    )
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.sinks import takedown

    root = tempfile.mkdtemp(prefix="svspark_tdpar_")
    out: dict = {"n_rows": N, "dim": DIM, "cpus": int(CPUS)}

    MOD = 2_147_483_647
    BIGP = 1_000_003

    def build(tag: str, cat_dir: str):
        base = os.path.join(root, tag)
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(TOKENS - 1)),
            lambda j: F.concat(
                F.lit("w"),
                ((F.col("id") * F.lit(2_654_435_761) + j.cast("bigint") * F.lit(40_503)) % F.lit(MOD)).cast("string"),
            ),
        )
        docs = spark.range(N).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", arr).alias("content")
        )
        emb = spark.range(N).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: (
                    F.pmod(F.xxhash64(F.col("id") * F.lit(DIM) + j.cast("bigint")), F.lit(BIGP))
                    .cast("double") / F.lit(float(BIGP)) - F.lit(0.5)
                ).cast("float"),
            ).alias("embedding"),
        ).localCheckpoint(eager=True)
        # i.i.d. Gaussian planes (the pre-r14 linear formula correlated
        # the planes and skewed the buckets; see emb_neardup_probe)
        from sqlite_vector_spark.operators.dedup import random_hyperplanes

        planes = random_hyperplanes(PLANES_P, DIM, seed=0)
        emb.createOrReplaceTempView(f"tdpar_{tag}")
        cat = VectorCatalog(cat_dir)
        cat.vector_init(emb, f"tdpar_{tag}", "embedding", f"type=FLOAT32,dimension={DIM},distance=L2")
        vector_quantize(emb, "embedding", base + "/rep", id_col="vec_id",
                        catalog=cat, table=f"tdpar_{tag}")
        cents = [list(r.embedding) for r in
                 emb.where(F.col("vec_id") < IVF_C).orderBy("vec_id").collect()]
        ivf_store(emb, "embedding", cents, base + "/ivf", id_col="vec_id")
        cat.set_ivf_index(f"tdpar_{tag}", "embedding", path=base + "/ivf", centroids=cents)
        codes = bq_encode(emb, "embedding", DIM, id_col="vec_id").localCheckpoint(eager=True)
        codes.write.parquet(base + "/bq")
        cat.set_bq_index(f"tdpar_{tag}", "embedding", path=base + "/bq")
        bq_band_store(codes, DIM, base + "/mih", band_bits=8)
        cat.set_mih_index(f"tdpar_{tag}", "embedding", path=base + "/mih", band_bits=8)
        lsh_band_store(docs, "doc_id", "content", base + "/bands")
        docs.write.parquet(base + "/docsmirror")
        # synthetic label states: every id % 50 == 1 clusters with id-1
        # (well-formed members-only labeling; the takedown's re-solve
        # work — candidate regen over affected members — is real)
        labels = spark.range(N).where((F.col("id") % 50).isin(0, 1)).select(
            F.col("id"), (F.col("id") - F.col("id") % 50).alias("cluster")
        )
        write_label_state(labels, base + "/tlabels",
                          {"jaccard_t": 0.8, "num_hashes": 8, "bands": 4,
                           "rows_per_band": 2, "shingle_n": 3,
                           "id_col": "doc_id", "text_col": "content"})
        cat.set_text_neardup_state(f"tdpar_{tag}", "embedding", band_store=base + "/bands",
                                   docs_mirror=base + "/docsmirror", labels=base + "/tlabels")
        embedding_bucket_store(emb, "vec_id", "embedding", planes, base + "/buckets")
        emb.write.parquet(base + "/vecmirror")
        write_label_state(labels, base + "/elabels",
                          {"planes": planes, "threshold": 0.1, "metric": "COSINE",
                           "id_col": "vec_id", "vec_col": "embedding"})
        cat.set_embedding_neardup_state(f"tdpar_{tag}", "embedding", bucket_store=base + "/buckets",
                                        vectors_mirror=base + "/vecmirror", labels=base + "/elabels")
        return cat, f"tdpar_{tag}"

    try:
        victims = [int(i) for i in range(1, N, N // 1000)][:1000]
        t0 = time.time()
        cat_s, tbl_s = build("serial", os.path.join(root, "cat_s"))
        cat_p, tbl_p = build("parallel", os.path.join(root, "cat_p"))
        out["build_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        rep_s = takedown(spark, cat_s, tbl_s, "embedding", victims, max_parallel=1)
        out["takedown_serial_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        rep_p = takedown(spark, cat_p, tbl_p, "embedding", victims, max_parallel=8)
        out["takedown_parallel_s"] = round(time.time() - t0, 2)
        out["speedup"] = round(out["takedown_serial_s"] / max(out["takedown_parallel_s"], 1e-9), 2)

        # report equivalence (tier set + per-tier deleted/strategy keys)
        def norm(r):
            return {k: {kk: vv for kk, vv in v.items() if kk in
                        ("deleted_rows", "strategy", "labels_before", "labels_after",
                         "partitions_rewritten", "code_rows")}
                    for k, v in r.items() if k != "verified"}
        out["reports_equal"] = norm(rep_s) == norm(rep_p)
        out["tiers"] = sorted(k for k in rep_s if k != "verified")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
