"""OPQ rerank-width probe: the production question is not raw-ADC
recall but "how wide must the ADC prefilter be before the exact
rerank reaches recall 1.0" — rerank width IS the cost dial (bytes of
full-precision vectors re-read per query). A better-ordered
compressed domain needs a narrower prefilter at equal recall.

Measures rerank recall@K vs prefilter width for raw PQ and OPQ at
equal M/KSUB on the spectrum-decayed Gaussian manifold (query drawn
from the data), n=1M x 768 by default.

Usage: python tools/opq_rerank_probe.py [n_rows] [dim]
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
WIDTHS = (100, 200, 400, 800)
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PQ_M = int(os.environ.get("SPARK_GRAFT_PQ_M", "16"))
PQ_KSUB = int(os.environ.get("SPARK_GRAFT_PQ_KSUB", "256"))


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("opq-rerank-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.functions.distance import distance
    from sqlite_vector_spark.operators.pq import (
        _rotate_py,
        opq_fit,
        opq_rotate,
        pq_encode,
        pq_fit,
        pq_scan,
    )
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.version import set_backend

    set_backend("arrow-numpy")
    root = tempfile.mkdtemp(prefix="svspark_opqrr_")
    out = {"n": N, "dim": DIM, "k": K, "m": PQ_M, "ksub": PQ_KSUB}

    scale = lambda j: F.pow(F.lit(4.0), -(j.cast("double") - F.lit(1.0)) / F.lit(96.0))
    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)), lambda j: (scale(j) * F.randn(41)).cast("float")
        ).alias("embedding"),
    )
    base = os.path.join(root, "gauss")
    gen.write.mode("overwrite").parquet(base)
    df = spark.read.parquet(base)
    q = [float(x) for x in df.where(F.col("vec_id") == 777).collect()[0].embedding]
    exact_ids = {r.id for r in full_scan(df, "embedding", q, K, "L2", id_col="vec_id").collect()}

    def rerank_recall(codes_df, frame, fq, width):
        cand = pq_scan(codes_df, fq, books_cur, width, "L2").select("id")
        rr = (
            frame.join(F.broadcast(cand), "id", "left_semi")
            .select("id", distance(F.col("vec"), fq, "L2").alias("d"))
            .orderBy(F.col("d").asc(), F.col("id").asc())
            .limit(K)
            .collect()
        )
        return len(exact_ids & {r.id for r in rr}) / K

    frame_raw = df.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))

    books_cur = pq_fit(df, "embedding", PQ_M, PQ_KSUB, DIM, iters=2, id_col="vec_id", init="kmeans++")
    raw_dir = os.path.join(root, "raw")
    pq_encode(df, "embedding", books_cur, id_col="vec_id").write.mode("overwrite").parquet(raw_dir)
    raw_codes = spark.read.parquet(raw_dir)
    out["raw"] = {str(w): round(rerank_recall(raw_codes, frame_raw, q, w), 3) for w in WIDTHS}

    R, opq_books = opq_fit(df, "embedding", PQ_M, PQ_KSUB, DIM, iters=8, id_col="vec_id", seed=0, refine_iters=2)
    rotated = opq_rotate(df, "embedding", R, id_col="vec_id")
    rot_dir = os.path.join(root, "rot")
    rotated.write.mode("overwrite").parquet(rot_dir)
    frame_rot = spark.read.parquet(rot_dir)
    opq_dir = os.path.join(root, "opq")
    pq_encode(frame_rot, "vec", opq_books, id_col="id").write.mode("overwrite").parquet(opq_dir)
    opq_codes = spark.read.parquet(opq_dir)
    qrot = _rotate_py(q, R)
    books_cur = opq_books
    out["opq"] = {str(w): round(rerank_recall(opq_codes, frame_rot, qrot, w), 3) for w in WIDTHS}

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
