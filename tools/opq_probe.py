"""OPQ probe: raw-ADC vs OPQ-ADC recall@k at EQUAL M/KSUB.

Measures the one thing the learned rotation is for — how much of the
compressed-domain (no-rerank) recall gap it closes — at the
reference's headline geometry (M=16, KSUB=256, dim=768), on two
deterministic manifolds:

- "sin":   v[j] = sin(id*(j+1)*1e-5) — the scale_probe corpus. A
           quasi-1-D curve: consecutive ids are near-identical, so
           axis-aligned codes vary smoothly along the curve and
           ranking survives even though absolute reconstruction
           error dwarfs the (off-manifold) query distance. The
           degenerate case — measured for honesty, not the OPQ
           regime.
- "gauss": per-dim-scaled Gaussian with the geometric eigenspectrum
           4^(-j/96) (the realistic embedding-spectrum shape; Ge et
           al. 2013 §4's setup), query drawn FROM the data — the
           standard OPQ evaluation, where axis-aligned PQ wastes
           codebook entropy on dead subspaces and the rotation
           recovers it.

Reports recall@K and mean squared reconstruction error for both
quantizers, plus fit/encode timings. Rotation applies through the
Arrow matmul path (auto dispatch at dim=768).

Usage: python tools/opq_probe.py [n_rows] [dim]   (default 1000000 768)
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
PQ_M = int(os.environ.get("SPARK_GRAFT_PQ_M", "16"))
PQ_KSUB = int(os.environ.get("SPARK_GRAFT_PQ_KSUB", "256"))


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("opq-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.pq import (
        _rotate_py,
        opq_fit,
        opq_rotate,
        pq_encode,
        pq_fit,
        pq_reconstruction_error,
        pq_scan,
    )
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.version import set_backend

    set_backend("arrow-numpy")
    root = tempfile.mkdtemp(prefix="svspark_opq_")
    out = {"n": N, "dim": DIM, "k": K, "m": PQ_M, "ksub": PQ_KSUB, "cpus": int(CPUS)}

    def lane(manifold, j):
        if manifold == "gauss":
            scale = F.pow(F.lit(4.0), -(j.cast("double") - F.lit(1.0)) / F.lit(96.0))
            return (scale * F.randn(41)).cast("float")
        x = F.col("id").cast("double") * j.cast("double") * F.lit(1e-5)
        return F.sin(x).cast("float")

    q_sin = [0.5 * (1 if j % 2 == 0 else -1) * ((j % 97) / 97.0) for j in range(DIM)]

    for manifold in ("sin", "gauss"):
        base = os.path.join(root, manifold)
        gen = spark.range(N).select(
            F.col("id").alias("vec_id"),
            F.transform(F.sequence(F.lit(1), F.lit(DIM)), lambda j: lane(manifold, j)).alias(
                "embedding"
            ),
        )
        gen.write.mode("overwrite").parquet(base)
        df = spark.read.parquet(base)
        if manifold == "gauss":
            # query FROM the data distribution (standard ANN eval):
            # row 777's vector — its true neighbors are resolvable
            qm = [float(x) for x in df.where(F.col("vec_id") == 777).collect()[0].embedding]
        else:
            qm = q_sin
        exact_ids = {
            r.id for r in full_scan(df, "embedding", qm, K, "L2", id_col="vec_id").collect()
        }
        res = {}

        # raw PQ
        t0 = time.time()
        raw_books = pq_fit(
            df, "embedding", PQ_M, PQ_KSUB, DIM, iters=2, id_col="vec_id", init="kmeans++"
        )
        res["raw_fit_s"] = round(time.time() - t0, 1)
        raw_dir = os.path.join(root, f"{manifold}_raw")
        pq_encode(df, "embedding", raw_books, id_col="vec_id").write.mode("overwrite").parquet(raw_dir)
        raw_codes = spark.read.parquet(raw_dir)
        t0 = time.time()
        raw_hits = {r.id for r in pq_scan(raw_codes, qm, raw_books, K, "L2").collect()}
        res["raw_adc_scan_s"] = round(time.time() - t0, 2)
        res["raw_adc_recall"] = round(len(exact_ids & raw_hits) / K, 4)
        res["raw_recon_err"] = round(
            pq_reconstruction_error(df.limit(100_000), "embedding", raw_books, id_col="vec_id"), 5
        )

        # OPQ at the same M/KSUB
        t0 = time.time()
        R, opq_books = opq_fit(
            df, "embedding", PQ_M, PQ_KSUB, DIM, iters=8, id_col="vec_id", seed=0,
            refine_iters=2,
        )
        res["opq_fit_s"] = round(time.time() - t0, 1)
        rotated = opq_rotate(df, "embedding", R, id_col="vec_id")
        opq_dir = os.path.join(root, f"{manifold}_opq")
        t0 = time.time()
        pq_encode(rotated, "vec", opq_books, id_col="id").write.mode("overwrite").parquet(opq_dir)
        res["opq_encode_write_s"] = round(time.time() - t0, 1)
        opq_codes = spark.read.parquet(opq_dir)
        qrot = _rotate_py([float(x) for x in qm], R)
        t0 = time.time()
        opq_hits = {r.id for r in pq_scan(opq_codes, qrot, opq_books, K, "L2").collect()}
        res["opq_adc_scan_s"] = round(time.time() - t0, 2)
        res["opq_adc_recall"] = round(len(exact_ids & opq_hits) / K, 4)
        res["opq_recon_err"] = round(
            pq_reconstruction_error(
                opq_rotate(df.limit(100_000), "embedding", R, id_col="vec_id"),
                "vec", opq_books, id_col="id",
            ), 5,
        )
        out[manifold] = res

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
