"""IVF centroid-quality probe on a SKEWED corpus: first-C seeding vs
sampled k-means++ (VERDICT r5 #1).

The 1M x 768 ANN headline (reference API.md:253-255) assumes clusters
partition the corpus roughly evenly; on skewed real data first-C
seeding puts every seed in the densest region and the satellite mass
collapses into a handful of giant clusters — probe scans then read a
large fraction of the corpus back. This probe generates a deterministic
skewed corpus IN-PLAN (90% of rows in one dense region, 10% across 15
far satellites), trains C centroids both ways with the same Lloyd
refinement, and measures:

  - balance: max cluster size / (N/C)  (1.0 = perfectly even) and the
    fraction of the corpus a nprobe-probe scan must read, averaged
    over the query set (the actual cost driver at 100 TB)
  - recall@k vs the exact scan for queries in both dense and sparse
    regions at fixed nprobe

Usage: python tools/kmeans_balance_probe.py [n_rows] [dim] [C]
       (default 200000 64 64)
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
K = 20
NPROBE = max(1, C // 8)
# more satellite modes than spare centroids: seeding quality decides
# which modes get their own centroid vs get merged
SATS = int(C * 1.5)
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kmeans-balance-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.ann import ivf_assign, kmeans_fit, probe_clusters
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.version import set_backend

    set_backend("auto")
    out = {"n": N, "dim": DIM, "c": C, "k": K, "nprobe": NPROBE, "cpus": int(CPUS)}

    # Skewed corpus, built JVM-side: M = SATS modes with Zipf-ish mass
    # (mode = floor((id/N)^2 * M), so mode m's mass ~ 1/sqrt(m) — the
    # head mode holds ~sqrt(1/M) of all rows, the tail modes ~10x
    # less), mode centers pseudo-random at radius ~30, noise amplitude
    # ~2 inside a mode. Ids are MODE-SORTED — the realistic bad case
    # where data arrives grouped by source and first-C seeding sees
    # only the head mode. No driver loop.
    M = SATS
    u = F.col("id").cast("double") / F.lit(float(N))
    mode = F.floor(u * u * F.lit(float(M))).cast("double")
    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (
                F.lit(30.0) * F.sin((mode + 1.0) * j.cast("double") * F.lit(1.3))
                + F.lit(2.0)
                * F.sin(F.col("id").cast("double") * (j + 17).cast("double") * F.lit(1e-3))
            ).cast("double"),
        ).alias("embedding"),
    )
    df = gen.localCheckpoint(eager=True)  # freeze the corpus for both arms

    def mode_start(m):
        return int(N * (m / M) ** 0.5)

    def train(init):
        t0 = time.time()
        cents = kmeans_fit(
            df, "embedding", C, dim=DIM, iters=5, id_col="vec_id", init=init, seed=11
        )
        return cents, round(time.time() - t0, 2)

    # queries: 4 head-mode rows + 8 rows from distinct tail modes, each
    # offset by 0.05 so no query is an exact corpus row
    head_ids = [3, mode_start(0) + 103, mode_start(1) + 3, mode_start(1) + 103]
    tail_ids = [mode_start(M - 1 - m) + 3 for m in range(8)]
    rows = {r.vec_id: r for r in df.where(F.col("vec_id").isin(head_ids + tail_ids)).collect()}
    queries = [
        [float(x) + 0.05 for x in rows[i].embedding] for i in head_ids + tail_ids
    ]
    n_dense_q = len(head_ids)

    exact_ids = {}
    for qi, q in enumerate(queries):
        hits = full_scan(df, "embedding", q, K, "L2", id_col="vec_id").collect()
        exact_ids[qi] = {r.id for r in hits}

    for init in ("first", "kmeans++"):
        cents, fit_s = train(init)
        assigned = ivf_assign(df, "embedding", cents, id_col="vec_id").localCheckpoint(
            eager=True
        )
        sizes = {
            r.cluster: r.n
            for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
        }
        mx = max(sizes.values())
        tag = "first" if init == "first" else "pp"
        # quantization error (mean distance to own centroid): one
        # map-side pass via the arrow assignment kernel's distance
        from sqlite_vector_spark.operators.ann import nearest_centroid_arrow_udf  # noqa: F401
        import numpy as np

        cm = np.asarray(cents, dtype=np.float64)

        def _qerr(pdfs):
            import pandas as pd

            for pdf in pdfs:
                m = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
                d2 = ((m[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2).min(axis=1)
                yield pd.DataFrame({"s": [float(d2.sum())], "n": [len(pdf)]})

        agg = assigned.select("vec").mapInPandas(_qerr, "s double, n long").groupBy().sum().collect()[0]
        out[f"{tag}_mean_sq_err"] = round(float(agg[0]) / float(agg[1]), 3)

        recalls, read_frac = [], []
        for qi, q in enumerate(queries):
            probes = probe_clusters(q, cents, NPROBE)
            cand = assigned.where(F.col("cluster").isin([int(p) for p in probes]))
            hits = full_scan(cand, "vec", q, K, "L2", id_col="id").collect()
            recalls.append(len(exact_ids[qi] & {r.id for r in hits}) / K)
            read_frac.append(sum(sizes.get(p, 0) for p in probes) / N)
        out[f"{tag}_fit_s"] = fit_s
        out[f"{tag}_max_over_even"] = round(mx / (N / C), 2)
        out[f"{tag}_nonempty_clusters"] = len(sizes)
        out[f"{tag}_recall_head"] = round(sum(recalls[:n_dense_q]) / n_dense_q, 4)
        out[f"{tag}_recall_tail"] = round(
            sum(recalls[n_dense_q:]) / max(1, len(recalls) - n_dense_q), 4
        )
        out[f"{tag}_probe_read_frac"] = round(sum(read_frac) / len(read_frac), 4)

    set_backend("codegen")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
