"""MIH Hamming join at 1M x 768: candidate volume and completeness.

Planted ground truth: 16 query codes drawn from the corpus, each
given 3 planted neighbors at Hamming distances 1-3 (bit flips of the
full-precision vector's signs). With band_bits=16 over 768 bits there
are m=48 bands, so every planted neighbor (r <= 3 < m) MUST be found
— the pigeonhole contract at scale. Reports: wall time, candidate
pairs examined (the MIH selectivity vs the Q x N brute force), and
planted-neighbor recall (must be 1.0).

Usage: python tools/mih_scale_probe.py [n_rows] [dim]
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
NQ = 16
K = 20
BAND_BITS = 16
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("mih-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.bq import (
        bq_encode,
        bq_knn_join,
        explode_bands,
    )

    root = tempfile.mkdtemp(prefix="svspark_mih_")
    out = {"n": N, "dim": DIM, "nq": NQ, "k": K, "band_bits": BAND_BITS}

    # corpus: deterministic HIGH-ENTROPY sign vectors (xxhash64 per
    # (id, lane) -> ±1) — random 16-bit band values, so collisions
    # measure MIH's real selectivity. (The sin manifold is the
    # adversarial case: its sign patterns repeat corpus-wide and
    # every band collides — measured 50% selectivity at 50k. MIH,
    # like any hash index, needs key entropy; SCALE.md records both.)
    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2)).cast("double") * F.lit(2.0) - F.lit(1.0)).cast("float"),
        ).alias("embedding"),
    )
    base = os.path.join(root, "base")
    gen.write.mode("overwrite").parquet(base)
    df = spark.read.parquet(base)

    qrows = df.where((F.col("vec_id") % 1000 == 0) & (F.col("vec_id") < NQ * 1000)).collect()
    queries = [(int(r.vec_id) // 1000, [float(x) for x in r.embedding]) for r in qrows]
    # planted: flip signs of d chosen dims of query qid's vector,
    # appended with ids N + qid*10 + d (d = 1..3)
    planted_rows = []
    expect = {}
    for qid, vec in queries:
        for d in (1, 2, 3):
            v = list(vec)
            for bit in range(d):
                pos = (qid * 37 + bit * 101) % DIM
                v[pos] = -v[pos] if v[pos] != 0.0 else -1.0
            pid = N + qid * 10 + d
            planted_rows.append((pid, v))
            expect.setdefault(qid, []).append(pid)
    planted_df = spark.createDataFrame(planted_rows, "vec_id long, embedding array<float>")
    full = df.select("vec_id", F.col("embedding").cast("array<float>")).unionByName(planted_df)

    t0 = time.time()
    codes = bq_encode(full, "embedding", DIM, id_col="vec_id", backend="arrow-numpy")
    codes_dir = os.path.join(root, "codes")
    codes.write.mode("overwrite").parquet(codes_dir)
    out["encode_write_s"] = round(time.time() - t0, 2)
    codes_df = spark.read.parquet(codes_dir)

    qdf = spark.createDataFrame(
        [(qid, vec) for qid, vec in queries], "qid long, qv array<float>"
    )
    # candidate volume: distinct (qid, id) band collisions
    from sqlite_vector_spark.operators.bq import bq_encode_col

    qenc = qdf.select(F.col("qid"), bq_encode_col(F.col("qv"), DIM).alias("qbits"))
    qx = explode_bands(qenc, F.col("qbits"), ["qid"], DIM, BAND_BITS)
    cx = explode_bands(codes_df, F.col("bits"), ["id"], DIM, BAND_BITS)
    t0 = time.time()
    n_cand = cx.join(F.broadcast(qx), ["b", "bv"]).select("qid", "id").distinct().count()
    out["candidates"] = n_cand
    out["candidate_count_s"] = round(time.time() - t0, 2)
    out["brute_force_pairs"] = NQ * (N + len(planted_rows))
    out["selectivity"] = round(n_cand / out["brute_force_pairs"], 6)

    t0 = time.time()
    res = bq_knn_join(qdf, codes_df, DIM, K, band_bits=BAND_BITS).collect()
    out["join_s"] = round(time.time() - t0, 2)
    by_q = {}
    for r in res:
        by_q.setdefault(r.qid, set()).add(r.id)
    out["planted_total"] = sum(len(v) for v in expect.values())
    found = sum(1 for qid, pids in expect.items() for p in pids if p in by_q.get(qid, set()))
    out["planted_in_topk"] = found
    # the pigeonhole CONTRACT is candidate completeness (r < m), not
    # top-k membership: verify every planted pair is a candidate
    import pyspark.sql.functions as F2
    plant_pairs = [(qid, pid) for qid, pids in expect.items() for pid in pids]
    pp = spark.createDataFrame(plant_pairs, "qid long, id long")
    cand_pairs = cx.join(F.broadcast(qx), ["b", "bv"]).select("qid", "id").distinct()
    n_hit = pp.join(cand_pairs, ["qid", "id"], "left_semi").count()
    out["planted_in_candidates"] = n_hit
    out["pigeonhole_complete"] = bool(n_hit == out["planted_total"])

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
