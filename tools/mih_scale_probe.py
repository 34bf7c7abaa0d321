"""MIH Hamming join at 1M x 768: candidate volume and completeness.

Planted ground truth: 16 query codes drawn from the corpus, each
given 3 planted neighbors at Hamming distances 1-3 (bit flips of the
full-precision vector's signs). With band_bits=16 over 768 bits there
are m=48 bands, so every planted neighbor (r <= 3 < m) MUST be found
— the pigeonhole contract at scale. Reports: wall time, candidate
pairs examined (the MIH selectivity vs the Q x N brute force), and
planted-neighbor recall (must be 1.0).

Usage: python tools/mih_scale_probe.py [n_rows] [dim]
       python tools/mih_scale_probe.py corr [n_rows] [dim]
Prints one JSON line; paste into SCALE.md.

``corr`` mode measures the adversarial CORRELATED manifold (smooth
sin lanes — sign patterns repeat corpus-wide): band-bucket collision
mass for axis-aligned sign codes vs SimHash-plane projected codes
(bq_knn_join's planes= path), plus projected-join sanity (each query
finds its own row at Hamming 0). The axis numbers quantify the
documented failure mode; the projected numbers show the fix restores
selectivity.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORR_MODE = len(sys.argv) > 1 and sys.argv[1] == "corr"
_args = sys.argv[2:] if CORR_MODE else sys.argv[1:]
N = int(_args[0]) if len(_args) > 0 else (200_000 if CORR_MODE else 1_000_000)
DIM = int(_args[1]) if len(_args) > 1 else 768
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

    if CORR_MODE:
        corr_probe(spark, root, out)
        shutil.rmtree(root, ignore_errors=True)
        print(json.dumps(out))
        return

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


def corr_probe(spark, root, out):
    """Correlated-manifold arm: axis vs projected band selectivity."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.bq import (
        bq_encode,
        bq_knn_join,
        bq_project_encode,
        bq_random_planes,
        explode_bands,
    )

    P = 256  # projected code bits; band_bits=16 -> m=16 bands
    out["mode"] = "correlated"
    out["proj_bits"] = P
    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: F.sin(F.col("id").cast("double") * j.cast("double") * F.lit(1e-4)).cast("float"),
        ).alias("embedding"),
    )
    base = os.path.join(root, "corr")
    gen.write.mode("overwrite").parquet(base)
    df = spark.read.parquet(base)

    def bucket_mass(codes, bits_len):
        cx = explode_bands(codes, F.col("bits"), ["id"], bits_len, BAND_BITS)
        row = (
            cx.groupBy("b", "bv").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias("mass"), F.count(F.lit(1)).alias("buckets"))
            .collect()[0]
        )
        m_bands = bits_len // BAND_BITS
        # mass / (m * n^2) = probability a random (row, row) pair
        # collides in a given band — the per-band selectivity
        return int(row.mass), int(row.buckets), row.mass / (m_bands * N * N)

    t0 = time.time()
    axis_codes = bq_encode(df, "embedding", DIM, id_col="vec_id", backend="arrow-numpy")
    axis_codes.write.mode("overwrite").parquet(os.path.join(root, "axis_codes"))
    axis_codes = spark.read.parquet(os.path.join(root, "axis_codes"))
    out["axis_encode_s"] = round(time.time() - t0, 2)
    mass, buckets, sel = bucket_mass(axis_codes, DIM)
    out["axis_bucket_mass"] = mass
    out["axis_buckets"] = buckets
    out["axis_band_selectivity"] = round(sel, 6)

    planes = bq_random_planes(DIM, P, seed=1)
    t0 = time.time()
    proj_codes = bq_project_encode(df, "embedding", planes, id_col="vec_id")
    proj_codes.write.mode("overwrite").parquet(os.path.join(root, "proj_codes"))
    proj_codes = spark.read.parquet(os.path.join(root, "proj_codes"))
    out["proj_encode_s"] = round(time.time() - t0, 2)
    mass, buckets, sel = bucket_mass(proj_codes, P)
    out["proj_bucket_mass"] = mass
    out["proj_buckets"] = buckets
    out["proj_band_selectivity"] = round(sel, 9)
    out["selectivity_ratio"] = round(out["axis_band_selectivity"] / max(out["proj_band_selectivity"], 1e-12), 1)

    # projected join sanity: corpus-drawn queries find their own row
    # at Hamming 0 (and the join completes in bounded time, which the
    # axis codes on this manifold would not)
    qrows = df.where((F.col("vec_id") % (N // NQ) == 0)).limit(NQ).collect()
    qdf = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows],
        "qid long, qv array<double>",
    )
    t0 = time.time()
    res = bq_knn_join(qdf, proj_codes, P, K, band_bits=BAND_BITS, planes=planes).collect()
    out["proj_join_s"] = round(time.time() - t0, 2)
    by_q = {}
    for r in res:
        by_q.setdefault(r.qid, {})[r.id] = r.hamming
    out["self_at_zero"] = sum(1 for r in qrows if by_q.get(r.vec_id, {}).get(r.vec_id) == 0)
    out["self_expected"] = len(qrows)


if __name__ == "__main__":
    main()
