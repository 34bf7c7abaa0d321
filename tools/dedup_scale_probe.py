"""Dedup pipeline at the 1M-doc scale (VERDICT r5 #5).

SCALE.md proves the ANN story at 1M x 768; this probe proves the text
near-dup pipeline (minhash -> LSH bands -> bucket pairs -> exact
Jaccard verify -> connected components) at 1M documents with PLANTED
near-duplicate pairs, measuring per-stage wall-clock, per-stage
shuffle read/write bytes (Spark REST API), and pair precision/recall
against the planted ground truth.

Corpus (in-plan, no driver loop): 1M docs x 40 tokens drawn from a
~2^31 vocabulary via an affine hash of (src, j) — full-stream
collisions between distinct srcs are impossible (src < modulus), so
the ONLY near-dup pairs are the planted ones: every id with
id % 20 == 1 copies doc id-1's tokens and swaps the last token for a
unique marker (word-set Jaccard ~ 39/41 ~ 0.95).

Usage: python tools/dedup_scale_probe.py [n_docs]   (default 1000000)
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TOKENS = 40
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = 4049
JACCARD_MIN = 0.8


def shuffle_totals():
    """(write_bytes, read_bytes) summed over all completed stages."""
    try:
        base = f"http://localhost:{UI_PORT}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=5))
        app = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app}/stages?status=COMPLETE", timeout=5)
        )
        return (
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
            sum(s.get("shuffleReadBytes", 0) for s in stages),
        )
    except Exception:
        return (0, 0)


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("dedup-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    out = {"n_docs": N, "tokens_per_doc": TOKENS, "cpus": int(CPUS)}

    # ---- corpus ----
    MOD = 2_147_483_647
    is_dup = (F.col("id") % 20) == 1
    src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda j: F.concat(
            F.lit("w"),
            ((src * F.lit(2_654_435_761) + j.cast("bigint") * F.lit(40_503)) % F.lit(MOD)).cast(
                "string"
            ),
        ),
    )
    arr2 = F.when(
        is_dup,
        F.concat(
            F.slice(arr, 1, TOKENS - 1),
            F.array(F.concat(F.lit("zz"), (F.col("id") % 997).cast("string"))),
        ),
    ).otherwise(arr)
    t0 = time.time()
    docs = (
        spark.range(N)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", arr2).alias("content"))
        .localCheckpoint(eager=True)
    )
    out["gen_s"] = round(time.time() - t0, 2)
    n_truth = len(range(1, N, 20))
    out["planted_pairs"] = n_truth

    def staged(name, fn):
        w0, r0 = shuffle_totals()
        t = time.time()
        res = fn()
        out[f"{name}_s"] = round(time.time() - t, 2)
        w1, r1 = shuffle_totals()
        out[f"{name}_shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
        out[f"{name}_shuffle_read_mb"] = round((r1 - r0) / 1e6, 1)
        return res

    # ---- stage 1: minhash + LSH banding -> candidate pairs ----
    hash_backend = os.environ.get("SPARK_GRAFT_DEDUP_HASH", "polyhash")
    out["hash_backend"] = hash_backend
    hf = F.xxhash64 if hash_backend == "xxhash64" else None
    cand = lsh_candidate_pairs(docs, "doc_id", "content", hash_fn=hf)
    cand = staged("lsh_candidates", lambda: cand.localCheckpoint(eager=True))
    out["candidate_pairs"] = cand.count()

    # ---- stage 2: exact Jaccard verify on candidates only ----
    ver = jaccard_pairs(cand, docs, "doc_id", "content").where(
        F.col("jaccard") >= F.lit(JACCARD_MIN)
    )
    ver = staged("jaccard_verify", lambda: ver.localCheckpoint(eager=True))
    out["verified_pairs"] = ver.count()

    # ---- stage 3: transitive clustering on the verified edges ----
    comp = staged(
        "components",
        lambda: connected_components_min_label(ver.select("a", "b")).localCheckpoint(
            eager=True
        ),
    )
    out["clustered_docs"] = comp.count()
    out["clusters"] = comp.select("cluster").distinct().count()

    # ---- precision / recall vs the planted truth ----
    truth = spark.range(1, N, 20).select(
        (F.col("id") - 1).alias("a"), F.col("id").alias("b")
    )
    tp_cand = cand.join(truth, ["a", "b"], "left_semi").count()
    tp_ver = ver.join(truth, ["a", "b"], "left_semi").count()
    out["candidate_recall"] = round(tp_cand / n_truth, 4)
    out["verified_recall"] = round(tp_ver / n_truth, 4)
    out["candidate_precision"] = round(tp_cand / max(1, out["candidate_pairs"]), 4)
    out["verified_precision"] = round(tp_ver / max(1, out["verified_pairs"]), 4)
    out["total_s"] = round(
        out["lsh_candidates_s"] + out["jaccard_verify_s"] + out["components_s"], 2
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
