"""Batched hybrid retrieval (BM25 + vector RRF fusion) at 1M docs.

The production question for retrieval.rrf_fuse_batch: what does a
realistic query batch cost end-to-end at corpus scale, and where do
the bytes move? Three accounted stages:

- lexical arm: bm25_batch_topk — one corpus token pass (df/idf stats
  + per-(qid, term) scores), per-qid top-k window;
- vector arm: ivf_knn_join over C=256 first-row centroids at
  nprobe=8 — the pruned production tier (the exact join is the
  recall harness, not the serving path);
- fusion: rrf_fuse_batch over the two Q x k arms — Q x k-row windows
  and one (qid, id) full-outer join, corpus never touched.

Corpus: 1M synthetic docs (64-word Zipf-ish draws from a 50k vocab
via xxhash) + 1M x 64 hash-sign embeddings. Query batch: 32 queries,
2 terms each, query vectors drawn from the corpus.

Usage: python tools/hybrid_scale_probe.py [n_rows] [n_queries]
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = 64
K = 20
VOCAB = 50_000
DOC_WORDS = 64
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = 4049


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
        .appName("hybrid-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.ann import ivf_knn_join
    from sqlite_vector_spark.operators.retrieval import bm25_batch_topk, rrf_fuse_batch

    root = tempfile.mkdtemp(prefix="svspark_hybrid_")
    out = {"n": N, "nq": NQ, "dim": DIM, "k": K, "vocab": VOCAB, "doc_words": DOC_WORDS}

    # Zipf-ish word ids: rank = vocab * u^3 concentrates mass on low
    # ranks; word w<r> tokens keep the text layer honest (split/
    # lower-case paths all run)
    u = (F.pmod(F.xxhash64(F.col("id"), F.col("j")), F.lit(1_000_000)).cast("double") + F.lit(0.5)) / F.lit(1e6)
    word = F.concat(F.lit("w"), F.floor(F.pow(u, F.lit(3.0)) * F.lit(float(VOCAB))).cast("long").cast("string"))
    docs_gen = (
        spark.range(N)
        .select("id", F.explode(F.sequence(F.lit(1), F.lit(DOC_WORDS))).alias("j"))
        .groupBy("id")
        .agg(F.concat_ws(" ", F.collect_list(word)).alias("text"))
        .select(F.col("id").alias("doc_id"), "text")
    )
    docs_gen.write.mode("overwrite").parquet(os.path.join(root, "docs"))
    docs = spark.read.parquet(os.path.join(root, "docs"))

    emb_gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double") / F.lit(500.0) - F.lit(1.0)).cast("float"),
        ).alias("embedding"),
    )
    emb_gen.write.mode("overwrite").parquet(os.path.join(root, "emb"))
    emb = spark.read.parquet(os.path.join(root, "emb"))
    emb.count(), docs.count()  # warm FS cache

    queries_lex = [
        (qid, (f"w{(qid * 7) % 100}", f"w{(qid * 13) % 1000}")) for qid in range(NQ)
    ]
    qvec_rows = emb.where(F.col("vec_id") < NQ).collect()
    queries_vec = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qvec_rows],
        "qid long, qv array<double>",
    )
    centroids = [list(r.embedding) for r in emb.orderBy("vec_id").limit(256).collect()]

    def timed(name, fn):
        w0, r0 = shuffle_totals()
        t0 = time.time()
        res = fn()
        out[f"{name}_s"] = round(time.time() - t0, 2)
        w1, r1 = shuffle_totals()
        out[f"{name}_shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
        out[f"{name}_shuffle_read_mb"] = round((r1 - r0) / 1e6, 1)
        return res

    # stage 1: lexical arm materialized (the corpus token pass)
    lex = timed(
        "bm25_arm",
        lambda: bm25_batch_topk(docs, queries_lex, K).localCheckpoint(eager=True),
    )
    out["bm25_rows"] = lex.count()

    # stage 2: vector arm materialized (IVF-pruned join)
    vec = timed(
        "vec_arm",
        lambda: ivf_knn_join(
            queries_vec, emb, centroids, K, nprobe=8, metric="L2",
            id_col="vec_id", vec_col="embedding",
        ).localCheckpoint(eager=True),
    )
    out["vec_rows"] = vec.count()

    # stage 3: fusion over the Q x k arms only
    fused = timed(
        "fuse",
        lambda: rrf_fuse_batch(
            [(vec.select("qid", "id", "distance"), "distance", True),
             (lex.select("qid", "id", "score"), "score", False)], K
        ).collect(),
    )
    out["fused_rows"] = len(fused)
    out["per_query_ms"] = round(
        1000.0 * (out["bm25_arm_s"] + out["vec_arm_s"] + out["fuse_s"]) / NQ, 1
    )

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
