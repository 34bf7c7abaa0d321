"""Incremental near-dup label maintenance at 1M docs (round 9).

The daily-ingest question: with 99% of a 1M-doc corpus already banded
and labeled, what does absorbing a 1% batch cost, and does the
incremental labeling equal a full rebuild? Planted truth as in
dedup_scale_probe: every id % 20 == 1 copies doc id-1's tokens (word
Jaccard ~0.95); the batch is id % 100 == 0, so every batch doc has a
planted partner in the INDEXED set — 10k cross-boundary edges is the
stress case for incremental_labels' star-merge.

Usage: python tools/incr_neardup_probe.py [n_docs]   (default 1000000)
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
TOKENS = 40
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = 4048
JACCARD_MIN = 0.8


def shuffle_totals():
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
        .appName("incr-neardup-probe")
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
        incremental_dedup_pairs,
        incremental_labels,
        jaccard_pairs,
        lsh_band_store,
        lsh_candidate_pairs,
    )

    out = {"n_docs": N, "tokens_per_doc": TOKENS, "cpus": int(CPUS)}

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
    indexed = docs.where(F.col("doc_id") % 100 != 0)
    batch = docs.where(F.col("doc_id") % 100 == 0)
    out["batch_docs"] = batch.count()

    def staged(name, fn):
        w0, r0 = shuffle_totals()
        t = time.time()
        res = fn()
        out[f"{name}_s"] = round(time.time() - t, 2)
        w1, r1 = shuffle_totals()
        out[f"{name}_shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
        return res

    root = tempfile.mkdtemp(prefix="svspark_incrnd_")
    bands = os.path.join(root, "bands")

    # ---- yesterday: state build over the indexed 99% (one-time) ----
    def build_state():
        lsh_band_store(indexed, "doc_id", "content", bands)
        edges0 = (
            jaccard_pairs(lsh_candidate_pairs(indexed, "doc_id", "content"), indexed, "doc_id", "content")
            .where(F.col("jaccard") >= F.lit(JACCARD_MIN))
            .select("a", "b")
        )
        return connected_components_min_label(edges0).localCheckpoint(eager=True)

    labels0 = staged("state_build", build_state)
    out["state_labels"] = labels0.count()

    # ---- today: the append path (the headline cost) ----
    def append_path():
        cand = incremental_dedup_pairs(spark, batch, bands, "doc_id", "content")
        new_edges = (
            jaccard_pairs(cand, docs, "doc_id", "content")
            .where(F.col("jaccard") >= F.lit(JACCARD_MIN))
            .select("a", "b")
        )
        return incremental_labels(labels0, new_edges).localCheckpoint(eager=True)

    inc = staged("append", append_path)
    out["labels_after_append"] = inc.count()

    # ---- referee: full rebuild over the union corpus ----
    def rebuild():
        edges = (
            jaccard_pairs(lsh_candidate_pairs(docs, "doc_id", "content"), docs, "doc_id", "content")
            .where(F.col("jaccard") >= F.lit(JACCARD_MIN))
            .select("a", "b")
        )
        return connected_components_min_label(edges).localCheckpoint(eager=True)

    full = staged("full_rebuild", rebuild)
    out["labels_full"] = full.count()
    out["label_mismatches"] = (
        inc.join(full, "id", "full")
        .where(
            F.coalesce(inc["cluster"], F.lit(-1)) != F.coalesce(full["cluster"], F.lit(-1))
        )
        .count()
    )
    out["append_vs_rebuild_speedup"] = round(out["full_rebuild_s"] / max(out["append_s"], 1e-9), 1)

    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
