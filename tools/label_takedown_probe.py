"""Near-dup label TAKEDOWN at 1M docs (round 10).

The right-to-be-forgotten question for the label state: with a 1M-doc
corpus fully labeled, what does removing a 0.1% takedown batch cost
via delete_labels (affected components re-solved from surviving
members only), versus the only alternative before round 10 — a full
re-cluster of the corpus? Corpus recipe matches incr_neardup_probe
(every id % 20 == 1 copies id-1's tokens, word Jaccard ~0.95); the
takedown is id % 1000 == 1 — every deleted doc is a CLUSTER MEMBER,
so each deletion forces a component re-solve (the worst case for the
operator, the best case for a correctness check: incremental ==
rebuild is asserted on the full label sets).

Usage: python tools/label_takedown_probe.py [n_docs]
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TOKENS = 40
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
JACCARD_MIN = 0.8


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("label-takedown-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        delete_labels,
        jaccard_pairs,
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

    def labels_of(d):
        edges = (
            jaccard_pairs(lsh_candidate_pairs(d, "doc_id", "content"), d, "doc_id", "content")
            .where(F.col("jaccard") >= F.lit(JACCARD_MIN))
            .select("a", "b")
        )
        return connected_components_min_label(edges).localCheckpoint(eager=True)

    t0 = time.time()
    labels0 = labels_of(docs)
    out["state_build_s"] = round(time.time() - t0, 2)
    out["state_labels"] = labels0.count()

    # takedown: every 1000th cluster MEMBER (id % 1000 == 1 is a
    # planted duplicate of id-1, so each deletion touches a component)
    victims = docs.where(F.col("doc_id") % 1000 == 1).select(
        F.col("doc_id").cast("bigint")
    )
    out["n_deleted"] = victims.count()
    t0 = time.time()
    after = delete_labels(
        labels0, docs, victims, id_col="doc_id", text_col="content",
        jaccard_t=JACCARD_MIN,
    ).localCheckpoint(eager=True)
    out["takedown_s"] = round(time.time() - t0, 2)
    out["labels_after"] = after.count()

    survivors = docs.where(F.col("doc_id") % 1000 != 1).localCheckpoint(eager=True)
    t0 = time.time()
    rebuilt = labels_of(survivors)
    out["full_recluster_s"] = round(time.time() - t0, 2)
    out["labels_rebuilt"] = rebuilt.count()
    mism = (
        after.withColumnRenamed("cluster", "c1")
        .join(rebuilt.withColumnRenamed("cluster", "c2"), "id", "full")
        .where(
            F.col("c1").isNull() | F.col("c2").isNull() | (F.col("c1") != F.col("c2"))
        )
        .count()
    )
    out["label_mismatches"] = mism
    out["takedown_vs_recluster_speedup"] = round(
        out["full_recluster_s"] / max(out["takedown_s"], 1e-9), 1
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
