"""Cleaning pipeline at the 1M-doc scale (round 6).

SCALE.md proves the near-dup pipeline at 1M docs; this probe proves
the r6d cleaning family there too: boilerplate_strip (with PLANTED
boilerplate — every id % 10 == 0 doc carries the same 8-token header
prefix, so the df pass must find exactly one boilerplate fingerprint
and strip exactly one chunk from each planted doc) and the
Gopher-rule quality report (map-only; its shuffle bytes should be
~zero beyond the presentation sort).

Usage: python tools/cleaning_scale_probe.py [n_docs]  (default 1000000)
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
TOKENS = 40  # non-boiler body tokens per doc
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = 4050


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
        .appName("cleaning-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.dedup import boilerplate_strip

    out = {"n_docs": N, "tokens_per_doc": TOKENS, "cpus": int(CPUS)}

    # ---- corpus: unique 40-token bodies; every 10th doc gets the
    # shared 8-token boilerplate header prepended (chunk-aligned) ----
    MOD = 2_147_483_647
    planted = (F.col("id") % 10) == 0
    body = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda j: F.concat(
            F.lit("w"),
            ((F.col("id") * F.lit(2_654_435_761) + j.cast("bigint") * F.lit(40_503)) % F.lit(MOD)).cast("string"),
        ),
    )
    header = F.array(*[F.lit(f"boiler{i}") for i in range(8)])
    arr = F.when(planted, F.concat(header, body)).otherwise(body)
    t0 = time.time()
    docs = (
        spark.range(N)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", arr).alias("content"))
        .localCheckpoint(eager=True)
    )
    out["gen_s"] = round(time.time() - t0, 2)
    n_planted = len(range(0, N, 10))
    out["planted_docs"] = n_planted

    def staged(name, fn):
        w0, r0 = shuffle_totals()
        t = time.time()
        res = fn()
        out[f"{name}_s"] = round(time.time() - t, 2)
        w1, r1 = shuffle_totals()
        out[f"{name}_shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
        out[f"{name}_shuffle_read_mb"] = round((r1 - r0) / 1e6, 1)
        return res

    # ---- boilerplate strip (xxhash64 backend — the production hash;
    # the polyhash default is the oracle-parity fold, ~20x slower) ----
    stripped = boilerplate_strip(
        docs, "doc_id", "content", size=8, min_df=3, hash_fn=F.xxhash64
    )
    stripped = staged("boilerplate_strip", lambda: stripped.localCheckpoint(eager=True))
    agg = stripped.agg(
        F.sum("n_removed").alias("removed"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias("docs_touched"),
    ).collect()[0]
    out["chunks_removed"] = int(agg.removed)
    out["docs_touched"] = int(agg.docs_touched)
    out["strip_exact"] = bool(agg.removed == n_planted and agg.docs_touched == n_planted)

    # ---- Gopher quality rules (map-only) ----
    from sqlite_vector_spark.functions.text import STOPWORDS, words

    w = words("content")
    quality = docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("bigint").alias("stop_hits"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_types"),
    )
    staged("gopher_quality", lambda: quality.agg(F.sum("n_words"), F.sum("n_types")).collect())

    # ---- cross-source overlap matrix (20 sources; shared shingles
    # exist only inside the planted boilerplate header). xxhash64
    # stands in for the oracle-parity polyhash — the heavy stages
    # (distinct + pair join) are hash-agnostic. ----
    from sqlite_vector_spark.functions.text import shingles

    srcd = docs.withColumn("source", F.pmod(F.col("doc_id"), F.lit(20)).cast("int"))
    d = (
        srcd.select("source", F.explode(shingles("content")).alias("s"))
        .select("source", F.xxhash64("s").alias("h"))
        .distinct()
    )
    ss = (
        d.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") > 1)
    )
    pairs_col = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + F.lit(2), F.size("ss")),
                lambda y: F.struct(x.alias("sa"), y.alias("sb")),
            ),
        )
    )
    pair = (
        ss.select(F.explode(pairs_col).alias("p"))
        .select(F.col("p.sa").alias("sa"), F.col("p.sb").alias("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    res = staged("source_overlap", lambda: pair.localCheckpoint(eager=True))
    out["overlap_pairs"] = res.count()

    # ---- sequence packing: shard shuffle + prefix-sum window at 1M
    # (xxhash64 shard key; the workload entry's polyhash exists for
    # oracle parity) ----
    from pyspark.sql import Window

    base = docs.select(
        "doc_id",
        F.size(F.split("content", " ")).cast("bigint").alias("toks"),
        F.xxhash64("content").alias("h"),
    ).withColumn("shard", F.pmod(F.col("h"), F.lit(32)).cast("int"))
    wq = (
        Window.partitionBy("shard")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = base.select(
        "doc_id", "shard", "toks", (F.sum("toks").over(wq) - F.col("toks")).alias("off")
    )
    staged("pack_sequences", lambda: packed.localCheckpoint(eager=True))

    # ---- batched BM25: 4 queries over the full corpus in one pass ----
    from sqlite_vector_spark.operators.retrieval import bm25_batch_topk

    queries = [
        (0, ("boiler0", "boiler1")),
        (1, ("boiler2", "boiler5")),
        (2, ("boiler3", "boiler6", "boiler7")),
        (3, ("boiler4",)),
    ]
    bm = bm25_batch_topk(docs, queries, k=20, id_col="doc_id", text_col="content")
    res = staged("bm25_batch", lambda: bm.localCheckpoint(eager=True))
    out["bm25_rows"] = res.count()

    out["total_s"] = round(
        out["boilerplate_strip_s"]
        + out["gopher_quality_s"]
        + out["source_overlap_s"]
        + out["pack_sequences_s"]
        + out["bm25_batch_s"],
        2,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
