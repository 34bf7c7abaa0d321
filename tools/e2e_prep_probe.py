"""e2e corpus-prep probe: the WHOLE workload.e2e_corpus_prep_q chain
(normalize -> exact dedup -> boilerplate strip -> Gopher filter ->
content-hash split) at 1M docs, with per-stage wall time and shuffle
bytes, and EXACT expected outcomes planted into the corpus:

- every id % 10 == 0 doc carries the shared 8-token boilerplate
  header (chunk-aligned, so the strip must remove exactly one chunk);
- every id % 10 == 1 doc is an EXACT COPY of doc id-1 (header
  included), so exact dedup must drop exactly N/10 docs, keeping the
  min id of each pair;
- every body opens with two stopwords and draws 40 short tokens, so
  every surviving stripped doc passes all five Gopher rules — keep
  count must equal 0.9 N exactly.

Hashes: the scale configuration (xxhash64 for the dedup fingerprint
and the chunk df pass) — the oracle-gated entries pin the identical
chain under the parity polyhash at sf0.01; the shuffle SHAPE is
hash-agnostic.

Usage: python tools/e2e_prep_probe.py [n_docs]  (default 1000000)
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
# 46 body tokens + 2 stopwords = 48 = 6 exact 8-token chunks: a
# trailing PARTIAL chunk has only ~10^6 distinct values, and 45k
# draws birthday-collide into df>=3 groups the strip then removes
TOKENS = 46
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = 4051


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
    from pyspark.sql import SparkSession, Window

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("e2e-prep-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.functions.text import STOPWORDS, normalize_text, words
    from sqlite_vector_spark.operators.dedup import boilerplate_strip
    from sqlite_vector_spark.workload import SPLIT_TRAIN_PCT, _gopher_keep, _gopher_metrics

    out = {"n_docs": N, "cpus": int(CPUS)}

    # ---- corpus (see module docstring for the planted structure) ----
    MOD = 2_147_483_647
    base_id = F.col("id") - (F.col("id") % 10 == 1).cast("bigint")  # dup copies id-1
    planted = (base_id % 10) == 0
    # token length 2-4 chars ("w0".."w999") so the Gopher mean-word-
    # length band [3, 5] passes; xxhash64(base_id, j) gives full
    # per-(doc, position) entropy — an affine generator mod 1000
    # collapses to ~1000 distinct bodies and shared chunks
    body = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base_id, j), F.lit(1000)).cast("string")
        ),
    )
    header = F.array(*[F.lit(f"boiler{i}") for i in range(8)])
    stops = F.array(F.lit("the"), F.lit("and"))
    arr = F.when(planted, F.concat(header, stops, body)).otherwise(F.concat(stops, body))
    t0 = time.time()
    docs = (
        spark.range(N)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", arr).alias("text"))
        .localCheckpoint(eager=True)
    )
    out["gen_s"] = round(time.time() - t0, 2)

    def staged(name, fn):
        w0, r0 = shuffle_totals()
        t = time.time()
        res = fn()
        out[f"{name}_s"] = round(time.time() - t, 2)
        w1, r1 = shuffle_totals()
        out[f"{name}_shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
        out[f"{name}_shuffle_read_mb"] = round((r1 - r0) / 1e6, 1)
        return res

    # ---- stage 1: normalize (map-only) ----
    norm = docs.select("doc_id", normalize_text(F.col("text")).alias("text"))
    norm = staged("normalize", lambda: norm.localCheckpoint(eager=True))

    # ---- stage 2: exact dedup (hash-only shuffle: fp + id) ----
    deduped = (
        norm.withColumn("fp", F.xxhash64(F.col("text")))
        .withColumn("rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
        .where(F.col("rn") == 1)
        .drop("rn", "fp")
    )
    deduped = staged("exact_dedup", lambda: deduped.localCheckpoint(eager=True))
    n_after_dedup = deduped.count()
    out["dedup_removed"] = N - n_after_dedup
    out["dedup_exact"] = bool(out["dedup_removed"] == N // 10)

    # ---- stage 3: boilerplate strip (df over 8-token chunk hashes) ----
    stripped = boilerplate_strip(
        deduped, "doc_id", "text", size=8, min_df=3, hash_fn=F.xxhash64
    ).select("doc_id", F.col("clean_text").alias("text"), "n_removed")
    stripped = staged("boilerplate_strip", lambda: stripped.localCheckpoint(eager=True))
    agg = stripped.agg(
        F.sum("n_removed").alias("removed"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias("touched"),
    ).collect()[0]
    out["chunks_removed"] = int(agg.removed)
    out["strip_exact"] = bool(agg.removed == N // 10 and agg.touched == N // 10)

    # ---- stage 4: Gopher quality filter (map-only) ----
    kept = stripped.where(_gopher_keep(*_gopher_metrics(words("text")))).select("doc_id", "text")
    kept = staged("gopher_filter", lambda: kept.localCheckpoint(eager=True))
    n_kept = kept.count()
    out["kept_docs"] = n_kept
    out["gopher_exact"] = bool(n_kept == n_after_dedup)

    # ---- stage 5: content-hash split (map-only) ----
    split = kept.select(
        "doc_id",
        (F.pmod(F.xxhash64(F.col("text")), F.lit(100)) < SPLIT_TRAIN_PCT).alias("is_train"),
    )
    row = staged(
        "split",
        lambda: split.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("is_train").cast("bigint")).alias("tr")
        ).collect()[0],
    )
    out["train_frac"] = round(int(row.tr) / int(row.n), 4)

    w, r = shuffle_totals()
    out["total_shuffle_write_mb"] = round(w / 1e6, 1)
    out["total_shuffle_read_mb"] = round(r / 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
