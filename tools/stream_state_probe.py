"""Streaming-state lifecycle at scale: epoch growth -> compaction ->
one-call takedown over BOTH stream tiers (round 12).

r11's composite probe (takedown_probe.py) covered the ten BATCH tiers;
the streaming states were only unit-tested, and the per-epoch replay
layout had no growth bound: every micro-batch plans a per-path read of
ALL prior ``bands|buckets/epoch=*`` dirs and every labels epoch holds
the full merged labeling forever. This probe measures the whole story
on real micro-batches (ingest_stream_neardup +
ingest_stream_embedding_neardup over a file source,
maxFilesPerTrigger=1):

1. build E epochs of N/E docs + vectors each, recording every batch's
   triggerExecution duration (the growth curve);
2. compact_stream_state (default watermark: newest epoch kept
   replayable) — fold cost + read-path counts before/after;
3. resume TWO more epochs over the compacted state — their durations
   are the "flat vs #epochs" evidence;
4. ONE ``sinks.takedown(..., verify=True)`` reaching BOTH registered
   stream states (text + embedding), timed, receipt included;
5. vacuum_stream_state on both states — retained bytes reclaimed.

Usage: python tools/stream_state_probe.py [n_rows] [n_epochs] [max_parallel]
Prints one JSON line; paste into SCALE.md.

r13: SVSPARK_PROBE_SCHEME=mock roots the STATE dirs at the test-only
``mock:`` scheme (tests/javalib/MockFileSystem — RawLocalFileSystem
semantics under a non-file URI), so the same lifecycle measures the
Hadoop-FS-layer code path the object-store story uses: epoch
discovery, compaction's fold/retention/promote, the per-epoch
takedown swaps (delete_ids remote_ok), vacuum, and the sidecar IO.
Same disk underneath — the delta vs the default run is the FS-layer
dispatch cost, not network.
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
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MAX_PARALLEL = int(sys.argv[3]) if len(sys.argv) > 3 else 4
RESUME_EPOCHS = 2
TOKENS = 40
DIM = 64
PLANES_P = 16
JACCARD_MIN = 0.8
EMB_T = 0.1
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _drain(q, labels_root: str, n_label_epochs: int, timeout: float = 1800.0):
    """Wait until the stream has written n_label_epochs labels dirs and
    reports no pending data, then stop it (availableNow is incompatible
    with maxFilesPerTrigger on the file source — same drain recipe as
    tests/test_streaming_stateful.py). Epoch discovery via the
    engine's scheme-agnostic lister (the mock-scheme runs cannot
    os.listdir the state)."""
    from sqlite_vector_spark.streaming.scoring import _epoch_ids

    deadline = time.time() + timeout
    try:
        while time.time() < deadline:
            eps = _epoch_ids(labels_root)
            if len(eps) >= n_label_epochs and not q.status["isDataAvailable"]:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)
    return [
        (int(p["batchId"]), round(p["durationMs"]["triggerExecution"] / 1000.0, 2))
        for p in q.recentProgress
        if p.get("numInputRows", 0) > 0
    ]


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    scheme = os.environ.get("SVSPARK_PROBE_SCHEME", "")
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stream-state-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if scheme == "mock":
        classes = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "javalib", "classes",
        )
        builder = (
            builder.config("spark.hadoop.fs.mock.impl", "MockFileSystem")
            .config("spark.driver.extraClassPath", classes)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.sinks import takedown
    from sqlite_vector_spark.streaming.scoring import (
        compact_stream_state,
        ingest_stream_embedding_neardup,
        ingest_stream_neardup,
        vacuum_stream_state,
    )

    root = tempfile.mkdtemp(prefix="svspark_stream_probe_")
    per_epoch = N // EPOCHS
    out: dict = {"n_rows": N, "epochs": EPOCHS, "rows_per_epoch": per_epoch,
                 "dim": DIM, "cpus": int(CPUS)}
    try:
        # ---- epoch frames (same planted-dup recipes as takedown_probe:
        # id%20==1 copies id-1 -> ~5% of docs are cluster members) ------
        MOD = 2_147_483_647
        BIGP = 1_000_003

        def doc_frame(lo: int, hi: int):
            is_dup = (F.col("id") % 20) == 1
            src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
            arr = F.transform(
                F.sequence(F.lit(0), F.lit(TOKENS - 1)),
                lambda j: F.concat(
                    F.lit("w"),
                    ((src * F.lit(2_654_435_761) + j.cast("bigint") * F.lit(40_503))
                     % F.lit(MOD)).cast("string"),
                ),
            )
            arr2 = F.when(
                is_dup,
                F.concat(F.slice(arr, 1, TOKENS - 1),
                         F.array(F.concat(F.lit("zz"), (F.col("id") % 997).cast("string")))),
            ).otherwise(arr)
            return spark.range(lo, hi).select(
                F.col("id").alias("doc_id"), F.concat_ws(" ", arr2).alias("text"))

        def vec_frame(lo: int, hi: int):
            is_dup = (F.col("id") % 20) == 1
            src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
            return spark.range(lo, hi).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda j: (
                        F.pmod(F.xxhash64(src * F.lit(DIM) + j.cast("bigint")), F.lit(BIGP))
                        .cast("double") / F.lit(float(BIGP)) - F.lit(0.5)
                    ).cast("float"),
                ).alias("embedding"),
            )

        # Gaussian family, NOT a linear formula: correlated planes
        # concentrate the corpus into few buckets and blow the
        # candidate count up ~64x (measured — see
        # operators.dedup.random_hyperplanes); with 1M vectors that
        # skew turned every micro-batch verify into a 146M-pair join
        from sqlite_vector_spark.operators.dedup import random_hyperplanes

        planes = random_hyperplanes(PLANES_P, DIM, seed=7)

        doc_src = os.path.join(root, "doc_src")
        vec_src = os.path.join(root, "vec_src")
        # sources/checkpoints stay local either way; only the STATE
        # roots move to the probe scheme — that is where the FS-layer
        # code path lives
        prefix = "mock:" if scheme == "mock" else ""
        tstate = prefix + os.path.join(root, "tstate")
        estate = prefix + os.path.join(root, "estate")
        out["state_scheme"] = scheme or "local"

        def run_text(n_label_epochs):
            stream = (
                spark.readStream.schema("doc_id bigint, text string")
                .option("maxFilesPerTrigger", 1).parquet(doc_src)
            )
            q = ingest_stream_neardup(
                stream, tstate, os.path.join(root, "tckpt"), jaccard_min=JACCARD_MIN)
            return _drain(q, os.path.join(tstate, "labels"), n_label_epochs)

        def run_emb(n_label_epochs):
            stream = (
                spark.readStream.schema("vec_id bigint, embedding array<float>")
                .option("maxFilesPerTrigger", 1).parquet(vec_src)
            )
            q = ingest_stream_embedding_neardup(
                stream, estate, os.path.join(root, "eckpt"), planes, threshold=EMB_T)
            return _drain(q, os.path.join(estate, "labels"), n_label_epochs)

        # ---- 1. build E epochs, one parquet file per micro-batch ------
        for e in range(EPOCHS):
            doc_frame(e * per_epoch, (e + 1) * per_epoch).coalesce(1) \
                .write.mode("append").parquet(doc_src)
            vec_frame(e * per_epoch, (e + 1) * per_epoch).coalesce(1) \
                .write.mode("append").parquet(vec_src)
        t0 = time.time()
        out["text_batch_s"] = run_text(EPOCHS)
        out["text_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["emb_batch_s"] = run_emb(EPOCHS)
        out["emb_build_s"] = round(time.time() - t0, 2)

        # ---- 2. compact (default watermark: newest epoch untouched) ---
        t0 = time.time()
        tcrep = compact_stream_state(spark, tstate)
        ecrep = compact_stream_state(spark, estate)
        out["compact_s"] = round(time.time() - t0, 2)
        out["text_read_paths"] = tcrep["read_paths"]
        out["emb_read_paths"] = ecrep["read_paths"]

        # ---- 3. resume over the compacted states ----------------------
        for e in range(EPOCHS, EPOCHS + RESUME_EPOCHS):
            doc_frame(e * per_epoch, (e + 1) * per_epoch).coalesce(1) \
                .write.mode("append").parquet(doc_src)
            vec_frame(e * per_epoch, (e + 1) * per_epoch).coalesce(1) \
                .write.mode("append").parquet(vec_src)
        # labels after compaction: {base live, newest} + RESUME_EPOCHS new
        out["text_batch_s_after_compact"] = run_text(2 + RESUME_EPOCHS)
        out["emb_batch_s_after_compact"] = run_emb(2 + RESUME_EPOCHS)

        # ---- 4. one-call takedown over BOTH stream tiers --------------
        total = (EPOCHS + RESUME_EPOCHS) * per_epoch
        victims = [int(i) for i in range(1, total, total // 1000)][:1000]
        out["n_deleted"] = len(victims)
        dummy = vec_frame(0, 10)
        dummy.createOrReplaceTempView("stream_probe_t")
        cat = VectorCatalog(os.path.join(root, "cat"))
        cat.vector_init(dummy, "stream_probe_t", "embedding",
                        f"type=FLOAT32,dimension={DIM},distance=L2")
        cat.set_stream_state("stream_probe_t", "embedding",
                             state_dir=tstate, embedding_state_dir=estate)
        t0 = time.time()
        reports = takedown(spark, cat, "stream_probe_t", "embedding", victims,
                           verify=True, max_parallel=MAX_PARALLEL)
        out["stream_takedown_s"] = round(time.time() - t0, 2)
        out["verify_all_zero"] = all(v == 0 for v in reports["verified"].values())
        out["band_rows_deleted"] = reports["stream_state"]["band_rows_deleted"]
        out["bucket_rows_deleted"] = reports["embedding_stream_state"]["bucket_rows_deleted"]

        # ---- 5. vacuum -------------------------------------------------
        t0 = time.time()
        freed = (vacuum_stream_state(tstate)["bytes_freed"]
                 + vacuum_stream_state(estate)["bytes_freed"])
        out["vacuum_s"] = round(time.time() - t0, 2)
        out["vacuum_mb_freed"] = round(freed / 1e6, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
