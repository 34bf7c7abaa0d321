"""Versioned (pointer-flip) vs rename maintenance at 1M x 768 (round 12).

The object-store question: what does the rename-free swap cost
relative to the local os.rename fast path, at the reference's
headline scale? Builds the SAME 1M-row IVF-partitioned frame
(C=4096, the 100 TB partition-count regime from delete_probe.py)
as a flat store and as a versioned store, then runs the identical
lifecycle through the ONE dispatching verb set (sinks.delete_ids /
compact_store / vacuum_store):

- delete a 1k scattered id batch (touches <= ~22% of partitions);
- full-scan count through sinks.read_store BEFORE and AFTER the
  delete (the versioned read is a manifest-driven per-generation
  union — this measures the plan-width overhead two generations add);
- compact (folds the versioned store back to ONE generation);
- vacuum (drops the retained layout / superseded generations);
- content equality between the two modes after every step.

Usage: python tools/versioned_probe.py [n_rows] [dim]
Prints one JSON line; paste into SCALE.md.

r13 (VERDICT r12 #4): set SVSPARK_PROBE_BAND=1 to probe the BAND
(MIH) tier instead — the band-expanded layout holds every id in ALL
m = dim/band_bits partitions (m x rows per id), so its economics
differ from the id-partitioned IVF shape in exactly the ways the r12
advisor flagged: a delete touches EVERY partition (the manifest
reuses nothing by reference — it is a full-generation turnover), and
the manifest carries m x files-per-partition entries. The probe
builds the same 1M store in both swap modes (flat rename /
versioned pointer-flip), deletes a 1k id batch through the ONE
dispatching verb, and reports manifest growth + delete/scan cost +
content equality.
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
N_DELETE = 1000
IVF_C = 4096
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("versioned-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.sinks import (
        compact_store,
        delete_ids,
        read_store,
        vacuum_store,
    )
    from sqlite_vector_spark.versioned import (
        current_manifest,
        versioned_store_init,
    )

    if os.environ.get("SVSPARK_PROBE_BAND"):
        return band_main(spark)

    root = tempfile.mkdtemp(prefix="svspark_verprobe_")
    out: dict = {"n_rows": N, "dim": DIM, "n_delete": N_DELETE,
                 "ivf_c": IVF_C, "cpus": int(CPUS)}
    try:
        victims = list(range(0, N, max(1, N // N_DELETE)))[:N_DELETE]
        base = spark.range(N).select(
            F.col("id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda j: F.sin(F.col("id").cast("double") * j.cast("double") * F.lit(1e-5)),
            ).alias("vec"),
            F.pmod(F.hash(F.col("id")), F.lit(IVF_C)).cast("int").alias("cluster"),
        )

        flat = os.path.join(root, "flat")
        t0 = time.time()
        if os.environ.get("SVSPARK_PROBE_RAW_LAYOUT"):
            # the pre-r12 layout: partitionBy straight off the compute
            # tasks -> up to T*C files (kept behind a flag to reproduce
            # the layout-effect measurement in SCALE.md)
            base.write.partitionBy("cluster").parquet(flat)
        else:
            from sqlite_vector_spark.sinks import write_partitioned

            write_partitioned(base, flat, "cluster")
        out["flat_build_s"] = round(time.time() - t0, 2)

        ver = os.path.join(root, "ver")
        t0 = time.time()
        versioned_store_init(base, ver, partition_col="cluster")
        out["ver_build_s"] = round(time.time() - t0, 2)
        _, man = current_manifest(spark, ver)
        out["ver_manifest_files_v0"] = len(man["files"])

        def scan_s(path):
            t = time.time()
            n = read_store(spark, path).count()
            return round(time.time() - t, 2), n

        out["flat_scan_s"], n1 = scan_s(flat)
        out["ver_scan_s"], n2 = scan_s(ver)
        assert n1 == n2 == N

        t0 = time.time()
        rep_f = delete_ids(spark, flat, victims, id_col="id", partition_col="cluster")
        out["flat_delete_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        rep_v = delete_ids(spark, ver, victims, id_col="id", partition_col="cluster")
        out["ver_delete_s"] = round(time.time() - t0, 2)
        out["partitions_rewritten"] = rep_f["partitions_rewritten"]
        assert rep_f["deleted_rows"] == rep_v["deleted_rows"] == N_DELETE
        out["ver_manifest_files_v1"] = len(current_manifest(spark, ver)[1]["files"])

        # two live generations now: the union-plan read overhead
        out["flat_scan_after_delete_s"], n1 = scan_s(flat)
        out["ver_scan_after_delete_s"], n2 = scan_s(ver)
        assert n1 == n2 == N - N_DELETE
        # content equality across swap modes (cheap hash compare)
        h = lambda p: read_store(spark, p).select(  # noqa: E731
            F.expr("bit_xor(xxhash64(id, cast(vec[0] as string)))").alias("h")
        ).collect()[0][0]  # xor-fold: order-independent, ANSI-overflow-safe
        out["content_equal_after_delete"] = bool(h(flat) == h(ver))

        t0 = time.time()
        compact_store(spark, flat, partition_col="cluster")
        out["flat_compact_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        compact_store(spark, ver, partition_col="cluster")
        out["ver_compact_s"] = round(time.time() - t0, 2)
        out["ver_scan_after_compact_s"], n2 = scan_s(ver)
        assert n2 == N - N_DELETE

        t0 = time.time()
        rep = vacuum_store(flat, spark=spark)
        out["flat_vacuum_s"] = round(time.time() - t0, 2)
        out["flat_vacuum_gb"] = round(rep["bytes_freed"] / 1e9, 2)
        t0 = time.time()
        rep = vacuum_store(ver, spark=spark)
        out["ver_vacuum_s"] = round(time.time() - t0, 2)
        out["ver_vacuum_gb"] = round(rep["bytes_freed"] / 1e9, 2)
        out["content_equal_final"] = bool(h(flat) == h(ver))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


def band_main(spark):
    """BAND (MIH) tier phase: m x rows per id, partitioned by band
    index ``b`` — every delete touches every partition, so the
    versioned manifest turns over a whole generation (no by-reference
    reuse) and its size is m x files-per-partition. Reports the same
    lifecycle costs as the IVF phase for the same 1k-id takedown."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.bq import explode_bands
    from sqlite_vector_spark.sinks import (
        delete_ids,
        read_store,
        vacuum_store,
        write_partitioned,
    )
    from sqlite_vector_spark.versioned import current_manifest, versioned_store_init

    band_bits = 16
    m = DIM // band_bits
    out: dict = {"probe": "band", "n_rows": N, "dim": DIM, "band_bits": band_bits,
                 "m_bands": m, "n_delete": N_DELETE, "cpus": int(CPUS)}
    root = tempfile.mkdtemp(prefix="svspark_verprobe_band_")
    try:
        victims = list(range(0, N, max(1, N // N_DELETE)))[:N_DELETE]
        # synthetic 1-bit codes: dim bits as dim/64 hash lanes (the
        # maintenance economics depend only on layout, not code quality)
        codes = spark.range(N).select(
            F.col("id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM // 64)),
                lambda j: F.xxhash64(F.col("id"), j),
            ).alias("bits"),
        )
        band = explode_bands(codes, F.col("bits"), ["id", "bits"], DIM, band_bits)

        flat = os.path.join(root, "flat")
        t0 = time.time()
        write_partitioned(band, flat, "b", sort_within=["bv"])
        out["flat_build_s"] = round(time.time() - t0, 2)

        ver = os.path.join(root, "ver")
        t0 = time.time()
        versioned_store_init(band, ver, partition_col="b", sort_within=["bv"])
        out["ver_build_s"] = round(time.time() - t0, 2)
        _, man = current_manifest(spark, ver)
        out["ver_manifest_files_v0"] = len(man["files"])

        def scan_s(path):
            t = time.time()
            n = read_store(spark, path).count()
            return round(time.time() - t, 2), n

        out["flat_scan_s"], n1 = scan_s(flat)
        out["ver_scan_s"], n2 = scan_s(ver)
        assert n1 == n2 == N * m

        t0 = time.time()
        rep_f = delete_ids(spark, flat, victims, id_col="id",
                           partition_col="b", sort_within=["bv"])
        out["flat_delete_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        rep_v = delete_ids(spark, ver, victims, id_col="id", sort_within=["bv"])
        out["ver_delete_s"] = round(time.time() - t0, 2)
        out["partitions_rewritten"] = rep_f["partitions_rewritten"]
        assert rep_f["deleted_rows"] == rep_v["deleted_rows"] == N_DELETE * m
        out["ver_manifest_files_v1"] = len(current_manifest(spark, ver)[1]["files"])

        out["flat_scan_after_delete_s"], n1 = scan_s(flat)
        out["ver_scan_after_delete_s"], n2 = scan_s(ver)
        assert n1 == n2 == (N - N_DELETE) * m
        h = lambda p: read_store(spark, p).select(  # noqa: E731
            F.expr("bit_xor(xxhash64(id, b, bv))").alias("h")
        ).collect()[0][0]
        out["content_equal_after_delete"] = bool(h(flat) == h(ver))

        t0 = time.time()
        rep = vacuum_store(flat, spark=spark)
        out["flat_vacuum_s"] = round(time.time() - t0, 2)
        out["flat_vacuum_gb"] = round(rep["bytes_freed"] / 1e9, 2)
        t0 = time.time()
        rep = vacuum_store(ver, spark=spark)
        out["ver_vacuum_s"] = round(time.time() - t0, 2)
        out["ver_vacuum_gb"] = round(rep["bytes_freed"] / 1e9, 2)
        out["content_equal_final"] = bool(h(flat) == h(ver))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
