"""EP1-as-one-SQL-string at the reference's headline scale.

VERDICT r8 #8: show that the SQL text surface — the embedded
vector_quantize_scan TVF expanded to a temp-view subquery plus the
payload join-back, exactly the reference's flagship composition
(SURVEY §3 EP1, API.md:260) — compiles to the SAME physical plan as
the direct DataFrame-API composition at 1M x 768: same join strategy,
same exchange count, same reuse. The text layer must be a parser, not
a tax.

Usage: python tools/ep1_sql_probe.py [n_rows] [dim]
Prints one JSON line; paste results + plan summary into SCALE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 768
K = 20
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def plan_signature(df) -> dict:
    """Operator counts that pin the physical shape of a plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": plan.count("ReusedExchange"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "parquet_scans": plan.count("Scan parquet"),
    }


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ep1-sql-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import (
        QuantParams,
        vector_quantize,
        vector_quantize_scan,
    )
    from sqlite_vector_spark.sql import route_sql
    from sqlite_vector_spark.version import set_backend

    root = tempfile.mkdtemp(prefix="svspark_ep1probe_")
    base = os.path.join(root, "base")
    out = {"n": N, "dim": DIM, "k": K, "cpus": int(CPUS)}

    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 5).cast("int").alias("label"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: F.sin(F.col("id").cast("double") * j.cast("double") * F.lit(1e-5)).cast("float"),
        ).alias("embedding"),
    )
    t0 = time.time()
    gen.write.mode("overwrite").parquet(base)
    out["gen_write_s"] = round(time.time() - t0, 2)
    df = spark.read.parquet(base)
    df.createOrReplaceTempView("probe_vectors")

    cat = VectorCatalog(os.path.join(root, "cat"))
    ctx = cat.vector_init(df, "probe_vectors", "embedding", f"type=FLOAT32,dimension={DIM},distance=L2")
    t0 = time.time()
    vector_quantize(df, "embedding", os.path.join(root, "shadow"), id_col="vec_id", catalog=cat, table="probe_vectors")
    out["replica_build_s"] = round(time.time() - t0, 2)

    q = [0.5 * (1 if j % 2 == 0 else -1) * ((j % 97) / 97.0) for j in range(DIM)]
    set_backend("codegen")  # identical kernels on both arms

    # direct DataFrame-API composition (the library EP1)
    codes = spark.read.parquet(ctx.quantized_path)
    params = QuantParams(ctx.resolved_qtype, float(ctx.qscale), float(ctx.qoffset), 0)

    def direct():
        v = vector_quantize_scan(codes, q, params, K, "L2")
        return (
            v.join(df, v["id"] == df["vec_id"])
            .select(v["id"], "distance", F.col("label").cast("int").alias("label"))
            .orderBy(F.col("distance").asc(), F.col("id").asc())
        )

    # the reference's one-string spelling through route_sql
    sql = (
        "SELECT v.rowid AS id, v.distance, CAST(e.label AS INT) AS label "
        f"FROM vector_quantize_scan('probe_vectors','embedding','{json.dumps(q)}', {K}) v "
        "JOIN probe_vectors e ON e.vec_id = v.rowid "
        "ORDER BY v.distance ASC, id ASC"
    )

    def texted():
        return route_sql(spark, cat, sql, id_col="vec_id")

    def timed(name, fn, n=3):
        best, r = None, None
        for _ in range(n):
            t = time.time()
            r = fn().collect()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        return r

    d_rows = timed("direct_api_s", direct)
    s_rows = timed("sql_text_s", texted)
    out["rows_equal"] = [tuple(r) for r in d_rows] == [tuple(r) for r in s_rows]

    sig_d = plan_signature(direct())
    sig_s = plan_signature(texted())
    out["plan_direct"] = sig_d
    out["plan_sql"] = sig_s
    out["plans_equivalent"] = sig_d == sig_s

    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
