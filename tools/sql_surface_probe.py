"""SQL-surface probe: does the text surface tax the plan?

Times the SAME canonical top-k at scale through each entry point:
  - Column-built full_scan, codegen fold (the library baseline)
  - Column-built full_scan, Arrow/NumPy backend (the "SIMD" analog)
  - macro-expanded SQL via route_sql with no catalog (passthrough —
    must be plan-identical to the codegen Column build)
  - route_sql onto a registered quantized replica (the auto-route
    target; replica build timed separately)

Usage: python tools/sql_surface_probe.py [n_rows] [dim]
Prints one JSON line; paste results into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 768
K = 20
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sql-surface-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.sql import plan_route, route_sql
    from sqlite_vector_spark.version import set_backend

    root = tempfile.mkdtemp(prefix="svspark_sqlprobe_")
    base = os.path.join(root, "base")
    out = {"n": N, "dim": DIM, "k": K, "cpus": int(CPUS)}

    gen = spark.range(N).select(
        F.col("id").alias("vec_id"),
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

    q = [0.5 * (1 if j % 2 == 0 else -1) * ((j % 97) / 97.0) for j in range(DIM)]
    arr = "array(" + ", ".join(repr(float(v)) for v in q) + ")"
    sql = (
        f"SELECT vec_id AS id, vector_distance(embedding, {arr}, 'l2') AS distance "
        f"FROM probe_vectors ORDER BY distance ASC LIMIT {K}"
    )

    def timed(name, fn, n=2):
        best, r = None, None
        for _ in range(n):
            t = time.time()
            r = fn()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        return r

    set_backend("codegen")
    col_rows = timed("column_codegen_s", lambda: full_scan(df, "embedding", q, K, "L2", id_col="vec_id").collect())
    set_backend("arrow-numpy")
    timed("column_arrow_s", lambda: full_scan(df, "embedding", q, K, "L2", id_col="vec_id").collect())
    set_backend("codegen")

    # macro passthrough: no catalog -> spark.sql(expanded text)
    assert plan_route(None, sql).tier == "sql"
    sql_rows = timed("macro_sql_s", lambda: route_sql(spark, None, sql).collect())
    assert [r.id for r in sql_rows] == [r.id for r in col_rows], "macro != column result"
    out["macro_matches_column"] = True

    # routed: register + quantize, then the same TEXT hits the replica
    cat = VectorCatalog(os.path.join(root, "cat"))
    cat.vector_init(df, "probe_vectors", "embedding", f"type=FLOAT32,dimension={DIM},distance=L2")
    t0 = time.time()
    vector_quantize(df, "embedding", os.path.join(root, "shadow"), id_col="vec_id", catalog=cat, table="probe_vectors")
    out["replica_build_s"] = round(time.time() - t0, 2)
    assert plan_route(cat, sql).tier == "routed"
    routed_rows = timed("routed_quantized_s", lambda: route_sql(spark, cat, sql).collect())
    exact_ids = {r.id for r in col_rows}
    out["routed_recall_at_k"] = round(sum(1 for r in routed_rows if r.id in exact_ids) / K, 3)

    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
