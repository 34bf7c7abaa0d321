"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at a given
sf_dir, compare row-count + schema-width + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    try:  # numpy arrays from duckdb
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(norm_cell(x.item()) for x in v) + "]"
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return repr(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # the DRIVER's canonicalizer sorts + hashes scalar columns
            # and dies on container types (pandas "unhashable type:
            # 'list'") — fail HERE so a gate entry can't pass locally
            # but error in the real gate (the `normalize` r3/r4 trap)
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad_cols = [
                f.name for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad_cols:
                failures.append(name)
                print(f"FAIL {name}: container-typed gate columns {bad_cols} "
                      f"would break the driver canonicalizer — serialize them "
                      f"(CSV / fixed-point) like quantize_codes")
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in os_:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(os_[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={scols} duck={ocols}")
            continue
        sn, on = normalize(srows, scols), normalize(orows, ocols)
        if len(sn) != len(on):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sn)} duck={len(on)}")
            continue
        bad = [(a, b) for a, b in zip(sn, on) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)}/{len(sn)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
        else:
            print(f"PASS {name} ({len(sn)} rows) [{time.time()-t0:.1f}s]")
    print(("ALL PASS" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
