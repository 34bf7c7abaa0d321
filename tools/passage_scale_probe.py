"""Passage-level dedup at 1M docs: repeated_passage_strip with a
PLANTED 12-token passage inserted into every id % 20 == 5 doc at a
VARYING offset (id % 7) — deliberately chunk-misaligned, the case the
disjoint-chunk boilerplate strip cannot catch. Expected outcome is
exact: only windows fully inside the passage repeat corpus-wide
(boundary windows mix unique context), their union covers precisely
the 12 planted tokens, so every planted doc loses exactly 12 tokens
in exactly 1 span and no other doc loses anything.

Hashes: xxhash64 (the production hash; the gated entry pins the same
chain under the parity polyhash). Reports wall time + shuffle bytes.

Usage: python tools/passage_scale_probe.py [n_docs]  (default 1000000)
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
TOKENS = 48
WIDTH = 8
PASSAGE = [f"leak{i}" for i in range(12)]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = 4052


def shuffle_totals():
    try:
        base = f"http://localhost:{UI_PORT}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=5))
        app = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app}/stages?status=COMPLETE", timeout=5)
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return 0


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("passage-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark.operators.dedup import repeated_passage_strip

    out = {"n_docs": N, "width": WIDTH, "cpus": int(CPUS)}
    planted = (F.col("id") % 20) == 5
    offset = (F.col("id") % 7).cast("int")  # insertion point: varies -> misaligned
    # vocabulary 10^12: boundary windows (1 context token + 7 passage
    # tokens) must NOT birthday-collide across 50k planted docs — a
    # 1000-token vocab collides them and the spans correctly grow
    body = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(1_000_000_000_000)).cast("string"),
        ),
    )
    passage = F.array(*[F.lit(t) for t in PASSAGE])
    arr = F.when(
        planted,
        F.concat(
            F.slice(body, 1, offset + F.lit(1)),
            passage,
            F.slice(body, offset + F.lit(2), F.lit(TOKENS)),
        ),
    ).otherwise(body)
    t0 = time.time()
    docs = (
        spark.range(N)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", arr).alias("text"))
        .localCheckpoint(eager=True)
    )
    out["gen_s"] = round(time.time() - t0, 2)
    n_planted = sum(1 for i in range(N) if i % 20 == 5)
    out["planted_docs"] = n_planted

    w0 = shuffle_totals()
    t0 = time.time()
    res = repeated_passage_strip(
        docs, "doc_id", "text", width=WIDTH, min_df=2, hash_fn=F.xxhash64
    ).localCheckpoint(eager=True)
    out["strip_s"] = round(time.time() - t0, 2)
    out["shuffle_write_mb"] = round((shuffle_totals() - w0) / 1e6, 1)

    agg = res.agg(
        F.sum("n_removed").alias("rm"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias("touched"),
        F.sum("n_spans").alias("spans"),
        F.max(F.when(F.col("n_removed") > 0, F.col("n_removed"))).alias("max_rm"),
        F.min(F.when(F.col("n_removed") > 0, F.col("n_removed"))).alias("min_rm"),
    ).collect()[0]
    out["tokens_removed"] = int(agg.rm)
    out["docs_touched"] = int(agg.touched)
    out["spans"] = int(agg.spans)
    out["exact"] = bool(
        agg.rm == 12 * n_planted
        and agg.touched == n_planted
        and agg.spans == n_planted
        and agg.max_rm == 12 == agg.min_rm
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
