"""Token co-occurrence lift at the 1M-doc scale, with PLANTED truth.

Corpus design (deterministic, in-plan):
- planted collocation: 'alpha'+'beta' appear TOGETHER in 30% of docs
  -> exact lift = 1/0.3 = 3.333... and must rank first;
- independence controls: 'xtok' (50% of docs, id%2), 'ytok' (33%,
  id%3) co-occur at 1/6 -> lift == 1.0 by construction; 8 'catK'
  tokens on independent id bits (50% each, pairwise co-occur 25% ->
  lift ~ 1.0) supply the market-basket volume (~45 in-vocab pairs
  per doc);
- mutual exclusion: 'ptok' (even ids) and 'qtok' (odd ids) NEVER
  co-occur and must be absent;
- 30 unique background tokens per doc (df ~ 1) fall below the 5% df
  floor and never reach the pair join.

Usage: python tools/cooc_scale_probe.py [n_docs]   (default 1000000)
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BG_TOKENS = 30
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = 4053


def shuffle_totals():
    try:
        base = f"http://localhost:{UI_PORT}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=5))
        app = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(f"{base}/{app}/stages?status=COMPLETE", timeout=5))
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
        .appName("cooc-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sqlite_vector_spark import workload as w

    out = {"n_docs": N, "cpus": int(CPUS)}
    MOD = 2_147_483_647
    bg = F.transform(
        F.sequence(F.lit(0), F.lit(BG_TOKENS - 1)),
        lambda j: F.concat(
            F.lit("bg"),
            ((F.col("id") * F.lit(2_654_435_761) + j.cast("bigint") * F.lit(40_503)) % F.lit(MOD)).cast("string"),
        ),
    )
    toks = bg
    for k in range(8):
        toks = F.when(
            (F.col("id") / F.lit(2**k)).cast("bigint") % 2 == 0, F.concat(toks, F.array(F.lit(f"cat{k}")))
        ).otherwise(toks)
    toks = F.when(F.col("id") % 10 < 3, F.concat(toks, F.array(F.lit("alpha"), F.lit("beta")))).otherwise(toks)
    toks = F.when(F.col("id") % 2 == 0, F.concat(toks, F.array(F.lit("xtok"), F.lit("ptok")))).otherwise(
        F.concat(toks, F.array(F.lit("qtok")))
    )
    toks = F.when(F.col("id") % 3 == 0, F.concat(toks, F.array(F.lit("ytok")))).otherwise(toks)

    sf_dir = tempfile.mkdtemp(prefix="svspark_cooc_")
    t0 = time.time()
    (
        spark.range(N)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text"))
        .write.mode("overwrite")
        .parquet(f"{sf_dir}/documents.parquet")
    )
    out["gen_s"] = round(time.time() - t0, 2)

    w0, r0 = shuffle_totals()
    t0 = time.time()
    rows = w.token_cooccurrence_q(spark, sf_dir).collect()
    out["cooc_s"] = round(time.time() - t0, 2)
    w1, r1 = shuffle_totals()
    out["shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
    out["shuffle_read_mb"] = round((r1 - r0) / 1e6, 1)
    out["result_rows"] = len(rows)

    got = {(r.t1, r.t2): r for r in rows}
    planted = got.get(("alpha", "beta"))
    out["planted_rank"] = next(
        (i + 1 for i, r in enumerate(rows) if (r.t1, r.t2) == ("alpha", "beta")), None
    )
    out["planted_lift"] = round(planted.lift, 4) if planted else None
    ind = got.get(("xtok", "ytok"))
    out["independent_lift"] = round(ind.lift, 4) if ind else None
    cat_lifts = [r.lift for (a, b), r in got.items() if a.startswith("cat") and b.startswith("cat")]
    out["cat_pairs"] = len(cat_lifts)
    out["cat_lift_max_dev"] = round(max(abs(v - 1.0) for v in cat_lifts), 4) if cat_lifts else None
    out["exclusive_pair_absent"] = ("ptok", "qtok") not in got
    out["n_bg_tokens_in_pairs"] = sum(1 for (a, b) in got if a.startswith("bg") or b.startswith("bg"))

    print(json.dumps(out))
    shutil.rmtree(sf_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
