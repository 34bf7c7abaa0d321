"""Dump .explain('formatted') for the round-14 optimization targets.

Usage: python tools/dump_r14_plans.py <before|after> [query ...]

Writes plans/r14/<query>_<tag>.txt for each named workload query (all
targets when none named). Explain only — no execution — so fixture
builds are limited to what plan construction itself needs (centroid
collects, cached stores).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TARGETS = [
    "ivf_recall_curve_q",
    "jaccard_pairs_q",
    "neardup_keep_best_q",
    "incremental_neardup_q",
    "neardup_after_delete_q",
    "incremental_embedding_neardup_q",
    "embedding_neardup_after_delete_q",
    "e2e_corpus_prep_q",
    "source_overlap_q",
    "recall_at_k",
    "hybrid_rrf_batch_q",
    "token_cooccurrence_q",
    "lsh_pairs_q",
    "simhash_q",
    "edit_distance_pairs_q",
    "embedding_neardup_q",
    "pricing_summary",
    "minhash_sig_q",
    "corpus_report_q",
    "ivf_cluster_stats_q",
]


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or TARGETS
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sqlite_vector_spark import workload as w

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = getattr(w, name)
        try:
            df = fn(spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        short = name[:-2] if name.endswith("_q") else name
        path = os.path.join(outdir, f"{short}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow")
        print(f"{short}: {len(plan.splitlines())} lines, Exchange x{n_ex}, PythonEval x{n_py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
