"""Benchmark-contamination detection for training corpora.

Flags training documents that share word n-gram shingles with an
evaluation/benchmark set — the standard decontamination step before
pretraining (n-gram overlap against eval benchmarks). Beyond the
reference's own surface; first-class for an LLM-data pipeline.

Scale shape (the only one that survives 100 TB): the benchmark side is
always small (eval suites are MBs), so its distinct shingle set is
BROADCAST; the corpus side explodes shingles map-side, hash-joins the
broadcast set with no corpus shuffle, and aggregates per doc_id with
map-side partial counts. The corpus is never shuffled on shingle —
compare dedup's LSH banding, where both sides are large and a (band,
hash) shuffle is unavoidable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sqlite_vector_spark.functions.text import shingles_from_words, words


def _distinct_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh) with sh = the doc's DISTINCT shingle array — the
    within-doc dedup happens map-side via array_distinct, so nothing
    here shuffles. Words are projected before shingling (attribute
    boundary — see shingles_from_words)."""
    return docs.select(
        F.col(id_col).cast("bigint").alias("id"), words(text_col).alias("w")
    ).select("id", F.array_distinct(shingles_from_words(F.col("w"), n)).alias("sh"))


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per training doc: how many of its distinct shingles appear in
    the benchmark set. Returns (doc_id, n_shingles, n_overlap,
    contamination) for every doc in ``docs``; contamination is the
    overlapped fraction in [0, 1] (0.0 for shingle-less short docs).

    The corpus side is NEVER shuffled: per-doc totals come from the
    map-side array (size of array_distinct), the benchmark-shingle
    join is broadcast, and the only exchanges carry (a) the tiny
    benchmark shingle set and (b) (id, count) partials for docs that
    actually overlap — at 100 TB both are negligible next to the scan.
    """
    bench_sh = (
        _distinct_shingles(bench, id_col, text_col, n)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    base = _distinct_shingles(docs, id_col, text_col, n).select(
        "id", "sh", F.size("sh").cast("bigint").alias("n_shingles")
    )
    overlap = (
        base.select("id", F.explode("sh").alias("shingle"))
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        base.select(F.col("id").alias("doc_id"), "n_shingles")
        .join(overlap.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.when(F.col("n_shingles") == 0, F.lit(0.0))
            .otherwise(F.coalesce("n_overlap", F.lit(0)).cast("double") / F.col("n_shingles").cast("double"))
            .alias("contamination"),
        )
    )
