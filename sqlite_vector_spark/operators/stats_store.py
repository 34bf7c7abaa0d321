"""Incremental per-source corpus statistics store.

The one-shot data card (workload.corpus_report_q) rescans the corpus;
a daily-append 100 TB pipeline wants yesterday's card UPDATED by the
new partition only. Everything in the card is chosen to be mergeable:

- additive counters (docs, tokens, chars, keep-hits) merge by SUM;
- the exact-dup signal keeps a DataSketches HLL of full-text
  fingerprints per source — sketch union IS the merge (register-max,
  layout- and order-independent), so the dup RATIO in the incremental
  card is estimate-based with the HLL error bound, while the one-shot
  card stays exact;
- the language set is a bounded array (languages are O(100)) merged
  by array union.

``stats_append(new_docs)`` therefore costs one pass over the NEW rows
plus a merge of #sources store rows — never a corpus rescan — and
``append == rebuild`` holds exactly for the additive columns and
within the sketch bound for the distinct estimate (tested).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _partials(docs: DataFrame) -> DataFrame:
    """One mergeable row per source from a single scan."""
    from sqlite_vector_spark.functions.text import fingerprint, words
    from sqlite_vector_spark.workload import _gopher_keep, _gopher_metrics

    w = words("text")
    n_words, char_sum, stop_hits, n_types = _gopher_metrics(w)
    row = docs.select(
        "source",
        "lang",
        n_words.alias("toks"),
        F.length("text").cast("bigint").alias("chars"),
        fingerprint(F.col("text")).alias("fp"),
        _gopher_keep(n_words, char_sum, stop_hits, n_types).cast("int").alias("keep"),
    )
    return row.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.sum("chars").cast("bigint").alias("chars"),
        F.sum("keep").cast("bigint").alias("n_keep"),
        F.hll_sketch_agg("fp").alias("fp_sk"),
        F.sort_array(F.collect_set("lang")).alias("langs"),
    )


def stats_store(docs: DataFrame, path: str) -> None:
    """(Re)build the store from scratch — one corpus pass."""
    _partials(docs).write.mode("overwrite").parquet(path)


def stats_append(new_docs: DataFrame, path: str) -> None:
    """Fold a new batch into the store: one pass over the BATCH, then
    a #sources-row merge (sum / sketch-union / set-union). The store
    is bounded (rows = sources), so the read-merge-rewrite is
    driver-cheap at any corpus size."""
    spark = new_docs.sparkSession
    old = spark.read.parquet(path)
    merged = (
        old.unionByName(_partials(new_docs))
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("chars").cast("bigint").alias("chars"),
            F.sum("n_keep").cast("bigint").alias("n_keep"),
            F.hll_union_agg("fp_sk").alias("fp_sk"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("langs")))).alias("langs"),
        )
        .localCheckpoint(eager=True)  # sever lineage from `path` before overwrite
    )
    merged.write.mode("overwrite").parquet(path)


def stats_report(spark: SparkSession, path: str) -> DataFrame:
    """The data card from the store: same columns as the one-shot
    corpus_report, with dup_ratio estimate-based (HLL)."""
    s = spark.read.parquet(path)
    est_unique = F.least(F.hll_sketch_estimate("fp_sk"), F.col("n_docs").cast("double"))
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        F.size("langs").cast("bigint").alias("n_langs"),
        (F.col("chars").cast("double") / F.col("n_docs").cast("double")).alias("mean_chars"),
        ((F.col("n_docs").cast("double") - est_unique) / F.col("n_docs").cast("double")).alias("dup_ratio_est"),
        (F.col("n_keep").cast("double") / F.col("n_docs").cast("double")).alias("keep_rate"),
    ).orderBy("source")
