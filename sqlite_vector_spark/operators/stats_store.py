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

Durability: the store is a directory of immutable versioned snapshots
(``v000000``, ``v000001``, ...). Writers never touch the live
snapshot — each (re)build or append writes a NEW ``vN`` directory and
the snapshot only becomes visible once Spark's output committer drops
its ``_SUCCESS`` marker (the atomic commit point on HDFS; on object
stores the committer's final copy/rename plays the same role).
Readers resolve the HIGHEST version with a ``_SUCCESS`` marker, so a
failed or in-flight write is simply invisible and the previous
snapshot keeps serving. Superseded snapshots are pruned only AFTER
the new one is fully committed, and the most recent superseded
snapshot is retained one extra publish cycle so in-flight readers of
the prior version finish cleanly.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v(\d{6})$")


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path``'s scheme (local, HDFS, s3a...)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _committed_versions(spark: SparkSession, path: str) -> list[int]:
    """Version numbers under ``path`` whose snapshot is fully
    committed (has the ``_SUCCESS`` marker), ascending."""
    jpath, fs = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        m = _VERSION_RE.match(st.getPath().getName())
        if m and st.isDirectory():
            ok = st.getPath().suffix("/_SUCCESS")
            if fs.exists(ok):
                out.append(int(m.group(1)))
    return sorted(out)


def _resolve(spark: SparkSession, path: str) -> str:
    """Path of the newest committed snapshot (the live store)."""
    vs = _committed_versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no committed stats-store snapshot under {path}")
    return f"{path}/v{vs[-1]:06d}"


def _publish(partials: DataFrame, path: str) -> None:
    """Write ``partials`` as the next snapshot version, then prune
    superseded snapshots. The write lands in a fresh ``vN`` dir, so
    the previous snapshot stays intact (and keeps serving readers)
    until the new one's ``_SUCCESS`` marker exists."""
    spark = partials.sparkSession
    vs = _committed_versions(spark, path)
    new_v = (vs[-1] + 1) if vs else 0
    partials.write.mode("overwrite").parquet(f"{path}/v{new_v:06d}")
    # commit happened (Spark write returned) -> prune, but RETAIN the
    # immediately superseded snapshot as a grace window: a reader that
    # resolved v(new-1) before this commit may still be scanning it,
    # and deleting files under an in-flight scan fails the read. Only
    # versions older than new_v - 1 (already two commits stale) go.
    jpath, fs = _hadoop_fs(spark, path)
    jvm = spark._jvm
    for v in _committed_versions(spark, path):
        if v < new_v - 1:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/v{v:06d}"), True)


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
    """(Re)build the store from scratch — one corpus pass, published
    as a new committed snapshot."""
    _publish(_partials(docs), path)


def stats_append(new_docs: DataFrame, path: str) -> None:
    """Fold a new batch into the store: one pass over the BATCH, then
    a #sources-row merge (sum / sketch-union / set-union). The store
    is bounded (rows = sources), so the read-merge-rewrite is
    driver-cheap at any corpus size. The merge reads the live
    snapshot and writes a NEW one — a failure mid-append leaves the
    previous snapshot untouched and still resolvable."""
    spark = new_docs.sparkSession
    old = spark.read.parquet(_resolve(spark, path))
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
    )
    _publish(merged, path)


def stats_report(spark: SparkSession, path: str) -> DataFrame:
    """The data card from the store: same columns as the one-shot
    corpus_report, with dup_ratio estimate-based (HLL)."""
    s = spark.read.parquet(_resolve(spark, path))
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


def snapshot_drift(
    old_docs: DataFrame,
    new_docs: DataFrame,
    edges: "Sequence[int]" = (20, 40, 60, 80, 100, 150),
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source TOTAL-VARIATION DISTANCE between two corpus
    snapshots' document-length distributions — the drift monitor that
    says "today's crawl changed shape" before a model does: docs
    bucket by token count against fixed ``edges`` (bucket = #edges <=
    n, so b in 0..len(edges)), and per source
    TVD = 1/2 * Σ_b |p_b - q_b|. KL/PSI need ln(), which is not
    IEEE-bit-specified across engines; TVD is the standard rational
    alternative (bounded [0, 1], symmetric, metric).

    Exactness: with counts n_ob, n_nb and totals N_o, N_n,
    |p - q| = |n_ob*N_n - n_nb*N_o| / (N_o*N_n) — the numerators are
    exact integers summed in DECIMAL(38,0) (order-independent), and
    ONE double division at the end makes the result bit-stable under
    any partitioning, so it hash-gates.

    Returns (source, n_old, n_new, tvd). Shape: two single-shuffle
    (source, bucket) count aggs, a bucket-grid full join, one
    per-source agg — no text shuffles, no windows."""
    from sqlite_vector_spark.functions.text import words

    def bucket_counts(docs: DataFrame, out: str) -> DataFrame:
        from sqlite_vector_spark.functions.text import let

        # let-bind the token count: referenced inside the bucket
        # filter's lambda, it would re-split the text once per edge
        # (HOFs are CodegenFallback — no subexpression elimination)
        b = let(
            F.size(words(text_col)).cast("int"),
            lambda n_tok: F.size(
                F.filter(F.array(*[F.lit(int(e)) for e in edges]), lambda e: e <= n_tok)
            ),
        )
        return (
            docs.where(F.col(text_col).isNotNull())
            .select(F.col(source_col).alias("source"), b.alias("b"))
            .groupBy("source", "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    o = bucket_counts(old_docs, "n_o")
    n = bucket_counts(new_docs, "n_n")
    j = (
        o.join(n, ["source", "b"], "full_outer")
        .select(
            "source",
            F.coalesce("n_o", F.lit(0)).cast("bigint").alias("n_o"),
            F.coalesce("n_n", F.lit(0)).cast("bigint").alias("n_n"),
        )
    )
    per_src = j.groupBy("source").agg(
        F.sum("n_o").cast("bigint").alias("n_old"),
        F.sum("n_n").cast("bigint").alias("n_new"),
        F.collect_list(F.struct("n_o", "n_n")).alias("cells"),
    )
    num = F.aggregate(
        F.col("cells"),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, c: acc
        + F.abs(
            c["n_o"].cast("decimal(38,0)") * F.col("n_new").cast("decimal(38,0)")
            - c["n_n"].cast("decimal(38,0)") * F.col("n_old").cast("decimal(38,0)")
        ),
    )
    tvd = F.when(
        (F.col("n_old") > 0) & (F.col("n_new") > 0),
        num.cast("double")
        / (F.lit(2.0) * F.col("n_old").cast("double") * F.col("n_new").cast("double")),
    ).otherwise(F.lit(1.0))  # a source present in only one snapshot: max drift
    return per_src.select("source", "n_old", "n_new", tvd.alias("tvd")).orderBy("source")
