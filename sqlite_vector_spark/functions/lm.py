"""N-gram language-model scoring: the CCNet-style quality filter.

A pretraining pipeline ranks documents by how "language-like" they
are under a reference LM (CCNet, Wenzek et al. 2019 — public); the
deterministic distributed form here is an add-k-smoothed bigram model
trained on a reference slice of the corpus and applied to the rest:

    P(t2 | t1) = (c(t1, t2) + k) / (c(t1) + k * V)

Physical story (the 100 TB shape):
- training = ONE shuffle each for unigram and bigram counts, both
  with map-side combine (tokens/bigrams never leave the executor
  un-aggregated); ``vocab_limit`` bounds the model to the top-V
  unigrams so the count tables stay broadcastable;
- scoring = explode the scored docs to bigrams, two left joins
  against the count tables (broadcast when the model is bounded),
  and ONE groupBy(doc) with fixed-point partial sums.

Determinism contract: counts are exact integers; P is one IEEE
double division of exact integers (correctly rounded, identical on
every engine); the per-doc aggregate is the fixed-point recipe
(round(x*1e6) summed in DECIMAL(38,0)), so partial-agg order cannot
perturb it. The oracle-gated projection (workload.lm_doc_scores_q)
emits only these rational columns; log-domain perplexity — whose
``ln`` is not bit-specified across engines — is a separate,
non-gated convenience column (``with_perplexity``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sqlite_vector_spark.functions.text import let, words


def doc_bigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, t1, t2) — one row per adjacent whitespace-token pair,
    in document order. Docs with < 2 tokens contribute no rows.

    The words array is let-bound: inlined it would be re-split for
    each of the four slice/size references (HOFs are CodegenFallback,
    so no codegen subexpression elimination applies)."""
    pairs = let(
        words(F.col(text_col)),
        lambda w: F.zip_with(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
        ),
    )
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"), F.explode(pairs).alias("bg")
    ).select("doc_id", F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_limit: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """(unigram counts, bigram counts, V). One count shuffle each,
    map-side partials. ``vocab_limit`` keeps only the top-V tokens by
    (count desc, token asc) — the broadcastable-model bound; bigrams
    over dropped tokens simply fall to the smoothing floor at scoring
    time. V is the retained vocabulary size."""
    uni = (
        docs.select(F.explode(words(F.col(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    if vocab_limit is not None:
        from pyspark.sql import Window

        w = Window.orderBy(F.col("c1").desc(), F.col("t").asc())
        uni = uni.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= vocab_limit
        ).drop("_rn")
    bi = (
        doc_bigrams(docs, text_col, id_col)
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    v = uni.count()
    return uni, bi, v


def score_documents(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc LM agreement -> (doc_id, n_bigrams, psum) where
    ``psum`` = fixed-point Σ P(t2|t1) over the doc's bigrams (mean
    probability x n — the rational, engine-exact quality signal; use
    with_perplexity for the log-domain view). Docs with no bigrams
    score (0, 0.0)."""
    bg = doc_bigrams(docs, text_col, id_col)
    uni = F.broadcast(unigrams) if broadcast_model else unigrams
    bi = F.broadcast(bigrams) if broadcast_model else bigrams
    joined = (
        bg.join(bi, ["t1", "t2"], "left")
        .join(uni.select(F.col("t").alias("t1"), "c1"), ["t1"], "left")
        .select(
            "doc_id",
            (
                (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + F.lit(float(k)))
                / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(float(k) * vocab_size))
            ).alias("p"),
        )
    )
    scored = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum(F.round(F.col("p") * F.lit(1_000_000.0)).cast("decimal(38,0)")).cast("double") / F.lit(1_000_000.0)).alias("psum"),
    )
    all_docs = docs.select(F.col(id_col).cast("bigint").alias("doc_id"))
    return (
        all_docs.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("psum"), F.lit(0.0)).alias("psum"),
        )
    )


def with_perplexity(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_bigrams, logprob, perplexity) — the conventional
    log-domain form: ppl = exp(-Σ ln P / n). ``ln``/``exp`` are not
    bit-specified across engines, so this is the ANALYSIS surface;
    the oracle gate rides on score_documents' rational columns."""
    bg = doc_bigrams(docs, text_col, id_col)
    joined = (
        bg.join(F.broadcast(bigrams), ["t1", "t2"], "left")
        .join(F.broadcast(unigrams.select(F.col("t").alias("t1"), "c1")), ["t1"], "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + F.lit(float(k)))
                / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(float(k) * vocab_size))
            ).alias("lp"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").alias("logprob"),
        F.exp(-F.sum("lp") / F.count(F.lit(1))).alias("perplexity"),
    )
