"""r14 optimization guards: let-bound text expressions == inline forms.

The r14 optimization round replaced inline ``words(text)`` references
with ``functions.text.let`` bindings (or attribute-boundary
projections) in shingles / quality_score / doc_bigrams /
boilerplate-strip / bm25 — HOF lambdas are CodegenFallback, so the
inline forms re-evaluated the split once per reference (measured 1.36
-> 0.48 s on the sf0.1 shingle explode). These tests pin that the
bound forms produce byte-identical results to the inline expressions
they replaced, on real fixture text.
"""

import pyspark.sql.functions as F

from sqlite_vector_spark.functions.text import (
    let,
    quality_score,
    shingles,
    shingles_from_words,
    stopword_count,
    token_count,
    words,
)


def test_let_binds_value_once_and_exactly(spark):
    df = spark.createDataFrame([("a b c",), (None,), ("",)], "t string")
    out = df.select(
        let(words("t"), lambda w: F.size(w)).alias("bound"),
        F.size(words("t")).alias("inline"),
    ).collect()
    for r in out:
        assert r.bound == r.inline


def test_shingles_let_equals_inline(docs):
    d = docs.limit(200)
    bound = d.select("doc_id", F.explode(shingles("text")).alias("s"))
    inline = d.select(
        "doc_id", F.explode(shingles_from_words(words("text"), 3)).alias("s")
    )
    assert sorted(map(tuple, bound.collect())) == sorted(map(tuple, inline.collect()))


def test_quality_score_let_equals_inline(docs):
    # the pre-r14 inline formulation, reconstructed expression-for-
    # expression (token_count referenced twice)
    t = F.col("text")
    n_tok = token_count(t).cast("double")
    n_chr = F.length(t).cast("bigint").cast("double")
    from sqlite_vector_spark.functions.text import punct_count

    punct_ratio = punct_count(t).cast("double") / n_chr
    stop_ratio = stopword_count(t).cast("double") / n_tok
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))
    stop_score = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    inline = F.when(n_chr == 0.0, F.lit(0.0)).otherwise(
        (len_score + punct_score + stop_score) / F.lit(3.0)
    )
    rows = docs.limit(200).select(
        quality_score(F.col("text")).alias("bound"), inline.alias("inline")
    ).collect()
    for r in rows:
        assert r.bound == r.inline  # bit-exact, same IEEE ops


def test_doc_bigrams_let_equals_inline(docs):
    from sqlite_vector_spark.functions.lm import doc_bigrams

    d = docs.limit(200)
    w = words(F.col("text"))
    pairs = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
    )
    inline = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.explode(pairs).alias("bg")
    ).select("doc_id", F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))
    bound = doc_bigrams(d)
    assert sorted(map(tuple, bound.collect())) == sorted(map(tuple, inline.collect()))
