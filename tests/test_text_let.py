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


def test_band_keys_from_mins_equals_long_form(docs):
    """r14: the map-side band-key builder must reproduce
    lsh_band_keys(minhash_signatures(...)) exactly (same P-weighted
    sums over the same bigints)."""
    from sqlite_vector_spark.operators.dedup import (
        _band_keys_from_mins,
        _minhash_mins,
        lsh_band_keys,
        minhash_signatures,
    )

    d = docs.limit(300)
    wide = _band_keys_from_mins(_minhash_mins(d, "doc_id", "text"))
    long = lsh_band_keys(minhash_signatures(d, "doc_id", "text"))
    assert sorted(map(tuple, wide.collect())) == sorted(map(tuple, long.collect()))


def test_jaccard_pairs_array_form_equals_token_join_form(docs):
    """r14: array_intersect jaccard must equal the exploded
    distinct-token-join formulation it replaced."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.functions.text import words as _words
    from sqlite_vector_spark.operators.dedup import jaccard_pairs, lsh_candidate_pairs

    d = docs.limit(300)
    cand = lsh_candidate_pairs(d, "doc_id", "text").localCheckpoint(eager=True)
    new = jaccard_pairs(cand, d, "doc_id", "text")

    # pre-r14 formulation, reconstructed
    cand_ids = (
        cand.select(F.col("a").alias("id"))
        .unionByName(cand.select(F.col("b").alias("id")))
        .distinct()
    )
    cdocs = d.select(
        F.col("doc_id").cast("bigint").alias("id"), F.col("text").alias("_t")
    ).join(F.broadcast(cand_ids), "id", "left_semi")
    dw = cdocs.select("id", F.explode(_words("_t")).alias("w")).distinct()
    cnt = dw.groupBy("id").agg(F.count(F.lit(1)).alias("c"))
    x = dw.select(F.col("id").alias("a"), F.col("w").alias("wa"))
    y = dw.select(F.col("id").alias("b2"), F.col("w").alias("wb"))
    inter = (
        cand.join(x, "a")
        .join(y, (F.col("b") == F.col("b2")) & (F.col("wa") == F.col("wb")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = cnt.select(F.col("id").alias("a"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("id").alias("b"), F.col("c").alias("cb"))
    old = (
        cand.join(inter, ["a", "b"], "left")
        .join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            F.coalesce(F.col("inter"), F.lit(0)).alias("inter"),
            (F.col("ca") + F.col("cb") - F.coalesce(F.col("inter"), F.lit(0))).alias("union_"),
            (
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("ca") + F.col("cb") - F.coalesce(F.col("inter"), F.lit(0))).cast("double")
            ).alias("jaccard"),
        )
    )
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def test_simhash_hof_equals_explode_form(docs):
    """r14: the map-only HOF simhash must equal the exploded
    groupBy-sum formulation it replaced (integer sums commute)."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.functions.text import polyhash as _ph
    from sqlite_vector_spark.functions.text import words as _words
    from sqlite_vector_spark.operators.dedup import simhash

    bits = 32
    d = docs.limit(300)
    toks = d.select(
        F.col("doc_id").cast("bigint").alias("id"), F.explode(_words("text")).alias("w")
    ).select("id", _ph("w").alias("h"))
    sums = toks.groupBy("id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    fingerprint = sum(
        (
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            for b in range(bits)
        ),
        F.lit(0).cast("bigint"),
    )
    old = sums.select("id", fingerprint.cast("bigint").alias("simhash"))
    new = simhash(d, "doc_id", "text", bits)
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def test_simhash_is_map_only(docs):
    """r14 plan contract: simhash has no exchange — it folds per doc
    over the projected words array."""
    from sqlite_vector_spark.operators.dedup import simhash

    plan = simhash(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:800]
