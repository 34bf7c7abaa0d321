"""N-gram LM scoring (functions/lm.py): bigram extraction, smoothing
math, the quality-signal contract, and the bounded-vocab path. The
oracle gate (lm_doc_scores) pins the rational fixed-point mirror."""

import math

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.functions.lm import (
    doc_bigrams,
    score_documents,
    train_bigram_lm,
    with_perplexity,
)


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "the cat sat"),
        (3, "one"),
        (4, ""),
        (5, "zz qq xx vv"),  # out-of-distribution junk
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_bigrams_extraction(toy):
    got = {(r.doc_id, r.t1, r.t2) for r in doc_bigrams(toy).collect()}
    assert (0, "the", "cat") in got and (0, "cat", "sat") in got
    assert (2, "cat", "sat") in got
    # <2-token docs contribute nothing
    assert not any(d in (3, 4) for d, _, _ in got)
    assert len([x for x in got if x[0] == 0]) == 5


def test_smoothing_and_oov_floor(spark, toy):
    """An unseen bigram with an unseen left token scores exactly
    k / (k*V); a seen bigram scores (c12+k)/(c1+k*V)."""
    train = toy.where(F.col("doc_id") <= 2)
    uni, bi, v = train_bigram_lm(train)
    uc = {r.t: r.c1 for r in uni.collect()}
    bc = {(r.t1, r.t2): r.c12 for r in bi.collect()}
    assert uc["the"] == 5 and bc[("the", "cat")] == 2

    scored = {r.doc_id: r for r in score_documents(toy, uni, bi, v).collect()}
    # doc 5: 3 bigrams, every token unseen -> each term = 1 / V
    floor = round(1e6 * (1.0 / v)) / 1e6
    assert scored[5].n_bigrams == 3
    assert scored[5].psum == pytest.approx(3 * floor, abs=2e-6)
    # degenerate docs score (0, 0.0)
    assert scored[3].n_bigrams == 0 and scored[3].psum == 0.0
    assert scored[4].n_bigrams == 0 and scored[4].psum == 0.0


def test_lm_separates_fluent_from_junk(spark, toy):
    """The whole point: in-distribution text must score higher mean
    probability (lower perplexity) than out-of-distribution junk."""
    train = toy.where(F.col("doc_id") <= 1)
    uni, bi, v = train_bigram_lm(train)
    scored = {r.doc_id: r for r in score_documents(toy, uni, bi, v).collect()}
    mean_p = lambda r: r.psum / r.n_bigrams
    # tiny toy vocab (V=7) puts the smoothing floor at 1/7, so the
    # separation is modest here; the ordering is the contract
    assert mean_p(scored[2]) > 1.4 * mean_p(scored[5])

    ppl = {r.doc_id: r.perplexity for r in with_perplexity(toy.where(F.col("doc_id").isin(2, 5)), uni, bi, v).collect()}
    assert ppl[2] < ppl[5]
    assert all(p > 0 and math.isfinite(p) for p in ppl.values())


def test_vocab_limit_bounds_model(spark, toy):
    uni, bi, v = train_bigram_lm(toy.where(F.col("doc_id") <= 2), vocab_limit=3)
    assert v == 3 and uni.count() == 3
    # top tokens by count desc, token asc — 'the' (5) must survive
    assert "the" in {r.t for r in uni.collect()}
    # scoring still works against the bounded model
    scored = score_documents(toy, uni, bi, v).collect()
    assert len(scored) == toy.count()


def test_scores_match_documents_table(spark, docs):
    """End-to-end over the real documents table: every scored doc
    appears once, counts are consistent, psum bounded by n (each term
    is a probability <= 1 after smoothing... up to fixed-point)."""
    train = docs.where(F.col("doc_id") % 2 == 0)
    uni, bi, v = train_bigram_lm(train)
    scored = score_documents(docs.where(F.col("doc_id") % 2 != 0), uni, bi, v).collect()
    ids = [r.doc_id for r in scored]
    assert len(ids) == len(set(ids))
    for r in scored:
        assert r.psum <= r.n_bigrams + 1e-6
        assert (r.n_bigrams == 0) == (r.psum == 0.0)
