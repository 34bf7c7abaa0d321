"""Vocab-exact BPE (functions/bpe.py): training determinism, the
greedy merge loop against a hand-computed fixture, and the Spark UDF
plumbing + the pre-token upper-bound invariant."""

import pyspark.sql.functions as F

from sqlite_vector_spark.functions.bpe import (
    bpe_token_count_udf,
    bpe_tokens_udf,
    encode_word,
    train_bpe,
)

# hand-computed fixture: corpus hug x3, pug x2, hugs x1
# pair freqs: (u,g)=6, (h,u)=4, (p,u)=2, (g,s)=1
# merges: (u,g) -> (h,ug) -> (p,ug) -> (hug,s)
CORPUS = ["hug hug hug pug pug hugs"]
MERGES = [("u", "g"), ("h", "ug"), ("p", "ug"), ("hug", "s")]


def test_train_matches_hand_computed_merges():
    assert train_bpe(CORPUS, 4) == MERGES


def test_train_is_deterministic_and_tie_breaks_lexicographically():
    # "ab" x1 + "cd" x1: freq tie between (a,b) and (c,d) -> (a,b) first
    assert train_bpe(["ab cd"], 2) == [("a", "b"), ("c", "d")]
    assert train_bpe(CORPUS, 4) == train_bpe(list(CORPUS), 4)


def test_encode_word_greedy_lowest_rank():
    ranks = {p: i for i, p in enumerate(MERGES)}
    assert encode_word("hugs", ranks) == ("hugs",)
    assert encode_word("hug", ranks) == ("hug",)
    assert encode_word("pugs", ranks) == ("pug", "s")  # (pug,s) unranked
    assert encode_word("bug", ranks) == ("b", "ug")
    assert encode_word("zzz", ranks) == ("z", "z", "z")


def test_udf_counts_and_tokens(spark):
    df = spark.createDataFrame(
        [(0, "hug pugs!"), (1, None), (2, "")], "id long, text string"
    )
    out = {
        r.id: (r.n, r.toks)
        for r in df.select(
            "id",
            bpe_token_count_udf(MERGES)(F.col("text")).alias("n"),
            bpe_tokens_udf(MERGES)(F.col("text")).alias("toks"),
        ).collect()
    }
    # "hug" -> [hug]; "pugs" -> [pug, s]; "!" -> [!]
    assert out[0] == (4, ["hug", "pug", "s", "!"])
    assert out[1] == (0, [])
    assert out[2] == (0, [])


def test_bpe_bounded_by_pretoken_count_on_real_docs(spark, docs):
    """Merges operate only within a pre-token, so the exact count is
    bounded both ways: n_pretokens <= bpe_tokens <= n_nonspace_chars
    (no merges = one token per char; full merges = one per pre-token).
    Pin both bounds on real docs, and that training actually
    compresses below the char count somewhere."""
    from sqlite_vector_spark.functions.text import subword_token_count

    sample = [r.text for r in docs.where(F.col("doc_id") < 50).orderBy("doc_id").collect()]
    merges = train_bpe(sample, num_merges=100)
    out = docs.limit(200).select(
        bpe_token_count_udf(merges)(F.col("text")).alias("bpe"),
        subword_token_count(F.col("text")).alias("pre"),
        F.length(F.regexp_replace(F.col("text"), " ", "")).alias("chars"),
    ).collect()
    assert all(r.pre <= r.bpe <= r.chars for r in out)
    # training must actually compress: strictly fewer than chars somewhere
    assert any(r.bpe < r.chars for r in out)


def test_workload_entry_runs(spark):
    from sqlite_vector_spark import workload as w

    out = w.bpe_token_counts_q(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    assert all(r.bpe_in_bounds for r in out)
    assert all(r.subword_tokens >= 0 for r in out)
