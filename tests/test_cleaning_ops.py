"""Round-6 corpus cleaning / labeling / feature operators:
boilerplate strip, Gopher quality rules, kNN label propagation,
embedding outliers, rolling user features — semantics on hand
fixtures small enough to verify by eye."""

import math

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.operators.dedup import boilerplate_strip
from sqlite_vector_spark.operators.knn_join import knn_label_propagation
from sqlite_vector_spark.workload import embedding_outliers, rolling_user_features

BOILER = "this is the shared header used by sites"  # exactly 8 words
TAIL_A = "alpha words fill out the first document body"
TAIL_B = "beta words fill out the second document body"
TAIL_C = "gamma words fill out the third document body"
UNIQ = "totally unique text that matches nothing else here"
MID_A = "prefix chunk one sits before the shared block"
MID_B = "suffix chunk two sits after the shared block"


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [
        (1, f"{BOILER} {TAIL_A}"),
        (2, f"{BOILER} {TAIL_B}"),
        (3, f"{BOILER} {TAIL_C}"),
        (4, UNIQ),
        (5, f"{MID_A} {BOILER} {MID_B}"),  # boiler mid-doc, at chunk boundary
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_stripped_everywhere(boiler_docs):
    out = {r.doc_id: r for r in boilerplate_strip(boiler_docs, size=8, min_df=3).collect()}
    for d, tail in [(1, TAIL_A), (2, TAIL_B), (3, TAIL_C)]:
        assert out[d].n_chunks == 2 and out[d].n_removed == 1
        assert out[d].clean_text == tail
    # unique doc untouched
    assert out[4].n_removed == 0 and out[4].clean_text == UNIQ
    # mid-doc boilerplate removed, surrounding order preserved
    assert out[5].n_chunks == 3 and out[5].n_removed == 1
    assert out[5].clean_text == f"{MID_A} {MID_B}"
    # empty doc: zero chunks, empty clean text
    assert out[6].n_chunks == 0 and out[6].clean_text == "" and out[6].clean_len == 0


def test_boilerplate_df_threshold(boiler_docs):
    # min_df above the boiler's document frequency (4 docs) -> nothing stripped
    out = boilerplate_strip(boiler_docs, size=8, min_df=5).collect()
    assert all(r.n_removed == 0 for r in out)


# ---------------------------------------------------------------- Gopher quality rules


def test_gopher_quality_rules(spark, tmp_path):
    from sqlite_vector_spark import workload as w

    good = "the quick brown fox jumps over a lazy dog and then runs far away to find more food " * 2
    rows = [
        (1, good.strip()),                                # passes all rules
        (2, "the a of short text and to"),                # too few words
        (3, ("extraordinarily complicated vocabularies " * 12 + "the a of and to").strip()),  # mean word len too high
        (4, ("word " * 35).strip()),                      # no stopwords, ttr floor
        (5, ("the a " + "spark " * 40).strip()),          # repetition: low type-token ratio
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumns(
        {"lang": F.lit("en"), "source": F.lit("t"), "n_chars": F.length("text")}
    )
    sf = str(tmp_path / "gopher")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in w.gopher_quality_q(spark, sf).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].n_words < w.GOPHER_MIN_WORDS
    assert not out[3].keep and out[3].mean_word_len > w.GOPHER_MWL_HI
    assert not out[4].keep and out[4].stop_hits == 0
    assert not out[5].keep and out[5].type_token_ratio <= w.GOPHER_MIN_TTR
    # metric arithmetic spot-check on doc 2: 7 words, 5 stopword hits
    assert out[2].n_words == 7 and out[2].stop_hits == 5


# ---------------------------------------------------------------- kNN label propagation


def test_knn_label_propagation_majority_and_tie(spark):
    corpus = spark.createDataFrame(
        [
            (10, [0.0, 0.0], 1), (11, [0.1, 0.0], 1), (12, [0.0, 0.1], 1),
            (13, [0.2, 0.2], 0), (14, [5.0, 5.0], 0),
            (20, [10.0, 10.0], 7), (21, [10.1, 10.0], 2), (22, [10.0, 10.1], 2),
            (23, [10.1, 10.1], 7), (24, [50.0, 50.0], 9),
        ],
        "id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(1, [0.05, 0.05]), (2, [10.05, 10.05])], "qid long, qvec array<float>"
    )
    # q1, k=4: neighbors 10,11,12 (label 1) + 13 (label 0) -> majority 1
    got = {r.qid: r for r in knn_label_propagation(queries, corpus, 4, corpus_id="id").collect()}
    assert got[1].pred_label == 1 and got[1].votes == 3
    # q2, k=4: labels {7,2,2,7} tie 2-2 -> smaller label wins
    assert got[2].pred_label == 2 and got[2].votes == 2


# ---------------------------------------------------------------- embedding outliers


def test_embedding_outliers_flags_planted_points(spark):
    cloud = [
        (1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 1.0]), (4, [0.0, -1.0]),
        (5, [0.5, 0.5]), (6, [-0.5, -0.5]),
    ]
    planted = [(7, [30.0, 0.0]), (8, [0.0, -30.0])]
    emb = spark.createDataFrame(cloud + planted, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in embedding_outliers(emb, 2).collect()}
    assert out[7].is_outlier and out[8].is_outlier
    assert not any(out[i].is_outlier for i in range(1, 7))
    # centroid = mean of ALL rows = (3.75, -3.75); planted points dominate
    cx, cy = 3.75, -3.75
    assert math.isclose(out[7].dist, math.hypot(30.0 - cx, 0.0 - cy), rel_tol=1e-12)
    assert math.isclose(out[5].dist, math.hypot(0.5 - cx, 0.5 - cy), rel_tol=1e-12)


# ---------------------------------------------------------------- rolling user features


def test_rolling_user_features_range_frame(spark):
    day = 86_400 * 1_000_000
    ev = spark.createDataFrame(
        [
            (1, 100, 0 * day, 1.0),
            (2, 100, 3 * day, 2.0),
            (3, 100, 8 * day, 4.0),   # 7d frame: [1d, 8d] -> events at 3d, 8d
            (4, 100, 20 * day, 8.0),  # alone in its frame
            (5, 200, 8 * day, 16.0),  # other user unaffected
        ],
        "event_id long, user_id long, ts_us long, value double",
    )
    out = {r.event_id: r for r in rolling_user_features(ev, 7 * day).collect()}
    assert (out[1].n_7d, out[1].sum_value_7d) == (1, 1.0)
    assert (out[2].n_7d, out[2].sum_value_7d) == (2, 3.0)
    assert (out[3].n_7d, out[3].sum_value_7d) == (2, 6.0)
    assert (out[4].n_7d, out[4].sum_value_7d) == (1, 8.0)
    assert (out[5].n_7d, out[5].sum_value_7d) == (1, 16.0)


def test_rolling_frame_is_inclusive_of_boundary(spark):
    # an event exactly win_us older IS inside the frame (rangeBetween is closed)
    ev = spark.createDataFrame(
        [(1, 1, 0, 1.0), (2, 1, 100, 2.0)],
        "event_id long, user_id long, ts_us long, value double",
    )
    out = {r.event_id: r for r in rolling_user_features(ev, 100).collect()}
    assert out[2].n_7d == 2 and out[2].sum_value_7d == 3.0


# ---------------------------------------------------------------- time-decayed user scores


def test_user_decay_exact_weights(spark, tmp_path):
    from datetime import datetime

    from sqlite_vector_spark import workload as w

    base = datetime(2024, 3, 31, 12, 0, 0)  # becomes tmax
    day = 86_400
    rows = [
        (1, base, 100, "click", 10.0, "{}"),
        (2, datetime.fromtimestamp(base.timestamp() - day), 100, "click", 10.0, "{}"),
        (3, datetime.fromtimestamp(base.timestamp() - 2 * day), 100, "click", 40.0, "{}"),
        (4, datetime.fromtimestamp(base.timestamp() - 100 * day), 100, "click", 10.0, "{}"),  # capped
        (5, base, 200, "view", 8.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "decay")
    ev.write.parquet(f"{sf}/events.parquet")
    out = {r.user_id: r for r in w.user_decay_q(spark, sf).collect()}
    # user 100: 10*1 + 10*0.5 + 40*0.25 + 10*2^-30 (age capped at 30d)
    expect = 10.0 + 5.0 + 10.0 + 10.0 * 2.0**-30
    assert out[100].n_events == 4
    assert math.isclose(out[100].decay_score, expect, rel_tol=1e-12)
    assert out[200].n_events == 1 and out[200].decay_score == 8.0


# ---------------------------------------------------------------- MMR diversified retrieval


def test_mmr_reduces_to_topk_at_lambda_one(spark):
    from sqlite_vector_spark.operators.retrieval import mmr_select

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(1, 8)], "vec_id long, embedding array<float>"
    )
    out = mmr_select(emb, [0.0, 0.0], c=7, k=3, lam=1.0).collect()
    assert [(r.mmr_rank, r.id) for r in out] == [(1, 1), (2, 2), (3, 3)]


def test_mmr_diversifies_across_clusters(spark):
    from sqlite_vector_spark.operators.retrieval import mmr_select

    emb = spark.createDataFrame(
        [
            (1, [0.10, 0.0]),  # cluster A, most relevant
            (2, [0.11, 0.0]),  # cluster A, redundant with 1
            (3, [0.0, 1.0]),   # cluster B, less relevant but diverse
        ],
        "vec_id long, embedding array<float>",
    )
    pure = [r.id for r in mmr_select(emb, [0.0, 0.0], c=3, k=2, lam=1.0).collect()]
    assert pure == [1, 2]  # relevance-only keeps the redundant pair
    div = [r.id for r in mmr_select(emb, [0.0, 0.0], c=3, k=2, lam=0.5).collect()]
    assert div == [1, 3]  # diversification swaps in cluster B


def test_mmr_k_exceeding_pool_returns_pool(spark):
    from sqlite_vector_spark.operators.retrieval import mmr_select

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = mmr_select(emb, [0.0, 0.0], c=5, k=10, lam=0.7).collect()
    assert len(out) == 2


def test_majority_vote_composes_with_any_neighbor_source(spark):
    """The 100 TB route: an ANN (qid, id) result feeds the same vote
    step — here a hand neighbor table stands in for ivf_knn_join."""
    from sqlite_vector_spark.operators.knn_join import majority_vote

    corpus = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 9), (4, 9), (5, 9)], "id long, label int"
    )
    nn = spark.createDataFrame(
        [(100, 1), (100, 2), (100, 3), (200, 3), (200, 4), (200, 5)],
        "qid long, id long",
    )
    got = {r.qid: r for r in majority_vote(nn, corpus).collect()}
    assert got[100].pred_label == 5 and got[100].votes == 2
    assert got[200].pred_label == 9 and got[200].votes == 3


def test_label_propagation_via_ivf_join_matches_exact(spark):
    """End-to-end ANN propagation: ivf_knn_join neighbors + majority
    vote equals the exact path when probes cover the true clusters."""
    from sqlite_vector_spark.operators.ann import ivf_knn_join
    from sqlite_vector_spark.operators.knn_join import knn_label_propagation, majority_vote

    pts = [(i, [0.0 + i * 0.01, 0.0], 3) for i in range(1, 6)] + [
        (i, [10.0 + i * 0.01, 0.0], 8) for i in range(6, 11)
    ]
    corpus = spark.createDataFrame(pts, "id long, embedding array<float>, label int")
    queries = spark.createDataFrame(
        [(1, [0.02, 0.0]), (2, [10.07, 0.0])], "qid long, qv array<float>"
    )
    cents = [[0.0, 0.0], [10.0, 0.0]]
    nn = ivf_knn_join(queries, corpus, cents, k=3, nprobe=1, id_col="id", vec_col="embedding")
    via_ivf = {r.qid: r.pred_label for r in majority_vote(nn, corpus).collect()}
    exact = {
        r.qid: r.pred_label
        for r in knn_label_propagation(
            queries.withColumnRenamed("qv", "qvec"), corpus, 3, corpus_id="id"
        ).collect()
    }
    assert via_ivf == exact == {1: 3, 2: 8}


# ---------------------------------------------------------------- source overlap matrix


def test_source_overlap_counts_shared_shingles(spark, tmp_path):
    from sqlite_vector_spark import workload as w

    shared = "alpha beta gamma delta"  # shingles: {alpha beta gamma, beta gamma delta}
    rows = [
        (1, f"{shared} one two three", "s1", "en"),
        (2, f"{shared} four five six", "s2", "en"),
        (3, "seven eight nine ten eleven", "s3", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string").withColumn(
        "n_chars", F.length("text")
    )
    sf = str(tmp_path / "overlap")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {(r.sa, r.sb): r for r in w.source_overlap_q(spark, sf).collect()}
    # only the s1/s2 pair shares shingles: the two inside `shared`
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    assert r.n_shared == 2 and r.na == 5 and r.nb == 5
    assert math.isclose(r.jaccard, 2.0 / 8.0, rel_tol=1e-12)


# ---------------------------------------------------------------- corpus data card


def test_corpus_report_dup_and_keep_rates(spark, tmp_path):
    from sqlite_vector_spark import workload as w

    good = ("the quick brown fox jumps over a lazy dog and then runs far away to find more food " * 2).strip()
    rows = [
        (1, good, "src_a", "en"),
        (2, good, "src_a", "de"),           # exact dup of doc 1
        (3, "tiny the a doc", "src_a", "en"),  # fails word-count rule
        (4, good, "src_b", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string").withColumn(
        "n_chars", F.length("text")
    )
    sf = str(tmp_path / "report")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r.source: r for r in w.corpus_report_q(spark, sf).collect()}
    a = out["src_a"]
    assert a.n_docs == 3 and a.n_langs == 2
    assert math.isclose(a.dup_ratio, 1.0 / 3.0, rel_tol=1e-12)  # 3 docs, 2 unique
    assert math.isclose(a.keep_rate, 2.0 / 3.0, rel_tol=1e-12)
    b = out["src_b"]
    assert b.n_docs == 1 and b.dup_ratio == 0.0 and b.keep_rate == 1.0
    assert a.n_tokens == 36 + 36 + 4


# ---------------------------------------------------------------- sequence packing


def test_pack_sequences_contiguous_per_shard(spark, tmp_path):
    from sqlite_vector_spark import workload as w

    rows = [(i, " ".join(f"tok{i}w{j}" for j in range(5 + i)), "s", "en") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string").withColumn(
        "n_chars", F.length("text")
    )
    sf = str(tmp_path / "pack")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = w.pack_sequences_q(spark, sf).collect()
    assert len(out) == 12
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.offset)
        # head-to-tail layout: each doc starts where the previous ended
        assert rs[0].offset == 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur.offset == prev.offset + prev.toks
        for r in rs:
            assert r.bin == r.offset // w.PACK_SEQ_LEN
    # reproducible from content alone
    again = w.pack_sequences_q(spark, sf).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------- negative sampling


def test_negative_samples_deterministic_ring(spark, tmp_path):
    from sqlite_vector_spark import workload as w

    rows = [(i, [float(i), 0.0], i % 3) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf = str(tmp_path / "neg")
    emb.write.parquet(f"{sf}/embeddings.parquet")
    out = w.negative_samples_q(spark, sf).collect()
    # 10 anchors (all ids < NEG_ANCHORS) x NEG_K draws, every join hit
    assert len(out) == 10 * w.NEG_K
    for r in out:
        assert r.neg_id != r.anchor          # self-collision bumped
        assert 0 <= r.neg_id < 10
        assert r.neg_label == r.neg_id % 3   # payload joined correctly
    # draw depends only on (anchor, j, n): bit-stable across runs
    again = w.negative_samples_q(spark, sf).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------- edit-distance fuzzy verify


def test_edit_distance_pairs_on_candidates(spark):
    from sqlite_vector_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # 3-char edit
            (3, "the quick brown fox jumps over the lazy dog"),  # identical to 1
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    out = {(r.a, r.b): r for r in edit_distance_pairs(cand, docs).collect()}
    assert out[(1, 3)].lev == 0 and out[(1, 3)].sim == 1.0
    r = out[(1, 2)]
    assert r.lev == 3 and r.max_len == 43
    assert math.isclose(r.sim, 1.0 - 3.0 / 43.0, rel_tol=1e-12)


def test_edit_distance_empty_texts(spark):
    from sqlite_vector_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame([(1, ""), (2, "")], "doc_id long, text string")
    cand = spark.createDataFrame([(1, 2)], "a long, b long")
    r = edit_distance_pairs(cand, docs).collect()[0]
    assert r.lev == 0 and r.max_len == 0 and r.sim == 1.0


# ---------------------------------------------------------------- streaming-form equivalence + randomized invariants


def test_strip_chunks_col_equals_full_operator(spark, boiler_docs):
    """The map-only strip (collected hash set, streaming form) must
    reproduce boilerplate_strip's clean_text exactly."""
    from sqlite_vector_spark.operators.dedup import boilerplate_hashes, strip_chunks_col

    hashes = [r.h for r in boilerplate_hashes(boiler_docs, min_df=3).collect()]
    mapped = {
        r.doc_id: r.ct
        for r in boiler_docs.select(
            "doc_id", strip_chunks_col("text", hashes).alias("ct")
        ).collect()
    }
    full = {r.doc_id: r.clean_text for r in boilerplate_strip(boiler_docs, size=8, min_df=3).collect()}
    assert mapped == full


def test_boilerplate_randomized_invariants(spark):
    """Seeded random corpus: counts reconcile and reconstruction only
    ever deletes whole chunks (clean tokens are a subsequence)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_strip(docs, size=4, min_df=2).collect()
    texts = dict(rows)

    def is_subsequence(sub, full):
        it = iter(full)
        return all(any(tok == x for x in it) for tok in sub)

    for r in out:
        assert r.n_kept + r.n_removed == r.n_chunks
        assert r.clean_len == len(r.clean_text)
        orig = [t for t in texts[r.doc_id].split(" ") if t]
        clean = [t for t in r.clean_text.split(" ") if t]
        assert is_subsequence(clean, orig)
        if r.n_removed == 0:
            assert r.clean_text == " ".join(orig)


# ---------------------------------------------------------------- z-score + sketch audit


def test_value_zscore_moments(spark, tmp_path):
    from datetime import datetime

    from sqlite_vector_spark import workload as w

    t0 = datetime(2024, 1, 1)
    rows = [(i, t0, 1, "click", v, "{}") for i, v in enumerate([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0])]
    rows.append((99, t0, 1, "view", 3.0, "{}"))  # single-row group: var 0 -> z 0
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "z")
    ev.write.parquet(f"{sf}/events.parquet")
    out = {r.event_id: r for r in w.value_zscore_q(spark, sf).collect()}
    # classic fixture: mean 5, stddev 2
    assert math.isclose(out[0].z, (2.0 - 5.0) / 2.0, rel_tol=1e-9)
    assert math.isclose(out[7].z, (9.0 - 5.0) / 2.0, rel_tol=1e-9)
    assert out[99].z == 0.0


def test_source_overlap_sketch_contract(spark, tmp_path):
    from sqlite_vector_spark import workload as w

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{shared} one two three four", "s1", "en"),
        (2, f"{shared} five six seven eight", "s2", "en"),
        (3, "nine ten eleven twelve thirteen", "s3", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string").withColumn(
        "n_chars", F.length("text")
    )
    sf = str(tmp_path / "sk")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {(r.sa, r.sb): r for r in w.source_overlap_sketch_q(spark, sf).collect()}
    assert len(out) == 3  # full pair matrix, shared or not
    assert all(r.within_bound for r in out.values())
    # the s1/s2 pair shares the 4 shingles inside `shared`
    assert out[("s1", "s2")].n_shared == 4
    assert out[("s1", "s3")].n_shared == 0


# ---------------------------------------------------------------- incremental stats store


def test_stats_store_append_equals_rebuild(spark, tmp_path):
    from sqlite_vector_spark.operators.stats_store import stats_append, stats_report, stats_store

    good = ("the quick brown fox jumps over a lazy dog and then runs far away to find more food " * 2).strip()
    batch_a = spark.createDataFrame(
        [(1, good, "web", "en"), (2, good, "web", "de"), (3, "tiny the a doc", "web", "en")],
        "doc_id long, text string, source string, lang string",
    )
    batch_b = spark.createDataFrame(
        [(4, good, "web", "fr"), (5, good + " extra", "books", "en")],
        "doc_id long, text string, source string, lang string",
    )
    inc = str(tmp_path / "inc")
    stats_store(batch_a, inc)
    stats_append(batch_b, inc)
    got = {r.source: r for r in stats_report(spark, inc).collect()}

    full = str(tmp_path / "full")
    stats_store(batch_a.unionByName(batch_b), full)
    want = {r.source: r for r in stats_report(spark, full).collect()}

    assert set(got) == set(want) == {"web", "books"}
    for src in got:
        g, x = got[src], want[src]
        # additive columns and the bounded language set merge EXACTLY
        assert (g.n_docs, g.n_tokens, g.n_langs, g.keep_rate) == (x.n_docs, x.n_tokens, x.n_langs, x.keep_rate)
        assert math.isclose(g.mean_chars, x.mean_chars, rel_tol=1e-12)
        # sketch union is register-max: append must equal rebuild too
        assert math.isclose(g.dup_ratio_est, x.dup_ratio_est, rel_tol=1e-9)
    # web: docs 1,2,4 share a fingerprint -> 2 unique of 4 (HLL exact at this cardinality)
    assert got["web"].n_docs == 4 and math.isclose(got["web"].dup_ratio_est, 0.5, rel_tol=0.05)
    assert got["web"].n_langs == 3


# ---------------------------------------------------------------- batched BM25


def test_bm25_batch_matches_single_query(spark):
    """Each query's top-k from the batched one-pass form must equal
    the single-query bm25_topk run in isolation — the df/idf stats
    are corpus-global, so batching cannot perturb them."""
    from sqlite_vector_spark.operators.retrieval import bm25_batch_topk, bm25_topk

    rows = [
        (1, "spark window stream window window fast"),
        (2, "stream stream fast table"),
        (3, "table scan sort table scan"),
        (4, "window table spark fast stream sort"),
        (5, "completely unrelated words only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [(10, ("window", "stream")), (11, ("table", "scan"))]
    batch = bm25_batch_topk(docs, queries, k=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r.qid, []).append((r.rank, r.id, r.score))
    for qid, terms in queries:
        single = [
            (i + 1, r.id, r.score)
            for i, r in enumerate(bm25_topk(docs, terms, 3).collect())
        ]
        assert sorted(got[qid]) == single, qid


def test_bm25_batch_rejects_empty(spark):
    from sqlite_vector_spark.operators.retrieval import bm25_batch_topk

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError):
        bm25_batch_topk(docs, [], 3)
    # a query with no terms must fail loudly, naming the qid
    with _pt.raises(ValueError, match="qid=42"):
        bm25_batch_topk(docs, [(41, ("x",)), (42, ())], 3)


def test_stats_store_failed_append_preserves_snapshot(spark, tmp_path):
    """Durability contract: a failed append must leave the previous
    committed snapshot resolvable and intact — writers publish NEW
    versioned dirs and never touch the live one."""
    import pytest as _pt

    from sqlite_vector_spark.operators.stats_store import stats_append, stats_report, stats_store

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again", "web", "en")],
        "doc_id long, text string, source string, lang string",
    )
    store = str(tmp_path / "store")
    stats_store(docs, store)
    before = [tuple(r) for r in stats_report(spark, store).collect()]

    # a batch whose evaluation fails mid-write (missing text column)
    bad = spark.createDataFrame([(2, "web", "en")], "doc_id long, source string, lang string")
    with _pt.raises(Exception):
        stats_append(bad, store)

    # the pre-append snapshot still serves
    assert [tuple(r) for r in stats_report(spark, store).collect()] == before
    # and a subsequent good append still works
    stats_append(docs, store)
    assert stats_report(spark, store).collect()[0].n_docs == 2


def test_stats_store_retains_grace_snapshot(spark, tmp_path):
    """Prune retention: the immediately superseded snapshot survives
    one publish cycle (an in-flight reader of the prior version must
    finish cleanly); older versions are pruned."""
    import os

    from sqlite_vector_spark.operators.stats_store import stats_append, stats_store

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again", "web", "en")],
        "doc_id long, text string, source string, lang string",
    )
    store = str(tmp_path / "store")
    stats_store(docs, store)                      # v0
    stats_append(docs, store)                     # v1 published, v0 retained
    assert sorted(os.listdir(store)) == ["v000000", "v000001"]
    stats_append(docs, store)                     # v2 published, v0 pruned
    assert sorted(os.listdir(store)) == ["v000001", "v000002"]


# ---------------------------------------------------------------- resample + pivot


def test_events_resample_gap_filling(spark, tmp_path):
    from datetime import datetime

    from sqlite_vector_spark import workload as w

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 1, "click", 2.0, "{}"),
        (2, datetime(2024, 1, 1, 3, 10), 1, "click", 4.0, "{}"),  # hours 1,2 are gaps
        (3, datetime(2024, 1, 1, 1, 5), 2, "view", 8.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "rs")
    ev.write.parquet(f"{sf}/events.parquet")
    out = w.events_resample_q(spark, sf).collect()
    # full grid: 2 types x 4 hours (span 00:00-03:00)
    assert len(out) == 8
    by = {(r.event_type, r.hour_epoch): r for r in out}
    h0 = datetime(2024, 1, 1).timestamp()
    assert by[("click", int(h0))].n_events == 1
    assert by[("click", int(h0) + 3600)].n_events == 0  # gap zero-filled
    assert by[("click", int(h0) + 3 * 3600)].sum_value == 4.0
    assert by[("view", int(h0) + 3600)].n_events == 1
    assert by[("view", int(h0))].n_events == 0


def test_user_type_pivot_counts(spark, tmp_path):
    from datetime import datetime

    from sqlite_vector_spark import workload as w

    t = datetime(2024, 1, 1)
    rows = [
        (1, t, 7, "click", 1.0, "{}"),
        (2, t, 7, "click", 1.0, "{}"),
        (3, t, 7, "purchase", 1.0, "{}"),
        (4, t, 8, "error", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "pv")
    ev.write.parquet(f"{sf}/events.parquet")
    out = {r.user_id: r for r in w.user_type_pivot_q(spark, sf).collect()}
    assert (out[7].n_click, out[7].n_purchase, out[7].n_view, out[7].n_total) == (2, 1, 0, 3)
    assert (out[8].n_error, out[8].n_total) == (1, 1)


# ---------------------------------------------------------------- incidents + interval overlap


def test_error_incidents_islands(spark, tmp_path):
    from datetime import datetime

    from sqlite_vector_spark import workload as w

    def ev(i, hour, kind):
        return (i, datetime(2024, 1, 1, hour), 1, kind, 1.0, "{}")

    rows = [ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 1, "error"),  # island hours 0-1
            ev(4, 5, "error"),                                        # island hour 5
            ev(5, 3, "click")]                                        # non-error ignored
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "inc")
    df.write.parquet(f"{sf}/events.parquet")
    spans = [(r.end_h - r.start_h + 1, r.n_hours) for r in w.error_incidents_q(spark, sf).collect()]
    assert spans == [(2, 2), (1, 1)]


def test_session_incident_overlap_exact_once(spark, tmp_path):
    from datetime import datetime

    from sqlite_vector_spark import workload as w

    rows = [
        # user 1: one long session spanning hours 0-3 (events 30min apart
        # stay inside the 8h gap); overlaps BOTH incident islands below
        (1, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 3, 50), 1, "click", 1.0, "{}"),
        # user 2: session entirely inside hour 9 -> overlaps nothing
        (3, datetime(2024, 1, 1, 9, 5), 2, "view", 1.0, "{}"),
        # error events defining incidents: hours 1-2 (one island), hour 6
        (4, datetime(2024, 1, 1, 1, 30), 99, "error", 1.0, "{}"),
        (5, datetime(2024, 1, 1, 2, 15), 99, "error", 1.0, "{}"),
        (6, datetime(2024, 1, 1, 6, 45), 99, "error", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "ov")
    df.write.parquet(f"{sf}/events.parquet")
    out = w.session_incident_overlap_q(spark, sf).collect()
    pairs = [(r.user_id, r.session_seq, r.incident_epoch) for r in out]
    h = lambda n: int(datetime(2024, 1, 1, n).timestamp())
    # the multi-hour session matches the 2-hour island EXACTLY ONCE
    assert pairs.count((1, 1, h(1))) == 1
    # user 99's own error session also overlaps the incidents
    assert (1, 1, h(6)) not in pairs  # session 0:10-3:50 misses hour-6 island
    assert all(r.user_id != 2 for r in out)
    # overlap length: session [0:10, 3:50] x incident [1:00, 3:00) -> 2h exactly
    r = next(r for r in out if (r.user_id, r.incident_epoch) == (1, h(1)))
    assert r.overlap_us == 2 * 3600 * 1_000_000


def test_boilerplate_shuffled_anti_join_same_result(spark, boiler_docs):
    """boiler_broadcast=False (the web-scale huge-set mode) must be a
    pure plan change: identical rows out."""
    a = sorted(map(tuple, boilerplate_strip(boiler_docs, size=8, min_df=3).collect()))
    b = sorted(
        map(
            tuple,
            boilerplate_strip(boiler_docs, size=8, min_df=3, boiler_broadcast=False).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------- argument validation


def test_new_operator_arg_validation(spark):
    from sqlite_vector_spark.operators.retrieval import mmr_select
    from sqlite_vector_spark.workload import rolling_user_features

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    emb = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<float>")
    ev = spark.createDataFrame([(1, 1, 0, 1.0)], "event_id long, user_id long, ts_us long, value double")
    with pytest.raises(ValueError, match="min_df"):
        boilerplate_strip(docs, min_df=1)
    with pytest.raises(ValueError, match="chunk size"):
        boilerplate_strip(docs, size=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_select(emb, [0.0, 0.0], c=5, k=2, lam=1.5)
    with pytest.raises(ValueError, match="k >= 1"):
        mmr_select(emb, [0.0, 0.0], c=2, k=0)
    with pytest.raises(ValueError, match="positive"):
        rolling_user_features(ev, 0)


def test_trailing_agg_matches_bruteforce_on_random_data(spark):
    """Seeded random events (duplicate timestamps included) against an
    O(n^2) Python reference of the trailing-window contract."""
    import random

    from sqlite_vector_spark.operators.features import trailing_agg

    rng = random.Random(23)
    rows = []
    for eid in range(120):
        # signed values: negative fx at a TIED timestamp makes the
        # cumulative non-monotone, which the peer-group lift must
        # survive (last-in-id-order, not max — a real regression)
        rows.append((eid, rng.randint(1, 4), rng.randint(0, 500), float(rng.randint(-9, 9))))
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long, value double")
    win = 100
    got = {
        r.id: (r.n_win, r.sum_win)
        for r in trailing_agg(ev, "user_id", "ts_us", "value", win, id_col="event_id").collect()
    }
    for eid, key, ts, _v in rows:
        inside = [(e, v) for e, k, t, v in rows if k == key and ts - win <= t <= ts]
        n = len(inside)
        s = sum(v for _, v in inside)
        assert got[eid] == (n, s), (eid, got[eid], (n, s))


def test_trailing_agg_tied_timestamps_count_peers(spark):
    """RANGE-contract ties: events sharing (key, ts) must count each
    other — the case the cumulative formulation initially missed."""
    from sqlite_vector_spark.operators.features import trailing_agg

    ev = spark.createDataFrame(
        [(1, 9, 100, 2.0), (2, 9, 100, 3.0), (3, 9, 100, -5.0), (4, 9, 250, 1.0)],
        "event_id long, user_id long, ts_us long, value double",
    )
    got = {r.id: (r.n_win, r.sum_win) for r in trailing_agg(ev, "user_id", "ts_us", "value", 100, id_col="event_id").collect()}
    # the LAST tied peer is negative: max-over-peers would drop it
    assert got[1] == got[2] == got[3] == (3, 0.0)
    assert got[4] == (1, 1.0)  # 250 - 100 = 150 > win: tied trio expired


def test_snapshot_drift_semantics(spark):
    """TVD contract: identical snapshots -> 0; disjoint length
    distributions -> 1; a one-sided source -> max drift 1.0; value
    equals the hand-computed TVD for a known split."""
    from sqlite_vector_spark.operators.stats_store import snapshot_drift

    short = "a b c"                      # 3 tokens  -> bucket 0
    long = " ".join(["w"] * 50)          # 50 tokens -> bucket 2 (edges 20, 40)
    rows = [
        # source "same": identical distributions in both snapshots
        (0, short, "same"), (1, short, "same"), (2, long, "same"), (3, long, "same"),
        # source "flip": old all short, new all long
        (10, short, "flip"), (12, short, "flip"), (11, long, "flip"), (13, long, "flip"),
        # source "only_old": present in the even (old) snapshot only
        (20, short, "only_old"),
        # source "half": old 2 short, new 1 short 1 long -> TVD 0.5
        (30, short, "half"), (32, short, "half"), (31, short, "half"), (33, long, "half"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.source: r
        for r in snapshot_drift(
            docs.where(F.col("doc_id") % 2 == 0),
            docs.where(F.col("doc_id") % 2 == 1),
            edges=(20, 40),
        ).collect()
    }
    assert out["same"].tvd == 0.0
    assert out["flip"].tvd == 1.0
    assert out["only_old"].tvd == 1.0 and out["only_old"].n_new == 0
    assert out["half"].tvd == 0.5


def test_token_cooccurrence_matches_python_recomputation(spark):
    """Independent end-to-end oracle for the market-basket query:
    recompute the whole thing — df band, pair counts, pair floor,
    lift, top-k tie order — in plain Python over the SAME tokenization
    and compare exactly. (Written while adjudicating the r15 int-keyed
    pair-join rewrite, which was REJECTED by measurement: shuffle
    compression already collapses the short repeated token strings, so
    the narrow keys saved nothing at 1M docs and cost an extra job;
    see OPTIMIZATION_r15.md. The test outlives the rejection — it pins
    the string-keyed form against a reference that shares none of its
    join/window machinery.)"""
    from collections import Counter
    from itertools import combinations

    from sqlite_vector_spark import workload as w
    from sqlite_vector_spark.functions.text import normalize_text, words
    from sqlite_vector_spark.sources import table

    sf = "/root/testdata/sf0.001"
    got = [
        (r.t1, r.t2, r.n_xy, r.df1, r.df2, r.lift)
        for r in w.token_cooccurrence_q(spark, sf).collect()
    ]

    docs = table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(words(normalize_text(F.col("text")))).alias("ts"),
    ).collect()
    n_docs = len(toks)
    df = Counter(t for r in toks for t in r.ts)
    vocab = {t: c for t, c in df.items() if c * 20 >= n_docs and c * 20 <= 19 * n_docs}
    pair_n = Counter()
    for r in toks:
        in_vocab = sorted(t for t in r.ts if t in vocab)
        for x, y in combinations(in_vocab, 2):
            pair_n[(x, y)] += 1
    want = [
        (x, y, n, vocab[x], vocab[y], float(n * n_docs) / float(vocab[x] * vocab[y]))
        for (x, y), n in pair_n.items()
        if n * 50 >= n_docs
    ]
    want.sort(key=lambda t: (-t[5], t[0], t[1]))
    assert got == want[: w.COOC_TOP]
