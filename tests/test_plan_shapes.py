"""Physical-plan pins for the scale contracts (SURVEY §4, README).

These tests fail if a future change silently degrades the plan —
e.g. a top-k that becomes a global sort, a scan that stops pruning
columns, or a pair join that goes cartesian.
"""

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.plans import assert_in_plan, assert_not_in_plan, physical_plan
from sqlite_vector_spark import workload as w

SF = "/root/testdata/sf0.001"


def test_full_scan_is_take_ordered_not_sort(spark):
    df = w.full_scan_l2(spark, SF)
    assert_in_plan(df, "TakeOrderedAndProject")
    assert_not_in_plan(df, "SortExec")


def test_full_scan_prunes_columns(spark):
    plan = physical_plan(w.full_scan_l2(spark, SF))
    scan = plan[plan.index("FileScan"):]
    # only the id + vector columns are read
    assert "vec_id" in scan[:200] and "embedding" in scan[:200]
    assert "label" not in scan[:200]


def test_quantize_scan_no_corpus_shuffle(spark):
    # the only exchanges allowed are the 1-row params broadcast sides;
    # the codes themselves must not hash-shuffle
    plan = physical_plan(w.quantize_scan_l2(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(id" not in plan


def test_knn_join_broadcasts_queries(spark):
    df = w.knn_join_l2(spark, SF)
    assert_in_plan(df, "BroadcastHashJoin") if "BroadcastHashJoin" in physical_plan(df) else assert_in_plan(
        df, "BroadcastNestedLoopJoin"
    )


def test_lsh_pairs_single_scan_no_cartesian(spark):
    df = w.lsh_pairs_q(spark, SF)
    plan = physical_plan(df)
    assert plan.count("FileScan") == 1
    assert_not_in_plan(df, "CartesianProduct")


def test_jaccard_token_table_is_candidate_bounded(spark):
    """VERDICT r2 #2: the distinct-token table must be built over
    candidate docs only — the corpus semi-joins the broadcast candidate
    id set BEFORE the token explode, so every token exchange is
    candidate-bounded, never corpus-wide."""
    df = w.jaccard_pairs_q(spark, SF)
    plan = physical_plan(df)
    assert_not_in_plan(df, "CartesianProduct")
    # r14 shape: scoring is array_intersect over per-doc token ARRAYS
    # — no token-level explode/distinct exchange in the query plan
    assert "array_intersect" in plan, plan[:1200]
    # the token-set table itself (lazily checkpointed inside
    # jaccard_pairs, so invisible in the query plan) must stay
    # candidate-bounded: the LeftSemi pruning join sits under the
    # tokenize, and the tokens stay a map-side array (no Generate)
    from sqlite_vector_spark.operators.dedup import (
        _candidate_token_sets,
        lsh_candidate_pairs,
    )

    docs = w._docs(spark, SF)
    # checkpoint the candidates (as jaccard_pairs_q does) so the token
    # subtree's plan is inspectable on its own
    cand = lsh_candidate_pairs(docs, "doc_id", "text").localCheckpoint(eager=True)
    tok_plan = physical_plan(_candidate_token_sets(cand, docs, "doc_id", "text"))
    assert "LeftSemi" in tok_plan, tok_plan[:1200]
    # no token/shingle explode, and no derived-array predicate pushed
    # below the semi-join (it would tokenize the whole corpus)
    assert "Generate" not in tok_plan, tok_plan[:1200]
    assert "array_distinct" not in tok_plan.split("LeftSemi")[-1], tok_plan[:1200]


def test_neardup_join_is_bucket_keyed_not_cartesian(spark):
    df = w.embedding_neardup_q(spark, SF)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    assert_in_plan(df, "bucket")


def test_dedup_exact_partial_aggregation(spark):
    # partial_count / merge_count = map-side combine before the shuffle
    plan = physical_plan(w.dedup_exact_q(spark, SF))
    assert "partial_count" in plan or "partial" in plan, plan[:500]


def test_text_stats_is_map_only(spark):
    # pure projection: no exchange at all above the scan (widen's
    # round-robin repartition is the single allowed exchange)
    plan = physical_plan(w.text_stats(spark, SF))
    assert plan.count("Exchange") <= 1
    assert "hashpartitioning" not in plan


def test_minhash_folds_before_shuffle(spark):
    # the groupBy(id) must see partial_min aggregates (map-side fold of
    # the 8 permutations), not raw exploded rows
    plan = physical_plan(w.minhash_sig_q(spark, SF))
    assert "partial_min" in plan or "partial" in plan, plan[:500]


def test_ivf_assign_is_shuffle_free(spark):
    from sqlite_vector_spark.operators.ann import ivf_assign

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [list(r.embedding) for r in emb.where("vec_id < 4").collect()]
    df = ivf_assign(emb, "embedding", cents, id_col="vec_id")
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan[:500]


def test_shipping_priority_topk_and_broadcast_dim(spark):
    df = w.shipping_priority(spark, SF)
    plan = physical_plan(df)
    # top-10 must be partial top-k, not a global sort of all orders
    assert "TakeOrderedAndProject" in plan
    # the filtered customer dim probes map-side
    assert "BroadcastHashJoin" in plan


def test_region_volume_broadcasts_all_dims(spark):
    plan = physical_plan(w.region_volume(spark, SF))
    # supplier/customer/nation/region all broadcast; only the
    # lineitem x orders key (and the final agg) may shuffle by hash
    assert plan.count("BroadcastHashJoin") >= 4, plan[:800]
    assert "CartesianProduct" not in plan


def test_sessionize_single_user_shuffle(spark):
    # lag-window, running-sum window, and group-by all partition by
    # user_id -> exactly one hash exchange in the whole pipeline
    plan = physical_plan(w.sessionize(spark, SF))
    assert plan.count("hashpartitioning(user_id") <= 1, plan[:800]


def test_pq_scan_is_take_ordered_over_codes(spark):
    """PQ ADC scan: TakeOrderedAndProject over the code projection —
    no global sort, no shuffle of the codes."""
    df = w.pq_scan_l2(spark, SF)
    assert_in_plan(df, "TakeOrderedAndProject")
    assert_not_in_plan(df, "SortExec")
    plan = physical_plan(df)
    assert "hashpartitioning(id" not in plan


def test_pq_encode_is_map_only(spark):
    """Encoding is a pure projection: zero Exchange nodes at any
    backend (the 100 TB no-shuffle contract)."""
    from sqlite_vector_spark.operators.pq import pq_encode
    from sqlite_vector_spark.workload import DIM, PQ_KSUB, PQ_M, _emb, _pq_codebooks

    emb = _emb(spark, SF)
    df = pq_encode(emb, "embedding", _pq_codebooks(emb), id_col="vec_id")
    assert_not_in_plan(df, "Exchange")


def test_bq_scan_is_integer_take_ordered(spark):
    """1-bit Hamming scan: XOR+popcount projection + top-k, no
    shuffle, no sort, and whole-stage codegen over the scan."""
    df = w.bq_scan_hamming(spark, SF)
    assert_in_plan(df, "TakeOrderedAndProject")
    assert_not_in_plan(df, "SortExec")
    assert_not_in_plan(df, "Exchange")
    # the *(N) stage marker is how executedPlan().toString() shows a
    # whole-stage-codegen'd projection
    assert "*(" in physical_plan(df)


def test_bq_encode_is_map_only(spark):
    from sqlite_vector_spark.operators.bq import bq_encode
    from sqlite_vector_spark.workload import DIM, _emb

    df = bq_encode(_emb(spark, SF), "embedding", DIM, id_col="vec_id")
    assert_not_in_plan(df, "Exchange")


def test_ivf_pq_knn_join_broadcasts_query_side(spark):
    """Multi-query compressed join: the query x probe side broadcasts;
    the code store never hash-shuffles before the scoring join."""
    from sqlite_vector_spark.operators.ann import ivf_assign
    from sqlite_vector_spark.operators.pq import ivf_pq_knn_join, pq_encode_col
    from sqlite_vector_spark.workload import _emb, _pq_codebooks

    emb = _emb(spark, SF)
    books = _pq_codebooks(emb)
    cents = [list(r.embedding) for r in emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect()]
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    store = ivf_assign(emb, "embedding", cents, id_col="vec_id", metric="L2").select(
        "id", pq_encode_col(F.col("vec"), books).alias("codes"), "cluster"
    )
    df = ivf_pq_knn_join(queries, store, cents, books, 5, nprobe=2)
    assert_in_plan(df, "BroadcastHashJoin")
    plan = physical_plan(df)
    # the only hash exchange is the per-qid rank window, never the corpus scan side
    before_join = plan[: plan.index("BroadcastHashJoin")]
    assert "hashpartitioning(id" not in before_join


def test_bm25_scoring_is_map_side_no_token_explode(spark):
    """BM25 without an inverted index: the tf projection is a per-row
    array_filter, so the plan must contain NO Generate (token explode)
    and keep the top-k as TakeOrderedAndProject — the only exchange is
    the 1-row stats aggregate."""
    df = w.bm25_topk_q(spark, SF)
    assert_in_plan(df, "TakeOrderedAndProject", "BroadcastNestedLoopJoin")
    assert_not_in_plan(df, "Generate", "SortExec")


def test_matryoshka_rerank_semijoin_is_broadcast(spark):
    """The coarse survivors rejoin the corpus as a broadcast left-semi
    on id — the corpus itself must not shuffle between passes."""
    df = w.matryoshka_rerank_l2(spark, SF)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(vec_id" not in plan and "hashpartitioning(id" not in plan


def test_semantic_dedup_pair_join_is_cluster_equijoin(spark):
    """The SemDeDup pair search must stay blocked on cluster: an
    equi-join keyed by the cluster id, never a nested-loop/cartesian
    pair scan over the corpus."""
    df = w.semantic_dedup_q(spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the id-inequality + distance threshold ride an EQUI join keyed on
    # cluster (AQE may pick broadcast-hash at test scale; shuffled hash /
    # sort-merge at real scale) — never a nested-loop downgrade
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_boilerplate_anti_join_is_broadcast(spark):
    """The boilerplate set (df >= min_df) must broadcast back — a
    shuffled (sort-merge) join would re-shuffle the chunk text
    corpus-wide. r14: the strip is a broadcast LEFT join + conditional
    aggregation (the anti-join shape needed a third evaluation of the
    words projection for the totals join)."""
    df = w.boilerplate_strip_q(spark, SF)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan[:1200]
    assert_not_in_plan(df, "SortMergeJoin", "CartesianProduct")


def test_gopher_quality_has_no_key_shuffle(spark):
    """Quality rules are map-only HOF arithmetic: the only exchanges
    allowed are the deliberate widen() round-robin and the final
    presentation sort — never a hashpartitioning shuffle."""
    plan = physical_plan(w.gopher_quality_q(spark, SF))
    assert "hashpartitioning" not in plan, plan[:1200]


def test_user_rolling_single_key_shuffle(spark):
    """The prefix-difference rolling needs exactly one key hash
    exchange (the union's cumulative window over trailing_agg's
    `key` column); the per-event reduce keys on the id. A second
    key exchange would mean the cumulative pass re-partitions."""
    plan = physical_plan(w.user_rolling_q(spark, SF))
    assert plan.count("hashpartitioning(key") == 1, plan[:1500]


def test_user_decay_broadcasts_max_timestamp(spark):
    """The 1-row max-timestamp agg must ride in as a broadcast, and
    the score agg is the only user_id shuffle."""
    df = w.user_decay_q(spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:1200]
    assert plan.count("hashpartitioning(user_id") >= 1
    assert_not_in_plan(df, "SortMergeJoin")


def test_mmr_candidate_fetch_is_take_ordered(spark):
    """The distributed leg of MMR is the top-C candidate fetch — it
    must plan as TakeOrderedAndProject, not a global sort."""
    from sqlite_vector_spark.functions.distance import distance, vector_literal

    emb = w._emb(spark, SF).where(F.col("embedding").isNotNull())
    scored = emb.select(
        F.col("vec_id").cast("bigint").alias("id"),
        F.col("embedding").alias("v"),
        distance(F.col("embedding"), vector_literal(w.Q64), "L2").alias("dq"),
    ).orderBy(F.col("dq").asc(), F.col("id").asc()).limit(w.MMR_C)
    assert_in_plan(scored, "TakeOrderedAndProject")


def test_source_overlap_has_no_pair_self_join(spark):
    """Pair expansion is an in-row HOF over the collected source set —
    the plan must contain no join at all below the totals broadcast
    (the self-join form shuffled the distinct table twice; measured
    45% more shuffle at 1M docs, SCALE.md)."""
    df = w.source_overlap_q(spark, SF)
    plan = physical_plan(df)
    assert_not_in_plan(df, "SortMergeJoin", "CartesianProduct")
    # the only joins are the two broadcast totals ride-alongs
    assert plan.count("BroadcastHashJoin") == 2, plan[:1500]


def test_pack_sequences_single_shard_shuffle(spark):
    """The prefix-sum layout needs exactly one hash exchange on the
    shard key; the final orderBy is presentation-only."""
    plan = physical_plan(w.pack_sequences_q(spark, SF))
    assert plan.count("hashpartitioning(shard") == 1, plan[:1500]


def test_bm25_batch_single_scan_window_limited(spark):
    """Batched BM25 must stay at two corpus scans (base + stats) with
    the per-query top-k bounded by WindowGroupLimit, and never plan a
    per-query re-scan."""
    df = w.bm25_batch_topk_q(spark, SF)
    plan = physical_plan(df)
    assert plan.count("FileScan") == 2, plan[:1500]
    assert "WindowGroupLimit" in plan
    assert_not_in_plan(df, "SortMergeJoin", "CartesianProduct")


def test_events_resample_grid_is_broadcast_left_join(spark):
    """The dense grid joins the rollup as a broadcast LEFT join; a
    shuffled join would re-exchange the grid per type x hour."""
    df = w.events_resample_q(spark, SF)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan[:1500]
    assert_not_in_plan(df, "SortMergeJoin")


def test_session_incident_overlap_is_bucket_equijoin(spark):
    """The interval x interval join must be the bucket equi-join with
    the small incident side broadcast — never a nested-loop over the
    raw inequality predicate."""
    df = w.session_incident_overlap_q(spark, SF)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan and "Inner" in plan, plan[:1500]
    assert_not_in_plan(df, "BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin")


def test_routed_versioned_scan_single_relation(spark):
    """The routed scan over a compacted (single-generation) VERSIONED
    replica must plan exactly like the flat route: one parquet scan
    into TakeOrdered — no Union, no extra exchange. Plan width only
    grows while superseded generations are retained (the documented
    bounded window), never in steady state."""
    plan = physical_plan(w.auto_route_scan_versioned_q(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Union" not in plan
    assert plan.count("FileScan") == 1
