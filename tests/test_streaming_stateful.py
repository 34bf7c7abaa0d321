"""Stateful streaming operators: cross-batch dedup + top-k maintenance."""

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.streaming.stateful import streaming_first_seen, streaming_topk


def _run_batches(spark, tmp_path, name, schema, batches, build):
    """Write batches one at a time into a file stream, collecting sink
    rows after each trigger; returns list-of-lists of Rows."""
    import os

    src = str(tmp_path / f"{name}_src")
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(src)
    out = build(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .start()
    )
    seen = []
    try:
        for i, b in enumerate(batches):
            # one file per batch: a multi-file write can straddle two
            # file-source listings under load, splitting the batch into
            # two triggers and leaving stale update-mode rows in the
            # memory sink snapshot
            b.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            seen.append(spark.sql(f"SELECT * FROM {name}").collect())
    finally:
        q.stop()
    return seen


@pytest.mark.slow
def test_first_seen_dedups_across_batches(spark, tmp_path):
    b1 = spark.createDataFrame([(100, 1), (100, 2), (200, 3)], "fp long, id long")
    b2 = spark.createDataFrame([(100, 4), (300, 5)], "fp long, id long")
    snaps = _run_batches(
        spark, tmp_path, "firstseen", b1.schema, [b1, b2],
        lambda s: streaming_first_seen(s, "fp", "id"),
    )
    after1 = {(r.key, r.id) for r in snaps[0]}
    assert after1 == {(100, 1), (200, 3)}  # min id wins within batch
    after2 = {(r.key, r.id) for r in snaps[1]}
    assert after2 == {(100, 1), (200, 3), (300, 5)}  # fp=100 suppressed in batch 2


@pytest.mark.slow
def test_streaming_topk_maintains_best_k(spark, tmp_path):
    b1 = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 3.0), (1, 12, 9.0)], "qid long, id long, distance double"
    )
    b2 = spark.createDataFrame(
        [(1, 13, 1.0), (1, 14, 8.0), (2, 20, 2.0)], "qid long, id long, distance double"
    )
    snaps = _run_batches(
        spark, tmp_path, "topk", b1.schema, [b1, b2],
        lambda s: streaming_topk(s, 2),
    )
    # batch 1: q1 best-2 = ids 11 (3.0), 10 (5.0) — latest row per
    # (qid, rank), like the batch-2 check (update-mode sink appends)
    first = {}
    for r in snaps[0]:
        first[(r.qid, r.rank)] = r.id
    assert first == {(1, 1): 11, (1, 2): 10}
    # batch 2 update-mode sink: latest rows per (qid, rank)
    latest = {}
    for r in snaps[1]:
        latest[(r.qid, r.rank)] = (r.id, r.distance)
    assert latest[(1, 1)] == (13, 1.0)  # new global best
    assert latest[(1, 2)] == (11, 3.0)
    assert latest[(2, 1)] == (20, 2.0)


def test_topk_dedups_same_id(spark, tmp_path):
    b1 = spark.createDataFrame([(1, 10, 5.0)], "qid long, id long, distance double")
    b2 = spark.createDataFrame([(1, 10, 5.0), (1, 11, 7.0)], "qid long, id long, distance double")
    snaps = _run_batches(
        spark, tmp_path, "topkdup", b1.schema, [b1, b2],
        lambda s: streaming_topk(s, 5),
    )
    latest = {}
    for r in snaps[1]:
        latest[(r.qid, r.rank)] = r.id
    assert latest == {(1, 1): 10, (1, 2): 11}


def _restart_run(spark, tmp_path, name, build, schema, b1, b2):
    """Process b1, STOP the query (simulated failure between
    micro-batches), start a fresh query from the same checkpoint,
    process b2; returns the rows emitted AFTER the restart. Sink is
    foreachBatch (the memory sink refuses checkpoint recovery)."""
    import os

    src = str(tmp_path / f"{name}_src")
    ckpt = str(tmp_path / f"{name}_ckpt")
    os.makedirs(src, exist_ok=True)

    def start(sink_rows):
        stream = spark.readStream.schema(schema).parquet(src)
        return (
            build(stream)
            .writeStream.foreachBatch(
                lambda batch_df, _epoch: sink_rows.extend(batch_df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    before: list = []
    q1 = start(before)
    try:
        b1.coalesce(1).write.mode("append").parquet(src)
        q1.processAllAvailable()
    finally:
        q1.stop()
    after: list = []
    q2 = start(after)
    try:
        b2.coalesce(1).write.mode("append").parquet(src)
        q2.processAllAvailable()
        return after
    finally:
        q2.stop()


def test_first_seen_state_survives_restart(spark, tmp_path):
    """VERDICT r5 #6: the dedup state store must restore from the
    checkpoint — a key seen before the restart stays suppressed."""
    b1 = spark.createDataFrame([(100, 1), (200, 3)], "fp long, id long")
    b2 = spark.createDataFrame([(100, 9), (300, 5)], "fp long, id long")
    rows = _restart_run(
        spark, tmp_path, "rsfs",
        lambda s: streaming_first_seen(s, "fp", "id"), b1.schema, b1, b2,
    )
    # the post-restart sink sees ONLY batch-2 emissions: fp=300 is new,
    # fp=100 must be suppressed by the RESTORED state (not re-emitted)
    assert {(r.key, r.id) for r in rows} == {(300, 5)}


def test_topk_state_survives_restart(spark, tmp_path):
    """The k-slot state (ids+dists arrays) must restore: the merged
    top-k after restart still contains the pre-restart best."""
    b1 = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 3.0)], "qid long, id long, distance double"
    )
    b2 = spark.createDataFrame([(1, 12, 4.0)], "qid long, id long, distance double")
    rows = _restart_run(
        spark, tmp_path, "rstk", lambda s: streaming_topk(s, 2), b1.schema, b1, b2,
    )
    latest = {}
    for r in rows:
        latest[(r.qid, r.rank)] = (r.id, r.distance)
    # rank 1 = id 11 (3.0) carried over from before the restart
    assert latest[(1, 1)] == (11, 3.0)
    assert latest[(1, 2)] == (12, 4.0)


def test_streaming_trailing_counts_across_batches(spark, tmp_path):
    """Trailing per-key counters must span micro-batches: batch 2's
    events count batch 1's rows still inside the window, and expired
    rows fall out."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.streaming.stateful import streaming_trailing_counts

    src = str(tmp_path / "trail_src")
    win = 1_000_000  # 1s window
    b1 = spark.createDataFrame(
        [(1, 100, 1.0), (1, 600_000, 2.0), (2, 100, 8.0)],
        "user_id long, ts_us long, value double",
    )
    b2 = spark.createDataFrame(
        [(1, 1_000_100, 32.0),  # closed window [100, 1000100]: the ts=100
                                # event is EXACTLY win old and still counts
         (1, 1_400_000, 4.0),   # window [0.4s, 1.4s]: includes 0.6s and 1.0001s rows, excludes 0.1s
         (1, 5_000_000, 16.0)], # far future: alone
        "user_id long, ts_us long, value double",
    )
    b1.coalesce(1).write.parquet(f"{src}/batch=1")
    b2.coalesce(1).write.parquet(f"{src}/batch=2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_trailing_counts(stream, win)
    q = (
        out.writeStream.format("memory").queryName("trail_t").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {(r.user_id, r.ts_us): (r.n_win, r.sum_win) for r in spark.sql("SELECT * FROM trail_t").collect()}
    finally:
        q.stop()
    assert rows[(1, 100)] == (1, 1.0)
    assert rows[(1, 600_000)] == (2, 3.0)
    assert rows[(2, 100)] == (1, 8.0)
    # exact boundary: the ts=100 event is exactly win old -> included
    assert rows[(1, 1_000_100)] == (3, 35.0)
    # cross-batch: 1.4s sees the 0.6s and 1.0001s events, 0.1s expired
    assert rows[(1, 1_400_000)] == (3, 38.0)
    assert rows[(1, 5_000_000)] == (1, 16.0)


def test_streaming_trailing_equals_batch_trailing_agg(spark, tmp_path):
    """On in-order data the streaming counters must equal the batch
    prefix-difference operator row for row — the two forms implement
    one contract."""
    import random

    from sqlite_vector_spark.operators.features import trailing_agg
    from sqlite_vector_spark.streaming.stateful import streaming_trailing_counts

    win = 2_000_000
    rng = random.Random(11)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        t = 0
        for _ in range(30):
            # mix: ties, random gaps, and steps of EXACTLY win — the
            # closed-window boundary (an event exactly win old counts)
            t += rng.choice([0, 0, rng.randint(1, 900_000), win])
            # 0.1-grain values: not exactly representable in binary,
            # so a raw-float streaming fold would drift off the batch
            # fixed-point decimal fold by an ulp
            rows.append((eid, user, t, rng.randint(1, 500) / 10.0))
            eid += 1
        # rounding-tie values: v*1e4 lands EXACTLY on .5 (x.00005 is
        # dyadic-unrepresentable but 0.00005*1e4 evaluates to exactly
        # 0.5 in binary) — Spark F.round goes HALF_UP while Python
        # round() is banker's, so these rows pin the streaming
        # kernel's rounding mode to the batch's
        for half in (0.00005, 3.00005, -1.00005):
            rows.append((eid, user, t, half))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long, value double")

    batch = {
        (r.key, r.ts): (r.n_win, r.sum_win)
        for r in trailing_agg(ev, "user_id", "ts_us", "value", win, id_col="event_id").collect()
    }

    src = str(tmp_path / "eq_src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = streaming_trailing_counts(stream, win)
    q = (
        out.writeStream.format("memory").queryName("trail_eq").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_eq"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.user_id, r.ts_us): (r.n_win, r.sum_win)
            for r in spark.sql("SELECT * FROM trail_eq").collect()
        }
    finally:
        q.stop()
    assert streamed == batch


@pytest.mark.slow
def test_score_stream_ivf_pq_restart_proof(spark, emb, tmp_path):
    """Stream-static scoring over the IVF-PQ store: results equal the
    batch ivf_pq_knn_join for every query, across a checkpoint
    kill/restore — the replayed epoch overwrites its own batch dir,
    so the sink holds exactly one result set per query."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.ann import ivf_assign
    from sqlite_vector_spark.operators.pq import (
        ivf_pq_knn_join,
        ivf_pq_store,
        pq_codebooks_first,
    )
    from sqlite_vector_spark.streaming.scoring import score_stream_ivf_pq

    cents = [list(r.embedding) for r in emb.orderBy("vec_id").limit(8).collect()]
    books = pq_codebooks_first(emb, "embedding", 4, 8, 64, id_col="vec_id")
    store_dir = str(tmp_path / "pq_store")
    ivf_pq_store(emb, "embedding", cents, books, store_dir, id_col="vec_id")

    k, nprobe = 5, 3
    q1 = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    q2 = emb.where((F.col("vec_id") >= 2) & (F.col("vec_id") < 4)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    src = str(tmp_path / "qsrc")
    dest = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt_pqscore")

    def run_once(batch_df):
        batch_df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(q1.schema).parquet(src)
        sq = score_stream_ivf_pq(
            stream, store_dir, dest, ckpt, cents, books, k, nprobe=nprobe,
        )
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()  # kill between batches: offsets live in ckpt

    run_once(q1)
    run_once(q2)  # restart: must score ONLY the new file, not re-emit q1

    got = {}
    for r in spark.read.parquet(dest).collect():
        got.setdefault(r.qid, []).append((r.rank, r.id, r.distance))
    assert set(got) == {0, 1, 2, 3}

    static = ivf_pq_knn_join(
        q1.unionByName(q2), spark.read.parquet(store_dir), cents, books, k, nprobe=nprobe
    )
    want = {}
    for r in static.collect():
        want.setdefault(r.qid, []).append((r.rank, r.id, r.distance))
    for qid in want:
        assert sorted(got[qid]) == sorted(want[qid]), qid


@pytest.mark.slow
def test_ingest_stream_ivf_appends_and_prunes(spark, emb, tmp_path):
    """Streaming IVF maintenance: two micro-batches land as
    epoch/cluster partitions across a kill/restart, the assembled
    store equals the batch ivf_assign of the union, probe filters
    still prune on cluster, and every epoch leaves a drift report."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.ann import ivf_assign
    from sqlite_vector_spark.streaming.scoring import ingest_stream_ivf

    cents = [list(r.embedding) for r in emb.orderBy("vec_id").limit(8).collect()]
    b1 = emb.where(F.col("vec_id") % 2 == 0).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    b2 = emb.where(F.col("vec_id") % 2 == 1).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    src = str(tmp_path / "ivf_src")
    dest = str(tmp_path / "ivf_stream_store")
    ckpt = str(tmp_path / "ivf_ckpt")

    for batch in (b1, b2):  # stop between batches = kill/restart
        batch.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(b1.schema).parquet(src)
        sq = ingest_stream_ivf(stream, dest, ckpt, cents, baseline_mean_dist=1.0)
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()

    store = spark.read.option("basePath", dest).parquet(f"{dest}/epoch=*")
    got = {(r.id, int(r.cluster)) for r in store.collect()}
    want = {
        (r.id, int(r.cluster))
        for r in ivf_assign(b1.unionByName(b2), "vec", cents, id_col="id").collect()
    }
    assert got == want  # exactly once, correct assignment

    pruned = store.where(F.col("cluster").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    drift = spark.read.parquet(f"{dest}/_drift")
    assert drift.count() == 2
    assert {c for c in drift.columns} >= {"n", "mean_dist", "drift", "rebuild_recommended"}


def test_score_stream_mih_restart_proof(spark, emb, tmp_path):
    """Stream-static Hamming scoring over the persisted MIH band
    store: per-query results equal the batch bq_band_join across a
    checkpoint kill/restore (replayed epochs overwrite their own
    batch dir — exactly-once sink)."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.bq import bq_band_join, bq_band_store, bq_encode
    from sqlite_vector_spark.streaming.scoring import score_stream_mih

    codes = bq_encode(emb, "embedding", 64, id_col="vec_id")
    store_dir = str(tmp_path / "mih_store")
    bq_band_store(codes, 64, store_dir, band_bits=8)

    k = 5
    q1 = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    q2 = emb.where((F.col("vec_id") >= 2) & (F.col("vec_id") < 4)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    src = str(tmp_path / "mih_qsrc")
    dest = str(tmp_path / "mih_scored")
    ckpt = str(tmp_path / "mih_ckpt")

    def run_once(batch_df):
        batch_df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(q1.schema).parquet(src)
        sq = score_stream_mih(stream, store_dir, dest, ckpt, 64, k, band_bits=8)
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()  # kill between batches: offsets live in ckpt

    run_once(q1)
    run_once(q2)  # restart: must score ONLY the new file, not re-emit q1

    got = {}
    for r in spark.read.parquet(dest).collect():
        got.setdefault(r.qid, []).append((r.rank, r.id, r.hamming))
    assert set(got) == {0, 1, 2, 3}

    static = bq_band_join(spark, store_dir, q1.unionByName(q2), 64, k, band_bits=8)
    want = {}
    for r in static.collect():
        want.setdefault(r.qid, []).append((r.rank, r.id, r.hamming))
    for qid in want:
        assert sorted(got[qid]) == sorted(want[qid]), qid


@pytest.mark.slow
def test_streaming_neardup_state_maintenance(spark, tmp_path):
    """Continuous near-dup state: two micro-batches (one file per
    trigger) flow through ingest_stream_neardup; batch 2 contains a
    near-dup of a batch-1 doc (cross-epoch edge via the frozen band
    index) and an internal pair. After the stream drains, the newest
    labels epoch must equal a full batch rebuild over all docs, and
    the state layout must be per-epoch overwrite dirs."""
    import os

    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        jaccard_pairs,
        lsh_candidate_pairs,
    )
    from sqlite_vector_spark.streaming.scoring import ingest_stream_neardup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    b1 = [(0, base), (1, base + " lambda")]          # near-dup pair inside batch 1
    b2 = [(10, base + " mu"),                        # near-dup of batch-1 docs 0/1
          (20, other), (21, other + " eleven")]      # pair inside batch 2
    for i in range(30, 44):
        (b1 if i % 2 else b2).append(
            (i, f"filler{i} " + " ".join(f"tok{i}_{j}" for j in range(12)))
        )
    src = str(tmp_path / "doc_src")
    schema = "doc_id long, text string"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    state = str(tmp_path / "nd_state")
    # leftover staging junk must be SKIPPED by the epoch listing, not
    # crash every micro-batch (unparseable suffix / non-numeric id)
    for junk in ("bands/epoch=0.tmp", "docs/epoch=junk"):
        os.makedirs(os.path.join(state, junk), exist_ok=True)
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ingest_stream_neardup(stream, state, str(tmp_path / "ckpt_nd"))
    try:
        # availableNow is not compatible with maxFilesPerTrigger on
        # this source; drain by waiting for both files to process
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            eps = [d for d in os.listdir(os.path.join(state, "labels")) if d.startswith("epoch=")] \
                if os.path.isdir(os.path.join(state, "labels")) else []
            if len(eps) >= 2 and not q.status["isDataAvailable"]:
                break
            time.sleep(0.2)  # poll fast; the 120 s deadline is the bound
    finally:
        q.stop()

    labels_root = os.path.join(state, "labels")
    epochs = sorted(int(d.split("=")[1]) for d in os.listdir(labels_root) if d.startswith("epoch="))
    assert len(epochs) >= 2  # one labels generation per micro-batch
    got = {
        (r.id, r.cluster)
        for r in spark.read.parquet(f"{labels_root}/epoch={epochs[-1]}").collect()
    }

    docs = spark.createDataFrame(b1 + b2, schema)
    edges = (
        jaccard_pairs(lsh_candidate_pairs(docs, "doc_id", "text"), docs, "doc_id", "text")
        .where(F.col("jaccard") >= 0.8)
        .select("a", "b")
    )
    want = {(r.id, r.cluster) for r in connected_components_min_label(edges).collect()}
    assert got == want
    # the cross-epoch merge really happened: 0, 1, 10 share one cluster
    by_id = dict(got)
    assert by_id[10] == by_id[0] == by_id[1] == 0
    assert by_id[21] == 20
    # per-epoch overwrite layout on every state table
    for sub in ("bands", "docs", "labels"):
        assert any(d.startswith("epoch=") for d in os.listdir(os.path.join(state, sub)))


def _state_eps(spark, state, sub):
    """Epoch ids under <state>/<sub>, scheme-agnostic (the engine's
    lister — the mock-scheme runs cannot use os.listdir)."""
    from sqlite_vector_spark.streaming.scoring import _epoch_ids

    return _epoch_ids(f"{state}/{sub}", spark=spark)


def _state_ls(spark, p):
    """Child names under a state path, scheme-agnostic."""
    from sqlite_vector_spark import fsutil

    if fsutil.has_scheme(p):
        return fsutil.list_names(spark, p)
    import os

    try:
        return os.listdir(p)
    except OSError:
        return []


def _state_root(tmp_path, scheme, name):
    """A state root for the given scheme: plain local path, or the
    same directory under the test-only "mock:" scheme (conftest wires
    fs.mock.impl -> MockFileSystem: RawLocalFileSystem semantics under
    a NON-file URI, so any engine code that still walks the root with
    os./shutil breaks loudly — the object-store-safety gate, r13
    VERDICT r12 #2)."""
    return str(tmp_path / name) if scheme == "local" else f"mock:{tmp_path}/{name}"


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["local", "mock"])
def test_takedown_stream_state_then_resume(spark, tmp_path, scheme):
    """Streaming takedown: after two micro-batches build near-dup
    state, takedown_stream_state removes a doc from the band index,
    doc mirror, and labels (its cluster re-solved); a RESUMED stream
    ingesting a third batch then produces labels equal to a full
    batch rebuild over (all docs - deleted) — the deleted doc never
    matches again and never reappears in any cluster. Runs over a
    plain local root AND a mocked non-file scheme (r13): ingest,
    takedown, compact, vacuum, and resume must hold the SAME
    invariants through the Hadoop FS layer."""
    import os
    import time

    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        jaccard_pairs,
        lsh_candidate_pairs,
    )
    from sqlite_vector_spark.streaming.scoring import (
        ingest_stream_neardup,
        takedown_stream_state,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    b1 = [(0, base), (1, base + " lambda")]
    b2 = [(10, base + " mu"), (20, other), (21, other + " eleven")]
    b3 = [(30, base + " nu")]  # post-takedown near-dup of 1/10
    for i in range(40, 52):
        (b1 if i % 3 == 0 else b2 if i % 3 == 1 else b3).append(
            (i, f"fill{i} " + " ".join(f"t{i}_{j}" for j in range(12)))
        )
    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    state = _state_root(tmp_path, scheme, "state")
    ckpt = str(tmp_path / "ckpt")

    def run_stream(n_label_epochs):
        stream = (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ingest_stream_neardup(stream, state, ckpt)
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                eps = _state_eps(spark, state, "labels")
                if len(eps) >= n_label_epochs and not q.status["isDataAvailable"]:
                    break
                time.sleep(0.2)  # poll fast; the 120 s deadline is the bound
        finally:
            q.stop()

    run_stream(2)
    # takedown doc 0 between triggers (cluster {0,1,10} must re-solve)
    rep = takedown_stream_state(spark, state, [0])
    assert rep["band_rows_deleted"] > 0
    assert rep["doc_rows_deleted"] == 1 and rep["labels_rewritten"]
    # state: no trace of doc 0 anywhere
    for sub, col in (("bands", "id"), ("docs", "doc_id"), ("labels", "id")):
        root = f"{state}/{sub}"
        dirs = [f"{root}/epoch={e}" for e in _state_eps(spark, state, sub)]
        left = spark.read.option("basePath", root).parquet(*dirs)
        assert left.where(F.col(col) == 0).count() == 0, sub
    # labels re-solved: {1,10} survive as a cluster with min 1
    eps = _state_eps(spark, state, "labels")
    lab = {r.id: r.cluster
           for r in spark.read.parquet(f"{state}/labels/epoch={eps[-1]}").collect()}
    assert lab[1] == 1 and lab[10] == 1 and 0 not in lab

    # clean drain -> FULL epoch fold (below = max+1): both band/doc
    # epochs merge into one base dir, dead label epochs drop, and the
    # takedown's per-epoch __pre_delete retention rides into the
    # compaction retention
    from sqlite_vector_spark.streaming.scoring import (
        compact_stream_state,
        vacuum_stream_state,
    )

    all_eps = _state_eps(spark, state, "bands")
    assert len(all_eps) == 2
    crep = compact_stream_state(spark, state, below_epoch=all_eps[-1] + 1)
    assert crep["bands"]["folded"] == all_eps and crep["bands"]["base"] == all_eps[-1]
    assert crep["docs"]["folded"] == all_eps
    assert crep["labels_dropped"] == all_eps[:-1]
    assert crep["read_paths"]["after"] < crep["read_paths"]["before"]
    # one vacuum reclaims BOTH retention kinds (advisor r11: takedown
    # leftovers in streaming state were otherwise unreclaimable)
    vrep = vacuum_stream_state(state)
    assert vrep["bytes_freed"] > 0 and not vrep["skipped"]
    assert "bands__pre_compact" in vrep["removed"]
    leftovers = [
        d
        for p in ([state] + [f"{state}/{n}" for n in ("bands", "docs", "labels")])
        for d in _state_ls(spark, p)
        if "__pre_" in d
    ]
    assert not leftovers

    # resume: batch 3 bridges to the re-solved cluster, reading the
    # folded base epoch exactly as it read the per-epoch dirs
    spark.createDataFrame(b3, schema).coalesce(1).write.mode("append").parquet(src)
    run_stream(2)  # labels = {folded base's live epoch, new epoch}
    eps = _state_eps(spark, state, "labels")
    got = {(r.id, r.cluster)
           for r in spark.read.parquet(f"{state}/labels/epoch={eps[-1]}").collect()}

    survivors = spark.createDataFrame(
        [r for r in b1 + b2 + b3 if r[0] != 0], schema
    )
    edges = (
        jaccard_pairs(lsh_candidate_pairs(survivors, "doc_id", "text"),
                      survivors, "doc_id", "text")
        .where(F.col("jaccard") >= 0.8)
        .select("a", "b")
    )
    want = {(r.id, r.cluster) for r in connected_components_min_label(edges).collect()}
    assert got == want
    by = dict(got)
    assert by[30] == by[1] == by[10] == 1  # new doc joined the re-solved cluster


# ---- r11: the {embedding} x {streaming} state-maintenance cell ----

_EPLANES = [[((p * 8 + j) * 37 % 101) / 101.0 - 0.5 for j in range(8)] for p in range(3)]


def _vec(i):
    """Deterministic 8-dim vector per id (hash lanes, no linear
    correlation across ids)."""
    return [float(((i * 2654435761 + j * 40503) % 1009) / 1009.0 - 0.5) for j in range(8)]


def _emb_batches():
    """b2 contains an exact copy of a b1 vector (cross-epoch edge via
    the frozen bucket index) and an internal exact-copy pair."""
    b1 = [(0, _vec(0)), (1, _vec(0))]            # near-dup pair inside batch 1
    b2 = [(10, _vec(0)),                          # near-dup of batch-1 vecs 0/1
          (20, _vec(20)), (21, _vec(20))]         # pair inside batch 2
    b3 = [(30, _vec(0))]                          # post-takedown near-dup of 1/10
    for i in range(40, 52):
        (b1 if i % 3 == 0 else b2 if i % 3 == 1 else b3).append((i, _vec(i)))
    return b1, b2, b3


def _run_emb_stream(spark, src, state, ckpt, n_label_epochs, schema):
    import time

    from sqlite_vector_spark.streaming.scoring import ingest_stream_embedding_neardup

    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ingest_stream_embedding_neardup(
        stream, state, ckpt, _EPLANES, threshold=0.1
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            eps = _state_eps(spark, state, "labels")
            if len(eps) >= n_label_epochs and not q.status["isDataAvailable"]:
                break
            time.sleep(0.2)  # poll fast; the 120 s deadline is the bound
    finally:
        q.stop()


def test_streaming_embedding_neardup_state_maintenance(spark, tmp_path):
    """Two micro-batches flow through ingest_stream_embedding_neardup
    (cross-epoch edge via the frozen per-epoch bucket indexes); the
    newest labels epoch equals a full batch rebuild over all vectors,
    and the state carries its frozen plane family in sidecars."""
    import os

    import pyspark.sql.functions as F

    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        embedding_neardup_pairs,
    )
    from sqlite_vector_spark.sinks import read_params_sidecar

    b1, b2, _ = _emb_batches()
    src = str(tmp_path / "vec_src")
    schema = "vec_id long, embedding array<float>"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    state = str(tmp_path / "end_state")
    _run_emb_stream(spark, src, state, str(tmp_path / "ckpt_end"), 2, schema)

    labels_root = os.path.join(state, "labels")
    epochs = sorted(int(d.split("=")[1]) for d in os.listdir(labels_root) if d.startswith("epoch="))
    assert len(epochs) >= 2
    got = {(r.id, r.cluster)
           for r in spark.read.parquet(f"{labels_root}/epoch={epochs[-1]}").collect()}

    vecs = spark.createDataFrame(b1 + b2, schema)
    edges = embedding_neardup_pairs(vecs, "vec_id", "embedding", _EPLANES, 0.1).select("a", "b")
    want = {(r.id, r.cluster) for r in connected_components_min_label(edges).collect()}
    assert got == want
    by = dict(got)
    assert by[10] == by[0] == by[1] == 0 and by[21] == 20
    assert read_params_sidecar(state)["threshold"] == 0.1
    # restart with a conflicting family must raise at setup
    import pytest

    from sqlite_vector_spark.streaming.scoring import ingest_stream_embedding_neardup

    stream = (spark.readStream.schema(spark.createDataFrame([], schema).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    with pytest.raises(ValueError, match="frozen-params conflict"):
        ingest_stream_embedding_neardup(stream, state, str(tmp_path / "ckpt2"),
                                        _EPLANES, threshold=0.5)


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["local", "mock"])
def test_takedown_stream_state_embedding_then_resume(spark, tmp_path, scheme):
    """Embedding streaming takedown: remove a vector from the per-epoch
    bucket indexes, vector mirror, and labels (cluster re-solved);
    a RESUMED stream ingesting a third batch produces labels equal to
    a batch rebuild over the survivors — and the orchestrator reaches
    the registered state. The mock-scheme run additionally proves the
    ORCHESTRATOR path end-to-end on a non-file root: catalog-registered
    remote state -> takedown -> verify_ids_absent's stream-residual
    walk (r13)."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        embedding_neardup_pairs,
    )
    from sqlite_vector_spark.sinks import takedown, verify_ids_absent

    b1, b2, b3 = _emb_batches()
    src = str(tmp_path / "vsrc")
    schema = "vec_id long, embedding array<float>"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    state = _state_root(tmp_path, scheme, "estate")
    ckpt = str(tmp_path / "eckpt")
    _run_emb_stream(spark, src, state, ckpt, 2, schema)

    # takedown vec 0 through the ORCHESTRATOR (registered state)
    emb_df = spark.createDataFrame(b1 + b2, schema)
    emb_df.createOrReplaceTempView("estream_t")
    cat = VectorCatalog(str(tmp_path / "ecat"))
    cat.vector_init(emb_df, "estream_t", "embedding", "type=FLOAT32,dimension=8,distance=L2")
    cat.set_stream_state("estream_t", "embedding", embedding_state_dir=state)
    rep = takedown(spark, cat, "estream_t", "embedding", [0])
    assert rep["embedding_stream_state"]["vec_rows_deleted"] == 1
    assert rep["embedding_stream_state"]["labels_rewritten"]
    assert verify_ids_absent(spark, cat, "estream_t", "embedding", [0]) == {
        "embedding_stream_state": 0
    }
    # labels re-solved: {1,10} survive as a cluster with min 1
    eps = _state_eps(spark, state, "labels")
    lab = {r.id: r.cluster
           for r in spark.read.parquet(f"{state}/labels/epoch={eps[-1]}").collect()}
    assert lab[1] == 1 and lab[10] == 1 and 0 not in lab

    # resume: batch 3 bridges to the re-solved cluster
    spark.createDataFrame(b3, schema).coalesce(1).write.mode("append").parquet(src)
    _run_emb_stream(spark, src, state, ckpt, 3, schema)
    eps = _state_eps(spark, state, "labels")
    got = {(r.id, r.cluster)
           for r in spark.read.parquet(f"{state}/labels/epoch={eps[-1]}").collect()}
    survivors = spark.createDataFrame([r for r in b1 + b2 + b3 if r[0] != 0], schema)
    edges = embedding_neardup_pairs(survivors, "vec_id", "embedding", _EPLANES, 0.1).select("a", "b")
    want = {(r.id, r.cluster) for r in connected_components_min_label(edges).collect()}
    assert got == want
    by = dict(got)
    assert by[30] == by[1] == by[10] == 1


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["local", "mock"])
def test_compact_stream_state_resume_equivalence(spark, tmp_path, scheme):
    """Epoch compaction under the REPLAY-SAFE default watermark: three
    micro-batches build per-epoch embedding near-dup state;
    compact_stream_state (default = fold everything below the newest
    epoch) merges the old bucket/vec epochs into one base dir and
    drops the dead label epochs; a RESUMED stream ingesting a fourth
    batch then produces labels equal to a full batch rebuild over all
    vectors — i.e. byte-identical inputs at every later epoch, the
    equality the per-epoch layout guaranteed before folding. Also
    pins: read-path count shrinks, the newest (replayable) epoch is
    untouched, and the bucket base epoch keeps its plane-family
    sidecar. Runs over a plain local root AND a mocked non-file
    scheme (r13, VERDICT r12 #2): compaction's fold/retention/promote
    and the sidecar carry-over go through the Hadoop FS layer."""
    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        embedding_neardup_pairs,
    )
    from sqlite_vector_spark.sinks import read_params_sidecar
    from sqlite_vector_spark.streaming.scoring import compact_stream_state

    b1, b2, b3 = _emb_batches()
    b4 = [(60, _vec(20)), (61, _vec(61))]  # joins cluster 20 post-compaction
    src = str(tmp_path / "csrc")
    schema = "vec_id long, embedding array<float>"
    for b in (b1, b2, b3):
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    state = _state_root(tmp_path, scheme, "cstate")
    ckpt = str(tmp_path / "cckpt")
    _run_emb_stream(spark, src, state, ckpt, 3, schema)

    def eps(sub):
        return _state_eps(spark, state, sub)

    assert len(eps("buckets")) == 3
    newest = eps("buckets")[-1]
    crep = compact_stream_state(spark, state)  # default: keep the newest replayable
    assert crep["below_epoch"] == newest
    assert crep["buckets"]["folded"] == crep["vecs"]["folded"]
    assert len(crep["buckets"]["folded"]) == 2
    assert eps("buckets") == [crep["buckets"]["base"], newest]
    assert eps("vecs") == [crep["vecs"]["base"], newest]
    assert crep["read_paths"]["after"] < crep["read_paths"]["before"]
    # dead label epochs dropped; the live one (newest below) + newest kept
    assert eps("labels") == [crep["buckets"]["base"], newest]
    # the folded bucket epoch keeps its frozen plane family
    side = read_params_sidecar(f"{state}/buckets/epoch={crep['buckets']['base']}")
    assert side and side["planes"] == _EPLANES

    # resume over the compacted state: same labels as a full rebuild
    spark.createDataFrame(b4, schema).coalesce(1).write.mode("append").parquet(src)
    _run_emb_stream(spark, src, state, ckpt, 3, schema)
    got = {(r.id, r.cluster)
           for r in spark.read.parquet(f"{state}/labels/epoch={eps('labels')[-1]}").collect()}
    vecs = spark.createDataFrame(b1 + b2 + b3 + b4, schema)
    edges = embedding_neardup_pairs(vecs, "vec_id", "embedding", _EPLANES, 0.1).select("a", "b")
    want = {(r.id, r.cluster) for r in connected_components_min_label(edges).collect()}
    assert got == want
    by = dict(got)
    assert by[60] == by[20] == by[21]  # bridged across the fold
