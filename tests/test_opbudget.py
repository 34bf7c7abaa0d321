"""Object-store cost claims, ASSERTED on the instrumented mock:
filesystem (VERDICT r13 next #5 — promote SCALE.md's argued bounds to
tested invariants). MockFileSystem records every externally visible
metadata op between startRecording()/stopRecording(); these tests run
one verb inside a window and pin its op budget:

- routed versioned scan: ONE manifest-dir LIST + ONE manifest GET,
  ZERO directory LISTs under the data prefix (pruning is the manifest
  filter, never a prefix walk);
- versioned delete: ZERO store-level renames (pointer-flip swap);
- micro-batch planning over epoch state: LISTs <= #epochs + 1;
- streaming takedown: every store-level rename moves at most one
  epoch-level directory (never the state root or a tier root).

Spark's own write commits rename task files under ``_temporary``; the
claims are about STORE-level ops, so commit-internal paths are
filtered out — on a real object store those belong to the committer's
cost model (magic committers PUT directly), not the verb's.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest


def _record(spark):
    spark._jvm.MockFileSystem.startRecording()


def _ops(spark) -> list[tuple[str, str]]:
    raw = spark._jvm.MockFileSystem.stopRecording()
    return [tuple(line.split(" ", 1)) for line in raw.splitlines() if line]


def _store_level(ops):
    """Drop write-commit internals (task-attempt files under
    _temporary / .spark-staging) — committer cost, not verb cost."""
    return [
        (op, p) for op, p in ops
        if "_temporary" not in p and ".spark-staging" not in p
    ]


def _dir_lists(ops, within: str):
    """LIST ops that walk a DIRECTORY under `within` (listStatus on an
    explicit .parquet file is a per-file stat, 1 RPC, not a prefix
    walk)."""
    return [
        p for op, p in ops
        if op == "list" and within in p and not p.endswith(".parquet")
    ]


@pytest.fixture()
def vstore(spark, tmp_path):
    from sqlite_vector_spark.versioned import versioned_store_init

    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 8).cast("int").alias("cluster"),
        F.rand(1).alias("v"),
    )
    root = f"mock:{tmp_path}/store"
    versioned_store_init(df, root, partition_col="cluster")
    return root, df


def test_versioned_pruned_scan_op_budget(spark, vstore):
    """SCALE.md claim 'one manifest GET instead of C prefix LISTs',
    asserted: the probe-pruned read costs 1 LIST of the manifest dir
    + 1 GET of the live manifest, and NEVER walks the data prefix —
    every data-side op targets an explicit probe-partition file."""
    from sqlite_vector_spark.versioned import read_versioned

    root, _ = vstore
    _record(spark)
    n = read_versioned(spark, root, partition_values=[2, 5]).count()
    ops = _ops(spark)
    assert n == 50

    manifest_lists = [p for op, p in ops if op == "list" and "_sv_manifests" in p]
    manifest_gets = [p for op, p in ops if op == "open" and "_sv_manifests" in p]
    assert len(manifest_lists) == 1
    assert len(manifest_gets) == 1
    assert _dir_lists(ops, "/data/") == []  # no data-prefix walk, ever
    # and the files actually opened are probe partitions only
    data_opens = {p for op, p in ops if op == "open" and "/data/" in p}
    assert data_opens and all(
        "/cluster=2/" in p or "/cluster=5/" in p for p in data_opens
    )


def test_routed_versioned_full_read_op_budget(spark, vstore):
    """The full (unpruned) live-set read through read_store resolves
    the layout + manifest in O(1) small ops and never LISTs the data
    prefix either — partition discovery comes from the manifest, not
    a recursive walk."""
    from sqlite_vector_spark.sinks import read_store

    root, df = vstore
    _record(spark)
    n = read_store(spark, root).count()
    ops = _ops(spark)
    assert n == df.count()
    assert len([p for op, p in ops if op == "open" and "_sv_manifests" in p]) == 1
    assert _dir_lists(ops, "/data/") == []


def test_versioned_delete_zero_renames(spark, vstore):
    """The pointer-flip swap: a versioned delete commits a new
    generation + manifest and NEVER renames anything at store level —
    the property that makes the layout object-store-native (rename on
    S3-class stores is a copy)."""
    from sqlite_vector_spark.sinks import delete_ids

    root, _ = vstore
    _record(spark)
    rep = delete_ids(spark, root, [3, 11, 19], id_col="id")
    ops = _store_level(_ops(spark))
    assert rep["deleted_rows"] == 3
    renames = [p for op, p in ops if op == "rename"]
    assert renames == []


def test_versioned_append_op_budget(spark, vstore):
    """Append is rename-free AND prior-generation-blind: the batch
    commits as generation N+1 plus a manifest listing the old files BY
    REFERENCE — so the budget is zero renames at store level and zero
    reads or LISTs of any prior generation's data (an append to a
    100k-file store costs the same metadata ops as an append to a
    10-file store)."""
    from sqlite_vector_spark.versioned import append_versioned, read_versioned

    root, df = vstore
    batch = spark.range(200, 250).select(
        F.col("id"),
        (F.col("id") % 8).cast("int").alias("cluster"),
        F.rand(2).alias("v"),
    )
    _record(spark)
    rep = append_versioned(batch, root)
    ops = _store_level(_ops(spark))
    assert rep["appended_files"] >= 1
    assert [p for op, p in ops if op == "rename"] == []
    assert _dir_lists(ops, "/data/g000000") == []
    assert [p for op, p in ops if op == "open" and "/data/g000000" in p] == []
    assert read_versioned(spark, root).count() == df.count() + 50


def test_versioned_replace_op_budget(spark, vstore):
    """Replace (the rename-free whole-store swap) has the same budget
    as append: new generation + manifest only, zero renames, zero
    prior-generation reads — the superseded generation is simply no
    longer referenced and waits for vacuum."""
    from sqlite_vector_spark.versioned import read_versioned, replace_versioned

    root, _ = vstore
    repl = spark.range(500, 530).select(
        F.col("id"),
        (F.col("id") % 8).cast("int").alias("cluster"),
        F.rand(3).alias("v"),
    )
    _record(spark)
    rep = replace_versioned(repl, root)
    ops = _store_level(_ops(spark))
    assert rep["files"] >= 1
    assert [p for op, p in ops if op == "rename"] == []
    assert _dir_lists(ops, "/data/g000000") == []
    assert [p for op, p in ops if op == "open" and "/data/g000000" in p] == []
    assert read_versioned(spark, root).count() == 30


def test_microbatch_epoch_planning_lists_bounded(spark, tmp_path):
    """SCALE.md:1365-1375 claim (the r13 reasoned decline kept its
    bound on the books): planning a micro-batch read over an
    epoch-structured state costs at most #epochs + 1 directory LISTs
    — one of the root to discover epochs, one per epoch dir to find
    its files — with compaction bounding #epochs."""
    from sqlite_vector_spark.streaming.scoring import _epoch_ids

    root = f"mock:{tmp_path}/state/bands"
    n_epochs = 4
    for e in range(n_epochs):
        spark.range(20).select(
            F.col("id"), F.lit(e).alias("epoch_src")
        ).coalesce(1).write.parquet(f"{root}/epoch={e}")

    _record(spark)
    eps = _epoch_ids(root, spark=spark)
    # planning = building the file index over the epoch dirs (schema
    # resolution forces it; no job runs)
    df = spark.read.parquet(*[f"{root}/epoch={e}" for e in eps])
    _ = df.schema
    ops = _ops(spark)
    assert eps == list(range(n_epochs))
    walks = _dir_lists(ops, "/state/")
    assert len(walks) <= n_epochs + 1, walks


@pytest.mark.slow
def test_stream_takedown_renames_bounded_to_epoch_dirs(spark, tmp_path):
    """Streaming takedown swap budget: every store-level rename moves
    an EPOCH-level directory (epoch=N or its __pre_delete/__deleting
    retained twin) — never a tier root or the state root, so
    rename-as-copy cost on an object store is bounded by one epoch
    dir per swap (SCALE.md's bounded-rename claim, asserted)."""
    from sqlite_vector_spark.operators.dedup import (
        connected_components_min_label,
        jaccard_pairs,
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from sqlite_vector_spark.sinks import write_params_sidecar, write_partitioned
    from sqlite_vector_spark.streaming.scoring import takedown_stream_state

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" extra{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = f"mock:{tmp_path}/state"
    halves = [docs.where(F.col("doc_id") % 2 == e) for e in (0, 1)]
    for e, part in enumerate(halves):
        write_partitioned(
            lsh_band_keys(minhash_signatures(part, "doc_id", "text")),
            f"{state}/bands/epoch={e}", "band",
        )
        part.write.parquet(f"{state}/docs/epoch={e}")
    edges = (
        jaccard_pairs(lsh_candidate_pairs(docs, "doc_id", "text"), docs, "doc_id", "text")
        .where(F.col("jaccard") >= 0.8).select("a", "b")
    )
    connected_components_min_label(edges).write.parquet(f"{state}/labels/epoch=1")
    write_params_sidecar(state, {"id_col": "doc_id", "text_col": "text", "jaccard_min": 0.8})

    _record(spark)
    rep = takedown_stream_state(spark, state, [2, 7])
    ops = _store_level(_ops(spark))
    assert rep and any(v for v in rep.values())

    # an epoch dir, a retained/staging twin, or a single PARTITION dir
    # within one (the partitioned tier swaps at band granularity —
    # strictly finer than the epoch bound the claim promises)
    epoch_dir = re.compile(
        r".*/(bands|docs|labels)/epoch=\d+(__pre_delete|__deleting)?"
        r"(/[A-Za-z0-9_]+=[^/]+)?$"
    )
    renames = [p for op, p in ops if op == "rename"]
    bad = [p for p in renames if not epoch_dir.match(p)]
    assert not bad, f"rename outside epoch-dir granularity: {bad}"
    # and the deleted ids are really gone from the mirrors
    from sqlite_vector_spark.sinks import read_store

    assert read_store(spark, f"{state}/docs/epoch=0").where(
        F.col("doc_id").isin([2, 7])).count() == 0
