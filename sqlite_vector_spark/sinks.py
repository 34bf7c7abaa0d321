"""Table sinks: plain/partitioned/bucketed Parquet writers.

The reference's only sink is the quantized shadow table insert
(sqlite-vector.c:1282-1327) — covered by operators.quantize. This
module adds the Spark-native sink layer a pipeline needs:

- ``write_partitioned``: directory partitioning -> planning-time
  partition pruning for filters on the partition key (the IVF store
  uses this via partitionBy('cluster')).
- ``write_bucketed``: hash-bucketed + sorted table -> joins and
  aggregations on the bucket key need NO exchange on either side
  (proved in tests/test_sinks.py). At 100 TB, bucketing both fact
  tables on the join key turns the nightly join from a full shuffle
  of the corpus into a zip of pre-sorted buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_col: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed, per-bucket-sorted Parquet table.

    Bucket metadata lives in the session catalog (saveAsTable is
    required — plain .parquet() cannot record bucketing), so read the
    result back with ``spark.table(table)``.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def delete_ids(
    spark,
    path: str,
    ids,
    id_col: str = "id",
    partition_col: str | None = None,
    sort_within: list[str] | None = None,
) -> dict:
    """Hard-delete rows by id from a persisted parquet store — the
    lifecycle verb the append/compact family lacked (takedowns,
    licensing, right-to-be-forgotten). The reference's only delete
    path is a wholesale drop + recreate of the shadow table
    (sqlite-vector.c:1418-1427); this rewrites ONLY the partitions
    that actually hold the ids, preserving the store's layout:
    directory partitioning (so pruning keeps working), payload /
    include_cols columns (the row is rewritten whole), and the
    within-file sort (pass ``sort_within``, e.g. ['bv'] for the MIH
    band store). Quantization/codebook parameters are intentionally
    NOT re-fit — same frozen-params contract as the append family;
    re-fit means rebuild.

    ``ids``: an iterable of ids or a single-column DataFrame. The id
    set is broadcast (a takedown batch is bounded, like the append
    family's batch); the affected-partition probe is a column-pruned
    scan of (id_col, partition_col) only.

    Shape: for a partitioned store, (1) semi-join finds the affected
    partition directories (an id-keyed store touches one; a band
    store touches every band — the probe discovers either), (2) only
    those partitions are re-read (planning-time pruning on the isin
    filter), anti-joined against the broadcast id set, and rewritten,
    (3) each affected directory is swapped via os.rename — untouched
    partitions are never read or written. A partition whose rows are
    all deleted is removed. Unpartitioned stores rewrite wholesale
    (same swap as compact_store). Local filesystem only, single
    maintenance writer — the same concurrency contract as
    compact_store; the superseded data is retained at
    ``<path>__pre_delete`` until the next delete.

    Returns {"deleted_rows", "rows_after", "partitions_rewritten"}.
    ``rows_after`` is the store total for an unpartitioned rewrite
    (partitions_rewritten = -1) but only the REWRITTEN partitions'
    remainder for a partitioned one — a full-store count on every
    takedown would read 100 TB to report a number nobody needs.
    """
    import os
    import shutil

    if isinstance(ids, DataFrame):
        ids_df = ids.select(F.col(ids.columns[0]).cast("bigint").alias("_del_id"))
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in ids], "_del_id bigint"
        )
    ids_df = ids_df.distinct().localCheckpoint(eager=True)
    df = spark.read.parquet(path)
    if not all(f.startswith("file:") or f.startswith("/") for f in df.inputFiles()):
        raise ValueError(
            "delete_ids supports local-filesystem stores only (os.rename swap); "
            "for object stores, rewrite to a new prefix and flip the pointer instead"
        )
    key = F.col(id_col).cast("bigint")
    root = os.path.abspath(path.rstrip("/"))
    old = root + "__pre_delete"
    tmp = root + "__deleting"

    if partition_col is None:
        before = df.count()
        kept = df.join(
            F.broadcast(ids_df), key == F.col("_del_id"), "left_anti"
        )
        if sort_within:
            kept = kept.sortWithinPartitions(*sort_within)
        kept.write.mode("overwrite").parquet(tmp)
        out = spark.read.parquet(tmp)
        after = out.count()
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(root, old)
        os.rename(tmp, root)
        spark.catalog.refreshByPath(path)
        return {
            "deleted_rows": before - after,
            "rows_after": after,
            "partitions_rewritten": -1,
        }

    # (1) column-pruned probe: which partition directories hold ids?
    # (hit is bounded by |ids| x rows-per-id, checkpointed so the
    # probe scan runs once for the dir set and the deleted count)
    hit = (
        df.select(key.alias("_k"), F.col(partition_col))
        .join(F.broadcast(ids_df), F.col("_k") == F.col("_del_id"), "left_semi")
        .localCheckpoint(eager=True)
    )
    affected = [r[0] for r in hit.select(partition_col).distinct().collect()]
    if not affected:
        return {"deleted_rows": 0, "rows_after": None, "partitions_rewritten": 0}
    deleted = hit.count()
    # (2) pruned re-read of ONLY the affected partitions. Map each
    # affected VALUE to its on-disk directory by percent-decoding the
    # actual root listing (how Spark encoded it), and refuse if any
    # value has no directory — swapping a guessed name is how a store
    # silently loses a partition (same refuse-up-front contract as
    # compact_store's snapshot stat gate).
    from urllib.parse import unquote

    pruned = df.where(F.col(partition_col).isin(affected))
    prefix = f"{partition_col}="
    by_value = {
        unquote(d[len(prefix):]): d
        for d in os.listdir(root)
        if d.startswith(prefix) and os.path.isdir(os.path.join(root, d))
    }
    unmatched = [v for v in affected if str(v) not in by_value]
    if unmatched:
        raise RuntimeError(
            f"delete_ids: no partition directory found for value(s) "
            f"{unmatched[:3]!r} under {root!r}; aborting before any rewrite"
        )
    part_dirs = {by_value[str(v)] for v in affected}
    before = pruned.count()
    kept = pruned.join(F.broadcast(ids_df), key == F.col("_del_id"), "left_anti")
    kept = kept.repartition(max(1, len(part_dirs)), partition_col)
    if sort_within:
        kept = kept.sortWithinPartitions(partition_col, *sort_within)
    kept.write.partitionBy(partition_col).mode("overwrite").parquet(tmp)
    # (3) per-directory swap: superseded dirs retained under __pre_delete
    if os.path.exists(old):
        shutil.rmtree(old)
    os.makedirs(old)
    for d in sorted(part_dirs):
        os.rename(os.path.join(root, d), os.path.join(old, d))
        src = os.path.join(tmp, d)
        if os.path.isdir(src):  # absent == every row of d was deleted
            os.rename(src, os.path.join(root, d))
    shutil.rmtree(tmp)
    spark.catalog.refreshByPath(path)
    return {
        "deleted_rows": deleted,
        "rows_after": before - deleted,  # within the rewritten partitions
        "partitions_rewritten": len(part_dirs),
    }


def _detect_partition_col(root: str) -> str | None:
    """Directory-partitioned parquet stores carry their partition
    column in the layout (``col=value`` dirs); detect it so cascade
    deletes prune whatever layout each store was written with."""
    import os

    for d in os.listdir(root):
        if "=" in d and os.path.isdir(os.path.join(root, d)):
            return d.split("=", 1)[0]
    return None


def delete_ids_everywhere(spark, catalog, table: str, column: str, ids, id_col: str = "id") -> dict:
    """One takedown call, every derived store maintained: apply
    delete_ids to EACH store the catalog registers for
    ``table.column`` — the quantized replica, the IVF store, the
    PQ/IVF-PQ code table, the BQ code table, and the MIH band store —
    so a right-to-be-forgotten batch cannot leave an id queryable
    through a tier the caller forgot. Partition layout is detected
    from each store's directory structure (cluster/bucket/b); the MIH
    store additionally restores its bv sort. The base table itself is
    the caller's (its format is not ours to rewrite); this maintains
    every index derived FROM it. Returns {store_name: delete_ids
    report} for the stores that exist."""
    ctx = catalog.get(table, column)
    reports: dict = {}
    stores = [
        ("quantized", ctx.quantized_path, None),
        ("ivf", ctx.ivf_path, None),
        ("pq", ctx.pq_path, None),
        ("bq", ctx.bq_path, None),
        ("mih", ctx.mih_path, ["bv"]),
    ]
    for name, path, sort_within in stores:
        if path is None:
            continue
        pcol = _detect_partition_col(path)
        reports[name] = delete_ids(
            spark, path, ids, id_col=id_col,
            partition_col=pcol, sort_within=sort_within,
        )
    return reports


def _uri_to_local(uri: str) -> str:
    """``file:`` URI from DataFrame.inputFiles() -> decoded local
    path. Spark percent-encodes specials (space, %, non-ASCII string
    partition values) in the URI form; os.walk sees the raw names."""
    from urllib.parse import unquote

    return unquote(uri.removeprefix("file:"))


def compact_store(
    spark,
    path: str,
    partition_col: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: list[str] | None = None,
) -> dict:
    """Bin-pack a parquet store's small files (post-append maintenance).

    Every append path (quantize update, ivf/pq/bq store append, MIH
    band append) adds new files per batch; after many increments a
    partition holds hundreds of small files and scan planning + open
    costs dominate. Compaction rewrites the store with files sized
    toward ``target_file_bytes``, preserving the directory
    partitioning (so partition pruning keeps working) and optionally
    the within-file sort (pass ``sort_within`` to restore row-group
    min/max skipping, e.g. ['bv'] for the MIH band store).

    Concurrency contract (local filesystem only — the swap uses
    os.rename, so remote schemes are rejected up front):
    - Run from the single maintenance writer, between ingest triggers
      (e.g. after an availableNow stream drains). Files a concurrent
      writer commits AFTER the snapshot listing are still SALVAGED:
      post-swap, anything in the superseded layout that was not in
      the snapshot is moved into the new layout before returning.
      NB: salvage cannot distinguish a late COMMIT from a file an
      aborted write left behind — for a streaming file-sink store
      (whose _spark_metadata manifest is what excludes aborted
      files, and which compaction supersedes), compact only after a
      clean drain.
    - A reader racing the swap itself can observe a brief missing
      path between the two renames (directory swaps cannot be made
      single-rename-atomic without a versioned-path indirection like
      stats_store's vN scheme) — retry on AnalysisException. A reader
      that already resolved the old file list keeps working: the
      superseded layout is retained at ``<path>__pre_compact`` until
      the NEXT compaction; drop it once readers drain.

    Returns {"files_before", "files_after", "rows", "salvaged_files"}.
    """
    import os

    df = spark.read.parquet(path)
    snapshot = df.inputFiles()
    if not all(f.startswith("file:") or f.startswith("/") for f in snapshot):
        raise ValueError(
            "compact_store supports local-filesystem stores only (os.rename swap); "
            "for object stores, rewrite to a new prefix and flip the pointer instead"
        )
    # inputFiles() returns URIs: percent-decode them to filesystem
    # paths (a space / % / string partition value URL-encodes, and a
    # raw-name snap_rel would then match NOTHING in _salvage_late_files
    # — salvage would re-add EVERY pre-compaction file and double the
    # store). Refuse up front if any decoded path fails stat: salvage
    # bookkeeping keyed on an unverifiable snapshot is how silent
    # duplication happens.
    snapshot_paths = [_uri_to_local(f) for f in snapshot]
    missing = [p for p in snapshot_paths if not os.path.isfile(p)]
    if missing:
        raise RuntimeError(
            f"compact_store: {len(missing)} snapshot file(s) cannot be stat'd "
            f"after URI decode (e.g. {missing[0]!r}); aborting before any "
            "rewrite — the salvage pass cannot be made reliable for this store"
        )
    files_before = len(snapshot)
    rows = df.count()
    # size from the CURRENT files (bytes on disk ~ post-compression)
    total_bytes = 0
    for p in snapshot_paths:
        try:
            total_bytes += os.path.getsize(p)
        except OSError:
            pass  # raced a concurrent delete after the stat gate
    if total_bytes == 0:
        # stat failed (e.g. URL-encoded names): keep parallelism
        # rather than collapsing a possibly huge store into one file
        target_files = max(1, files_before // 8)
    else:
        target_files = max(1, int(total_bytes // target_file_bytes) + 1)
    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__pre_compact"
    if partition_col is not None:
        # one write job; files-per-partition bounded by repartitioning
        # on the partition key (rows of one key land in one task)
        w = df.repartition(target_files, partition_col)
        if sort_within:
            w = w.sortWithinPartitions(partition_col, *sort_within)
        w.write.partitionBy(partition_col).mode("overwrite").parquet(tmp)
    else:
        w = df.repartition(target_files)
        if sort_within:
            w = w.sortWithinPartitions(*sort_within)
        w.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    if out.count() != rows:
        raise RuntimeError("compaction row-count mismatch — store left untouched")
    files_after = len(out.inputFiles())
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)  # previous compaction's retained layout
    root = path.rstrip("/")
    os.rename(root, old)
    os.rename(tmp, root)
    root_abs = os.path.abspath(root)
    snap_rel = {os.path.relpath(p, root_abs) for p in snapshot_paths}
    salvaged = _salvage_late_files(root, old, snap_rel)
    # drop this session's cached file listings for the swapped path —
    # Spark's shared FileStatusCache otherwise serves the PRE-swap
    # listing to the next read and it fails on the vanished files
    spark.catalog.refreshByPath(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
        "salvaged_files": salvaged,
    }


def _salvage_late_files(root: str, old: str, snap_rel: set) -> int:
    """Move data files a concurrent writer added AFTER the compaction
    snapshot (present in the superseded layout ``old`` but not in the
    snapshot listing) into the new layout at ``root``. Spark part-
    file names are UUID-unique, so no collisions. Marker files
    (_SUCCESS, CRC) AND metadata directories (a streaming file-sink's
    ``_spark_metadata`` log — its manifest lists the pre-compaction
    files, so copying it over would point reads at vanished paths;
    the compacted store intentionally reads as a plain parquet
    directory) are skipped. Returns the number salvaged."""
    import os

    salvaged = 0
    for dirpath, dirs, files in os.walk(old):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fname in files:
            if fname.startswith(("_", ".")):
                continue
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, old)
            if rel not in snap_rel:
                dest = os.path.join(root, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.rename(full, dest)
                salvaged += 1
    return salvaged
