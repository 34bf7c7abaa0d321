"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no event-time streaming at all (SURVEY.md §1.1 —
its "*_stream" TVFs are pipelined cursors), so this module is part of
the Spark-native extension layer: the stateful pieces a continuous
training-data pipeline needs on top of the stateless scoring in
``streaming.scoring``.

- ``streaming_first_seen``: cross-micro-batch exact dedup. Emits a row
  the first time its key (e.g. a document fingerprint from
  functions.text.fingerprint) is ever seen; duplicates in later
  batches are dropped. State = one empty marker per distinct key,
  partitioned by the shuffle on the group key — at 100 TB/day this is
  the standard dedup-at-ingest shape: state size is bounded by
  distinct keys, and the optional TTL (timeout) bounds it in time.
- ``streaming_topk``: incremental kNN result maintenance. Keeps the
  best k (distance, id) per query id across batches — the streaming
  generalization of the reference's k-slot arrays
  (sqlite-vector.c:2022-2069): same replace-the-max contract, but the
  slots live in the state store and survive across triggers. Emits the
  full refreshed top-k for every query whose set changed (update mode).

Both operators keep O(keys)/O(k·queries) state — no unbounded growth.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    stream: DataFrame,
    key_col: str,
    id_col: str = "id",
) -> DataFrame:
    """Emit (key, id) the first time ``key_col`` appears in the stream;
    all later occurrences are suppressed. Within a batch the smallest
    id wins (deterministic). Output mode: update/append."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return iter(())
        best = None
        for pdf in pdfs:
            m = pdf[id_col].min()
            best = m if best is None else min(best, m)
        state.update((1,))
        return iter([pd.DataFrame({"key": [key[0]], "id": [best]})])

    return (
        stream.select(key_col, id_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType="key bigint, id bigint",
            stateStructType="seen int",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_topk(
    stream: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "id",
    dist_col: str = "distance",
) -> DataFrame:
    """Maintain the k smallest (distance, id) per query across
    micro-batches; emit the refreshed top-k for each updated query.
    Tie-break: ascending id (engine-wide contract, SURVEY §2.3)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, dists = state.get
            cur = pd.DataFrame({id_col: list(ids), dist_col: list(dists)})
        else:
            cur = pd.DataFrame({id_col: [], dist_col: []})
        batch = pd.concat([cur] + [pdf[[id_col, dist_col]] for pdf in pdfs])
        top = (
            batch.sort_values([dist_col, id_col], ascending=[True, True])
            .drop_duplicates(subset=[id_col])
            .head(k)
        )
        state.update((top[id_col].astype("int64").tolist(), top[dist_col].astype("float64").tolist()))
        out = top.copy()
        out.insert(0, "rank", range(1, len(top) + 1))
        out.insert(0, qid_col, key[0])
        return iter([out])

    return (
        stream.select(qid_col, id_col, dist_col)
        .groupBy(qid_col)
        .applyInPandasWithState(
            fn,
            outputStructType=f"{qid_col} bigint, rank int, {id_col} bigint, {dist_col} double",
            stateStructType="ids array<bigint>, dists array<double>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_trailing_counts(
    stream: DataFrame,
    win_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Per-key trailing-window (count, sum) maintained ACROSS
    micro-batches — the ingest-time form of
    operators/features.trailing_agg (rate limiting, abuse counters,
    live feature serving). For every arriving event, emits the count
    and value sum of that key's events in the CLOSED window
    ``[ts - win_us, ts]`` — the same RANGE-frame contract as the batch
    trailing_agg and its oracle — including events from earlier
    batches.

    State per key = only the events still inside the window (older
    entries are pruned on every batch), so state is bounded by
    win x peak-rate per key, not by stream length. Within a batch,
    events process in (ts, natural) order. Late-arrival semantics are
    watermark-style: state older than (max seen ts - win) is pruned,
    so an event arriving later than that horizon counts only the
    unpruned history — the standard streaming completeness trade."""
    if win_us <= 0:
        raise ValueError(f"trailing window must be positive micros, got {win_us}")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_hist, v_hist = state.get
            ts_hist, v_hist = list(ts_hist), list(v_hist)
        else:
            ts_hist, v_hist = [], []
        chunks = list(pdfs)
        if not chunks:
            return iter(())
        rows = pd.concat(chunks)
        if rows.empty:
            return iter(())
        rows = rows.sort_values(ts_col, kind="mergesort")
        out_ts, out_n, out_s = [], [], []
        ts_arr = rows[ts_col].astype("int64").tolist()
        v_arr = rows[value_col].astype("float64").tolist()
        i = 0
        while i < len(ts_arr):
            # RANGE-contract ties: append ALL rows at this timestamp
            # BEFORE emitting any of their counts, so tied peers see
            # each other (same semantics as the batch trailing_agg)
            j = i
            while j < len(ts_arr) and ts_arr[j] == ts_arr[i]:
                ts_hist.append(int(ts_arr[j]))
                v_hist.append(float(v_arr[j]))
                j += 1
            t = int(ts_arr[i])
            lo = t - win_us
            n = s4 = 0
            keep_ts, keep_v = [], []
            for ht, hv in zip(ts_hist, v_hist):
                if ht > t:  # a late event's view stops at its own ts
                    keep_ts.append(ht), keep_v.append(hv)
                    continue
                if ht >= lo:  # closed window: ht == t - win_us counts
                    n += 1
                    # fixed-point fold at scale 1e4, matching the batch
                    # trailing_agg's decimal(38,0) accumulation so the
                    # streaming==batch row equality holds to the bit.
                    # Rounding must be HALF_UP (away from zero on ties)
                    # like Spark's F.round on doubles — Python round()
                    # is banker's and diverges when hv*1e4 lands on .5
                    s4 += int(
                        Decimal(hv * 1e4).quantize(Decimal(1), rounding=ROUND_HALF_UP)
                    )
                    keep_ts.append(ht), keep_v.append(hv)
                # ht < lo: expired for this (and every later) event -> prune
            ts_hist, v_hist = keep_ts, keep_v
            for _ in range(i, j):
                out_ts.append(t), out_n.append(n), out_s.append(s4 / 1e4)
            i = j
        state.update((ts_hist, v_hist))
        out = pd.DataFrame(
            {
                key_col: [key[0]] * len(out_ts),
                ts_col: out_ts,
                "n_win": out_n,
                "sum_win": out_s,
            }
        )
        return iter([out])

    return (
        stream.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=f"{key_col} bigint, {ts_col} bigint, n_win bigint, sum_win double",
            stateStructType="ts array<bigint>, vals array<double>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
