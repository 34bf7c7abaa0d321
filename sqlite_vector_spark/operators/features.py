"""Feature-engineering operators over keyed event streams.

``trailing_agg`` is the load-bearing primitive: per-key trailing
time-window (count, fixed-point sum) computed as a PREFIX DIFFERENCE
instead of a bounded RANGE window frame. Spark re-aggregates bounded
RANGE frames from scratch for every row, which turns a power key with
F in-frame rows into O(rows x F) work — measured 139 s for a single
200k-row key at a ~10k-row frame, vs 2.2 s for this formulation
(tools/window_skew_probe.py, SCALE.md). Results are bit-identical:
trailing aggregates become differences of exact integer cumulatives.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def trailing_agg(
    ev: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    win: int,
    id_col: str,
    scale: float = 10_000.0,
) -> DataFrame:
    """Per-``key_col`` trailing-window count and fixed-point sum of
    ``value_col`` over the CLOSED window ``[ts - win, ts]`` (probe at
    ``ts - win - 1``, so an event exactly ``win`` old still counts —
    the RANGE-frame contract the oracle and the brute-force test pin),
    one output row per input row.

    Returns (id, key, ts, n_win, sum_win).

    Shape: every event row (kind 0) unions with a boundary-probe row
    at ``ts - win - 1`` (kind 1); one per-key sorted cumulative pass
    over data rows only — the sort key (ts, kind, id) places a probe
    at a tie timestamp AFTER the data rows it must include — then a
    per-id reduce takes cum(event) - cum(probe). Two linear shuffles,
    cost independent of the frame width and linear in the hottest
    key's row count.
    """
    if win <= 0:
        raise ValueError(f"trailing window must be positive, got {win}")
    base = ev.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(key_col).cast("bigint").alias("key"),
        F.col(ts_col).cast("bigint").alias("ts"),
        F.round(F.col(value_col) * F.lit(scale)).cast("decimal(38,0)").alias("fx"),
    )
    data = base.select(
        "id", "key", F.col("ts").alias("t"), F.lit(0).alias("kind"),
        F.lit(1).cast("bigint").alias("one"), "fx", "ts",
    )
    probe = base.select(
        "id", "key", (F.col("ts") - F.lit(win) - F.lit(1)).alias("t"),
        F.lit(1).alias("kind"), F.lit(0).cast("bigint").alias("one"),
        F.lit(0).cast("decimal(38,0)").alias("fx"), "ts",
    )
    u = data.unionByName(probe)
    wcum = (
        Window.partitionBy("key")
        .orderBy(F.col("t").asc(), F.col("kind").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    raw = u.select(
        "id", "key", "ts", "kind", "t",
        F.sum("one").over(wcum).alias("cn0"),
        F.sum("fx").over(wcum).alias("cf0"),
    )
    # RANGE-contract tie handling: an event at a tied (key, ts) must
    # count ALL its timestamp peers, not just lower-id ones — lift each
    # row's cumulative to the LAST cumulative in its (key, t, kind)
    # peer group (id order). last, not max: the cumulative sum is not
    # monotone once a tied peer carries a NEGATIVE value, so max(cf0)
    # would stop before it. key-partitioning already satisfies the
    # peer clustering, so this window adds a sort but NO extra
    # exchange.
    wpeer = (
        Window.partitionBy("key", "t", "kind")
        .orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = raw.select(
        "id", "key", "ts", "kind",
        F.last("cn0").over(wpeer).alias("cn"),
        F.last("cf0").over(wpeer).alias("cf"),
    )
    return cum.groupBy("id", "key", "ts").agg(
        (
            F.max(F.when(F.col("kind") == 0, F.col("cn")))
            - F.coalesce(F.max(F.when(F.col("kind") == 1, F.col("cn"))), F.lit(0))
        ).cast("bigint").alias("n_win"),
        (
            (
                F.max(F.when(F.col("kind") == 0, F.col("cf")))
                - F.coalesce(F.max(F.when(F.col("kind") == 1, F.col("cf"))), F.lit(0).cast("decimal(38,0)"))
            ).cast("double") / F.lit(scale)
        ).alias("sum_win"),
    )
