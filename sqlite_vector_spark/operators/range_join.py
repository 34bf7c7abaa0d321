"""Point-in-interval (range) join — the time-window join Spark lacks.

For every left row, find the right rows whose ``[start, end]``
interval contains the left timestamp, within an equality partition key
(user, device, symbol). Spark plans a raw inequality join as a
broadcast-nested-loop / cartesian product — O(|L|·|R|) per key and a
driver OOM at scale. The reference engine has no interval operator at
all; this is one of the beyond-reference operators an event pipeline
needs (session attribution, maintenance-window tagging, price-epoch
lookups).

Spark-first shape — bucketed equi-join:

    right:  explode each interval to the W-width buckets it covers
    left:   each point computes its single bucket
    join:   equi-join on (key, bucket)  ->  exact BETWEEN filter

The join becomes a plain hash/sort-merge equi-join on (key, bucket),
so it shuffles once per side and scales like any other keyed join.
Candidate volume is Σ_r (span_r / W + 1) — bounded by interval length,
not by |L|·|R|. Because a left POINT has exactly one bucket and an
interval covers each bucket at most once, every qualifying (left,
right) pair appears exactly once: no dedup pass is needed.

Pick ``bucket_width`` near the typical interval span: too small
explodes the right side, too large inflates candidates. Either choice
affects only performance, never results.

DuckDB mirrors the semantics with a plain BETWEEN join (the oracle
does not need the bucket rewrite), so gate entries hash-match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    start: str,
    end: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to the right intervals containing them.

    ``on``: equality key in both inputs. ``ts``: left point column
    (integer units). ``start``/``end``: right interval bounds
    (inclusive, same units). ``how``: "inner" or "left" (unmatched
    left rows kept with NULL right columns). Right columns other than
    ``on`` must not collide with left column names.

    Output: all left columns plus the right columns (minus ``on``).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    collisions = (set(left.columns) & set(right.columns)) - {on}
    if collisions:
        raise ValueError(f"right columns collide with left: {sorted(collisions)}")
    if "_bucket" in left.columns or "_bucket" in right.columns:
        raise ValueError("_bucket is reserved by range_join; rename the input column")
    w = F.lit(int(bucket_width)).cast("bigint")
    # F.floor handles negative units correctly (floor, not truncate)
    lb = left.withColumn("_bucket", F.floor(F.col(ts).cast("bigint") / w).cast("bigint"))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("bigint") / w).cast("bigint"),
                F.floor(F.col(end).cast("bigint") / w).cast("bigint"),
            )
        ),
    )
    contained = (F.col(ts).cast("bigint") >= F.col(start).cast("bigint")) & (
        F.col(ts).cast("bigint") <= F.col(end).cast("bigint")
    )
    if how == "inner":
        return lb.join(rb, on=[on, "_bucket"], how="inner").where(contained).drop("_bucket")
    # left join: containment must live IN the join condition so
    # unmatched left rows survive with NULL right columns
    l, r = lb.alias("_l"), rb.alias("_r")
    cond = (
        (F.col(f"_l.{on}") == F.col(f"_r.{on}"))
        & (F.col("_l._bucket") == F.col("_r._bucket"))
        & (F.col(f"_l.{ts}").cast("bigint") >= F.col(f"_r.{start}").cast("bigint"))
        & (F.col(f"_l.{ts}").cast("bigint") <= F.col(f"_r.{end}").cast("bigint"))
    )
    rcols = [c for c in right.columns if c != on]
    return l.join(r, cond, "left").select(
        *[F.col(f"_l.{c}") for c in left.columns],
        *[F.col(f"_r.{c}") for c in rcols],
    )
