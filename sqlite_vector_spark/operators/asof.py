"""As-of (point-in-time) join — the time-series operator Spark lacks.

For every left row, find the most recent right row with
``right.ts <= left.ts`` within the same partition key (user, symbol,
sensor, ...). The reference engine has no as-of operator; this is one
of the beyond-reference operators a training-data / event pipeline
needs (feature lookups "as of" label time, last-touch attribution).

Spark-first shape — NOT a range join and NOT a per-key collect:

    union(left tagged 1, right tagged 0)
      -> single Exchange on the partition key
      -> Window last(struct(carry...), ignorenulls) ordered by (ts, tag, id)
      -> filter back to left rows, project struct fields

One shuffle total, no join node at all: the classic sorted-merge
as-of reduces to a carry-forward window over the interleaved stream.
At 100 TB both inputs shuffle once on the same key and the window is
a streaming pass per partition — the same cost profile as sessionize.
Ties: a right row at exactly left.ts IS visible (tag 0 sorts before
tag 1); multiple right rows on one timestamp resolve to the largest
id (deterministic, id-tiebroken ordering).

DuckDB mirrors this with an identical UNION ALL + LAST_VALUE IGNORE
NULLS window (oracle.asof_join_events_q), so the operator is
hash-gated despite ASOF JOIN itself being engine-specific syntax.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    id_col: str,
    carry: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: left columns plus, for each left row, the ``carry``
    columns of the matched right row (NULL when none qualifies).

    ``direction="backward"`` (default): most recent right row with
    ``right.ts <= left.ts``; same-ts ties resolve to the LARGEST right
    id. ``direction="forward"``: earliest right row with
    ``right.ts >= left.ts``; ties resolve to the SMALLEST right id.
    ``tolerance``: maximum |left.ts − right.ts| in ts units — a match
    farther away is nulled out (pandas merge_asof semantics). The
    tolerance check needs the right ts, so ``ts`` is always carried
    internally.

    ``on``: equality partition key present in both inputs.
    ``ts``: ordering column (bigint epoch or timestamp), both inputs.
    ``id_col``: unique id in both inputs — the deterministic tiebreak.
    ``carry``: right-side columns to attach, renamed ``<col><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    carry_all = list(dict.fromkeys([*carry, ts] if tolerance is not None else carry))
    # ONE struct carried atomically with a single last(ignorenulls):
    # per-column carries would mix fields from DIFFERENT right rows
    # whenever a carry column holds NULL (last-non-null per column is
    # not last-row per column). F.struct of a right row is never NULL
    # itself, so ignorenulls skips exactly the interleaved left rows,
    # and every projected field comes from the same matched right row.
    carry_t = StructType([StructField(c, right.schema[c].dataType) for c in carry_all])
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_tag"),
        F.lit(None).cast(carry_t).alias("_carry"),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (on, ts, id_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c).alias(c) for c in carry_all]).alias("_carry"),
    )
    if direction == "backward":
        order = [F.col(ts).asc(), F.col("_tag").asc(), F.col(id_col).asc()]
    else:
        # descending scan: the carried right row is the smallest ts
        # >= left.ts; _tag still ascends so an equal-ts right row
        # sorts before the left row and IS visible
        order = [F.col(ts).desc(), F.col("_tag").asc(), F.col(id_col).desc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        *lcols,
        "_tag",
        F.last("_carry", ignorenulls=True).over(w).alias("_carry"),
    )
    out = carried.where(F.col("_tag") == 1).select(
        *lcols,
        *[F.col("_carry")[c].alias(f"{c}{suffix}") for c in carry_all],
    )
    if tolerance is not None:
        gap = F.abs(F.col(ts) - F.col(f"{ts}{suffix}"))
        within = gap <= F.lit(tolerance)
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in carry_all
            ],
        )
        if ts not in carry:
            out = out.drop(f"{ts}{suffix}")
    return out
