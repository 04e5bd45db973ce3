"""As-of join: for each left row, the nearest right row by timestamp.

Spark has no built-in as-of join. The scalable formulation here avoids the
naive range-join + dedup (which explodes to |L|·|R| per key): UNION the two
sides, sort within key partitions by (ts, side), and carry the most recent
(or next, for direction="forward") right-side attributes across with
last/first(ignorenulls) over a one-sided window. One shuffle on the key, no
join blow-up, works at any key cardinality and is skew-tolerant under AQE.

Parity with pandas merge_asof / kdb aj: ``direction`` ("backward" = latest
right ts <= left ts, "forward" = earliest right ts >= left ts; equal
timestamps match in both) and ``tolerance`` (maximum |gap| in seconds —
matches farther away are nulled, the left row is kept).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_matched",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join; all left rows survive, unmatched get NULLs."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"

    # side ordering makes equal timestamps match in either direction:
    # backward → right rows sort before left at equal ts (last() sees them);
    # forward → right rows sort after left at equal ts (first() sees them).
    left_side, right_side = (1, 0) if back else (0, 1)

    carry_cols = list(right_cols) + ["__rts"]
    lhs = left.withColumn("__side", F.lit(left_side)).withColumn("__ts", F.col(left_ts))
    rhs_proj = [F.col(on), F.col(right_ts).alias("__ts"), F.lit(right_side).alias("__side")]
    rhs_proj += [F.col(c).alias(f"__r_{c}") for c in right_cols]
    rhs_proj += [F.col(right_ts).alias("__r___rts")]
    rhs = right.select(*rhs_proj)

    for c in right_cols:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(rhs.schema[f"__r_{c}"].dataType))
    lhs = lhs.withColumn("__r___rts", F.lit(None).cast(rhs.schema["__r___rts"].dataType))
    for c in left.columns:
        if c != on:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs)
    base = Window.partitionBy(on).orderBy(F.col("__ts"), F.col("__side"))
    if back:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    carried: list[Column] = [
        pick(f"__r_{c}").alias(f"{c}{suffix}") for c in carry_cols
    ]
    out = unioned.select("*", *carried).filter(F.col("__side") == left_side)

    if tolerance is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - F.col(f"__rts{suffix}").cast("double")
        )
        within = gap <= F.lit(float(tolerance))
        for c in carry_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(within, F.col(f"{c}{suffix}")),
            )

    return out.drop(
        "__side", "__ts", f"__rts{suffix}",
        *[f"__r_{c}" for c in carry_cols],
    )
