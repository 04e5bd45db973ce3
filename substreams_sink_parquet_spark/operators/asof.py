"""As-of join: for each left row, the latest right row with ts <= left ts.

Spark has no built-in as-of join. The scalable formulation here avoids the
naive range-join + dedup (which explodes to |L|·|R| per key): UNION the two
sides, sort within key partitions by (ts, side), and carry the most recent
right-side attributes forward with last(ignorenulls) over an unbounded
preceding window. One shuffle on the key, no join blow-up, works at any key
cardinality and is skew-tolerant under AQE.
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
) -> DataFrame:
    """Left as-of join (ts >= right ts, equal timestamps match).

    Returns all left rows + for each, the right row attributes in
    ``right_cols`` of the latest right row with right_ts <= left_ts
    (NULL when none exists).
    """
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_proj = [F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side")]
    rhs_proj += [F.col(c).alias(f"__r_{c}") for c in right_cols]
    rhs = right.select(*rhs_proj)

    for c in right_cols:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(rhs.schema[f"__r_{c}"].dataType))
    for c in left.columns:
        if c != on:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs)
    # Right rows sort before left rows at equal ts so ts==ts matches (asof >=).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: list[Column] = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in right_cols
    ]
    return (
        unioned.select("*", *carried)
        .filter(F.col("__side") == 1)
        .drop("__side", "__ts", *[f"__r_{c}" for c in right_cols])
    )
