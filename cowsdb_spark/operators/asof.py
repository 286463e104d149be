"""ASOF join (ClickHouse J6, SURVEY §2.3): for each left row, the
latest right row with the same key and right.ts <= left.ts.

No native Spark operator; this is the union+window rewrite (SURVEY
§2.3 J6): tag both sides, union on (key, ts), and carry the last
right value forward with ``last(..., ignorenulls)`` over an ordered
window per key. ONE shuffle on the join key — same cost as the
equi-join ClickHouse does — and no range-explosion, so it holds at
100 TB (the window is per-key, AQE handles skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    rsuffix: str = "_r",
) -> DataFrame:
    """Columns out: all left columns + right's value columns (nulls
    when no right row at-or-before; names colliding with left get
    ``rsuffix``). direction='backward' matches CH ASOF JOIN's
    default (>= semantics on the right timestamp)."""
    if direction != "backward":
        raise NotImplementedError("only backward as-of implemented")
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    # right rows sort before left rows at equal ts (_is_left asc) so
    # an exactly-equal right timestamp IS visible to the left row.
    u = l_tagged.unionByName(r_tagged)
    w = W.partitionBy(on).orderBy("_t", "_is_left").rowsBetween(W.unboundedPreceding, 0)
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in rcols
        ],
    ).filter(F.col("_is_left") == 1)
    return filled.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[
            F.col(f"_f_{c}").alias(c if c not in left.columns else f"{c}{rsuffix}")
            for c in rcols
        ],
    )
