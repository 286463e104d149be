"""ASOF join (ClickHouse J6, SURVEY §2.3): for each left row, the
closest right row with the same key per the direction:

- ``backward`` (CH ASOF JOIN default, ``l.ts >= r.ts``): latest right
  row at-or-before the left timestamp;
- ``forward`` (``l.ts <= r.ts``): earliest right row at-or-after;
- ``nearest``: whichever of the two is closer in time (ties go
  backward, matching pandas ``merge_asof(direction='nearest')``).

No native Spark operator; this is the union+window rewrite (SURVEY
§2.3 J6): tag both sides, union on (key, ts), and carry the last
right value forward with ``last(..., ignorenulls)`` over an ordered
window per key. ONE shuffle on the join key — same cost as the
equi-join ClickHouse does — and no range-explosion, so it holds at
100 TB (the window is per-key, AQE handles skewed keys). ``nearest``
adds a second sort of the same hash partitions (descending window),
not a second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_num(col, dtype):
    """Orderable numeric image of a timestamp-ish column for distance
    comparison (numeric stays numeric; timestamp → epoch seconds;
    date → days since epoch)."""
    if isinstance(dtype, T.DateType):
        return F.unix_date(col).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # TIMESTAMP_NTZ can't numeric-cast directly (Spark 4); route
        # through timestamp (session TZ is UTC → same instant).
        return col.cast("timestamp").cast("double")
    return col.cast("double")


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
    when no right row in the direction's range; names colliding with
    left get ``rsuffix``). direction='backward' matches CH ASOF
    JOIN's default (>= semantics on the right timestamp)."""
    if direction not in ("backward", "forward", "nearest", "all"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    # carry the matched right timestamp too — needed for the nearest
    # distance comparison; cheap either way (one extra column)
    carry = rcols + ["__ts"]

    def rtype(c):
        return right.schema[right_ts if c == "__ts" else c].dataType

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(rtype(c)).alias(f"_r_{c}") for c in carry],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[
            F.col(right_ts if c == "__ts" else c).alias(f"_r_{c}")
            for c in carry
        ],
    )
    # right rows sort before left rows at equal ts (_is_left asc) so
    # an exactly-equal right timestamp IS visible to the left row —
    # in both window directions.
    u = l_tagged.unionByName(r_tagged)
    wb = (
        W.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy(on)
        .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )

    if direction == "backward":
        fills = {c: F.last(f"_r_{c}", ignorenulls=True).over(wb) for c in carry}
    elif direction == "forward":
        fills = {c: F.last(f"_r_{c}", ignorenulls=True).over(wf) for c in carry}
    elif direction == "all":
        # every direction from the ONE union+window pass (nearest
        # already sorts the same hash partitions both ways) — callers
        # that need backward+forward+nearest columns (t11) previously
        # paid three asof_join calls: 3 window exchanges, 2 re-joins
        # and 6 scans of the inputs for what this computes in 1
        # exchange. Per right value column c the output carries
        # c_back / c_fwd / c_near (left-colliding names get rsuffix
        # first, as below). Values are bit-identical to the three
        # single-direction calls: same window frames, same
        # ties-backward nearest rule.
        ts_type = right.schema[right_ts].dataType
        b = {c: F.last(f"_r_{c}", ignorenulls=True).over(wb) for c in carry}
        fwd = {c: F.last(f"_r_{c}", ignorenulls=True).over(wf) for c in carry}
        t_num = _as_num(F.col("_t"), left.schema[left_ts].dataType)
        b_dist = t_num - _as_num(b["__ts"], ts_type)
        f_dist = _as_num(fwd["__ts"], ts_type) - t_num
        use_b = b["__ts"].isNotNull() & (
            fwd["__ts"].isNull() | (b_dist <= f_dist)
        )
        filled = u.select(
            "*",
            *[b[c].alias(f"_fb_{c}") for c in carry],
            *[fwd[c].alias(f"_ff_{c}") for c in carry],
            *[
                F.when(use_b, b[c]).otherwise(fwd[c]).alias(f"_fn_{c}")
                for c in carry
            ],
        ).filter(F.col("_is_left") == 1)

        def oname(c):
            return c if c not in left.columns else f"{c}{rsuffix}"

        return filled.select(
            *[F.col("_lrow")[c].alias(c) for c in left.columns],
            *[F.col(f"_fb_{c}").alias(f"{oname(c)}_back") for c in rcols],
            *[F.col(f"_ff_{c}").alias(f"{oname(c)}_fwd") for c in rcols],
            *[F.col(f"_fn_{c}").alias(f"{oname(c)}_near") for c in rcols],
        )
    else:  # nearest: fill both ways, pick the closer timestamp
        ts_type = right.schema[right_ts].dataType
        b = {c: F.last(f"_r_{c}", ignorenulls=True).over(wb) for c in carry}
        fwd = {c: F.last(f"_r_{c}", ignorenulls=True).over(wf) for c in carry}
        t_num = _as_num(F.col("_t"), left.schema[left_ts].dataType)
        b_dist = t_num - _as_num(b["__ts"], ts_type)
        f_dist = _as_num(fwd["__ts"], ts_type) - t_num
        use_b = b["__ts"].isNotNull() & (
            fwd["__ts"].isNull() | (b_dist <= f_dist)
        )
        fills = {c: F.when(use_b, b[c]).otherwise(fwd[c]) for c in carry}

    filled = u.select(
        "*", *[fills[c].alias(f"_f_{c}") for c in carry]
    ).filter(F.col("_is_left") == 1)
    return filled.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[
            F.col(f"_f_{c}").alias(c if c not in left.columns else f"{c}{rsuffix}")
            for c in rcols
        ],
    )
