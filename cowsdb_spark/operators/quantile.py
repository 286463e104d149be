"""Exact distributed percentile (quantile_cont semantics).

Spark's built-in ``percentile`` buffers every value of a group on a
single reducer — for a global quantile that is one executor holding
the whole column (the scale-killer VERDICT r1 flagged in q30). CH's
``quantile`` is approximate by default (the dialect maps it to
``percentile_approx``), but for the exact tier (CH ``quantileExact``,
ref main.py delegates to chDB's exact variants) we implement the
classic distributed selection:

1. range-partition the column (``repartitionByRange`` — a sampled
   range exchange, the same machinery as a distributed sort);
2. collect only the per-partition COUNTS to the driver (≤ #partitions
   longs — bounded regardless of data size);
3. locate the partition holding each target rank and fetch the order
   statistic with a partition-local sort + OFFSET/LIMIT 1 (work
   bounded by one range partition, sized by
   ``spark.sql.files.maxPartitionBytes`` at scan time).

Interpolation follows ``quantile_cont``: h = (n-1)*q, linear between
the flooring and ceiling order statistics — bit-compatible with the
DuckDB oracle at the driver's 4-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame, col: str, qs: list[float], n_partitions: int | None = None
) -> list[float | None]:
    """quantile_cont(col, q) for each q, computed distributed-exact.

    Driver memory: one count per range partition plus the 1-2 bracket
    values per quantile — never the data.
    """
    spark = df.sparkSession
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    n = vals.count()
    if n == 0:
        return [None for _ in qs]
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 4)
    ranged = (
        vals.repartitionByRange(n_partitions, F.col("v"))
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        cnts = dict(ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect())
        pids = sorted(cnts)
        # cumulative rank offsets per partition, ascending value ranges
        offsets: dict[int, int] = {}
        cum = 0
        for pid in pids:
            offsets[pid] = cum
            cum += cnts[pid]

        def value_at(k: int) -> float:
            k = min(max(k, 0), n - 1)
            for pid in reversed(pids):
                if offsets[pid] <= k:
                    local = k - offsets[pid]
                    row = (
                        ranged.filter(F.col("pid") == pid)
                        .select("v")
                        .orderBy("v")
                        .offset(local)
                        .limit(1)
                        .collect()
                    )
                    return row[0][0]
            raise AssertionError("rank out of range")

        out: list[float | None] = []
        for q in qs:
            h = (n - 1) * q
            kf = int(h)
            vf = value_at(kf)
            frac = h - kf
            if frac == 0.0:
                out.append(vf)
            else:
                vc = value_at(kf + 1)
                out.append(vf + frac * (vc - vf))
        return out
    finally:
        ranged.unpersist()


def exact_percentile_row(
    spark: SparkSession,
    df: DataFrame,
    specs: list[tuple[str, float, str]],
) -> DataFrame:
    """One-row DataFrame of exact percentiles.

    *specs* is [(column, q, out_alias), ...]; rounding (to match an
    oracle) is the caller's job on the returned columns.
    """
    by_col: dict[str, list[tuple[float, str]]] = {}
    for c, q, alias in specs:
        by_col.setdefault(c, []).append((q, alias))
    results: dict[str, float | None] = {}
    for c, qa in by_col.items():
        vals = exact_percentiles(df, c, [q for q, _ in qa])
        for (q, alias), v in zip(qa, vals):
            results[alias] = v
    aliases = [alias for _, _, alias in specs]
    schema = ", ".join(f"{a} double" for a in aliases)
    return spark.createDataFrame([tuple(results[a] for a in aliases)], schema)
