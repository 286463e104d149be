"""Exact distributed percentile (quantile_cont semantics) without a
full-data shuffle.

Spark's built-in ``percentile`` buffers every value of a group on a
single reducer — for a global quantile that is one executor holding
the whole column (the scale-killer VERDICT r1 flagged in q30). The
obvious distributed fix (range-partition + order statistic) still
pays a sampling scan PLUS a full shuffle of the column — at 100 TB
that is terabytes over the network for a single scalar.

This implements iterative histogram refinement instead (the classic
"distributed selection by bisection"):

1. ONE agg job: min/max/count per requested column (map-side partial,
   no shuffle of data).
2. Bucket every candidate rank's interval into B=4096 equal-width
   buckets and count per bucket — the only thing shuffled is the
   histogram itself (≤ B × #ranks longs). Locate the bucket holding
   each rank; its interval becomes the next iteration's range.
   log_B(n) iterations: 2 for a trillion rows.
3. When a rank's candidate set is ≤ FETCH_LIMIT rows, fetch them in
   ONE final job with a per-rank ``row_number`` window (partition =
   one rank's candidates — bounded memory) and read the order
   statistic(s).

Bucket membership is always recomputed from the same float expression
``floor((v - lo) / w)`` chain, so boundary rounding can't double-count
a value between "below the bucket" and "inside it". Columns with all
values equal in an interval terminate via the lo == hi short-circuit;
adversarial duplicate pileups terminate via a depth cap with a
distinct-value fallback (grouped by value, bounded by the distincts
inside a width/4096^depth interval).

Interpolation follows ``quantile_cont``: h = (n-1)*q, linear between
the flooring and ceiling order statistics — bit-compatible with the
DuckDB oracle at the driver's 4-decimal rounding.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

B = 4096  # buckets per refinement step
FETCH_LIMIT = 100_000  # max candidate rows pulled into the final window
MAX_DEPTH = 20


@dataclass
class _RankState:
    col: str
    k: int  # global 0-based rank wanted
    lo: float
    hi: float
    rank_below: int = 0  # rows with v strictly below this interval
    count: int = 0  # rows inside the interval
    levels: list = field(default_factory=list)  # [(lo, w, bucket), ...]
    value: float | None = None

    def member_cond(self, v):
        c = (v >= F.lit(self.lo)) & (v <= F.lit(self.hi))
        for lo, w, b in self.levels:
            c = c & (
                F.least(
                    F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(B - 1)
                ).cast("int")
                == F.lit(b)
            )
        return c


def _col_expr(df: DataFrame, col: str):
    return F.col(col).cast("double")


def exact_percentiles_multi(
    df: DataFrame,
    specs: list[tuple[str, float]],
    n_partitions: int | None = None,  # kept for API compat; unused
    extra_aggs: list | None = None,
):
    """quantile_cont per (column, q) pair; no full-data shuffle.

    Driver memory: B longs per active rank per iteration plus the 1-2
    bracket values per quantile — never the data.

    *extra_aggs*: optional aliased aggregate Columns ride along on the
    step-1 min/max/count scan (r9: a caller needing unrelated global
    aggregates over the SAME frame — q30's conditional sums — fuses
    them here instead of paying a second full scan; the expressions
    run in the same engine, so values are identical to a standalone
    ``df.agg``). When provided, the return is ``(percentiles,
    stats_row)`` with the extras readable from ``stats_row`` by alias.
    """
    spark = df.sparkSession
    cols = sorted({c for c, _ in specs})

    # 1. min / max / count per column — one scan, no shuffle
    aggs = []
    for c in cols:
        v = _col_expr(df, c)
        aggs += [
            F.min(v).alias(f"mn_{c}"),
            F.max(v).alias(f"mx_{c}"),
            F.count(v).alias(f"n_{c}"),
        ]
    stats = df.agg(*aggs, *(extra_aggs or [])).collect()[0]
    totals = {c: stats[f"n_{c}"] for c in cols}

    # target ranks: floor and (if fractional) ceil per (col, q)
    ranks: dict[tuple[str, int], _RankState] = {}
    for c, q in specs:
        n = totals[c]
        if n == 0:
            continue
        h = (n - 1) * q
        for k in {int(h)} | ({int(h) + 1} if h != int(h) else set()):
            k = min(max(k, 0), n - 1)
            if (c, k) not in ranks:
                ranks[(c, k)] = _RankState(
                    col=c, k=k, lo=stats[f"mn_{c}"], hi=stats[f"mx_{c}"], count=n
                )

    # 2. refine: one histogram job per iteration covers ALL active ranks
    for depth in range(MAX_DEPTH):
        active = [
            r
            for r in ranks.values()
            if r.value is None and r.count > FETCH_LIMIT and r.lo < r.hi
        ]
        for r in ranks.values():
            if r.value is None and r.lo >= r.hi:
                r.value = r.lo  # interval collapsed: all values equal
        if not active:
            break
        entries = []
        for i, r in enumerate(active):
            v = _col_expr(df, r.col)
            w = (r.hi - r.lo) / B
            bucket = F.least(
                F.floor((v - F.lit(r.lo)) / F.lit(w)), F.lit(B - 1)
            ).cast("int")
            entries.append(
                F.struct(
                    F.lit(i).alias("ri"),
                    F.when(r.member_cond(v), bucket).alias("b"),
                )
            )
        counts = (
            df.select(F.explode(F.array(*entries)).alias("z"))
            .select(F.col("z.ri").alias("ri"), F.col("z.b").alias("b"))
            .filter(F.col("b").isNotNull())
            .groupBy("ri", "b")
            .count()
            .collect()
        )
        by_rank: dict[int, dict[int, int]] = {}
        for row in counts:
            by_rank.setdefault(row["ri"], {})[row["b"]] = row["count"]
        for i, r in enumerate(active):
            bcounts = by_rank.get(i, {})
            local_k = r.k - r.rank_below
            cum = 0
            w = (r.hi - r.lo) / B
            chosen = None
            for b in sorted(bcounts):
                if cum + bcounts[b] > local_k:
                    chosen = b
                    break
                cum += bcounts[b]
            if chosen is None:  # float-edge residue: keep widest bucket
                chosen = max(sorted(bcounts), default=0)
            r.levels.append((r.lo, w, chosen))
            r.rank_below += cum
            r.count = bcounts.get(chosen, 0)
            r.lo = r.lo + chosen * w
            r.hi = r.lo + w
            if r.count == 0:
                r.value = r.lo  # degenerate; cannot happen with k in range
    else:  # depth cap: finish by exact value histogram (tiny interval)
        for r in ranks.values():
            if r.value is not None or r.count <= FETCH_LIMIT:
                continue
            v = _col_expr(df, r.col)
            vals = (
                df.select(v.alias("v"))
                .filter(r.member_cond(F.col("v")))
                .groupBy("v")
                .count()
                .orderBy("v")
                .collect()
            )
            cum = r.rank_below
            for row in vals:
                if cum + row["count"] > r.k:
                    r.value = row["v"]
                    break
                cum += row["count"]

    # 3. one fetch job for every rank still unresolved
    pending = [r for r in ranks.values() if r.value is None]
    if pending:
        parts = []
        for i, r in enumerate(pending):
            v = _col_expr(df, r.col)
            parts.append(
                df.select(
                    F.lit(i).alias("ri"), v.alias("v")
                ).filter(r.member_cond(F.col("v")))
            )
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        w = W.partitionBy("ri").orderBy("v")
        wanted = {
            (i, r.k - r.rank_below + 1): r for i, r in enumerate(pending)
        }  # row_number is 1-based
        cond = None
        for (i, rn), _ in wanted.items():
            c = (F.col("ri") == i) & (F.col("rn") == rn)
            cond = c if cond is None else (cond | c)
        for row in (
            allc.select("ri", "v", F.row_number().over(w).alias("rn"))
            .filter(cond)
            .collect()
        ):
            wanted[(row["ri"], row["rn"])].value = row["v"]

    out: dict[tuple[str, float], float | None] = {}
    for c, q in specs:
        n = totals[c]
        if n == 0:
            out[(c, q)] = None
            continue
        h = (n - 1) * q
        kf = min(max(int(h), 0), n - 1)
        vf = ranks[(c, kf)].value
        frac = h - int(h)
        if frac == 0.0:
            out[(c, q)] = vf
        else:
            vc = ranks[(c, min(kf + 1, n - 1))].value
            out[(c, q)] = vf + frac * (vc - vf)
    if extra_aggs is not None:
        return out, stats
    return out


def exact_percentiles(
    df: DataFrame, col: str, qs: list[float], n_partitions: int | None = None
) -> list[float | None]:
    """quantile_cont(col, q) for each q, computed distributed-exact."""
    res = exact_percentiles_multi(df, [(col, q) for q in qs], n_partitions)
    return [res[(col, q)] for q in qs]


def exact_percentile_row(
    spark: SparkSession,
    df: DataFrame,
    specs: list[tuple[str, float, str]],
    extra_aggs: list | None = None,
    extra_schema: str = "",
) -> DataFrame:
    """One-row DataFrame of exact percentiles.

    *specs* is [(column, q, out_alias), ...]; rounding (to match an
    oracle) is the caller's job on the returned columns.

    *extra_aggs*/*extra_schema*: aliased aggregate Columns fused onto
    the operator's first scan (see ``exact_percentiles_multi``) and
    the DDL for their output columns, appended after the percentile
    aliases in the returned row.
    """
    from ..localdf import local_df

    if extra_aggs:
        res, stats = exact_percentiles_multi(
            df, [(c, q) for c, q, _ in specs], extra_aggs=extra_aggs
        )
        extra_names = [
            part.strip().split()[0] for part in extra_schema.split(",")
        ]
        extras = tuple(stats[name] for name in extra_names)
    else:
        res = exact_percentiles_multi(df, [(c, q) for c, q, _ in specs])
        extras = ()
    aliases = [alias for _, _, alias in specs]
    schema = ", ".join(f"{a} double" for a in aliases)
    if extra_schema:
        schema += ", " + extra_schema
    return local_df(
        spark, [tuple(res[(c, q)] for c, q, _ in specs) + extras], schema
    )
